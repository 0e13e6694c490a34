"""Parity of the constant-matmul resampling ops against torch's
AdaptiveAvgPool2d / F.interpolate (the semantics the reference fusion blocks
rely on at common.py:1300,292)."""

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

from mmidet_tpu.nn.resize import (adaptive_avg_pool, bilinear_resize,
                                  nearest_upsample)


@pytest.mark.parametrize("hw", [(8, 8), (16, 16), (20, 20), (40, 40),
                                (20, 40), (7, 13)])
def test_adaptive_avg_pool_matches_torch(hw):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *hw, 5), np.float32)
    got = np.asarray(adaptive_avg_pool(jnp.asarray(x), (8, 8)))
    t = torch.nn.functional.adaptive_avg_pool2d(
        torch.from_numpy(x).permute(0, 3, 1, 2), (8, 8))
    want = t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("out_hw", [(16, 16), (20, 20), (160, 160), (13, 27)])
def test_bilinear_resize_matches_torch(out_hw):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 4), np.float32)
    got = np.asarray(bilinear_resize(jnp.asarray(x), out_hw))
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), size=out_hw,
        mode="bilinear", align_corners=False)
    want = t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 5, 7, 3), np.float32)
    got = np.asarray(nearest_upsample(jnp.asarray(x), 2))
    t = torch.nn.functional.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), scale_factor=2,
        mode="nearest")
    want = t.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
