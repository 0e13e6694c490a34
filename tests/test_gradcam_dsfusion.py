"""Direct tests for the two visualization/fusion utilities that had only
indirect coverage: feature heatmaps (reference utils/gradcam.py:44-79) and
Dempster-Shafer confidence fusion (reference utils/ds_fusion.py, broken
upstream — see the module docstring)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402


def test_feature_heatmap_and_overlay():
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.utils.gradcam import feature_heatmap, overlay_heatmap

    spec = two_stream_spec("t", "add", nc=2, fusion_layers=1)
    model = TwoStreamDetector(spec=spec, aux_mode="off", dtype=jnp.float32)
    rgb = jnp.zeros((1, 64, 64, 3), jnp.float32).at[:, 16:48, 16:48].set(1.0)
    ir = 1.0 - rgb
    variables = model.init({"params": jax.random.PRNGKey(0)}, rgb, ir,
                           train=False)

    hm = feature_heatmap(model, variables, rgb, ir, layer="l4")
    assert hm.ndim == 2 and hm.shape[0] == hm.shape[1]
    assert float(hm.min()) >= 0.0 and float(hm.max()) <= 1.0 + 1e-6
    assert float(hm.max()) > 0.0  # minmax-normalized: not all-zero

    img = (np.random.default_rng(0).random((64, 64, 3)) * 255
           ).astype(np.uint8)
    out = overlay_heatmap(img, hm)
    assert out.shape == img.shape and out.dtype == np.uint8
    # only the red channel is blended
    np.testing.assert_array_equal(out[..., 1:], img[..., 1:])


def test_ds_fusion_mass_properties():
    from mmidet_tpu.utils.ds_fusion import (dempster_combine,
                                            fuse_modal_confidences,
                                            mass_from_confidences)

    m = mass_from_confidences(np.array([0.6, 0.3, 0.1]), uncertainty=0.2)
    assert m.shape == (4,)
    np.testing.assert_allclose(m.sum(), 1.0)
    np.testing.assert_allclose(m[-1], 0.2)

    # zero confidence -> total ignorance
    m0 = mass_from_confidences(np.zeros(3))
    np.testing.assert_allclose(m0, [0, 0, 0, 1.0])

    # combination of agreeing masses sharpens the agreed class
    a = mass_from_confidences(np.array([0.9, 0.1]))
    fused = dempster_combine(a, a)
    np.testing.assert_allclose(fused.sum(), 1.0)
    assert fused[0] > a[0]

    # total singleton conflict with no ignorance -> all mass to Theta
    c1 = np.array([1.0, 0.0, 0.0])
    c2 = np.array([0.0, 1.0, 0.0])
    out = dempster_combine(c1, c2)
    np.testing.assert_allclose(out, [0, 0, 1.0])


def test_fuse_modal_confidences_agreement_beats_single_modality():
    from mmidet_tpu.utils.ds_fusion import fuse_modal_confidences

    rgb = np.array([0.7, 0.2, 0.1])
    ir = np.array([0.6, 0.3, 0.1])
    fused = fuse_modal_confidences(rgb, ir)
    np.testing.assert_allclose(fused.sum(), 1.0)
    assert fused.argmax() == 0
    # two agreeing modalities yield a sharper belief than either alone
    assert fused[0] > max(rgb[0] / rgb.sum(), ir[0] / ir.sum())
