"""aux_mode='full' path: the intended a1..a4 weighted Combine loss incl. the
entropy term."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.spec import load_yolo_yaml
from mmidet_tpu.models.zoo import two_stream_spec


def test_aux_full_weighted_combine():
    # needs a GPT1_fourier level: use the l-scale flagship grammar but tiny
    # via a custom YAML-style dict
    cfg = {
        "nc": 2, "depth_multiple": 1.0, "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23],
                    [30, 61, 62, 45, 59, 119],
                    [116, 90, 156, 198, 373, 326]],
        "backbone": [
            [-1, 1, "Focus", [8, 3]],
            [-4, 1, "Focus", [8, 3]],
            [[0, 1], 1, "GPT1_fourier", [8]],
            [[0, 2], 1, "Add2", [8, 0]],
            [[1, 2], 1, "Add2", [8, 1]],
            [3, 1, "Conv", [16, 3, 2]],   # P2->/4
            [-1, 1, "Conv", [24, 3, 2]],  # /8
            [-1, 1, "Conv", [32, 3, 2]],  # /16
            [-1, 1, "Conv", [48, 3, 2]],  # /32
        ],
        "head": [[[6, 7, 8], 1, "Detect", []]],
    }
    spec = load_yolo_yaml(cfg)
    model = TwoStreamDetector(spec=spec, aux_mode="full", use_cem=False)
    rgb = jnp.asarray(np.random.default_rng(0).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    ir = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (2, 64, 64, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, rgb, ir)
    out = model.apply(v, rgb, ir)
    aux = out["aux"]
    for k in ("contrastive", "ssim", "pattern", "entropy", "combine"):
        assert k in aux and np.isfinite(float(aux[k])), k
    want = (0.1 * float(aux["contrastive"]) + 1.0 * float(aux["ssim"])
            + 0.06 * float(aux["pattern"]) + 0.03 * float(aux["entropy"]))
    np.testing.assert_allclose(float(aux["combine"]), want, rtol=1e-5)

    # reference mode: combine == ssim (the overwrite quirk)
    model_ref = TwoStreamDetector(spec=spec, aux_mode="reference",
                                  use_cem=False)
    out2 = model_ref.apply(v, rgb, ir)
    np.testing.assert_allclose(float(out2["aux"]["combine"]),
                               float(out2["aux"]["ssim"]), rtol=1e-6)
