"""s8-storage quantized deploy mode: calibration + numeric bound vs the
float deploy forward.  Hardware rationale measured in
tools/_probe_int8_scan.py (see mmidet_tpu/nn/quant.py docstring)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.zoo import two_stream_spec
from mmidet_tpu.nn.fuse import fold_batchnorm
from mmidet_tpu.nn.quant import (QTensor, calibrate_act_scales, dequantize,
                                 quantize, quantized_variables)


def test_qtensor_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 16))
    s = jnp.max(jnp.abs(x)) / 127.0
    q = quantize(x, s)
    assert q.v.dtype == jnp.int8
    back = dequantize(q, jnp.float32)
    # symmetric per-tensor rounding error bound: scale/2
    assert float(jnp.max(jnp.abs(back - x))) <= float(s) / 2 + 1e-6


@pytest.mark.parametrize("variant", ["add", "gpt4"])
def test_quant_deploy_close_to_float(variant):
    spec = two_stream_spec("t", variant, nc=2, fusion_layers=1)
    kw = dict(spec=spec, aux_mode="off", dtype=jnp.float32)
    base = TwoStreamDetector(**kw)
    f_model = TwoStreamDetector(fused=True, **kw)
    q_model = TwoStreamDetector(fused=True, quant=True, **kw)

    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fold_batchnorm(base.init({"params": rng}, small, small,
                                         train=False))

    img = 96
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, img, img, 3))
    ir = jax.random.uniform(jax.random.PRNGKey(2), (2, img, img, 3))

    # calibration on the same distribution
    qcol = calibrate_act_scales(f_model, variables, [(rgb, ir)])
    leaves = jax.tree_util.tree_leaves(qcol)
    assert leaves and all(float(s) > 0 for s in leaves)

    ref = np.asarray(f_model.apply(variables, rgb, ir, train=False)["pred"])
    got = np.asarray(q_model.apply(quantized_variables(variables, qcol),
                                   rgb, ir, train=False)["pred"])
    assert got.shape == ref.shape
    # activation rounding only (weights untouched): decoded boxes within a
    # few pixels / scores within a few points of float
    scale = np.maximum(1.0, np.abs(ref))
    rel = np.abs(got - ref) / scale
    assert float(rel.max()) < 0.15, rel.max()
    assert float(rel.mean()) < 0.01, rel.mean()


def test_quant_requires_calibration_collection():
    spec = two_stream_spec("t", "add", nc=2, fusion_layers=1)
    q_model = TwoStreamDetector(spec=spec, aux_mode="off", fused=True,
                                quant=True, dtype=jnp.float32)
    base = TwoStreamDetector(spec=spec, aux_mode="off", dtype=jnp.float32)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fold_batchnorm(base.init(
        {"params": jax.random.PRNGKey(0)}, small, small, train=False))
    with pytest.raises(Exception):
        q_model.apply(variables, small, small, train=False)


def test_calib_does_not_pollute_init():
    spec = two_stream_spec("t", "add", nc=2, fusion_layers=1)
    f_model = TwoStreamDetector(spec=spec, aux_mode="off", fused=True,
                                dtype=jnp.float32)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = f_model.init({"params": jax.random.PRNGKey(0)}, small, small,
                     train=False)
    assert "calib" not in v and "quant" not in v
