"""Cross-runtime export round-trips (reference models/export.py:66-124
parity): jax2tf -> TF SavedModel (StableHLO-native, exact) and ->
TFLite flatbuffer (graph lowering, runs under any TFLite runtime)."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
tf = pytest.importorskip("tensorflow")
import jax.numpy as jnp


@pytest.fixture(scope="module")
def tiny_model():
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    spec = two_stream_spec("t", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, small, small,
                   train=False)
    rng = np.random.default_rng(0)
    rgb = rng.random((1, 64, 64, 3), np.float32)
    ir = rng.random((1, 64, 64, 3), np.float32)
    want = np.asarray(model.apply(v, rgb, ir, train=False)["pred"])
    return model, v, rgb, ir, want


def test_savedmodel_roundtrip_exact(tiny_model, tmp_path):
    """Native (StableHLO) SavedModel must reproduce the jax forward
    bit-exactly — it runs the same compiled program under TF."""
    from mmidet_tpu.deploy.export import export_savedmodel
    model, v, rgb, ir, want = tiny_model
    p = export_savedmodel(str(tmp_path / "sm"), model, v, img_size=64)
    loaded = tf.saved_model.load(p)
    got = loaded.serve(rgb, ir).numpy()
    np.testing.assert_array_equal(got, want)


def test_tflite_roundtrip(tiny_model, tmp_path):
    """Graph-lowered SavedModel -> TFLite builtins; the interpreter output
    must match the jax forward to float tolerance."""
    from mmidet_tpu.deploy.export import export_savedmodel, export_tflite
    model, v, rgb, ir, want = tiny_model
    p = export_savedmodel(str(tmp_path / "smg"), model, v, img_size=64,
                          native=False)
    out = export_tflite(p, str(tmp_path / "model.tflite"))
    assert os.path.getsize(out) > 1024
    interp = tf.lite.Interpreter(out)
    interp.allocate_tensors()
    runner = interp.get_signature_runner("serving_default")
    got = list(runner(rgb=rgb, ir=ir).values())[0]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
