"""ONNX export: wire-format round-trip + numeric parity of the exported
graph (executed from the serialized file by the numpy evaluator) against
the jax deploy forward.  Parity surface: reference models/export.py:83-99."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mmidet_tpu.deploy import onnx_np
from mmidet_tpu.deploy.onnx_export import export_onnx
from mmidet_tpu.deploy.onnx_proto import (FLOAT, Graph, Model, Node, Tensor,
                                          ValueInfo)
from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.zoo import single_stream_spec, two_stream_spec
from mmidet_tpu.nn.fuse import fold_batchnorm


def test_proto_roundtrip():
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    g = Graph(
        "g",
        nodes=[Node("Conv", ["x", "w"], ["y"], name="c",
                    attrs={"strides": [2, 2], "pads": [1, 1, 1, 1],
                           "group": 1, "alpha": 0.1, "mode": "nearest",
                           "scales": [1.0, 2.0]}),
               Node("Sigmoid", ["y"], ["z"], name="s")],
        inputs=[ValueInfo("x", FLOAT, ("batch", 3, 8, 8))],
        outputs=[ValueInfo("z", FLOAT, ("batch", 2, 4, 4))],
        initializers=[Tensor("w", w)])
    m = Model(g, doc="rt")
    buf = m.encode()
    m2 = Model.decode(buf)
    assert m2.opset == m.opset and m2.producer == "mmidet_tpu"
    g2 = m2.graph
    assert [n.op_type for n in g2.nodes] == ["Conv", "Sigmoid"]
    n = g2.nodes[0]
    assert n.inputs == ["x", "w"] and n.outputs == ["y"]
    assert n.attrs["strides"] == [2, 2] and n.attrs["pads"] == [1, 1, 1, 1]
    assert n.attrs["group"] == 1 and n.attrs["mode"] == "nearest"
    assert abs(n.attrs["alpha"] - 0.1) < 1e-7
    assert n.attrs["scales"] == [1.0, 2.0]
    np.testing.assert_array_equal(g2.initializers[0].array, w)
    assert g2.inputs[0].shape == ("batch", 3, 8, 8)
    assert g2.outputs[0].name == "z"
    # negative ints survive two's-complement varints
    t = Tensor("i", np.asarray([-1, 0, 7], np.int64))
    np.testing.assert_array_equal(Tensor.decode(t.encode()).array,
                                  [-1, 0, 7])


def _export_and_compare(spec, use_cem, img, tmp_path, atol=2e-3,
                        two=True):
    model = TwoStreamDetector(spec=spec, aux_mode="off", fused=True,
                              use_cem=use_cem, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    base = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=use_cem,
                             dtype=jnp.float32)
    variables = fold_batchnorm(base.init(
        {"params": rng}, small, small if two else None, train=False))

    rgb = jax.random.uniform(jax.random.PRNGKey(1), (2, img, img, 3))
    ir = jax.random.uniform(jax.random.PRNGKey(2), (2, img, img, 3))
    out = model.apply(variables, rgb, ir if two else None, train=False)
    ref = np.asarray(out["pred"], np.float32)

    path = str(tmp_path / "m.onnx")
    export_onnx(spec, variables, img, path, use_cem=use_cem)
    m = Model.load(path)
    feeds = {"rgb": np.asarray(rgb).transpose(0, 3, 1, 2),
             "ir": np.asarray(ir).transpose(0, 3, 1, 2)} if two else \
        {"images": np.asarray(rgb).transpose(0, 3, 1, 2)}
    got = onnx_np.run(m, feeds)["pred"]

    assert got.shape == ref.shape
    # box coords are in pixels (up to ~img); scores in [0,1] — compare
    # with a scale-aware tolerance
    scale = np.maximum(1.0, np.abs(ref))
    err = (np.abs(got - ref) / scale).max()
    assert err < atol, f"max rel err {err}"


def test_onnx_two_stream_add(tmp_path):
    spec = two_stream_spec("t", "add", nc=2)
    _export_and_compare(spec, use_cem=True, img=64, tmp_path=tmp_path)


def test_onnx_two_stream_gpt4(tmp_path):
    spec = two_stream_spec("t", "gpt4", nc=2, fusion_layers=2)
    _export_and_compare(spec, use_cem=True, img=64, tmp_path=tmp_path)


def test_onnx_two_stream_fourier_flagship_grammar(tmp_path):
    # the flagship grammar (GPT1_fourier at P2) — GPT1* requires
    # width_multiple=1.0 (reference quirk: its d_model arg is not
    # width-scaled, spec.py:159), so use l-width with smoke depth; the
    # fourier branch is loss-only dataflow, so the deploy graph must
    # match the jax forward with aux off
    import dataclasses
    spec = two_stream_spec("l", "fourier", nc=2, fusion_layers=2)
    spec = dataclasses.replace(spec, depth_multiple=0.25)
    _export_and_compare(spec, use_cem=True, img=64, tmp_path=tmp_path)


def test_onnx_single_stream(tmp_path):
    spec = single_stream_spec("t", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=False,
                              fused=True, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    base = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=False,
                             dtype=jnp.float32)
    variables = fold_batchnorm(base.init({"params": rng}, small, None,
                                         train=False))
    img = 64
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, img, img, 3))
    ref = np.asarray(model.apply(variables, x, None, train=False)["pred"])

    path = str(tmp_path / "s.onnx")
    export_onnx(spec, variables, img, path, use_cem=False)
    got = onnx_np.run(Model.load(path),
                      {"images": np.asarray(x).transpose(0, 3, 1, 2)})["pred"]
    scale = np.maximum(1.0, np.abs(ref))
    assert (np.abs(got - ref) / scale).max() < 2e-3
