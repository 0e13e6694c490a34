"""Model-assembly tests: spec resolution channel math, all zoo families
building and running forward, Detect decode semantics."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.spec import make_divisible, resolve
from mmidet_tpu.models.zoo import (single_stream_spec, two_stream_spec,
                                   get_model_spec)


def test_make_divisible():
    assert make_divisible(64 * 0.5) == 32
    assert make_divisible(1024 * 1.25) == 1280
    assert make_divisible(64 * 0.33) == 24


def test_resolve_flagship_channels():
    spec = two_stream_spec("l", "fourier", nc=6)
    resolved, save = resolve(spec)
    ch = {rl.index: rl.c_out for rl in resolved}
    # P2 streams at 128, fusion pyramid 256/512/1024
    assert ch[2] == ch[5] == 128
    assert ch[10] == ch[12] == 256 and ch[17] == 512 and ch[25] == 1024
    assert ch[32] == 256 and ch[33] == 512 and ch[34] == 1024
    # head P3/P4/P5 into Detect
    det = resolved[-1]
    assert det.name == "Detect" and det.args[2] == (256, 512, 1024)


def test_resolve_depth_gain():
    spec = two_stream_spec("s", "gpt4", nc=6)
    resolved, _ = resolve(spec)
    c3_reps = [rl.args[1] for rl in resolved if rl.name == "C3"]
    # yolov5s depth 0.33: 3 -> 1, 9 -> 3
    assert set(c3_reps[:2]) == {1}
    assert 3 in c3_reps


@pytest.mark.parametrize("fusion", ["gpt4", "gpt3", "add"])
def test_two_stream_families_forward(fusion):
    spec = two_stream_spec("s", fusion, nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="reference")
    rgb = jnp.zeros((1, 64, 64, 3))
    ir = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), rgb, ir)
    out = model.apply(v, rgb, ir)
    assert [o.shape for o in out["train_outs"]] == [
        (1, 3, 8, 8, 7), (1, 3, 4, 4, 7), (1, 3, 2, 2, 7)]
    assert out["pred"].shape == (1, 3 * (64 + 16 + 4), 7)


def test_single_stream_forward():
    spec = single_stream_spec("s", nc=80)
    model = TwoStreamDetector(spec=spec, use_cem=False, aux_mode="off")
    x = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(v, x)
    assert out["pred"].shape == (1, 252, 85)


def test_get_model_spec_names():
    assert get_model_spec("yolov5s").nc == 80
    assert get_model_spec("yolov5l_fuse3_fourier", nc=6).nc == 6
    assert get_model_spec("yolov5s_transformer").width_multiple == 0.5


def test_detect_decode_centers():
    """A zero-logit prediction decodes to box centers at
    (grid + 0.5)*stride and wh = anchor (sigmoid(0)=0.5)."""
    from mmidet_tpu.models.detect_head import Detect
    det = Detect(nc=1, anchors=((10, 13, 16, 30, 33, 23),), strides=(8,))
    xs = [jnp.zeros((1, 4, 4, 8))]
    v = det.init(jax.random.PRNGKey(0), xs)
    # zero the conv params so logits are exactly 0
    p = jax.tree_util.tree_map(jnp.zeros_like, v["params"])
    outs, pred = det.apply({"params": p}, xs, decode=True)
    pred = np.asarray(pred)  # (1, 3*16, 6)
    # first anchor, first cell: xy = (2*0.5-0.5+0)*8 = 4
    np.testing.assert_allclose(pred[0, 0, :2], [4.0, 4.0])
    np.testing.assert_allclose(pred[0, 0, 2:4], [10.0, 13.0])
    # second cell in x direction
    np.testing.assert_allclose(pred[0, 1, :2], [12.0, 4.0])


def test_yaml_compat_loader():
    from mmidet_tpu.models.spec import load_yolo_yaml
    d = {
        "nc": 2,
        "depth_multiple": 1.0,
        "width_multiple": 1.0,
        "anchors": [[10, 13, 16, 30, 33, 23],
                    [30, 61, 62, 45, 59, 119],
                    [116, 90, 156, 198, 373, 326]],
        "backbone": [
            [-1, 1, "Focus", [64, 3]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 3, "C3", [128]],
            [-4, 1, "Focus", [64, 3]],
            [-1, 1, "Conv", [128, 3, 2]],
            [-1, 3, "C3", [128]],
            [[2, 5], 1, "Add", [1]],
            [-1, 1, "Conv", [256, 3, 2]],
            [-1, 1, "Conv", [512, 3, 2]],
        ],
        "head": [
            [-1, 1, "Conv", [512, 1, 1]],
            [[7, 8, 9], 1, "Detect", ["nc", "anchors"]],
        ],
    }
    # Detect args in YAML are placeholders; resolution injects nc/anchors
    d["head"][-1][-1] = []
    spec = load_yolo_yaml(d)
    resolved, _ = resolve(spec)
    assert resolved[-1].args[0] == 2
    model = TwoStreamDetector(spec=spec, use_cem=False, aux_mode="off")
    rgb = jnp.zeros((1, 32, 32, 3))
    ir = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.PRNGKey(0), rgb, ir)
    out = model.apply(v, rgb, ir)
    assert out["pred"].shape[0] == 1


def test_mamba_fusion_model():
    spec = get_model_spec("yolov5s_mamba", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    rgb = jnp.zeros((1, 64, 64, 3))
    ir = jnp.zeros((1, 64, 64, 3))
    v = model.init(jax.random.PRNGKey(0), rgb, ir)
    out = model.apply(v, rgb, ir)
    assert out["pred"].shape == (1, 252, 7)


def test_reference_hub_yamls_load_and_run():
    """Every YAML the reference ships (models/*.yaml + models/hub/*.yaml:
    P2/P6/P7 heads, yolov3 family incl. list-kernels and repeat counts,
    int-anchor specs) must load through load_yolo_yaml and run forward
    with shape-inferred strides. Ref: parse_model yolo_test.py:548-639."""
    import glob
    import os

    import jax
    import jax.numpy as jnp
    import pytest

    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.spec import load_yolo_yaml

    ref = "/root/reference/models"
    if not os.path.isdir(ref):
        pytest.skip("reference checkout unavailable")
    yamls = sorted(glob.glob(ref + "/hub/*.yaml")) + \
        sorted(glob.glob(ref + "/*.yaml"))
    yamls = [y for y in yamls if not y.endswith("anchors.yaml")]
    assert len(yamls) >= 17
    expected_strides = {
        "yolov3-tiny.yaml": (16, 32),
        "yolov5s6.yaml": (8, 16, 32, 64),
        "yolov5-p7.yaml": (8, 16, 32, 64, 128),
    }
    for y in yamls:
        spec = load_yolo_yaml(y, nc=4)
        model = TwoStreamDetector(spec=spec, use_cem=False, aux_mode="off")
        x = jnp.zeros((1, 128, 128, 3), jnp.float32)
        v = model.init({"params": jax.random.PRNGKey(0)}, x, None,
                       train=False)
        out = model.apply(v, x, None, train=False)
        assert out["pred"].ndim == 3 and out["pred"].shape[-1] == 4 + 5
        name = os.path.basename(y)
        if name in expected_strides:
            assert spec.strides == expected_strides[name], (name,
                                                            spec.strides)


def test_reference_transformer_yamls_load_and_run():
    """Every two-stream YAML in the reference's models/transformer/ (the 18
    fusion_add / fusion_transformer / transformerx3 / fuse / fuse3_fourier /
    FOC variants) must load and shape-check through the compat loader.
    yolov5l_fusion_transformer_FLIR_aligned.yaml is broken in the reference
    itself (literal 'k' in a from-ref at line 73 — its parse_model crashes on
    it too); we require a clear error instead."""
    import glob
    import os

    import jax
    import jax.numpy as jnp
    import pytest

    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.spec import load_yolo_yaml

    ref = "/root/reference/models/transformer"
    if not os.path.isdir(ref):
        pytest.skip("reference checkout unavailable")
    yamls = sorted(glob.glob(ref + "/*.yaml"))
    assert len(yamls) == 18
    ran = 0
    for y in yamls:
        name = os.path.basename(y)
        if name == "yolov5l_fusion_transformer_FLIR_aligned.yaml":
            with pytest.raises(ValueError, match="non-integer 'from'"):
                load_yolo_yaml(y)
            continue
        spec = load_yolo_yaml(y)
        model = TwoStreamDetector(spec=spec, aux_mode="off")
        x = jax.ShapeDtypeStruct((1, 64, 64, 3), jnp.float32)
        rng = {"params": jax.ShapeDtypeStruct((2,), jnp.uint32)}
        out, _ = jax.eval_shape(
            lambda r, a, b: model.init_with_output(r, a, b, train=False,
                                                   decode=False),
            rng, x, x)
        assert len(out["train_outs"]) == spec.nl
        ran += 1
    assert ran == 17


def test_p6_zoo_spec():
    """Native P6 family (reference hub yolov5{s..x}6): 4 detect levels at
    strides (8,16,32,64)."""
    import jax
    import jax.numpy as jnp

    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import get_model_spec

    spec = get_model_spec("yolov5s6", nc=3)
    assert spec.strides == (8, 16, 32, 64)
    assert len(spec.anchors) == 4
    model = TwoStreamDetector(spec=spec, use_cem=False, aux_mode="off")
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, None, train=False)
    out = model.apply(v, x, None, train=False)
    assert len(out["train_outs"]) == 4
    assert out["train_outs"][3].shape[2] == 128 // 64


def test_baseline_config_scales_shape_check():
    """The BASELINE.json smoke configs at their stated scales (x+mamba,
    m two-stream, l+fourier) build and produce correctly-shaped decodes —
    shape-level (jax.eval_shape, no compile) so all three stay cheap."""
    import jax
    import jax.numpy as jnp
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import get_model_spec

    for name in ["yolov5x_mamba", "yolov5m_gpt4", "yolov5l_fuse3_fourier"]:
        spec = get_model_spec(name, nc=6)
        model = TwoStreamDetector(spec=spec, aux_mode="off")
        x = jax.ShapeDtypeStruct((2, 128, 128, 3), jnp.float32)

        def init_out(rng, a, b):
            return model.init_with_output(rng, a, b, train=False)

        rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
        out, _ = jax.eval_shape(init_out, {"params": rng}, x, x)
        n_anchors = sum(3 * (128 // s) ** 2 for s in spec.strides)
        assert out["pred"].shape == (2, n_anchors, 11), (name,
                                                         out["pred"].shape)


def test_truncate_at_matches_full_intermediate():
    """truncate_at=k returns exactly the layer-k output of the full forward
    (diagnostic contract for tools/stage_profile.py prefix deltas)."""
    import jax

    spec = two_stream_spec("t", "gpt4", nc=2, fusion_layers=2)
    full = TwoStreamDetector(spec=spec, aux_mode="off")
    rgb = jnp.linspace(0, 1, 2 * 64 * 64 * 3,
                       dtype=jnp.float32).reshape(2, 64, 64, 3)
    ir = rgb[:, ::-1]
    variables = full.init({"params": jax.random.PRNGKey(0)}, rgb, ir,
                          train=False)
    _, state = full.apply(variables, rgb, ir, train=False,
                          capture_intermediates=True, mutable=["intermediates"])
    inter = state["intermediates"]
    # layer 5: the IR backbone's P2 C3 (single-output module)
    ref5 = inter["l5_C3"]["__call__"][0]
    trunc = TwoStreamDetector(spec=spec, aux_mode="off", truncate_at=5)
    out = trunc.apply(variables, rgb, ir, train=False)
    assert set(out) == {"trunc", "aux"}
    np.testing.assert_allclose(np.asarray(out["trunc"]), np.asarray(ref5),
                               rtol=1e-5, atol=1e-5)
    # layer 6 (GPT fusion) returns a two-stream tuple
    out6 = TwoStreamDetector(spec=spec, aux_mode="off", truncate_at=6).apply(
        variables, rgb, ir, train=False)
    assert isinstance(out6["trunc"], tuple) and len(out6["trunc"]) == 2
