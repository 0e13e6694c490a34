"""TTA (augmented inference) parity + NMS classes filter.

The reference's single-stream ``Model.forward(augment=True)``
(models/yolo.py:112-130) is the working TTA implementation (the two-stream
one crashes — yolo_test.py:149 drops the IR arg), so parity is checked
against it with converted weights.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

REF = "/root/reference"

MINI_SS_CFG = {
    "nc": 2,
    "depth_multiple": 1.0,
    "width_multiple": 1.0,
    "anchors": [[10, 13, 16, 30, 33, 23],
                [30, 61, 62, 45, 59, 119],
                [116, 90, 156, 198, 373, 326]],
    "backbone": [
        [-1, 1, "Focus", [8, 3]],
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 1, "C3", [16]],
        [-1, 1, "Conv", [24, 3, 2]],
        [-1, 1, "C3", [24]],
        [-1, 1, "Conv", [32, 3, 2]],
        [-1, 1, "C3", [32]],
        [-1, 1, "Conv", [48, 3, 2]],
        [-1, 1, "SPP", [48, [5, 9, 13]]],
        [-1, 1, "C3", [48, False]],
    ],
    "head": [
        [-1, 1, "Conv", [32, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 6], 1, "Concat", [1]],
        [-1, 1, "C3", [32, False]],
        [-1, 1, "Conv", [24, 1, 1]],
        [-1, 1, "nn.Upsample", [None, 2, "nearest"]],
        [[-1, 4], 1, "Concat", [1]],
        [-1, 1, "C3", [24, False]],
        [-1, 1, "Conv", [24, 3, 2]],
        [[-1, 14], 1, "Concat", [1]],
        [-1, 1, "C3", [32, False]],
        [-1, 1, "Conv", [32, 3, 2]],
        [[-1, 10], 1, "Concat", [1]],
        [-1, 1, "C3", [48, False]],
        [[17, 20, 23], 1, "Detect", ["nc", "anchors"]],
    ],
}


@pytest.mark.skipif(not os.path.isdir(REF),
                    reason="reference checkout not available")
def test_tta_matches_reference_single_stream():
    torch = pytest.importorskip("torch")
    sys.path.insert(0, REF)
    for name in ("thop", "torchsummary"):
        stub = types.ModuleType(name)
        stub.profile = lambda *a, **k: (0.0, 0.0)
        stub.clever_format = lambda *a, **k: ("0", "0")
        stub.summary = lambda *a, **k: None
        sys.modules.setdefault(name, stub)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        for sub in ("ops", "models", "utils", "transforms"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        tv.__version__ = "0.0-stub"
        sys.modules["torchvision"] = tv
    import copy

    from models.yolo import Model  # noqa: E402 (reference import)

    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.spec import load_yolo_yaml
    from mmidet_tpu.models.tta import forward_tta
    from mmidet_tpu.train.checkpoint import convert_torch_state_dict

    torch.manual_seed(0)
    ref = Model(copy.deepcopy(MINI_SS_CFG), ch=3, nc=2).eval().float()

    cfg = {**MINI_SS_CFG,
           "head": [row if row[2] != "Detect" else
                    [row[0], row[1], "Detect", []]
                    for row in MINI_SS_CFG["head"]]}
    spec = load_yolo_yaml(cfg)
    model = TwoStreamDetector(spec=spec, use_cem=False, aux_mode="off")
    x0 = jnp.zeros((1, 64, 64, 3))
    template = model.init({"params": jax.random.PRNGKey(0)}, x0, None,
                          train=False)
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    variables = convert_torch_state_dict(template, sd, strict=True)

    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (2, 64, 64, 3)).astype(np.float32)
    with torch.no_grad():
        t_pred, _ = ref(torch.from_numpy(img).permute(0, 3, 1, 2),
                        augment=True)

    pred = forward_tta(
        lambda r: model.apply(variables, r, None, train=False)["pred"],
        jnp.asarray(img), None, gs=int(max(spec.strides)))
    np.testing.assert_allclose(np.asarray(pred), t_pred.numpy(),
                               rtol=2e-3, atol=2e-3)


def test_tta_two_stream_shapes():
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.tta import forward_tta
    from mmidet_tpu.models.zoo import two_stream_spec

    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    r = jnp.zeros((1, 64, 64, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, r, r, train=False)

    def fwd(rr, ii):
        return model.apply(v, rr, ii, train=False)["pred"]

    plain = fwd(r, r)
    tta = forward_tta(fwd, r, r, gs=int(max(spec.strides)))
    assert tta.shape[0] == 1 and tta.shape[2] == plain.shape[2]
    assert tta.shape[1] > plain.shape[1]  # three legs concatenated
    assert np.isfinite(np.asarray(tta)).all()
    # leg 0 is the plain forward verbatim
    np.testing.assert_allclose(np.asarray(tta[:, :plain.shape[1]]),
                               np.asarray(plain), rtol=1e-6)


def test_nms_classes_filter():
    from mmidet_tpu.ops.nms import non_max_suppression

    # two confident boxes of classes 0 and 1
    pred = np.zeros((1, 8, 7), np.float32)
    pred[0, 0] = [20, 20, 10, 10, 0.9, 0.99, 0.01]   # class 0
    pred[0, 1] = [60, 60, 10, 10, 0.9, 0.01, 0.99]   # class 1
    dets, valid = non_max_suppression(jnp.asarray(pred), 0.25, 0.45)
    assert int(valid.sum()) == 2
    dets, valid = non_max_suppression(jnp.asarray(pred), 0.25, 0.45,
                                      classes=(1,))
    d = np.asarray(dets)[0][np.asarray(valid)[0]]
    assert len(d) == 1 and d[0, 5] == 1.0
