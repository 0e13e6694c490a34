"""Detection-loss numerical parity against the reference's ComputeLoss
(read-only import, skipped without the reference checkout).

Feeds identical random predictions and targets through the reference
``utils/loss.py`` ComputeLoss and our fixed-shape ``compute_loss`` and
compares box/obj/cls components — validating the padded candidate
reformulation end-to-end (assignment, gathers, CIoU, BCE weighting,
balance, batch scaling)."""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


def _ref_compute_loss():
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
        sys.modules["torchvision"] = tv
    from utils.loss import ComputeLoss  # noqa: E402
    return ComputeLoss


HYP = {"box": 0.05, "cls": 0.5, "cls_pw": 1.0, "obj": 1.0, "obj_pw": 1.0,
       "anchor_t": 4.0, "fl_gamma": 0.0}
ANCHORS_PX = np.asarray([[[10, 13], [16, 30], [33, 23]],
                         [[30, 61], [62, 45], [59, 119]],
                         [[116, 90], [156, 198], [373, 326]]], np.float32)
STRIDES = np.asarray([8, 16, 32], np.float32)


class _FakeDetect(torch.nn.Module):
    def __init__(self, nc):
        super().__init__()
        self.na, self.nc, self.nl = 3, nc, 3
        self.anchors = torch.from_numpy(
            ANCHORS_PX / STRIDES[:, None, None])
        self.stride = torch.from_numpy(STRIDES)


class _FakeModel(torch.nn.Module):
    def __init__(self, nc):
        super().__init__()
        self.det = _FakeDetect(nc)
        self.model = [None] * 0
        self.hyp = HYP
        self.gr = 1.0
        self._p = torch.nn.Parameter(torch.zeros(1))

    @property
    def model(self):
        return self._model

    @model.setter
    def model(self, v):
        self._model = _List(self.det)


class _List:
    def __init__(self, det):
        self.det = det

    def __getitem__(self, i):
        return self.det


def _rand_case(seed, bsz=3, nc=4, nt_per_img=(2, 0, 3)):
    rng = np.random.default_rng(seed)
    grids = (8, 4, 2)
    preds = [rng.standard_normal((bsz, 3, g, g, nc + 5)).astype(np.float32)
             for g in grids]
    rows = []
    t = np.zeros((bsz, 6, 5), np.float32)
    m = np.zeros((bsz, 6), bool)
    for b, n in enumerate(nt_per_img):
        for k in range(n):
            cls = rng.integers(0, nc)
            cx, cy = rng.uniform(0.15, 0.85, 2)
            w, h = rng.uniform(0.1, 0.5, 2)
            rows.append([b, cls, cx, cy, w, h])
            t[b, k] = [cls, cx, cy, w, h]
            m[b, k] = True
    targets_ref = np.asarray(rows, np.float32) if rows else \
        np.zeros((0, 6), np.float32)
    return preds, targets_ref, t, m


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_components_match_reference(seed):
    ComputeLoss = _ref_compute_loss()
    nc = 4
    preds, targets_ref, t_pad, m_pad = _rand_case(seed, nc=nc)

    model = _FakeModel(nc)
    loss_fn = ComputeLoss(model)
    with torch.no_grad():
        total, comps = loss_fn(
            [torch.from_numpy(p) for p in preds],
            torch.from_numpy(targets_ref), [], Flag=False)
    ref_box, ref_obj, ref_cls, _ = [float(x) for x in comps]

    from mmidet_tpu.losses.detection import LossHyp, compute_loss
    anchors = jnp.asarray(ANCHORS_PX / STRIDES[:, None, None])
    ours_total, m = compute_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(t_pad),
        jnp.asarray(m_pad), anchors, hyp=LossHyp())

    np.testing.assert_allclose(float(m["box"]), ref_box, rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(float(m["obj"]), ref_obj, rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(float(m["cls"]), ref_cls, rtol=2e-3,
                               atol=1e-5)
    np.testing.assert_allclose(float(ours_total), float(total), rtol=2e-3)


@pytest.mark.parametrize("seed", [3, 4])
def test_duplicate_cell_objectness_matches_reference(seed):
    """Targets forced onto the SAME grid cell (same center, both passing
    the anchor gate with different wh): the reference's in-place tobj
    write keeps the LAST candidate's IoU — our two-scatter winner
    formulation must reproduce it exactly."""
    ComputeLoss = _ref_compute_loss()
    nc = 2
    rng = np.random.default_rng(seed)
    grids = (8, 4, 2)
    preds = [rng.standard_normal((2, 3, g, g, nc + 5)).astype(np.float32)
             for g in grids]
    # three targets per image; pairs 0/1 share the exact center cell
    rows, t = [], np.zeros((2, 6, 5), np.float32)
    m = np.zeros((2, 6), bool)
    for b in range(2):
        cx, cy = 0.4 + 0.05 * b, 0.6
        for k, (w, h) in enumerate([(0.2, 0.3), (0.35, 0.18),
                                    (0.6, 0.5)]):
            cls = rng.integers(0, nc)
            cxx = cx if k < 2 else 0.8  # 0 and 1 collide, 2 is elsewhere
            rows.append([b, cls, cxx, cy, w, h])
            t[b, k] = [cls, cxx, cy, w, h]
            m[b, k] = True
    targets_ref = np.asarray(rows, np.float32)

    model = _FakeModel(nc)
    loss_fn = ComputeLoss(model)
    with torch.no_grad():
        total, comps = loss_fn(
            [torch.from_numpy(p) for p in preds],
            torch.from_numpy(targets_ref), [], Flag=False)
    ref_obj = float(comps[1])

    from mmidet_tpu.losses.detection import LossHyp, compute_loss
    anchors = jnp.asarray(ANCHORS_PX / STRIDES[:, None, None])
    _, mm = compute_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(t),
        jnp.asarray(m), anchors, hyp=LossHyp())
    np.testing.assert_allclose(float(mm["obj"]), ref_obj, rtol=1e-4,
                               atol=1e-6)
