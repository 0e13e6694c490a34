"""Cross-implementation parity of the mAP-critical metric chain against the
reference's own numpy/torch code (utils/metrics.py, utils/general.py).

The mAP acceptance gate (BASELINE.md: within 0.5 of the reference on M3FD)
depends on ap_per_class, compute_ap and the CIoU family being numerically
identical — these tests feed both implementations the same random inputs
and require matching outputs.
"""

import os
import sys
import types

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")


@pytest.fixture(scope="module")
def ref_modules():
    sys.path.insert(0, REF)
    # reference utils.general imports torchvision (not installed) and thop
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        for sub in ("ops", "models", "utils", "transforms"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        tv.__version__ = "0.0-stub"
        sys.modules["torchvision"] = tv
    for name in ("thop", "torchsummary"):
        stub = types.ModuleType(name)
        stub.profile = lambda *a, **k: (0.0, 0.0)
        stub.clever_format = lambda *a, **k: ("0", "0")
        stub.summary = lambda *a, **k: None
        sys.modules.setdefault(name, stub)
    from utils import general as ref_general  # noqa: E402
    from utils import metrics as ref_metrics  # noqa: E402
    return ref_metrics, ref_general


def _random_stats(rng, n=600, m=200, nc=5, niou=10):
    """Random eval stats shaped like test.py:231 accumulates them."""
    conf = rng.uniform(0.01, 1.0, n)
    pred_cls = rng.integers(0, nc, n).astype(np.float64)
    # correlate tp with conf so PR curves are non-degenerate; monotone
    # columns mimic decreasing IoU thresholds
    base = rng.uniform(0, 1, n) < np.clip(conf * 1.2, 0, 1)
    tp = np.zeros((n, niou), bool)
    for j in range(niou):
        tp[:, j] = base & (rng.uniform(0, 1, n) > j / (niou + 2))
    target_cls = rng.integers(0, nc, m).astype(np.float64)
    return tp, conf, pred_cls, target_cls


def test_ap_per_class_matches_reference(ref_modules):
    ref_metrics, _ = ref_modules
    from mmidet_tpu.eval.metrics import ap_per_class
    rng = np.random.default_rng(0)
    for seed in range(3):
        tp, conf, pred_cls, target_cls = _random_stats(
            np.random.default_rng(seed))
        p0, r0, ap0, f10, c0 = ref_metrics.ap_per_class(
            tp, conf, pred_cls, target_cls)
        p1, r1, ap1, f11, c1 = ap_per_class(tp, conf, pred_cls, target_cls)
        np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
        np.testing.assert_allclose(ap1, ap0, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(p1, p0, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(r1, r0, rtol=1e-10, atol=1e-12)
        np.testing.assert_allclose(f11, f10, rtol=1e-10, atol=1e-12)
    # class present in targets but never predicted (zero row) + vice versa
    tp, conf, pred_cls, target_cls = _random_stats(rng, nc=4)
    target_cls = np.concatenate([target_cls, [7.0]])  # never predicted
    p0, r0, ap0, f10, c0 = ref_metrics.ap_per_class(
        tp, conf, pred_cls, target_cls)
    from mmidet_tpu.eval.metrics import ap_per_class as ours
    p1, r1, ap1, f11, c1 = ours(tp, conf, pred_cls, target_cls)
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_allclose(ap1, ap0, rtol=1e-10, atol=1e-12)


def test_compute_ap_matches_reference(ref_modules):
    ref_metrics, _ = ref_modules
    from mmidet_tpu.eval.metrics import compute_ap
    rng = np.random.default_rng(1)
    for _ in range(5):
        n = 50
        recall = np.sort(rng.uniform(0, 1, n))
        precision = rng.uniform(0, 1, n)
        a0 = ref_metrics.compute_ap(recall, precision)[0]
        a1 = compute_ap(recall, precision)
        a1 = a1[0] if isinstance(a1, tuple) else a1
        np.testing.assert_allclose(a1, a0, rtol=1e-12)


def test_fitness_matches_reference(ref_modules):
    ref_metrics, _ = ref_modules
    from mmidet_tpu.eval.metrics import fitness
    x = np.random.default_rng(2).uniform(0, 1, (3, 7))
    np.testing.assert_allclose(np.asarray(fitness(x)),
                               ref_metrics.fitness(x), rtol=1e-12)


@pytest.mark.parametrize("mode", ["iou", "GIoU", "DIoU", "CIoU"])
def test_bbox_iou_matches_reference(ref_modules, mode):
    """Elementwise IoU family vs reference general.py:403-447 (the CIoU
    branch is the box-loss term, so this is loss-level parity too)."""
    _, ref_general = ref_modules
    import jax.numpy as jnp
    from mmidet_tpu.ops.boxes import bbox_iou
    rng = np.random.default_rng(3)
    n = 257
    xy = rng.uniform(0, 100, (2, n, 2))
    wh = rng.uniform(0.5, 50, (2, n, 2))
    b1 = np.concatenate([xy[0], wh[0]], -1)  # xywh
    b2 = np.concatenate([xy[1], wh[1]], -1)
    kw = {mode: True} if mode != "iou" else {}
    # reference takes box1 as (4, n) (the caller transposes, loss.py:134)
    # and box2 as (n, 4) (transposed internally)
    ref = ref_general.bbox_iou(torch.tensor(b1.T, dtype=torch.float64),
                               torch.tensor(b2, dtype=torch.float64),
                               x1y1x2y2=False, **kw)
    ours = bbox_iou(jnp.asarray(b1), jnp.asarray(b2), xywh=True, **kw)
    np.testing.assert_allclose(np.asarray(ours, np.float64),
                               ref.numpy(), rtol=2e-5, atol=2e-6)


def _ref_match(pred, labels, iouv):
    """Reference-faithful TP assignment (test.py:198-231 semantics,
    re-expressed in numpy): per-class greedy best-IoU matching with one
    detected-target set across classes, early exit only when EVERY label
    in the image is matched."""
    from mmidet_tpu.ops.boxes import box_iou
    correct = np.zeros((pred.shape[0], iouv.shape[0]), bool)
    if not len(labels) or not len(pred):
        return correct
    detected = []
    for c in np.unique(labels[:, 0]):
        ti = np.nonzero(labels[:, 0] == c)[0]
        pi = np.nonzero(pred[:, 5] == c)[0]
        if not pi.size:
            continue
        ious = np.asarray(box_iou(pred[pi, :4], labels[ti, 1:5]))
        best = ious.argmax(1)
        best_iou = ious[np.arange(len(pi)), best]
        for j in np.nonzero(best_iou > iouv[0])[0]:
            d = int(ti[best[j]])
            if d not in detected:
                detected.append(d)
                correct[pi[j]] = best_iou[j] > iouv
                if len(detected) == len(labels):  # nl, NOT len(ti)
                    break
    return correct


def test_match_predictions_matches_reference_semantics():
    """Random multi-class scenes + the specific early-break trap: when an
    earlier class already filled the detected set to the size of the
    current class's target count, matching must CONTINUE (the reference
    exits only once all nl labels are matched, test.py:228)."""
    from mmidet_tpu.eval.metrics import match_predictions
    iouv = np.linspace(0.5, 0.95, 10)

    # early-break trap: class 0 has 1 target (matched), class 1 has 2
    # targets and 2 valid predictions — both must become TPs
    labels = np.array([[0, 0, 0, 10, 10],
                       [1, 20, 20, 30, 30],
                       [1, 40, 40, 50, 50]], np.float64)
    pred = np.array([[0, 0, 10, 10, 0.9, 0],
                     [20, 20, 30, 30, 0.8, 1],
                     [40, 40, 50, 50, 0.7, 1]], np.float64)
    got = match_predictions(pred, labels, iouv)
    assert got.all(), "all three exact-overlap predictions must be TPs"

    rng = np.random.default_rng(5)
    for _ in range(20):
        m = rng.integers(1, 12)
        n = rng.integers(1, 24)
        lxy = rng.uniform(0, 80, (m, 2))
        labels = np.concatenate([rng.integers(0, 3, (m, 1)), lxy,
                                 lxy + rng.uniform(4, 30, (m, 2))], -1)
        # predictions: perturbed copies of labels + noise boxes
        rows = []
        for _ in range(n):
            if rng.uniform() < 0.7:
                t = labels[rng.integers(0, m)]
                box = t[1:5] + rng.normal(0, 2.0, 4)
                rows.append([*box, rng.uniform(0.1, 1), t[0]])
            else:
                xy = rng.uniform(0, 80, 2)
                rows.append([*xy, *(xy + rng.uniform(4, 30, 2)),
                             rng.uniform(0.1, 1), rng.integers(0, 3)])
        pred = np.asarray(rows, np.float64)
        np.testing.assert_array_equal(
            match_predictions(pred, labels, iouv),
            _ref_match(pred, labels, iouv))


def test_confusion_matrix_matches_reference(ref_modules):
    """ConfusionMatrix.process_batch vs reference metrics.py:111-183 on
    random multi-class scenes (matrix must be identical)."""
    ref_metrics, _ = ref_modules
    from mmidet_tpu.eval.metrics import ConfusionMatrix
    rng = np.random.default_rng(6)
    nc = 4
    ours = ConfusionMatrix(nc)
    ref = ref_metrics.ConfusionMatrix(nc)
    for _ in range(10):
        m = rng.integers(1, 10)
        n = rng.integers(1, 20)
        lxy = rng.uniform(0, 80, (m, 2))
        labels = np.concatenate([rng.integers(0, nc, (m, 1)), lxy,
                                 lxy + rng.uniform(4, 30, (m, 2))], -1)
        rows = []
        for _ in range(n):
            if rng.uniform() < 0.6:
                t = labels[rng.integers(0, m)]
                rows.append([*(t[1:5] + rng.normal(0, 2.0, 4)),
                             rng.uniform(0.1, 1), rng.integers(0, nc)])
            else:
                xy = rng.uniform(0, 80, 2)
                rows.append([*xy, *(xy + rng.uniform(4, 30, 2)),
                             rng.uniform(0.1, 1), rng.integers(0, nc)])
        det = np.asarray(rows, np.float32)
        ours.process_batch(det, labels.astype(np.float32))
        ref.process_batch(torch.tensor(det),
                          torch.tensor(labels, dtype=torch.float32))
    np.testing.assert_array_equal(ours.matrix, ref.matrix.astype(np.int64))


def test_one_cycle_epoch_factor_matches_reference(ref_modules):
    """Our cosine epoch factor vs reference one_cycle(1, lrf, epochs)
    (general.py:240, used as the LambdaLR at train.py:593)."""
    _, ref_general = ref_modules
    from mmidet_tpu.train.schedule import ScheduleConfig, _lf
    for lrf, epochs in ((0.2, 100), (0.01, 300), (0.5, 7)):
        cfg = ScheduleConfig(lrf=lrf, epochs=epochs)
        lf = ref_general.one_cycle(1, lrf, epochs)
        for e in range(0, epochs + 1, max(epochs // 7, 1)):
            np.testing.assert_allclose(float(_lf(cfg, e)), lf(e),
                                       rtol=1e-6)


def test_scale_coords_matches_reference(ref_modules):
    _, ref_general = ref_modules
    import jax.numpy as jnp
    from mmidet_tpu.ops.boxes import scale_coords
    rng = np.random.default_rng(8)
    img1, img0 = (640, 640), (480, 607)
    xy = rng.uniform(0, 600, (30, 2))
    coords = np.concatenate([xy, xy + rng.uniform(1, 40, (30, 2))],
                            -1).astype(np.float64)
    ref = ref_general.scale_coords(img1, torch.tensor(coords.copy()), img0)
    ours = scale_coords(img1, jnp.asarray(coords), img0)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-6, atol=1e-6)


def _greedy_nms_torch(boxes, scores, iou_thres):
    """Exact torchvision.ops.nms semantics (greedy by score, suppress
    IoU > thres, return kept indices score-descending) in plain torch —
    torchvision isn't installed in this image, so the stub gets a real
    implementation for the pipeline-parity test below."""
    order = torch.argsort(scores, descending=True)
    keep = []
    while order.numel():
        i = order[0]
        keep.append(i.item())
        if order.numel() == 1:
            break
        rest = order[1:]
        x1 = torch.maximum(boxes[i, 0], boxes[rest, 0])
        y1 = torch.maximum(boxes[i, 1], boxes[rest, 1])
        x2 = torch.minimum(boxes[i, 2], boxes[rest, 2])
        y2 = torch.minimum(boxes[i, 3], boxes[rest, 3])
        inter = (x2 - x1).clamp(0) * (y2 - y1).clamp(0)
        a1 = ((boxes[i, 2] - boxes[i, 0])
              * (boxes[i, 3] - boxes[i, 1]))
        a2 = ((boxes[rest, 2] - boxes[rest, 0])
              * (boxes[rest, 3] - boxes[rest, 1]))
        iou = inter / (a1 + a2 - inter)
        order = rest[iou <= iou_thres]
    return torch.tensor(keep, dtype=torch.long)


@pytest.mark.parametrize("multi_label", [False, True])
def test_nms_pipeline_matches_reference(ref_modules, multi_label):
    """Our fixed-shape NMS vs the reference's full non_max_suppression
    orchestration (conf filter, obj*cls conf, multi-label expansion,
    class-offset batching, max_det) with the greedy core injected into
    the torchvision stub. Ref: general.py:486-580."""
    _, ref_general = ref_modules
    import jax.numpy as jnp
    sys.modules["torchvision"].ops.nms = _greedy_nms_torch
    from mmidet_tpu.ops.nms import non_max_suppression
    rng = np.random.default_rng(7)
    b, n, nc = 2, 120, 4
    xy = rng.uniform(40, 600, (b, n, 2))
    wh = rng.uniform(8, 80, (b, n, 2))
    obj = rng.uniform(0, 1, (b, n, 1)) ** 2
    cls = rng.uniform(0, 1, (b, n, nc))
    pred = np.concatenate([xy, wh, obj, cls], -1).astype(np.float32)

    ref_out = ref_general.non_max_suppression(
        torch.tensor(pred), conf_thres=0.25, iou_thres=0.45,
        multi_label=multi_label)
    dets, valid = non_max_suppression(jnp.asarray(pred), 0.25, 0.45,
                                      multi_label=multi_label)
    dets, valid = np.asarray(dets), np.asarray(valid)
    for i in range(b):
        r = ref_out[i].numpy()
        o = dets[i][valid[i]]
        assert o.shape == r.shape
        # both are conf-descending; compare rows directly
        np.testing.assert_allclose(o[:, 4], r[:, 4], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(o[:, :4], r[:, :4], rtol=1e-4,
                                   atol=1e-3)
        np.testing.assert_array_equal(o[:, 5].astype(int),
                                      r[:, 5].astype(int))


@pytest.mark.parametrize("hw", [(480, 640), (640, 480), (97, 211),
                                (800, 800)])
def test_letterbox_geometry_matches_reference(ref_modules, hw):
    """letterbox_np vs reference letterbox (datasets.py:2016) in the square
    auto=False mode the eval/detect paths use: the GEOMETRY (ratio, dw, dh,
    content placement) must be exact — scale_coords inverts it, so any
    drift shifts every evaluated box. Pixels may differ slightly
    (PIL bilinear vs cv2 INTER_LINEAR), asserted loosely."""
    import importlib
    ref_ds = importlib.import_module("utils.datasets")
    from mmidet_tpu.data.datasets import letterbox_np
    # smooth gradient image: PIL's antialiased bilinear and cv2's
    # INTER_LINEAR agree closely on smooth content; random noise would
    # only measure the (documented) filter difference on downscale
    yy, xx = np.mgrid[0:hw[0], 0:hw[1]]
    img = np.stack([(xx * 255 / hw[1]), (yy * 255 / hw[0]),
                    ((xx + yy) * 255 / (hw[0] + hw[1]))],
                   -1).astype(np.uint8)
    r_img, r_ratio, (r_dw, r_dh) = ref_ds.letterbox(
        img, (640, 640), auto=False)
    o_img, o_ratio, (o_dw, o_dh) = letterbox_np(img, (640, 640))
    ratio = r_ratio[0] if isinstance(r_ratio, tuple) else r_ratio
    assert o_ratio == pytest.approx(ratio, abs=1e-9)
    assert (o_dw, o_dh) == pytest.approx((r_dw, r_dh), abs=1e-9)
    assert o_img.shape == r_img.shape
    # the true pad region (from the shared geometry) is 114 in BOTH
    top, left = int(round(r_dh - 0.1)), int(round(r_dw - 0.1))
    nh = int(round(hw[0] * ratio))
    nw = int(round(hw[1] * ratio))
    for im in (o_img, r_img):
        assert np.all(im[:top] == 114) and np.all(im[top + nh:] == 114)
        assert np.all(im[:, :left] == 114)
        assert np.all(im[:, left + nw:] == 114)
    diff = np.abs(o_img.astype(int) - r_img.astype(int))
    assert diff.mean() < 8.0


def test_box_iou_pairwise_matches_reference(ref_modules):
    _, ref_general = ref_modules
    import jax.numpy as jnp
    from mmidet_tpu.ops.boxes import box_iou
    rng = np.random.default_rng(4)
    a = rng.uniform(0, 80, (40, 2))
    b = rng.uniform(0, 80, (60, 2))
    boxes1 = np.concatenate([a, a + rng.uniform(1, 40, (40, 2))], -1)
    boxes2 = np.concatenate([b, b + rng.uniform(1, 40, (60, 2))], -1)
    ref = ref_general.box_iou(torch.tensor(boxes1, dtype=torch.float32),
                              torch.tensor(boxes2, dtype=torch.float32))
    ours = box_iou(jnp.asarray(boxes1), jnp.asarray(boxes2))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("multi_label", [False, True])
def test_merge_nms_matches_reference(ref_modules, multi_label):
    """merge=True vs the reference's merge-NMS (general.py:566-574):
    weighted-mean box merging over the candidate pool + the ``redundant``
    drop of kept boxes with no second supporting candidate."""
    _, ref_general = ref_modules
    import jax.numpy as jnp
    sys.modules["torchvision"].ops.nms = _greedy_nms_torch
    from mmidet_tpu.ops.nms import non_max_suppression
    rng = np.random.default_rng(11)
    b, n, nc = 2, 120, 4
    # clustered boxes so merging actually moves coordinates: half the rows
    # are jittered copies of 20 seed boxes
    seeds_xy = rng.uniform(60, 560, (20, 2))
    seeds_wh = rng.uniform(20, 70, (20, 2))
    xy = np.concatenate([
        seeds_xy[rng.integers(0, 20, (n // 2,))] + rng.normal(0, 3, (n // 2, 2)),
        rng.uniform(40, 600, (n - n // 2, 2))])[None].repeat(b, 0)
    wh = np.concatenate([
        seeds_wh[rng.integers(0, 20, (n // 2,))] + rng.normal(0, 2, (n // 2, 2)),
        rng.uniform(8, 80, (n - n // 2, 2))])[None].repeat(b, 0)
    xy += rng.normal(0, 1, xy.shape)
    obj = rng.uniform(0, 1, (b, n, 1)) ** 2
    cls = rng.uniform(0, 1, (b, n, nc))
    pred = np.concatenate([xy, np.abs(wh), obj, cls], -1).astype(np.float32)

    # the reference hardcodes ``merge = False`` inside the function body
    # (general.py:505): exec a copy of its own source with the switch ON
    import inspect
    import textwrap
    src = textwrap.dedent(inspect.getsource(ref_general.non_max_suppression))
    assert "merge = False" in src
    ns = dict(vars(ref_general))
    exec(src.replace("merge = False", "merge = True"), ns)
    ref_out = ns["non_max_suppression"](
        torch.tensor(pred), conf_thres=0.25, iou_thres=0.45,
        multi_label=multi_label)
    dets, valid = non_max_suppression(jnp.asarray(pred), 0.25, 0.45,
                                      multi_label=multi_label, merge=True)
    dets, valid = np.asarray(dets), np.asarray(valid)
    for i in range(b):
        r = ref_out[i].numpy()
        o = dets[i][valid[i]]
        assert o.shape == r.shape
        np.testing.assert_allclose(o[:, 4], r[:, 4], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(o[:, :4], r[:, :4], rtol=1e-4, atol=1e-2)
        np.testing.assert_array_equal(o[:, 5].astype(int),
                                      r[:, 5].astype(int))


def test_merge_nms_single_candidate_kept():
    """n==1 is outside the reference's ``1 < n < 3e3`` merge gate: the lone
    box must survive (a naive redundant-drop would kill it, since its only
    match is itself)."""
    import jax.numpy as jnp
    from mmidet_tpu.ops.nms import non_max_suppression
    pred = np.zeros((1, 8, 7), np.float32)
    pred[0, 0] = [100, 100, 40, 40, 0.9, 0.8, 0.1]
    dets, valid = non_max_suppression(jnp.asarray(pred), 0.25, 0.45,
                                      merge=True)
    assert int(np.asarray(valid).sum()) == 1
    d = np.asarray(dets)[0, 0]
    assert d[5] == 0 and d[4] > 0.7
