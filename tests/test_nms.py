import numpy as np
import jax.numpy as jnp

from mmidet_tpu.ops import non_max_suppression


def _make_pred(boxes_xywh, obj, cls_probs):
    """Assemble a (1, N, 5+nc) prediction tensor."""
    n = len(boxes_xywh)
    nc = len(cls_probs[0])
    out = np.zeros((1, n, 5 + nc), np.float32)
    out[0, :, :4] = boxes_xywh
    out[0, :, 4] = obj
    out[0, :, 5:] = cls_probs
    return jnp.asarray(out)


def test_nms_classes_filter_drops_not_reassigns():
    """Best-class mode with a classes filter: a box whose ARGMAX class is
    disallowed must be dropped (ref general.py:543-545 filters after the
    argmax), not re-assigned to its best allowed class."""
    pred = _make_pred(
        [[100, 100, 50, 50], [300, 300, 40, 40]],
        [1.0, 1.0],
        [[0.4, 0.6],   # best class 1 (disallowed) — must vanish
         [0.7, 0.2]],  # best class 0 (allowed) — kept
    )
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16,
                                      classes=(0,))
    dets, valid = np.asarray(dets[0]), np.asarray(valid[0])
    assert valid.sum() == 1
    assert dets[0, 5] == 0.0 and dets[0, 4] == np.float32(0.7)
    # multi-label mode: the allowed-class pair of the first box survives
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16,
                                      classes=(0,), multi_label=True)
    dets, valid = np.asarray(dets[0]), np.asarray(valid[0])
    assert valid.sum() == 2
    assert set(np.asarray(dets[valid][:, 5], int)) == {0}


def test_nms_suppresses_overlaps():
    # two heavily-overlapping boxes + one distant box, single class
    pred = _make_pred(
        [[100, 100, 50, 50], [102, 102, 50, 50], [300, 300, 40, 40]],
        [0.9, 0.8, 0.7],
        [[1.0], [1.0], [1.0]],
    )
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16)
    dets, valid = np.asarray(dets[0]), np.asarray(valid[0])
    assert valid.sum() == 2
    # best box first (score 0.9), then the distant one
    assert dets[0, 4] == np.float32(0.9)
    assert dets[1, 4] == np.float32(0.7)
    # xyxy of first: 100,100 center, 50x50
    np.testing.assert_allclose(dets[0, :4], [75, 75, 125, 125], atol=1e-3)


def test_nms_classes_do_not_suppress_each_other():
    # same box, two classes -> both survive batched (class-offset) NMS
    pred = _make_pred(
        [[100, 100, 50, 50], [100, 100, 50, 50]],
        [0.9, 0.8],
        [[1.0, 0.0], [0.0, 1.0]],
    )
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16)
    assert np.asarray(valid[0]).sum() == 2
    classes = sorted(np.asarray(dets[0][np.asarray(valid[0])][:, 5]).tolist())
    assert classes == [0.0, 1.0]


def test_nms_agnostic_suppresses_across_classes():
    pred = _make_pred(
        [[100, 100, 50, 50], [100, 100, 50, 50]],
        [0.9, 0.8],
        [[1.0, 0.0], [0.0, 1.0]],
    )
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16, agnostic=True)
    assert np.asarray(valid[0]).sum() == 1


def test_nms_conf_filter():
    pred = _make_pred(
        [[100, 100, 50, 50], [300, 300, 40, 40]],
        [0.9, 0.1],
        [[1.0], [1.0]],
    )
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16)
    assert np.asarray(valid[0]).sum() == 1


def test_nms_multi_label():
    # one box confidently two classes -> multi_label gives two detections
    pred = _make_pred(
        [[100, 100, 50, 50]],
        [0.9],
        [[0.9, 0.8]],
    )
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16,
                                      multi_label=True)
    assert np.asarray(valid[0]).sum() == 2
    # conf = obj * cls
    v = np.asarray(dets[0])
    np.testing.assert_allclose(sorted(v[:2, 4].tolist()),
                               [0.9 * 0.8, 0.9 * 0.9], atol=1e-5)


def test_nms_max_det_cap_and_padding():
    rng = np.random.default_rng(1)
    n = 64
    boxes = np.stack([rng.uniform(0, 600, n), rng.uniform(0, 600, n),
                      rng.uniform(600, 640, n), rng.uniform(600, 640, n)],
                     axis=1)  # big spread boxes, overlapping heavily
    # make them all distinct non-overlapping small boxes instead
    xs = (np.arange(n) % 8) * 80 + 40
    ys = (np.arange(n) // 8) * 80 + 40
    boxes = np.stack([xs, ys, np.full(n, 20), np.full(n, 20)], axis=1)
    pred = _make_pred(boxes, np.full(n, 0.9), np.ones((n, 1)))
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=128)
    valid = np.asarray(valid[0])
    assert valid.sum() == 10  # capped
    assert valid.all()


def test_nms_empty():
    pred = _make_pred([[100, 100, 50, 50]], [0.01], [[0.5]])
    dets, valid = non_max_suppression(pred, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16)
    assert np.asarray(valid[0]).sum() == 0
    np.testing.assert_allclose(np.asarray(dets[0]), 0.0)


def test_nms_batch_independent():
    pred1 = _make_pred([[100, 100, 50, 50]], [0.9], [[1.0]])
    pred2 = _make_pred([[100, 100, 50, 50]], [0.01], [[1.0]])
    batch = jnp.concatenate([pred1, pred2], axis=0)
    dets, valid = non_max_suppression(batch, conf_thres=0.25, iou_thres=0.45,
                                      max_det=10, pre_nms_topk=16)
    v = np.asarray(valid)
    assert v[0].sum() == 1 and v[1].sum() == 0
