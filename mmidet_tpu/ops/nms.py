"""Fixed-shape, on-device non-maximum suppression for TPU.

Replaces ``torchvision.ops.nms`` + the dynamic-shape driver at reference
``utils/general.py:486-580`` with a jit-compatible formulation:

  * everything is padded/masked — output is always ``(max_det, 6)`` plus a
    validity count, so XLA compiles a single program for all batches;
  * the greedy loop is *selection-based*: ``max_det`` iterations, each picking
    the argmax-score candidate and suppressing its IoU neighbourhood.  This is
    O(max_det * K) instead of the O(K^2) IoU-matrix formulation, so the
    pre-NMS candidate pool K can stay large (reference uses max_nms=30000)
    without materialising a 30000x30000 matrix;
  * batched-per-class NMS uses the reference's class-offset trick
    (general.py:560-562): boxes are shifted by ``class_id * max_wh`` so boxes
    of different classes never overlap.

Candidate generation mirrors the reference driver:
  * conf = obj_conf * cls_conf (general.py:529)
  * multi_label: every (box, class) pair above conf_thres is a candidate
    (general.py:536-537); otherwise best-class-only (general.py:539-541)
  * top-K by confidence caps the pool (general.py:555-557).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.ops.boxes import xywh2xyxy


def _nms_single(boxes: jnp.ndarray, scores: jnp.ndarray, classes: jnp.ndarray,
                iou_thres: float, max_det: int, max_wh: float,
                agnostic: bool) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS on one image.

    boxes: (K, 4) xyxy; scores: (K,) with invalid candidates at -inf;
    classes: (K,) float class ids.
    Returns (keep_idx (max_det,), keep_valid (max_det,) bool).
    """
    k = boxes.shape[0]
    offset = jnp.zeros_like(classes) if agnostic else classes * max_wh
    oboxes = boxes + offset[:, None]
    x1, y1, x2, y2 = oboxes[:, 0], oboxes[:, 1], oboxes[:, 2], oboxes[:, 3]
    areas = (x2 - x1) * (y2 - y1)

    def body(state, _):
        active_scores = state
        j = jnp.argmax(active_scores)
        best = active_scores[j]
        valid = best > -jnp.inf
        # IoU of candidate j against the whole pool (O(K) per pick).
        xx1 = jnp.maximum(x1, x1[j])
        yy1 = jnp.maximum(y1, y1[j])
        xx2 = jnp.minimum(x2, x2[j])
        yy2 = jnp.minimum(y2, y2[j])
        inter = jnp.clip(xx2 - xx1, 0) * jnp.clip(yy2 - yy1, 0)
        iou = inter / (areas + areas[j] - inter + 1e-9)
        suppress = (iou > iou_thres) | (jnp.arange(k) == j)
        new_scores = jnp.where(valid & suppress, -jnp.inf, active_scores)
        return new_scores, (j, valid)

    _, (keep_idx, keep_valid) = jax.lax.scan(body, scores, None, length=max_det)
    return keep_idx, keep_valid


def _merge_boxes(cboxes, scores, classes, keep_idx, keep_valid, iou_thres,
                 max_wh, agnostic, out_boxes):
    """Fixed-shape merge-NMS (reference ``utils/general.py:566-574``).

    Kept box i is replaced by the score-weighted mean of every candidate
    whose class-offset IoU with it exceeds ``iou_thres`` (weighted over the
    UN-offset boxes, as the reference's ``x[:, :4]``); kept boxes whose
    match count is <=1 (self only) are dropped (the reference's
    ``redundant`` rule).  The whole transform is a no-op unless the valid
    candidate count n satisfies 1 < n < 3000 (reference gate at
    general.py:566)."""
    pool_valid = scores > -jnp.inf
    n = pool_valid.sum()
    offset = jnp.zeros_like(classes) if agnostic else classes * max_wh
    oboxes = cboxes + offset[:, None]
    kept_ob = oboxes[keep_idx]                      # (max_det, 4) offset
    x1 = jnp.maximum(kept_ob[:, None, 0], oboxes[None, :, 0])
    y1 = jnp.maximum(kept_ob[:, None, 1], oboxes[None, :, 1])
    x2 = jnp.minimum(kept_ob[:, None, 2], oboxes[None, :, 2])
    y2 = jnp.minimum(kept_ob[:, None, 3], oboxes[None, :, 3])
    inter = jnp.clip(x2 - x1, 0) * jnp.clip(y2 - y1, 0)
    area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area(kept_ob)[:, None] + area(oboxes)[None, :] - inter
    iou = inter / (union + 1e-9)
    match = (iou > iou_thres) & pool_valid[None, :]  # (max_det, K)
    w = jnp.where(match, scores, 0.0)
    merged = (w @ cboxes) / jnp.clip(w.sum(1, keepdims=True), 1e-9)
    apply = (n > 1) & (n < 3000)
    out_boxes = jnp.where(apply & keep_valid[:, None], merged, out_boxes)
    keep_valid = keep_valid & jnp.where(apply, match.sum(1) > 1, True)
    return out_boxes, keep_valid


@functools.partial(
    jax.jit,
    static_argnames=("conf_thres", "iou_thres", "max_det", "pre_nms_topk",
                     "multi_label", "agnostic", "max_wh", "classes", "merge"),
)
def non_max_suppression(prediction: jnp.ndarray,
                        conf_thres: float = 0.25,
                        iou_thres: float = 0.45,
                        max_det: int = 300,
                        pre_nms_topk: int = 4096,
                        multi_label: bool = False,
                        agnostic: bool = False,
                        max_wh: float = 4096.0,
                        classes: tuple | None = None,
                        merge: bool = False):
    """Batched fixed-shape NMS.

    Args:
      prediction: (B, N, 5+nc) decoded detector output — [cx, cy, w, h,
        obj_conf, cls_conf...] (the reference Detect inference format).
      pre_nms_topk: static pre-NMS candidate pool size (reference max_nms cap).
      merge: merge-NMS (reference general.py:566-574): each kept box becomes
        the confidence-weighted mean of every candidate it overlaps
        (IoU > iou_thres, class-offset space), and — the reference's
        ``redundant`` rule — kept boxes supported by no second candidate are
        dropped.  Applied only when 1 < n < 3000 candidates survive the
        confidence filter, exactly as the reference gates it.

    Returns:
      dets:  (B, max_det, 6) — [x1, y1, x2, y2, conf, cls], zero-padded.
      valid: (B, max_det) bool mask of real detections.
    """
    nc = prediction.shape[2] - 5
    use_multi = multi_label and nc > 1
    cls_keep = None
    if classes is not None:  # ref classes filter (general.py:540-542)
        sel = np.zeros((nc,), bool)
        sel[list(classes)] = True
        cls_keep = jnp.asarray(sel)

    def per_image(x):
        boxes_xywh = x[:, :4]
        obj = x[:, 4]
        cls_conf = x[:, 5:] * obj[:, None]  # conf = obj_conf * cls_conf
        if cls_keep is not None and use_multi:
            # multi-label: dropping disallowed (box, class) pairs up front
            # is exactly the reference's post-expansion row filter
            cls_conf = jnp.where(cls_keep[None, :], cls_conf, 0.0)
        boxes = xywh2xyxy(boxes_xywh)

        if use_multi:
            # every (box, class) pair is a candidate
            n, c = cls_conf.shape
            flat = cls_conf.reshape(-1)
            flat = jnp.where(flat > conf_thres, flat, -jnp.inf)
            k = min(pre_nms_topk, flat.shape[0])
            top, idx = jax.lax.top_k(flat, k)
            bidx = idx // c
            cidx = (idx % c).astype(jnp.float32)
            cboxes = boxes[bidx]
            scores = top
            classes = cidx
        else:
            # best-class mode: the argmax runs over ALL classes and rows
            # whose best class is disallowed are DROPPED (ref
            # general.py:543-545 filters after the argmax) — zeroing
            # before the argmax would re-assign the box to its best
            # allowed class, a detection the reference never emits
            conf = jnp.max(cls_conf, axis=1)
            cidx = jnp.argmax(cls_conf, axis=1)
            if cls_keep is not None:
                conf = jnp.where(cls_keep[cidx], conf, -jnp.inf)
            cidx = cidx.astype(jnp.float32)
            conf = jnp.where(conf > conf_thres, conf, -jnp.inf)
            k = min(pre_nms_topk, conf.shape[0])
            scores, idx = jax.lax.top_k(conf, k)
            cboxes = boxes[idx]
            classes = cidx[idx]

        keep_idx, keep_valid = _nms_single(
            cboxes, scores, classes, iou_thres, max_det, max_wh, agnostic)
        out_boxes = cboxes[keep_idx]
        out_scores = scores[keep_idx]
        out_classes = classes[keep_idx]
        if merge:
            out_boxes, keep_valid = _merge_boxes(
                cboxes, scores, classes, keep_idx, keep_valid, iou_thres,
                max_wh, agnostic, out_boxes)
        dets = jnp.concatenate(
            [out_boxes, out_scores[:, None], out_classes[:, None]], axis=1)
        dets = jnp.where(keep_valid[:, None], dets, 0.0)
        return dets, keep_valid

    return jax.vmap(per_image)(prediction)
