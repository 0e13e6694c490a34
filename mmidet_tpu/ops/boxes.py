"""Box geometry: coordinate conversions and the IoU family (IoU/GIoU/DIoU/CIoU).

Functional parity surface: reference ``utils/general.py:311-483``
(xyxy2xywh, xywh2xyxy, xywhn2xyxy, scale_coords, clip_coords, bbox_iou,
box_iou, wh_iou).  All functions here are pure jnp, broadcast-friendly, and
safe to use inside jit/pjit — no data-dependent shapes.

Unlike the reference's ``bbox_iou`` (which takes box1 as a 4xN tensor and
transposes box2), this API is elementwise with NumPy broadcasting: boxes are
``(..., 4)`` and the result is ``(...)``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from jax import lax


def xyxy2xywh(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [x1,y1,x2,y2] -> [cx,cy,w,h]. Ref: general.py:311."""
    x1, y1, x2, y2 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def xywh2xyxy(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) [cx,cy,w,h] -> [x1,y1,x2,y2]. Ref: general.py:321."""
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xywhn2xyxy(x: jnp.ndarray, w: float = 640, h: float = 640,
               padw: float = 0, padh: float = 0) -> jnp.ndarray:
    """Normalised [cx,cy,w,h] -> pixel [x1,y1,x2,y2]. Ref: general.py:331."""
    cx, cy, bw, bh = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [w * (cx - bw / 2) + padw, h * (cy - bh / 2) + padh,
         w * (cx + bw / 2) + padw, h * (cy + bh / 2) + padh], axis=-1)


def clip_coords(boxes: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to image (height, width). Ref: general.py:395."""
    h, w = shape
    lo = jnp.zeros((4,), boxes.dtype)
    hi = jnp.asarray([w, h, w, h], boxes.dtype)
    return jnp.clip(boxes, lo, hi)


def scale_coords(img1_shape: tuple[int, int], coords: jnp.ndarray,
                 img0_shape: tuple[int, int], ratio_pad=None) -> jnp.ndarray:
    """Rescale xyxy coords from letterboxed img1_shape back to img0_shape.

    Ref: general.py:377.  Pure function: returns new array (no in-place).
    """
    if ratio_pad is None:
        gain = min(img1_shape[0] / img0_shape[0], img1_shape[1] / img0_shape[1])
        pad = ((img1_shape[1] - img0_shape[1] * gain) / 2,
               (img1_shape[0] - img0_shape[0] * gain) / 2)
    else:
        gain = ratio_pad[0][0]
        pad = ratio_pad[1]
    shift = jnp.asarray([pad[0], pad[1], pad[0], pad[1]], coords.dtype)
    out = (coords - shift) / gain
    return clip_coords(out, img0_shape)


def bbox_iou(box1: jnp.ndarray, box2: jnp.ndarray, *, xywh: bool = False,
             GIoU: bool = False, DIoU: bool = False, CIoU: bool = False,
             eps: float = 1e-7) -> jnp.ndarray:
    """Elementwise (broadcasting) IoU between box1 (...,4) and box2 (...,4).

    Exact math of reference general.py:403-447 (note the reference quirk that
    ``+eps`` lands on h1/h2 but not w1/w2, kept for bit-parity of CIoU loss).
    """
    if xywh:
        cx1, cy1, w1_, h1_ = box1[..., 0], box1[..., 1], box1[..., 2], box1[..., 3]
        cx2, cy2, w2_, h2_ = box2[..., 0], box2[..., 1], box2[..., 2], box2[..., 3]
        b1_x1, b1_x2 = cx1 - w1_ / 2, cx1 + w1_ / 2
        b1_y1, b1_y2 = cy1 - h1_ / 2, cy1 + h1_ / 2
        b2_x1, b2_x2 = cx2 - w2_ / 2, cx2 + w2_ / 2
        b2_y1, b2_y2 = cy2 - h2_ / 2, cy2 + h2_ / 2
    else:
        b1_x1, b1_y1, b1_x2, b1_y2 = (box1[..., i] for i in range(4))
        b2_x1, b2_y1, b2_x2, b2_y2 = (box2[..., i] for i in range(4))

    inter = (jnp.clip(jnp.minimum(b1_x2, b2_x2) - jnp.maximum(b1_x1, b2_x1), 0)
             * jnp.clip(jnp.minimum(b1_y2, b2_y2) - jnp.maximum(b1_y1, b2_y1), 0))

    w1, h1 = b1_x2 - b1_x1, b1_y2 - b1_y1 + eps
    w2, h2 = b2_x2 - b2_x1, b2_y2 - b2_y1 + eps
    union = w1 * h1 + w2 * h2 - inter + eps
    iou = inter / union

    if GIoU or DIoU or CIoU:
        cw = jnp.maximum(b1_x2, b2_x2) - jnp.minimum(b1_x1, b2_x1)
        ch = jnp.maximum(b1_y2, b2_y2) - jnp.minimum(b1_y1, b2_y1)
        if CIoU or DIoU:
            c2 = cw ** 2 + ch ** 2 + eps
            rho2 = ((b2_x1 + b2_x2 - b1_x1 - b1_x2) ** 2
                    + (b2_y1 + b2_y2 - b1_y1 - b1_y2) ** 2) / 4
            if DIoU:
                return iou - rho2 / c2
            v = (4 / math.pi ** 2) * (jnp.arctan(w2 / h2) - jnp.arctan(w1 / h1)) ** 2
            alpha = lax.stop_gradient(v / (v - iou + (1 + eps)))
            return iou - (rho2 / c2 + v * alpha)
        c_area = cw * ch + eps
        return iou - (c_area - union) / c_area
    return iou


def box_iou(box1: jnp.ndarray, box2: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Pairwise IoU matrix (N, M) for xyxy boxes (N,4) and (M,4). Ref: general.py:450."""
    area1 = (box1[:, 2] - box1[:, 0]) * (box1[:, 3] - box1[:, 1])
    area2 = (box2[:, 2] - box2[:, 0]) * (box2[:, 3] - box2[:, 1])
    lt = jnp.maximum(box1[:, None, :2], box2[None, :, :2])
    rb = jnp.minimum(box1[:, None, 2:], box2[None, :, 2:])
    inter = jnp.prod(jnp.clip(rb - lt, 0), axis=-1)
    return inter / (area1[:, None] + area2[None, :] - inter + eps)


def wh_iou(wh1: jnp.ndarray, wh2: jnp.ndarray) -> jnp.ndarray:
    """(N,2) x (M,2) -> (N,M) IoU of centred boxes. Ref: general.py:477."""
    inter = jnp.prod(jnp.minimum(wh1[:, None], wh2[None]), axis=2)
    return inter / (jnp.prod(wh1, -1)[:, None] + jnp.prod(wh2, -1)[None] - inter)
