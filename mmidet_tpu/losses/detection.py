"""YOLOv5 detection loss with the Info-Guided fusion-loss hook, as one
fixed-shape jit/pjit-compatible computation.

Functional parity surface: reference ``utils/loss.py`` (``ComputeLoss``,
``build_targets``, ``FocalLoss``, ``QFocalLoss``, ``smooth_BCE``) and the
fusion-loss merge at ``loss.py:159-184``.

TPU-first reformulation of ``build_targets`` (reference filters targets with
boolean masks — dynamic shapes): every (image, target-slot, anchor, offset)
tuple is a *candidate* with a validity mask.  Targets arrive padded to a
static ``T`` per image.  The candidate tensor is ``(B, T, na, 5)``; gathers
and scatters use linear indices into the flattened prediction grid, so XLA
compiles a single static program.

Duplicate-cell objectness resolution is reference-EXACT: when two candidates
land on the same grid cell, the reference's in-place write keeps the *last*
one's IoU (loss.py:249, in build_targets' offset-block/anchor/target row
order).  A deterministic two-scatter formulation reproduces it: an int
scatter-max of the write-order sequence picks each cell's winning candidate,
then only winners scatter their value (tests/test_loss_torch_parity.py
pins this on forced duplicates).
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from mmidet_tpu.ops.boxes import bbox_iou

# duplicate-cell objectness semantics: 'last' = reference-exact
# last-write-wins (utils/loss.py:249); 'max' = round-1 scatter-max —
# kept ONLY as the ablation arm of the measured A/B
# (tools/ab_exactness.py).  Read at trace time: set before jitting.
OBJ_DUP_MODE = "last"

# candidate offsets (reference loss.py:198-201), bias g = 0.5
_OFFSETS = jnp.asarray([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0],
                        [-1.0, 0.0], [0.0, -1.0]]) * 0.5


@dataclasses.dataclass(frozen=True)
class LossHyp:
    """The loss-relevant hyperparameters (data/hyp.scratch.yaml:14-23)."""
    box: float = 0.05
    cls: float = 0.5
    cls_pw: float = 1.0
    obj: float = 1.0
    obj_pw: float = 1.0
    anchor_t: float = 4.0
    fl_gamma: float = 0.0
    label_smoothing: float = 0.0
    gr: float = 1.0           # iou ratio (train.py sets model.gr = 1.0)
    aux_weight: float = 0.1   # alpha_Contrast (loss.py:113)


def smooth_bce(eps: float = 0.0) -> tuple[float, float]:
    """Positive/negative label-smoothing targets. Ref: loss.py:10-12."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with positive-class weight (torch
    semantics: pos_weight scales the target term)."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_modulation(logits, targets, loss, gamma: float = 1.5,
                     alpha: float = 0.25):
    """TF-style focal wrapper. Ref: FocalLoss (loss.py:32-59)."""
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * jnp.power(1.0 - p_t, gamma)


def qfocal_modulation(logits, targets, loss, gamma: float = 1.5,
                      alpha: float = 0.25):
    """Quality focal wrapper. Ref: QFocalLoss (loss.py:62-85)."""
    p = jax.nn.sigmoid(logits)
    alpha_f = targets * alpha + (1 - targets) * (1 - alpha)
    return loss * alpha_f * jnp.power(jnp.abs(targets - p), gamma)


def bce_blur_with_logits(logits, targets, alpha: float = 0.05,
                         pos_weight: float = 1.0):
    """BCE with reduced missing-label effects. Ref: BCEBlurWithLogitsLoss
    (loss.py:15-29)."""
    loss = bce_with_logits(logits, targets, pos_weight)
    p = jax.nn.sigmoid(logits)
    dx = p - targets
    alpha_factor = 1.0 - jnp.exp((dx - 1.0) / (alpha + 1e-4))
    return jnp.mean(loss * alpha_factor)


def build_candidates(targets: jnp.ndarray, mask: jnp.ndarray,
                     anchors_l: jnp.ndarray, ny: int, nx: int,
                     anchor_t: float):
    """Fixed-shape target assignment for one detection level.

    Args:
      targets: (B, T, 5) [class, x, y, w, h], normalized 0..1.
      mask:    (B, T) validity.
      anchors_l: (na, 2) anchors in grid units for this level.
      ny, nx: grid size; anchor_t: wh-ratio gate.

    Returns dict of (B, T, na, 5)-shaped candidate fields:
      valid, b, a, gj, gi, tx, ty, tw, th, tcls
    """
    bsz, t, _ = targets.shape
    na = anchors_l.shape[0]
    gain = jnp.asarray([nx, ny, nx, ny], targets.dtype)
    cls = targets[..., 0]
    xywh = targets[..., 1:5] * gain  # grid units

    # anchor-ratio gate (loss.py:212-215): (B, T, na)
    r = xywh[..., None, 2:4] / anchors_l[None, None]
    ratio = jnp.maximum(r, 1.0 / r).max(axis=-1)
    match = (ratio < anchor_t) & mask[..., None]

    gxy = xywh[..., :2]
    gxi = gain[:2] - gxy
    g = 0.5
    # neighbor-cell conditions (loss.py:218-222)
    jm = (gxy % 1.0 < g) & (gxy > 1.0)
    lm = (gxi % 1.0 < g) & (gxi > 1.0)
    cond = jnp.stack([jnp.ones_like(jm[..., 0]),
                      jm[..., 0], jm[..., 1],
                      lm[..., 0], lm[..., 1]], axis=-1)  # (B, T, 5)

    valid = match[..., None] & cond[..., None, :]  # (B, T, na, 5)

    off = _OFFSETS.astype(targets.dtype)  # (5, 2)
    gij = jnp.floor(gxy[..., None, :] - off[None, None]).astype(jnp.int32)
    # clamp to the grid: the reference's in-place clamp_ mutates gij *before*
    # tbox is computed (loss.py:239-241), so the offset uses clamped cells too
    gij = jnp.clip(gij, jnp.zeros((2,), jnp.int32),
                   jnp.asarray([nx - 1, ny - 1], jnp.int32))
    # gij: (B, T, 5, 2) -> broadcast over the anchor axis
    shape = (bsz, t, na, 5)
    gi = jnp.broadcast_to(gij[..., 0][..., None, :], shape)
    gj = jnp.broadcast_to(gij[..., 1][..., None, :], shape)
    txy = jnp.broadcast_to(
        (gxy[..., None, :] - gij.astype(targets.dtype))[..., None, :, :],
        shape + (2,))
    twh = jnp.broadcast_to(xywh[..., None, None, 2:4], shape + (2,))

    bidx = jnp.broadcast_to(
        jnp.arange(bsz, dtype=jnp.int32)[:, None, None, None], valid.shape)
    aidx = jnp.broadcast_to(
        jnp.arange(na, dtype=jnp.int32)[None, None, :, None], valid.shape)
    tcls = jnp.broadcast_to(cls[..., None, None], valid.shape)
    # reference write ORDER for duplicate-cell resolution: build_targets
    # emits rows offset-block-major (t.repeat((5,1,1))[j], loss.py:232),
    # anchor-major within a block, then target order — the in-place tobj
    # write (loss.py:249) makes the LAST such row win.  seq encodes that
    # priority (1-based; 0 = empty cell).
    oidx = jnp.broadcast_to(
        jnp.arange(5, dtype=jnp.int32)[None, None, None, :], valid.shape)
    tidx = jnp.broadcast_to(
        jnp.arange(t, dtype=jnp.int32)[None, :, None, None], valid.shape)
    seq = (((oidx * na + aidx) * bsz + bidx) * t + tidx) + 1
    return {
        "valid": valid, "b": bidx, "a": aidx, "gi": gi, "gj": gj,
        "txy": txy, "twh": twh, "tcls": tcls.astype(jnp.int32),
        "seq": seq,
        "anchor": jnp.broadcast_to(anchors_l[None, None, :, None, :],
                                   valid.shape + (2,)),
    }


def compute_loss(train_outs: Sequence[jnp.ndarray], targets: jnp.ndarray,
                 target_mask: jnp.ndarray, anchors: jnp.ndarray,
                 hyp: LossHyp = LossHyp(), combine_loss=None,
                 balance: Sequence[float] | None = None):
    """YOLOv5 + Info-Guided loss. Ref: ComputeLoss.__call__ (loss.py:113-184).

    Args:
      train_outs: per-level (B, na, ny, nx, no) raw predictions.
      targets:    (B, T, 5) padded [class, x, y, w, h] (normalized).
      target_mask:(B, T) bool.
      anchors:    (nl, na, 2) grid-unit anchors (Detect.grid_anchors()).
      combine_loss: optional scalar (or None) — the model's fusion Combine
        loss; merged as ``mean * aux_weight`` (loss.py:161-175).

    Returns (loss_total, metrics dict).  ``loss_total`` includes the
    reference's ``* batch_size`` scaling.
    """
    if balance is None:
        # reference per-level objectness balance (loss.py:106):
        # {3: [4, 1, 0.4]}.get(nl, [4, 1, 0.25, 0.06, 0.02])
        balance = {3: (4.0, 1.0, 0.4)}.get(
            len(train_outs), (4.0, 1.0, 0.25, 0.06, 0.02)[:len(train_outs)])
    nc = train_outs[0].shape[-1] - 5
    bsz = train_outs[0].shape[0]
    dtype = jnp.float32
    cp, cn = smooth_bce(hyp.label_smoothing)

    lbox = jnp.zeros((), dtype)
    lobj = jnp.zeros((), dtype)
    lcls = jnp.zeros((), dtype)

    for i, pi in enumerate(train_outs):
        pi = pi.astype(dtype)
        b_, na, ny, nx, no = pi.shape
        cand = build_candidates(targets.astype(dtype), target_mask,
                                anchors[i].astype(dtype), ny, nx,
                                hyp.anchor_t)
        valid = cand["valid"].reshape(-1)
        w = valid.astype(dtype)
        n = jnp.maximum(jnp.sum(w), 1.0)

        # linear index into flattened (B, na, ny, nx)
        lin = ((cand["b"] * na + cand["a"]) * ny + cand["gj"]) * nx + cand["gi"]
        lin = lin.reshape(-1)
        flat = pi.reshape(-1, no)
        ps = flat[lin]  # (K, no)

        pxy = jax.nn.sigmoid(ps[:, 0:2]) * 2.0 - 0.5
        pwh = jnp.square(jax.nn.sigmoid(ps[:, 2:4]) * 2.0) * \
            cand["anchor"].reshape(-1, 2)
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        tbox = jnp.concatenate([cand["txy"].reshape(-1, 2),
                                cand["twh"].reshape(-1, 2)], axis=-1)
        iou = bbox_iou(pbox, tbox, xywh=True, CIoU=True)
        lbox = lbox + jnp.sum((1.0 - iou) * w) / n

        # objectness target: reference-exact LAST-write-wins on duplicate
        # cells (loss.py:249 writes tobj[b,a,gj,gi] in candidate order) —
        # an int scatter-max of the write-order seq picks each cell's
        # winner, whose (single) value then lands via a float scatter.
        # OBJ_DUP_MODE='max' keeps the round-1 scatter-max semantics for
        # the measured A/B (tools/ab_exactness.py; PARITY.md).
        tobj_val = (1.0 - hyp.gr) + hyp.gr * jnp.clip(
            jax.lax.stop_gradient(iou), 0.0)
        if OBJ_DUP_MODE == "last":
            seq = jnp.where(valid, cand["seq"].reshape(-1), 0)
            win = jnp.zeros((b_ * na * ny * nx,), jnp.int32).at[lin].max(
                seq, mode="drop")
            is_winner = valid & (seq == win[lin])
        else:  # 'max': every valid candidate competes, largest IoU wins
            is_winner = valid
        tobj = jnp.zeros((b_ * na * ny * nx,), dtype).at[lin].max(
            jnp.where(is_winner, tobj_val, -1.0), mode="drop")
        tobj = jnp.clip(tobj, 0.0)

        obj_bce = bce_with_logits(flat[:, 4], tobj, hyp.obj_pw)
        if hyp.fl_gamma > 0:
            obj_bce = focal_modulation(flat[:, 4], tobj, obj_bce,
                                       hyp.fl_gamma)
        lobj = lobj + jnp.mean(obj_bce) * balance[i]

        if nc > 1:
            tcl = jax.nn.one_hot(cand["tcls"].reshape(-1), nc, dtype=dtype)
            tcl = tcl * (cp - cn) + cn
            cls_bce = bce_with_logits(ps[:, 5:], tcl, hyp.cls_pw)
            if hyp.fl_gamma > 0:
                cls_bce = focal_modulation(ps[:, 5:], tcl, cls_bce,
                                           hyp.fl_gamma)
            lcls = lcls + jnp.sum(jnp.mean(cls_bce, axis=-1) * w) / n

    lbox = lbox * hyp.box
    lobj = lobj * hyp.obj
    lcls = lcls * hyp.cls
    detect = lbox + lobj + lcls

    if combine_loss is not None:
        aux = jnp.asarray(combine_loss, dtype) * hyp.aux_weight
    else:
        aux = jnp.zeros((), dtype)
    total = (detect + aux) * bsz

    return total, {"box": lbox, "obj": lobj, "cls": lcls,
                   "detect": detect, "aux": aux, "total": total}
