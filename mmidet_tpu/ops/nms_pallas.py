"""Pallas TPU kernel for greedy NMS.

Motivation: the XLA formulation (``ops/nms.py``) runs the greedy selection as
a ``lax.scan`` of ``max_det`` tiny dependent steps — each an argmax + an
O(K) IoU pass over a (K,) pool.  Those serialized micro-ops are
latency-bound on TPU (~0.18 ms/img at K=4096, ~18% of the deploy inference
pipeline).  This kernel keeps the whole pool resident in VMEM (K=4096 floats
→ 5 x 16 KB) and runs the entire greedy loop inside one Pallas program per
image: no per-step dispatch, no HBM traffic between steps.

The algorithm and outputs are identical to ``_nms_single``: selection-based
greedy NMS with the class-offset trick applied by the caller; returns
``(keep_idx (max_det,), keep_valid (max_det,))`` per image.

Measured verdict (v5e-1, B=128, K=4096, max_det=300): 0.41 ms/img vs the
XLA scan's 0.27 ms/img — the chip has a single TensorCore, so the
per-image grid programs serialize while XLA's vmapped scan vectorizes the
whole batch inside each greedy step.  Kept as a correct, tested alternative
(and the better shape for future multi-core/megacore parts); the XLA
formulation remains the default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

LANE = 128


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, s_ref, out_idx_ref,
                out_val_ref, *, max_det: int, iou_thres: float):
    """One image per program.  Refs are (R, 128) f32 blocks (K = R*128);
    outputs (max_det, 128) int32 / f32 — column 0 carries the result (lane
    padding keeps the store layout trivial)."""
    x1 = x1_ref[:]
    y1 = y1_ref[:]
    x2 = x2_ref[:]
    y2 = y2_ref[:]
    areas = (x2 - x1) * (y2 - y1)
    rows, lanes = x1.shape
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    flat_ids = row_ids * lanes + lane_ids

    def body(t, scores):
        best = jnp.max(scores)
        # index of the max (first occurrence)
        is_best = (scores == best) & (best > -jnp.inf)
        j = jnp.min(jnp.where(is_best, flat_ids, jnp.int32(0x7FFFFFFF)))
        valid = best > -jnp.inf
        # extract the winner's box via a masked reduction (dynamic scalar
        # indexing of values does not lower on TPU Pallas)
        sel = (flat_ids == j)
        selw = sel.astype(jnp.float32)
        bx1 = jnp.sum(x1 * selw)
        by1 = jnp.sum(y1 * selw)
        bx2 = jnp.sum(x2 * selw)
        by2 = jnp.sum(y2 * selw)
        barea = jnp.sum(areas * selw)
        iw = jnp.clip(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.clip(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        iou = inter / (areas + barea - inter + 1e-9)
        suppress = (iou > iou_thres) | sel
        new_scores = jnp.where(valid & suppress, -jnp.inf, scores)
        # scalar stores don't lower on TPU — write a full lane row
        out_idx_ref[pl.ds(t, 1), :] = jnp.full(
            (1, lanes), jnp.where(valid, j, 0), jnp.int32)
        out_val_ref[pl.ds(t, 1), :] = jnp.full(
            (1, lanes), jnp.where(valid, 1.0, 0.0), jnp.float32)
        return new_scores

    jax.lax.fori_loop(0, max_det, body, s_ref[:])


@functools.partial(jax.jit, static_argnames=("iou_thres", "max_det",
                                             "interpret"))
def nms_greedy_pallas(boxes: jnp.ndarray, scores: jnp.ndarray,
                      iou_thres: float = 0.45, max_det: int = 300,
                      interpret: bool = False):
    """Batched greedy NMS via one Pallas program per image.

    boxes: (B, K, 4) xyxy (already class-offset); scores: (B, K) with
    invalid candidates at -inf; K must be a multiple of 128.
    Returns (keep_idx (B, max_det) int32, keep_valid (B, max_det) bool).
    """
    b, k, _ = boxes.shape
    assert k % LANE == 0, f"K={k} must be a multiple of {LANE}"
    rows = k // LANE
    comps = [boxes[..., i].reshape(b, rows, LANE).astype(jnp.float32)
             for i in range(4)]
    s = scores.reshape(b, rows, LANE).astype(jnp.float32)

    grid = (b,)
    # standard blocked VMEM specs: one image's pool per program
    in_specs = [pl.BlockSpec((1, rows, LANE), lambda i: (i, 0, 0))
                for _ in range(5)]
    out_specs = (pl.BlockSpec((1, max_det, LANE), lambda i: (i, 0, 0)),
                 pl.BlockSpec((1, max_det, LANE), lambda i: (i, 0, 0)))

    def kernel(x1, y1, x2, y2, sc, oi, ov):
        _nms_kernel(x1.at[0], y1.at[0], x2.at[0], y2.at[0], sc.at[0],
                    oi.at[0], ov.at[0], max_det=max_det,
                    iou_thres=iou_thres)

    out_idx, out_val = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=(jax.ShapeDtypeStruct((b, max_det, LANE), jnp.int32),
                   jax.ShapeDtypeStruct((b, max_det, LANE), jnp.float32)),
        interpret=interpret,
    )(*comps, s)
    return out_idx[:, :, 0], out_val[:, :, 0] > 0.5
