"""W8A8-storage quantization for the deploy conv stack (``quant='s8store'``).

What this is (and is not): the backbone of the two-stream detector is
HBM-bytes-bound on v5e (PERF.md: 27.5 GB/batch-128 at the roofline), so
the lever is *storage* dtype, not compute dtype.  Measured on hardware
(tools/_probe_int8_scan.py, clean run, carry-fed scan harness):

  * full int8 compute (``s8 x s8 -> s32`` XLA convs): 22-23% SLOWER than
    bf16 at backbone shapes — XLA's TPU s8-conv path does not pay;
  * fp8 storage: no win (cast-only epilogue, still ~0);
  * **s8 storage + bf16 compute: +6.3%** on the real-shape 20-conv trunk
    (10.297 vs 10.946 ms) — activations cross HBM as int8 (XLA cost
    analysis confirms the byte reduction), convs run on the bf16 MXU
    path, quantize lives in the producer's fusion epilogue.

Design: a quantized ``ConvBnAct`` returns a ``QTensor`` (int8 values +
its OWN calibrated output scale); every consumer dequantizes on entry.
The scale rides with the tensor, so no cross-module scale registry is
needed, and XLA's fusion boundary between producer and consumer is the
int8 tensor.  Scales are per-tensor symmetric, calibrated by running
the float deploy model with the ``calib`` collection mutable (each
fused ConvBnAct sows its activation absmax).

This is an opt-in deploy mode (the reference has no int8 path); exact
accuracy impact is bounded by tests (activation rounding only — weights
stay bf16/f32).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class QTensor(NamedTuple):
    """int8 storage + per-tensor scale (descale factor: x ~= v * s)."""
    v: jnp.ndarray   # int8
    s: jnp.ndarray   # () float32


def quantize(x: jnp.ndarray, scale) -> QTensor:
    s = jnp.asarray(scale, jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127)
    return QTensor(q.astype(jnp.int8), s)


def dequantize(x, dtype=jnp.bfloat16):
    """QTensor -> array (no-op on plain arrays)."""
    if isinstance(x, QTensor):
        return x.v.astype(dtype) * x.s.astype(dtype)
    return x


def deq_tree(x, dtype=jnp.bfloat16):
    """dequantize through lists/tuples (GPT layers return pairs)."""
    if isinstance(x, QTensor):
        return dequantize(x, dtype)
    if isinstance(x, (list, tuple)):
        return type(x)(deq_tree(v, dtype) for v in x)
    return x


def calibrate_act_scales(model, variables, batches, clip: float = 1.0) -> dict:
    """Run the FLOAT deploy model over calibration batches and return the
    ``quant`` collection (per-module ``out_scale``) its s8store twin
    needs.  ``batches`` is an iterable of (rgb, ir) pairs (ir may be
    None for single-stream).

    ``clip`` scales the absmax-derived scales (<1 trades clipping for
    finer rounding).  Measured on a converged model (round 4,
    tools/_probe_s8_calib.py): clip=0.9 recovers ~1 mAP50 point of the
    s8 mode's ~5-point cost (-0.054 -> -0.043); below 0.8 it is
    strictly worse — the loss is rounding, not outliers."""
    scales = None
    for rgb, ir in batches:
        _, mut = model.apply(variables, rgb, ir, train=False,
                             mutable=["calib"])
        got = jax.tree_util.tree_map(
            lambda t: jnp.max(jnp.stack(t)) if isinstance(t, tuple) else t,
            mut["calib"], is_leaf=lambda t: isinstance(t, tuple))
        scales = got if scales is None else jax.tree_util.tree_map(
            jnp.maximum, scales, got)

    def to_scale(absmax):
        return jnp.maximum(absmax.astype(jnp.float32) * clip, 1e-4) / 127.0

    quant = jax.tree_util.tree_map(to_scale, scales)
    # calib leaves are named 'out_absmax'; quant wants 'out_scale'
    def rename(tree):
        if hasattr(tree, "items"):
            return {("out_scale" if k == "out_absmax" else k): rename(v)
                    for k, v in tree.items()}
        return tree
    return rename(quant)


def quantized_variables(variables, quant_collection) -> dict:
    """Variables dict for the s8store model (adds the quant collection)."""
    out = dict(variables)
    out["quant"] = quant_collection
    return out


def make_quant_deploy(model, variables, calib_batches, clip: float = 1.0):
    """One-call deploy quantization: fold BN if present, calibrate the
    activation scales on ``calib_batches`` (iterable of (rgb, ir) float
    0..1 pairs; ir None for single-stream), and return
    ``(quant_model, quant_variables)`` ready for ``apply``.

    The user-facing entry behind the val/detect ``--int8`` flags.
    ``clip``: see ``calibrate_act_scales`` (0.9 measured best on a
    converged model; 1.0 is the plain absmax default)."""
    from mmidet_tpu.nn.fuse import fold_batchnorm
    folded = fold_batchnorm(variables) if "batch_stats" in variables \
        else variables
    f_model = model.clone(fused=True, quant=False)
    q_model = model.clone(fused=True, quant=True)
    qcol = calibrate_act_scales(f_model, folded, calib_batches, clip=clip)
    return q_model, quantized_variables(folded, qcol)
