"""Single-kernel cross-modal fusion block (GPT) for the deploy path.

Fuses the ENTIRE ``CrossModalTransformer`` + ``Add2`` merge sequence —
adaptive-avgpool both streams to 8x8, 128-token 8-layer transformer,
bilinear upsample back to (H, W), residual merge into each stream — into
one Pallas kernel.  Reference semantics: ``GPT`` (common.py:1270-1368)
followed by the two ``Add2`` merges (common.py:926-935, used at every
fusion level of the *_fusion_transformer_* models).

Why: XLA runs this sequence at the HBM roofline — every intermediate
(pooled maps, 8 layers x ~8 token tensors, the upsampled maps, the merge)
is an HBM round-trip; measured 18.4 GB/batch-128 of the yolov5s-gpt4
forward's 54.8 GB is this path.  Here each batch tile makes exactly one
trip: streams in, merged streams out; everything else lives in VMEM.

Numerics match the XLA path within bf16 tolerance: LN stats / softmax /
GELU(erf poly) in f32, matmuls accumulate f32, activations bf16.  The
pooling windows reproduce torch AdaptiveAvgPool2d's floor/ceil boundaries
and the upsample reproduces ``F.interpolate(mode='bilinear',
align_corners=False)`` half-pixel centers exactly (same arithmetic as
``mmidet_tpu.nn.resize``).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmidet_tpu.nn.transformer_pallas import (_layer_ws, _layernorm,
                                              transformer_layer)


def _pool_windows(n_in: int, n_out: int = 8):
    """torch AdaptiveAvgPool1d window (start, length) per output index."""
    out = []
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = math.ceil((i + 1) * n_in / n_out)
        out.append((start, end - start))
    return out


def _upsample_groups(n_in: int, n_out: int):
    """Bilinear (half-pixel, clamped) output runs grouped by (lo, hi) source
    pair: list of (out_start, out_len, lo, hi).  The fractional weights are
    reconstructed in-kernel from iota (_frac) — Pallas kernels cannot
    capture host arrays as constants."""
    scale = n_in / n_out
    lo_hi = []
    for i in range(n_out):
        src = min(max((i + 0.5) * scale - 0.5, 0.0), n_in - 1)
        lo = int(math.floor(src))
        lo_hi.append((lo, min(lo + 1, n_in - 1)))
    groups = []
    s = 0
    for i in range(1, n_out + 1):
        if i == n_out or lo_hi[i] != lo_hi[s]:
            groups.append((s, i - s, lo_hi[s][0], lo_hi[s][1]))
            s = i
    return groups


def _pool8(x, h, w):
    """(H, W, C) -> (64, C) torch-exact adaptive mean (8x8 row-major)."""
    rows = []
    for (hs, hl) in _pool_windows(h):
        rows.append(jnp.sum(x[hs:hs + hl], axis=0, keepdims=True) / hl)
    xr = jnp.concatenate(rows, axis=0)          # (8, W, C)
    cols = []
    for (ws, wl) in _pool_windows(w):
        cols.append(jnp.sum(xr[:, ws:ws + wl], axis=1, keepdims=True) / wl)
    p = jnp.concatenate(cols, axis=1)           # (8, 8, C)
    return p.reshape(64, p.shape[-1])


def _frac(os_, ol, lo, n_in, n_out, shape, dim):
    """In-kernel bilinear weight vector for an output run (no captured
    consts — Pallas kernels must build constants from iota)."""
    scale = n_in / n_out
    idx = jax.lax.broadcasted_iota(jnp.int32, shape, dim).astype(
        jnp.float32) + float(os_)
    src = (idx + 0.5) * scale - 0.5
    src = jnp.clip(src, 0.0, float(n_in - 1))
    return src - float(lo)


def _upsample(z, h, w):
    """(8, 8, C) -> (H, W, C) torch-exact bilinear, f32 weights."""
    z32 = z.astype(jnp.float32)
    rows = []
    for (os_, ol, lo, hi) in _upsample_groups(8, h):
        wv = _frac(os_, ol, lo, 8, h, (ol, 1, 1), 0)
        rows.append(z32[lo:lo + 1] * (1.0 - wv) + z32[hi:hi + 1] * wv)
    zh = jnp.concatenate(rows, axis=0)          # (H, 8, C)
    cols = []
    for (os_, ol, lo, hi) in _upsample_groups(8, w):
        wv = _frac(os_, ol, lo, 8, w, (1, ol, 1), 1)
        cols.append(zh[:, lo:lo + 1] * (1.0 - wv) + zh[:, hi:hi + 1] * wv)
    return jnp.concatenate(cols, axis=1).astype(jnp.bfloat16)


def _transformer(a, wrefs, lnf_s, lnf_b, num_heads, n_layer):
    """a: (m, d) bf16 tokens (pos already added).  All-resident weights:
    wrefs[name][l] indexable.  Per-layer math is shared with the
    token-transformer kernel (transformer_layer) so the two kernels stay
    numerically in lockstep."""
    for l in range(n_layer):
        ws = {nm: wrefs[nm][l] for nm in wrefs}
        a = transformer_layer(a, ws, num_heads=num_heads)
    return _layernorm(a, lnf_s[0], lnf_b[0]).astype(jnp.bfloat16)


_WNAMES = ["ln1_scale", "ln1_bias", "wq", "wk", "wv", "bq", "bk", "bv",
           "wo", "bo", "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2"]


def _apply_gate(tok, g1, g2):
    """Pattern gate (GPT1/GPT1_fourier deploy form): tok <- conv2(sigmoid(
    conv1(tok))) * tok.  The 1x1 convs are lane-padded matmuls: g1 is
    (C, 128) with the real 8 mask channels in cols 0..7 (padded cols give
    sigmoid(0)=0.5), g2 is (128, C) with zero rows 8..127 (so the padding
    contributes nothing) — exact, and avoids 8-lane arrays in VMEM."""
    m = jax.nn.sigmoid(jnp.dot(tok, g1[:],
                               preferred_element_type=jnp.float32))
    gv = jnp.dot(m.astype(jnp.bfloat16), g2[:],
                 preferred_element_type=jnp.float32)
    return (gv * tok.astype(jnp.float32)).astype(jnp.bfloat16)


def _kernel(rgb_hbm, ir_hbm, pos, lnf_s, lnf_b, *wops_and_outs,
            h, w, tb, num_heads, n_layer, gated=False):
    ng = 2 if gated else 0
    gate = wops_and_outs[:ng]
    n_w = len(_WNAMES)
    wrefs = dict(zip(_WNAMES, wops_and_outs[ng:ng + n_w]))
    rgb_out, ir_out = wops_and_outs[ng + n_w:ng + n_w + 2]
    rest = wops_and_outs[ng + n_w + 2:]
    bufs, sem = rest[:-1], rest[-1]
    rgb_v = bufs[:tb]
    ir_v = bufs[tb:]
    i = pl.program_id(0)
    c = rgb_v[0].shape[-1]

    # per-image scratch buffers: whole-ref DMA only (slicing a C<128
    # scratch hits Mosaic's lane-packed layout and fails to lower)
    cps = []
    for j in range(tb):
        cps.append(pltpu.make_async_copy(
            rgb_hbm.at[i * tb + j], rgb_v[j], sem.at[2 * j]))
        cps.append(pltpu.make_async_copy(
            ir_hbm.at[i * tb + j], ir_v[j], sem.at[2 * j + 1]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    toks = []
    for j in range(tb):
        # stream scratches are FLAT (H*W, C) — H*W is 8-sublane aligned
        # at every level (incl. 20x20 -> 400), unlike W itself; the
        # value-level reshape restores the 2-D view for the pool math
        toks.append(_pool8(rgb_v[j][:].reshape(h, w, -1), h, w))  # (64, C)
        toks.append(_pool8(ir_v[j][:].reshape(h, w, -1), h, w))
    tok = jnp.concatenate(toks, axis=0)               # (tb*128, C)
    if gated:  # pattern gate on the pooled tokens, before pos-emb
        tok = _apply_gate(tok.astype(jnp.bfloat16), gate[0], gate[1])
    posb = jnp.concatenate([pos[0]] * tb, axis=0)
    tok = (tok.astype(jnp.float32) + posb.astype(jnp.float32)
           ).astype(jnp.bfloat16)
    a = _transformer(tok, wrefs, lnf_s, lnf_b, num_heads, n_layer)

    for j in range(tb):
        zr = a[j * 128:j * 128 + 64].reshape(8, 8, c)
        zi = a[j * 128 + 64:(j + 1) * 128].reshape(8, 8, c)
        rgb_v[j][:] = rgb_v[j][:] + _upsample(zr, h, w).reshape(h * w, c)
        ir_v[j][:] = ir_v[j][:] + _upsample(zi, h, w).reshape(h * w, c)

    cps = []
    for j in range(tb):
        cps.append(pltpu.make_async_copy(
            rgb_v[j], rgb_out.at[i * tb + j], sem.at[2 * j]))
        cps.append(pltpu.make_async_copy(
            ir_v[j], ir_out.at[i * tb + j], sem.at[2 * j + 1]))
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()


def _kernel_stream(rgb_hbm, ir_hbm, pos, lnf_s, lnf_b, *refs,
                   h, w, tb, num_heads, n_layer, gated=False):
    """Layer-major streaming variant: grid = (L, batch_tiles).

    The resident-weight kernel (_kernel) holds all L layers' matrices in
    VMEM — infeasible at d=1024 (200 MB) and re-streams nothing; this
    variant streams ONE layer's weight blocks per grid step (Pallas
    double-buffers the DMA, and the block index depends only on ``l`` so
    each layer's matrices are fetched once per call, not once per batch
    tile).  Token activations for the FULL batch persist in a VMEM
    scratch across the layer sweep; the streams are DMA'd in twice (pool
    at l==0, merge at l==L-1) and out once — still 2 fewer full-map HBM
    round-trips than the XLA pool->kernel->upsample->merge glue.
    """
    ng = 2 if gated else 0
    gate = refs[:ng]
    n_w = len(_WNAMES)
    wrefs = refs[ng:ng + n_w]
    rgb_out, ir_out = refs[ng + n_w:ng + n_w + 2]
    act = refs[ng + n_w + 2]
    bufs = refs[ng + n_w + 3:-1]
    sem = refs[-1]
    rgb_v, ir_v = bufs[:tb], bufs[tb:]
    l = pl.program_id(0)
    i = pl.program_id(1)
    c = rgb_v[0].shape[-1]

    def dma_streams_in():
        cps = []
        for j in range(tb):
            cps.append(pltpu.make_async_copy(
                rgb_hbm.at[i * tb + j], rgb_v[j], sem.at[2 * j]))
            cps.append(pltpu.make_async_copy(
                ir_hbm.at[i * tb + j], ir_v[j], sem.at[2 * j + 1]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()

    @pl.when(l == 0)
    def _():
        dma_streams_in()
        toks = []
        for j in range(tb):
            toks.append(_pool8(rgb_v[j][:].reshape(h, w, -1), h, w))
            toks.append(_pool8(ir_v[j][:].reshape(h, w, -1), h, w))
        tok = jnp.concatenate(toks, axis=0)           # (tb*128, C)
        if gated:
            tok = _apply_gate(tok.astype(jnp.bfloat16), gate[0], gate[1])
        posb = jnp.concatenate([pos[0]] * tb, axis=0)
        tok = (tok.astype(jnp.float32) + posb.astype(jnp.float32)
               ).astype(jnp.bfloat16)
        act[pl.ds(i * tb, tb)] = tok.reshape(tb, 128, c)

    a = transformer_layer(act[pl.ds(i * tb, tb)].reshape(tb * 128, c),
                          _layer_ws(l, *wrefs), num_heads=num_heads)
    act[pl.ds(i * tb, tb)] = a.reshape(tb, 128, c)

    @pl.when(l == n_layer - 1)
    def _():
        dma_streams_in()
        af = _layernorm(act[pl.ds(i * tb, tb)].reshape(tb * 128, c),
                        lnf_s[0], lnf_b[0]).astype(jnp.bfloat16)
        for j in range(tb):
            zr = af[j * 128:j * 128 + 64].reshape(8, 8, c)
            zi = af[j * 128 + 64:(j + 1) * 128].reshape(8, 8, c)
            rgb_v[j][:] = rgb_v[j][:] + _upsample(zr, h, w).reshape(
                h * w, c)
            ir_v[j][:] = ir_v[j][:] + _upsample(zi, h, w).reshape(
                h * w, c)
        cps = []
        for j in range(tb):
            cps.append(pltpu.make_async_copy(
                rgb_v[j], rgb_out.at[i * tb + j], sem.at[2 * j]))
            cps.append(pltpu.make_async_copy(
                ir_v[j], ir_out.at[i * tb + j], sem.at[2 * j + 1]))
        for cp in cps:
            cp.start()
        for cp in cps:
            cp.wait()


def _tile_b(b: int, h: int, w: int, c: int) -> int:
    # keep the two in-tiles (both streams) around <= ~14 MB
    per_img = 2 * h * w * c * 2
    want = max(1, (14 << 20) // per_img)
    want = min(want, 8)
    while b % want:
        want -= 1
    return max(want, 1)


def merge_kernel_supported(h: int, w: int, c: int) -> bool:
    """Whether fused_gpt_merge can run on real-TPU Mosaic for this map
    shape.  The streams travel FLAT as (B, H*W, C), so the per-image DMA
    slice needs H*W aligned to the 8-sublane tiling — true for every
    pyramid level (20x20 -> 400), where W alone (20) is not.  Callers
    fall back to the XLA pool->transformer->upsample sequence."""
    return (h * w) % 8 == 0


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret"))
def fused_gpt_merge(rgb: jnp.ndarray, ir: jnp.ndarray, stacked: dict,
                    pos_emb: jnp.ndarray, lnf_scale: jnp.ndarray,
                    lnf_bias: jnp.ndarray, num_heads: int = 8,
                    interpret: bool = False, gate: dict | None = None):
    """rgb/ir: (B, H, W, C) bf16 streams.  Returns (rgb + up(trans_rgb),
    ir + up(trans_ir)) — the GPT fusion outputs already merged into the
    streams (the two Add2 layers' result).

    ``gate``: optional pattern-gate weights {"g1": (C, 8), "g2": (8, C)}
    (the GPT1/GPT1_fourier 1x1 conv1/conv2, common.py:165-168/323-326) —
    applied to the pooled tokens before the pos-emb, which is exactly the
    deploy dataflow of those modules (the fourier branch feeds only the
    training-time separation loss)."""
    b, h, w, c = rgb.shape
    L = stacked["wq"].shape[0]
    gated = gate is not None

    # layer-major weight streaming whenever the width is large enough that
    # (a) the full-batch token scratch is lane-aligned (c >= 256, as the
    # token-transformer kernel) and (b) one layer's double-buffered blocks
    # + the scratches fit VMEM.  Below that, the resident-weight batch-major
    # grid stays: its weights are tiny and re-streaming them is free.
    layer_bytes = 2 * (4 * c * c + 2 * c * 4 * c)     # qkv/o + mlp, bf16
    act_bytes = 2 * b * 128 * c
    per_img = 2 * h * w * c * 2                       # both streams, bf16
    budget = (88 << 20) - act_bytes - 2 * layer_bytes
    stream = c >= 256 and L >= 2 and budget >= per_img

    # flat (B, H*W, C) stream layout: H*W is 8-sublane aligned at every
    # level (W alone is not, e.g. 20 at P5) and the per-image DMA slices
    # dim 0 of a 2-D ref
    ops = [rgb.astype(jnp.bfloat16).reshape(b, h * w, c),
           ir.astype(jnp.bfloat16).reshape(b, h * w, c),
           pos_emb.astype(jnp.float32).reshape(1, 128, c),
           lnf_scale.astype(jnp.float32).reshape(1, c),
           lnf_bias.astype(jnp.float32).reshape(1, c)]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    if gated:
        # lane-pad the tiny 1x1 convs: g1 -> (C, 128) zero cols (sigmoid
        # gives 0.5 there), g2 -> (128, C) zero rows (0.5 x 0 = 0) — exact
        g1 = jnp.zeros((c, 128), jnp.bfloat16).at[:, :8].set(
            gate["g1"].astype(jnp.bfloat16))
        g2 = jnp.zeros((128, c), jnp.bfloat16).at[:8].set(
            gate["g2"].astype(jnp.bfloat16))
        ops += [g1, g2]
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM),
                     pl.BlockSpec(memory_space=pltpu.VMEM)]
    for nm in _WNAMES:
        arr = stacked[nm]
        wdt = jnp.bfloat16 if arr.ndim == 3 else jnp.float32
        ops.append(arr.astype(wdt))
        if stream and arr.ndim == 3:
            # one layer's block per step; the index depends only on l, so
            # Pallas skips the DMA across the batch-tile sweep
            zeros = (0,) * (arr.ndim - 1)
            in_specs.append(pl.BlockSpec(
                (1,) + arr.shape[1:], lambda l, i, z=zeros: (l,) + z,
                memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    out_shape = (jax.ShapeDtypeStruct((b, h * w, c), jnp.bfloat16),
                 jax.ShapeDtypeStruct((b, h * w, c), jnp.bfloat16))
    if stream:
        tb = max(1, min(8, int(budget // per_img)))
        while b % tb:
            tb -= 1
        grid = (L, b // tb)
        kernel = functools.partial(_kernel_stream, h=h, w=w, tb=tb,
                                   num_heads=num_heads, n_layer=L,
                                   gated=gated)
        scratch = [pltpu.VMEM((b, 128, c), jnp.bfloat16)]
    else:
        tb = _tile_b(b, h, w, c)
        grid = (b // tb,)
        kernel = functools.partial(_kernel, h=h, w=w, tb=tb,
                                   num_heads=num_heads, n_layer=L,
                                   gated=gated)
        scratch = []
    scratch += [pltpu.VMEM((h * w, c), jnp.bfloat16)
                for _ in range(2 * tb)]
    scratch += [pltpu.SemaphoreType.DMA((2 * tb,))]
    ro, io = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*ops)
    return ro.reshape(b, h, w, c), io.reshape(b, h, w, c)
