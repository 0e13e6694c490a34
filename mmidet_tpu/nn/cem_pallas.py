"""Fused Pallas CEM kernel: the whole Contour Enhancement Module in one pass.

Functional parity surface: reference ``AdaptiveModule3`` / ``EnhanceConv2d``
(common.py:751-911) in their BN-folded deploy form, i.e. exactly what
``mmidet_tpu.nn.cem.ContourEnhance(fused=True)`` computes:

    y   = leaky_0.1(conv2(x) + b2)          # 3x3, 3 -> 24
    g   = bank8 (*) sum_c(y)                # 3x3, 1 -> 8, frozen kernels
    e   = tile(g, 3) * sobel_factor + sobel_bias
    z   = leaky_0.1(conv3(y + e) + b3)      # 3x3, 24 -> 3
    out = z + x

Why a kernel at all: XLA lowers the 3->24 and 24->3 convs through the MXU
with both contraction and output channels padded to the 128-lane width, so
the module runs at an effective ~6-8 TFLOP/s and materializes every 24-ch
intermediate in HBM (measured 17.7 ms/batch-128 @640px on v5e — PERF.md
round-1 ablation).  This kernel keeps every intermediate in VMEM and
reformulates each conv as an **overlapped-patch matmul** that packs several
adjacent output pixels into one MXU row:

  * conv2: 8 adjacent output px per row -> patch K = 3 rows x 10 px x 3 ch
    = 90 (pad 128), N = 8 px x 24 ch = 192 -> ~21% MXU utilization
    (vs ~4-7% for a channel-padded small-C conv).
  * bank + tile + factor: folded into ONE matmul (the edge bank is linear):
    patch K = 3 x 10 x 1 = 30 (pad 128) over the channel-summed map,
    N = 8 px x 24 ch with the tile/scale expansion baked into the weight
    (``Wb3[.., 24p+m] = bank[.., m%8] * factor[m]``), so ``e`` comes out
    directly in the 24-channel group layout.
  * conv3: 5x8-px 2-D output blocks -> K = 7 rows x 10 px x 24 ch = 1680
    (pad 1792), N = 5x8 px x 3 ch = 120 (pad 128) -> ~11% utilization.

The image travels through HBM exactly twice (x in, out out); row blocks of
R rows are processed per grid step with a 3-row compute halo (y/e are
recomputed on up to 2 halo rows per side -- cheap vs an extra HBM pass).
Zero-padding parity with the reference convs is exact: the input is
pre-padded (rows/cols) on the host side of the call, group-padding supplies
the in-kernel column zeros, and row masks zero y/e outside the image so the
conv3 sees true zero padding (NOT leaky(bias) halo values).

Reference for the measured XLA floor this replaces: PERF.md "Where the
time goes" (CEM 17.7 ms = conv2 ~6 + conv3 ~11 standalone).

HARDWARE VERDICT (2026-08-19, PERF.md "CEM fallback kernel"): after the
Mosaic-safe rewrite (roll-based halo gathers, contiguous-reshape host
im2col) the kernel compiles and runs at the bench config and LOSES 3.5x
to the XLA path (59.86 vs 16.90 ms, batch 128 @640) — the roll chains
and selector matmuls cost more than the MXU-padding they avoid.  Kept
in-tree with its exactness tests as the probe record; ``pallas_cem``
stays off in every deploy path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mmidet_tpu.nn.cem import edge_filter_bank

_C = 3           # input channels (RGB); the reference CEM is 3-channel only
_E = 24          # expanded channels = 8 * C
_LANE = 128


def _leaky(v):
    return jnp.where(v >= 0, v, 0.1 * v)


def _round_up(v: int, m: int) -> int:
    return (v + m - 1) // m * m


# ---------------------------------------------------------------------------
# weight packing (runs OUTSIDE the kernel, on host/XLA; all indices static)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _w2p_indices():
    # patch lane order = 9*dx + 3*ky + c (dx-major: what the reshape-based
    # host im2col emits — see _conv2_patches)
    ky, kx, c, p, n = np.meshgrid(np.arange(3), np.arange(3), np.arange(_C),
                                  np.arange(8), np.arange(_E), indexing="ij")
    rows = 9 * (p + kx) + 3 * ky + c           # dx = p + kx in 0..9
    cols = _E * p + n
    return (rows.ravel(), cols.ravel(),
            ky.ravel(), kx.ravel(), c.ravel(), n.ravel())


@functools.lru_cache(maxsize=None)
def _wb3_bank() -> np.ndarray:
    """Static part of the bank+tile matmul weight: (128, 192) with
    bank[dyb, q-p, 0, m%8] at [10*dyb + q, 24*p + m]."""
    bank = edge_filter_bank(8, 1, 3)           # (3, 3, 1, 8)
    w = np.zeros((_LANE, 8 * _E), np.float32)
    for dyb in range(3):
        for kx in range(3):
            for p in range(8):
                q = p + kx
                for m in range(_E):
                    w[10 * dyb + q, _E * p + m] = bank[dyb, kx, 0, m % 8]
    return w


@functools.lru_cache(maxsize=None)
def _w3p_indices():
    ky, kx, m, s, p, n = np.meshgrid(np.arange(3), np.arange(3),
                                     np.arange(_E), np.arange(5),
                                     np.arange(8), np.arange(_C),
                                     indexing="ij")
    rows = 240 * (s + ky) + _E * (p + kx) + m  # dy = s+ky, q = p+kx
    cols = _E * s + _C * p + n
    return (rows.ravel(), cols.ravel(),
            ky.ravel(), kx.ravel(), m.ravel(), n.ravel())


def pack_cem_weights(w2, b2, factor, bias_s, w3, b3, dtype=jnp.bfloat16):
    """Pack the CEM's deploy params into the kernel's matmul weights.

    w2: (3,3,3,24) HWIO, b2: (24,), factor/bias_s: (24,), w3: (3,3,24,3),
    b3: (3,).  Returns a dict of six arrays (see fused_cem)."""
    rows, cols, ky, kx, c, n = _w2p_indices()
    w2p = jnp.zeros((_LANE, 8 * _E), jnp.float32)
    w2p = w2p.at[rows, cols].set(w2[ky, kx, c, n])
    b2v = jnp.tile(b2, 8)[None, :]                        # (1, 192)

    colfac = jnp.tile(factor, 8)                          # [24p+m] -> factor[m]
    wb3 = jnp.asarray(_wb3_bank()) * colfac[None, :]
    bev = jnp.tile(bias_s, 8)[None, :]

    rows, cols, ky, kx, m, n = _w3p_indices()
    w3p = jnp.zeros((1792, _LANE), jnp.float32)
    w3p = w3p.at[rows, cols].set(w3[ky, kx, m, n])
    b3v = jnp.concatenate([jnp.tile(b3, 40),
                           jnp.zeros((8,), jnp.float32)])[None, :]
    return {"w2p": w2p.astype(dtype), "b2v": b2v, "wb3": wb3.astype(dtype),
            "bev": bev, "w3p": w3p.astype(dtype), "b3v": b3v}


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------

def _kernel(p2_hbm, w2p, b2v, wb3, bev, w3p, b3v, csum, out_ref, p_scr, sem,
            *, H, W, R, pdt):
    """One (image, row-block) grid step.  pdt: matmul/patch compute dtype
    (bf16 on hardware; f32 available for exactness tests).

    Mosaic-safe formulation (round-3 fallback rewrite — every op class
    probed on hardware first, tools/_probe_cem_fb.py):
      * conv2 consumes HOST-side im2col patches (fallback A) — no
        (.., 24G) -> (.., G, 24) lane-split reshapes in-kernel;
      * the channel sum is a (192 x 8) selector MATMUL (fallback B) —
        no (.., 192) -> (.., 8, 24) split;
      * the output leaves the kernel in its blocked (R/5*G, 128) matmul
        layout; un-blocking + the residual add run in XLA afterwards."""
    b = pl.program_id(0)
    i = pl.program_id(1)
    G = W // 8
    row0 = i * R

    cp = pltpu.make_async_copy(p2_hbm.at[b, pl.ds(row0, R + 4)], p_scr, sem)
    cp.start()
    cp.wait()
    p2 = p_scr[:].astype(pdt)                         # (R+4, G, 128)

    # ---- conv2 as an overlapped-patch matmul (8 px / row) ----------------
    ypre = jnp.dot(p2.reshape((R + 4) * G, _LANE), w2p[:].astype(pdt),
                   preferred_element_type=jnp.float32)
    ypre = ypre.reshape(R + 4, G, 8 * _E) + b2v[:][0]
    y = _leaky(ypre)
    # rows outside the image: zero them so downstream convs see true
    # zero padding (y row t is image row row0 - 2 + t)
    t = jax.lax.broadcasted_iota(jnp.int32, (R + 4, G, 1), 0) + (row0 - 2)
    y = y * ((t >= 0) & (t < H)).astype(y.dtype)
    yg = y.astype(pdt)                                # (R+4, G, 192)

    # ---- channel sum as a selector matmul + (bank*tile*factor) matmul ----
    # Halo gather via sublane/lane ROLLS, not offset slices: Mosaic rejects
    # lane-concats whose parts carry mismatched register offsets on a
    # non-concat dim ("result/input offset mismatch", tools/_probe_cem.py
    # 2026-08-19); rolled+masked parts all sit at offset {0,0}
    # (tools/_probe_cem_r3.py: B/C compile, A/D rejected).  tpu.dynamic_
    # rotate is 32-bit-only, so rolls run on the f32 matmul output.
    ysum = jnp.dot(yg.reshape((R + 4) * G, 8 * _E), csum[:].astype(pdt),
                   preferred_element_type=jnp.float32)
    ysum = ysum[:, :8].reshape(R + 4, G, 8)                 # (R+4, G, 8) f32
    gidx = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    sl = pltpu.roll(ysum, 1, 1) * (gidx > 0)                # group g-1 @ g
    sl7 = pltpu.roll(sl, 1, 2)[:, :, 0:1].astype(pdt)       # its lane 7
    sr0 = (pltpu.roll(ysum, G - 1, 1)
           * (gidx < G - 1))[:, :, 0:1].astype(pdt)         # g+1, lane 0
    ysc = ysum.astype(pdt)
    eparts = []
    for dyb in range(3):
        eparts += [sl7[dyb:dyb + R + 2], ysc[dyb:dyb + R + 2],
                   sr0[dyb:dyb + R + 2]]                    # 1 + 8 + 1 lanes
    eparts.append(jnp.zeros((R + 2, G, _LANE - 30), pdt))
    ep = jnp.concatenate(eparts, axis=-1)
    e = jnp.dot(ep.reshape((R + 2) * G, _LANE), wb3[:].astype(pdt),
                preferred_element_type=jnp.float32)
    e = e.reshape(R + 2, G, 8 * _E) + bev[:][0]

    # ---- y2 = y + e (rows -1..R of the block), masked -------------------
    y2f = yg[1:R + 3].astype(jnp.float32) + e               # (R+2, G, 192)
    u = jax.lax.broadcasted_iota(jnp.int32, (R + 2, G, 1), 0) + (row0 - 1)
    y2f = y2f * ((u >= 0) & (u < H)).astype(y2f.dtype)
    # group-neighbor halos by roll (f32; see the eparts comment): the
    # left group's px-7 channel block (lanes 168:191) rolled to 0:23, and
    # the right group's px-0 block already at 0:23.
    l24 = pltpu.roll(pltpu.roll(y2f, 1, 1) * (gidx > 0),
                     _E, 2)[:, :, 0:_E].astype(pdt)
    r24 = (pltpu.roll(y2f, G - 1, 1)
           * (gidx < G - 1))[:, :, 0:_E].astype(pdt)
    y2 = y2f.astype(pdt)

    # ---- conv3 as 5x8-px-block patch matmul ------------------------------
    # K = 240*dy + 24*q + m over a 7-row x 10-px x 24-ch window; the
    # stride-5 row pick uses the slice->reshape->[:, 0] trick (free on the
    # outer, non-tiled dim).  Rows are zero-extended by 6 so every dy
    # slice is in range (dim-0 concat: offset-free).
    y2 = jnp.concatenate([y2, jnp.zeros((6, G, 8 * _E), pdt)], axis=0)
    l24 = jnp.concatenate([l24, jnp.zeros((6, G, _E), pdt)], axis=0)
    r24 = jnp.concatenate([r24, jnp.zeros((6, G, _E), pdt)], axis=0)

    def _pick5(a, dy):
        return a[dy:dy + R].reshape(R // 5, 5, G, a.shape[-1])[:, 0]

    parts3 = []
    for dy in range(7):
        parts3 += [_pick5(l24, dy), _pick5(y2, dy), _pick5(r24, dy)]
    parts3.append(jnp.zeros((R // 5, G, 112), pdt))
    p3 = jnp.concatenate(parts3, axis=-1)
    z = jnp.dot(p3.reshape(R // 5 * G, 1792), w3p[:].astype(pdt),
                preferred_element_type=jnp.float32)
    z = _leaky(z.reshape(R // 5, G, _LANE) + b3v[:][0])

    # ---- blocked output: (R//5, G, [24s+3p+n]) as-is; XLA un-blocks ------
    G_ = z.shape[1]
    out_ref[0] = z.reshape((R // 5) * G_, _LANE).astype(out_ref.dtype)


def cem_kernel_supported(h: int, w: int, c: int) -> bool:
    return c == _C and h % 40 == 0 and w % 8 == 0 and w >= 16


@functools.lru_cache(maxsize=None)
def _csum_selector() -> np.ndarray:
    """(192, 128) channel-sum selector: lane 24p+m contributes to col p
    (fallback B: the channel sum as a matmul — no lane-split reshape)."""
    s = np.zeros((8 * _E, _LANE), np.float32)
    s[np.arange(8 * _E), np.arange(8 * _E) // _E] = 1.0
    return s


def _conv2_patches(x, H, W, G, dtype):
    """Host/XLA-side overlapped-group im2col for conv2 (fallback A):
    p2[b, r, g, 9*dx + 3*ky + c] = x_pad[b, r + ky, 8g + dx - 1, c]
    over output rows r in -2..H+1 (so the kernel needs no lane-split
    reshapes to build patches).  Built from contiguous reshapes only —
    the first cut's stride-8 slices forced 42x-padded relayout copies
    (1.57 GB each, OOM at batch 128; measured 2026-08-19).  The two
    shifted reshapes cover dx 0..7 and 8..9 with zero relayout.  Costs
    one extra HBM pass over a (B, H+4, G, 128) tensor (~1.4 GB/batch-128
    @640 — cheaper than losing the kernel, ROUND2.md fallback A)."""
    B = x.shape[0]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (3, 3), (1, 9), (0, 0)))
    xr = jnp.concatenate([xp[:, ky:ky + H + 4] for ky in range(3)],
                         axis=-1)                 # (B, H+4, W+10, 9)
    r1 = xr[:, :, 0:W].reshape(B, H + 4, G, 8, 9)           # dx 0..7
    r2 = xr[:, :, 8:W + 8].reshape(B, H + 4, G, 8, 9)[:, :, :, 0:2]
    p2 = jnp.concatenate([r1, r2], axis=3).reshape(B, H + 4, G, 90)
    return jnp.pad(p2, ((0, 0), (0, 0), (0, 0), (0, _LANE - 90)))


@functools.partial(jax.jit, static_argnames=("interpret", "precise"))
def fused_cem(x, w2, b2, factor, bias_s, w3, b3, *, interpret: bool = False,
              precise: bool = False):
    """x: (B, H, W, 3).  Params as in pack_cem_weights.  Returns the CEM
    output (B, H, W, 3) in x.dtype.  ``precise=True`` runs patches/matmuls
    in f32 (for exactness tests; deploy uses bf16 like the XLA path)."""
    B, H, W, C = x.shape
    assert cem_kernel_supported(H, W, C), (H, W, C)
    R = 80 if H % 80 == 0 else 40
    G = W // 8
    pdt = jnp.float32 if precise else jnp.bfloat16

    packed = pack_cem_weights(w2, b2, factor, bias_s, w3, b3,
                              dtype=jnp.float32 if precise else jnp.bfloat16)
    p2 = _conv2_patches(x, H, W, G, pdt)
    csum = jnp.asarray(_csum_selector(), pdt)

    kernel = functools.partial(_kernel, H=H, W=W, R=R, pdt=pdt)
    wspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    zb = pl.pallas_call(
        kernel,
        grid=(B, H // R),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  wspec, wspec, wspec, wspec, wspec, wspec, wspec],
        out_specs=pl.BlockSpec((1, (R // 5) * G, _LANE),
                               lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, (H // 5) * G, _LANE), x.dtype),
        scratch_shapes=[pltpu.VMEM((R + 4, G, _LANE), p2.dtype),
                        pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(p2, packed["w2p"], packed["b2v"], packed["wb3"], packed["bev"],
      packed["w3p"], packed["b3v"], csum)
    # un-block (lane = 24s + 3p + n -> rows s, px p, ch n) + residual
    z = zb.reshape(B, H // 5, G, _LANE)[..., :5 * 8 * _C]
    z = z.reshape(B, H // 5, G, 5, 8, _C).transpose(0, 1, 3, 2, 4, 5)
    z = z.reshape(B, H, W, C)
    return (z + x.astype(z.dtype)).astype(x.dtype)
