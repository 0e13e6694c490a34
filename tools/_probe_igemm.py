"""Probe: Pallas conv-chain kernel for the lane-padded backbone stages
(VERDICT r3 #4 — the one "Paths to 2000" lever never hardware-tried).

Closed-form expectation first (PERF.md round-4 floor table): the conv
stack runs at ~96% of the HBM roofline, so pure COMPUTE reformulations
(implicit GEMM / s2d repacking) cannot win more than ~4% — s2d packing in
particular costs 4x FLOPs for at most 2.7x MXU-rate recovery (derivation
in PERF.md), i.e. arithmetically dead without a kernel.  The one lever
that attacks BYTES is chaining a stage's convs per image in VMEM (the
intermediate map never touches HBM): this probe measures it against the
analysis that predicted the C=64 lane-padded in-kernel matmuls eat the
saved bytes (PERF.md round-2 "Why a spatially-tiled conv-chain kernel is
NOT attempted").

Arms (P3-stage shapes: 160x160x64, batch 128, bf16, 3x3 convs + SiLU):
  A: XLA conv -> silu -> conv -> silu            (deploy lowering today)
  B: Pallas per-image chain, intermediate in VMEM (9-shift matmuls)

Usage:  python tools/_probe_igemm.py [batch] [hw] [C]
        (any platform: correctness in interpret mode; timing only on TPU)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def silu(x):
    return x * jax.nn.sigmoid(x)


# ---------------------------------------------------------------- XLA arm
def xla_chain(x, w1, w2):
    """x: (B,H,W,C) bf16; w: (3,3,C,C).  conv->silu->conv->silu."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w1.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    y = silu(y).astype(x.dtype)
    z = jax.lax.conv_general_dilated(y, w2, (1, 1), "SAME",
                                     dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)
    return silu(z).astype(x.dtype)


# ------------------------------------------------------------- Pallas arm
#
# Mosaic alignment (measured on hardware, round 4): ref-level slices along
# the SECOND-MINOR dim (W here, sublane tiling 8) must have 8-aligned
# shape/offset — the first kernel draft sliced (rows, W) windows at
# dx in {0,1,2} and was rejected ("Slice shape along dimension 2 must be
# aligned to tiling (8), but is 34").  H (not tiled) is unconstrained.  So:
# load full-width aligned slabs per dy, do the dx shift at VALUE level
# (lax.slice_in_dim compiles to sublane shifts), and make every ref store
# full-width (zero-pad the value out to the padded width Wp).


def _conv_rows(src_ref, w9, dst, H, W, C, rows_per_tile, apply_silu):
    """3x3 SAME conv from a (H+2, Wp, C)-padded VMEM ref, as 9 shifted
    matmuls per row tile; dst(r, vals) stores a (rows_per_tile, W, C)
    tile of output rows [r, r+rows_per_tile)."""
    n_tiles = H // rows_per_tile

    def tile(t, _):
        r = t * rows_per_tile
        acc = jnp.zeros((rows_per_tile * W, C), jnp.float32)
        for dy in range(3):
            slab = src_ref[pl.ds(r + dy, rows_per_tile), :, :]
            for dx in range(3):
                xs = jax.lax.slice_in_dim(slab, dx, dx + W, axis=1)
                xs = xs.reshape(rows_per_tile * W, C)
                acc += jnp.dot(xs, w9[dy * 3 + dx],
                               preferred_element_type=jnp.float32)
        out = silu(acc) if apply_silu else acc
        dst(r, out.reshape(rows_per_tile, W, C))
        return _

    jax.lax.fori_loop(0, n_tiles, tile, None)


def _round8(n):
    return (n + 7) // 8 * 8


def make_chain_kernel(H, W, C, rows_per_tile=8, interpret=False):
    Wp = _round8(W + 2)

    def kernel(x_ref, w1_ref, w2_ref, o_ref, mid_ref):
        # zero the scratch once (halo rows/cols stay zero)
        mid_ref[:] = jnp.zeros_like(mid_ref)

        def into_mid(r, vals):
            # full-width store at the (free) H offset r+1; the +1 col halo
            # is built into the value by zero-padding out to Wp
            vals_p = jnp.pad(vals, ((0, 0), (1, Wp - W - 1), (0, 0)))
            mid_ref[pl.ds(r + 1, vals.shape[0]), :, :] = \
                vals_p.astype(mid_ref.dtype)

        _conv_rows(x_ref.at[0], [w1_ref[i] for i in range(9)], into_mid,
                   H, W, C, rows_per_tile, True)

        def into_out(r, vals):
            vals_p = jnp.pad(vals, ((0, 0), (0, Wp - W), (0, 0)))
            o_ref[0, pl.ds(r, vals.shape[0]), :, :] = \
                vals_p.astype(o_ref.dtype)

        _conv_rows(mid_ref, [w2_ref[i] for i in range(9)], into_out,
                   H, W, C, rows_per_tile, True)

    def run(xp, w1, w2):
        """xp: (B, H+2, Wp, C) pre-padded bf16; w: (9, C, C)."""
        B = xp.shape[0]
        out = pl.pallas_call(
            kernel,
            grid=(B,),
            in_specs=[
                pl.BlockSpec((1, H + 2, Wp, C), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, H, Wp, C), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, H, Wp, C), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((H + 2, Wp, C), jnp.bfloat16)],
            interpret=interpret,
        )(xp, w1, w2)
        return out[:, :, :W, :]

    return run


def pallas_chain(x, w1, w2, interpret=False):
    B, H, W, C = x.shape
    Wp = _round8(W + 2)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, Wp - W - 1), (0, 0)))
    w19 = w1.reshape(9, C, C).astype(jnp.bfloat16)
    w29 = w2.reshape(9, C, C).astype(jnp.bfloat16)
    return make_chain_kernel(H, W, C, interpret=interpret)(xp, w19, w29)


# ------------------------------------------------------------------ timing
def timed(fn, *args, iters=8):
    @jax.jit
    def loop(a0, rest):
        def body(c, _):
            out = fn(a0 + c, *rest)
            return jnp.sum(out).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    a0, *rest = args
    float(np.asarray(loop(a0, tuple(rest))))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(a0, tuple(rest))))
        best = min(best, time.perf_counter() - t0)
    return best / iters


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    HW = int(sys.argv[2]) if len(sys.argv) > 2 else 160
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    on_tpu = jax.devices()[0].platform == "tpu"
    rng = jax.random.PRNGKey(0)
    kx, k1, k2 = jax.random.split(rng, 3)

    def arms(C, interpret):
        w1 = (jax.random.normal(k1, (3, 3, C, C), jnp.float32) * 0.05)
        w2 = (jax.random.normal(k2, (3, 3, C, C), jnp.float32) * 0.05)
        xs = jax.random.normal(kx, (2, 32, 32, C), jnp.float32).astype(
            jnp.bfloat16)
        ref = np.asarray(xla_chain(xs, w1.astype(jnp.bfloat16),
                                   w2.astype(jnp.bfloat16)), np.float32)
        got = np.asarray(pallas_chain(xs, w1, w2, interpret=interpret),
                         np.float32)
        rel = np.abs(got - ref) / np.maximum(1e-2, np.abs(ref))
        print(f"correctness (32x32x{C}): relerr mean {rel.mean():.4f} "
              f"max {rel.max():.4f}")
        assert rel.mean() < 0.05, "kernel wrong"
        return w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)

    def bench(C, wb1, wb2):
        x = jax.random.normal(kx, (B, HW, HW, C), jnp.float32).astype(
            jnp.bfloat16)
        t_xla = timed(lambda xx, a, b: xla_chain(xx, a, b), x, wb1, wb2)
        t_pl = timed(lambda xx, a, b: pallas_chain(xx, a, b), x, wb1, wb2)
        gb = 2 * B * HW * HW * C * 2 / 1e9  # in read + out write, bf16
        print(f"[{B}x{HW}x{HW}x{C}] XLA chain {t_xla * 1e3:.2f} ms | "
              f"Pallas VMEM-chain {t_pl * 1e3:.2f} ms | "
              f"min-traffic {gb:.2f} GB -> {gb / 0.819:.2f} ms bytes floor")

    if not on_tpu:
        arms(C, interpret=True)
        print("CPU: correctness only (timing needs the real chip)")
        return

    # the backbone's real channel count (C=64 at P3) — Mosaic rejects the
    # partial-lane-tile memref_slice this formulation needs (C < 128 lane
    # tiling); attempt it anyway so the probe records the current verdict
    try:
        wb1, wb2 = arms(C, interpret=False)
        bench(C, wb1, wb2)
    except Exception as e:  # noqa: BLE001 — record + continue to C=128
        msg = str(e)
        key = next((ln for ln in msg.splitlines() if "aligned" in ln
                    or "Mosaic" in ln), msg.splitlines()[0] if msg else "?")
        print(f"C={C}: Mosaic rejected ({key.strip()[:120]})")

    # aligned head-to-head (C=128, one full lane tile): can a VMEM-chained
    # conv pair beat XLA's two convs AT ALL on this hardware?
    wb1, wb2 = arms(128, interpret=False)
    bench(128, wb1, wb2)


if __name__ == "__main__":
    main()
