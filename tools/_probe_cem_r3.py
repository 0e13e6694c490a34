"""CEM kernel round-3 Mosaic probe: the rank-3 halo-gather rejection.

The round-3 fallback kernel compiled every op class from
``_probe_cem_fb.py`` (rank-2 lane slices + concat) but the REAL kernel
gathers halos from rank-3 vectors with slices along the SUBLANE dim:

    tpu.concatenate dim=2 of (82,80,1)+(82,80,8)+(82,80,1) with
    in_layout offsets {0,0},{1,1},{2,9} -> "result/input offset mismatch
    on non-concat dimension"  (tools/_probe_cem.py, 2026-08-19)

This probe compiles the failing pattern (A) to confirm the class, then
three candidate Mosaic-safe reformulations on the exact kernel shapes
(R=80, G=80):

  B. sublane ROLL (pltpu.roll axis=1) + mask -> all concat parts carry
     offset {0,0};
  C. lane roll by a sub-128 amount (168 on a 192-lane vector) + slice
     [0:24] at offset 0 (the conv3 left/right 24-lane extraction);
  D. rank-2 flattened gather: dim-0 (sublane) slices at offsets
     dyb*G + dg, lane-concat (what _probe_cem_fb.py's rank-2 results
     suggest Mosaic can relayout).

Whichever compiles cheapest drives the kernel rewrite.  Usage:
    python tools/_probe_cem_r3.py
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, G = 80, 80


def _k_a(a_ref, o_ref):
    # the failing pattern: rank-3, sublane-offset slices, lane concat
    ts = a_ref[:]                                   # (R+4, G+2, 8)
    p = jnp.concatenate(
        [ts[2:, 0:G, 7:8], ts[2:, 1:G + 1, :], ts[2:, 2:G + 2, 0:1]],
        axis=-1)                                    # (R+2, G, 10)
    o_ref[:] = (jnp.sum(p, axis=-1, keepdims=True)
                * jnp.ones((1, 1, 8), p.dtype)).astype(jnp.float32)


def _k_b(a_ref, o_ref):
    # sublane roll + mask: every part offset {0,0}.  Rolls run in f32
    # (tpu.dynamic_rotate: "Rotate with non-32-bit data" not implemented
    # for bf16 -- measured on this chip 2026-08-19), then cast back.
    ts32 = a_ref[:, :G, :].astype(jnp.float32)      # (R+4, G, 8) offset 0
    g = jax.lax.broadcasted_iota(jnp.int32, (1, G, 1), 1)
    left = (pltpu.roll(ts32, 1, 1) * (g > 0)).astype(a_ref.dtype)
    right = (pltpu.roll(ts32, G - 1, 1)
             * (g < G - 1)).astype(a_ref.dtype)
    ts = ts32.astype(a_ref.dtype)
    l7 = pltpu.roll(left.astype(jnp.float32), 1, 2).astype(a_ref.dtype)
    p = jnp.concatenate(
        [l7[2:, :, 0:1], ts[2:], right[2:, :, 0:1]], axis=-1)
    o_ref[:] = (jnp.sum(p, axis=-1, keepdims=True)
                * jnp.ones((1, 1, 8), p.dtype)).astype(jnp.float32)


def _k_c(a_ref, o_ref):
    # lane roll by 168 on a 192-lane rank-3 vector + offset-0 slice
    y = a_ref[:]                                    # (R+2, G, 192)
    l24 = pltpu.roll(y.astype(jnp.float32), 24,
                     2)[:, :, 0:24].astype(y.dtype)  # px7 -> lanes 0:24
    p = jnp.concatenate([l24, y, y[:, :, 0:24]], axis=-1)   # (R+2, G, 240)
    o_ref[:] = (jnp.sum(p, axis=-1, keepdims=True)
                * jnp.ones((1, 1, 8), p.dtype)).astype(jnp.float32)


def _k_d(a_ref, o_ref):
    # rank-2 flattened gather: sublane slices at dyb*G + dg offsets
    f = a_ref[:]                                    # ((R+4)*(G+2), 8) flat
    n = (R + 2) * G
    parts = []
    for dyb in range(3):
        for dg in range(3):
            ofs = dyb * (G + 2) + dg
            parts.append(f[ofs:ofs + n, :1])
    p = jnp.concatenate(parts, axis=-1)             # (n, 9)
    o_ref[:] = (jnp.sum(p, axis=-1, keepdims=True)
                * jnp.ones((1, 8), p.dtype)).astype(jnp.float32)


def _try(name, kernel, in_shape, out_shape):
    try:
        x = jnp.ones(in_shape, jnp.bfloat16)
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)
        jax.block_until_ready(out)
        print(f"{name}: COMPILES (|out| {float(jnp.abs(out).mean()):.3f})",
              flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:220]
        print(f"{name}: REJECTED {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    oks = {}
    oks["A rank3-offset-slices (expected REJECT)"] = _try(
        "A rank3-offset-slices", _k_a, (R + 4, G + 2, 8), (R + 2, G, 8))
    oks["B sublane-roll"] = _try(
        "B sublane-roll", _k_b, (R + 4, G, 8), (R + 2, G, 8))
    oks["C lane-roll-168"] = _try(
        "C lane-roll-168", _k_c, (R + 2, G, 192), (R + 2, G, 8))
    oks["D rank2-flat-gather"] = _try(
        "D rank2-flat-gather", _k_d, ((R + 4) * (G + 2), 8),
        ((R + 2) * G, 8))
    print("verdict:", {k: v for k, v in oks.items()})
    return 0


if __name__ == "__main__":
    sys.exit(main())
