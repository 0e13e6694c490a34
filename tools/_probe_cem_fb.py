"""CEM fallback-B Mosaic probe (VERDICT round-2 #8, ROUND2.md "CEM-kernel
Mosaic risk + fallback plan").

The round-2 CEM kernel was Mosaic-rejected on its lane-SPLIT reshape
((84,1920)->(84,80,24)).  The fallback redesign removes every lane split:
  * fallback A: conv2 consumes host-side im2col patches (K=90 pad 128);
  * fallback B: the bank stage becomes a 192->8 ones-matmul (channel sum)
    + a composite 5x5 conv folded into conv3's algebra.
What REMAINS are lane-dim slices/concats at sub-128 offsets:
  (i)  192-lane arrays sliced at 168:192 / 0:24 and concatenated to 240
       lanes (conv3 patch build);
  (ii) 8-lane arrays sliced at 7:8 / 0:1 and concatenated to 10 lanes
       (comp5 patch build on the channel-summed map).
This probe compiles EXACTLY those two op shapes as minimal kernels on the
real chip.  If either is rejected, the fallback kernel is dead without
writing it; if both compile, the full rewrite is justified.

Usage: python tools/_probe_cem_fb.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _k_slice192(a_ref, w_ref, o_ref):
    a = a_ref[:]                                   # (96, 192)
    left = a[:, 168:192]                           # lane slice @168
    right = a[:, 0:24]
    p = jnp.concatenate([left, a, right], axis=-1)  # (96, 240)
    p = jnp.concatenate(
        [p, jnp.zeros((p.shape[0], 16), p.dtype)], axis=-1)  # pad 256
    o_ref[:] = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)


def _k_slice8(a_ref, w_ref, o_ref):
    t = a_ref[:]                                   # (96, 8)
    p = jnp.concatenate([t[:, 7:8], t, t[:, 0:1]], axis=-1)   # (96, 10)
    p = jnp.concatenate(
        [p, jnp.zeros((p.shape[0], 118), p.dtype)], axis=-1)  # pad 128
    o_ref[:] = jnp.dot(p, w_ref[:], preferred_element_type=jnp.float32)


def _k_ones_matmul(y_ref, s_ref, o_ref):
    # the fallback-B channel sum as a matmul: (96,192) @ (192,8) -> pad out
    o_ref[:] = jnp.dot(y_ref[:], s_ref[:],
                       preferred_element_type=jnp.float32)


def _try(name, kernel, args, out_shape):
    try:
        out = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(*args)
        jax.block_until_ready(out)
        print(f"{name}: COMPILES (out {out.shape}, "
              f"|out| {float(jnp.abs(out).mean()):.4f})", flush=True)
        return True
    except Exception as e:
        msg = str(e).replace("\n", " ")[:300]
        print(f"{name}: REJECTED {type(e).__name__}: {msg}", flush=True)
        return False


def main():
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16
    a192 = jax.random.normal(key, (96, 192), dt)
    w256 = jax.random.normal(key, (256, 128), dt)
    a8 = jax.random.normal(key, (96, 8), dt)
    w128 = jax.random.normal(key, (128, 128), dt)
    smat = jnp.asarray((np.arange(192)[:, None] // 24
                        == np.arange(8)[None, :]), dt)

    ok1 = _try("conv3 patch build (192-lane slices @168/0:24 -> 240+pad)",
               _k_slice192, (a192, w256), (96, 128))
    ok2 = _try("comp5 patch build (8-lane slices 7:8/0:1 -> 10+pad)",
               _k_slice8, (a8, w128), (96, 128))
    ok3 = _try("ones-matmul channel sum (192x8 selector)",
               _k_ones_matmul, (a192, smat.astype(dt) @ jnp.eye(
                   8, 128, dtype=dt)), (96, 128))
    verdict = "ALL COMPILE -> full fallback kernel justified" if \
        (ok1 and ok2 and ok3) else \
        "REJECTED -> fallback kernel dead without writing it; close the " \
        "CEM chapter (stage_profile floor table stands)"
    print(f"verdict: {verdict}")
    return 0 if (ok1 and ok2 and ok3) else 1


if __name__ == "__main__":
    sys.exit(main())
