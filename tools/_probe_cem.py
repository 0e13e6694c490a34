"""fused_cem (single-kernel CEM) vs the XLA ContourEnhance module on the
real chip.

Usage: python tools/_probe_cem.py [batch] [img]
Default: batch 128 @ 640 (the bench headline config).  Honest scan-carry
timing (see tpu-measurement notes in PERF.md): the carry feeds the input
and the full output is reduced.
"""
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.nn.cem import ContourEnhance
from mmidet_tpu.nn.cem_pallas import fused_cem

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
IMG = int(sys.argv[2]) if len(sys.argv) > 2 else 640
ITERS = 20

rng = jax.random.PRNGKey(0)
x = jax.random.normal(rng, (B, IMG, IMG, 3), jnp.bfloat16)
ks = jax.random.split(rng, 6)
p = dict(
    w2=jax.random.normal(ks[0], (3, 3, 3, 24), jnp.float32) * 0.3,
    b2=jax.random.normal(ks[1], (24,), jnp.float32) * 0.5,
    factor=jax.random.normal(ks[2], (24,), jnp.float32) * 0.4 + 1.0,
    bias_s=jax.random.normal(ks[3], (24,), jnp.float32) * 0.5,
    w3=jax.random.normal(ks[4], (3, 3, 24, 3), jnp.float32) * 0.2,
    b3=jax.random.normal(ks[5], (3,), jnp.float32) * 0.5,
)
variables = {"params": {
    "conv2": {"kernel": p["w2"], "bias": p["b2"]},
    "sobel": {"sobel_factor": p["factor"], "bias": p["bias_s"]},
    "conv3": {"kernel": p["w3"], "bias": p["b3"]},
}}
mod = ContourEnhance(3, fused=True, dtype=jnp.bfloat16)


def xla_fn(xx):
    return mod.apply(variables, xx, train=False)


def ker_fn(xx):
    return fused_cem(xx, p["w2"], p["b2"], p["factor"], p["bias_s"],
                     p["w3"], p["b3"])


def timeit(fn, xx):
    @jax.jit
    def loop(xx):
        def body(c, _):
            o = fn(xx + c)
            return jnp.sum(o).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.), None, length=ITERS)
        return c
    float(np.asarray(loop(xx)))      # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(xx)))
        best = min(best, time.perf_counter() - t0)
    return best / ITERS * 1e3


print("timing xla...", flush=True)
t_xla = timeit(xla_fn, x)
print(f"xla={t_xla:.2f}ms; timing kernel...", flush=True)
t_ker = timeit(ker_fn, x)
print(f"kernel={t_ker:.2f}ms; checking exactness...", flush=True)
a = np.asarray(xla_fn(x), np.float32)
b = np.asarray(ker_fn(x), np.float32)
err = np.abs(a - b).max() / (np.abs(a).max() + 1e-9)
print(f"CEM batch={B} img={IMG}: xla={t_xla:.2f}ms  kernel={t_ker:.2f}ms  "
      f"relerr={err:.4f}", flush=True)
