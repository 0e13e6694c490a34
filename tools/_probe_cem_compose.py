"""Hardware probe: composed CEM tail (one 5x5 conv, cem.tail_composed) vs
the plain fused CEM graph at the bench config (batch 128 @640, bf16).

The composition is exact (tests/test_cem_composed.py); this probe decides
the deploy DEFAULT by wall-clock.  Prediction from the padded-MXU model
(PERF.md "CEM is at its floor"): the composed conv nearly triples K per
pixel (600 vs 216) at the same N=3 lane padding, so it should LOSE — but
the repo's rule is kill with a measurement.  Carry-fed lax.scan harness
(the only honest timing over the tunnel, PERF.md round-3 methodology).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.nn.cem import ContourEnhance

B, H = int(__import__("os").environ.get("PB", "128")), 640
ITERS = 8


def measure(compose):
    mod = ContourEnhance(3, fused=True, compose_tail=compose,
                         dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, H, H, 3),
                           jnp.bfloat16)
    variables = mod.init({"params": jax.random.PRNGKey(1)},
                         jnp.zeros((1, 64, 64, 3), jnp.float32),
                         train=False)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)

    @jax.jit
    def loop(variables, x):
        def body(c, _):
            y = mod.apply(variables, x + c, train=False)
            return jnp.sum(y).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=ITERS)
        return c

    float(np.asarray(loop(variables, x)))  # compile + warmup
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(loop(variables, x)))
        dt = min(dt, time.perf_counter() - t0)
    ms = dt / ITERS * 1e3
    print(f"compose={compose}: {ms:.2f} ms/batch-{B}", flush=True)
    return ms


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    plain = measure(False)
    comp = measure(True)
    print(f"verdict: composed is {plain / comp:.2f}x "
          f"({'WIN' if comp < plain else 'LOSS'})")
