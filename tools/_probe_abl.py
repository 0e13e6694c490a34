"""Attribute fused-kernel time: baseline vs no-gelu / no-softmax / no-ln.

All variants run the ONE canonical kernel
(mmidet_tpu.nn.transformer_pallas.fused_token_transformer) with its
probe-only ``ablate``/``tile_b`` flags — there are no per-variant kernel
copies to drift.
"""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import functools
import time
import numpy as np
import jax, jax.numpy as jnp

from mmidet_tpu.nn.transformer_pallas import fused_token_transformer

B, N, L, H = 128, 128, 8, 8
ITERS = 20


def bench(fn, d):
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (B, N, d), jnp.bfloat16)
    ks = {}
    def mk(shape, dt=jnp.bfloat16):
        return jax.random.normal(rng, shape, dt) * 0.02
    for nm in ["ln1_scale", "ln1_bias", "bq", "bk", "bv", "bo",
               "ln2_scale", "ln2_bias", "b2"]:
        ks[nm] = mk((L, d), jnp.float32)
    for nm in ["wq", "wk", "wv", "wo"]:
        ks[nm] = mk((L, d, d))
    ks["w1"] = mk((L, d, 4 * d)); ks["b1"] = mk((L, 4 * d), jnp.float32)
    ks["w2"] = mk((L, 4 * d, d))

    @jax.jit
    def loop(x, ks):
        def body(c, _):
            o = fn(x + c, ks, num_heads=H)
            return jnp.sum(o).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.), None, length=ITERS)
        return c
    float(np.asarray(loop(x, ks)))
    t0 = time.perf_counter()
    float(np.asarray(loop(x, ks)))
    return (time.perf_counter() - t0) / ITERS * 1e3


if __name__ == "__main__":
    variants = {
        "base": None,
        "nogelu": "nogelu",
        "nosm": "nosm",
        "noln": "noln",
    }
    for d in [128, 512]:
        row = []
        for nm, abl in variants.items():
            fn = functools.partial(fused_token_transformer, ablate=abl)
            row.append(f"{nm}={bench(fn, d):.2f}ms")
        print(f"d={d}: " + "  ".join(row), flush=True)
