"""Per-level timing of the fused token transformer at model shapes."""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time, sys
import numpy as np
import jax, jax.numpy as jnp
from mmidet_tpu.nn.transformer_pallas import fused_token_transformer

B, N, L, H = 128, 128, 8, 8
ITERS = 20

def bench(d):
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
            o = fused_token_transformer(x + c, ks, num_heads=H)
            return jnp.sum(o).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.), None, length=ITERS)
        return c
    float(np.asarray(loop(x, ks)))
    t0 = time.perf_counter()
    float(np.asarray(loop(x, ks)))
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    gf = (3072 * d * d + 8 * 65536 * d) * B / 1e9  # with masked-head x8
    print(f"d={d:4d}: {dt:6.2f} ms/call  ({gf / dt * 1e3:6.1f} GFLOP/s eff)",
          flush=True)
    return dt

tot = 0.0
for d in [64, 128, 256, 512]:
    tot += bench(d)
print(f"total (4 levels): {tot:.2f} ms/batch-{B}")
