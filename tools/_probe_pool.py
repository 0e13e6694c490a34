"""Compare adaptive-pool formulations at gpt4 model shapes (B=128)."""
import sys, pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
import time
import numpy as np
import jax, jax.numpy as jnp
from mmidet_tpu.nn.resize import adaptive_avg_pool, bilinear_resize

ITERS = 30


def timeit(fn, *args):
    @jax.jit
    def loop(*a):
        def body(c, _):
            o = fn(a[0] + c, *a[1:])
            return jnp.sum(o).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.), None, length=ITERS)
        return c
    float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / ITERS * 1e3


def pool_einsum(x):
    return adaptive_avg_pool(x, (8, 8))


def pool_reshape(x):
    b, h, w, c = x.shape
    x = x.reshape(b, 8, h // 8, w, c).mean(axis=2)
    return x.reshape(b, 8, 8, w // 8, c).mean(axis=3)


def pool_rw(x):
    b, h, w, c = x.shape
    k = h // 8
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, k, k, 1),
                              (1, k, k, 1), "VALID")
    return s / (k * k)


for (h, c) in [(160, 64), (80, 128), (40, 256)]:
    x = jax.random.normal(jax.random.PRNGKey(0), (128, h, h, c), jnp.bfloat16)
    r = {nm: timeit(fn, x) for nm, fn in
         [("einsum", pool_einsum), ("reshape", pool_reshape),
          ("reduce_window", pool_rw)]}
    # check equality
    a, b_, c_ = (np.asarray(f(x), np.float32)
                 for f in (pool_einsum, pool_reshape, pool_rw))
    err = max(abs(a - b_).max(), abs(a - c_).max())
    print(f"{h}x{h}x{c}: " + "  ".join(f"{k}={v:.2f}ms" for k, v in r.items())
          + f"  maxerr={err:.2e}", flush=True)

# upsample cost for reference
for (h, c) in [(160, 64), (80, 128), (40, 256), (20, 512)]:
    t = jax.random.normal(jax.random.PRNGKey(0), (128, 8, 8, c), jnp.bfloat16)
    print(f"up 8->{h} c={c}: {timeit(lambda tt: bilinear_resize(tt, (h, h)), t):.2f}ms",
          flush=True)
