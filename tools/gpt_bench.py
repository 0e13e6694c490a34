"""Micro-bench the cross-modal fusion block's components on the real chip.

For each pyramid level of yolov5s-gpt4 (d, H, W), times:
  * full CrossModalTransformer (pool + 8-layer transformer + upsample)
  * _TokenTransformer alone (the 128-token transformer)
  * pool + bilinear upsample alone (the full-res resampling traffic)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

LEVELS = [  # yolov5s gpt4: (d_model, H, W) at 640px input
    (64, 160, 160),
    (128, 80, 80),
    (256, 40, 40),
    (512, 20, 20),
]


def timed(fn, *args, iters=16):
    @jax.jit
    def loop(*args):
        def body(c, _):
            out = fn(*(a + c if a.dtype == jnp.bfloat16 and a.ndim == 4
                       else a for a in args))
            leaves = jax.tree_util.tree_leaves(out)
            return jnp.sum(leaves[0]).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / iters


def main():
    from mmidet_tpu.nn.fusion import CrossModalTransformer, _TokenTransformer
    from mmidet_tpu.nn.resize import adaptive_avg_pool, bilinear_resize

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    rng = jax.random.PRNGKey(0)

    total_full = total_trans = total_resize = 0.0
    for d, h, w in LEVELS:
        x = jax.random.uniform(rng, (batch, h, w, d), jnp.bfloat16)
        x2 = x + 0.1

        m = CrossModalTransformer(d, dtype=jnp.bfloat16)
        v = m.init({"params": rng}, x[:1], x2[:1], train=False)
        v = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), v)
        t_full = timed(lambda a, b: m.apply(v, a, b, train=False), x, x2)

        tt = _TokenTransformer(d, dtype=jnp.bfloat16)
        xp = jax.random.uniform(rng, (batch, 8, 8, d), jnp.bfloat16)
        vt = tt.init({"params": rng}, xp[:1], xp[:1], train=False)
        vt = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), vt)
        t_tr = timed(lambda a, b: tt.apply(vt, a, b, train=False), xp, xp)

        def pr(a, b):
            pa = adaptive_avg_pool(a, (8, 8))
            pb = adaptive_avg_pool(b, (8, 8))
            return (bilinear_resize(pa, (h, w)), bilinear_resize(pb, (h, w)))
        t_rs = timed(pr, x, x2)

        total_full += t_full
        total_trans += t_tr
        total_resize += t_rs
        print(f"d={d:4d} {h}x{w}: full {t_full*1e3:7.2f} ms  "
              f"transformer {t_tr*1e3:7.2f} ms  pool+resize {t_rs*1e3:7.2f} ms",
              flush=True)
    print(f"TOTAL      : full {total_full*1e3:7.2f} ms  "
          f"transformer {total_trans*1e3:7.2f} ms  "
          f"pool+resize {total_resize*1e3:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
