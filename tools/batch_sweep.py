"""Batch-size sweep for the deploy inference config (one process, real chip).

The batch-128 saturation point in PERF.md predates the stacked-head kernel
and BN-fold/bf16-params work; this re-measures it.  Usage:

    python tools/batch_sweep.py 96 128 160 192 256
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.nn.fuse import fold_batchnorm

    batches = [int(a) for a in sys.argv[1:]] or [96, 128, 160, 192, 256]
    img = 640
    iters = int(os.environ.get("BENCH_ITERS", "8"))
    spec = two_stream_spec("s", "gpt4", nc=6)
    base = TwoStreamDetector(spec=spec, aux_mode="off", dtype=jnp.bfloat16)
    model = TwoStreamDetector(spec=spec, aux_mode="off", fused=True,
                              pallas_fusion=True, dtype=jnp.bfloat16)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fold_batchnorm(base.init(
        {"params": jax.random.PRNGKey(0)}, small, small, train=False))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    @jax.jit
    def loop(variables, r, i):
        def body(c, _):
            p = model.apply(variables, r + c, i, train=False)["pred"]
            return jnp.sum(p).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    for batch in batches:
        rng = jax.random.PRNGKey(0)
        rgb = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
        ir = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
        try:
            float(np.asarray(loop(variables, rgb, ir)))  # compile + warmup
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(loop(variables, rgb, ir)))
                best = min(best, time.perf_counter() - t0)
        except Exception as e:  # OOM at large batch is expected eventually
            print(f"batch {batch:4d}: FAILED ({type(e).__name__}: "
                  f"{str(e)[:120]})", flush=True)
            continue
        img_s = batch * iters / best
        print(f"batch {batch:4d}: {img_s:8.1f} img/s "
              f"({best / iters * 1e3:6.1f} ms/batch, "
              f"{best / iters / batch * 1e3:.3f} ms/img)", flush=True)


if __name__ == "__main__":
    main()
