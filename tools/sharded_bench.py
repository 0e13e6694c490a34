"""Data-parallel inference benchmark over a device mesh.

Shards the batch over the mesh's 'data' axis with replicated params —
the multi-chip serving configuration (reference DDP's inference-side
counterpart; here there is no process-group code, just shardings).  On a
real v5e-8 slice this should scale bench.py's single-chip number ~8x; on
this environment it can only be mechanics-checked on the virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/sharded_bench.py 64 --cpu

Usage on hardware: python tools/sharded_bench.py [global_batch]
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
    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.nn.fuse import fold_batchnorm
    from mmidet_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                          replicated)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128 * max(1, len(jax.devices()))
    img = int(args[1]) if len(args) > 1 else 640
    n_dev = len(jax.devices())
    assert batch % n_dev == 0, f"batch {batch} % {n_dev} devices != 0"
    mesh = make_mesh(n_data=n_dev, n_model=1)
    on_tpu = jax.devices()[0].platform == "tpu"

    spec = two_stream_spec("s", "gpt4", nc=6)
    base = TwoStreamDetector(spec=spec, aux_mode="off", dtype=jnp.bfloat16)
    model = TwoStreamDetector(spec=spec, aux_mode="off", fused=True,
                              pallas_fusion=on_tpu, dtype=jnp.bfloat16)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fold_batchnorm(base.init(
        {"params": jax.random.PRNGKey(0)}, small, small, train=False))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    ir = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    bsh = batch_sharding(mesh)
    rep = replicated(mesh)
    variables = jax.device_put(variables, rep)
    rgb = jax.device_put(rgb, bsh)
    ir = jax.device_put(ir, bsh)

    iters = int(os.environ.get("BENCH_ITERS", "8"))

    @jax.jit
    def loop(variables, r, i):
        def body(c, _):
            p = model.apply(variables, r + c, i, train=False)["pred"]
            return jnp.sum(p).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    with mesh:
        float(np.asarray(loop(variables, rgb, ir)))  # compile + warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(loop(variables, rgb, ir)))
            best = min(best, time.perf_counter() - t0)
    img_s = batch * iters / best
    print(f"dp x{n_dev} ({jax.devices()[0].device_kind}): "
          f"{img_s:.1f} img/s global, {img_s / n_dev:.1f} img/s/device, "
          f"batch {batch} ({batch // n_dev}/device)")


if __name__ == "__main__":
    main()
