"""Wall-clock ablation of the deploy forward on the real chip.

Times variants of the yolov5s-twostream deploy model with the scan-loop
method from bench.py (per-call dispatch over the axon tunnel would otherwise
dominate).  Answers "where does the 0.65 ms/img go" without needing a device
profiler over the tunnel.

Usage: python tools/ablate_bench.py [batch] [--variants a,b,...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(model, variables, rgb, ir, iters=8, decode=True):
    @jax.jit
    def loop(variables, r, i):
        def body(c, _):
            out = model.apply(variables, r + c, i, train=False, decode=decode)
            p = out["pred"] if decode else out["train_outs"][0]
            return jnp.sum(p).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    float(np.asarray(loop(variables, rgb, ir)))  # compile + warm
    t0 = time.perf_counter()
    float(np.asarray(loop(variables, rgb, ir)))
    dt = time.perf_counter() - t0
    return dt / iters


def main():
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.nn.fuse import fold_batchnorm

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    img = 640
    scale = "s"
    if "--scale" in sys.argv:
        scale = sys.argv[sys.argv.index("--scale") + 1]
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    ir = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)

    def build(fusion="gpt4", use_cem=True, pallas=False, merge=False,
              pallas_cem=False):
        spec = two_stream_spec(scale, fusion, nc=6)
        base = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=use_cem,
                                 dtype=jnp.bfloat16)
        model = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=use_cem,
                                  fused=True, pallas_fusion=pallas,
                                  merge_fusion_kernel=merge,
                                  pallas_cem=pallas_cem,
                                  dtype=jnp.bfloat16)
        v = fold_batchnorm(base.init({"params": jax.random.PRNGKey(0)},
                                     small, small, train=False))
        v = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
            v)
        return model, v

    variants = {
        "full": lambda: build("gpt4", True),
        "full_pallas": lambda: build("gpt4", True, pallas=True),
        "no_cem": lambda: build("gpt4", False),
        "add_fusion": lambda: build("add", True),
        "add_no_cem": lambda: build("add", False),
        "fourier": lambda: build("fourier", True),
        "fourier_pallas": lambda: build("fourier", True, pallas=True),
        "fourier_no_cem": lambda: build("fourier", False, pallas=True),
        # round-2 kernel candidates (model-level verdicts):
        "merge": lambda: build("gpt4", True, pallas=True, merge=True),
        "merge_cem": lambda: build("gpt4", True, pallas=True, merge=True,
                                   pallas_cem=True),
        "cem_kernel": lambda: build("gpt4", True, pallas=True,
                                    pallas_cem=True),
        "fourier_merge": lambda: build("fourier", True, pallas=True,
                                       merge=True),
        "fourier_merge_cem": lambda: build("fourier", True, pallas=True,
                                           merge=True, pallas_cem=True),
    }
    sel = None
    if "--variants" in sys.argv:
        sel = sys.argv[sys.argv.index("--variants") + 1].split(",")

    cost = "--cost" in sys.argv  # XLA cost analysis (FLOPs + bytes accessed)

    results = {}
    for k, f in variants.items():
        if sel and k not in sel:
            continue
        model, v = f()
        if cost:
            lowered = jax.jit(lambda v, r, i: model.apply(
                v, r, i, train=False)["pred"]).lower(v, rgb, ir)
            ca = lowered.compile().cost_analysis()
            ca = ca[0] if isinstance(ca, list) else ca
            print(f"{k:14s}: {ca.get('flops', 0) / 1e12:7.2f} TFLOP  "
                  f"{ca.get('bytes accessed', 0) / 1e9:7.2f} GB "
                  f"per batch-{batch}", flush=True)
        dt = timed(model, v, rgb, ir)
        results[k] = dt
        extra = ""
        if cost:
            extra = (f"  [{ca.get('flops', 0) / dt / 1e12:5.1f} TF/s, "
                     f"{ca.get('bytes accessed', 0) / dt / 1e9:5.0f} GB/s]")
        print(f"{k:14s}: {dt * 1e3:8.2f} ms/batch  "
              f"{dt / batch * 1e3:6.3f} ms/img  "
              f"{batch / dt:7.0f} img/s{extra}", flush=True)

    # no-decode ablation on the full model (Detect decode cost)
    if sel is None or "full" in (sel or []):
        model, v = build("gpt4", True)
        dt = timed(model, v, rgb, ir, decode=False)
        print(f"{'full_nodecode':14s}: {dt * 1e3:8.2f} ms/batch  "
              f"{dt / batch * 1e3:6.3f} ms/img  {batch / dt:7.0f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
