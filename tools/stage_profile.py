"""Per-stage wall-clock + XLA-cost breakdown of the deploy forward.

Times CUMULATIVE PREFIXES of the detector DAG (``truncate_at=k``) and
reports per-stage deltas — wall-clock, FLOPs, and HBM bytes (XLA cost
analysis) — so each stage lands on the roofline chart: is it MXU-bound,
HBM-bound, or overhead?  This is the measurement VERDICT round-1 item 2
asks for ("a measured per-slice floor table").

Prefix deltas attribute *fused* cost: XLA compiles each prefix with its
real fusion context, so (prefix k) - (prefix j) is what layers j+1..k
actually cost inside the full graph (unlike standalone-op probes, which
carry dispatch floors and lose cross-op fusion).

Usage:
  python tools/stage_profile.py [--variant gpt4|fourier|add] [--scale s|l]
        [--batch 128] [--img 640] [--layers 5,8,12,...]

Default boundaries (gpt4/fourier grammar, see models/zoo.py):
  5   RGB+IR backbones through P2 C3 (two Focus/Conv/C3 chains)
  8   fusion block 1 + both Add2 merges
  12  P3 conv+C3 pair
  15  fusion block 2 + merges
  19  P4 conv+C3 pair
  22  fusion block 3 + merges
  28  P5 conv+SPP+C3 pair
  31  fusion block 4 + merges
  48  PANet head
  49  Detect (+decode)

Honest tunnel timing: on-device lax.scan whose carry perturbs the input
(hoisting guard), full output reduced into the carry, best-of-3.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

HBM_GBPS = 819.0  # v5e HBM bandwidth (roofline reference)


def _tree_sum(tree):
    leaves = [jnp.sum(x.astype(jnp.float32))
              for x in jax.tree_util.tree_leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.number)]
    return sum(leaves)


def build(args, truncate):
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    spec = two_stream_spec(args.scale, args.variant, nc=6)
    return TwoStreamDetector(spec=spec, aux_mode="off", fused=True,
                             pallas_fusion=True, truncate_at=truncate,
                             dtype=jnp.bfloat16)


def measure(args, variables, rgb, ir, truncate, iters):
    model = build(args, truncate)

    @jax.jit
    def loop(variables, r, i):
        def body(c, _):
            out = model.apply(variables, r + c, i, train=False)
            key = "trunc" if truncate is not None else "pred"
            return (_tree_sum(out[key]).astype(jnp.bfloat16) * 1e-9), None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    lowered = loop.lower(variables, rgb, ir)
    compiled = lowered.compile()
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        flops = float(ca.get("flops", -1)) / iters
        byts = float(ca.get("bytes accessed", -1)) / iters
    except Exception:
        flops = byts = -1.0
    float(np.asarray(compiled(variables, rgb, ir)))  # warm
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(compiled(variables, rgb, ir)))
        dt = min(dt, time.perf_counter() - t0)
    return dt / iters * 1e3, flops, byts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="gpt4")
    ap.add_argument("--scale", default="s")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--layers", default="5,8,12,15,19,22,28,31,48,49")
    args = ap.parse_args()
    bounds = [int(v) for v in args.layers.split(",")]

    from mmidet_tpu.nn.fuse import fold_batchnorm
    base_full = build(args, None)
    # init at 64px (resolution-independent params), bf16-cast deploy params
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    base = type(base_full)(spec=base_full.spec, aux_mode="off",
                           dtype=jnp.bfloat16)
    variables = fold_batchnorm(base.init(
        {"params": jax.random.PRNGKey(0)}, small, small, train=False))
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (args.batch, args.img, args.img, 3),
                             jnp.bfloat16)
    ir = jax.random.uniform(rng, (args.batch, args.img, args.img, 3),
                            jnp.bfloat16)

    print(f"stage profile: {args.scale}-{args.variant} batch={args.batch} "
          f"@{args.img}  (ms per batch; roofline at {HBM_GBPS:.0f} GB/s)",
          flush=True)
    rows = []
    prev = (0.0, 0.0, 0.0)
    for k in bounds:
        trunc = None if k >= 49 else k
        ms, fl, by = measure(args, variables, rgb, ir, trunc, args.iters)
        d_ms = ms - prev[0]
        d_fl = (fl - prev[1]) if fl >= 0 else -1
        d_by = (by - prev[2]) if by >= 0 else -1
        roof = d_by / HBM_GBPS / 1e6 if d_by > 0 else -1  # ms
        tf = d_fl / (d_ms * 1e-3) / 1e12 if d_ms > 0 and d_fl > 0 else -1
        rows.append((k, ms, d_ms, d_fl, d_by, roof, tf))
        prev = (ms, fl if fl >= 0 else prev[1], by if by >= 0 else prev[2])
        print(f"  <=L{k:<3} cum={ms:7.2f}ms  stage={d_ms:6.2f}ms  "
              f"flops={d_fl / 1e9:7.1f}G  bytes={d_by / 1e9:6.2f}GB  "
              f"roofline={roof:6.2f}ms  achieved={tf:6.1f}TF/s", flush=True)

    print("\nsummary (stage, ms, %, bound):")
    total = rows[-1][1]
    for k, ms, d_ms, d_fl, d_by, roof, tf in rows:
        bound = "HBM" if roof > 0 and d_ms < 1.6 * roof else (
            "MXU" if tf > 40 else "overhead/latency")
        print(f"  L<={k:<3} {d_ms:6.2f}ms  {100 * d_ms / total:5.1f}%  {bound}")


if __name__ == "__main__":
    main()
