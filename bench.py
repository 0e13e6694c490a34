"""Throughput benchmark: paired 640px VIS-IR inference on the real chip.

North-star metric (BASELINE.md): >= 2000 paired 640px img/s/chip at
yolov5s-twostream.  Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s", "vs_baseline": N}

The measured program is the full detector forward (bf16, NHWC) including the
on-device Detect decode; NMS timing is reported separately on stderr (the
reference also reports inference/NMS split, test.py:261-263).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp

BASELINE_IMG_S = 2000.0


def main():
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.ops.nms import non_max_suppression

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    img = 640
    spec = two_stream_spec("s", "gpt4", nc=6)
    # deploy configuration: bf16, BN folded into convs (fuse_conv_and_bn
    # parity), batch sized to saturate the chip
    from mmidet_tpu.nn.fuse import fold_batchnorm
    base = TwoStreamDetector(spec=spec, aux_mode="off", dtype=jnp.bfloat16)
    model = TwoStreamDetector(spec=spec, aux_mode="off", fused=True,
                              pallas_fusion=True, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    ir = jax.random.uniform(rng, (batch, img, img, 3), jnp.bfloat16)
    # init at 64px (params are resolution-independent) to keep the init
    # trace/compile cheap; apply at full 640px
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = fold_batchnorm(base.init(
        {"params": jax.random.PRNGKey(0)}, small, small, train=False))
    # deploy: cast params to bf16 (halves param HBM reads, removes the
    # per-op f32->bf16 converts)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x,
        variables)

    # timing via an on-device scan loop: per-call dispatch + host sync over
    # the tunnel would otherwise dominate (measured ~2.4 ms/op overhead)
    iters = int(os.environ.get("BENCH_ITERS", "8"))

    @jax.jit
    def loop(variables, r, i):
        def body(c, _):
            p = model.apply(variables, r + c, i, train=False)["pred"]
            return jnp.sum(p).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c

    import numpy as np
    float(np.asarray(loop(variables, rgb, ir)))  # compile + warmup
    dt = float("inf")
    for _ in range(3):  # best-of-3: tunnel jitter is one-sided (slow-only)
        t0 = time.perf_counter()
        float(np.asarray(loop(variables, rgb, ir)))
        dt = min(dt, time.perf_counter() - t0)
    img_s = batch * iters / dt
    pred = jax.jit(lambda v, r, i: model.apply(
        v, r, i, train=False)["pred"])(variables, rgb, ir)

    # NMS timing (reported separately, as the reference does) — optional:
    # it costs a second large compile over the tunnel
    nms_ms = -1.0
    if os.environ.get("BENCH_NMS", "0") == "1":
        import numpy as np
        nms = jax.jit(lambda p: non_max_suppression(p.astype(jnp.float32),
                                                    0.25, 0.45))
        d, v = nms(pred)
        np.asarray(d)
        t0 = time.perf_counter()
        for _ in range(5):
            d, v = nms(pred)
        np.asarray(d)
        nms_ms = (time.perf_counter() - t0) / 5 / batch * 1e3

    print(f"inference: {1e3 / img_s:.2f} ms/img, nms: {nms_ms:.2f} ms/img "
          f"(-1 = skipped), batch={batch}, "
          f"device={jax.devices()[0].device_kind}", file=sys.stderr)
    print(json.dumps({
        "metric": "yolov5s_twostream_640_paired_inference",
        "value": round(img_s, 1),
        "unit": "img/s",
        "vs_baseline": round(img_s / BASELINE_IMG_S, 3),
    }))


if __name__ == "__main__":
    main()
