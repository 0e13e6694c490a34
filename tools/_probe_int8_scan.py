"""Probe 4 (methodology-correct): conv-chain formulations under the
carry-fed lax.scan harness bench.py uses — per-call dispatch over the
tunnel memoizes identical executions, so probes 1-3's micro wall-clocks
were unusable (bf16 "507 TF/s" > the chip's peak).  Cost-analysis bytes
from probe 3 stand: s8/fp8 storage cuts the 4-conv chain 2.54->1.66 GB.

Formulations:
  bf16      — today's deploy path
  s8conv    — int8 x int8 -> int32 XLA convs (+dequant/SiLU/requant)
  s8store   — tensors cross HBM int8, convs run bf16 (dequant at input)
  fp8store  — same with float8_e4m3fn storage

Usage: python tools/_probe_int8_scan.py [batch] [iters]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, stride, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


CHAIN = [(3, 2, 32, 64), (3, 1, 64, 64), (3, 2, 64, 128), (3, 1, 128, 128)]

# the real yolov5s backbone conv trunk (post-Focus, C3 bodies unrolled as
# their 1x1/3x3 convs at the bottleneck widths) — REAL=1 benches this
# instead, starting from the (B,320,320,32) Focus output
REAL_CHAIN = [
    (3, 2, 32, 64),                     # P2 downsample
    (1, 1, 64, 32), (3, 1, 32, 32), (1, 1, 32, 64),    # C3(64) approx
    (3, 2, 64, 128),                    # P3 downsample
    (1, 1, 128, 64), (3, 1, 64, 64), (3, 1, 64, 64),
    (3, 1, 64, 64), (1, 1, 64, 128),    # C3(128) x3 approx
    (3, 2, 128, 256),                   # P4
    (1, 1, 256, 128), (3, 1, 128, 128), (3, 1, 128, 128),
    (3, 1, 128, 128), (1, 1, 128, 256),
    (3, 2, 256, 512),                   # P5
    (1, 1, 512, 256), (3, 1, 256, 256), (1, 1, 256, 512),
]


def make_chain(mode, ws, ws8):
    sx = 4.0 / 127.0

    def run(x0):
        x = x0
        for i, ((k, s, ci, co), w) in enumerate(zip(CHAIN, ws)):
            if mode == "bf16":
                x = _conv(x, w, s)
                x = x * jax.nn.sigmoid(x)
            elif mode == "s8conv":
                q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                             -127, 127).astype(jnp.int8)
                w8, sw = ws8[i]
                acc = _conv(q, w8, s, preferred=jnp.int32)
                y = acc.astype(jnp.float32) * (sx * sw)
                x = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
            else:
                qdt = jnp.int8 if mode == "s8store" else jnp.float8_e4m3fn
                if x.dtype == qdt:
                    x = x.astype(jnp.bfloat16) * jnp.bfloat16(sx)
                y = _conv(x, w, s)
                y = y * jax.nn.sigmoid(y)
                if qdt == jnp.int8:
                    x = jnp.clip(jnp.round(y / sx), -127, 127).astype(qdt)
                else:
                    x = (y / jnp.bfloat16(sx)).astype(qdt)
        # reduce to a scalar so the scan carry is tiny but depends on
        # the whole chain
        return jnp.sum(x.astype(jnp.float32)) * 1e-9
    return run


def main():
    global CHAIN
    import os
    if os.environ.get("REAL", "0") == "1":
        CHAIN = REAL_CHAIN
        print(f"REAL backbone trunk: {len(CHAIN)} convs")
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}, batch={batch}, "
          f"iters={iters}")
    x0 = jax.random.normal(key, (batch, 320, 320, 32), jnp.bfloat16)
    ws, ws8 = [], []
    for i, (k, s, ci, co) in enumerate(CHAIN):
        w = jax.random.normal(jax.random.fold_in(key, i),
                              (k, k, ci, co), jnp.bfloat16) * 0.05
        ws.append(w)
        wf = w.astype(jnp.float32)
        sw = jnp.maximum(jnp.max(jnp.abs(wf), axis=(0, 1, 2)), 1e-8) / 127.
        ws8.append((jnp.clip(jnp.round(wf / sw), -127,
                             127).astype(jnp.int8), sw))

    for mode in ("bf16", "s8conv", "s8store", "fp8store"):
        run = make_chain(mode, ws, ws8)

        @jax.jit
        def loop(x0, c0):
            def body(c, _):
                # carry perturbs the input -> no memoization/hoisting
                return run(x0 + c.astype(jnp.bfloat16)), None
            c, _ = jax.lax.scan(body, c0, None, length=iters)
            return c

        try:
            float(np.asarray(loop(x0, jnp.float32(0.0))))  # compile+warm
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(np.asarray(loop(x0, jnp.float32(0.0))))
                best = min(best, time.perf_counter() - t0)
            ms = best / iters * 1e3
            bw = 1.66 if mode in ("s8store", "fp8store") else 2.54
            print(f"{mode:9s}: {ms:7.3f} ms/chain  "
                  f"(implied {bw / ms * 1e3:6.0f} GB/s vs probe-3 bytes)",
                  flush=True)
        except Exception as e:
            print(f"{mode:9s}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
