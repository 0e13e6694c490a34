"""Hardware probe: is W8A8 int8 a real HBM-bytes lever for the backbone?

VERDICT round-2 item 2: the gpt4-s backbone is bytes-bound (27.5 GB /
batch-128 at the 819 GB/s roofline -> 30.7 ms measured).  int8
activations halve those bytes IF XLA's TPU conv lowering (a) consumes
int8 from HBM without a separate upcast pass and (b) lets the
dequant->SiLU->requant epilogue fuse into the conv.  This probe answers
that by measurement, per VERDICT's instruction ("check whether XLA's
int8 conv actually reduces HBM bytes (cost analysis) or upcasts").

Three variants per shape, wall-clocked + cost-analysed on the real chip:
  bf16   : conv(bf16 x, bf16 w) -> bf16 SiLU          (today's deploy path)
  w8a8   : conv(int8 x, int8 w, acc int32) -> f32 scale -> SiLU -> int8
  w8a8nf : same but output left int8 WITHOUT SiLU epilogue (isolates
           whether the epilogue blocks fusion)

Shapes are the byte-dominant early stages of the yolov5s two-stream
backbone (reference models/transformer/yolov5s_fusion_gpt4_*.yaml layers
0-4; both streams run them, hence the x2 in the byte math):
  P1: 320x320x32  -> 3x3/2 -> 160x160x64
  P2: 160x160x64  -> 3x3/2 -> 80x80x128
  C3 body conv: 160x160x64 -> 3x3/1 -> 160x160x64

Usage:  python tools/_probe_int8.py [batch]
"""
from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _conv(x, w, stride, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


def bf16_stage(x, w):
    y = _conv(x, w, 2)
    return y * jax.nn.sigmoid(y)                      # SiLU


def w8a8_stage(x8, w8, sx, sw, sy):
    # int8 x int8 -> int32 accum; dequant -> SiLU -> requant (per-tensor
    # scales; per-channel weight scales are a broadcast away, same bytes)
    acc = _conv(x8, w8, 2, preferred=jnp.int32)
    y = acc.astype(jnp.float32) * (sx * sw)
    y = y * jax.nn.sigmoid(y)
    q = jnp.clip(jnp.round(y / sy), -127, 127).astype(jnp.int8)
    return q


def w8a8_nofuse(x8, w8):
    # raw int8 conv, int8 out via simple shift — the fusion-free floor
    acc = _conv(x8, w8, 2, preferred=jnp.int32)
    return jnp.clip(acc >> 7, -127, 127).astype(jnp.int8)


def _bench(fn, args, iters=30):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    return dt, out


def _cost(fn, args):
    c = jax.jit(fn).lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return (c or {}).get("bytes accessed", float("nan"))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind} ({dev.platform}), batch={batch}")

    shapes = [
        ("P1 320->160 c32->64", (batch, 320, 320, 32), 64),
        ("P2 160->80  c64->128", (batch, 160, 160, 64), 128),
    ]
    key = jax.random.PRNGKey(0)
    for name, xshape, cout in shapes:
        kx, kw = jax.random.split(key)
        x = jax.random.normal(kx, xshape, jnp.bfloat16)
        w = (jax.random.normal(kw, (3, 3, xshape[-1], cout), jnp.bfloat16)
             * 0.05)
        x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 32), -127,
                      127).astype(jnp.int8)
        w8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 512), -127,
                      127).astype(jnp.int8)

        f_bf = jax.jit(bf16_stage)
        f_q = jax.jit(partial(w8a8_stage, sx=1 / 32., sw=1 / 512., sy=1 / 32.))
        f_qn = jax.jit(w8a8_nofuse)

        t_bf, _ = _bench(f_bf, (x, w))
        t_q, _ = _bench(f_q, (x8, w8))
        t_qn, _ = _bench(f_qn, (x8, w8))
        b_bf = _cost(bf16_stage, (x, w))
        b_q = _cost(partial(w8a8_stage, sx=1 / 32., sw=1 / 512., sy=1 / 32.),
                    (x8, w8))
        b_qn = _cost(w8a8_nofuse, (x8, w8))
        gb = 1 / 2**30
        print(f"{name}:")
        print(f"  bf16    {t_bf:7.3f} ms  {b_bf * gb:6.2f} GB accessed")
        print(f"  w8a8    {t_q:7.3f} ms  {b_q * gb:6.2f} GB accessed  "
              f"({t_bf / t_q:.2f}x)")
        print(f"  w8a8-nf {t_qn:7.3f} ms  {b_qn * gb:6.2f} GB accessed  "
              f"({t_bf / t_qn:.2f}x)", flush=True)

    # numerical sanity: int8 path approximates the bf16 path
    x = jax.random.normal(key, (2, 64, 64, 32), jnp.bfloat16)
    w = jax.random.normal(key, (3, 3, 32, 64), jnp.bfloat16) * 0.05
    x8 = jnp.clip(jnp.round(x.astype(jnp.float32) * 32), -127,
                  127).astype(jnp.int8)
    w8 = jnp.clip(jnp.round(w.astype(jnp.float32) * 512), -127,
                  127).astype(jnp.int8)
    ref = np.asarray(bf16_stage(x, w), np.float32)
    got = np.asarray(w8a8_stage(x8, w8, 1 / 32., 1 / 512., 1 / 32.),
                     np.float32) * (1 / 32.)
    err = np.abs(ref - got).mean() / (np.abs(ref).mean() + 1e-9)
    print(f"sanity rel-err (quantization noise expected ~3-5%): {err:.4f}")


if __name__ == "__main__":
    main()
