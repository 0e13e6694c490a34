"""Probe 3: isolate WHERE the XLA s8 conv path dies, and test the two
remaining formulations.

 a) dot_general s8xs8->s32 vs bf16 at conv-ish shapes — is the MXU int8
    path itself fast?  (If not, a Pallas int8 implicit-GEMM is dead too.)
 b) s8-STORAGE chain: tensors cross HBM as int8 but the conv itself runs
    bf16 (dequant feeds the conv).  Bytes halve iff XLA fuses the
    dequant into the conv's operand side instead of materializing bf16.
 c) same but fp8 (e4m3) storage.

Usage: python tools/_probe_int8_dot.py [batch]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp


def _bench(fn, args, iters=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def _cost(jfn, args):
    c = jfn.lower(*args).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return (c or {}).get("bytes accessed", float("nan")) / 2**30


def _conv(x, w, stride, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


CHAIN = [(3, 2, 32, 64), (3, 1, 64, 64), (3, 2, 64, 128), (3, 1, 128, 128)]


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}, batch={batch}")

    # ---- (a) dot_general rates at conv-ish shapes -------------------
    for m, k, n in [(160 * 160 * 8, 288, 64), (80 * 80 * 16, 576, 128),
                    (4096, 1024, 1024)]:
        a_bf = jax.random.normal(key, (m, k), jnp.bfloat16)
        b_bf = jax.random.normal(key, (k, n), jnp.bfloat16)
        a8 = jnp.clip(jnp.round(a_bf.astype(jnp.float32) * 16), -127,
                      127).astype(jnp.int8)
        b8 = jnp.clip(jnp.round(b_bf.astype(jnp.float32) * 16), -127,
                      127).astype(jnp.int8)
        f_bf = jax.jit(lambda a, b: (a @ b).astype(jnp.bfloat16))
        f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32).astype(jnp.bfloat16))
        t_bf = _bench(f_bf, (a_bf, b_bf))
        t_i8 = _bench(f_i8, (a8, b8))
        tf = 2 * m * k * n / 1e12
        print(f"dot m={m} k={k} n={n}: bf16 {t_bf:7.3f} ms "
              f"({tf / t_bf * 1e3:6.1f} TF/s)  s8 {t_i8:7.3f} ms "
              f"({tf / t_i8 * 1e3:6.1f} TOP/s)  ratio {t_bf / t_i8:.2f}x",
              flush=True)

    # ---- (b)/(c) storage-dtype chains -------------------------------
    ws = [jax.random.normal(jax.random.fold_in(key, i), (kk, kk, ci, co),
                            jnp.bfloat16) * 0.05
          for i, (kk, s, ci, co) in enumerate(CHAIN)]
    x = jax.random.normal(key, (batch, 320, 320, 32), jnp.bfloat16)

    def chain_bf16(x, ws):
        for (kk, s, ci, co), w in zip(CHAIN, ws):
            x = _conv(x, w, s)
            x = x * jax.nn.sigmoid(x)
        return x

    def chain_store(x, ws, qdt):
        sx = jnp.bfloat16(4.0 / 127.0)
        for (kk, s, ci, co), w in zip(CHAIN, ws):
            if x.dtype == qdt:
                x = x.astype(jnp.bfloat16) * sx
            y = _conv(x, w, s)
            y = y * jax.nn.sigmoid(y)
            if qdt == jnp.int8:
                x = jnp.clip(jnp.round(y / sx), -127, 127).astype(qdt)
            else:
                x = (y / sx).astype(qdt)
        return x

    cases = [("bf16 chain ", jax.jit(chain_bf16)),
             ("s8 storage ", jax.jit(lambda x, ws: chain_store(
                 x, ws, jnp.int8)))]
    try:
        jnp.zeros((2,), jnp.float8_e4m3fn)
        cases.append(("fp8 storage", jax.jit(lambda x, ws: chain_store(
            x, ws, jnp.float8_e4m3fn))))
    except Exception:
        print("fp8 dtype unavailable")
    for name, jfn in cases:
        try:
            gb = _cost(jfn, (x, ws))
            t = _bench(jfn, (x, ws))
            print(f"{name}: {t:7.3f} ms  {gb:6.2f} GB accessed", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
