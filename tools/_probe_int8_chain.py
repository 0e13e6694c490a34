"""Probe 2: does the quantize-at-the-conv formulation keep the tensor
that CROSSES HBM between two convs int8?

The planned ConvBnAct quant mode is: x(bf16) -> [q(x/sx) -> int8 conv ->
dequant -> SiLU] per stage, bf16 in/out of each module.  The bytes only
halve if XLA fuses stage i's quantize into stage i-1's epilogue so the
fusion-boundary tensor is s8.  Measured here on a 4-conv chain at the
real backbone shapes + HLO dtype inspection of the fusion boundaries.

Usage: python tools/_probe_int8_chain.py [batch]
"""
from __future__ import annotations

import re
import sys
import time

import jax
import jax.numpy as jnp


def _conv(x, w, stride, preferred=None):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred)


CHAIN = [  # (kernel, stride, cin, cout) — P1/P2-ish backbone slice
    (3, 2, 32, 64),
    (3, 1, 64, 64),
    (3, 2, 64, 128),
    (3, 1, 128, 128),
]


def chain_bf16(x, ws):
    for (k, s, ci, co), w in zip(CHAIN, ws):
        x = _conv(x, w, s)
        x = x * jax.nn.sigmoid(x)
    return x


def chain_w8a8(x, ws):
    # per-conv: quantize input (static scale), int8 conv, dequant+SiLU.
    # Scales are compile-time constants here; in the model they're scalars
    # from the 'quant' collection (same fusion behavior).
    for i, ((k, s, ci, co), w) in enumerate(zip(CHAIN, ws)):
        sx = 4.0 / 127.0
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / sx),
                     -127, 127).astype(jnp.int8)
        w8, sw = ws_q[i]
        acc = _conv(q, w8, s, preferred=jnp.int32)
        y = acc.astype(jnp.float32) * (sx * sw)
        x = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
    return x


def _bench(fn, args, iters=50):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    global ws_q
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    dev = jax.devices()[0]
    print(f"device: {dev.device_kind}, batch={batch}")
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (batch, 320, 320, 32), jnp.bfloat16)
    ws, ws_q = [], []
    for i, (k, s, ci, co) in enumerate(CHAIN):
        w = jax.random.normal(jax.random.fold_in(key, i),
                              (k, k, ci, co), jnp.bfloat16) * 0.05
        ws.append(w)
        wf = w.astype(jnp.float32)
        sw = jnp.max(jnp.abs(wf), axis=(0, 1, 2)) / 127.0  # per-out-channel
        ws_q.append((jnp.clip(jnp.round(wf / sw), -127, 127).astype(jnp.int8),
                     sw))

    for name, fn in [("bf16", chain_bf16), ("w8a8", chain_w8a8)]:
        jfn = jax.jit(fn)
        compiled = jfn.lower(x, ws).compile()
        c = compiled.cost_analysis()
        if isinstance(c, list):
            c = c[0]
        gb = (c or {}).get("bytes accessed", float("nan")) / 2**30
        t = _bench(jfn, (x, ws))
        print(f"{name}: {t:7.3f} ms  {gb:6.2f} GB accessed")
        # fusion-boundary dtypes: root shapes of each fusion computation
        txt = compiled.as_text()
        roots = re.findall(r"fusion(?:\.\d+)?\s*=\s*(\S+?)\[", txt)
        from collections import Counter
        print(f"  fusion root dtypes: {dict(Counter(roots))}", flush=True)


if __name__ == "__main__":
    main()
