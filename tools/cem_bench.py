"""Micro-bench the CEM's individual ops at deploy shapes to find where its
~17-19 ms/batch-128 actually goes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=8):
    @jax.jit
    def loop(*args):
        def body(c, _):
            out = fn(args[0] + c, *args[1:])
            return jnp.sum(out).astype(jnp.bfloat16) * 1e-9, None
        c, _ = jax.lax.scan(body, jnp.bfloat16(0.0), None, length=iters)
        return c
    float(np.asarray(loop(*args)))
    t0 = time.perf_counter()
    float(np.asarray(loop(*args)))
    return (time.perf_counter() - t0) / iters


def conv(x, k, pad=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=x.dtype)


def main():
    b, hw = 128, 640
    rng = jax.random.PRNGKey(0)
    x3 = jax.random.uniform(rng, (b, hw, hw, 3), jnp.bfloat16)
    x24 = jax.random.uniform(rng, (b, hw, hw, 24), jnp.bfloat16)
    x8 = jax.random.uniform(rng, (b, hw, hw, 8), jnp.bfloat16)
    k2 = jax.random.normal(rng, (3, 3, 3, 24), jnp.bfloat16) * 0.1
    kb = jax.random.normal(rng, (3, 3, 24, 24), jnp.bfloat16) * 0.1
    k8 = jax.random.normal(rng, (3, 3, 1, 8), jnp.bfloat16) * 0.1
    kg = jax.random.normal(rng, (3, 3, 8, 3), jnp.bfloat16) * 0.1
    k3 = jax.random.normal(rng, (3, 3, 24, 3), jnp.bfloat16) * 0.1

    cases = {
        "conv2 3->24":       (lambda x: conv(x, k2), x3),
        "bank24 24->24":     (lambda x: conv(x, kb), x24),
        "xsum 24->1":        (lambda x: jnp.sum(x, -1, keepdims=True), x24),
        "bank8 1->8":        (lambda x: conv(x[..., :1], k8), x24),
        "tile+scale+add":    (lambda x: x + jnp.tile(x[..., :8], (1, 1, 1, 3))
                              * 0.5, x24),
        "conv3 24->3":       (lambda x: conv(x, k3), x24),
        "convg 8->3":        (lambda x: conv(x, kg), x8),
        "leaky+resid 3ch":   (lambda x: jax.nn.leaky_relu(x, 0.1) + x, x3),
        "add24":             (lambda x: x + x * 0.5, x24),
    }
    for name, (fn, arg) in cases.items():
        t = timed(fn, arg)
        print(f"{name:18s}: {t*1e3:7.2f} ms/batch", flush=True)


if __name__ == "__main__":
    main()
