"""Mamba SSM tests: associative-scan recurrence vs sequential reference,
autoregressive step consistency with the parallel forward."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.nn.mamba import (Mamba, MambaBlock, MambaConfig,
                                 linear_recurrence, mamba_step)


def test_linear_recurrence_matches_sequential():
    rng = np.random.default_rng(0)
    a = rng.uniform(0.5, 1.0, (2, 16, 3, 4)).astype(np.float32)
    x = rng.standard_normal((2, 16, 3, 4)).astype(np.float32)
    got = np.asarray(linear_recurrence(jnp.asarray(a), jnp.asarray(x)))
    h = np.zeros((2, 3, 4), np.float32)
    want = np.empty_like(x)
    for t in range(16):
        h = a[:, t] * h + x[:, t]
        want[:, t] = h
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_mamba_forward_shapes_and_grad():
    cfg = MambaConfig(d_model=16, n_layers=2)
    m = Mamba(cfg)
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 8, 16)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 16)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x) ** 2))(v)
    assert all(np.isfinite(np.asarray(l)).all()
               for l in jax.tree_util.tree_leaves(g))


def test_mamba_step_matches_parallel():
    """Token-by-token step() must reproduce the full-sequence scan
    (ref mamba.py step cache semantics)."""
    cfg = MambaConfig(d_model=8, n_layers=1)
    blk = MambaBlock(cfg)
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 6, 8)).astype(np.float32))
    v = blk.init(jax.random.PRNGKey(0), x)
    full = np.asarray(blk.apply(v, x))

    p = v["params"]
    h = jnp.zeros((1, cfg.d_inner, cfg.d_state))
    conv_in = jnp.zeros((1, cfg.d_conv - 1, cfg.d_inner))
    outs = []
    cache = (h, conv_in)
    for t in range(6):
        y, cache = mamba_step(p, cfg, x[:, t], cache)
        outs.append(np.asarray(y))
    step_out = np.stack(outs, axis=1)
    np.testing.assert_allclose(step_out, full, rtol=1e-4, atol=1e-5)


def test_mamba_stack_step_matches_parallel():
    """Full-stack token-by-token step (per-layer (h, conv-window) caches)
    must reproduce the parallel scan — ref Mamba.step / ResidualBlock.step
    (mamba.py:77-120,289-340)."""
    from mmidet_tpu.nn.mamba import (Mamba, mamba_cache_init,
                                     mamba_stack_step)
    cfg = MambaConfig(d_model=8, n_layers=2)
    m = Mamba(cfg)
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 7, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(1), x)
    full = np.asarray(m.apply(v, x))

    caches = mamba_cache_init(cfg, batch=2)
    outs = []
    for t in range(x.shape[1]):
        y, caches = mamba_stack_step(v["params"], cfg, x[:, t], caches)
        outs.append(np.asarray(y))
    np.testing.assert_allclose(np.stack(outs, 1), full,
                               rtol=1e-4, atol=1e-5)


def test_mamba_stack_step_jit_scan():
    """The step is jit/scan-compatible: driving it with lax.scan (the
    TPU-native decode loop) equals the eager token loop."""
    from mmidet_tpu.nn.mamba import (Mamba, mamba_cache_init,
                                     mamba_stack_step)
    cfg = MambaConfig(d_model=8, n_layers=2)
    m = Mamba(cfg)
    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (1, 5, 8)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(2), x)
    full = np.asarray(m.apply(v, x))

    caches0 = mamba_cache_init(cfg, batch=1)

    @jax.jit
    def decode(params, xs, caches):
        def body(caches, x_t):
            y, caches = mamba_stack_step(params, cfg, x_t, caches)
            return caches, y
        _, ys = jax.lax.scan(body, caches, jnp.swapaxes(xs, 0, 1))
        return jnp.swapaxes(ys, 0, 1)

    ys = np.asarray(decode(v["params"], x, caches0))
    np.testing.assert_allclose(ys, full, rtol=1e-4, atol=1e-5)
