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
