"""Composed CEM tail (one 5x5 conv + exact border ring) vs the plain
bank->add->conv3 graph.  The composition collapses the linear segment
between the two leaky-relus (cem.py:compose_tail_kernel / tail_composed);
it must be EXACT (float tolerance), including the 1-px border ring where
the zero-padding of the intermediate maps makes the naive composed conv
wrong.  Ref semantics: AdaptiveModule3 / EnhanceConv2d
(/root/reference/models/common.py:751-911)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidet_tpu.nn.cem import (ContourEnhance, _tail_reference,
                               tail_composed)

# this image's CPU backend computes f32 dots/convs at ~bf16 precision by
# default (measured: 0.17 abs err on a 256-dot vs numpy) — pin full f32 so
# exactness of the algebraic composition is what's actually tested
pytestmark = pytest.mark.usefixtures("_highest_precision")


@pytest.fixture
def _highest_precision():
    with jax.default_matmul_precision("highest"):
        yield


def _rand_params(rng, c=3):
    ks = jax.random.split(rng, 6)
    c2 = c * 8
    return dict(
        w2=jax.random.normal(ks[0], (3, 3, c, c2), jnp.float32) * 0.3,
        b2=jax.random.normal(ks[1], (c2,), jnp.float32) * 0.5,
        factor=jax.random.normal(ks[2], (c2,), jnp.float32) * 0.4 + 1.0,
        bias_s=jax.random.normal(ks[3], (c2,), jnp.float32) * 0.7,
        w3=jax.random.normal(ks[4], (3, 3, c2, c), jnp.float32) * 0.2,
        b3=jax.random.normal(ks[5], (c,), jnp.float32) * 0.5,
    )


@pytest.mark.parametrize("shape", [(2, 32, 32), (1, 7, 13), (1, 5, 5),
                                   (2, 3, 9), (1, 64, 17)])
def test_tail_composed_matches_reference_tail(shape):
    p = _rand_params(jax.random.PRNGKey(1))
    y = jax.random.normal(jax.random.PRNGKey(0), (*shape, 24), jnp.float32)
    ref = _tail_reference(y, p["factor"], p["bias_s"], p["w3"], p["b3"])
    got = tail_composed(y, p["factor"], p["bias_s"], p["w3"], p["b3"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=5e-5)


def test_fused_module_composed_matches_plain():
    """ContourEnhance(fused, compose_tail=True) — opt-in, measured LOSS
    at the deploy config — vs compose_tail=False on the identical tree."""
    p = _rand_params(jax.random.PRNGKey(3))
    variables = {"params": {
        "conv2": {"kernel": p["w2"], "bias": p["b2"]},
        "sobel": {"sobel_factor": p["factor"], "bias": p["bias_s"]},
        "conv3": {"kernel": p["w3"], "bias": p["b3"]},
    }}
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 40, 24, 3), jnp.float32)
    plain = ContourEnhance(3, fused=True, compose_tail=False,
                           dtype=jnp.float32).apply(variables, x,
                                                    train=False)
    comp = ContourEnhance(3, fused=True, compose_tail=True,
                          dtype=jnp.float32).apply(variables, x,
                                                   train=False)
    np.testing.assert_allclose(np.asarray(comp), np.asarray(plain),
                               rtol=1e-4, atol=5e-5)


def test_fused_module_composed_bf16_tolerance():
    # bf16 sanity only (exactness is pinned by the f32 tests above): the
    # composed K=600 reduction reassociates the two-stage sum, so worst-case
    # bf16 error scales with the sum of |terms| (~0.5 abs at |out|~75 here)
    p = _rand_params(jax.random.PRNGKey(5))
    variables = {"params": {
        "conv2": {"kernel": p["w2"], "bias": p["b2"]},
        "sobel": {"sobel_factor": p["factor"], "bias": p["bias_s"]},
        "conv3": {"kernel": p["w3"], "bias": p["b3"]},
    }}
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3), jnp.float32)
    f32 = ContourEnhance(3, fused=True, compose_tail=False,
                         dtype=jnp.float32).apply(variables, x, train=False)
    bf = ContourEnhance(3, fused=True, compose_tail=True,
                        dtype=jnp.bfloat16).apply(
        variables, x.astype(jnp.bfloat16), train=False)
    np.testing.assert_allclose(np.asarray(bf, np.float32), np.asarray(f32),
                               rtol=0.1, atol=0.8)


def test_composed_is_jittable_fixed_shape():
    p = _rand_params(jax.random.PRNGKey(7))
    y = jax.random.normal(jax.random.PRNGKey(8), (1, 16, 16, 24),
                          jnp.float32)
    fn = jax.jit(lambda y: tail_composed(y, p["factor"], p["bias_s"],
                                         p["w3"], p["b3"]))
    out = fn(y)
    assert out.shape == (1, 16, 16, 3)
    np.testing.assert_allclose(
        np.asarray(out),
        np.asarray(_tail_reference(y, p["factor"], p["bias_s"], p["w3"],
                                   p["b3"])), rtol=1e-4, atol=5e-5)
