"""fused_cem (single-kernel CEM: conv2 -> edge bank -> conv3 -> residual)
vs the XLA ContourEnhance module, interpret mode on CPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidet_tpu.nn.cem import ContourEnhance
from mmidet_tpu.nn.cem_pallas import cem_kernel_supported, fused_cem


def _rand_params(rng):
    """Random fused-CEM params (conv biases nonzero to exercise the
    zero-padding-vs-bias border semantics)."""
    ks = jax.random.split(rng, 6)
    return dict(
        w2=jax.random.normal(ks[0], (3, 3, 3, 24), jnp.float32) * 0.3,
        b2=jax.random.normal(ks[1], (24,), jnp.float32) * 0.5,
        factor=jax.random.normal(ks[2], (24,), jnp.float32) * 0.4 + 1.0,
        bias_s=jax.random.normal(ks[3], (24,), jnp.float32) * 0.5,
        w3=jax.random.normal(ks[4], (3, 3, 24, 3), jnp.float32) * 0.2,
        b3=jax.random.normal(ks[5], (3,), jnp.float32) * 0.5,
    )


def _module_variables(p):
    return {"params": {
        "conv2": {"kernel": p["w2"], "bias": p["b2"]},
        "sobel": {"sobel_factor": p["factor"], "bias": p["bias_s"]},
        "conv3": {"kernel": p["w3"], "bias": p["b3"]},
    }}


@pytest.mark.parametrize("shape", [(2, 80, 80, 3),   # R=80, one block
                                   (1, 40, 16, 3),   # minimal width, R=40
                                   (1, 160, 64, 3),  # multi-block rows
                                   (2, 120, 24, 3)])  # R=40, 3 blocks
def test_fused_cem_matches_module(shape):
    rng = jax.random.PRNGKey(0)
    p = _rand_params(jax.random.PRNGKey(1))
    x = jax.random.normal(rng, shape, jnp.float32)
    assert cem_kernel_supported(*shape[1:])

    mod = ContourEnhance(3, fused=True, dtype=jnp.float32)
    ref = mod.apply(_module_variables(p), x, train=False)

    got = fused_cem(x, p["w2"], p["b2"], p["factor"], p["bias_s"],
                    p["w3"], p["b3"], interpret=True, precise=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_cem_bf16_tolerance():
    """Deploy dtype (bf16 patches/matmuls) stays within bf16 noise of the
    f32 module output."""
    rng = jax.random.PRNGKey(2)
    p = _rand_params(jax.random.PRNGKey(3))
    x = jax.random.normal(rng, (1, 80, 40, 3), jnp.float32)
    mod = ContourEnhance(3, fused=True, dtype=jnp.float32)
    ref = np.asarray(mod.apply(_module_variables(p), x, train=False))
    got = np.asarray(fused_cem(x.astype(jnp.bfloat16), p["w2"], p["b2"],
                               p["factor"], p["bias_s"], p["w3"], p["b3"],
                               interpret=True).astype(jnp.float32))
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() < 0.05 * scale, (
        np.abs(got - ref).max(), scale)


def test_contour_enhance_pallas_flag():
    """ContourEnhance(use_pallas=True) shares the param tree with the XLA
    path and produces the same output (interpret mode on CPU)."""
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 80, 16, 3), jnp.float32)
    xla = ContourEnhance(3, fused=True, dtype=jnp.float32)
    ker = ContourEnhance(3, fused=True, use_pallas=True, dtype=jnp.float32)
    v = xla.init({"params": jax.random.PRNGKey(5)}, x, train=False)
    v_k = ker.init({"params": jax.random.PRNGKey(5)}, x, train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v_k["params"]))
    # randomize so the test is not all-ones/zeros trivial
    p = _rand_params(jax.random.PRNGKey(6))
    v = _module_variables(p)
    ref = xla.apply(v, x, train=False)
    got = ker.apply(v, x, train=False)
    # f32 module dtype -> the pallas path runs precise (f32 patches)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
