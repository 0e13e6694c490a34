"""Fused Pallas token-transformer kernel vs the XLA layer stack.

The kernel (mmidet_tpu/nn/transformer_pallas.py) must reproduce the
_TokenTransformer XLA path (reference myTransformerBlock stack,
common.py:1237-1267) within bf16 tolerance, with an identical parameter
tree."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidet_tpu.nn.fusion import _TokenTransformer


def _rand_tree(tree, rng):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for leaf in leaves:
        rng, k = jax.random.split(rng)
        out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * 0.2)
    return jax.tree_util.tree_unflatten(treedef, out)


# d=64/128 exercise the batch-major grid; d=256/512 the layer-major grid
# (full-batch scratch, weights streamed once per layer), with b chosen to
# force MULTIPLE batch tiles (the scratch dynamic-slice indexing).
@pytest.mark.parametrize("d,b", [(64, 4), (128, 2), (256, 16), (512, 16)])
def test_pallas_matches_xla(d, b):
    xla = _TokenTransformer(d, n_layer=3, dtype=jnp.float32)
    pal = _TokenTransformer(d, n_layer=3, use_pallas=True,
                            dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (b, 8, 8, d), jnp.float32)
    ir = rgb * 0.5 + 0.1
    v = xla.init({"params": rng}, rgb[:1], ir[:1], train=False)
    # randomize so biases/LN params are exercised (zeros-init would hide
    # bias-handling bugs)
    v = {"params": _rand_tree(v["params"], jax.random.PRNGKey(1))}

    # identical param tree: the pallas path must accept the XLA-path tree
    v_pal = pal.init({"params": rng}, rgb[:1], ir[:1], train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v_pal["params"]))

    r0, i0 = xla.apply(v, rgb, ir, train=False)
    r1, i1 = pal.apply(v, rgb, ir, train=False)
    # kernel computes in bf16 (deploy dtype) -> bf16-level tolerance
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1, np.float32),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(i0), np.asarray(i1, np.float32),
                               rtol=0.05, atol=0.05)


def test_pallas_batch_not_multiple_of_tile():
    d = 64
    pal = _TokenTransformer(d, n_layer=2, use_pallas=True, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (3, 8, 8, d), jnp.float32)
    r, i = pal.apply(pal.init({"params": rng}, rgb[:1], rgb[:1]), rgb, rgb)
    assert r.shape == (3, 8, 8, d)
