"""BN-folding tests: fused model forward must match the unfused eval forward
(the reference's fuse_conv_and_bn contract)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.zoo import two_stream_spec
from mmidet_tpu.nn.fuse import fold_batchnorm


def test_fold_batchnorm_model_parity():
    spec = two_stream_spec("s", "gpt4", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    fused_model = TwoStreamDetector(spec=spec, aux_mode="off", fused=True)
    rng = np.random.default_rng(0)
    rgb = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    ir = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    v = model.init({"params": jax.random.PRNGKey(0)}, rgb, ir, train=False)
    # randomize batch stats so folding is non-trivial
    import jax.tree_util as jtu
    leaves, treedef = jtu.tree_flatten(v["batch_stats"])
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [jax.random.uniform(k, l.shape, minval=0.5, maxval=1.5)
              for k, l in zip(keys, leaves)]
    v = {"params": v["params"],
         "batch_stats": jtu.tree_unflatten(treedef, leaves)}

    want = model.apply(v, rgb, ir, train=False)["pred"]
    fv = fold_batchnorm(v)
    got = fused_model.apply(fv, rgb, ir, train=False)["pred"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_fold_batchnorm_drops_folded_stats():
    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    fv = fold_batchnorm(v)
    import flax
    flat = flax.traverse_util.flatten_dict(fv["params"])
    assert not any("bn" in seg for path in flat for seg in path), \
        "folded bn params must be gone"
    # conv modules picked up biases
    assert any(path[-1] == "bias" and path[-2] == "conv" for path in flat)
    assert any(path[-1] == "conv_bias" for path in flat)  # Focus
    assert "batch_stats" not in fv  # nothing left unfolded in this family


def test_prune_variables_sparsity():
    """prune_variables zeroes ~amount of each conv kernel and the model
    still runs (ref torch_utils.py:170-178 prune + sparsity)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.nn.fuse import prune_variables, sparsity

    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = model.init({"params": jax.random.PRNGKey(0)}, x, x, train=False)
    assert sparsity(v) < 0.05
    pruned = prune_variables(v, amount=0.3)
    s = sparsity(pruned)
    assert 0.25 < s < 0.35, s
    out = model.apply(pruned, x, x, train=False)
    assert np.all(np.isfinite(np.asarray(out["pred"], np.float32)))
