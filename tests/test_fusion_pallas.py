"""fused_gpt_merge (single-kernel pool->transformer->upsample->merge) vs
the XLA CrossModalTransformer + Add2 sequence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidet_tpu.nn.fusion import CrossModalTransformer


def _rand_tree(tree, rng):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = []
    for leaf in leaves:
        rng, k = jax.random.split(rng)
        out.append(jax.random.normal(k, leaf.shape, leaf.dtype) * 0.2)
    return jax.tree_util.tree_unflatten(treedef, out)


@pytest.mark.parametrize("d,hw,b", [(64, 40, 2), (128, 24, 3),
                                    (64, 20, 2),    # W%8!=0, H*W aligned
                                    (256, 16, 4),   # layer-major streaming
                                    (256, 16, 3)])  # streaming, odd batch
def test_merge_kernel_matches_xla(d, hw, b):
    xla = CrossModalTransformer(d, n_layer=2, dtype=jnp.float32)
    ker = CrossModalTransformer(d, n_layer=2, merge_kernel=True,
                                dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (b, hw, hw, d), jnp.float32)
    ir = rgb * 0.3 + 0.2
    v = xla.init({"params": rng}, rgb[:1], ir[:1], train=False)
    v = {"params": _rand_tree(v["params"], jax.random.PRNGKey(7))}

    v_k = ker.init({"params": rng}, rgb[:1], ir[:1], train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v_k["params"]))

    r0, i0 = xla.apply(v, rgb, ir, train=False)
    r0, i0 = rgb + r0, ir + i0          # the Add2 merges
    r1, i1 = ker.apply(v, rgb, ir, train=False)
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1, np.float32),
                               rtol=0.06, atol=0.06)
    np.testing.assert_allclose(np.asarray(i0), np.asarray(i1, np.float32),
                               rtol=0.06, atol=0.06)


def test_merge_kernel_unaligned_falls_back():
    """H*W % 8 != 0 cannot lower on Mosaic (the flat stream DMA slices an
    8-sublane-tiled ref) — the module must return the PLAIN (unmerged)
    outputs, identical to merge_kernel=False, and merge_kernel_supported
    must say so (the detector keys its Add2-select bookkeeping off the
    same gate).  The flat (H*W, C) layout makes every pyramid level
    supported (20x20 -> 400 rows), so the fallback needs a pathological
    5x5 map."""
    from mmidet_tpu.nn.fusion_pallas import merge_kernel_supported

    assert merge_kernel_supported(20, 20, 1024)  # P5 at 640px: 400 rows
    assert merge_kernel_supported(40, 40, 512)
    assert not merge_kernel_supported(5, 5, 64)

    d, hw, b = 64, 5, 2
    xla = CrossModalTransformer(d, n_layer=2, dtype=jnp.float32)
    ker = CrossModalTransformer(d, n_layer=2, merge_kernel=True,
                                dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (b, hw, hw, d), jnp.float32)
    ir = rgb * 0.3 + 0.2
    v = xla.init({"params": rng}, rgb[:1], ir[:1], train=False)
    v = {"params": _rand_tree(v["params"], jax.random.PRNGKey(7))}
    r0, i0 = xla.apply(v, rgb, ir, train=False)
    r1, i1 = ker.apply(v, rgb, ir, train=False)
    np.testing.assert_array_equal(np.asarray(r0), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_detector_premerge_equivalence():
    """Full detector with pallas_fusion (merged GPT + Add2-select) matches
    the plain XLA detector within bf16 tolerance on CPU interpret mode."""
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec

    spec = two_stream_spec("s", "gpt3", nc=2)
    plain = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=False)
    fusedm = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=False,
                               pallas_fusion=True,
                               merge_fusion_kernel=True)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (1, 64, 64, 3), jnp.float32)
    ir = 1.0 - rgb
    v = plain.init({"params": rng}, rgb, ir, train=False)
    p0 = plain.apply(v, rgb, ir, train=False)["pred"]
    p1 = fusedm.apply(v, rgb, ir, train=False)["pred"]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=0.05, atol=0.05)


@pytest.mark.parametrize("cls_name,d,hw,b", [
    ("GPT1", 64, 40, 2),          # resident-weight grid
    ("GPT1_fourier", 128, 24, 2),  # resident
    ("GPT1_fourier", 256, 16, 3),  # layer-major streaming grid
])
def test_gated_merge_kernel_matches_xla(cls_name, d, hw, b):
    """GPT1/GPT1_fourier merge kernel (pool -> pattern gate -> transformer
    -> upsample -> Add2 in one Pallas call) vs the XLA module + Add2.  At
    inference the fourier branch only feeds the separation loss, so the
    gated kernel is the exact deploy dataflow for BOTH modules."""
    from mmidet_tpu.nn.fusion import FourierPatternFusion, PatternFusion

    cls = PatternFusion if cls_name == "GPT1" else FourierPatternFusion
    xla = cls(d, n_layer=2, dtype=jnp.float32)
    ker = cls(d, n_layer=2, merge_kernel=True, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.normal(rng, (b, hw, hw, d), jnp.float32)
    ir = rgb * 0.3 + 0.2
    v = xla.init({"params": rng}, rgb[:1], ir[:1], train=False)
    v = {"params": _rand_tree(v["params"], jax.random.PRNGKey(7))}
    v_k = ker.init({"params": rng}, rgb[:1], ir[:1], train=False)
    assert (jax.tree_util.tree_structure(v["params"])
            == jax.tree_util.tree_structure(v_k["params"]))

    r0, i0, _pt = xla.apply(v, rgb, ir, train=False)
    r0, i0 = rgb + r0, ir + i0          # the Add2 merges
    r1, i1, pt = ker.apply(v, rgb, ir, train=False)
    assert float(pt) == 0.0
    np.testing.assert_allclose(np.asarray(r0), np.asarray(r1, np.float32),
                               rtol=0.06, atol=0.06)
    np.testing.assert_allclose(np.asarray(i0), np.asarray(i1, np.float32),
                               rtol=0.06, atol=0.06)


def test_detector_fourier_premerge_equivalence():
    """Flagship-grammar detector (GPT1_fourier at P2 + GPT at P3/P4/P5)
    with the merge kernel ON matches the plain XLA detector."""
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec

    # fourier grammar requires unscaled GPT1* width -> l-scale (the only
    # scale the reference ships it at); tiny img keeps CPU interpret cheap
    spec = two_stream_spec("l", "fourier", nc=2, fusion_layers=2)
    plain = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=False)
    fusedm = TwoStreamDetector(spec=spec, aux_mode="off", use_cem=False,
                               pallas_fusion=True,
                               merge_fusion_kernel=True)
    rng = jax.random.PRNGKey(0)
    rgb = jax.random.uniform(rng, (1, 64, 64, 3), jnp.float32)
    ir = 1.0 - rgb
    v = plain.init({"params": rng}, rgb, ir, train=False)
    p0 = plain.apply(v, rgb, ir, train=False)["pred"]
    p1 = fusedm.apply(v, rgb, ir, train=False)["pred"]
    np.testing.assert_allclose(np.asarray(p0), np.asarray(p1),
                               rtol=0.05, atol=0.05)
