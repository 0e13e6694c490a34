"""Fused Pallas kernel for the cross-modal fusion transformer.

The reference's fusion transformer (``GPT``/``GPT1_fourier``, 8 pre-LN
blocks over a fixed 128-token sequence, common.py:1237-1368) is tiny per
token but runs at every pyramid level; under XLA each LayerNorm / softmax /
residual is its own HBM round-trip and the (d x d) matmuls at d=64..256 are
badly lane-padded.  Measured on v5e: 21 ms/batch-128 across the four levels
of yolov5s-gpt4, as low as 5 TFLOP/s at d=64.

This kernel runs the whole L-layer stack with activations resident in VMEM:

  * grid = (batch_tiles, L): the inner grid dimension streams per-layer
    weight blocks (Pallas double-buffers the DMA automatically), so VMEM
    holds one layer's weights at a time — scales to d=1024 (flagship).
  * the activation tile lives in a VMEM scratch buffer that persists across
    the (sequential) layer steps; the token tile is read once at l==0 and
    written back once at l==L-1.
  * heads with dk < 128 never materialize (.., dk)-shaped tensors (that
    layout uses dk of 128 lanes and every slice relayouts): head ``g``'s
    scores are computed as a FULL-d contraction of a lane-masked q — the
    mask zeroes the other heads' columns, so the sum collapses to head g's
    dk columns exactly; the context accumulates as full-d matmuls of
    lane-masked v.  8x redundant MXU slots — but those slots were padding
    waste anyway, and every operand stays lane-aligned.
  * LayerNorm statistics, attention softmax and the (polynomial-erf) GELU
    run in f32; matmuls accumulate in f32 and store bf16 — matching the
    XLA/bf16 reference path within bf16 tolerance.

Intended for the deploy/inference path (dropout-free); the XLA path in
``mmidet_tpu.nn.fusion`` remains the training implementation.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x):
    """f32 erf via Abramowitz-Stegun 7.1.26 (|err| < 1.5e-7 — below bf16
    resolution); Mosaic has no erf primitive."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _layernorm(x, scale, bias, eps=1e-5):
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return y * scale.astype(jnp.float32) + bias.astype(jnp.float32)


def transformer_layer(a, ws, *, num_heads, ablate=None):
    """One pre-LN attention+MLP block on (m, d) bf16 tokens (m = tb*128).

    ``ws`` holds THIS layer's weight arrays (already indexed out of any
    stacked/streamed storage): ln1_scale/ln1_bias, wq/wk/wv (each (d,d)),
    bq/bk/bv, wo/bo, ln2_scale/ln2_bias, w1 (d,4d)/b1, w2 (4d,d)/b2.

    Shared by the token-transformer kernel (per-layer weight streaming) and
    the fused GPT-merge kernel (resident weights) so the numerics stay in
    lockstep.  Heads with dk < 128 are computed via lane-masked FULL-d
    contractions (zeroing other heads' columns makes the sum collapse to
    head g's dk columns exactly) — (.., dk)-shaped tensors would waste
    dk/128 lanes and every slice would relayout.

    ``ablate`` (time-attribution probes ONLY — wrong math by design):
    'noln' replaces LayerNorm with a cast, 'nosm' replaces softmax with a
    scale, 'nogelu' replaces GELU with 0.5x.  tools/_probe_abl.py uses
    these to attribute kernel time; never set in the model paths.
    """
    m, d = a.shape
    h = num_heads
    dk = d // h
    assert ablate in (None, "noln", "nosm", "nogelu"), ablate

    def ln(x, scale, bias):
        if ablate == "noln":
            return x.astype(jnp.float32)  # ABLATED ln
        return _layernorm(x, scale, bias)

    y = ln(a, ws["ln1_scale"], ws["ln1_bias"]).astype(jnp.bfloat16)

    def proj(wn, bn):
        o = jnp.dot(y, ws[wn], preferred_element_type=jnp.float32)
        return (o + ws[bn].astype(jnp.float32)).astype(jnp.bfloat16)

    n = 128  # tokens per image (2 modalities x 8x8 grid)
    tb = m // n
    q = proj("wq", "bq").reshape(tb, n, d)
    k = proj("wk", "bk").reshape(tb, n, d)
    v = proj("wv", "bv").reshape(tb, n, d)
    inv = 1.0 / math.sqrt(dk)
    # Stacked-head attention: ONE matmul for all heads' scores.  Stack the
    # lane-masked queries along the token axis — Q'[g*n+i] = q_i * mask_g —
    # so S'[g*n+i, j] = head g's (i, j) score; softmax runs over the plain
    # 128-lane last axis (no reshapes — Mosaic rejects unit-dim/lane-split
    # reshapes), and the context P' @ v yields each (head, query)'s full-d
    # context, from which head g keeps its own dk lanes.  Same math/FLOPs
    # as the per-head loop, but 2 matmul issues per layer instead of 2h —
    # the loop was issue-latency-bound (measured 3 ms/level at d=64 where
    # the FLOPs are worth 0.1 ms).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 1, d), 2)
    masks = [(lane // dk == g).astype(jnp.bfloat16) for g in range(h)]
    qp = jnp.concatenate([q * mg for mg in masks], axis=1)  # (tb, h*n, d)
    s = jax.lax.dot_general(
        qp, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * inv           # (tb, h*n, n)
    if ablate == "nosm":
        p = (s * 0.007).astype(jnp.bfloat16)  # ABLATED softmax
    else:
        p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
    c = jax.lax.dot_general(
        p, v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                 # (tb, h*n, d)
    o32 = sum(c[:, g * n:(g + 1) * n, :] * masks[g] for g in range(h))
    o = o32.astype(jnp.bfloat16).reshape(m, d)
    o = jnp.dot(o, ws["wo"], preferred_element_type=jnp.float32)
    o = o + ws["bo"].astype(jnp.float32)
    a = (a.astype(jnp.float32) + o).astype(jnp.bfloat16)

    y = ln(a, ws["ln2_scale"], ws["ln2_bias"]).astype(jnp.bfloat16)
    hdn = jnp.dot(y, ws["w1"], preferred_element_type=jnp.float32)
    hdn = hdn + ws["b1"].astype(jnp.float32)
    if ablate == "nogelu":
        hdn = 0.5 * hdn  # ABLATED gelu
    else:
        # exact (erf) GELU, as the reference's nn.GELU
        hdn = 0.5 * hdn * (1.0 + _erf(hdn * (1.0 / math.sqrt(2.0))))
    hdn = hdn.astype(jnp.bfloat16)
    o = jnp.dot(hdn, ws["w2"], preferred_element_type=jnp.float32)
    o = o + ws["b2"].astype(jnp.float32)
    return (a.astype(jnp.float32) + o).astype(jnp.bfloat16)


def _layer_ws(l, ln1s, ln1b, wq, wk, wv, bq, bk, bv, wo, bo, ln2s, ln2b,
              w1, b1, w2, b2):
    """Weight dict for layer ``l``: big (L,.,.) matrices are streamed one
    layer-block at a time (shape (1,.,.), index [0]); small per-layer
    vectors are resident in full (shape (L,.), indexed [l]).  Shared by
    both grid variants so their numerics stay in lockstep."""
    return {"ln1_scale": ln1s[l], "ln1_bias": ln1b[l],
            "wq": wq[0], "wk": wk[0], "wv": wv[0],
            "bq": bq[l], "bk": bk[l], "bv": bv[l],
            "wo": wo[0], "bo": bo[l],
            "ln2_scale": ln2s[l], "ln2_bias": ln2b[l],
            "w1": w1[0], "b1": b1[l], "w2": w2[0], "b2": b2[l]}


def _kernel(x_ref, *refs, num_heads, n_layer, ablate=None):
    *wrefs, out_ref, act = refs
    l = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        act[:] = x_ref[:]

    tb, n, d = act.shape
    a = transformer_layer(act[:].reshape(tb * n, d), _layer_ws(l, *wrefs),
                          num_heads=num_heads, ablate=ablate)
    act[:] = a.reshape(tb, n, d)

    @pl.when(l == n_layer - 1)
    def _():
        out_ref[:] = act[:]


def _kernel_lmajor(x_ref, *refs, num_heads, n_layer, tb, ablate=None):
    """Layer-major variant: grid = (L, batch_tiles), full-batch activation
    scratch.  The weight blocks' index depends only on ``l``, so Pallas
    fetches each layer's matrices ONCE per call instead of once per batch
    tile — the batch-major grid re-streams (B/tb)x the weight bytes, which
    dominates at d >= 512 (25 MB/layer at d=1024: 3.2 GB of redundant DMA
    per batch-32 flagship call, ~40% of the FFM slice's traffic)."""
    *wrefs, out_ref, act = refs
    l = pl.program_id(0)
    i = pl.program_id(1)

    @pl.when(l == 0)
    def _():
        act[pl.ds(i * tb, tb)] = x_ref[:]

    _, n, d = act.shape
    a = transformer_layer(act[pl.ds(i * tb, tb)].reshape(tb * n, d),
                          _layer_ws(l, *wrefs), num_heads=num_heads,
                          ablate=ablate)
    act[pl.ds(i * tb, tb)] = a.reshape(tb, n, d)

    @pl.when(l == n_layer - 1)
    def _():
        out_ref[:] = act[pl.ds(i * tb, tb)]


def _tile_b(b: int, d: int) -> int:
    # d>=512 tiles sized for the layer-major VMEM budget (~100 MB): the
    # per-grid-step matmuls are M=tb*128 — tb=2 left every step
    # issue-overhead-bound (measured ~190 us/step for ~65 us of math at
    # d=1024).
    want = {64: 16, 128: 16, 256: 8, 512: 8}.get(d, 4)
    while b % want:
        want //= 2
    return max(want, 1)


@functools.partial(jax.jit, static_argnames=("num_heads", "interpret",
                                              "ablate", "tile_b"))
def fused_token_transformer(x: jnp.ndarray, stacked: dict,
                            num_heads: int = 8,
                            interpret: bool = False,
                            ablate: str | None = None,
                            tile_b: int | None = None) -> jnp.ndarray:
    """x: (B, N, d) bf16 tokens (pos-emb already added).  ``stacked``: dict
    of per-layer-stacked weight arrays:
      ln1_scale/ln1_bias (L,d), wq/wk/wv (L,d,d), bq/bk/bv (L,d),
      wo (L,d,d), bo (L,d), ln2_scale/ln2_bias (L,d), w1 (L,d,4d),
      b1 (L,4d), w2 (L,4d,d), b2 (L,d).
    Returns (B, N, d) bf16 (final ln_f NOT applied — caller's job).

    ``ablate``/``tile_b`` are probe-only knobs (time attribution / tile
    sweeps, tools/_probe_abl.py) — never set in the model paths."""
    b, n, d = x.shape
    L = stacked["wq"].shape[0]
    tb = tile_b if tile_b is not None else _tile_b(b, d)
    assert b % tb == 0, (b, tb)
    # layer-major grid (weights stream once per layer, not once per batch
    # tile) whenever the lanes are full AND everything fits the VMEM
    # budget.  d < 256 keeps the batch-major grid: its weights are tiny,
    # and a d=64 full-batch scratch would be lane-packed (sub-128 lanes),
    # whose dim-0 ref slicing Mosaic rejects.  The full-batch scratch grows
    # with b — (act + double-buffered layer weights) must stay under the
    # 100 MB limit (v5e physical VMEM is 128 MB), else fall back.
    layer_bytes = 2 * (4 * d * d + 2 * d * 4 * d)  # qkv/o + mlp, bf16
    act_bytes = 2 * b * n * d
    lmajor = d >= 256 and act_bytes + 2 * layer_bytes < 90 * 1024 * 1024

    def wspec(shape):
        if len(shape) == 1:
            # small per-layer vectors: resident in full (Mosaic requires
            # sublane-divisible blocks otherwise), indexed [l] in-kernel
            return pl.BlockSpec(memory_space=pltpu.VMEM)
        # big matrices: one layer's block per step; Pallas pipelines the
        # next block and skips the DMA when the block index is unchanged
        zeros = (0,) * len(shape)
        ix = (lambda l, i, z=zeros: (l,) + z) if lmajor else \
             (lambda i, l, z=zeros: (l,) + z)
        return pl.BlockSpec((1,) + shape, ix, memory_space=pltpu.VMEM)

    names = ["ln1_scale", "ln1_bias", "wq", "wk", "wv", "bq", "bk", "bv",
             "wo", "bo", "ln2_scale", "ln2_bias", "w1", "b1", "w2", "b2"]
    if lmajor:
        # freeze the tile index on inactive steps: x is read only at l==0
        # and out written only at l==L-1; an index that kept changing with
        # ``i`` would make Pallas re-DMA the tiles once per LAYER sweep
        # (L x the activation bytes in each direction).
        x_ix = lambda l, i: (jnp.where(l == 0, i, 0), 0, 0)
        out_ix = lambda l, i: (jnp.where(l == L - 1, i, 0), 0, 0)
    else:
        x_ix = out_ix = lambda i, l: (i, 0, 0)
    in_specs = [pl.BlockSpec((tb, n, d), x_ix, memory_space=pltpu.VMEM)]
    ops = [x.astype(jnp.bfloat16)]
    for nm in names:
        arr = stacked[nm]
        wdt = jnp.bfloat16 if arr.ndim == 3 else jnp.float32
        ops.append(arr.astype(wdt))
        in_specs.append(wspec(arr.shape[1:]))

    if lmajor:
        kernel = functools.partial(_kernel_lmajor, num_heads=num_heads,
                                   n_layer=L, tb=tb, ablate=ablate)
        grid = (L, b // tb)
        scratch = pltpu.VMEM((b, n, d), jnp.bfloat16)  # full batch resident
        # the cap must cover everything the <90MB gate above admits (the
        # full-batch act scratch grows with b regardless of d)
        vmem = 100 * 1024 * 1024
    else:
        kernel = functools.partial(_kernel, num_heads=num_heads, n_layer=L,
                                   ablate=ablate)
        grid = (b // tb, L)
        scratch = pltpu.VMEM((tb, n, d), jnp.bfloat16)
        vmem = 64 * 1024 * 1024

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tb, n, d), out_ix,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.bfloat16),
        scratch_shapes=[scratch],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem),
        interpret=interpret,
    )(*ops)


def stack_block_params(blocks: list[dict]) -> dict:
    """Stack per-layer PreLNBlock param dicts (flax tree: ln_input/sa/
    ln_output/mlp_fc1/mlp_fc2) into the arrays fused_token_transformer
    wants."""
    def st(fn):
        return jnp.stack([fn(b) for b in blocks])

    out = {
        "ln1_scale": st(lambda b: b["ln_input"]["scale"]),
        "ln1_bias": st(lambda b: b["ln_input"]["bias"]),
        "ln2_scale": st(lambda b: b["ln_output"]["scale"]),
        "ln2_bias": st(lambda b: b["ln_output"]["bias"]),
        "wo": st(lambda b: b["sa"]["out_proj"]["kernel"]),
        "bo": st(lambda b: b["sa"]["out_proj"]["bias"]),
        "w1": st(lambda b: b["mlp_fc1"]["kernel"]),
        "b1": st(lambda b: b["mlp_fc1"]["bias"]),
        "w2": st(lambda b: b["mlp_fc2"]["kernel"]),
        "b2": st(lambda b: b["mlp_fc2"]["bias"]),
    }
    for w, bias, nm in (("wq", "bq", "que_proj"), ("wk", "bk", "key_proj"),
                        ("wv", "bv", "val_proj")):
        out[w] = st(lambda blk, nm=nm: blk["sa"][nm]["kernel"])
        out[bias] = st(lambda blk, nm=nm: blk["sa"][nm]["bias"])
    return out
