"""Cross-modal fusion blocks: the Fusion Focus Module (FFT frequency-split +
pattern attention + cross-modal transformer) and its simpler siblings.

Functional parity surface (reference ``models/common.py``):
  * ``CrossModalTransformer``  <- ``GPT``          (common.py:1270-1368)
  * ``PatternFusion``          <- ``GPT1``         (common.py:142-296)
  * ``FourierPatternFusion``   <- ``GPT1_fourier`` (common.py:299-552)
  * ``SelfAttention`` / ``PreLNBlock`` <- ``SelfAttention`` /
    ``myTransformerBlock`` (common.py:1147-1267)
  * frequency split <- ``extract_frequency2`` (common.py:37-69)

Parity notes, verified against torch behavior:
  * torch ``.half()`` on a complex tensor silently drops the imaginary part,
    so ``extract_frequency2`` effectively returns the *real part* of the
    inverse FFT — we take ``.real`` explicitly.
  * at the 8x8 pooled resolution the reference's threshold arithmetic
    (``threshold = crow + ccol//4 = 5``) makes the "highpass" zero exactly one
    shifted-spectrum element (row slice(-1,9) == 7:8) — we reproduce the exact
    Python-slice semantics for any (H, W).
  * the separation loss ``sum_{i<j} <M_i, M_j> / (l(l-1))``
    (common.py:128-139) is an O(l^2) python loop in the reference; here it is
    the closed form ``(|sum_i M_i|^2 - sum_i |M_i|^2) / 2 / (l(l-1))`` — one
    vectorized reduction.
  * avgpool-to-8x8 and bilinear-upsample use the exact-torch matmul
    formulation from ``mmidet_tpu.nn.resize`` (MXU-friendly).

TPU-first design: attention over the fixed 128-token sequence is three plain
einsum matmuls — at this size a flash-attention kernel would lose to XLA's
fusion, so none is used.  All shapes are static.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from mmidet_tpu.nn.layers import conv_kernel_init
from mmidet_tpu.nn.resize import adaptive_avg_pool, bilinear_resize

linear_init = nn.initializers.normal(stddev=0.02)  # GPT._init_weights
LN_EPS = 1e-5  # torch LayerNorm default (flax default 1e-6 diverges when the
# fusion activations are tiny and eps dominates the denominator)


@functools.lru_cache(maxsize=None)
def _freq_masks(h: int, w: int) -> tuple[np.ndarray, np.ndarray]:
    """(high_keep, low_keep) boolean masks over the *shifted* spectrum,
    reproducing extract_frequency2's slice arithmetic exactly."""
    crow, ccol = h // 2, w // 2
    threshold = crow + ccol // 4
    # numpy slicing shares python/torch semantics (incl. negative bounds), so
    # these statements mirror the reference assignments verbatim.
    high = np.ones((h, w), bool)
    high[crow - threshold:crow + threshold,
         ccol - threshold:ccol + threshold] = False
    low = np.ones((h, w), bool)
    low[:crow - threshold, :] = False
    low[crow + threshold:, :] = False
    low[:, :ccol - threshold] = False
    low[:, ccol + threshold:] = False
    return high, low


def frequency_split(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NHWC -> (low, high) real-valued frequency components.

    Equivalent to reference ``extract_frequency2`` (common.py:37-69) up to the
    implicit real-cast: fft2 -> shift -> mask -> unshift -> ifft2 -> real.
    """
    h, w = x.shape[1], x.shape[2]
    high_keep, low_keep = _freq_masks(h, w)
    f = jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2))
    fs = jnp.fft.fftshift(f, axes=(1, 2))
    fh = fs * jnp.asarray(high_keep)[None, :, :, None]
    fl = fs * jnp.asarray(low_keep)[None, :, :, None]
    ih = jnp.fft.ifft2(jnp.fft.ifftshift(fh, axes=(1, 2)), axes=(1, 2))
    il = jnp.fft.ifft2(jnp.fft.ifftshift(fl, axes=(1, 2)), axes=(1, 2))
    return il.real.astype(x.dtype), ih.real.astype(x.dtype)


def separation_loss(m: jnp.ndarray) -> jnp.ndarray:
    """sum_{i<j} <m_i, m_j> / (l*(l-1)); m is (l, d). Ref: common.py:128."""
    l = m.shape[0]
    s = jnp.sum(m, axis=0)
    total = (jnp.dot(s, s) - jnp.sum(m * m)) / 2.0
    return total / (l * (l - 1))


class SelfAttention(nn.Module):
    """Multi-head self-attention with explicit q/k/v/out projections.
    Ref: common.py:1147-1234."""
    d_model: int
    num_heads: int = 8
    attn_drop: float = 0.1
    resid_drop: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        dk = self.d_model // h
        dense = functools.partial(nn.Dense, kernel_init=linear_init,
                                  dtype=self.dtype)
        q = dense(self.d_model, name="que_proj")(x).reshape(b, n, h, dk)
        k = dense(self.d_model, name="key_proj")(x).reshape(b, n, h, dk)
        v = dense(self.d_model, name="val_proj")(x).reshape(b, n, h, dk)
        # NOTE: scale by a *python* float — a numpy scalar would promote the
        # whole (B,h,N,N) attention tensor to f32 (measured HBM-traffic hit)
        att = jnp.einsum("bqhd,bkhd->bhqk", q, k) * (1.0 / float(np.sqrt(dk)))
        att = jax.nn.softmax(att, axis=-1)
        att = nn.Dropout(self.attn_drop)(att, deterministic=not train)
        out = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, n, c)
        out = dense(self.d_model, name="out_proj")(out)
        return nn.Dropout(self.resid_drop)(out, deterministic=not train)


class PreLNBlock(nn.Module):
    """Pre-LN transformer block with exact-GELU MLP. Ref: common.py:1237-1267."""
    d_model: int
    num_heads: int = 8
    block_exp: int = 4
    attn_drop: float = 0.1
    resid_drop: float = 0.1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_input")(x)
        x = x + SelfAttention(self.d_model, self.num_heads, self.attn_drop,
                              self.resid_drop, dtype=self.dtype,
                              name="sa")(y, train)
        y = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_output")(x)
        y = nn.Dense(self.block_exp * self.d_model, kernel_init=linear_init,
                     dtype=self.dtype, name="mlp_fc1")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.d_model, kernel_init=linear_init,
                     dtype=self.dtype, name="mlp_fc2")(y)
        y = nn.Dropout(self.resid_drop)(y, deterministic=not train)
        return x + y


class _DenseP(nn.Module):
    """Param-mirror of nn.Dense: declares the identical {kernel, bias} tree
    and returns the values (used by the fused-kernel path to read per-layer
    weights without running per-layer XLA ops)."""
    din: int
    dout: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", linear_init, (self.din, self.dout),
                       jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.dout,),
                       jnp.float32)
        return {"kernel": k, "bias": b}


class _LNP(nn.Module):
    """Param-mirror of nn.LayerNorm ({scale, bias})."""
    d: int

    @nn.compact
    def __call__(self):
        return {"scale": self.param("scale", nn.initializers.ones, (self.d,),
                                    jnp.float32),
                "bias": self.param("bias", nn.initializers.zeros, (self.d,),
                                   jnp.float32)}


class _BlockP(nn.Module):
    """Param-mirror of PreLNBlock — same tree, values returned as a dict."""
    d: int
    block_exp: int = 4

    @nn.compact
    def __call__(self):
        d = self.d
        class _SAP(nn.Module):
            @nn.compact
            def __call__(s):
                return {nm: _DenseP(d, d, name=nm)()
                        for nm in ("que_proj", "key_proj", "val_proj",
                                   "out_proj")}
        return {
            "ln_input": _LNP(d, name="ln_input")(),
            "sa": _SAP(name="sa")(),
            "ln_output": _LNP(d, name="ln_output")(),
            "mlp_fc1": _DenseP(d, d * self.block_exp, name="mlp_fc1")(),
            "mlp_fc2": _DenseP(d * self.block_exp, d, name="mlp_fc2")(),
        }


class _TokenTransformer(nn.Module):
    """Shared core: pooled (B,gh,gw,C) pair -> tokens -> n_layer blocks ->
    split back to two (B,gh,gw,C) maps.

    ``use_pallas=True`` (inference/deploy): the whole n_layer stack runs as
    one fused Pallas kernel (``mmidet_tpu.nn.transformer_pallas``) with
    activations resident in VMEM; the parameter tree is identical (declared
    via param-mirrors), so checkpoints and the torch converter are
    unaffected.  Falls back to interpreter mode off-TPU."""
    d_model: int
    num_heads: int = 8
    block_exp: int = 4
    n_layer: int = 8
    grid: tuple[int, int] = (8, 8)
    embd_drop: float = 0.1
    attn_drop: float = 0.1
    resid_drop: float = 0.1
    use_pallas: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb_p, ir_p, train: bool = False):
        b = rgb_p.shape[0]
        gh, gw = self.grid
        ntok = 2 * gh * gw
        # tokens: RGB spatial positions first, then IR (matches the reference's
        # concat-then-permute at common.py:1338-1343)
        tok = jnp.concatenate([rgb_p.reshape(b, gh * gw, self.d_model),
                               ir_p.reshape(b, gh * gw, self.d_model)], axis=1)
        pos = self.param("pos_emb", nn.initializers.zeros,
                         (1, ntok, self.d_model), jnp.float32)
        x = tok + pos.astype(tok.dtype)
        x = nn.Dropout(self.embd_drop)(x, deterministic=not train)
        if self.use_pallas and not train:
            from mmidet_tpu.nn.transformer_pallas import (
                fused_token_transformer, stack_block_params)
            blocks = [_BlockP(self.d_model, self.block_exp,
                              name=f"block{i}")()
                      for i in range(self.n_layer)]
            stacked = stack_block_params(blocks)
            interp = jax.devices()[0].platform != "tpu"
            x = fused_token_transformer(
                x.astype(jnp.bfloat16), stacked, num_heads=self.num_heads,
                interpret=interp).astype(self.dtype)
        else:
            for i in range(self.n_layer):
                x = PreLNBlock(self.d_model, self.num_heads, self.block_exp,
                               self.attn_drop, self.resid_drop,
                               dtype=self.dtype, name=f"block{i}")(x, train)
        x = nn.LayerNorm(epsilon=LN_EPS, dtype=self.dtype, name="ln_f")(x)
        rgb_o = x[:, :gh * gw].reshape(b, gh, gw, self.d_model)
        ir_o = x[:, gh * gw:].reshape(b, gh, gw, self.d_model)
        return rgb_o, ir_o


class _TransP(nn.Module):
    """Param-mirror of _TokenTransformer (pos_emb + blocks + ln_f)."""
    d: int
    n_layer: int = 8
    block_exp: int = 4
    ntok: int = 128

    @nn.compact
    def __call__(self):
        pos = self.param("pos_emb", nn.initializers.zeros,
                         (1, self.ntok, self.d), jnp.float32)
        blocks = [_BlockP(self.d, self.block_exp, name=f"block{i}")()
                  for i in range(self.n_layer)]
        lnf = _LNP(self.d, name="ln_f")()
        return pos, blocks, lnf


class CrossModalTransformer(nn.Module):
    """Plain cross-modal transformer fusion (used at P3/P4/P5).
    Ref: GPT, common.py:1270-1368.  Returns (rgb_out, ir_out).

    ``merge_kernel=True`` (deploy): the whole pool -> 8-layer transformer ->
    bilinear upsample -> Add2 stream-merge sequence runs as ONE Pallas
    kernel (``mmidet_tpu.nn.fusion_pallas``) and the returned pair is the
    MERGED streams (rgb + up, ir + up) — the caller must turn the
    downstream Add2 layers into selects.  Parameter tree unchanged."""
    d_model: int
    num_heads: int = 8
    block_exp: int = 4
    n_layer: int = 8
    grid: tuple[int, int] = (8, 8)
    use_pallas: bool = False
    merge_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, ir, train: bool = False):
        h, w = rgb.shape[1], rgb.shape[2]
        from mmidet_tpu.nn.fusion_pallas import merge_kernel_supported
        if (self.merge_kernel and not train
                and merge_kernel_supported(h, w, self.d_model)):
            from mmidet_tpu.nn.fusion_pallas import fused_gpt_merge
            from mmidet_tpu.nn.transformer_pallas import stack_block_params
            pos, blocks, lnf = _TransP(self.d_model, self.n_layer,
                                       self.block_exp, name="trans")()
            stacked = stack_block_params(blocks)
            interp = jax.devices()[0].platform != "tpu"
            ro, io = fused_gpt_merge(
                rgb.astype(jnp.bfloat16), ir.astype(jnp.bfloat16), stacked,
                pos, lnf["scale"], lnf["bias"], num_heads=self.num_heads,
                interpret=interp)
            return ro.astype(self.dtype), io.astype(self.dtype)
        rgb_p = adaptive_avg_pool(rgb, self.grid)
        ir_p = adaptive_avg_pool(ir, self.grid)
        rgb_o, ir_o = _TokenTransformer(
            self.d_model, self.num_heads, self.block_exp, self.n_layer,
            self.grid, use_pallas=self.use_pallas, dtype=self.dtype,
            name="trans")(rgb_p, ir_p, train)
        return (bilinear_resize(rgb_o, (h, w)), bilinear_resize(ir_o, (h, w)))


class _PatternGate(nn.Module):
    """conv1(->8ch)+sigmoid mask, conv2 back to C, multiplicative gate.
    Shared by PatternFusion / FourierPatternFusion."""
    d_model: int
    dtype: Any = jnp.float32

    def setup(self):
        self.conv1 = nn.Conv(8, (1, 1), use_bias=False,
                             kernel_init=conv_kernel_init, dtype=self.dtype,
                             name="conv1")
        self.conv2 = nn.Conv(self.d_model, (1, 1), use_bias=False,
                             kernel_init=conv_kernel_init, dtype=self.dtype,
                             name="conv2")

    def mask(self, x):
        return jax.nn.sigmoid(self.conv1(x))

    def gate(self, mask, feat):
        return self.conv2(mask) * feat


class _PGateP(nn.Module):
    """Param-mirror of _PatternGate ({conv1,conv2}/kernel, 1x1 no-bias)."""
    d: int

    @nn.compact
    def __call__(self):
        class _K(nn.Module):
            shape: tuple

            @nn.compact
            def __call__(s):
                return s.param("kernel", conv_kernel_init, s.shape,
                               jnp.float32)
        k1 = _K((1, 1, self.d, 8), name="conv1")()
        k2 = _K((1, 1, 8, self.d), name="conv2")()
        return k1.reshape(self.d, 8), k2.reshape(8, self.d)


def _gated_merge(mod, rgb, ir, train):
    """Shared GPT1/GPT1_fourier merge-kernel path: whole pool -> pattern
    gate -> transformer -> upsample -> Add2 sequence as ONE Pallas kernel
    (deploy only — the fourier branch and the separation loss are
    training-time-only dataflow, so the kernel path returns a zero
    pattern loss).  Returns None when unsupported (caller falls back)."""
    from mmidet_tpu.nn.fusion_pallas import (fused_gpt_merge,
                                             merge_kernel_supported)
    from mmidet_tpu.nn.transformer_pallas import stack_block_params
    h, w = rgb.shape[1], rgb.shape[2]
    if train or not (mod.merge_kernel
                     and merge_kernel_supported(h, w, mod.d_model)):
        return None
    g1, g2 = _PGateP(mod.d_model, name="pattern")()
    pos, blocks, lnf = _TransP(mod.d_model, mod.n_layer, mod.block_exp,
                               name="trans")()
    stacked = stack_block_params(blocks)
    interp = jax.devices()[0].platform != "tpu"
    ro, io = fused_gpt_merge(
        rgb.astype(jnp.bfloat16), ir.astype(jnp.bfloat16), stacked,
        pos, lnf["scale"], lnf["bias"], num_heads=mod.num_heads,
        interpret=interp, gate={"g1": g1, "g2": g2})
    return (ro.astype(mod.dtype), io.astype(mod.dtype),
            jnp.zeros((), mod.dtype))


def _mask_rows(m: jnp.ndarray) -> jnp.ndarray:
    """(B,gh,gw,8) NHWC mask -> (B*8, gh*gw) rows in the reference's
    ``view(-1, h*w)`` NCHW row order (batch-major, then mask channel)."""
    b, gh, gw, c = m.shape
    return m.transpose(0, 3, 1, 2).reshape(b * c, gh * gw)


class PatternFusion(nn.Module):
    """Pattern-attention fusion (no fourier branch). Ref: GPT1,
    common.py:142-296.  Returns (rgb_out, ir_out, pattern_loss).

    ``merge_kernel=True`` (deploy): the pool -> pattern gate -> transformer
    -> upsample -> Add2 sequence runs as ONE Pallas kernel and the returned
    pair is the MERGED streams (pattern loss returned as 0 — it is
    training-only dataflow); param tree unchanged."""
    d_model: int
    num_heads: int = 8
    block_exp: int = 4
    n_layer: int = 8
    grid: tuple[int, int] = (8, 8)
    use_pallas: bool = False
    merge_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, ir, train: bool = False):
        h, w = rgb.shape[1], rgb.shape[2]
        merged = _gated_merge(self, rgb, ir, train)
        if merged is not None:
            return merged
        rgb_p = adaptive_avg_pool(rgb, self.grid)
        ir_p = adaptive_avg_pool(ir, self.grid)
        pg = _PatternGate(self.d_model, dtype=self.dtype, name="pattern")
        rgb_m = pg.mask(rgb_p)
        ir_m = pg.mask(ir_p)
        pattern_loss = separation_loss(
            jnp.concatenate([_mask_rows(rgb_m), _mask_rows(ir_m)], axis=0))
        rgb_g = pg.gate(rgb_m, rgb_p)
        ir_g = pg.gate(ir_m, ir_p)
        rgb_o, ir_o = _TokenTransformer(
            self.d_model, self.num_heads, self.block_exp, self.n_layer,
            self.grid, use_pallas=self.use_pallas, dtype=self.dtype,
            name="trans")(rgb_g, ir_g, train)
        return (bilinear_resize(rgb_o, (h, w)), bilinear_resize(ir_o, (h, w)),
                pattern_loss)


class FourierPatternFusion(nn.Module):
    """The Fusion Focus Module: FFT high-frequency attention + pattern gate +
    cross-modal transformer.  Ref: GPT1_fourier, common.py:299-552.
    Returns (rgb_out, ir_out, pattern_loss).

    The high-frequency branch contributes only to the separation loss (its
    masks' first ``B`` rows are appended, common.py:487-489); the gating path
    uses the plain pooled-feature masks, exactly as the reference.

    ``merge_kernel=True`` (deploy): pool -> gate -> transformer -> upsample
    -> Add2 as ONE Pallas kernel, merged streams returned, pattern loss 0
    (the fourier branch feeds ONLY the separation loss, so inference
    dataflow is identical to GPT1's); param tree unchanged.
    """
    d_model: int
    num_heads: int = 8
    block_exp: int = 4
    n_layer: int = 8
    grid: tuple[int, int] = (8, 8)
    use_pallas: bool = False
    merge_kernel: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, ir, train: bool = False):
        h, w = rgb.shape[1], rgb.shape[2]
        b = rgb.shape[0]
        merged = _gated_merge(self, rgb, ir, train)
        if merged is not None:
            return merged
        rgb_p = adaptive_avg_pool(rgb, self.grid)
        ir_p = adaptive_avg_pool(ir, self.grid)

        _, rgb_high = frequency_split(rgb_p)
        _, ir_high = frequency_split(ir_p)

        pg = _PatternGate(self.d_model, dtype=self.dtype, name="pattern")
        rgb_hm = pg.mask(rgb_high * rgb_p)
        ir_hm = pg.mask(ir_high * ir_p)
        rgb_m = pg.mask(rgb_p)
        ir_m = pg.mask(ir_p)

        # separation loss over [rgb_mask, ir_mask, rgb_high[:B], ir_high[:B]]
        # (len_fea_half = B*8 // 8 = B rows, common.py:487)
        rows = jnp.concatenate([
            _mask_rows(rgb_m), _mask_rows(ir_m),
            _mask_rows(rgb_hm)[:b], _mask_rows(ir_hm)[:b]], axis=0)
        pattern_loss = separation_loss(rows)

        rgb_g = pg.gate(rgb_m, rgb_p)
        ir_g = pg.gate(ir_m, ir_p)
        rgb_o, ir_o = _TokenTransformer(
            self.d_model, self.num_heads, self.block_exp, self.n_layer,
            self.grid, use_pallas=self.use_pallas, dtype=self.dtype,
            name="trans")(rgb_g, ir_g, train)
        return (bilinear_resize(rgb_o, (h, w)), bilinear_resize(ir_o, (h, w)),
                pattern_loss)
