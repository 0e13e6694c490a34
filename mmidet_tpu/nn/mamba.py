"""Mamba selective-state-space blocks with a TPU-native parallel scan.

Functional parity surface: reference ``models/mamba.py:30-366`` (MambaConfig,
Mamba/ResidualBlock/MambaBlock/RMSNorm, selective scan + O(1) autoregressive
``step``) and ``models/pscan.py:35-226`` — the repo's only custom-autograd
kernel, a Blelloch up/down-sweep computing ``H[t] = A[t]*H[t-1] + X[t]``.

TPU-native design: the scan recurrence is a first-order linear recurrence,
i.e. an associative combine ``(a2, x2) o (a1, x1) = (a1*a2, a2*x1 + x2)`` —
``jax.lax.associative_scan`` compiles it to the same O(log L) work/depth the
reference hand-wrote, with autodiff for free (no hand-derived backward).
The reference wires Mamba into no shipped config; here ``MambaFusion`` is an
optional cross-modal fusion block (drop-in for the GPT transformer fusion,
spec name ``MambaFusion``) — tokens from both modalities run through a
bidirectional Mamba stack instead of attention.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmidet_tpu.nn.resize import adaptive_avg_pool, bilinear_resize


@dataclasses.dataclass(frozen=True)
class MambaConfig:
    """Ref: mamba.py MambaConfig (d_model, n_layers, dt_rank, d_state,
    expand_factor, d_conv, dt init parameters)."""
    d_model: int
    n_layers: int = 2
    dt_rank: int | None = None
    d_state: int = 16
    expand_factor: int = 2
    d_conv: int = 4
    dt_min: float = 1e-3
    dt_max: float = 0.1
    dt_init_floor: float = 1e-4

    @property
    def d_inner(self) -> int:
        return self.expand_factor * self.d_model

    @property
    def rank(self) -> int:
        return self.dt_rank if self.dt_rank is not None else \
            math.ceil(self.d_model / 16)


def linear_recurrence(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """h[t] = a[t] * h[t-1] + x[t] over axis 1 (length), h[-1] = 0.

    The associative-scan equivalent of reference ``pscan`` (pscan.py:152-186);
    shapes (B, L, ...) broadcast elementwise."""
    def combine(c1, c2):
        a1, x1 = c1
        a2, x2 = c2
        return a1 * a2, a2 * x1 + x2
    _, h = jax.lax.associative_scan(combine, (a, x), axis=1)
    return h


class RMSNorm(nn.Module):
    """Ref: mamba.py RMSNorm."""
    d: int
    eps: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (self.d,),
                       jnp.float32)
        ms = jnp.mean(jnp.square(x.astype(jnp.float32)), -1, keepdims=True)
        y = x * jax.lax.rsqrt(ms + self.eps).astype(x.dtype)
        return y * w.astype(x.dtype)


def _dt_bias_init(cfg: MambaConfig):
    def init(key, shape, dtype=jnp.float32):
        dt = jnp.exp(jax.random.uniform(key, shape)
                     * (math.log(cfg.dt_max) - math.log(cfg.dt_min))
                     + math.log(cfg.dt_min))
        dt = jnp.clip(dt, cfg.dt_init_floor)
        # inverse softplus so softplus(bias) == dt (ref mamba.py dt_proj init)
        return dt + jnp.log(-jnp.expm1(-dt))
    return init


def _a_log_init(d_state: int):
    def init(key, shape, dtype=jnp.float32):
        # S4D-real: A = -[1..d_state] per channel (ref mamba.py A init)
        a = jnp.tile(jnp.arange(1, d_state + 1, dtype=jnp.float32),
                     (shape[0], 1))
        return jnp.log(a)
    return init


class MambaBlock(nn.Module):
    """Selective SSM block. Ref: mamba.py MambaBlock (in_proj -> depthwise
    causal conv1d -> SiLU -> SSM -> gate -> out_proj)."""
    cfg: MambaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, l, _ = x.shape
        di = cfg.d_inner
        xz = nn.Dense(2 * di, use_bias=False, dtype=self.dtype,
                      name="in_proj")(x)
        xs, z = jnp.split(xz, 2, axis=-1)

        # depthwise causal conv over length; torch Conv1d default init is
        # kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in)), fan_in =
        # d_conv for a depthwise kernel (ref mamba.py uses nn.Conv1d)
        bound = 1.0 / math.sqrt(cfg.d_conv)
        conv_k = self.param(
            "conv1d_kernel",
            lambda key, shape, dtype: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (cfg.d_conv, 1, di), jnp.float32)
        conv_b = self.param(
            "conv1d_bias",
            lambda key, shape, dtype: jax.random.uniform(
                key, shape, dtype, -bound, bound),
            (di,), jnp.float32)
        xp = jnp.pad(xs, ((0, 0), (cfg.d_conv - 1, 0), (0, 0)))
        xc = jax.lax.conv_general_dilated(
            xp, conv_k.astype(self.dtype), (1,), [(0, 0)],
            dimension_numbers=("NHC", "HIO", "NHC"),
            feature_group_count=di,
            preferred_element_type=self.dtype)
        xc = xc + conv_b.astype(self.dtype)
        xc = jax.nn.silu(xc)

        y = self._ssm(xc)
        y = y * jax.nn.silu(z)
        return nn.Dense(cfg.d_model, use_bias=False, dtype=self.dtype,
                        name="out_proj")(y)

    def _ssm(self, x):
        cfg = self.cfg
        di, n = cfg.d_inner, cfg.d_state
        a_log = self.param("A_log", _a_log_init(n), (di, n), jnp.float32)
        d = self.param("D", nn.initializers.ones, (di,), jnp.float32)
        A = -jnp.exp(a_log).astype(jnp.float32)          # (di, n)

        dbc = nn.Dense(cfg.rank + 2 * n, use_bias=False, dtype=self.dtype,
                       name="x_proj")(x)
        delta, Bm, Cm = jnp.split(dbc, [cfg.rank, cfg.rank + n], axis=-1)
        # dt_proj kernel init: U(+-dt_rank^-0.5), the reference's
        # dt_init='random' scheme (mamba.py:138-142); the bias encodes the
        # softplus-inverse dt schedule (below)
        dt_std = cfg.rank ** -0.5

        def _dt_kernel_init(key, shape, dtype):
            return jax.random.uniform(key, shape, dtype, -dt_std, dt_std)

        delta = nn.Dense(di, use_bias=True, dtype=self.dtype,
                         kernel_init=_dt_kernel_init,
                         bias_init=_dt_bias_init(cfg), name="dt_proj")(delta)
        delta = jax.nn.softplus(delta.astype(jnp.float32))  # (b, l, di)

        # discretize: dA = exp(delta*A); dB*x = delta * B * x  (b, l, di, n)
        dA = jnp.exp(delta[..., None] * A[None, None])
        dBx = (delta[..., None] * Bm[:, :, None, :].astype(jnp.float32)
               * x[..., None].astype(jnp.float32))
        h = linear_recurrence(dA, dBx)                    # (b, l, di, n)
        y = jnp.einsum("blin,bln->bli", h, Cm.astype(jnp.float32))
        y = y + d[None, None] * x.astype(jnp.float32)
        return y.astype(x.dtype)


class ResidualBlock(nn.Module):
    """RMSNorm + MambaBlock residual. Ref: mamba.py ResidualBlock."""
    cfg: MambaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = RMSNorm(self.cfg.d_model, dtype=self.dtype, name="norm")(x)
        return x + MambaBlock(self.cfg, dtype=self.dtype, name="mixer")(y)


class Mamba(nn.Module):
    """Stack of residual Mamba blocks. Ref: mamba.py Mamba."""
    cfg: MambaConfig
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.cfg.n_layers):
            x = ResidualBlock(self.cfg, dtype=self.dtype,
                              name=f"layer{i}")(x)
        return x


def mamba_step(params, cfg: MambaConfig, x_t, cache):
    """O(1) single-token autoregressive step with (h, conv window) cache.
    Ref: mamba.py Mamba.step (mamba.py:235-330).

    params: the flax params of ONE MambaBlock; x_t: (B, d_model);
    cache: (h (B, d_inner, d_state), inputs (B, d_conv-1, d_inner)).
    """
    di, n = cfg.d_inner, cfg.d_state
    h, conv_in = cache
    w_in = params["in_proj"]["kernel"]
    xz = x_t @ w_in
    xs, z = jnp.split(xz, 2, axis=-1)

    window = jnp.concatenate([conv_in, xs[:, None]], axis=1)  # (B, d_conv, di)
    k = params["conv1d_kernel"][:, 0, :]                      # (d_conv, di)
    xc = jnp.einsum("bkd,kd->bd", window, k) + params["conv1d_bias"]
    xc = jax.nn.silu(xc)

    A = -jnp.exp(params["A_log"])
    dbc = xc @ params["x_proj"]["kernel"]
    delta, Bm, Cm = jnp.split(dbc, [cfg.rank, cfg.rank + n], axis=-1)
    delta = jax.nn.softplus(delta @ params["dt_proj"]["kernel"]
                            + params["dt_proj"]["bias"])
    dA = jnp.exp(delta[..., None] * A[None])
    dBx = delta[..., None] * Bm[:, None, :] * xc[..., None]
    h = dA * h + dBx
    y = jnp.einsum("bin,bn->bi", h, Cm) + params["D"] * xc
    y = y * jax.nn.silu(z)
    out = y @ params["out_proj"]["kernel"]
    return out, (h, window[:, 1:])


def mamba_cache_init(cfg: MambaConfig, batch: int, dtype=jnp.float32):
    """Fresh per-layer (h, conv-window) caches for autoregressive stepping.
    Ref: mamba.py's cache contract — h starts at zero (``h=None`` -> 0) and
    the conv window is d_conv-1 zeros (equivalent to the padded conv)."""
    return [(jnp.zeros((batch, cfg.d_inner, cfg.d_state), dtype),
             jnp.zeros((batch, cfg.d_conv - 1, cfg.d_inner), dtype))
            for _ in range(cfg.n_layers)]


def residual_step(params, cfg: MambaConfig, x_t, cache, eps: float = 1e-5):
    """O(1) step through one ResidualBlock: RMSNorm -> mixer step -> +x.
    Ref: mamba.py ResidualBlock.step (mamba.py:104-120).

    params: one ResidualBlock's params ({'norm': .., 'mixer': ..});
    x_t: (B, d_model)."""
    w = params["norm"]["weight"]
    ms = jnp.mean(jnp.square(x_t.astype(jnp.float32)), -1, keepdims=True)
    y = x_t * jax.lax.rsqrt(ms + eps).astype(x_t.dtype) * w.astype(x_t.dtype)
    out, cache = mamba_step(params["mixer"], cfg, y, cache)
    return x_t + out, cache


def mamba_stack_step(params, cfg: MambaConfig, x_t, caches):
    """O(1) autoregressive step through a full Mamba stack with one
    (h, conv-window) cache per layer.  Ref: mamba.py Mamba.step
    (mamba.py:77-87) — constant memory and FLOPs per token regardless of
    how many tokens were generated.

    params: the flax params of a ``Mamba`` module (layer{i} children);
    x_t: (B, d_model); caches: list from ``mamba_cache_init``.
    Returns (y_t, new_caches)."""
    new_caches = []
    for i in range(cfg.n_layers):
        x_t, c = residual_step(params[f"layer{i}"], cfg, x_t, caches[i])
        new_caches.append(c)
    return x_t, new_caches


class MambaFusion(nn.Module):
    """Cross-modal fusion via a bidirectional Mamba stack over the pooled
    token sequence — drop-in alternative to the GPT transformer fusion
    (returns (rgb_out, ir_out)).  An extension: the reference ships Mamba
    unwired (SURVEY §2, 'Mamba SSM (standalone)')."""
    d_model: int
    n_layers: int = 4
    grid: tuple[int, int] = (8, 8)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb, ir, train: bool = False):
        h, w = rgb.shape[1], rgb.shape[2]
        gh, gw = self.grid
        b = rgb.shape[0]
        rp = adaptive_avg_pool(rgb, self.grid).reshape(b, gh * gw,
                                                       self.d_model)
        ip = adaptive_avg_pool(ir, self.grid).reshape(b, gh * gw,
                                                      self.d_model)
        tok = jnp.concatenate([rp, ip], axis=1)
        cfg = MambaConfig(d_model=self.d_model, n_layers=self.n_layers)
        fwd = Mamba(cfg, dtype=self.dtype, name="fwd")(tok)
        bwd = Mamba(cfg, dtype=self.dtype, name="bwd")(tok[:, ::-1])[:, ::-1]
        out = RMSNorm(self.d_model, dtype=self.dtype,
                      name="norm_f")(fwd + bwd)
        r = out[:, :gh * gw].reshape(b, gh, gw, self.d_model)
        i_ = out[:, gh * gw:].reshape(b, gh, gw, self.d_model)
        return bilinear_resize(r, (h, w)), bilinear_resize(i_, (h, w))
