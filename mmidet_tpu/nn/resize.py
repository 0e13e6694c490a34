"""Exact, MXU-friendly resampling: adaptive average pooling and bilinear
interpolation expressed as constant matrix multiplies.

The reference fusion blocks (``models/common.py:1300,329``) use
``nn.AdaptiveAvgPool2d((8, 8))`` and ``F.interpolate(mode='bilinear')``
(align_corners=False).  On TPU the natural formulation of both is a pair of
small constant matmuls — ``out = A_h @ x @ A_w^T`` — which XLA maps straight
onto the MXU and fuses with the surrounding ops.  The matrices reproduce
torch's semantics exactly:

  * adaptive pooling windows: ``start = floor(i*H/out)``,
    ``end = ceil((i+1)*H/out)`` (so e.g. 20 -> 8 uses mixed 2/3-wide windows);
  * bilinear with half-pixel centers: ``src = (i + 0.5) * H/out - 0.5``,
    clamped (torch ``align_corners=False``).

Everything here is shape-static and jit-safe.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _adaptive_avg_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) row-stochastic matrix replicating AdaptiveAvgPool1d."""
    w = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        start = (i * n_in) // n_out
        end = math.ceil((i + 1) * n_in / n_out)
        w[i, start:end] = 1.0 / (end - start)
    return w


@functools.lru_cache(maxsize=None)
def _bilinear_weights(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) interpolation matrix, half-pixel centers, edges clamped."""
    w = np.zeros((n_out, n_in), np.float32)
    scale = n_in / n_out
    for i in range(n_out):
        src = (i + 0.5) * scale - 0.5
        src = min(max(src, 0.0), n_in - 1)
        lo = int(math.floor(src))
        hi = min(lo + 1, n_in - 1)
        frac = src - lo
        w[i, lo] += 1.0 - frac
        w[i, hi] += frac
    return w


def _sep_resample(x: jnp.ndarray, wh: np.ndarray, ww: np.ndarray) -> jnp.ndarray:
    """Apply separable row/col resampling matrices to NHWC ``x``."""
    dt = x.dtype
    a = jnp.asarray(wh, dt)
    b = jnp.asarray(ww, dt)
    # (B,H,W,C): contract H then W.
    x = jnp.einsum("ih,bhwc->biwc", a, x)
    return jnp.einsum("jw,bhwc->bhjc", b, x)


def adaptive_avg_pool(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """NHWC adaptive average pool to ``out_hw`` (torch-exact)."""
    h, w = x.shape[1], x.shape[2]
    return _sep_resample(x, _adaptive_avg_weights(h, out_hw[0]),
                         _adaptive_avg_weights(w, out_hw[1]))


def bilinear_resize(x: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize (torch ``align_corners=False`` semantics)."""
    h, w = x.shape[1], x.shape[2]
    return _sep_resample(x, _bilinear_weights(h, out_hw[0]),
                         _bilinear_weights(w, out_hw[1]))


def nearest_upsample(x: jnp.ndarray, scale: int = 2) -> jnp.ndarray:
    """NHWC nearest-neighbour upsample by an integer factor (torch
    ``nn.Upsample(scale_factor=s, mode='nearest')``)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, scale, w, scale, c))
    return x.reshape(b, h * scale, w * scale, c)
