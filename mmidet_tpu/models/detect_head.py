"""Anchor-based YOLOv5 detection head.

Functional parity surface: reference ``Detect`` (``models/yolo_test.py:29-73``)
plus its bias initialisation (``yolo_test.py:280-290``).

TPU-first notes: the decode is fully vectorised, static-shape, and runs under
jit; grids are traced constants (XLA folds them).  Training output per level
is ``(B, na, ny, nx, no)`` (reference layout); inference additionally returns
the decoded ``(B, sum(na*ny*nx), no)`` prediction tensor used by NMS.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _bias_init(na: int, nc: int, stride: int):
    """Focal-style prior bias (arXiv:1708.02002 §3.3), per reference
    ``_initialize_biases``: obj += log(8/(640/s)^2), cls += log(0.6/(nc-0.99))."""
    no = nc + 5

    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((na, no), np.float32)
        b[:, 4] += math.log(8 / (640 / stride) ** 2)
        b[:, 5:] += math.log(0.6 / (nc - 0.99))
        return jnp.asarray(b.reshape(-1), dtype)
    return init


class Detect(nn.Module):
    nc: int
    anchors: tuple[tuple[int, ...], ...]   # per-level flat (w,h) pixel pairs
    strides: tuple[int, ...] = (8, 16, 32)
    dtype: Any = jnp.float32

    @property
    def na(self) -> int:
        return len(self.anchors[0]) // 2

    @property
    def no(self) -> int:
        return self.nc + 5

    @nn.compact
    def __call__(self, xs: list[jnp.ndarray], decode: bool = True):
        """xs: per-level NHWC feature maps. Returns (train_outs, pred)."""
        na, no = self.na, self.no
        train_outs, decoded = [], []
        for i, x in enumerate(xs):
            b, ny, nx, _ = x.shape
            y = nn.Conv(na * no, (1, 1),
                        bias_init=_bias_init(na, self.nc, self.strides[i]),
                        dtype=self.dtype, name=f"m{i}")(x)
            y = y.reshape(b, ny, nx, na, no).transpose(0, 3, 1, 2, 4)
            train_outs.append(y)
            if decode:
                s = float(self.strides[i])
                anchor = jnp.asarray(self.anchors[i], self.dtype).reshape(
                    1, na, 1, 1, 2)
                gy, gx = jnp.meshgrid(jnp.arange(ny, dtype=self.dtype),
                                      jnp.arange(nx, dtype=self.dtype),
                                      indexing="ij")
                grid = jnp.stack([gx, gy], axis=-1)[None, None]  # (1,1,ny,nx,2)
                z = jax.nn.sigmoid(y)
                xy = (z[..., 0:2] * 2.0 - 0.5 + grid) * s
                wh = jnp.square(z[..., 2:4] * 2.0) * anchor
                z = jnp.concatenate([xy, wh, z[..., 4:]], axis=-1)
                decoded.append(z.reshape(b, na * ny * nx, no))
        pred = jnp.concatenate(decoded, axis=1) if decode else None
        return train_outs, pred

    def grid_anchors(self) -> jnp.ndarray:
        """(nl, na, 2) anchors in grid units (pixel / stride) — the form the
        detection loss consumes (reference ``m.anchors /= stride``)."""
        a = np.asarray(self.anchors, np.float32).reshape(len(self.anchors),
                                                         self.na, 2)
        s = np.asarray(self.strides, np.float32)[:, None, None]
        return jnp.asarray(a / s)
