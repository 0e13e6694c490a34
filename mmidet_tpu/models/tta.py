"""Test-time-augmented (TTA) inference.

Functional parity surface: reference ``Model.forward(augment=True)``
(``models/yolo.py:121-138`` / ``models/yolo_test.py:140-160``) — three
passes at scales (1, 0.83, 0.67) with an lr-flip on the second, boxes
de-scaled/de-flipped and concatenated, and ``scale_img``
(``utils/torch_utils.py:247-257``) — bilinear resize + bottom/right pad to a
stride multiple with the 0.447 ImageNet-mean gray.

NOTE: the reference's *two-stream* augment path is broken — it calls
``self.forward_once(xi)`` without the IR input (``yolo_test.py:149``), a
``TypeError`` on any call.  Here TTA transforms BOTH modalities identically,
which is what that code plainly intended (fixed, not copied).

All shapes are static per (scale, flip) leg, so the three legs trace into
one XLA program when the caller jits ``forward_tta``.
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

from mmidet_tpu.nn.resize import bilinear_resize

TTA_SCALES = (1.0, 0.83, 0.67)
TTA_FLIPS = (None, "lr", None)   # reference f = [None, 3, None]


def scale_img(img: jnp.ndarray, ratio: float = 1.0, gs: int = 32,
              value: float = 0.447) -> jnp.ndarray:
    """NHWC scale by ``ratio`` + pad to gs-multiples (ref scale_img,
    torch_utils.py:247-257; same_shape=False branch)."""
    if ratio == 1.0:
        return img
    h, w = img.shape[1:3]
    s = (int(h * ratio), int(w * ratio))
    im = bilinear_resize(img, s)
    ph = math.ceil(h * ratio / gs) * gs - s[0]
    pw = math.ceil(w * ratio / gs) * gs - s[1]
    return jnp.pad(im, ((0, 0), (0, ph), (0, pw), (0, 0)),
                   constant_values=jnp.asarray(value, im.dtype))


def forward_tta(apply_fn: Callable, rgb: jnp.ndarray,
                ir: jnp.ndarray | None = None, gs: int = 32) -> jnp.ndarray:
    """Augmented inference: ``apply_fn(rgb[, ir]) -> (B, N, no)`` decoded
    predictions; returns the three legs' predictions concatenated on N."""
    h, w = rgb.shape[1:3]
    outs = []
    for si, fi in zip(TTA_SCALES, TTA_FLIPS):
        def prep(x):
            if fi == "lr":
                x = jnp.flip(x, axis=2)
            elif fi == "ud":
                x = jnp.flip(x, axis=1)
            return scale_img(x, si, gs)
        p = apply_fn(prep(rgb)) if ir is None else \
            apply_fn(prep(rgb), prep(ir))
        p = jnp.concatenate([p[..., :4] / si, p[..., 4:]], axis=-1)
        if fi == "ud":     # de-flip (ref yolo.py:133-136)
            p = p.at[..., 1].set(h - p[..., 1])
        elif fi == "lr":
            p = p.at[..., 0].set(w - p[..., 0])
        outs.append(p)
    return jnp.concatenate(outs, axis=1)
