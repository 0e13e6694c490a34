"""Info-Guided / Contrast-Bridge auxiliary fusion losses.

Functional parity surface: reference ``models/yolo_test.py:338-486``
(``ContrastiveLoss``, ``compute_contrastive_loss``, ``ssim_loss``,
``compute_fusing_loss2``, ``calculate_entropy``, ``compute_EntropyLoss``).

Quirks kept deliberately (they shape the published training behavior):
  * contrastive negatives are batch-shifted pairs (rgb[:-1] vs ir[1:], and
    rgb[1:] vs ir[:-1]); loss form is ``exp(mean(d^2))`` with margin 1 on
    negatives, averaged ``(2*pos + neg1 + neg2)/4``;
  * SSIM is computed from *global* scalar moments of the whole tensor (not
    windowed), with a biased variance; the contrast-consistency term uses the
    *unbiased* std and is identically zero in the reference call (both fused
    args are the same tensor) — form preserved;
  * the entropy term uses a hard 256-bin histogram over [0,1]
    (``torch.histc``), which has no gradient — we wrap it in
    ``stop_gradient`` to match (a differentiable soft-histogram variant is
    available via ``soft=True``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _l2_normalize(x: jnp.ndarray, axis: int, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize: x / max(||x||_2, eps)."""
    n = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    return x / jnp.maximum(n, eps)


def _pair_loss(e1: jnp.ndarray, e2: jnp.ndarray, label: float,
               margin: float = 1.0) -> jnp.ndarray:
    """Ref Model.ContrastiveLoss (yolo_test.py:338-354); ``label`` is the
    scalar value of the (constant) label tensor."""
    d = _l2_normalize(e1 - e2, axis=-1)  # channel axis (NHWC)
    mean_dis = jnp.mean(jnp.square(d))
    e = jnp.exp(mean_dis)
    return (1.0 - label) * e + label * (e - margin)


def contrastive_loss(rgb: jnp.ndarray, ir: jnp.ndarray,
                     margin: float = 1.0) -> jnp.ndarray:
    """Contrast Bridge on the fusion-block inputs (NHWC features).
    Ref: compute_contrastive_loss (yolo_test.py:356-404).

    Requires batch >= 2 (the reference NaNs on batch 1); returns 0 there.
    """
    b = rgb.shape[0]
    if b < 2:
        return jnp.zeros((), rgb.dtype)
    pos = _pair_loss(rgb[:-1], ir[:-1], 0.0, margin)
    neg1 = _pair_loss(rgb[:-1], ir[1:], 1.0, margin)
    neg2 = _pair_loss(rgb[1:], ir[:-1], 1.0, margin)
    return (pos * 2 + neg1 + neg2) / 4.0


def ssim_global(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """1 - SSIM from global scalar moments. Ref: ssim_loss
    (yolo_test.py:461-486)."""
    mu1 = jnp.mean(img1)
    mu2 = jnp.mean(img2)
    var1 = jnp.mean(jnp.square(img1 - mu1))
    var2 = jnp.mean(jnp.square(img2 - mu2))
    cov = jnp.mean((img1 - mu1) * (img2 - mu2))
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = ((2 * mu1 * mu2 + c1) * (2 * cov + c2)
            / ((mu1 ** 2 + mu2 ** 2 + c1) * (var1 + var2 + c2)))
    return 1.0 - ssim


def _std_unbiased(x: jnp.ndarray) -> jnp.ndarray:
    n = x.size
    return jnp.sqrt(jnp.sum(jnp.square(x - jnp.mean(x))) / max(n - 1, 1))


def fusing_loss(rgb_in: jnp.ndarray, ir_in: jnp.ndarray,
                fused_rgb: jnp.ndarray, fused_ir: jnp.ndarray) -> jnp.ndarray:
    """Weighted SSIM + contrast-consistency. Ref: compute_fusing_loss2
    (yolo_test.py:444-459)."""
    loss = 0.5 * ssim_global(rgb_in, fused_rgb) + \
        0.5 * ssim_global(ir_in, fused_ir)
    contrast = jnp.abs(_std_unbiased(fused_rgb) - _std_unbiased(fused_ir))
    return loss + contrast


def entropy_256(x: jnp.ndarray, soft: bool = False,
                tau: float = 0.01) -> jnp.ndarray:
    """Shannon entropy of the 256-bin histogram of ``x`` over [0, 1].
    Ref: calculate_entropy (yolo_test.py:424-429) — torch.histc ignores
    values outside [min, max] and has no gradient (matched via
    ``stop_gradient`` unless ``soft``)."""
    xf = x.astype(jnp.float32).reshape(-1)
    if soft:
        centers = (jnp.arange(256, dtype=jnp.float32) + 0.5) / 256.0
        w = jax.nn.softmax(-jnp.square(xf[:, None] - centers[None, :]) / tau,
                           axis=-1)
        in_range = ((xf >= 0) & (xf <= 1)).astype(jnp.float32)
        hist = jnp.sum(w * in_range[:, None], axis=0)
    else:
        xf = jax.lax.stop_gradient(xf)
        in_range = (xf >= 0) & (xf <= 1)
        idx = jnp.clip(jnp.floor(xf * 256.0).astype(jnp.int32), 0, 255)
        hist = jnp.zeros((256,), jnp.float32).at[idx].add(
            in_range.astype(jnp.float32))
    p = hist / jnp.maximum(jnp.sum(hist), 1e-12)
    plogp = jnp.where(p > 0, p * jnp.log2(jnp.maximum(p, 1e-30)), 0.0)
    return -jnp.sum(plogp)


def entropy_loss(rgb_in: jnp.ndarray, ir_in: jnp.ndarray,
                 fused: jnp.ndarray, soft: bool = False) -> jnp.ndarray:
    """(H(rgb) + H(ir)) - H(fused). Ref: compute_EntropyLoss
    (yolo_test.py:406-422)."""
    return (entropy_256(rgb_in, soft) + entropy_256(ir_in, soft)
            - entropy_256(fused, soft))
