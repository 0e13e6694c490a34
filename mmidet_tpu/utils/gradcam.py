"""Feature-heatmap visualisation.

Functional parity surface: reference ``utils/gradcam.py:44-79``
(``calcGradCam`` — channel-sum heatmap of an intermediate feature map,
resized and overlaid on the input).  Here intermediates come from flax's
``capture_intermediates`` instead of forward hooks."""

from __future__ import annotations

import numpy as np


def feature_heatmap(model, variables, rgb, ir=None, layer: str = "l6",
                    **apply_kw) -> np.ndarray:
    """Channel-summed, minmax-normalized heatmap (H, W) of the first captured
    intermediate whose module name starts with ``layer``."""
    args = (rgb,) if ir is None else (rgb, ir)
    _, mods = model.apply(variables, *args, train=False,
                          capture_intermediates=True,
                          mutable=["intermediates"], **apply_kw)
    inter = mods["intermediates"]
    key = next(k for k in sorted(inter) if k.startswith(layer))
    feat = inter[key]["__call__"][0]
    if isinstance(feat, (list, tuple)):
        feat = feat[0]
    hm = np.asarray(feat)[0].sum(-1)  # NHWC -> HW
    hm = (hm - hm.min()) / max(hm.max() - hm.min(), 1e-12)
    return hm


def overlay_heatmap(image: np.ndarray, heatmap: np.ndarray,
                    alpha: float = 0.5) -> np.ndarray:
    """Resize heatmap to the image and blend as a red overlay (uint8)."""
    from PIL import Image
    h, w = image.shape[:2]
    hm = np.asarray(Image.fromarray(
        (heatmap * 255).astype(np.uint8)).resize((w, h)))
    overlay = image.astype(np.float32).copy()
    overlay[..., 0] = np.clip(
        overlay[..., 0] * (1 - alpha) + hm * alpha * 2, 0, 255)
    return overlay.astype(np.uint8)
