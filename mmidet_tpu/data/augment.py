"""On-device paired augmentation graph: mosaic, shared random perspective,
per-modality HSV, shared flips — all jit-compiled, fixed-shape, keyed by
per-sample PRNG.

Functional parity surface: reference ``utils/datasets.py`` —
``load_mosaic_RGB_IR`` (1764-1913), ``random_perspective_rgb_ir``
(2154-2263), ``augment_hsv`` (applied with *independent* random gains per
modality — a reference quirk we keep, datasets.py:1512-1515), flips
(shared across modalities).

This is the north-star requirement (BASELINE.md): augmentation runs as jitted
XLA ops on device, not in cv2 worker processes.  Deviations (documented):
  * HSV runs in float RGB<->HSV space rather than uint8 LUTs (same
    distribution, no 1/255 quantisation);
  * warps use bilinear ``map_coordinates`` (cv2 default is also bilinear).

Mosaic tiles arrive square-letterboxed (fixed shapes), but the geometry is
reference-EXACT: ``pads4`` carries each tile's letterbox content placement
and ``_mosaic_geometry`` anchors the content corner at the mosaic center,
reproducing the reference's aspect-shaped placement pixel-for-pixel
(oracle test in tests/test_augment.py).

Geometry parity (exact): the affine matrix composition — center translate ->
perspective -> rotation+scale -> shear -> random translate — and the label
corner-transform + ``box_candidates`` gate replicate the reference formulas.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class AugmentHyp:
    """Augmentation hyperparameters (data/hyp.scratch.yaml:24-33)."""
    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5
    mosaic: float = 1.0


# ---------------------------------------------------------------------------
# color
# ---------------------------------------------------------------------------

def rgb_to_hsv(x: jnp.ndarray) -> jnp.ndarray:
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    mx = jnp.max(x, axis=-1)
    mn = jnp.min(x, axis=-1)
    d = mx - mn + 1e-12
    h = jnp.where(mx == r, (g - b) / d % 6.0,
                  jnp.where(mx == g, (b - r) / d + 2.0, (r - g) / d + 4.0))
    h = h / 6.0 % 1.0
    s = jnp.where(mx > 0, d / (mx + 1e-12), 0.0)
    return jnp.stack([h, s, mx], axis=-1)


def hsv_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    # branchless formulation: jnp.choose lowers to a gather (measured
    # 670 ms/batch-16 @640 on v5e for the choose version, ~20x this one)
    h, s, v = x[..., 0], x[..., 1], x[..., 2]
    h6 = h * 6.0

    def chan(n):
        k = (n + h6) % 6.0
        return v - v * s * jnp.clip(jnp.minimum(k, 4.0 - k), 0.0, 1.0)

    return jnp.stack([chan(5.0), chan(3.0), chan(1.0)], axis=-1)


def augment_hsv(img: jnp.ndarray, key: jax.Array,
                hyp: AugmentHyp) -> jnp.ndarray:
    """img float 0..1 HWC. Multiplicative h/s/v gains ~ U(1-g, 1+g)
    (reference augment_hsv's r = uniform(-1,1)*gain + 1)."""
    r = jax.random.uniform(key, (3,), minval=-1.0, maxval=1.0)
    gains = r * jnp.asarray([hyp.hsv_h, hyp.hsv_s, hyp.hsv_v]) + 1.0
    hsv = rgb_to_hsv(img)
    h = (hsv[..., 0] * gains[0]) % 1.0
    s = jnp.clip(hsv[..., 1] * gains[1], 0.0, 1.0)
    v = jnp.clip(hsv[..., 2] * gains[2], 0.0, 1.0)
    return hsv_to_rgb(jnp.stack([h, s, v], axis=-1))


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------

def _perspective_matrix(key: jax.Array, hyp: AugmentHyp, width: int,
                        height: int, border: int) -> jnp.ndarray:
    """3x3 src->dst matrix, reference composition
    (datasets.py random_perspective: M = T @ S @ R @ P @ C)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    # Center
    C = jnp.eye(3).at[0, 2].set(-width / 2).at[1, 2].set(-height / 2)
    # Perspective
    P = jnp.eye(3)
    P = P.at[2, 0].set(jax.random.uniform(
        k1, minval=-hyp.perspective, maxval=hyp.perspective))
    P = P.at[2, 1].set(jax.random.uniform(
        k2, minval=-hyp.perspective, maxval=hyp.perspective))
    # Rotation + scale
    a = jax.random.uniform(k3, minval=-hyp.degrees, maxval=hyp.degrees)
    s = jax.random.uniform(k4, minval=1 - hyp.scale, maxval=1 + hyp.scale)
    rad = a * math.pi / 180.0
    ca, sa = jnp.cos(rad) * s, jnp.sin(rad) * s
    R = jnp.asarray([[ca, sa, 0.0], [-sa, ca, 0.0], [0.0, 0.0, 1.0]])
    # Shear
    sh = jax.random.uniform(k5, (2,), minval=-hyp.shear, maxval=hyp.shear)
    sh = jnp.tan(sh * math.pi / 180.0)
    S = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    S = S.at[0, 1].set(sh[0]).at[1, 0].set(sh[1])
    # Translation (into the de-bordered output frame)
    out_w, out_h = width - 2 * border, height - 2 * border
    t = jax.random.uniform(k6, (2,), minval=0.5 - hyp.translate,
                           maxval=0.5 + hyp.translate)
    T = jnp.eye(3).at[0, 2].set(t[0] * out_w).at[1, 2].set(t[1] * out_h)
    # the sampled scale is returned too: the reference's box_candidates
    # gate scales the pre-warp box by it (datasets.py:2258, box1 * s)
    return T @ S @ R @ P @ C, s


def warp_image(img: jnp.ndarray, M: jnp.ndarray, out_hw: tuple[int, int],
               fill: float = 114.0 / 255.0) -> jnp.ndarray:
    """Apply src->dst perspective M to HWC image (bilinear, constant fill)."""
    oh, ow = out_hw
    Minv = jnp.linalg.inv(M)
    ys, xs = jnp.meshgrid(jnp.arange(oh, dtype=jnp.float32),
                          jnp.arange(ow, dtype=jnp.float32), indexing="ij")
    ones = jnp.ones_like(xs)
    src = Minv @ jnp.stack([xs.ravel(), ys.ravel(), ones.ravel()])
    sx = src[0] / src[2]
    sy = src[1] / src[2]
    def sample(channel):
        return jax.scipy.ndimage.map_coordinates(
            channel, [sy, sx], order=1, mode="constant", cval=fill)
    out = jax.vmap(sample, in_axes=-1, out_axes=-1)(img)
    return out.reshape(oh, ow, img.shape[-1])


def transform_labels(labels_xyxy: jnp.ndarray, mask: jnp.ndarray,
                     M: jnp.ndarray, out_hw: tuple[int, int],
                     perspective: bool = False, scale=1.0):
    """Warp xyxy boxes through M; clip; apply the reference's
    box_candidates gate (wh>2px, area ratio>0.1, aspect<20)."""
    oh, ow = out_hw
    x1, y1, x2, y2 = (labels_xyxy[:, i] for i in range(4))
    corners = jnp.stack([
        jnp.stack([x1, y1], -1), jnp.stack([x2, y1], -1),
        jnp.stack([x1, y2], -1), jnp.stack([x2, y2], -1)], axis=1)  # (N,4,2)
    n = corners.shape[0]
    pts = jnp.concatenate([corners.reshape(-1, 2),
                           jnp.ones((n * 4, 1))], axis=1)  # (4N, 3)
    warped = pts @ M.T
    if perspective:
        warped = warped[:, :2] / warped[:, 2:3]
    else:
        warped = warped[:, :2]
    warped = warped.reshape(n, 4, 2)
    nx1 = jnp.clip(warped[..., 0].min(1), 0, ow)
    nx2 = jnp.clip(warped[..., 0].max(1), 0, ow)
    ny1 = jnp.clip(warped[..., 1].min(1), 0, oh)
    ny2 = jnp.clip(warped[..., 1].max(1), 0, oh)
    new = jnp.stack([nx1, ny1, nx2, ny2], axis=-1)
    # the area-ratio denominator uses the SCALED pre-warp box, exactly as
    # the reference's box_candidates(box1=targets[:,1:5].T * s, ...)
    # call (datasets.py:2258) — without it label survival diverges at
    # every non-unit sampled scale
    w1, h1 = (x2 - x1) * scale, (y2 - y1) * scale
    w2, h2 = nx2 - nx1, ny2 - ny1
    ar = jnp.maximum(w2 / (h2 + 1e-16), h2 / (w2 + 1e-16))
    keep = ((w2 > 2) & (h2 > 2)
            & (w2 * h2 / (w1 * h1 + 1e-16) > 0.1) & (ar < 20))
    return new, mask & keep


# ---------------------------------------------------------------------------
# mosaic
# ---------------------------------------------------------------------------

def mosaic4(tiles: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray,
            key: jax.Array, s: int, fill: float = 114.0 / 255.0,
            pads=None):
    """4 (s,s,C) tiles -> (2s,2s,C) mosaic canvas + shifted xyxy labels.

    Reference load_mosaic_RGB_IR (datasets.py:1764-1913): center
    (xc, yc) ~ U(s/2, 3s/2)^2; tile i goes to the i-th quadrant touching the
    center.  Fixed-shape formulation: each tile is placed by translation
    only; reads outside the canvas clip.  (The general-warp path; the
    axis-aligned fast path shares _mosaic_geometry/_mosaic_labels so the
    two stay bit-identical on geometry.)
    labels: (4, T, 5) [cls, x, y, w, h] normalized per tile.
    Returns canvas (2s,2s,C), labels_xyxy (4*T, 4), cls (4*T,), mask (4*T,).
    """
    xc, yc, offs = _mosaic_geometry(key, s, pads)
    ys, xs = jnp.meshgrid(jnp.arange(2 * s, dtype=jnp.float32),
                          jnp.arange(2 * s, dtype=jnp.float32),
                          indexing="ij")

    def translated(tile, ty, tx):
        def sample(channel):
            return jax.scipy.ndimage.map_coordinates(
                channel, [(ys - ty).ravel(), (xs - tx).ravel()], order=0,
                mode="constant", cval=fill)
        out = jax.vmap(sample, in_axes=-1, out_axes=-1)(tile)
        return out.reshape(2 * s, 2 * s, tile.shape[-1])

    quad = (2 * (ys >= yc).astype(jnp.int32)
            + (xs >= xc).astype(jnp.int32))  # 0 tl, 1 tr, 2 bl, 3 br
    canvas = jnp.full((2 * s, 2 * s, tiles.shape[-1]), fill, tiles.dtype)
    for i in range(4):
        ti = translated(tiles[i], offs[i][0], offs[i][1])
        canvas = jnp.where((quad == i)[..., None], ti, canvas)

    boxes, cls, msk = _mosaic_labels(labels, mask, offs, s)
    return canvas, boxes, cls, msk


def _mosaic_geometry(key: jax.Array, s: int, pads=None):
    """Mosaic center + per-tile top-left offsets (ty, tx). Ref:
    datasets.py:1777-1778 (xc, yc ~ U(s/2, 3s/2), rounded).

    ``pads``: (4, 4) [top, left, nh, nw] — where each tile's CONTENT sits
    inside its letterboxed square (letterbox_np placement).  The reference
    places aspect-shaped images with the content corner touching the
    mosaic center (datasets.py:1780-1795: x1a = xc - w etc.); shifting
    each tile by its letterbox pad reproduces that exactly — the gray
    letterbox bands land where the reference canvas shows its own 114
    fill, so the composed canvas is pixel-identical.  ``pads=None``
    (top=left=0, nh=nw=s) anchors the full tile instead."""
    c = jnp.round(jax.random.uniform(key, (2,), minval=0.5 * s,
                                     maxval=1.5 * s))
    xc, yc = c[0], c[1]
    if pads is None:
        offs = [(yc - s, xc - s), (yc - s, xc), (yc, xc - s), (yc, xc)]
        return xc, yc, offs
    top, left = pads[:, 0], pads[:, 1]
    nh, nw = pads[:, 2], pads[:, 3]
    offs = [(yc - (top[0] + nh[0]), xc - (left[0] + nw[0])),  # tl
            (yc - (top[1] + nh[1]), xc - left[1]),            # tr
            (yc - top[2], xc - (left[2] + nw[2])),            # bl
            (yc - top[3], xc - left[3])]                      # br
    return xc, yc, offs


def _mosaic_labels(labels, mask, offs, s: int):
    """Shift per-tile normalized xywh labels into canvas xyxy."""
    all_boxes, all_cls, all_mask = [], [], []
    for i in range(4):
        ty, tx = offs[i]
        lab = labels[i]
        cx, cy = lab[:, 1] * s, lab[:, 2] * s
        w, h = lab[:, 3] * s, lab[:, 4] * s
        all_boxes.append(jnp.stack([cx - w / 2 + tx, cy - h / 2 + ty,
                                    cx + w / 2 + tx, cy + h / 2 + ty],
                                   axis=-1))
        all_cls.append(lab[:, 0])
        all_mask.append(mask[i])
    boxes = jnp.clip(jnp.concatenate(all_boxes), 0, 2 * s)
    return boxes, jnp.concatenate(all_cls), jnp.concatenate(all_mask)


def mosaic_warp_fast(tiles: jnp.ndarray, offs, center, M: jnp.ndarray,
                     s: int, fill: float = 114.0 / 255.0) -> jnp.ndarray:
    """Fused mosaic + axis-aligned warp with NO image-space gathers.

    Valid when degrees == shear == perspective == 0 (the default
    hyp.scratch.yaml setting): M = T @ (a*I) @ C is pure scale+translate, so
    each output pixel maps into exactly one tile by a per-axis affine —
    ``jax.image.scale_and_translate`` (kernel-matmul lowering, TPU-fast)
    per tile + a quadrant select in *output* space replaces the 2s x 2s
    canvas compose + ``map_coordinates`` gather warp.  Measured: the gather
    formulation costs ~2 s/batch-16 @640 on v5e; this path is ~50x faster.

    Deviation (documented): bilinear taps do not blend *across* the mosaic
    seams (the gather path samples the composed canvas, mixing 1 px at
    quadrant boundaries); everywhere else the result is identical.
    ``fill`` rides the sampling as ``sample(img - fill) + fill`` so
    out-of-tile taps resolve to the reference's gray border exactly.
    """
    xc, yc = center
    a = M[0, 0]
    tx, ty = M[0, 2], M[1, 2]
    ys = jnp.arange(s, dtype=jnp.float32)[:, None]
    xs = jnp.arange(s, dtype=jnp.float32)[None, :]
    # quadrant boundaries mapped to output coords (a > 0 for scale < 1.0)
    yc_o = a * yc + ty
    xc_o = a * xc + tx
    quad = (2 * (ys >= yc_o).astype(jnp.int32)
            + (xs >= xc_o).astype(jnp.int32))
    out = jnp.full((s, s, tiles.shape[-1]), fill, tiles.dtype)
    scale = jnp.stack([a, a])
    # 1-px fill pad: scale_and_translate normalizes edge weights (the edge
    # pixel gets full weight outside the extent) whereas the reference's
    # bilinear-with-constant-border blends toward fill — padding restores
    # the exact border blend (beyond 1 px both give pure fill).
    padded = jnp.pad(tiles - fill, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # scale_and_translate uses half-pixel centers: in = (o+0.5-T)/a - 0.5,
    # so T = a*off + t + 0.5*(1-a) realizes in = (o - (a*off+t))/a
    half = 0.5 * (1.0 - a)
    for i in range(4):
        oty, otx = offs[i]
        trans = jnp.stack([a * (oty - 1) + ty + half,
                           a * (otx - 1) + tx + half])
        warped = jax.image.scale_and_translate(
            padded[i], (s, s, tiles.shape[-1]), (0, 1), scale, trans,
            method="linear", antialias=False) + fill
        out = jnp.where((quad == i)[..., None], warped, out)
    return out


# ---------------------------------------------------------------------------
# full per-sample pipelines
# ---------------------------------------------------------------------------

def augment_pair_mosaic(rgb4, ir4, labels4, mask4, key, s: int,
                        hyp: AugmentHyp, max_labels: int, pads4=None):
    """Paired mosaic + shared perspective + per-modality HSV + shared flip.

    rgb4/ir4: (4, s, s, 3) float 0..1; labels4: (4, T, 5) normalized;
    mask4: (4, T); pads4: (4, 4) [top, left, nh, nw] letterbox content
    placement (anchors content corners at the mosaic center, making the
    composed canvas pixel-identical to the reference's aspect-shaped
    placement — see _mosaic_geometry).  Returns (rgb, ir, labels
    (max_labels,5) normalized xywh, mask)."""
    k_mosaic, k_warp, k_hsv_r, k_hsv_i, k_flip = jax.random.split(key, 5)
    border = s // 2
    M, s_scale = _perspective_matrix(k_warp, hyp, 2 * s, 2 * s, border)
    if hyp.degrees == 0 and hyp.shear == 0 and hyp.perspective == 0:
        # axis-aligned fast path (the default hyp): fused mosaic+warp via
        # scale_and_translate — no image-space gathers (see mosaic_warp_fast)
        xc, yc, offs = _mosaic_geometry(k_mosaic, s, pads4)
        boxes, cls, m = _mosaic_labels(labels4, mask4, offs, s)
        rgb_w = mosaic_warp_fast(rgb4, offs, (xc, yc), M, s)
        ir_w = mosaic_warp_fast(ir4, offs, (xc, yc), M, s)
    else:
        # identical geometry for both modalities: same mosaic key + same M
        rgb_c, boxes, cls, m = mosaic4(rgb4, labels4, mask4, k_mosaic, s,
                                       pads=pads4)
        ir_c, _, _, _ = mosaic4(ir4, labels4, mask4, k_mosaic, s,
                                pads=pads4)
        rgb_w = warp_image(rgb_c, M, (s, s))
        ir_w = warp_image(ir_c, M, (s, s))
    boxes, m = transform_labels(boxes, m, M, (s, s),
                                perspective=hyp.perspective > 0,
                                scale=s_scale)

    rgb_w = augment_hsv(rgb_w, k_hsv_r, hyp)  # independent gains per
    ir_w = augment_hsv(ir_w, k_hsv_i, hyp)    # modality (reference quirk)

    kud, klr = jax.random.split(k_flip)
    do_ud = jax.random.uniform(kud) < hyp.flipud
    do_lr = jax.random.uniform(klr) < hyp.fliplr
    rgb_w = jnp.where(do_ud, rgb_w[::-1], rgb_w)
    ir_w = jnp.where(do_ud, ir_w[::-1], ir_w)
    rgb_w = jnp.where(do_lr, rgb_w[:, ::-1], rgb_w)
    ir_w = jnp.where(do_lr, ir_w[:, ::-1], ir_w)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    x1, x2 = (jnp.where(do_lr, s - x2, x1), jnp.where(do_lr, s - x1, x2))
    y1, y2 = (jnp.where(do_ud, s - y2, y1), jnp.where(do_ud, s - y1, y2))

    # back to normalized xywh, pad/crop to max_labels by confidence of mask
    cx = (x1 + x2) / 2 / s
    cy = (y1 + y2) / 2 / s
    w = (x2 - x1) / s
    h = (y2 - y1) / s
    lab = jnp.stack([cls, cx, cy, w, h], axis=-1)
    # top-max_labels valid entries (stable order)
    order = jnp.argsort(~m)  # valid first
    lab = lab[order][:max_labels]
    m = m[order][:max_labels]
    lab = jnp.where(m[:, None], lab, 0.0)
    return rgb_w, ir_w, lab, m


def augment_pair_basic(rgb, ir, labels, mask, key, hyp: AugmentHyp):
    """No-mosaic path: per-modality HSV + shared flips on letterboxed pairs.
    labels stay normalized xywh."""
    k_hsv_r, k_hsv_i, k_flip = jax.random.split(key, 3)
    rgb = augment_hsv(rgb, k_hsv_r, hyp)
    ir = augment_hsv(ir, k_hsv_i, hyp)
    kud, klr = jax.random.split(k_flip)
    do_ud = jax.random.uniform(kud) < hyp.flipud
    do_lr = jax.random.uniform(klr) < hyp.fliplr
    rgb = jnp.where(do_ud, rgb[::-1], rgb)
    ir = jnp.where(do_ud, ir[::-1], ir)
    rgb = jnp.where(do_lr, rgb[:, ::-1], rgb)
    ir = jnp.where(do_lr, ir[:, ::-1], ir)
    cx = jnp.where(do_lr, 1.0 - labels[:, 1], labels[:, 1])
    cy = jnp.where(do_ud, 1.0 - labels[:, 2], labels[:, 2])
    labels = labels.at[:, 1].set(cx).at[:, 2].set(cy)
    labels = jnp.where(mask[:, None], labels, 0.0)
    return rgb, ir, labels, mask


def make_batch_augment(s: int, hyp: AugmentHyp, max_labels: int,
                       mosaic: bool = True):
    """Returns a jittable (batch, key) -> batch augmentation over
    dict(rgb4/ir4/labels4/mask4) [mosaic] or dict(rgb/ir/targets/mask)."""
    if mosaic:
        def fn(batch, key):
            b = batch["rgb4"].shape[0]
            keys = jax.random.split(key, b)
            pads4 = batch.get("pads4")
            if pads4 is None:  # full-tile anchoring (top=left=0, nh=nw=s)
                pads4 = jnp.tile(
                    jnp.asarray([0.0, 0.0, float(s), float(s)],
                                jnp.float32), (b, 4, 1))
            rgb, ir, lab, m = jax.vmap(
                lambda r4, i4, l4, m4, p4, k: augment_pair_mosaic(
                    r4, i4, l4, m4, k, s, hyp, max_labels, pads4=p4)
            )(batch["rgb4"], batch["ir4"], batch["labels4"],
              batch["mask4"], pads4, keys)
            return {"rgb": rgb, "ir": ir, "targets": lab, "mask": m}
    else:
        def fn(batch, key):
            keys = jax.random.split(key, batch["rgb"].shape[0])
            rgb, ir, lab, m = jax.vmap(
                lambda r, i, l, mm, k: augment_pair_basic(r, i, l, mm, k,
                                                          hyp)
            )(batch["rgb"], batch["ir"], batch["targets"], batch["mask"],
              keys)
            return {"rgb": rgb, "ir": ir, "targets": lab, "mask": m}
    return fn


def quad_batch(rgb, ir, targets, mask, key):
    """Reference ``--quad`` collate (``collate_fn4``, datasets.py:1020-1046
    and its two-stream twin): each group of 4 samples becomes ONE sample at
    double resolution — with prob 0.5 a bilinear 2x upscale of the group's
    FIRST image (keeping only its labels, as the reference), else a 2x2
    mosaic of all four (tiles 0/1 stacked in the left column, 2/3 in the
    right) with labels offset+halved.

    rgb/ir: (B, s, s, C) float; targets: (B, T, 5) normalized cls,xywh;
    mask: (B, T).  B must be divisible by 4.  Returns the same dict keys at
    shapes (B/4, 2s, 2s, C) / (B/4, 4T, 5) / (B/4, 4T)."""
    from mmidet_tpu.nn.resize import bilinear_resize
    b, s = rgb.shape[0], rgb.shape[1]
    assert b % 4 == 0, f"--quad needs batch % 4 == 0, got {b}"
    g, t = b // 4, targets.shape[1]

    def grp(x):
        return x.reshape((g, 4) + x.shape[1:])
    r4, i4, l4, m4 = grp(rgb), grp(ir), grp(targets), grp(mask)

    def mosaic22(t4):
        left = jnp.concatenate([t4[:, 0], t4[:, 1]], axis=1)
        right = jnp.concatenate([t4[:, 2], t4[:, 3]], axis=1)
        return jnp.concatenate([left, right], axis=2)

    mq_r, mq_i = mosaic22(r4), mosaic22(i4)
    # label remap: tile1 y+=1, tile2 x+=1, tile3 both; then xywh *= 0.5
    # (ref ho/wo/s rows, datasets.py collate_fn4)
    offx = jnp.asarray([0.0, 0.0, 1.0, 1.0])[None, :, None]
    offy = jnp.asarray([0.0, 1.0, 0.0, 1.0])[None, :, None]
    lm = jnp.stack([l4[..., 0], (l4[..., 1] + offx) * 0.5,
                    (l4[..., 2] + offy) * 0.5, l4[..., 3] * 0.5,
                    l4[..., 4] * 0.5], axis=-1).reshape(g, 4 * t, 5)
    mm = m4.reshape(g, 4 * t)

    up_r = bilinear_resize(r4[:, 0], (2 * s, 2 * s))
    up_i = bilinear_resize(i4[:, 0], (2 * s, 2 * s))
    lu = jnp.concatenate([l4[:, 0], jnp.zeros((g, 3 * t, 5), l4.dtype)],
                         axis=1)
    mu = jnp.concatenate([m4[:, 0], jnp.zeros((g, 3 * t), m4.dtype)], axis=1)

    take_up = jax.random.uniform(key, (g,)) < 0.5
    sel_img = take_up[:, None, None, None]
    return {"rgb": jnp.where(sel_img, up_r, mq_r),
            "ir": jnp.where(sel_img, up_i, mq_i),
            "targets": jnp.where(take_up[:, None, None], lu, lm),
            "mask": jnp.where(take_up[:, None], mu, mm)}


# ---------------------------------------------------------------------------
# additional single-stream augmentations (reference datasets.py:1607-2322)
# ---------------------------------------------------------------------------

def mixup(img1, labels1, mask1, img2, labels2, mask2, key):
    """Beta(8,8) image mixup; labels concatenate. Ref: datasets.py mixup."""
    r = jax.random.beta(key, 8.0, 8.0)
    img = img1 * r + img2 * (1.0 - r)
    labels = jnp.concatenate([labels1, labels2], axis=0)
    mask = jnp.concatenate([mask1, mask2], axis=0)
    return img, labels, mask


def cutout(img, key, labels_xyxy=None, mask=None,
           fill_low: float = 64 / 255, fill_high: float = 191 / 255):
    """Random occlusion rectangles, reference schedule and semantics
    (datasets.py:2295-2320): scales [1/2]x1 + [1/4]x2 + [1/8]x4 +
    [1/16]x8 + [1/32]x16; each mask's height/width ~ randint(1, dim*s);
    labels more than 60% obscured by a mask with s > 0.03 are dropped.

    Returns img when labels_xyxy is None, else (img, mask) with obscured
    labels masked out."""
    h, w = img.shape[:2]
    scales = ([0.5] * 1 + [0.25] * 2 + [0.125] * 4 + [0.0625] * 8
              + [0.03125] * 16)
    keys = jax.random.split(key, len(scales) * 5)
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    out = img
    keep = mask
    for i, s in enumerate(scales):
        kh, kw, ky, kx, kf = keys[5 * i:5 * i + 5]
        # reference: mask_h = random.randint(1, int(h * s)) (inclusive)
        mh = jax.random.randint(kh, (), 1, max(int(h * s), 1) + 1)
        mw = jax.random.randint(kw, (), 1, max(int(w * s), 1) + 1)
        cy = jax.random.randint(ky, (), 0, h + 1)
        cx = jax.random.randint(kx, (), 0, w + 1)
        ymin = jnp.clip(cy - mh // 2, 0, h)
        ymax = jnp.clip(ymin + mh, 0, h)
        xmin = jnp.clip(cx - mw // 2, 0, w)
        xmax = jnp.clip(xmin + mw, 0, w)
        box = ((ys >= ymin) & (ys < ymax) & (xs >= xmin) & (xs < xmax))
        fill = jax.random.uniform(kf, (3,), minval=fill_low,
                                  maxval=fill_high)
        out = jnp.where(box[..., None], fill, out)
        if keep is not None and s > 0.03:
            # drop labels >60% obscured (intersection over label area)
            lx1, ly1 = labels_xyxy[:, 0], labels_xyxy[:, 1]
            lx2, ly2 = labels_xyxy[:, 2], labels_xyxy[:, 3]
            iw = jnp.clip(jnp.minimum(lx2, xmax) - jnp.maximum(lx1, xmin),
                          0)
            ih = jnp.clip(jnp.minimum(ly2, ymax) - jnp.maximum(ly1, ymin),
                          0)
            ioa = iw * ih / ((lx2 - lx1) * (ly2 - ly1) + 1e-16)
            keep = keep & (ioa < 0.60)
    return out if labels_xyxy is None else (out, keep)


def _rgb_yuv(img):
    """BT.601 RGB<->YUV (the reference equalizes cv2 YUV luma,
    datasets.py:1677-1688)."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.14713 * r - 0.28886 * g + 0.436 * b
    v = 0.615 * r - 0.51499 * g - 0.10001 * b
    return y, u, v


def _yuv_rgb(y, u, v):
    r = y + 1.13983 * v
    g = y - 0.39465 * u - 0.58060 * v
    b = y + 2.03211 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


def hist_equalize(img, clahe: bool = True, clip_limit: float = 2.0,
                  tiles: int = 8):
    """Luma histogram equalization, reference semantics (datasets.py
    hist_equalize): CLAHE by default — clip-limited per-tile histograms on
    the YUV luma with bilinear blending between the 4 neighbouring tile
    mappings (cv2.createCLAHE(2.0, (8,8)) algorithm, float-domain) — or
    global equalizeHist when ``clahe=False``.  H and W must be divisible
    by ``tiles``."""
    y, u, v = _rgb_yuv(img)
    h, w = y.shape
    idx = jnp.clip((y * 255.0).astype(jnp.int32), 0, 255)
    if not clahe:
        hist = jnp.zeros((256,)).at[idx.reshape(-1)].add(1.0)
        cdf = jnp.cumsum(hist)
        cdf = (cdf - cdf[0]) / jnp.maximum(cdf[-1] - cdf[0], 1e-6)
        return _yuv_rgb(cdf[idx], u, v)

    th, tw = h // tiles, w // tiles
    # per-tile histograms: (tiles, tiles, 256)
    tidx = idx.reshape(tiles, th, tiles, tw).transpose(0, 2, 1, 3)
    onehot = jax.nn.one_hot(tidx.reshape(tiles, tiles, -1), 256)
    hist = onehot.sum(2)
    # clip-limited redistribution; cv2 floors the limit at one count
    # (max(int(clipLimit*tileArea/256), 1)) — without the floor, small
    # tiles clip every occupied bin and flatten the mapping to identity
    clip = max(clip_limit * (th * tw) / 256.0, 1.0)
    clipped = jnp.minimum(hist, clip)
    excess = (hist - clipped).sum(-1, keepdims=True)
    clipped = clipped + excess / 256.0
    cdf = jnp.cumsum(clipped, axis=-1)
    cdf = cdf / jnp.maximum(cdf[..., -1:], 1e-6)       # (T, T, 256)
    # bilinear blend of the 4 neighbouring tile mappings at each pixel
    ys = (jnp.arange(h) + 0.5) / th - 0.5              # tile-grid coords
    xs = (jnp.arange(w) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, tiles - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, tiles - 1)
    y1 = jnp.clip(y0 + 1, 0, tiles - 1)
    x1 = jnp.clip(x0 + 1, 0, tiles - 1)
    fy = jnp.clip(ys - y0, 0.0, 1.0)[:, None]
    fx = jnp.clip(xs - x0, 0.0, 1.0)[None, :]
    g = (y0[:, None], y1[:, None], x0[None, :], x1[None, :])
    m00 = cdf[g[0], g[2], idx]
    m01 = cdf[g[0], g[3], idx]
    m10 = cdf[g[1], g[2], idx]
    m11 = cdf[g[1], g[3], idx]
    y_eq = ((1 - fy) * ((1 - fx) * m00 + fx * m01)
            + fy * ((1 - fx) * m10 + fx * m11))
    return _yuv_rgb(y_eq, u, v)


def mosaic9(tiles: jnp.ndarray, labels: jnp.ndarray, mask: jnp.ndarray,
            key: jax.Array, s: int, fill: float = 114.0 / 255.0):
    """9-image mosaic (3x3 grid with jittered center crop).
    Ref: datasets.py load_mosaic9 — fixed-shape variant: 3x3 tiling of
    letterboxed tiles, then a random s-crop.

    tiles: (9, s, s, C); labels (9, T, 5) normalized; mask (9, T).
    Returns (canvas (s,s,C), boxes_xyxy, cls, mask) in crop coordinates."""
    canvas = jnp.concatenate(
        [jnp.concatenate([tiles[r * 3 + c] for c in range(3)], axis=1)
         for r in range(3)], axis=0)  # (3s, 3s, C)
    off = jax.random.randint(key, (2,), 0, 2 * s)  # crop origin
    crop = jax.lax.dynamic_slice(canvas, (off[0], off[1], 0),
                                 (s, s, canvas.shape[-1]))
    boxes, cls, m = [], [], []
    for i in range(9):
        r, c = divmod(i, 3)
        lab = labels[i]
        cx = lab[:, 1] * s + c * s - off[1]
        cy = lab[:, 2] * s + r * s - off[0]
        w = lab[:, 3] * s
        h = lab[:, 4] * s
        boxes.append(jnp.stack([cx - w / 2, cy - h / 2,
                                cx + w / 2, cy + h / 2], axis=-1))
        cls.append(lab[:, 0])
        m.append(mask[i])
    b = jnp.concatenate(boxes)
    m = jnp.concatenate(m)
    clipped = jnp.clip(b, 0, s)
    wh_ok = ((clipped[:, 2] - clipped[:, 0]) > 2) & \
        ((clipped[:, 3] - clipped[:, 1]) > 2)
    return crop, clipped, jnp.concatenate(cls), m & wh_ok


def replicate_labels(img, boxes_xyxy, cls, mask, key):
    """Replicate small boxes — PIXELS AND labels — to random positions
    (ref datasets.py:2000-2013 ``replicate``): boxes ranked by mean side
    length (w+h)/2, smallest first; the source patch is copied to the new
    location (the reference writes img[y1a:y2a, x1a:x2a] = img[y1b:y2b,
    x1b:x2b]).  Fixed-count variant: up to 4 replicas (the reference does
    n//2, dynamic).  Integer coordinates, as the reference."""
    h, w = img.shape[:2]
    b = jnp.floor(boxes_xyxy).astype(jnp.int32)
    side = ((b[:, 2] - b[:, 0]) + (b[:, 3] - b[:, 1])) / 2.0
    order = jnp.argsort(jnp.where(mask, side, jnp.inf))
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    out_img = img
    new_boxes, new_cls, new_mask = [], [], []
    keys = jax.random.split(key, 4)
    for i in range(4):
        src = order[i]
        x1b, y1b, x2b, y2b = b[src, 0], b[src, 1], b[src, 2], b[src, 3]
        bw, bh = x2b - x1b, y2b - y1b
        k1, k2 = jax.random.split(keys[i])
        x1a = (jax.random.uniform(k1)
               * jnp.maximum(w - bw, 1)).astype(jnp.int32)
        y1a = (jax.random.uniform(k2)
               * jnp.maximum(h - bh, 1)).astype(jnp.int32)
        # copy the source patch: roll the image by the displacement and
        # select the destination box (a fixed-shape dynamic-size copy)
        # roll the CURRENT canvas (the reference mutates in place, so a
        # later copy may legitimately pick up an earlier replica)
        shifted = jnp.roll(out_img, (y1a - y1b, x1a - x1b), axis=(0, 1))
        in_dst = ((ys >= y1a) & (ys < y1a + bh)
                  & (xs >= x1a) & (xs < x1a + bw)) & mask[src]
        out_img = jnp.where(in_dst[..., None], shifted, out_img)
        nb = jnp.stack([x1a, y1a, x1a + bw, y1a + bh]).astype(
            boxes_xyxy.dtype)
        new_boxes.append(nb)
        new_cls.append(cls[src])
        new_mask.append(mask[src])
    return out_img, (jnp.concatenate([boxes_xyxy, jnp.stack(new_boxes)]),
                     jnp.concatenate([cls, jnp.stack(new_cls)]),
                     jnp.concatenate([mask, jnp.stack(new_mask)]))
