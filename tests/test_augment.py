"""On-device augmentation graph tests: HSV roundtrip, warp geometry, mosaic
composition, label transforms, determinism, paired-geometry invariants."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.data.augment import (AugmentHyp, augment_hsv,
                                     augment_pair_basic, augment_pair_mosaic,
                                     hsv_to_rgb, mosaic4, rgb_to_hsv,
                                     transform_labels, warp_image)


def test_hsv_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    y = np.asarray(hsv_to_rgb(rgb_to_hsv(jnp.asarray(x))))
    np.testing.assert_allclose(y, x, atol=1e-5)


def test_hsv_zero_gain_identity():
    hyp = AugmentHyp(hsv_h=0.0, hsv_s=0.0, hsv_v=0.0)
    x = jnp.asarray(np.random.default_rng(1).uniform(
        0, 1, (8, 8, 3)).astype(np.float32))
    y = augment_hsv(x, jax.random.PRNGKey(0), hyp)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-5)


def test_warp_identity():
    x = jnp.asarray(np.random.default_rng(2).uniform(
        0, 1, (12, 12, 3)).astype(np.float32))
    M = jnp.eye(3)
    y = warp_image(x, M, (12, 12))
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), atol=1e-6)


def test_warp_translation_fill():
    x = jnp.ones((8, 8, 1))
    M = jnp.eye(3).at[0, 2].set(4.0)  # shift right by 4
    y = np.asarray(warp_image(x, M, (8, 8)))
    assert np.allclose(y[:, 4:], 1.0)
    np.testing.assert_allclose(y[:, :3], 114.0 / 255.0, atol=1e-6)


def test_transform_labels_translation():
    boxes = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    mask = jnp.asarray([True])
    M = jnp.eye(3).at[0, 2].set(5.0)
    new, keep = transform_labels(boxes, mask, M, (64, 64))
    np.testing.assert_allclose(np.asarray(new), [[15, 10, 25, 20]])
    assert bool(keep[0])


def test_transform_labels_filters_degenerate():
    boxes = jnp.asarray([[10.0, 10.0, 20.0, 20.0]])
    mask = jnp.asarray([True])
    # shift entirely off-canvas -> clipped to zero area -> filtered
    M = jnp.eye(3).at[0, 2].set(100.0)
    _, keep = transform_labels(boxes, mask, M, (64, 64))
    assert not bool(keep[0])


def test_cutout_filters_obscured_labels():
    """cutout matches the reference semantics (datasets.py:2295-2320):
    occlusion rectangles change pixels, and labels >60% obscured by an
    s>0.03 mask are dropped while untouched labels survive."""
    import jax
    import jax.numpy as jnp
    from mmidet_tpu.data.augment import cutout
    img = jnp.ones((64, 64, 3)) * 0.5
    labels = jnp.asarray([[0.0, 0.0, 64.0, 64.0],     # whole image
                          [1.0, 1.0, 2.0, 2.0]])      # tiny corner box
    mask = jnp.ones((2,), bool)
    out, keep = cutout(img, jax.random.PRNGKey(0), labels, mask)
    assert out.shape == img.shape
    assert bool(keep[0])  # the whole-image box can never be 60% obscured
    # pixels actually changed somewhere
    assert float(jnp.abs(out - img).max()) > 0
    # image-only call keeps the old signature
    out2 = cutout(img, jax.random.PRNGKey(1))
    assert out2.shape == img.shape


def test_replicate_copies_pixels():
    """replicate copies the SOURCE PATCH to the new location (reference
    writes img[y1a:y2a, x1a:x2a] = img[y1b:y2b, x1b:x2b]) — the new label
    must cover pixels identical to its source box."""
    import jax
    import jax.numpy as jnp
    from mmidet_tpu.data.augment import replicate_labels
    rng = np.random.default_rng(0)
    img = np.asarray(rng.random((64, 64, 3)), np.float32)
    # solid-color source patch: replicas may overlap each other (the
    # reference copies in place), but every replica destination must end
    # up this exact color regardless of copy order
    img[4:10, 4:12] = 0.77
    img = jnp.asarray(img)
    boxes = jnp.asarray([[4.0, 4.0, 12.0, 10.0]])
    cls = jnp.asarray([1.0])
    mask = jnp.ones((1,), bool)
    out_img, (nb, ncls, nm) = replicate_labels(
        img, boxes, cls, mask, jax.random.PRNGKey(3))
    assert nb.shape[0] == 5 and ncls.shape[0] == 5
    out = np.asarray(out_img)
    n_checked = 0
    for i in range(1, 5):
        if not bool(nm[i]):
            continue
        x1, y1, x2, y2 = (int(v) for v in np.asarray(nb[i]))
        assert (x2 - x1, y2 - y1) == (8, 6)
        np.testing.assert_allclose(out[y1:y2, x1:x2], 0.77, atol=1e-6)
        n_checked += 1
    assert n_checked == 4


def test_hist_equalize_clahe_close_to_cv2():
    """hist_equalize(clahe=True) implements cv2's CLAHE algorithm on YUV
    luma (clip-limited 8x8 tiles, bilinear tile blending). Compared
    loosely against cv2.createCLAHE — implementations differ in rounding
    and border handling, so assert luma correlation, not bytes."""
    cv2 = pytest.importorskip("cv2")
    import jax.numpy as jnp
    from mmidet_tpu.data.augment import hist_equalize
    rng = np.random.default_rng(5)
    # low-contrast image with spatially varying exposure
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    base = 0.3 + 0.2 * (xx / 64) + 0.05 * rng.random((64, 64))
    img = np.stack([base, base * 0.9, base * 1.1], -1).clip(0, 1)

    ours = np.asarray(hist_equalize(jnp.asarray(img, jnp.float32)))

    u8 = (img * 255).astype(np.uint8)
    yuv = cv2.cvtColor(u8, cv2.COLOR_RGB2YUV)
    yuv[..., 0] = cv2.createCLAHE(
        clipLimit=2.0, tileGridSize=(8, 8)).apply(yuv[..., 0])
    ref = cv2.cvtColor(yuv, cv2.COLOR_YUV2RGB).astype(np.float32) / 255

    oy = ours.mean(-1)
    ry = ref.mean(-1)
    corr = np.corrcoef(oy.ravel(), ry.ravel())[0, 1]
    assert corr > 0.98
    # both must raise contrast vs the input (cv2 reaches ~1.39x here)
    assert oy.std() > base.std() * 1.3 and ry.std() > base.std() * 1.3


def test_transform_labels_scaled_area_gate():
    """The box_candidates area-ratio denominator uses the SCALED pre-warp
    box (ref datasets.py:2258, box1 * s): under a 0.3x downscale warp a
    surviving box keeps ~9% of its original area — the reference keeps it
    (0.09 / 0.09 = 1.0 > 0.1) while an unscaled denominator would drop it
    (0.09 < 0.1)."""
    import jax.numpy as jnp
    from mmidet_tpu.data.augment import transform_labels
    M = jnp.asarray([[0.3, 0.0, 10.0], [0.0, 0.3, 10.0], [0.0, 0.0, 1.0]])
    boxes = jnp.asarray([[0.0, 0.0, 40.0, 40.0]])  # -> 12x12 after warp
    mask = jnp.ones((1,), bool)
    _, keep_scaled = transform_labels(boxes, mask, M, (64, 64), scale=0.3)
    _, keep_unscaled = transform_labels(boxes, mask, M, (64, 64), scale=1.0)
    assert bool(keep_scaled[0]) and not bool(keep_unscaled[0])


def test_mosaic4_structure():
    s = 32
    tiles = jnp.stack([jnp.full((s, s, 3), v)
                       for v in (0.1, 0.3, 0.5, 0.7)])
    labels = np.zeros((4, 2, 5), np.float32)
    labels[:, 0] = [0, 0.5, 0.5, 0.5, 0.5]
    mask = np.zeros((4, 2), bool)
    mask[:, 0] = True
    canvas, boxes, cls, m = mosaic4(tiles, jnp.asarray(labels),
                                    jnp.asarray(mask),
                                    jax.random.PRNGKey(3), s)
    c = np.asarray(canvas)
    assert c.shape == (2 * s, 2 * s, 3)
    # all four tile values must appear somewhere
    uniq = np.unique(c)
    for v in (0.1, 0.3, 0.5, 0.7):
        assert np.isclose(uniq, v, atol=1e-3).any(), f"tile {v} missing"
    assert np.asarray(m).sum() == 4
    b = np.asarray(boxes)[np.asarray(m)]
    assert (b >= 0).all() and (b <= 2 * s).all()


def test_augment_pair_mosaic_end_to_end():
    s = 64
    rng = np.random.default_rng(4)
    rgb4 = jnp.asarray(rng.uniform(0, 1, (4, s, s, 3)).astype(np.float32))
    ir4 = jnp.asarray(rng.uniform(0, 1, (4, s, s, 3)).astype(np.float32))
    labels = np.zeros((4, 8, 5), np.float32)
    labels[:, 0] = [1, 0.5, 0.5, 0.4, 0.4]
    mask = np.zeros((4, 8), bool)
    mask[:, 0] = True
    hyp = AugmentHyp()
    fn = jax.jit(lambda k: augment_pair_mosaic(
        rgb4, ir4, jnp.asarray(labels), jnp.asarray(mask), k, s, hyp, 16))
    rgb, ir, lab, m = fn(jax.random.PRNGKey(5))
    assert rgb.shape == (s, s, 3) and ir.shape == (s, s, 3)
    assert lab.shape == (16, 5) and m.shape == (16,)
    lv = np.asarray(lab)[np.asarray(m)]
    if len(lv):
        assert (lv[:, 1:] >= 0).all() and (lv[:, 1:] <= 1).all()
    # determinism
    rgb2, _, lab2, m2 = fn(jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(rgb), np.asarray(rgb2))
    np.testing.assert_array_equal(np.asarray(lab), np.asarray(lab2))


def test_augment_pair_basic_flip_consistency():
    rng = np.random.default_rng(6)
    rgb = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    ir = jnp.asarray(rng.uniform(0, 1, (32, 32, 3)).astype(np.float32))
    labels = jnp.asarray([[0, 0.25, 0.25, 0.1, 0.1]], jnp.float32)
    mask = jnp.asarray([True])
    hyp = AugmentHyp(hsv_h=0, hsv_s=0, hsv_v=0, fliplr=1.0, flipud=0.0)
    r2, i2, l2, m2 = augment_pair_basic(rgb, ir, labels, mask,
                                        jax.random.PRNGKey(0), hyp)
    # both modalities flipped identically
    np.testing.assert_allclose(np.asarray(r2), np.asarray(rgb)[:, ::-1],
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(i2), np.asarray(ir)[:, ::-1],
                               atol=1e-5)
    np.testing.assert_allclose(float(l2[0, 1]), 0.75, atol=1e-6)


def test_mosaic_loader(tmp_path):
    from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
    from mmidet_tpu.data.loader import MosaicLoader
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    yml = make_synthetic_pair_dataset(str(tmp_path), n=6, img=96)
    d = load_data_yaml(yml)
    ds = PairedDataset(d["train_rgb"], d["train_ir"], nc=2,
                       cache_dir=str(tmp_path))
    loader = MosaicLoader(ds, batch_size=2, img_size=64, max_labels_tile=8)
    b = next(iter(loader))
    assert b["rgb4"].shape == (2, 4, 64, 64, 3)
    assert b["labels4"].shape == (2, 4, 8, 5)
    assert b["mask4"].any()


def test_mosaic_warp_fast_matches_gather_path():
    """The axis-aligned fused mosaic+warp (scale_and_translate, no gathers)
    must reproduce the general gather formulation everywhere except the
    1-px mosaic seams (where the gather path blends across tiles)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mmidet_tpu.data import augment as A

    s = 64
    hyp = A.AugmentHyp()  # default: degrees=shear=perspective=0
    key = jax.random.PRNGKey(3)
    k_mosaic, k_warp = jax.random.split(key)
    rng = np.random.default_rng(0)
    tiles = jnp.asarray(rng.random((4, s, s, 3)), jnp.float32)
    labels = jnp.asarray(rng.random((4, 7, 5)) * 0.5 + 0.25, jnp.float32)
    mask = jnp.ones((4, 7), bool)

    M, _ = A._perspective_matrix(k_warp, hyp, 2 * s, 2 * s, s // 2)

    # general path
    canvas, boxes_g, cls_g, m_g = A.mosaic4(tiles, labels, mask, k_mosaic, s)
    img_g = A.warp_image(canvas, M, (s, s))
    # fast path
    xc, yc, offs = A._mosaic_geometry(k_mosaic, s)
    boxes_f, cls_f, m_f = A._mosaic_labels(labels, mask, offs, s)
    img_f = A.mosaic_warp_fast(tiles, offs, (xc, yc), M, s)

    np.testing.assert_allclose(np.asarray(boxes_g), np.asarray(boxes_f),
                               atol=1e-4)
    np.testing.assert_array_equal(np.asarray(cls_g), np.asarray(cls_f))

    # mask out a 2-px band around the quadrant seams in output coords
    a = float(M[0, 0])
    yc_o = a * float(yc) + float(M[1, 2])
    xc_o = a * float(xc) + float(M[0, 2])
    ys = np.arange(s)[:, None]
    xs = np.arange(s)[None, :]
    interior = (np.abs(ys - yc_o) > 2) & (np.abs(xs - xc_o) > 2)
    diff = np.abs(np.asarray(img_g) - np.asarray(img_f))[interior[..., None]
                                                         .repeat(3, -1)]
    assert diff.max() < 2e-2, diff.max()


def test_mosaic4_reference_exact_content_anchoring():
    """With letterbox pads supplied, the composed canvas must be
    pixel-identical to the reference's aspect-shaped placement
    (load_mosaic_RGB_IR, datasets.py:1780-1795: each image's corner
    touches the mosaic center; uncovered canvas stays 114) — implemented
    here independently in numpy as the oracle."""
    from PIL import Image
    from mmidet_tpu.data.augment import _mosaic_geometry
    from mmidet_tpu.data.datasets import letterbox_np

    s = 32
    fill = 114.0 / 255.0
    rng = np.random.default_rng(11)
    # aspect-shaped sources (taller / wider / square / extreme)
    shapes = [(48, 24), (20, 60), (32, 32), (64, 12)]
    srcs = [rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            for h, w in shapes]

    tiles, pads, resized = [], [], []
    for img in srcs:
        out, r, (dw, dh) = letterbox_np(img, (s, s))
        tiles.append(out.astype(np.float32) / 255.0)
        top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
        nh, nw = int(round(s - 2 * dh)), int(round(s - 2 * dw))
        pads.append((top, left, nh, nw))
        resized.append(np.asarray(Image.fromarray(img).resize(
            (nw, nh), Image.BILINEAR)).astype(np.float32) / 255.0)

    key = jax.random.PRNGKey(7)
    canvas, _, _, _ = mosaic4(jnp.stack(tiles), jnp.zeros((4, 1, 5)),
                              jnp.zeros((4, 1), bool), key, s,
                              pads=jnp.asarray(pads, jnp.float32))

    # numpy oracle: the reference placement formulas
    xc, yc, _ = _mosaic_geometry(key, s)
    xc, yc = int(xc), int(yc)
    want = np.full((2 * s, 2 * s, 3), fill, np.float32)
    for i, img in enumerate(resized):
        h, w = img.shape[:2]
        if i == 0:
            x1a, y1a, x2a, y2a = max(xc - w, 0), max(yc - h, 0), xc, yc
            x1b, y1b = w - (x2a - x1a), h - (y2a - y1a)
        elif i == 1:
            x1a, y1a = xc, max(yc - h, 0)
            x2a, y2a = min(xc + w, 2 * s), yc
            x1b, y1b = 0, h - (y2a - y1a)
        elif i == 2:
            x1a, y1a, x2a = max(xc - w, 0), yc, xc
            y2a = min(2 * s, yc + h)
            x1b, y1b = w - (x2a - x1a), 0
        else:
            x1a, y1a = xc, yc
            x2a, y2a = min(xc + w, 2 * s), min(2 * s, yc + h)
            x1b, y1b = 0, 0
        want[y1a:y2a, x1a:x2a] = img[y1b:y1b + (y2a - y1a),
                                     x1b:x1b + (x2a - x1a)]
    np.testing.assert_allclose(np.asarray(canvas), want, atol=1e-6)


def test_mosaic_warp_fast_matches_gather_path_with_pads():
    """Same fast-vs-gather agreement with letterbox-pad content anchoring
    (the reference-exact mosaic geometry)."""
    from mmidet_tpu.data import augment as A

    s = 64
    hyp = A.AugmentHyp()
    key = jax.random.PRNGKey(9)
    k_mosaic, k_warp = jax.random.split(key)
    rng = np.random.default_rng(2)
    tiles = jnp.asarray(rng.random((4, s, s, 3)), jnp.float32)
    labels = jnp.asarray(rng.random((4, 7, 5)) * 0.5 + 0.25, jnp.float32)
    mask = jnp.ones((4, 7), bool)
    pads = jnp.asarray([[8, 0, 48, 64], [0, 12, 64, 40],
                        [0, 0, 64, 64], [16, 4, 32, 56]], jnp.float32)

    M, _ = A._perspective_matrix(k_warp, hyp, 2 * s, 2 * s, s // 2)
    canvas, boxes_g, _, _ = A.mosaic4(tiles, labels, mask, k_mosaic, s,
                                      pads=pads)
    img_g = A.warp_image(canvas, M, (s, s))
    xc, yc, offs = A._mosaic_geometry(k_mosaic, s, pads)
    boxes_f, _, _ = A._mosaic_labels(labels, mask, offs, s)
    img_f = A.mosaic_warp_fast(tiles, offs, (xc, yc), M, s)

    np.testing.assert_allclose(np.asarray(boxes_g), np.asarray(boxes_f),
                               atol=1e-4)
    a = float(M[0, 0])
    yc_o = a * float(yc) + float(M[1, 2])
    xc_o = a * float(xc) + float(M[0, 2])
    ys = np.arange(s)[:, None]
    xs = np.arange(s)[None, :]
    interior = (np.abs(ys - yc_o) > 2) & (np.abs(xs - xc_o) > 2)
    diff = np.abs(np.asarray(img_g) - np.asarray(img_f))[interior]
    assert diff.max() < 1e-3, diff.max()


def test_hsv_float_vs_uint8_lut_bound():
    """Quantified deviation: our float HSV pipeline vs the reference's
    uint8-LUT cv2 pipeline (augment_hsv, datasets.py) with identical
    gains.  Measured delta is quantization noise: mean ~1 uint8 LSB
    (hue-LUT truncation on saturated pixels reaches ~18 LSB worst-case).
    This test pins that bound so the float path can't silently drift."""
    cv2 = pytest.importorskip("cv2")
    from mmidet_tpu.data.augment import hsv_to_rgb, rgb_to_hsv

    rng = np.random.default_rng(0)
    means, maxes = [], []
    for _ in range(10):
        img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
        gains = rng.uniform(-1, 1, 3) * [0.015, 0.7, 0.4] + 1
        hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
        x = np.arange(0, 256, dtype=np.int16)
        lut_h = ((x * gains[0]) % 180).astype(np.uint8)
        lut_s = np.clip(x * gains[1], 0, 255).astype(np.uint8)
        lut_v = np.clip(x * gains[2], 0, 255).astype(np.uint8)
        hsv = cv2.merge((cv2.LUT(hue, lut_h), cv2.LUT(sat, lut_s),
                         cv2.LUT(val, lut_v)))
        want = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32) / 255

        f = img.astype(np.float32) / 255.0
        hsvf = np.asarray(rgb_to_hsv(jnp.asarray(f)))
        h2 = (hsvf[..., 0] * gains[0]) % 1.0
        s2 = np.clip(hsvf[..., 1] * gains[1], 0, 1)
        v2 = np.clip(hsvf[..., 2] * gains[2], 0, 1)
        got = np.asarray(hsv_to_rgb(jnp.stack([h2, s2, v2], -1)))
        d = np.abs(got - want)
        means.append(d.mean())
        maxes.append(d.max())
    assert np.mean(means) * 255 < 2.0, np.mean(means) * 255
    assert np.max(maxes) * 255 < 25.0, np.max(maxes) * 255
