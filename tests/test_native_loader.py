"""Native C++ fastloader tests: decode+letterbox parity vs the host-python
path, batched throughput, and loader integration."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (w, h, fmt) in enumerate([(100, 80, "PNG"), (64, 64, "JPEG"),
                                     (200, 120, "PNG")]):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        p = root / f"im{i}.{fmt.lower().replace('jpeg', 'jpg')}"
        Image.fromarray(arr).save(p, fmt)
        paths.append(str(p))
    return paths


def test_native_available_and_decode(images):
    from mmidet_tpu.data import native
    if not native.available():
        pytest.skip("native fastloader not built")
    out, meta = native.batch_decode_letterbox(images, 64)
    assert out.shape == (3, 64, 64, 3)
    # meta contract: r = min(64/h, 64/w)
    np.testing.assert_allclose(meta[0, 0], 64 / 100, rtol=1e-6)
    np.testing.assert_allclose(meta[1, 0], 1.0, rtol=1e-6)
    # pad rows are 114-gray for the non-square image
    assert (out[0, :5] == 114).all()


def test_native_matches_python_letterbox(images):
    from PIL import Image
    from mmidet_tpu.data import native
    from mmidet_tpu.data.datasets import letterbox_np
    if not native.available():
        pytest.skip("native fastloader not built")
    out, meta = native.batch_decode_letterbox(images, 64)
    # square same-size JPEG: no resize, only decode -> must be exact
    im1 = np.asarray(Image.open(images[1]).convert("RGB"))
    want, r, (dw, dh) = letterbox_np(im1, (64, 64))
    np.testing.assert_array_equal(out[1], want)
    # resized PNG: the native path implements cv2-style NON-antialiased
    # half-pixel bilinear (what the reference's cv2.INTER_LINEAR does; PIL
    # antialiases on downscale so it is not the oracle).  Verify against a
    # numpy implementation of the same algorithm.
    im0 = np.asarray(Image.open(images[0]).convert("RGB")).astype(np.float32)
    h0, w0 = im0.shape[:2]
    r = min(64 / h0, 64 / w0)
    nw, nh = round(w0 * r), round(h0 * r)

    def bilinear(img, ow, oh):
        ih, iw = img.shape[:2]
        fy = np.clip((np.arange(oh) + 0.5) * ih / oh - 0.5, 0, ih - 1)
        fx = np.clip((np.arange(ow) + 0.5) * iw / ow - 0.5, 0, iw - 1)
        y0 = fy.astype(int)
        x0 = fx.astype(int)
        y1 = np.minimum(y0 + 1, ih - 1)
        x1 = np.minimum(x0 + 1, iw - 1)
        wy = (fy - y0)[:, None, None]
        wx = (fx - x0)[None, :, None]
        return (img[y0][:, x0] * (1 - wy) * (1 - wx)
                + img[y0][:, x1] * (1 - wy) * wx
                + img[y1][:, x0] * wy * (1 - wx)
                + img[y1][:, x1] * wy * wx)

    want_content = np.rint(bilinear(im0, nw, nh))
    dh = (64 - nh) / 2
    dw = (64 - nw) / 2
    top, left = int(round(dh - 0.1)), int(round(dw - 0.1))
    got_content = out[0][top:top + nh, left:left + nw].astype(np.float32)
    err = np.abs(got_content - want_content)
    assert err.max() <= 1.0, err.max()  # rounding-only differences


def test_paired_loader_native(tmp_path):
    from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
    from mmidet_tpu.data.loader import PairedLoader
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    from mmidet_tpu.data import native
    if not native.available():
        pytest.skip("native fastloader not built")
    yml = make_synthetic_pair_dataset(str(tmp_path), n=4, img=96)
    d = load_data_yaml(yml)
    ds = PairedDataset(d["train_rgb"], d["train_ir"], nc=2,
                       cache_dir=str(tmp_path))
    nat = list(PairedLoader(ds, 2, img_size=64, use_native=True))
    py = list(PairedLoader(ds, 2, img_size=64, use_native=False))
    assert len(nat) == len(py) == 2
    for bn, bp in zip(nat, py):
        np.testing.assert_allclose(bn["targets"], bp["targets"], atol=1e-5)
        np.testing.assert_array_equal(bn["mask"], bp["mask"])
        # synthetic images are flat-colored shapes, so resize-algorithm
        # differences only show at shape edges — mean error stays tiny
        err = np.abs(bn["rgb"].astype(int) - bp["rgb"].astype(int)).mean()
        assert err < 4, err


def test_mosaic_native_collate_matches_pil(tmp_path):
    """collate_mosaic_pool_native (one C call for all tiles) must agree
    with the PIL-path collate on labels/masks exactly and on pixels up to
    resampler differences."""
    import numpy as np
    import pytest
    from mmidet_tpu.data import native
    from mmidet_tpu.data.datasets import PairedDataset
    from mmidet_tpu.data.loader import (collate_mosaic_pool,
                                        collate_mosaic_pool_native)
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    import yaml

    if not native.available():
        pytest.skip("native fastloader unavailable")
    yml = make_synthetic_pair_dataset(str(tmp_path / "s"), n=5, img=80)
    d = yaml.safe_load(open(yml))
    ds = PairedDataset(d["train_rgb"], d["train_ir"], nc=d["nc"])
    groups_idx = [[0, 1, 2, 3], [4, 0, 2, 1]]
    nat = collate_mosaic_pool_native(ds, groups_idx, 64, 10)
    groups = [[ds[j] for j in g] for g in groups_idx]
    pil = collate_mosaic_pool(groups, 64, 10)
    np.testing.assert_allclose(nat["labels4"], pil["labels4"], atol=1e-6)
    np.testing.assert_array_equal(nat["mask4"], pil["mask4"])
    # pixels: cv2-style vs PIL bilinear differ slightly; mean must be tiny
    diff = np.abs(nat["rgb4"].astype(np.int16)
                  - pil["rgb4"].astype(np.int16))
    assert diff.mean() < 3.0, diff.mean()
