import numpy as np
import jax.numpy as jnp
import pytest

from mmidet_tpu.ops import (
    xyxy2xywh, xywh2xyxy, xywhn2xyxy, bbox_iou, box_iou, wh_iou,
    scale_coords, clip_coords,
)


def test_xyxy_xywh_roundtrip():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 300, (32, 2))
    wh = rng.uniform(1, 100, (32, 2))
    boxes = np.concatenate([xy, xy + wh], axis=1)
    out = np.asarray(xywh2xyxy(xyxy2xywh(jnp.asarray(boxes))))
    np.testing.assert_allclose(out, boxes, rtol=1e-5, atol=1e-4)


def test_xywhn2xyxy():
    x = jnp.asarray([[0.5, 0.5, 0.5, 0.5]])
    out = np.asarray(xywhn2xyxy(x, w=640, h=640))
    np.testing.assert_allclose(out, [[160.0, 160.0, 480.0, 480.0]], atol=1e-4)


def test_iou_identity_and_disjoint():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b = jnp.asarray([20.0, 20.0, 30.0, 30.0])
    assert float(bbox_iou(a, a)) == pytest.approx(1.0, abs=1e-5)
    assert float(bbox_iou(a, b)) == pytest.approx(0.0, abs=1e-6)


def test_iou_half_overlap():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b = jnp.asarray([5.0, 0.0, 15.0, 10.0])
    # inter 50, union 150
    assert float(bbox_iou(a, b)) == pytest.approx(1 / 3, abs=1e-4)


def test_ciou_less_than_iou_when_offset():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    b = jnp.asarray([5.0, 5.0, 15.0, 15.0])
    iou = float(bbox_iou(a, b))
    ciou = float(bbox_iou(a, b, CIoU=True))
    assert ciou < iou
    # same aspect ratio -> v = 0, so CIoU = IoU - rho2/c2
    # centers (5,5),(10,10): rho2 = 50/..., c = enclosing 15x15 diag^2=450
    assert ciou == pytest.approx(iou - 50 / 450, abs=1e-3)


def test_ciou_xywh_matches_xyxy():
    a_xywh = jnp.asarray([5.0, 5.0, 10.0, 10.0])
    b_xywh = jnp.asarray([10.0, 10.0, 10.0, 10.0])
    a_xyxy = xywh2xyxy(a_xywh[None])[0]
    b_xyxy = xywh2xyxy(b_xywh[None])[0]
    v1 = float(bbox_iou(a_xywh, b_xywh, xywh=True, CIoU=True))
    v2 = float(bbox_iou(a_xyxy, b_xyxy, CIoU=True))
    assert v1 == pytest.approx(v2, abs=1e-5)


def test_box_iou_pairwise_shape_and_values():
    b1 = jnp.asarray([[0, 0, 10, 10], [0, 0, 5, 5]], jnp.float32)
    b2 = jnp.asarray([[0, 0, 10, 10], [100, 100, 110, 110], [0, 0, 5, 5]],
                     jnp.float32)
    m = np.asarray(box_iou(b1, b2))
    assert m.shape == (2, 3)
    assert m[0, 0] == pytest.approx(1.0, abs=1e-5)
    assert m[0, 1] == pytest.approx(0.0, abs=1e-6)
    assert m[1, 2] == pytest.approx(1.0, abs=1e-5)
    assert m[0, 2] == pytest.approx(25 / 100, abs=1e-5)


def test_wh_iou():
    wh1 = jnp.asarray([[10.0, 10.0]])
    wh2 = jnp.asarray([[5.0, 5.0], [10.0, 10.0]])
    m = np.asarray(wh_iou(wh1, wh2))
    assert m[0, 0] == pytest.approx(0.25, abs=1e-5)
    assert m[0, 1] == pytest.approx(1.0, abs=1e-5)


def test_scale_coords_letterbox_roundtrip():
    # original image 480x640 letterboxed to 640x640 -> gain 1.0? no: 640/480=1.33, 640/640=1 -> gain=1
    # use 320x416 -> 640x640
    img0 = (320, 416)  # h, w
    gain = min(640 / img0[0], 640 / img0[1])  # 1.538
    pad = ((640 - img0[1] * gain) / 2, (640 - img0[0] * gain) / 2)
    orig = jnp.asarray([[10.0, 20.0, 100.0, 200.0]])
    lb = orig * gain + jnp.asarray([pad[0], pad[1], pad[0], pad[1]])
    back = np.asarray(scale_coords((640, 640), lb, img0))
    np.testing.assert_allclose(back, np.asarray(orig), atol=1e-3)


def test_clip_coords():
    b = jnp.asarray([[-5.0, -5.0, 700.0, 700.0]])
    out = np.asarray(clip_coords(b, (480, 640)))
    np.testing.assert_allclose(out, [[0, 0, 640, 480]], atol=1e-6)
