"""Inference sources + checkpoint round-trip tests."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp


def test_load_images(tmp_path):
    from PIL import Image
    from mmidet_tpu.data.sources import LoadImages
    for i in range(3):
        Image.fromarray(np.full((48, 64, 3), i * 40, np.uint8)).save(
            tmp_path / f"im{i}.png")
    src = LoadImages(str(tmp_path), img_size=32)
    items = list(src)
    assert len(items) == 3
    path, lb, im0, (r, pad) = items[0]
    assert lb.shape == (32, 32, 3)
    assert im0.shape == (48, 64, 3)
    assert 0 < r <= 1


def test_checkpoint_roundtrip(tmp_path):
    from mmidet_tpu.losses.detection import LossHyp
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.zoo import two_stream_spec
    from mmidet_tpu.train.checkpoint import (restore_checkpoint,
                                             save_checkpoint,
                                             strip_for_deploy)
    from mmidet_tpu.train.optimizer import build_optimizer
    from mmidet_tpu.train.schedule import ScheduleConfig
    from mmidet_tpu.train.step import init_state, make_train_step

    spec = two_stream_spec("s", "add", nc=2)
    model = TwoStreamDetector(spec=spec, aux_mode="off")
    small = jnp.zeros((1, 32, 32, 3))
    v = model.init({"params": jax.random.PRNGKey(0)}, small, small,
                   train=False)
    sched = ScheduleConfig(epochs=1, steps_per_epoch=1)
    tx, _ = build_optimizer(v["params"], sched, 5e-4, total_batch_size=2)
    state = init_state(model, tx, jax.random.PRNGKey(0), small, small)

    anchors = jnp.asarray(
        np.asarray(spec.anchors, np.float32).reshape(3, 3, 2)
        / np.asarray(spec.strides, np.float32)[:, None, None])
    step = jax.jit(make_train_step(model, tx, anchors, LossHyp()))
    targets = jnp.zeros((2, 4, 5))
    targets = targets.at[:, 0].set(jnp.asarray([1, 0.5, 0.5, 0.2, 0.2]))
    mask = jnp.zeros((2, 4), bool).at[:, 0].set(True)
    batch = {"rgb": jnp.ones((2, 32, 32, 3)) * 0.4,
             "ir": jnp.ones((2, 32, 32, 3)) * 0.6,
             "targets": targets, "mask": mask}
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    ckpt = str(tmp_path / "ckpt")
    save_checkpoint(ckpt, state, 0, metadata={"epoch": 0,
                                              "best_fitness": 0.25})
    template = init_state(model, tx, jax.random.PRNGKey(42), small, small)
    restored, step_no, meta = restore_checkpoint(ckpt, template)
    assert step_no == 0
    assert meta["best_fitness"] == 0.25
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # EMA restored too
    for a, b in zip(jax.tree_util.tree_leaves(state.ema["params"]),
                    jax.tree_util.tree_leaves(restored.ema["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    deploy = strip_for_deploy(restored)
    out = model.apply({"params": deploy["params"],
                       "batch_stats": deploy["batch_stats"]},
                      batch["rgb"], batch["ir"], train=False)
    assert np.isfinite(np.asarray(out["pred"])).all()


def test_segment_labels_to_boxes(tmp_path):
    """Polygon (segment) label rows convert to min/max boxes, as the
    reference cache_labels does via segments2boxes (datasets.py:885-891)."""
    import numpy as np
    from mmidet_tpu.data.datasets import load_labels
    p = tmp_path / "img.txt"
    p.write_text("0 0.2 0.2 0.8 0.2 0.8 0.6 0.2 0.6\n"   # quad -> box
                 "1 0.1 0.1 0.3 0.5\n")                   # plain row kept
    lab = load_labels(str(p), nc=2)
    assert lab.shape == (2, 5)
    np.testing.assert_allclose(lab[0], [0, 0.5, 0.4, 0.6, 0.4], atol=1e-6)
    np.testing.assert_allclose(lab[1], [1, 0.1, 0.1, 0.3, 0.5], atol=1e-6)


def test_load_webcam_fake_capture(monkeypatch):
    """LoadWebcam drives cv2.VideoCapture with the reference's semantics:
    local-cam frames are mirrored (cv2.flip), IP pipes retrieve every 30th
    grab; output is letterboxed RGB."""
    import sys
    import types

    import numpy as np

    frame = np.zeros((48, 64, 3), np.uint8)
    frame[:, :32] = (10, 20, 30)  # left half BGR marker

    class FakeCap:
        def __init__(self, pipe):
            self.pipe = pipe
            self.grabs = 0

        def set(self, *a):
            pass

        def read(self):
            return True, frame.copy()

        def grab(self):
            self.grabs += 1

        def retrieve(self):
            return True, frame.copy()

        def release(self):
            pass

    fake_cv2 = types.ModuleType("cv2")
    fake_cv2.VideoCapture = FakeCap
    fake_cv2.CAP_PROP_BUFFERSIZE = 38
    fake_cv2.flip = lambda img, code: img[:, ::-1] if code == 1 else img
    monkeypatch.setitem(sys.modules, "cv2", fake_cv2)

    from mmidet_tpu.data.sources import LoadWebcam

    cam = LoadWebcam("0", img_size=64)
    path, lb, img0, (ratio, pad) = next(iter(cam))
    assert path == "webcam0" and lb.shape == (64, 64, 3)
    # mirrored + BGR->RGB: the marked half lands on the RIGHT, channel
    # order reversed (30, 20, 10)
    assert tuple(img0[0, -1]) == (30, 20, 10)
    assert tuple(img0[0, 0]) == (0, 0, 0)
    cam.close()

    ip = LoadWebcam("rtsp://x", img_size=64)
    _, lb, img0, _ = next(iter(ip))
    assert ip.cap.grabs == 30  # stale-frame skip: retrieve on the 30th grab
    assert tuple(img0[0, 0]) == (30, 20, 10)  # unmirrored for IP pipes
    ip.close()
