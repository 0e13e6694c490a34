"""Pallas NMS kernel correctness vs the XLA greedy implementation
(interpret mode on CPU; compiled-mode covered by the TPU bench script)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.ops.nms import _nms_single
from mmidet_tpu.ops.nms_pallas import nms_greedy_pallas


def test_pallas_nms_matches_xla_greedy():
    rng = np.random.default_rng(0)
    B, K = 2, 256
    boxes = rng.uniform(0, 100, (B, K, 4)).astype(np.float32)
    boxes[..., 2:] = boxes[..., :2] + rng.uniform(5, 40, (B, K, 2))
    scores = rng.uniform(0, 1, (B, K)).astype(np.float32)
    scores[scores < 0.3] = -np.inf
    ki, kv = nms_greedy_pallas(jnp.asarray(boxes), jnp.asarray(scores),
                               iou_thres=0.45, max_det=50, interpret=True)
    for b in range(B):
        ri, rv = _nms_single(jnp.asarray(boxes[b]), jnp.asarray(scores[b]),
                             jnp.zeros(K), 0.45, 50, 4096.0, True)
        np.testing.assert_array_equal(np.asarray(kv[b]), np.asarray(rv))
        np.testing.assert_array_equal(
            np.asarray(ki[b])[np.asarray(kv[b])],
            np.asarray(ri)[np.asarray(rv)])


def test_pallas_nms_empty_pool():
    boxes = jnp.zeros((1, 128, 4))
    scores = jnp.full((1, 128), -jnp.inf)
    ki, kv = nms_greedy_pallas(boxes, scores, max_det=10, interpret=True)
    assert not np.asarray(kv).any()
