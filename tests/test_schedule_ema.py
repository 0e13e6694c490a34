"""Schedule + EMA parity against the reference formulas (pure math)."""

import math

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mmidet_tpu.train.ema import ema_init, ema_update
from mmidet_tpu.train.schedule import (ScheduleConfig, lr_schedule,
                                       momentum_schedule)


def test_one_cycle_cosine_staircase():
    cfg = ScheduleConfig(lr0=0.01, lrf=0.2, epochs=10, steps_per_epoch=5,
                         warmup_epochs=0.0)
    fn = lr_schedule(cfg)
    # after warmup floor (1000 steps > total here, so compare the target
    # the warmup ramps toward): epoch-staircase cosine
    def lf(epoch):
        return (1 + math.cos(epoch * math.pi / 10)) / 2 * (1 - 0.2) + 0.2
    # at step >= warmup, lr == lr0 * lf(epoch)
    big = ScheduleConfig(lr0=0.01, lrf=0.2, epochs=10, steps_per_epoch=500,
                         warmup_epochs=0.0)
    fnb = lr_schedule(big)
    for epoch in (2, 5, 9):
        step = epoch * 500 + 100  # > warmup floor of 1000 for epoch >= 2
        np.testing.assert_allclose(float(fnb(step)), 0.01 * lf(epoch),
                                   rtol=1e-6)


def test_warmup_interpolation():
    cfg = ScheduleConfig(lr0=0.01, lrf=0.2, epochs=100, steps_per_epoch=100,
                         warmup_epochs=3.0)
    assert cfg.warmup_steps == 1000  # max(3*100, 1000)
    lr_w = lr_schedule(cfg)
    lr_b = lr_schedule(cfg, warmup_start=0.1)  # bias group
    mom = momentum_schedule(cfg)
    np.testing.assert_allclose(float(lr_w(0)), 0.0, atol=1e-9)
    np.testing.assert_allclose(float(lr_b(0)), 0.1, rtol=1e-6)
    np.testing.assert_allclose(float(mom(0)), 0.8, rtol=1e-6)
    np.testing.assert_allclose(float(mom(1000)), 0.937, rtol=1e-6)
    # halfway point interpolates toward lr0 * lf(epoch 5)
    v = float(lr_w(500))
    assert 0.0 < v < 0.01


def test_ema_decay_ramp():
    """d = decay * (1 - exp(-updates/2000)) (ref torch_utils.py:269)."""
    params = {"w": jnp.ones((2,))}
    stats = {"m": jnp.zeros((2,))}
    ema = ema_init(params, stats)
    new_p = {"w": jnp.zeros((2,))}
    ema = ema_update(ema, new_p, stats, decay=0.9999)
    d1 = 0.9999 * (1 - math.exp(-1 / 2000))
    np.testing.assert_allclose(np.asarray(ema["params"]["w"]),
                               d1 * 1.0 + (1 - d1) * 0.0, rtol=1e-3)
    assert int(ema["updates"]) == 1
