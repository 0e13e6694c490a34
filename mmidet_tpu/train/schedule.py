"""LR / momentum schedules: YOLOv5 warmup + one-cycle cosine, as pure
per-step functions (consumed by optax ``inject_hyperparams``).

Functional parity surface: reference ``one_cycle`` (utils/general.py),
LambdaLR wiring (train.py:593-597) and the in-loop warmup interpolation
(train.py:765-773):

  * ``lf(epoch) = (1 + cos(pi * epoch / epochs)) / 2 * (1 - lrf) + lrf``
  * warmup over ``nw = max(round(warmup_epochs * nb), 1000)`` steps: lr
    linearly from 0 (bias group: ``warmup_bias_lr``) to ``lr0 * lf(epoch)``,
    momentum from ``warmup_momentum`` to ``momentum``.

The reference steps the cosine once per epoch; we expose ``steps_per_epoch``
so the per-step function reproduces the same staircase exactly.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ScheduleConfig:
    lr0: float = 0.01
    lrf: float = 0.2
    momentum: float = 0.937
    warmup_epochs: float = 3.0
    warmup_momentum: float = 0.8
    warmup_bias_lr: float = 0.1
    epochs: int = 100
    steps_per_epoch: int = 100
    linear_lr: bool = False
    # the reference floors warmup at 1000 iterations (train.py:758) — on
    # small datasets that can swallow the whole run; configurable here
    warmup_floor: int = 1000

    @property
    def warmup_steps(self) -> int:
        return max(round(self.warmup_epochs * self.steps_per_epoch),
                   self.warmup_floor, 1)


def _lf(cfg: ScheduleConfig, epoch):
    if cfg.linear_lr:
        return (1 - epoch / (cfg.epochs - 1)) * (1.0 - cfg.lrf) + cfg.lrf
    return (1 + jnp.cos(epoch * jnp.pi / cfg.epochs)) / 2 * \
        (1 - cfg.lrf) + cfg.lrf


def lr_schedule(cfg: ScheduleConfig, warmup_start: float = 0.0):
    """Per-step lr: warmup from ``warmup_start`` into the epoch-staircase
    cosine."""
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        epoch = jnp.floor(step / cfg.steps_per_epoch)
        target = cfg.lr0 * _lf(cfg, epoch)
        frac = jnp.clip(step / cfg.warmup_steps, 0.0, 1.0)
        warm = warmup_start + frac * (target - warmup_start)
        return jnp.where(step < cfg.warmup_steps, warm, target)
    return fn


def momentum_schedule(cfg: ScheduleConfig):
    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip(step / cfg.warmup_steps, 0.0, 1.0)
        return cfg.warmup_momentum + frac * (cfg.momentum -
                                             cfg.warmup_momentum)
    return fn
