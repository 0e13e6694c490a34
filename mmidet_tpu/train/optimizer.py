"""Optimizer: SGD(nesterov) with YOLOv5's three parameter groups, built as
optax transforms over a labeled param pytree.

Functional parity surface: reference ``train.py:566-597`` —
  * group 'bn'     — BatchNorm scales, no weight decay
  * group 'weight' — conv/linear kernels, weight decay (scaled by
    ``total_batch * accumulate / nbs``, train.py:569)
  * group 'bias'   — all biases, no decay, warmup lr starts at
    ``warmup_bias_lr``

Reference quirk (kept available, not default): parameters that are neither a
module ``.weight`` nor ``.bias`` — the fusion transformers' ``pos_emb`` and
the CEM's ``sobel_factor`` — are silently left out of every optimizer group
(train.py:572-579 iterates named_modules and only collects .weight/.bias), so
the reference never trains them.  ``groups='reference'`` reproduces that
(label 'frozen', lr 0); the default ``groups='fixed'`` trains them in the
no-decay group.
"""

from __future__ import annotations

import flax
import optax

from mmidet_tpu.train.schedule import (ScheduleConfig, lr_schedule,
                                       momentum_schedule)

_UNGROUPED = ("pos_emb", "sobel_factor")  # ref leaves these untrained


def label_params(params, groups: str = "fixed", freeze: tuple = ()):
    """Label each leaf 'bn' | 'weight' | 'bias' | 'frozen'.

    ``freeze``: substrings matched against the '/'-joined flax param path;
    matching leaves get zero updates (the reference's ``freeze`` list of
    ``model.N.`` name prefixes, train.py:556-563)."""
    flat = flax.traverse_util.flatten_dict(params)
    labels = {}
    for path in flat:
        leaf = path[-1]
        parent = path[-2] if len(path) > 1 else ""
        joined = "/".join(path)
        if freeze and any(f in joined for f in freeze):
            labels[path] = "frozen"
        elif leaf in _UNGROUPED:
            labels[path] = "frozen" if groups == "reference" else "bn"
        elif leaf == "bias":
            labels[path] = "bias"
        elif leaf == "scale":
            # only nn.BatchNorm2d weights are decay-exempt in the
            # reference (train.py:575-578); LayerNorm weights (the fusion
            # transformers' ln_* gammas) land in the DECAYED group pg1
            labels[path] = "bn" if parent.startswith("BatchNorm") \
                else "weight"
        elif leaf in ("kernel", "embedding"):
            labels[path] = "weight"
        else:
            labels[path] = "bn"    # any other leaf: no decay, standard lr
    return flax.traverse_util.unflatten_dict(labels)


def _sgd(lr_fn, mom_fn, weight_decay: float = 0.0):
    """torch-style SGD: grad += wd * w, then nesterov momentum buffer,
    update = -lr * (grad + mu * buf)."""
    tx = [optax.add_decayed_weights(weight_decay)] if weight_decay else []
    tx.append(optax.inject_hyperparams(
        lambda momentum, learning_rate: optax.sgd(
            learning_rate, momentum=momentum, nesterov=True))(
                momentum=mom_fn, learning_rate=lr_fn))
    return optax.chain(*tx)


def _opt_step_sched(sched: ScheduleConfig, accumulate: int):
    """Rescale a micro-step ScheduleConfig to OPTIMIZER-step units.

    The schedules live inside optax.MultiSteps, whose inner count only
    advances on emit steps (once per ``accumulate`` micro-batches) — but
    steps_per_epoch/warmup_floor are given in dataloader iterations (the
    reference counts warmup in ni, train.py:758,765). Without this the
    warmup lasts accumulate-times too long and the cosine never
    finishes."""
    import dataclasses
    if accumulate <= 1:
        return sched
    return dataclasses.replace(
        sched,
        steps_per_epoch=max(round(sched.steps_per_epoch / accumulate), 1),
        warmup_floor=max(round(sched.warmup_floor / accumulate), 1))


def build_optimizer(params, sched: ScheduleConfig, weight_decay: float,
                    total_batch_size: int, nbs: int = 64,
                    groups: str = "fixed", accumulate: int | None = None,
                    freeze: tuple = ()):
    """Returns (optax transform, labels). ``weight_decay`` is scaled exactly
    as the reference does (train.py:567-569)."""
    if accumulate is None:
        accumulate = max(round(nbs / total_batch_size), 1)
    wd = weight_decay * total_batch_size * accumulate / nbs
    labels = label_params(params, groups, freeze)
    s = _opt_step_sched(sched, accumulate)
    tx = optax.multi_transform({
        "bn": _sgd(lr_schedule(s), momentum_schedule(s)),
        "weight": _sgd(lr_schedule(s), momentum_schedule(s), wd),
        "bias": _sgd(lr_schedule(s, warmup_start=s.warmup_bias_lr),
                     momentum_schedule(s)),
        "frozen": optax.set_to_zero(),
    }, labels)
    if accumulate > 1:
        # use_grad_mean=False: the reference accumulates gradient SUMS via
        # repeated loss.backward() (train.py:796); the mean would make
        # every update accumulate-times smaller
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate,
                              use_grad_mean=False)
    return tx, labels


def build_adam(params, sched: ScheduleConfig, weight_decay: float,
               total_batch_size: int, nbs: int = 64, groups: str = "fixed",
               freeze: tuple = ()):
    """The reference's --adam path (train.py:581-582): Adam with beta1 =
    momentum; same group structure."""
    accumulate = max(round(nbs / total_batch_size), 1)
    wd = weight_decay * total_batch_size * accumulate / nbs
    labels = label_params(params, groups, freeze)
    s = _opt_step_sched(sched, accumulate)

    def adam(lr_fn, decay=0.0):
        tx = [optax.add_decayed_weights(decay)] if decay else []
        tx.append(optax.inject_hyperparams(
            lambda learning_rate: optax.adam(
                learning_rate, b1=sched.momentum, b2=0.999))(
                    learning_rate=lr_fn))
        return optax.chain(*tx)

    tx = optax.multi_transform({
        "bn": adam(lr_schedule(s)),
        "weight": adam(lr_schedule(s), wd),
        "bias": adam(lr_schedule(s, warmup_start=s.warmup_bias_lr)),
        "frozen": optax.set_to_zero(),
    }, labels)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate,
                              use_grad_mean=False)
    return tx, labels
