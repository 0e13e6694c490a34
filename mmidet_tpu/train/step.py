"""The single jitted train step: forward (with aux fusion losses) +
detection loss + grad + SGD update + EMA, one XLA program, shardable over a
device mesh.

This replaces the reference's hot loop body (train.py:737-804): autocast
forward, ComputeLoss, GradScaler backward, optimizer step, EMA update —
there is no loss scaling on TPU (bf16 has fp32 range) and no DDP allreduce
(gradient psum is implicit under pjit when the batch is sharded).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from mmidet_tpu.losses.detection import LossHyp, compute_loss
from mmidet_tpu.train.ema import ema_init, ema_update


@dataclasses.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Any
    step: jnp.ndarray

    def tree_flatten(self):
        return ((self.params, self.batch_stats, self.opt_state, self.ema,
                 self.step), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.batch_stats, s.opt_state, s.ema, s.step), None),
    lambda aux, c: TrainState(*c))


def init_state(model, tx, rng, sample_rgb, sample_ir=None, variables=None):
    """Initialise params/batch_stats/optimizer/EMA.  Pass ``variables`` to
    reuse an existing init (a full detector init traces the whole forward
    — doing it twice doubles startup cost)."""
    if variables is None:
        variables = model.init({"params": rng}, sample_rgb, sample_ir,
                               train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state,
                      ema=ema_init(params, batch_stats),
                      step=jnp.zeros((), jnp.int32))


def make_train_step(model, tx, anchors, hyp: LossHyp = LossHyp(),
                    ema_decay: float = 0.9999, two_stream: bool = True,
                    remat: str | None = None):
    """Build the jittable step fn: (state, batch, rng) -> (state, metrics).

    batch: dict with 'rgb' (B,H,W,3), 'ir' (B,H,W,3) [two-stream],
    'targets' (B,T,5) normalized [cls,x,y,w,h], 'mask' (B,T) bool.

    ``remat``: rematerialize forward activations in the backward pass to
    trade FLOPs for HBM (larger batches per chip).  'dots' keeps matmul/conv
    outputs and recomputes elementwise (the usual sweet spot); 'full'
    recomputes everything.
    """

    def forward(params, batch_stats, rgb, ir, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        args = (rgb, ir) if two_stream else (rgb,)
        out, mutated = model.apply(
            variables, *args, train=True, decode=False,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        return (tuple(out["train_outs"]), out["aux"].get("combine"),
                mutated["batch_stats"])

    if remat:
        policy = {
            "dots": jax.checkpoint_policies.checkpoint_dots,
            "full": None,  # save nothing (jax default policy)
        }[remat]
        forward = jax.checkpoint(
            forward, policy=policy,
            static_argnums=()) if policy else jax.checkpoint(forward)

    def loss_fn(params, batch_stats, batch, rng):
        train_outs, combine, new_bs = forward(
            params, batch_stats, batch["rgb"],
            batch["ir"] if two_stream else None, rng)
        total, metrics = compute_loss(
            train_outs, batch["targets"], batch["mask"], anchors,
            hyp=hyp, combine_loss=combine)
        return total, (metrics, new_bs)

    def train_step(state: TrainState, batch, rng):
        rng = jax.random.fold_in(rng, state.step)
        (_, (metrics, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.batch_stats, batch,
                                   rng)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        import optax
        new_params = optax.apply_updates(state.params, updates)
        # EMA advances only on OPTIMIZER steps (ref ModelEMA is updated
        # inside 'if ni % accumulate == 0', train.py:798-804): under
        # optax.MultiSteps, accumulation micro-steps emit zero updates and
        # mini_step resets to 0 exactly when the inner optimizer stepped
        mini = getattr(new_opt, "mini_step", None)
        new_ema = ema_update(state.ema, new_params, new_bs, ema_decay)
        if mini is not None:
            new_ema = jax.tree_util.tree_map(
                lambda a, b: jnp.where(mini == 0, a, b),
                new_ema, state.ema)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, ema=new_ema,
                               step=state.step + 1)
        return new_state, metrics

    return train_step
