"""Exponential moving average of the model state as a pytree map.

Functional parity surface: reference ``ModelEMA``
(utils/torch_utils.py:269-303): decay ramps as
``d = decay * (1 - exp(-updates / 2000))``; the average covers the full
state_dict — parameters *and* BatchNorm running stats — so we EMA both
``params`` and ``batch_stats`` collections.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_init(params, batch_stats):
    return {"params": jax.tree_util.tree_map(jnp.asarray, params),
            "batch_stats": jax.tree_util.tree_map(jnp.asarray, batch_stats),
            "updates": jnp.zeros((), jnp.int32)}


def ema_update(ema, params, batch_stats, decay: float = 0.9999):
    updates = ema["updates"] + 1
    d = decay * (1.0 - jnp.exp(-updates.astype(jnp.float32) / 2000.0))

    def avg(e, p):
        return e * d + (1.0 - d) * p.astype(e.dtype)

    return {
        "params": jax.tree_util.tree_map(avg, ema["params"], params),
        "batch_stats": jax.tree_util.tree_map(avg, ema["batch_stats"],
                                              batch_stats),
        "updates": updates,
    }
