"""Parametric activation modules.

Functional parity surface: reference ``utils/activations.py`` (98 LoC).
The stateless ones (SiLU / Hardswish / Mish — incl. the reference's
"export-friendly" and "memory-efficient" re-derivations, which are exact
functional duplicates) live in ``nn.layers.act_fn``; this module carries
the three PARAMETRIC activations the reference ships for activation-swap
experiments:

  * ``FReLU``      — funnel activation, max(x, BN(depthwise conv(x)))
                     (activations.py:48-56);
  * ``AconC``      — (p1-p2)·x·σ(β·(p1-p2)·x) + p2·x with learnable
                     per-channel p1/p2/β (activations.py:59-76);
  * ``MetaAconC``  — AconC with β generated from the channel-mean via a
                     two-layer 1×1 bottleneck, BN layers removed as in the
                     reference's batch-size-1 bug patch
                     (activations.py:79-98).

NHWC layout; per-channel parameter shapes are (C,) broadcast over (B,H,W,C)
— the TPU-native equivalent of the reference's (1,C,1,1) NCHW tensors.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class FReLU(nn.Module):
    """max(x, BN(depthwise 3x3 conv(x))) — ref activations.py:48-56."""
    features: int
    k: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        c = self.features
        y = nn.Conv(c, (self.k, self.k), padding=self.k // 2,
                    feature_group_count=c, use_bias=False,
                    name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.97,
                         epsilon=1e-3, name="bn")(y)
        return jnp.maximum(x, y)


class AconC(nn.Module):
    """dpx·σ(β·dpx) + p2·x, dpx = (p1-p2)·x — ref activations.py:59-76."""
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p1 = self.param("p1", nn.initializers.normal(1.0), (self.features,))
        p2 = self.param("p2", nn.initializers.normal(1.0), (self.features,))
        beta = self.param("beta", nn.initializers.ones, (self.features,))
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x


class MetaAconC(nn.Module):
    """AconC with β = σ(fc2(fc1(mean_hw(x)))) — ref activations.py:79-98
    (the post-bugfix variant: no BN in the β generator)."""
    features: int
    k: int = 1
    s: int = 1
    r: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c1 = self.features
        c2 = max(self.r, c1 // self.r)
        p1 = self.param("p1", nn.initializers.normal(1.0), (c1,))
        p2 = self.param("p2", nn.initializers.normal(1.0), (c1,))
        y = x.mean(axis=(1, 2), keepdims=True)  # (B,1,1,C)
        y = nn.Conv(c2, (self.k, self.k), strides=self.s, use_bias=True,
                    name="fc1")(y)
        y = nn.Conv(c1, (self.k, self.k), strides=self.s, use_bias=True,
                    name="fc2")(y)
        beta = jax.nn.sigmoid(y)
        dpx = (p1 - p2) * x
        return dpx * jax.nn.sigmoid(beta * dpx) + p2 * x
