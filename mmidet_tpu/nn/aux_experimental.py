"""Auxiliary experimental modules from the reference that no shipped config
wires up (common.py:1372-1528: VAE, RecContrastiveLoss, modality feature
extractors, DecoderNetwork, negative sampling, reconstruction/VAE losses).
The reference instantiates RecContrastiveLoss once (yolo_test.py:94) and
never calls it; everything else is dormant.  Carried here TPU-native (NHWC
flax) so the full component inventory is available to experiments.

Reference quirks kept deliberately:
  * ``rec_contrastive_loss`` ignores the negative branch — the reference
    comments it out and penalizes ``relu(d(anchor, positive) + margin)``
    (common.py:1437-1442).
  * ``vae_loss`` applies binary_cross_entropy_with_logits to an input the
    decoder already passed through sigmoid (common.py:1520-1526).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


class VAE(nn.Module):
    """Conv VAE: 2x stride-2 conv encoder -> (mu, logvar) -> 2x stride-2
    transposed-conv decoder with sigmoid.  Ref: common.py:1372-1419."""
    input_channels: int = 3
    latent_dim: int = 16
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, rng=None):
        b, h, w, _ = x.shape
        y = nn.relu(nn.Conv(32, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name="enc1")(x))
        y = nn.relu(nn.Conv(64, (3, 3), strides=2, padding=1,
                            dtype=self.dtype, name="enc2")(y))
        flat = y.reshape(b, -1)
        mu = nn.Dense(self.latent_dim, dtype=self.dtype, name="fc_mu")(flat)
        logvar = nn.Dense(self.latent_dim, dtype=self.dtype,
                          name="fc_logvar")(flat)
        if rng is None:
            rng = self.make_rng("vae")
        z = mu + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mu.shape, mu.dtype)
        d = nn.Dense((h // 4) * (w // 4) * 64, dtype=self.dtype,
                     name="dec_fc")(z)
        d = d.reshape(b, h // 4, w // 4, 64)
        # torch ConvTranspose2d(k=3, s=2, p=1, output_padding=1) is an
        # exact 2x upsample = flax ConvTranspose stride 2 'SAME'
        d = nn.relu(nn.ConvTranspose(32, (3, 3), strides=(2, 2),
                                     padding="SAME", dtype=self.dtype,
                                     name="dec1")(d))
        d = nn.ConvTranspose(self.input_channels, (3, 3), strides=(2, 2),
                             padding="SAME", dtype=self.dtype,
                             name="dec2")(d)
        return jax.nn.sigmoid(d), mu, logvar


def rec_contrastive_loss(anchor, positive, negative=None,
                         margin: float = 1.0):
    """relu(||anchor - positive||_2 + margin).mean() — the reference's
    effective formula; the negative branch is dead code there
    (RecContrastiveLoss, common.py:1422-1442)."""
    del negative
    d = jnp.sqrt(jnp.sum(jnp.square(anchor - positive), axis=-1) + 1e-12)
    return jnp.mean(jax.nn.relu(d + margin))


class ModalitySpecificFeatureExtractor(nn.Module):
    """conv3x3 -> 64ch + BN + ReLU. Ref: common.py:1448-1459."""
    features: int = 64
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype)(x)
        y = nn.BatchNorm(use_running_average=not train,
                         dtype=self.dtype)(y)
        return nn.relu(y)


class ModalityAgnosticFeatureExtractor(ModalitySpecificFeatureExtractor):
    """Same stack at 32ch. Ref: common.py:1464-1477."""
    features: int = 32


class DecoderNetwork(nn.Module):
    """Three stride-1 transposed convs (=3x3 convs at s=1) 64->32->out,
    ReLU throughout. Ref: common.py:1482-1503."""
    out_channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for c in (64, 32, self.out_channels):
            x = nn.relu(nn.ConvTranspose(c, (3, 3), strides=(1, 1),
                                         padding="SAME",
                                         dtype=self.dtype)(x))
        return x


def get_negative_features(batch_features, rng=None, indices=None):
    """Shuffle the batch to build negatives. Ref: common.py:1508-1517."""
    if indices is None:
        indices = jax.random.permutation(
            rng if rng is not None else jax.random.PRNGKey(0),
            batch_features.shape[0])
    return batch_features[indices]


def reconstruction_loss(reconstructed, original):
    """MSE. Ref: common.py:1519-1520."""
    return jnp.mean(jnp.square(reconstructed - original))


def vae_loss(recon_x, x, mu, logvar):
    """sum-BCE-with-logits + KLD.  Keeps the reference's quirk of treating
    the already-sigmoided reconstruction as logits (common.py:1520-1526)."""
    bce = jnp.sum(jax.nn.relu(recon_x) - recon_x * x +
                  jnp.log1p(jnp.exp(-jnp.abs(recon_x))))
    kld = -0.5 * jnp.sum(1 + logvar - jnp.square(mu) - jnp.exp(logvar))
    return bce + kld
