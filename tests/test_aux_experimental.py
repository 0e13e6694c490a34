"""Dormant-in-reference aux modules (common.py:1372-1528): shapes + loss
formulas, incl. torch formula cross-checks for the two losses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mmidet_tpu.nn.aux_experimental import (
    VAE, DecoderNetwork, ModalityAgnosticFeatureExtractor,
    ModalitySpecificFeatureExtractor, get_negative_features,
    rec_contrastive_loss, reconstruction_loss, vae_loss)


def test_vae_roundtrip_shapes():
    vae = VAE(input_channels=3, latent_dim=16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    v = vae.init({"params": jax.random.PRNGKey(1),
                  "vae": jax.random.PRNGKey(2)}, x)
    recon, mu, logvar = vae.apply(v, x, rngs={"vae": jax.random.PRNGKey(3)})
    assert recon.shape == x.shape
    assert mu.shape == logvar.shape == (2, 16)
    assert float(recon.min()) >= 0 and float(recon.max()) <= 1
    loss = vae_loss(recon, x, mu, logvar)
    assert np.isfinite(float(loss))


def test_extractors_and_decoder_shapes():
    x = jnp.zeros((2, 16, 16, 8))
    for cls, c in [(ModalitySpecificFeatureExtractor, 64),
                   (ModalityAgnosticFeatureExtractor, 32)]:
        m = cls()
        y = m.apply(m.init({"params": jax.random.PRNGKey(0)}, x), x)
        assert y.shape == (2, 16, 16, c)
    d = DecoderNetwork(out_channels=8)
    y = d.apply(d.init({"params": jax.random.PRNGKey(0)}, x), x)
    assert y.shape == (2, 16, 16, 8)


def test_negative_features_is_permutation():
    x = jnp.arange(12.0).reshape(6, 2)
    n = get_negative_features(x, rng=jax.random.PRNGKey(0))
    assert sorted(np.asarray(n[:, 0]).tolist()) == \
        sorted(np.asarray(x[:, 0]).tolist())


def test_loss_formulas_match_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F
    rng = np.random.default_rng(0)
    a = rng.normal(size=(4, 8)).astype(np.float32)
    p = rng.normal(size=(4, 8)).astype(np.float32)
    ours = float(rec_contrastive_loss(jnp.asarray(a), jnp.asarray(p)))
    ta, tp = torch.tensor(a), torch.tensor(p)
    ref = torch.relu(F.pairwise_distance(ta, tp, 2) + 1.0).mean()
    np.testing.assert_allclose(ours, float(ref), rtol=1e-5)

    r = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
    x = rng.uniform(size=(2, 4, 4, 3)).astype(np.float32)
    mu = rng.normal(size=(2, 16)).astype(np.float32)
    lv = rng.normal(size=(2, 16)).astype(np.float32)
    ours = float(vae_loss(jnp.asarray(r), jnp.asarray(x), jnp.asarray(mu),
                          jnp.asarray(lv)))
    ref = (F.binary_cross_entropy_with_logits(
        torch.tensor(r), torch.tensor(x), reduction="sum")
        - 0.5 * torch.sum(1 + torch.tensor(lv) - torch.tensor(mu) ** 2
                          - torch.tensor(lv).exp()))
    np.testing.assert_allclose(ours, float(ref), rtol=1e-4)

    np.testing.assert_allclose(
        float(reconstruction_loss(jnp.asarray(r), jnp.asarray(x))),
        float(torch.nn.MSELoss()(torch.tensor(r), torch.tensor(x))),
        rtol=1e-5)
