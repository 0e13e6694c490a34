"""Parity of the flax conv stack against independently-constructed torch
modules with copied weights (torch CPU is a test-only dependency)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp
from torch import nn as tnn

from mmidet_tpu.nn.layers import C3, SPP, SPPF, ConvBnAct, Focus, contract, expand


def _to_nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def _from_nchw(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _torch_conv_bn_silu(cin, cout, k, s, kernel_hwio, seed=3):
    """torch Conv2d(bias=False)+BN(eps1e-3)+SiLU with given HWIO kernel and
    randomized BN stats."""
    conv = tnn.Conv2d(cin, cout, k, s, k // 2, bias=False)
    conv.weight.data = torch.from_numpy(
        np.transpose(kernel_hwio, (3, 2, 0, 1)).copy())  # HWIO->OIHW
    bn = tnn.BatchNorm2d(cout, eps=1e-3)
    rng = np.random.default_rng(seed)
    bn.weight.data = torch.from_numpy(rng.uniform(0.5, 1.5, cout).astype(np.float32))
    bn.bias.data = torch.from_numpy(rng.standard_normal(cout).astype(np.float32))
    bn.running_mean.data = torch.from_numpy(rng.standard_normal(cout).astype(np.float32))
    bn.running_var.data = torch.from_numpy(rng.uniform(0.5, 2.0, cout).astype(np.float32))
    bn.eval()
    return conv, bn


def test_conv_bn_silu_matches_torch():
    x = _rand((2, 16, 16, 8), 0)
    m = ConvBnAct(12, 3, 2)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    kern = np.asarray(variables["params"]["conv"]["kernel"])
    conv, bn = _torch_conv_bn_silu(8, 12, 3, 2, kern)
    # copy BN stats into flax variables
    variables = jax.tree_util.tree_map(lambda v: v, variables)
    p = {"params": {"conv": {"kernel": jnp.asarray(kern)},
                    "bn": {"scale": jnp.asarray(bn.weight.detach().numpy()),
                           "bias": jnp.asarray(bn.bias.detach().numpy())}},
         "batch_stats": {"bn": {"mean": jnp.asarray(bn.running_mean.numpy()),
                                "var": jnp.asarray(bn.running_var.numpy())}}}
    got = np.asarray(m.apply(p, jnp.asarray(x)))
    want = _from_nchw(tnn.SiLU()(bn(conv(_to_nchw(x)))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_focus_space_to_depth_channel_order():
    """Focus must concat [::2,::2],[1::2,::2],[::2,1::2],[1::2,1::2] on the
    channel axis (reference common.py:708) so converted weights line up."""
    x = _rand((1, 4, 4, 2), 1)
    t = _to_nchw(x)
    want = torch.cat([t[..., ::2, ::2], t[..., 1::2, ::2],
                      t[..., ::2, 1::2], t[..., 1::2, 1::2]], 1)
    got = np.concatenate([x[:, ::2, ::2, :], x[:, 1::2, ::2, :],
                          x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1)
    np.testing.assert_array_equal(got, _from_nchw(want))


def test_spp_max_pool_same_matches_torch():
    x = _rand((1, 9, 9, 4), 2)
    for k in (5, 9, 13):
        tp = tnn.MaxPool2d(kernel_size=k, stride=1, padding=k // 2)
        want = _from_nchw(tp(_to_nchw(x)))
        from mmidet_tpu.nn.layers import _max_pool_same
        got = np.asarray(_max_pool_same(jnp.asarray(x), k))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_contract_expand_roundtrip_and_torch_order():
    x = _rand((1, 4, 4, 8), 3)
    t = _to_nchw(x)
    n, c, h, w = t.shape
    s = 2
    tc = t.view(n, c, h // s, s, w // s, s).permute(0, 3, 5, 1, 2, 4).contiguous()
    tc = tc.view(n, c * s * s, h // s, w // s)
    np.testing.assert_array_equal(np.asarray(contract(jnp.asarray(x), 2)),
                                  _from_nchw(tc))
    te = tc.view(n, s, s, c, h // s, w // s).permute(0, 3, 4, 1, 5, 2).contiguous()
    te = te.view(n, c, h, w)
    np.testing.assert_array_equal(
        np.asarray(expand(contract(jnp.asarray(x), 2), 2)), _from_nchw(te))


@pytest.mark.parametrize("cls,kw", [
    (C3, dict(features=16, n=2)),
    (SPP, dict(features=16)),
    (SPPF, dict(features=16)),
])
def test_blocks_shapes(cls, kw):
    x = jnp.asarray(_rand((2, 8, 8, 16), 4))
    m = cls(**kw)
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (2, 8, 8, 16)
