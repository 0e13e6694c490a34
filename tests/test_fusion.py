"""Parity tests for the fusion-module math: FFT frequency split, separation
loss, self-attention, and the aux fusion losses — all against torch ops
constructed inline (matching the reference's formulas, common.py:25-139,
yolo_test.py:338-486)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")
import jax.numpy as jnp

from mmidet_tpu.losses.fusion import (contrastive_loss, entropy_256,
                                      fusing_loss, ssim_global)
from mmidet_tpu.nn.fusion import frequency_split, separation_loss


def _rand(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _torch_extract_frequency2(image_nchw):
    """Inline torch reimplementation of the reference frequency split
    (common.py:37-69) including the implicit complex->real .half() cast."""
    import torch.fft as fft
    f = fft.fftn(image_nchw, dim=(-2, -1))
    f_shift = fft.fftshift(f, dim=(-2, -1))
    _, _, rows, cols = image_nchw.shape
    crow, ccol = rows // 2, cols // 2
    thr = crow + ccol // 4
    hp = f_shift.clone()
    hp[:, :, crow - thr:crow + thr, ccol - thr:ccol + thr] = 0
    lp = f_shift.clone()
    lp[:, :, :crow - thr, :] = 0
    lp[:, :, crow + thr:, :] = 0
    lp[:, :, :, :ccol - thr] = 0
    lp[:, :, :, ccol + thr:] = 0
    high = fft.ifftn(fft.ifftshift(hp, dim=(-2, -1)), dim=(-2, -1))
    low = fft.ifftn(fft.ifftshift(lp, dim=(-2, -1)), dim=(-2, -1))
    return low.half().float(), high.half().float()  # .half() drops imag


@pytest.mark.parametrize("hw", [(8, 8), (16, 16)])
def test_frequency_split_matches_torch(hw):
    x = _rand((2, *hw, 3), 0)
    low, high = frequency_split(jnp.asarray(x))
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    tlow, thigh = _torch_extract_frequency2(t)
    np.testing.assert_allclose(np.asarray(low),
                               tlow.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-2, atol=1e-2)  # fp16 cast in torch path
    np.testing.assert_allclose(np.asarray(high),
                               thigh.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-2, atol=1e-2)


def test_frequency_split_8x8_zeroes_single_element():
    """At 8x8, the reference's threshold arithmetic zeroes exactly one shifted
    spectrum element for the highpass."""
    from mmidet_tpu.nn.fusion import _freq_masks
    high, low = _freq_masks(8, 8)
    assert (~high).sum() == 1 and high[7, 7] == False  # noqa: E712
    assert low.sum() == 1 and low[7, 7] == True  # noqa: E712


def test_separation_loss_closed_form():
    m = _rand((12, 64), 1)
    # O(l^2) reference formulation (common.py:128-139)
    want = 0.0
    l = m.shape[0]
    for i in range(l - 1):
        for j in range(i + 1, l):
            want += float(np.dot(m[i], m[j]))
    want /= l * (l - 1)
    got = float(separation_loss(jnp.asarray(m)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_contrastive_loss_matches_torch_formula():
    rgb = _rand((4, 6, 6, 8), 2)
    ir = _rand((4, 6, 6, 8), 3)

    def t_pair(e1, e2, label):
        d = torch.nn.functional.normalize(e1 - e2, dim=1)
        mean_dis = torch.mean(torch.square(d))
        return (1 - label) * torch.exp(mean_dis) + label * (torch.exp(mean_dis) - 1.0)

    tr = torch.from_numpy(rgb).permute(0, 3, 1, 2)
    ti = torch.from_numpy(ir).permute(0, 3, 1, 2)
    pos = t_pair(tr[:-1], ti[:-1], 0.0)
    n1 = t_pair(tr[:-1], ti[1:], 1.0)
    n2 = t_pair(tr[1:], ti[:-1], 1.0)
    want = float((pos * 2 + n1 + n2) / 4.0)
    got = float(contrastive_loss(jnp.asarray(rgb), jnp.asarray(ir)))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_ssim_and_fusing_loss_match_torch_formula():
    a = _rand((2, 4, 4, 3), 4)
    b = _rand((2, 4, 4, 3), 5)
    ta, tb = torch.from_numpy(a), torch.from_numpy(b)
    mu1, mu2 = ta.mean(), tb.mean()
    var1 = ((ta - mu1) ** 2).mean()
    var2 = ((tb - mu2) ** 2).mean()
    cov = ((ta - mu1) * (tb - mu2)).mean()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    ssim = (2 * mu1 * mu2 + c1) * (2 * cov + c2) / \
        ((mu1 ** 2 + mu2 ** 2 + c1) * (var1 + var2 + c2))
    want = float(1 - ssim)
    got = float(ssim_global(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, want, rtol=1e-5)

    fused = (a + b) / 2
    tf_ = torch.from_numpy(fused)
    want_fuse = float(0.5 * (1 - ssim_t(ta, tf_)) + 0.5 * (1 - ssim_t(tb, tf_))
                      + torch.abs(tf_.std() - tf_.std()))
    got_fuse = float(fusing_loss(jnp.asarray(a), jnp.asarray(b),
                                 jnp.asarray(fused), jnp.asarray(fused)))
    np.testing.assert_allclose(got_fuse, want_fuse, rtol=1e-5)


def ssim_t(img1, img2):
    mu1, mu2 = img1.mean(), img2.mean()
    var1 = ((img1 - mu1) ** 2).mean()
    var2 = ((img2 - mu2) ** 2).mean()
    cov = ((img1 - mu1) * (img2 - mu2)).mean()
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    return (2 * mu1 * mu2 + c1) * (2 * cov + c2) / \
        ((mu1 ** 2 + mu2 ** 2 + c1) * (var1 + var2 + c2))


def test_entropy_matches_torch_histc():
    x = np.clip(_rand((1000,), 6) * 0.3 + 0.5, -0.2, 1.2).astype(np.float32)
    hist = torch.histc(torch.from_numpy(x), bins=256, min=0, max=1)
    hist = hist / hist.sum()
    nz = hist[hist > 0]
    want = float(-(nz * torch.log2(nz)).sum())
    got = float(entropy_256(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_self_attention_matches_torch():
    from mmidet_tpu.nn.fusion import SelfAttention
    x = _rand((2, 16, 32), 7)
    m = SelfAttention(d_model=32, num_heads=4)
    v = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(m.apply(v, jnp.asarray(x)))

    p = v["params"]
    tx = torch.from_numpy(x)

    def lin(name):
        w = torch.from_numpy(np.asarray(p[name]["kernel"]))  # (in, out)
        b = torch.from_numpy(np.asarray(p[name]["bias"]))
        return lambda t: t @ w + b

    b_s, nq, c = x.shape
    h, dk = 4, 8
    q = lin("que_proj")(tx).view(b_s, nq, h, dk).permute(0, 2, 1, 3)
    k = lin("key_proj")(tx).view(b_s, nq, h, dk).permute(0, 2, 3, 1)
    vv = lin("val_proj")(tx).view(b_s, nq, h, dk).permute(0, 2, 1, 3)
    att = torch.softmax(torch.matmul(q, k) / np.sqrt(dk), -1)
    out = torch.matmul(att, vv).permute(0, 2, 1, 3).reshape(b_s, nq, c)
    want = lin("out_proj")(out).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
