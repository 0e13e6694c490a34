"""YOLOv5-family building blocks, TPU-native (flax Linen, NHWC).

Functional parity surface: reference ``models/common.py`` (Conv/Focus/
Bottleneck/BottleneckCSP/C3/C3TR/SPP/SPPF/DWConv/Contract/Expand/Concat/
Classify, ``common.py:96-748,1131-1144``) and ``models/experimental.py``
(CrossConv/Sum/GhostConv/GhostBottleneck/MixConv2d).

Design notes (TPU-first, not a torch translation):
  * NHWC activations and HWIO kernels — XLA's native TPU conv layout; all
    channel-concats are on the last (lane) axis.
  * BatchNorm carries YOLOv5's eps=1e-3 / torch-momentum=0.03
    (reference ``utils/torch_utils.py:initialize_weights``); under pjit with a
    sharded batch axis the batch statistics are computed over the *global*
    batch, so cross-replica SyncBN is the default rather than opt-in
    (reference ``train.py:645-648``).
  * ``dtype`` is the compute dtype (bf16 on TPU); params stay fp32.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

BN_MOMENTUM = 0.97  # flax momentum = 1 - torch momentum (0.03)
BN_EPS = 1e-3

# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == uniform scaled by
# 1/sqrt(fan_in) * sqrt(3) * gain(sqrt(5)) -> variance_scaling(1/3, fan_in, uniform)
conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform")


def autopad(k: int | Sequence[int], p=None):
    """'same' padding for odd kernels. Ref: common.py:96."""
    if p is None:
        p = k // 2 if isinstance(k, int) else [x // 2 for x in k]
    return p


def act_fn(name: str | None) -> Callable[[jnp.ndarray], jnp.ndarray]:
    table = {
        "silu": jax.nn.silu,
        "relu": jax.nn.relu,
        "relu6": jax.nn.relu6,
        "leaky0.1": lambda x: jax.nn.leaky_relu(x, 0.1),
        "hardswish": jax.nn.hard_swish,
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "gelu": lambda x: jax.nn.gelu(x, approximate=False),
        "identity": lambda x: x,
        None: lambda x: x,
    }
    return table[name]


class ConvBnAct(nn.Module):
    """Conv2d(bias=False) + BatchNorm + activation. Ref: common.py:108 (Conv).

    ``fused=True`` is the inference deploy mode: BN is folded into the conv
    kernel + bias (reference ``fuse_conv_and_bn`` / ``fuseforward``,
    utils/torch_utils.py:181, common.py:124) — params produced by
    ``mmidet_tpu.nn.fuse.fold_batchnorm``.

    ``quant=True`` (s8store, deploy-only, requires fused): the activation
    output is quantized to int8 with this module's calibrated per-tensor
    ``out_scale`` and returned as a ``QTensor`` — the int8 tensor is the
    XLA fusion boundary, halving the activation HBM traffic of the
    bytes-bound conv stack; compute stays bf16 (the measured-winning
    formulation, see ``mmidet_tpu.nn.quant``).  Consumers dequantize on
    entry.  In the float path the fused module sows its activation absmax
    to the ``calib`` collection (active only when 'calib' is mutable) for
    calibration."""
    features: int
    kernel: int = 1
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    act: str | None = "silu"
    fused: bool = False
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mmidet_tpu.nn.quant import QTensor, dequantize, quantize
        if isinstance(x, QTensor):
            x = dequantize(x, self.dtype)
        # kernel may be an int or a (kh, kw) pair (hub yolov3.yaml uses
        # ``Conv, [512, [1, 1]]``)
        k = (self.kernel, self.kernel) if isinstance(self.kernel, int) \
            else tuple(self.kernel)
        p = autopad(self.kernel, self.padding)
        pp = (p, p) if isinstance(p, int) else tuple(p)
        x = nn.Conv(self.features, k,
                    strides=(self.stride, self.stride),
                    padding=[(pp[0], pp[0]), (pp[1], pp[1])],
                    feature_group_count=self.groups,
                    use_bias=self.fused,
                    kernel_init=conv_kernel_init,
                    dtype=self.dtype, name="conv")(x)
        if not self.fused:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM,
                             epsilon=BN_EPS, dtype=self.dtype, name="bn")(x)
        x = act_fn(self.act)(x)
        if self.fused and not train:
            if self.quant:
                s = self.variable("quant", "out_scale",
                                  lambda: jnp.float32(1.0))
                return quantize(x, s.value)
            if (not self.is_initializing()
                    and self.is_mutable_collection("calib")):
                self.sow("calib", "out_absmax", jnp.max(jnp.abs(
                    x.astype(jnp.float32))))
        return x


class DWConv(nn.Module):
    """Depthwise conv (groups = gcd(c1, c2)). Ref: common.py:103."""
    features: int
    kernel: int = 1
    stride: int = 1
    act: str | None = "silu"
    fused: bool = False
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mmidet_tpu.nn.quant import QTensor
        c1 = x.v.shape[-1] if isinstance(x, QTensor) else x.shape[-1]
        g = math.gcd(c1, self.features)
        return ConvBnAct(self.features, self.kernel, self.stride, groups=g,
                         act=self.act, fused=self.fused, quant=self.quant,
                         dtype=self.dtype, name="conv")(x, train)


class Focus(nn.Module):
    """Space-to-depth (2x2 pixel de-interleave -> 4C) + Conv. Ref: common.py:696.

    Channel order matches the reference's concat
    ``[x[::2,::2], x[1::2,::2], x[::2,1::2], x[1::2,1::2]]`` so converted
    checkpoints line up.

    TPU note: the strided-slice formulation is ~5x slower than its exact
    algebraic equivalent — one (2k)x(2k) stride-2 conv on the raw input (the
    same identity YOLOv5 v6 used to drop Focus).  We keep the reference's
    (k, k, 4*C, out) parameter layout for checkpoint compatibility and
    rearrange the kernel into the (2k, 2k, C, out) form at trace time, so the
    hot path is a single dense conv with no strided gathers.
    """
    features: int
    kernel: int = 1
    stride: int = 1
    act: str | None = "silu"
    fused: bool = False
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mmidet_tpu.nn.quant import QTensor, dequantize, quantize
        if isinstance(x, QTensor):
            x = dequantize(x, self.dtype)
        c1 = x.shape[-1]
        k, s = self.kernel, self.stride
        if s != 1:
            # uncommon config: fall back to explicit space-to-depth
            y = jnp.concatenate([
                x[:, ::2, ::2, :], x[:, 1::2, ::2, :],
                x[:, ::2, 1::2, :], x[:, 1::2, 1::2, :]], axis=-1)
            return ConvBnAct(self.features, k, s, act=self.act,
                             fused=self.fused, quant=self.quant,
                             dtype=self.dtype, name="conv")(y, train)

        p = autopad(k)
        kernel = self.param(
            "conv_kernel_s2d", conv_kernel_init, (k, k, 4 * c1, self.features),
            jnp.float32)
        # rearrange (k,k,4C,out) -> (2k,2k,C,out):
        #   K[u,v,c,o] = W[(u-2p - u%2)/2 + p, (v-2p - v%2)/2 + p,
        #                  (u%2 + 2*(v%2))*C + c, o]
        # channel group g = rg + 2*sg selects parity (rg=row, sg=col); the
        # (4C) dim decomposes as g*C + c, so reshape to (k,k,2,2,C,out) where
        # axis-2 is sg's weight 2 -> index [sg, rg] gives group rg + 2*sg.
        w = kernel.reshape(k, k, 2, 2, c1, self.features)
        big = jnp.zeros((2 * k, 2 * k, c1, self.features), kernel.dtype)
        for rg in range(2):
            for sg in range(2):
                # K[2*di+rg, 2*dj+sg] = W[di, dj, (rg + 2*sg)*C + c]
                big = big.at[rg::2, sg::2].set(w[:, :, sg, rg])
        big = big.astype(self.dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype), big, window_strides=(2, 2),
            padding=[(2 * p, 2 * p), (2 * p, 2 * p)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=self.dtype)
        if self.fused:
            bias = self.param("conv_bias", nn.initializers.zeros,
                              (self.features,), jnp.float32)
            y = y + bias.astype(self.dtype)
        else:
            y = nn.BatchNorm(use_running_average=not train,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS,
                             dtype=self.dtype, name="conv_bn")(y)
        y = act_fn(self.act)(y)
        if self.fused and not train:
            if self.quant:
                sc = self.variable("quant", "out_scale",
                                   lambda: jnp.float32(1.0))
                return quantize(y, sc.value)
            if (not self.is_initializing()
                    and self.is_mutable_collection("calib")):
                self.sow("calib", "out_absmax", jnp.max(jnp.abs(
                    y.astype(jnp.float32))))
        return y


class Bottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual. Ref: common.py:602."""
    features: int
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    fused: bool = False
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mmidet_tpu.nn.quant import QTensor, dequantize
        c_ = int(self.features * self.expansion)
        c_in = x.v.shape[-1] if isinstance(x, QTensor) else x.shape[-1]
        y = ConvBnAct(c_, 1, 1, fused=self.fused, quant=self.quant,
                      dtype=self.dtype, name="cv1")(x, train)
        y = ConvBnAct(self.features, 3, 1, groups=self.groups,
                      fused=self.fused, quant=self.quant,
                      dtype=self.dtype, name="cv2")(y, train)
        if self.shortcut and c_in == self.features:
            if isinstance(x, QTensor) or isinstance(y, QTensor):
                return dequantize(x, self.dtype) + dequantize(y, self.dtype)
            return x + y
        return y


class C3(nn.Module):
    """CSP bottleneck with 3 convs. Ref: common.py:637."""
    features: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    fused: bool = False
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mmidet_tpu.nn.quant import dequantize
        c_ = int(self.features * self.expansion)
        y1 = ConvBnAct(c_, 1, 1, fused=self.fused, quant=self.quant,
                       dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.groups, 1.0,
                            fused=self.fused, quant=self.quant,
                            dtype=self.dtype, name=f"m{i}")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, fused=self.fused, quant=self.quant,
                       dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([dequantize(y1, self.dtype),
                             dequantize(y2, self.dtype)], axis=-1)
        return ConvBnAct(self.features, 1, 1, fused=self.fused,
                         quant=self.quant, dtype=self.dtype,
                         name="cv3")(y, train)


class VitTransformerLayer(nn.Module):
    """LayerNorm-free ViT layer (q/k/v + MHA + 2-linear MLP).
    Ref: common.py:555-569 (TransformerLayer)."""
    c: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dense = lambda name: nn.Dense(self.c, use_bias=False,
                                      dtype=self.dtype, name=name)
        q, k, v = dense("q")(x), dense("k")(x), dense("v")(x)
        y = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads, qkv_features=self.c,
            dtype=self.dtype, name="ma")(q, k, v)
        x = y + x
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc1")(x)
        y = nn.Dense(self.c, use_bias=False, dtype=self.dtype, name="fc2")(y)
        return y + x


class VitTransformerBlock(nn.Module):
    """ViT block over flattened spatial tokens w/ learned position embedding.
    Ref: common.py:572-599 (TransformerBlock)."""
    features: int
    num_heads: int
    num_layers: int
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if x.shape[-1] != self.features:
            x = ConvBnAct(self.features, fused=self.fused,
                          dtype=self.dtype, name="conv")(x, train)
        b, h, w, c = x.shape
        p = x.reshape(b, h * w, c)
        p = p + nn.Dense(c, dtype=self.dtype, name="linear")(p)
        for i in range(self.num_layers):
            p = VitTransformerLayer(c, self.num_heads, dtype=self.dtype,
                                    name=f"tr{i}")(p)
        return p.reshape(b, h, w, c)


class C3TR(nn.Module):
    """C3 with a ViT transformer block as the inner stack. Ref: common.py:654."""
    features: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        y1 = ConvBnAct(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        y1 = VitTransformerBlock(c_, 4, self.n, fused=self.fused,
                                 dtype=self.dtype, name="m")(y1, train)
        y2 = ConvBnAct(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv2")(x, train)
        y = jnp.concatenate([y1, y2], axis=-1)
        return ConvBnAct(self.features, 1, 1, fused=self.fused, dtype=self.dtype,
                         name="cv3")(y, train)


class BottleneckCSP(nn.Module):
    """Original CSP bottleneck. Ref: common.py:616."""
    features: int
    n: int = 1
    shortcut: bool = True
    groups: int = 1
    expansion: float = 0.5
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = int(self.features * self.expansion)
        y1 = ConvBnAct(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        for i in range(self.n):
            y1 = Bottleneck(c_, self.shortcut, self.groups, 1.0,
                            fused=self.fused, dtype=self.dtype, name=f"m{i}")(y1, train)
        y1 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
                     dtype=self.dtype, name="cv3")(y1)
        y2 = nn.Conv(c_, (1, 1), use_bias=False, kernel_init=conv_kernel_init,
                     dtype=self.dtype, name="cv2")(x)
        y = jnp.concatenate([y1, y2], axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        y = jax.nn.leaky_relu(y, 0.1)
        return ConvBnAct(self.features, 1, 1, fused=self.fused,
                         dtype=self.dtype, name="cv4")(y, train)


def _max_pool_same(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """stride-1 'same' max pool with k//2 padding (torch MaxPool2d semantics:
    pads with -inf so edges are true maxima of valid pixels)."""
    p = k // 2
    return nn.max_pool(x, (k, k), strides=(1, 1),
                       padding=[(p, p), (p, p)])


class SPP(nn.Module):
    """Spatial pyramid pooling. Ref: common.py:681."""
    features: int
    kernels: Sequence[int] = (5, 9, 13)
    fused: bool = False
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mmidet_tpu.nn.quant import QTensor, dequantize
        c_in = x.v.shape[-1] if isinstance(x, QTensor) else x.shape[-1]
        c_ = c_in // 2
        x = ConvBnAct(c_, 1, 1, fused=self.fused, quant=self.quant,
                      dtype=self.dtype, name="cv1")(x, train)
        x = dequantize(x, self.dtype)  # pools/concat at P5 size: tiny bytes
        ys = [x] + [_max_pool_same(x, k) for k in self.kernels]
        y = jnp.concatenate(ys, axis=-1)
        return ConvBnAct(self.features, 1, 1, fused=self.fused,
                         quant=self.quant, dtype=self.dtype,
                         name="cv2")(y, train)


class SPPF(nn.Module):
    """SPP-Fast: 3 chained pools == SPP(5,9,13). Ref: common.py:662."""
    features: int
    kernel: int = 5
    fused: bool = False
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        from mmidet_tpu.nn.quant import QTensor, dequantize
        c_in = x.v.shape[-1] if isinstance(x, QTensor) else x.shape[-1]
        c_ = c_in // 2
        x = ConvBnAct(c_, 1, 1, fused=self.fused, quant=self.quant,
                      dtype=self.dtype, name="cv1")(x, train)
        x = dequantize(x, self.dtype)
        y1 = _max_pool_same(x, self.kernel)
        y2 = _max_pool_same(y1, self.kernel)
        y3 = _max_pool_same(y2, self.kernel)
        y = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBnAct(self.features, 1, 1, fused=self.fused,
                         quant=self.quant, dtype=self.dtype,
                         name="cv2")(y, train)


def contract(x: jnp.ndarray, gain: int = 2) -> jnp.ndarray:
    """W/H into channels, torch channel ordering. Ref: common.py:712."""
    b, h, w, c = x.shape
    s = gain
    # torch: (N,C,H,W) -> view(N,C,H/s,s,W/s,s) -> permute(0,3,5,1,2,4)
    # -> (N, s*s*C, H/s, W/s); channel index = (sh * s + sw) * C + c.
    x = x.reshape(b, h // s, s, w // s, s, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, H/s, W/s, s, s, c
    return x.reshape(b, h // s, w // s, s * s * c)


def expand(x: jnp.ndarray, gain: int = 2) -> jnp.ndarray:
    """Channels into W/H, torch channel ordering. Ref: common.py:726."""
    b, h, w, c = x.shape
    s = gain
    # torch: view(N,s,s,C/s^2,H,W) -> permute(0,3,4,1,5,2) -> (N,C/s^2,H*s,W*s)
    x = x.reshape(b, h, w, s, s, c // (s * s))
    x = x.transpose(0, 1, 3, 2, 4, 5)  # b, h, s, w, s, c'
    return x.reshape(b, h * s, w * s, c // (s * s))


class Classify(nn.Module):
    """Global-pool classification head. Ref: common.py:1131."""
    features: int
    kernel: int = 1
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        xs = x if isinstance(x, (list, tuple)) else [x]
        z = jnp.concatenate([jnp.mean(y, axis=(1, 2), keepdims=True)
                             for y in xs], axis=-1)
        p = autopad(self.kernel)
        z = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=[(p, p), (p, p)], kernel_init=conv_kernel_init,
                    dtype=self.dtype, name="conv")(z)
        return z.reshape(z.shape[0], -1)


class CrossConv(nn.Module):
    """1xk then kx1 cross conv. Ref: experimental.py:11."""
    features: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    expansion: float = 1.0
    shortcut: bool = False
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # exactly TWO convs, as the reference (experimental.py:11-22):
        # cv1 = Conv(c1, c_, (1,k), (1,s)); cv2 = Conv(c_, c2, (k,1),
        # (s,1), g) — no extra 1x1 in front
        c_ = int(self.features * self.expansion)
        p = autopad(self.kernel)
        y = nn.Conv(c_, (1, self.kernel), strides=(1, self.stride),
                    padding=[(0, 0), (p, p)], use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="cv1_conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="cv1_bn")(y)
        y = jax.nn.silu(y)
        y = nn.Conv(self.features, (self.kernel, 1),
                    strides=(self.stride, 1), padding=[(p, p), (0, 0)],
                    feature_group_count=self.groups, use_bias=False,
                    kernel_init=conv_kernel_init, dtype=self.dtype,
                    name="cv2_conv")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="cv2_bn")(y)
        y = jax.nn.silu(y)
        if self.shortcut and x.shape[-1] == self.features:
            return x + y
        return y


class GhostConv(nn.Module):
    """Ghost convolution. Ref: experimental.py:61."""
    features: int
    kernel: int = 1
    stride: int = 1
    act: str | None = "silu"
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        y = ConvBnAct(c_, self.kernel, self.stride, act=self.act,
                      fused=self.fused, dtype=self.dtype, name="cv1")(x, train)
        y2 = ConvBnAct(c_, 5, 1, groups=c_, act=self.act,
                       fused=self.fused, dtype=self.dtype, name="cv2")(y, train)
        return jnp.concatenate([y, y2], axis=-1)


class GhostBottleneck(nn.Module):
    """Ghost bottleneck. Ref: experimental.py:71."""
    features: int
    kernel: int = 3
    stride: int = 1
    fused: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        c_ = self.features // 2
        y = GhostConv(c_, 1, 1, fused=self.fused, dtype=self.dtype, name="conv1")(x, train)
        if self.stride == 2:
            y = DWConv(c_, self.kernel, self.stride, act=None,
                       fused=self.fused, dtype=self.dtype, name="dw")(y, train)
        y = GhostConv(self.features, 1, 1, act=None,
                      fused=self.fused, dtype=self.dtype, name="conv2")(y, train)
        if self.stride == 2:
            sc = DWConv(x.shape[-1], self.kernel, self.stride, act=None,
                        fused=self.fused, dtype=self.dtype, name="sc_dw")(x, train)
            sc = ConvBnAct(self.features, 1, 1, act=None,
                           fused=self.fused, dtype=self.dtype, name="sc_pw")(sc, train)
        else:
            sc = x if x.shape[-1] == self.features else None
            if sc is None:
                raise ValueError("GhostBottleneck stride-1 requires c1 == c2")
        return y + sc


class MixConv2d(nn.Module):
    """Mixed-kernel-size conv. Ref: experimental.py:84."""
    features: int
    kernels: Sequence[int] = (1, 3)
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        groups = len(self.kernels)
        # equal channel split (reference equal_ch=True path)
        import numpy as np
        idx = np.linspace(0, groups - 1e-6, self.features)
        ch = [int((idx.astype(int) == g).sum()) for g in range(groups)]
        ys = []
        for i, (k, c) in enumerate(zip(self.kernels, ch)):
            p = autopad(k)
            ys.append(nn.Conv(c, (k, k), strides=(self.stride, self.stride),
                              padding=[(p, p), (p, p)], use_bias=False,
                              kernel_init=conv_kernel_init, dtype=self.dtype,
                              name=f"m{i}")(x))
        y = jnp.concatenate(ys, axis=-1)
        y = nn.BatchNorm(use_running_average=not train, momentum=BN_MOMENTUM,
                         epsilon=BN_EPS, dtype=self.dtype, name="bn")(y)
        # residual, exactly as the reference: x + act(bn(cat(...)))
        # (experimental.py:100)
        return x + jax.nn.leaky_relu(y, 0.1)


class Sum(nn.Module):
    """(Optionally weighted) sum of inputs. Ref: experimental.py:45."""
    n: int
    weighted: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xs, train: bool = False):
        if self.weighted:
            # ref init: w = -arange(1, n) / 2 (experimental.py:31)
            w = self.param(
                "w", lambda key, shape, dtype:
                -jnp.arange(1, self.n, dtype=dtype) / 2.0,
                (self.n - 1,), jnp.float32)
            w = jax.nn.sigmoid(w) * 2
            y = xs[0]
            for i in range(self.n - 1):
                y = y + xs[i + 1] * w[i].astype(xs[0].dtype)
            return y
        y = xs[0]
        for x in xs[1:]:
            y = y + x
        return y
