"""The two-stream (visible + infrared) detection model: an explicit DAG over
the registry modules, with the Contour Enhancement front-end, the cross-modal
fusion blocks, and the Info-Guided auxiliary losses computed in-graph.

Functional parity surface: reference ``Model`` / ``forward_once``
(``models/yolo_test.py:77-276``).  Differences by design:
  * the layer graph is data (``ModelSpec``), executed functionally — no
    ``nn.Sequential`` index mutation, no ``eval``;
  * aux losses are returned in a dict, not stored on ``self``;
  * ``aux_mode='reference'`` reproduces the reference's *effective* loss
    surface (``Combine_loss`` is overwritten with the SSIM term at
    ``yolo_test.py:266``); ``'full'`` keeps the a1..a4 weighted sum the code
    intended; ``'off'`` skips aux entirely (inference).
  * single-stream models (reference ``models/yolo.py``) run through the same
    executor by passing a spec without ``-4`` refs and ``use_cem=False``.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from mmidet_tpu.losses import fusion as fusion_losses
from mmidet_tpu.models.detect_head import Detect
from mmidet_tpu.models.spec import SECOND_INPUT, ModelSpec, resolve
from mmidet_tpu.nn import layers as L
from mmidet_tpu.nn.cem import ContourEnhance
from mmidet_tpu.nn.fusion import (CrossModalTransformer, FourierPatternFusion,
                                  PatternFusion)
from mmidet_tpu.nn.resize import nearest_upsample

AUX_WEIGHTS = (0.1, 1.0, 0.06, 0.03)  # a1..a4, yolo_test.py:170-178


class TwoStreamDetector(nn.Module):
    spec: ModelSpec
    use_cem: bool = True
    aux_mode: str = "reference"      # 'reference' | 'full' | 'off'
    fused: bool = False              # BN folded into convs (deploy mode)
    pallas_fusion: bool = False      # fused Pallas token-transformer kernel
    pallas_cem: bool = False         # fused Pallas CEM kernel (deploy only)
    # single-kernel pool+transformer+upsample+Add2 merge (fusion_pallas):
    # measured at parity with the XLA sequence at Mosaic-compilable tile
    # sizes on v5e, so off by default — see PERF.md "fusion mega-kernel"
    merge_fusion_kernel: bool = False
    # diagnostic (tools/stage_profile.py): stop after this layer index and
    # return {"trunc": <that layer's output>} — prefix-delta wall-clock and
    # XLA cost analysis attribute time/bytes to individual stages
    truncate_at: int | None = None
    # s8-storage quantization of the conv stack (deploy-only, requires
    # fused): conv activations cross HBM as int8 QTensors with calibrated
    # per-tensor scales; compute stays bf16.  See mmidet_tpu.nn.quant for
    # the measured hardware rationale.  Needs the 'quant' collection in
    # variables (from quant.calibrate_act_scales).
    quant: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, ir: jnp.ndarray | None = None,
                 train: bool = False, decode: bool | None = None):
        """rgb/ir: NHWC float images (0..1). Returns a dict:
        ``train_outs`` per-level (B,na,ny,nx,no); ``pred`` decoded
        (B,N,no) when ``decode`` (default: not train); ``aux`` loss dict.
        """
        if decode is None:
            decode = not train
        resolved, save = resolve(self.spec)
        dt = self.dtype
        aux: dict[str, jnp.ndarray] = {}

        x: Any = rgb.astype(dt)
        x2 = None if ir is None else ir.astype(dt)
        if self.use_cem:
            x = ContourEnhance(rgb.shape[-1], fused=self.fused,
                               use_pallas=self.pallas_cem, dtype=dt,
                               name="enhance")(x, train)

        y: dict[int, Any] = {}
        premerged: set[int] = set()
        result = None
        for rl in resolved:
            name = f"l{rl.index}_{rl.name.replace('.', '_')}"
            m = rl.name

            def get(j):
                if j == -1:
                    return x
                if j == SECOND_INPUT:
                    if x2 is None:
                        raise ValueError("spec needs a second (IR) input")
                    return x2
                return y[j]

            if isinstance(rl.f, tuple):
                inp = [get(j) for j in rl.f]
            else:
                inp = get(rl.f)

            if m not in _QUANT_CAPABLE:
                # everything but the quantized conv stack consumes floats
                from mmidet_tpu.nn.quant import deq_tree
                inp = deq_tree(inp, dt)

            if m in _SIMPLE:
                # n>1 repeats chain sequentially (reference nn.Sequential,
                # yolo_test.py:563) — C3-family folds repeats internally so
                # this only triggers for plain Bottleneck rows (hub yolov3)
                quant = self.quant and m in _QUANT_CAPABLE
                x = _SIMPLE[m](rl, dt, name, self.fused, quant)(inp, train)
                for r in range(1, rl.n):
                    x = _SIMPLE[m](rl, dt, f"{name}_r{r}",
                                   self.fused, quant)(x, train)
            elif m == "Concat":
                x = jnp.concatenate(inp, axis=-1)
            elif m == "Add":
                x = inp[0] + inp[1]
            elif m == "Add2":
                if isinstance(rl.f, tuple) and rl.f[1] in premerged:
                    # the fused GPT kernel already merged the stream into
                    # its outputs (fusion_pallas.fused_gpt_merge)
                    x = inp[1][rl.args[0]]
                else:
                    x = inp[0] + inp[1][rl.args[0]]
            elif m in ("Upsample", "nn.Upsample"):
                # args follow torch nn.Upsample(size, scale_factor, mode)
                scale = 2
                mode = "nearest"
                if len(rl.args) >= 2 and rl.args[1]:
                    scale = int(rl.args[1])
                if len(rl.args) >= 3 and isinstance(rl.args[2], str):
                    mode = rl.args[2]
                if mode == "nearest":
                    x = nearest_upsample(inp, scale)
                else:
                    from mmidet_tpu.nn.resize import bilinear_resize
                    x = bilinear_resize(
                        inp, (inp.shape[1] * scale, inp.shape[2] * scale))
            elif m == "nn.MaxPool2d":
                # torch nn.MaxPool2d(kernel_size, stride, padding)
                k = rl.args[0]
                st = rl.args[1] if len(rl.args) > 1 and rl.args[1] else k
                pd = rl.args[2] if len(rl.args) > 2 else 0
                x = jax.lax.reduce_window(
                    inp, -jnp.inf, jax.lax.max, (1, k, k, 1),
                    (1, st, st, 1),
                    [(0, 0), (pd, pd), (pd, pd), (0, 0)])
            elif m == "nn.ZeroPad2d":
                left, right, top, bottom = rl.args[0]
                x = jnp.pad(inp, ((0, 0), (top, bottom), (left, right),
                                  (0, 0)))
            elif m == "Contract":
                x = L.contract(inp, rl.args[0])
            elif m == "Expand":
                x = L.expand(inp, rl.args[0])
            elif m == "GPT":
                from mmidet_tpu.nn.fusion_pallas import \
                    merge_kernel_supported
                merge = (self.merge_fusion_kernel and not train
                         and merge_kernel_supported(
                             inp[0].shape[1], inp[0].shape[2], rl.args[0]))
                r, i_ = CrossModalTransformer(
                    rl.args[0], n_layer=self.spec.fusion_layers,
                    use_pallas=self.pallas_fusion,
                    merge_kernel=merge, dtype=dt,
                    name=name)(inp[0], inp[1], train)
                x = [r, i_]
                if merge:
                    premerged.add(rl.index)
            elif m == "MambaFusion":
                from mmidet_tpu.nn.mamba import MambaFusion
                r, i_ = MambaFusion(rl.args[0], dtype=dt,
                                    name=name)(inp[0], inp[1], train)
                x = [r, i_]
            elif m in ("GPT1", "GPT1_fourier"):
                cls = PatternFusion if m == "GPT1" else FourierPatternFusion
                fourier = m == "GPT1_fourier"
                f_in = (inp[0], inp[1])
                # the reference computes contrastive/SSIM/entropy ONLY
                # around GPT1_fourier (yolo_test.py:216-256; the GPT1
                # branch's compute_fusing_loss call is commented out) —
                # PTLoss is recorded for both variants
                if self.aux_mode != "off" and fourier:
                    aux["contrastive"] = fusion_losses.contrastive_loss(
                        f_in[0], f_in[1])
                from mmidet_tpu.nn.fusion_pallas import \
                    merge_kernel_supported
                # merge kernel only when the aux losses are off: the
                # pattern/SSIM terms need the unmerged fusion outputs
                merge = (self.merge_fusion_kernel and not train
                         and self.aux_mode == "off"
                         and merge_kernel_supported(
                             inp[0].shape[1], inp[0].shape[2], rl.args[0]))
                r, i_, pt = cls(rl.args[0], n_layer=self.spec.fusion_layers,
                                use_pallas=self.pallas_fusion,
                                merge_kernel=merge,
                                dtype=dt, name=name)(inp[0], inp[1], train)
                x = [r, i_]
                if merge:
                    premerged.add(rl.index)
                if self.aux_mode != "off":
                    aux["pattern"] = pt
                    if fourier:
                        fused = (r + i_) / 2.0
                        aux["ssim"] = fusion_losses.fusing_loss(
                            f_in[0], f_in[1], fused, fused)
                        if self.aux_mode == "full":
                            aux["entropy"] = fusion_losses.entropy_loss(
                                f_in[0], f_in[1], fused)
            elif m == "Detect":
                train_outs, pred = Detect(
                    nc=rl.args[0], anchors=rl.args[1],
                    strides=self.spec.strides, dtype=dt,
                    name=name)(inp, decode=decode)
                result = {"train_outs": train_outs, "pred": pred}
                x = train_outs
            else:
                raise ValueError(f"unhandled module {m}")

            if rl.index in save:
                y[rl.index] = x

            if self.truncate_at is not None and rl.index == self.truncate_at:
                from mmidet_tpu.nn.quant import deq_tree
                out = deq_tree(x, dt)
                out = tuple(out) if isinstance(out, (list, tuple)) else out
                return {"trunc": out, "aux": aux}

        if result is None:
            raise ValueError("spec has no Detect layer")

        # Combine loss (yolo_test.py:263-268): full weighted sum computed,
        # then overwritten with the SSIM term in the reference.
        if self.aux_mode != "off" and "ssim" in aux:
            if self.aux_mode == "full":
                a1, a2, a3, a4 = AUX_WEIGHTS
                aux["combine"] = (a1 * aux["contrastive"] + a2 * aux["ssim"]
                                  + a3 * aux["pattern"]
                                  + a4 * aux["entropy"])
            else:
                aux["combine"] = aux["ssim"]
        result["aux"] = aux
        return result


def _simple(builder, quantable: bool = False):
    """Wrap a (rl, dtype, name, fused[, quant]) -> module factory into
    x,train calling."""
    def make(rl, dt, name, fused, quant=False):
        mod = builder(rl, dt, name, fused, quant) if quantable \
            else builder(rl, dt, name, fused)
        return lambda x, train: mod(x, train)
    return make


# modules that natively consume/produce int8 QTensors in s8store mode
_QUANT_CAPABLE = {"Conv", "Focus", "Bottleneck", "C3", "SPP", "SPPF",
                  "DWConv"}

_SIMPLE = {
    "Conv": _simple(lambda rl, dt, name, fused, q: L.ConvBnAct(
        rl.args[0], *rl.args[1:], fused=fused, quant=q, dtype=dt,
        name=name), quantable=True),
    "Focus": _simple(lambda rl, dt, name, fused, q: L.Focus(
        rl.args[0], *rl.args[1:], fused=fused, quant=q, dtype=dt,
        name=name), quantable=True),
    "Bottleneck": _simple(lambda rl, dt, name, fused, q: L.Bottleneck(
        rl.args[0], *rl.args[1:], fused=fused, quant=q, dtype=dt,
        name=name), quantable=True),
    "BottleneckCSP": _simple(lambda rl, dt, name, fused: L.BottleneckCSP(
        rl.args[0], *rl.args[1:], fused=fused, dtype=dt, name=name)),
    "C3": _simple(lambda rl, dt, name, fused, q: L.C3(
        rl.args[0], *rl.args[1:], fused=fused, quant=q, dtype=dt,
        name=name), quantable=True),
    "C3TR": _simple(lambda rl, dt, name, fused: L.C3TR(
        rl.args[0], *rl.args[1:], fused=fused, dtype=dt, name=name)),
    "SPP": _simple(lambda rl, dt, name, fused, q: L.SPP(
        rl.args[0], *rl.args[1:], fused=fused, quant=q, dtype=dt,
        name=name), quantable=True),
    "SPPF": _simple(lambda rl, dt, name, fused, q: L.SPPF(
        rl.args[0], *rl.args[1:], fused=fused, quant=q, dtype=dt,
        name=name), quantable=True),
    "DWConv": _simple(lambda rl, dt, name, fused, q: L.DWConv(
        rl.args[0], *rl.args[1:], fused=fused, quant=q, dtype=dt,
        name=name), quantable=True),
    "GhostConv": _simple(lambda rl, dt, name, fused: L.GhostConv(
        rl.args[0], *rl.args[1:], fused=fused, dtype=dt, name=name)),
    "GhostBottleneck": _simple(lambda rl, dt, name, fused: L.GhostBottleneck(
        rl.args[0], *rl.args[1:], fused=fused, dtype=dt, name=name)),
    "MixConv2d": _simple(lambda rl, dt, name, fused: L.MixConv2d(
        rl.args[0], *rl.args[1:], dtype=dt, name=name)),
    "CrossConv": _simple(lambda rl, dt, name, fused: L.CrossConv(
        rl.args[0], *rl.args[1:], dtype=dt, name=name)),
}
