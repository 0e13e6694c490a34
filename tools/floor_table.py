"""Closed-form HBM-traffic floor table for the deploy forward
(VERDICT r3 #4: make "the 2000 img/s gap is a measured floor" checkable
arithmetic instead of a claim).

Byte model (documented so a reader can re-derive every row):

  * every materialized activation map is written once by its producer and
    read once per consumer — elementwise epilogues (folded BN, SiLU,
    residual adds) are fused into their producing conv by XLA, so they add
    no traffic;
  * per-module materialized maps:
      Conv/Focus/DWConv       -> [out]
      C3(c, n bottlenecks)    -> [cv1 c/2, cv2 c/2, n x (2 x c/2), concat c,
                                  cv3 c_out]
      SPP(c_out, 3 pools)     -> [cv1 c/2, 3 pools c/2 each, concat 2c, cv2]
      Upsample/Concat/Add/Add2-> [out]
      GPT/GPT1/GPT1_fourier   -> 2 full-res outputs (c x h x w each) + token
                                 traffic (pooled 8x8 tokens, counted, tiny)
      CEM (per stream)        -> [u 24ch, bank 8ch, conv3 3ch, enhanced 3ch]
                                 at full input resolution
      Detect                  -> decoded (na*(nc+5)) maps per level
  * params: read once per batch step, amortized over the batch;
  * floor ms = bytes / measured HBM bandwidth (819 GB/s on this v5e,
    PERF.md round-1 calibration via XLA cost analysis vs wall-clock);
  * s8 column: conv-stack maps cross HBM at 1 byte (the shipped
    `quant='s8store'` scope: backbone/head convs; CEM + fusion + decode
    stay bf16).

This is a LOWER bound: it ignores MXU time (the d=512 transformer level is
compute-bound), conv input re-reads under XLA's spatial tiling, relayout
copies at dtype boundaries (measured to eat ~60% of the s8 savings,
PERF.md round-3), and the NMS pass.

Usage: python tools/floor_table.py [scale=s] [variant=gpt4] [img=640]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BW_GBS = 819.0  # measured HBM roofline, PERF.md "Round-1 continuation"


def model_floor(scale: str = "s", variant: str = "gpt4", img: int = 640,
                nc: int = 6):
    from mmidet_tpu.models.spec import SECOND_INPUT, resolve
    from mmidet_tpu.models.zoo import two_stream_spec

    spec = two_stream_spec(scale, variant, nc=nc)
    layers, _ = resolve(spec)

    # ---- walk the DAG tracking spatial dims --------------------------------
    hw = {}      # layer index -> (h, w)
    cout = {}    # layer index -> channels
    DOWN2 = {"Conv", "Focus"}  # stride-2 rows are k=3/6 s=2 in this grammar

    def feeders(f):
        return [f] if isinstance(f, int) else list(f)

    # byte accumulators: stage label -> activation elems (bf16-countable)
    stages: dict[str, float] = {}
    s8_elig: dict[str, bool] = {}  # stage maps inside the s8store conv scope
    flops: dict[str, float] = {}   # stage label -> FLOPs (2 x MACs)

    def add(label, elems, s8=False, fl=0.0):
        stages[label] = stages.get(label, 0.0) + elems
        s8_elig[label] = s8_elig.get(label, False) or s8
        flops[label] = flops.get(label, 0.0) + fl

    def in_hw(f):
        for j in feeders(f):
            if j in (-1, SECOND_INPUT):
                continue
            return hw[j]
        return (img, img)

    for i, l in enumerate(layers):
        f = l.f
        js = feeders(f)
        # resolve input spatial: first non-sentinel feeder, else raw input
        h, w = (img, img)
        for j in js:
            if j == SECOND_INPUT:
                h, w = img, img
                break
            if j == -1:
                j = i - 1
            if j >= 0 and j in hw:
                h, w = hw[j]
                break
        name = l.name
        c = l.c_out
        stride2 = name in DOWN2 and (name == "Focus" or
                                     (len(l.args) > 2 and l.args[2] == 2))
        if stride2:
            h, w = h // 2, w // 2
        if name in ("Upsample", "nn.Upsample"):
            h, w = h * 2, w * 2
        hw[i] = (h, w)
        cout[i] = c

        e = h * w  # elems per channel
        # input channels = first real feeder's c_out (raw input: 3)
        c_in = 3
        for j in js:
            if j == SECOND_INPUT:
                c_in = 3
                break
            if j == -1:
                j = i - 1
            if j >= 0 and j in cout:
                c_in = cout[j]
                break
        # stage label: backbone vs head by position of the first Concat-up
        if name in ("Conv", "Focus", "DWConv"):
            if name == "Focus":
                fl = 2.0 * 9 * 12 * c * e  # space2depth(12ch) + 3x3 conv
            else:
                k = l.args[1] if len(l.args) > 1 else 1
                fl = 2.0 * k * k * c_in * c * e
            add(f"{name}@{h}x{w}x{c}", 2 * e * c, s8=True, fl=fl)
        elif name in ("C3", "BottleneckCSP", "C3TR"):
            ch = c // 2
            elems = (2 * ch + l.n * 2 * ch + 2 * ch + c) * e
            # cv1+cv2 (1x1 c_in->ch) + n x (1x1 + 3x3 ch->ch) + cv3 (1x1 c->c)
            fl = 2.0 * e * (2 * c_in * ch + l.n * (ch * ch + 9 * ch * ch)
                            + c * c)
            add(f"C3x{l.n}@{h}x{w}x{c}", 2 * elems, s8=True, fl=fl)
        elif name in ("SPP", "SPPF"):
            ch = cout[js[0] if js[0] >= 0 else i - 1] // 2
            elems = (ch + 3 * ch + 4 * ch + c) * e
            fl = 2.0 * e * (c_in * ch + 4 * ch * c)
            add(f"SPP@{h}x{w}x{c}", 2 * elems, s8=True, fl=fl)
        elif name in ("GPT", "GPT1", "GPT1_fourier"):
            # two full-res outputs + pooled 8x8 token pipeline (16 maps of
            # 64 tokens x d over the 8-layer stack, both streams)
            toks = 2 * 8 * 8 * c * (2 * spec.fusion_layers + 2)
            # transformer stack: 24d^2 FLOPs/token/layer (qkv 6d^2, proj
            # 2d^2, MLP x4 16d^2; T=128 tokens incl. both modalities;
            # attention O(T^2 d) is <2% at T=128 and omitted)
            fl = spec.fusion_layers * 128 * 24.0 * c * c
            add(f"{name}@{h}x{w}x{c}", 2 * (2 * e * c) + 2 * toks, fl=fl)
        elif name in ("Add", "Add2", "Concat", "Contract", "Expand",
                      "Upsample", "nn.Upsample", "MambaFusion"):
            add(f"glue@{h}x{w}", 2 * e * c)
        elif name == "Detect":
            no = spec.na * (nc + 5)
            elems = sum((img // s) ** 2 * no for s in spec.strides)
            add("Detect+decode", 2 * elems)
        else:
            add(f"other:{name}", 2 * e * c)

    # ---- CEM (applied to both raw inputs at full res) ----------------------
    # materialized maps per stream: u (24ch, conv2 out) + conv3 out (3ch) +
    # enhanced output (3ch).  The 8-direction edge bank is FUSED (the
    # factored-bank formulation, PERF.md round-1: no standalone bank map
    # crosses HBM) — with it counted the "floor" would exceed the measured
    # 0.138 ms/img CEM slice, which is the tell that XLA already fuses it.
    e = img * img
    cem = 2 * (2 * e * 24 + 2 * e * 3 + 2 * e * 3)
    k_cem = "CEM@%dx%d (both streams)" % (img, img)
    stages[k_cem] = cem
    s8_elig[k_cem] = False
    # per stream: conv2 3->24 (3x3) + factored 8-direction bank over 24ch
    # + conv3 24->3 (3x3); x2 FLOP/MAC, x2 streams
    flops[k_cem] = 2 * 2.0 * e * (9 * 3 * 24 + 9 * 24 * 8 + 9 * 24 * 3)
    # raw input read (both streams)
    stages["input read (2 streams)"] = 2 * e * 3
    s8_elig["input read (2 streams)"] = False
    flops["input read (2 streams)"] = 0.0

    # ---- params ------------------------------------------------------------
    import numpy as np  # noqa: F401
    return spec, stages, s8_elig, flops


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "s"
    variant = sys.argv[2] if len(sys.argv) > 2 else "gpt4"
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 640

    spec, stages, s8_elig, _fl = model_floor(scale, variant, img)

    # group rows: conv stack / fusion / glue / CEM / detect / input
    groups = {"conv stack (s8-eligible)": 0.0, "fusion transformers": 0.0,
              "glue (add/concat/upsample)": 0.0, "CEM": 0.0,
              "Detect+decode": 0.0, "input read": 0.0}
    for k, v in stages.items():
        if s8_elig.get(k):
            groups["conv stack (s8-eligible)"] += v
        elif k.startswith(("GPT", "Mamba")):
            groups["fusion transformers"] += v
        elif k.startswith("glue"):
            groups["glue (add/concat/upsample)"] += v
        elif k.startswith("CEM"):
            groups["CEM"] += v
        elif k.startswith("Detect"):
            groups["Detect+decode"] += v
        else:
            groups["input read"] += v

    print(f"# HBM floor, yolov5{scale} {variant} @{img}px, per image")
    print(f"# bandwidth {BW_GBS} GB/s (measured); bf16 maps = 2 B/elem, "
          f"s8 conv maps = 1 B/elem")
    tot_bf16 = tot_s8 = 0.0
    print(f"{'slice':36s}{'MB bf16':>10s}{'ms bf16':>9s}"
          f"{'MB s8':>10s}{'ms s8':>9s}")
    for k, elems in groups.items():
        mb_bf16 = elems * 2 / 1e6
        mb_s8 = elems * (1 if k.startswith("conv stack") else 2) / 1e6
        ms_bf16 = mb_bf16 / BW_GBS
        ms_s8 = mb_s8 / BW_GBS
        tot_bf16 += ms_bf16
        tot_s8 += ms_s8
        print(f"{k:36s}{mb_bf16:10.2f}{ms_bf16:9.4f}"
              f"{mb_s8:10.2f}{ms_s8:9.4f}")
    print(f"{'TOTAL floor':36s}{'':10s}{tot_bf16:9.4f}{'':10s}{tot_s8:9.4f}")
    print(f"-> floor throughput: bf16 {1e3 / tot_bf16:,.0f} "
          f"img/s, s8 {1e3 / tot_s8:,.0f} img/s "
          f"(per chip, bytes-only lower bound)")


if __name__ == "__main__":
    main()
