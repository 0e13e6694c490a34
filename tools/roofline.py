"""Composite per-stage roofline for the 2000 img/s target (VERDICT r4 #4).

For each pipeline stage: floor = max(bytes / BW, flops / ceiling), using
ONLY measured ceilings from PERF.md's hardware calibration:

  * BW          = 819 GB/s   (HBM roofline, XLA cost analysis vs wall-clock)
  * MXU_PEAK    = 155 TFLOP/s (8kx8k bf16 matmul, ~chip peak — the most
                  OPTIMISTIC compute ceiling; using it makes the bound
                  conservative/lower, i.e. harder to prove infeasibility)
  * SMALLC_CONV = 58 TFLOP/s  (64-ch 3x3 conv stack @320px — the measured
                  effective ceiling for lane-padded small-channel convs;
                  applied to the CEM's 3/24-channel full-res convs)

Alongside each closed-form floor the table carries the MEASURED stage time
(tools/ablate_bench.py wall-clock ablation, batch 128 @640, real v5e) and
the MEASURED KERNEL PLATEAU for the fusion slice — the empirical floor
after three independent Pallas formulations (stacked-head, mega-kernel,
merge-kernel) and XLA all converged (PERF.md round-1-cont./round-2): a
plateau is evidence, not arithmetic, so it is listed in its own column and
the composite is reported BOTH ways (closed-form only, and with the
plateau substituted where it exceeds the closed form).

Measured stage wall-clock anchors (ms/img, = ms/batch128 / 128):
  conv stack (add_no_cem ablation)  30.7 / 128 = 0.240
  CEM                               17.7 / 128 = 0.138
  fusion slice (GPT x4 + glue)      35.3 / 128 = 0.276
  Detect decode                      2.4 / 128 = 0.019
  (headline total 0.628 ms/img at 1592.7-1601.8 img/s; the slice sum 0.673
   exceeds it because ablation deltas double-count some overlap)

Usage: python tools/roofline.py [scale=s] [variant=gpt4] [img=640]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from floor_table import BW_GBS, model_floor  # noqa: E402

MXU_PEAK_TFLOPS = 155.0    # measured 8kx8k bf16 matmul (PERF.md calibration)
SMALLC_TFLOPS = 58.0       # measured 64-ch conv ceiling (PERF.md calibration)
TARGET_MS = 0.5            # 2000 img/s north star

# measured stage wall-clock (ms/img) and the fusion kernel plateau
MEASURED = {
    "conv stack": 30.7 / 128,
    "CEM": 17.7 / 128,
    "fusion+glue": 35.3 / 128,
    "Detect+decode": 2.4 / 128,
}
# 8-layer token-transformer stack: 21.1 ms/b128 XLA, 20.3 ms/b128 best
# Pallas (stacked-head) — the cross-formulation plateau, x4 levels total
FUSION_PLATEAU_MS = 20.3 / 128
# pool/resize + Add2 glue inside the fusion slice, measured ablation split
FUSION_GLUE_MEASURED_MS = (8.6 + 5.0) / 128


def main():
    scale = sys.argv[1] if len(sys.argv) > 1 else "s"
    variant = sys.argv[2] if len(sys.argv) > 2 else "gpt4"
    img = int(sys.argv[3]) if len(sys.argv) > 3 else 640
    spec, stages, s8_elig, flops = model_floor(scale, variant, img)

    groups = {}

    def acc(g, k):
        b, f = stages[k], flops.get(k, 0.0)
        e = groups.setdefault(g, [0.0, 0.0])
        e[0] += b
        e[1] += f

    for k in stages:
        if s8_elig.get(k):
            acc("conv stack", k)
        elif k.startswith(("GPT", "Mamba")):
            acc("fusion", k)
        elif k.startswith("glue"):
            acc("glue", k)
        elif k.startswith("CEM"):
            acc("CEM", k)
        elif k.startswith("Detect"):
            acc("Detect+decode", k)
        else:
            acc("input read", k)

    ceil = {"conv stack": MXU_PEAK_TFLOPS, "fusion": MXU_PEAK_TFLOPS,
            "glue": MXU_PEAK_TFLOPS, "CEM": SMALLC_TFLOPS,
            "Detect+decode": MXU_PEAK_TFLOPS,
            "input read": MXU_PEAK_TFLOPS}
    meas = {"conv stack": MEASURED["conv stack"], "CEM": MEASURED["CEM"],
            "fusion": MEASURED["fusion+glue"] - FUSION_GLUE_MEASURED_MS,
            "glue": FUSION_GLUE_MEASURED_MS,
            "Detect+decode": MEASURED["Detect+decode"],
            "input read": float("nan")}
    plateau = {"fusion": FUSION_PLATEAU_MS}

    print(f"# Composite roofline, yolov5{scale} {variant} @{img}px, "
          f"per image (ms)")
    print(f"# bytes/{BW_GBS:.0f} GB/s | flops/measured ceiling | "
          f"floor = max | measured | plateau (fusion only)")
    hdr = (f"{'stage':15s}{'GB':>7s}{'bytes ms':>9s}{'GFLOP':>8s}"
           f"{'@TF/s':>7s}{'flop ms':>9s}{'floor':>8s}{'meas':>7s}"
           f"{'plateau':>9s}")
    print(hdr)
    tot_floor = tot_floor_plateau = tot_meas = 0.0
    order = ["conv stack", "CEM", "fusion", "glue", "Detect+decode",
             "input read"]
    for g in order:
        if g not in groups:
            continue
        elems, fl = groups[g]
        gb = elems * 2 / 1e9
        b_ms = gb * 1e3 / BW_GBS
        gf = fl / 1e9
        f_ms = gf / ceil[g]
        floor = max(b_ms, f_ms)
        pl = max(floor, plateau.get(g, 0.0))
        tot_floor += floor
        tot_floor_plateau += pl
        m = meas.get(g, float("nan"))
        if m == m:
            tot_meas += m
        print(f"{g:15s}{gb:7.3f}{b_ms:9.4f}{gf:8.2f}{ceil[g]:7.0f}"
              f"{f_ms:9.4f}{floor:8.4f}{m:7.3f}"
              f"{plateau.get(g, float('nan')):9.4f}")
    print(f"{'SUM':15s}{'':7s}{'':9s}{'':8s}{'':7s}{'':9s}"
          f"{tot_floor:8.4f}{tot_meas:7.3f}{tot_floor_plateau:9.4f}")
    print()
    print(f"closed-form composite floor : {tot_floor:.4f} ms/img "
          f"({1e3 / tot_floor:,.0f} img/s ceiling)")
    print(f"with fusion plateau         : {tot_floor_plateau:.4f} ms/img "
          f"({1e3 / tot_floor_plateau:,.0f} img/s ceiling)")
    print(f"target (2000 img/s)         : {TARGET_MS:.4f} ms/img")
    print(f"measured headline           : 0.628 ms/img (1592.7-1601.8 "
          f"img/s official captures)")
    if tot_floor_plateau > TARGET_MS:
        print("VERDICT: 2000 img/s at this config on one v5e is "
              "INFEASIBLE — the composite floor (with the thrice-probed "
              "fusion plateau) exceeds the target budget; the headline "
              f"sits at {tot_floor_plateau / 0.628 * 100:.0f}% of the "
              "composite bound.")
    else:
        print("VERDICT: the composite floor is inside the target budget — "
              "a lever remains; the largest floor-vs-measured gap is the "
              "next target.")


if __name__ == "__main__":
    main()
