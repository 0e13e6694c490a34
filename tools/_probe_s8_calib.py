"""Probe: why does s8-storage cost mAP50 on a CONVERGED model, and does
calibration clipping recover it?  (round 4: the first converged s8 gate
run measured float 0.7704 vs int8 0.7160, delta -0.0544 — far above the
weak-model "noise" deltas of +/-0.02.)

Trains one converged s-scale model (same recipe as tools/s8_gate.py),
then evaluates the int8 deploy path with the absmax-derived scales
multiplied by a clipping factor c in {1.0, 0.9, 0.8, 0.7, 0.5} and with
1 vs 4 calibration batches.  If accuracy recovers at c<1, the max
calibration is outlier-driven and a percentile calibration is the fix.

Usage: python tools/_probe_s8_calib.py [--epochs 1500] [--img 160]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser("_probe_s8_calib")
    ap.add_argument("--epochs", type=int, default=1500)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--scale", type=str, default="s")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--out", type=str, default="/tmp/s8_calib")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
    from mmidet_tpu.data.loader import RectLoader
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    from mmidet_tpu.eval.evaluator import evaluate
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.nn.fuse import fold_batchnorm
    from mmidet_tpu.nn.quant import calibrate_act_scales, quantized_variables
    from mmidet_tpu.train import trainer

    os.makedirs(args.out, exist_ok=True)
    yaml_path = make_synthetic_pair_dataset(
        os.path.join(args.out, "data"), n=args.n, img=args.img + 32)
    aug_off = dict(degrees=0.0, translate=0.0, scale=0.0, shear=0.0,
                   perspective=0.0, hsv_h=0.0, hsv_s=0.0, hsv_v=0.0,
                   fliplr=0.0, flipud=0.0, mosaic=0.0, mixup=0.0)
    cfg = trainer.TrainConfig(
        model=f"yolov5{args.scale}_add", data=yaml_path, hyp=aug_off,
        epochs=args.epochs, batch_size=args.batch, img_size=args.img,
        max_labels=30, workdir=os.path.join(args.out, "run"),
        aux_mode="off", mosaic_prob=0.0, dtype="float32",
        eval_every=args.epochs, seed=0, autoanchor=False, notest=True,
        nosave=True, exist_ok=True, warmup_floor=50)
    res = trainer.train(cfg)
    print(f"trained: internal mAP50 {res['last_results'].map50:.4f}",
          flush=True)

    model = TwoStreamDetector(spec=res["spec"], aux_mode="off",
                              dtype=jnp.float32)
    data = load_data_yaml(yaml_path)
    nc = int(data["nc"])
    ds = PairedDataset(data["val_rgb"], data["val_ir"], nc=nc)

    def fresh_loader():
        return RectLoader(ds, args.batch, args.img)

    ev_f = evaluate(model, res["deploy"], fresh_loader(), nc,
                    conf_thres=0.001, iou_thres=0.6, verbose=False)
    print(f"float deploy: mAP50 {ev_f.map50:.4f}", flush=True)

    folded = fold_batchnorm(res["deploy"]) \
        if "batch_stats" in res["deploy"] else res["deploy"]
    f_model = model.clone(fused=True, quant=False)
    q_model = model.clone(fused=True, quant=True)

    def calib_batches(k):
        out = []
        for i, b in enumerate(fresh_loader()):
            if i >= k:
                break
            out.append((jnp.asarray(b["rgb"], jnp.float32) / 255.0,
                        jnp.asarray(b["ir"], jnp.float32) / 255.0))
        return out

    records = []
    for nb_cal in (1, 4):
        qcol0 = calibrate_act_scales(f_model, folded, calib_batches(nb_cal))
        for c in (1.0, 0.9, 0.8, 0.7, 0.5):
            qcol = jax.tree_util.tree_map(lambda s: s * c, qcol0)
            qv = quantized_variables(folded, qcol)
            ev_q = evaluate(q_model, qv, fresh_loader(), nc,
                            conf_thres=0.001, iou_thres=0.6, verbose=False)
            rec = {"calib_batches": nb_cal, "clip": c,
                   "map50": round(ev_q.map50, 4),
                   "delta": round(ev_q.map50 - ev_f.map50, 4)}
            records.append(rec)
            print(json.dumps(rec), flush=True)

    best = max(records, key=lambda r: r["map50"])
    print(json.dumps({"float": round(ev_f.map50, 4), "best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
