"""s8-storage deploy accuracy gate (VERDICT r3 #6): train a model to
convergence on the synthetic paired set, then evaluate the SAME weights
through the float deploy path and the `--int8` (s8store) path under the
gate protocol, and report the mAP50 delta.

CPU-scale findings (2026-08-20, proto runs; recorded in PERF.md):
the delta is NOISE-dominated until the model is strongly converged —
yolov5t_add @64px trained 250 ep (mAP50 0.30): delta +0.019 (int8 worse);
700 ep (mAP50 0.54, train-split eval): delta -0.016 (int8 BETTER).  The
sign flip shows activation rounding jitters borderline matches rather
than degrading systematically.  The chip-scale run (this tool on the
real TPU: s-scale, more epochs, higher mAP ceiling) is the official gate
record.

Usage: python tools/s8_gate.py [--epochs 300] [--img 160] [--scale t]
       [--gate 0.02] [--n 8] [--stage]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser("s8_gate")
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--img", type=int, default=160)
    ap.add_argument("--scale", type=str, default="s")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=8, help="train images")
    ap.add_argument("--gate", type=float, default=0.02,
                    help="|mAP50 delta| bound to assert")
    ap.add_argument("--dtype", type=str, default="float32")
    ap.add_argument("--out", type=str, default="/tmp/s8_gate")
    ap.add_argument("--stage", action="store_true",
                    help="append the record to BENCH_partial.json")
    ap.add_argument("--warmup-floor", type=int, default=50,
                    help="warmup iteration floor (the trainer's "
                         "reference-faithful default of 1000 swallows "
                         "whole short runs at 1 step/epoch)")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
    from mmidet_tpu.data.loader import RectLoader
    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    from mmidet_tpu.eval.evaluator import evaluate
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.nn.quant import make_quant_deploy
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
        aux_mode="off", mosaic_prob=0.0, dtype=args.dtype,
        eval_every=args.epochs, seed=0, autoanchor=False, notest=True,
        nosave=True, exist_ok=True, warmup_floor=args.warmup_floor)
    res = trainer.train(cfg)
    print(f"trained: internal mAP50 {res['last_results'].map50:.4f}",
          flush=True)

    dtype = jnp.float32 if args.dtype == "float32" else jnp.bfloat16
    model = TwoStreamDetector(spec=res["spec"], aux_mode="off", dtype=dtype)
    data = load_data_yaml(yaml_path)

    def loader():
        ds = PairedDataset(data["val_rgb"], data["val_ir"],
                           nc=int(data["nc"]))
        return ds, RectLoader(ds, args.batch, args.img)

    ds, ld = loader()
    ev_f = evaluate(model, res["deploy"], ld, int(data["nc"]),
                    conf_thres=0.001, iou_thres=0.6)
    calib = next(iter(loader()[1]))
    rgb = jnp.asarray(calib["rgb"], jnp.float32) / 255.0
    ir = jnp.asarray(calib["ir"], jnp.float32) / 255.0
    qm, qv = make_quant_deploy(model, res["deploy"], [(rgb, ir)])
    ev_q = evaluate(qm, qv, loader()[1], int(data["nc"]),
                    conf_thres=0.001, iou_thres=0.6)

    delta = ev_q.map50 - ev_f.map50
    record = {
        "metric": f"s8_gate_yolov5{args.scale}_add_{args.img}",
        "float_map50": round(ev_f.map50, 4),
        "int8_map50": round(ev_q.map50, 4),
        "delta": round(delta, 4),
        "epochs": args.epochs,
        "device": jax.devices()[0].device_kind,
        "pass": abs(delta) <= args.gate,
    }
    print(json.dumps(record), flush=True)
    if args.stage:
        import bench
        bench._stage_partial(dict(record, value=round(abs(delta), 4),
                                  unit="mAP50_delta", vs_baseline=-1.0))
    return 0 if record["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
