"""Measured A/B of the round-2 exactness fixes on REAL training dynamics.

Round 2 made two training-path semantics reference-EXACT, both pinned by
oracles but never A/B'd through an actual train run (VERDICT round-2,
Missing #4 / Next #5):

  * mosaic placement: letterbox content pads ride the batch and anchor at
    the mosaic center (reference utils/datasets.py:1764-1913) vs round 1's
    full-tile anchoring (``pads4=None``);
  * duplicate-cell objectness: last-write-wins (reference
    utils/loss.py:249) vs round 1's scatter-max
    (``losses.detection.OBJ_DUP_MODE``).

This tool trains the SAME synthetic paired set twice — exact vs legacy
semantics, everything else identical — and reports final mAP50/mAP per
arm (optionally over multiple seeds).  Result table lands in PARITY.md.

Usage: python tools/ab_exactness.py [--epochs 150] [--img 128]
       [--seeds 1] [--scale t] [--out /tmp/ab]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_arm(arm: str, data_yaml: str, args, seed: int) -> dict:
    """One training run; returns {'map50': .., 'map': ..}."""
    import jax

    from mmidet_tpu.losses import detection
    from mmidet_tpu.train import trainer

    detection.OBJ_DUP_MODE = "last" if arm == "exact" else "max"

    orig_mba = trainer.make_batch_augment
    if arm == "legacy":
        # round-1 mosaic geometry: drop the letterbox placement pads so
        # tiles anchor full-size at the mosaic center
        def legacy_mba(img_size, hyp, max_labels, mosaic=True):
            fn = orig_mba(img_size, hyp, max_labels, mosaic=mosaic)
            def wrapped(batch, key):
                batch = {k: v for k, v in batch.items() if k != "pads4"}
                return fn(batch, key)
            return wrapped
        trainer.make_batch_augment = legacy_mba
    try:
        cfg = trainer.TrainConfig(
            model=f"yolov5{args.scale}_add", data=data_yaml,
            epochs=args.epochs, batch_size=args.batch,
            img_size=args.img, max_labels=30,
            workdir=os.path.join(args.out, f"{arm}_s{seed}"),
            aux_mode="off", eval_every=args.epochs,  # eval at the end
            seed=seed, autoanchor=False, notest=True, nosave=True,
            exist_ok=True, dtype=args.dtype)
        res = trainer.train(cfg)
        last = res["last_results"]
        return {"map50": float(last.map50), "map": float(last.map),
                "p": float(last.mp), "r": float(last.mr)}
    finally:
        trainer.make_batch_augment = orig_mba
        detection.OBJ_DUP_MODE = "last"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--img", type=int, default=128)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=1)
    ap.add_argument("--seed-base", type=int, default=0,
                    help="first seed (arms run seeds seed_base..+seeds-1)")
    ap.add_argument("--scale", type=str, default="t")
    ap.add_argument("--n-train", type=int, default=16)
    ap.add_argument("--dtype", type=str, default="bfloat16")
    ap.add_argument("--out", type=str, default="/tmp/ab_exactness")
    args = ap.parse_args()

    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset
    os.makedirs(args.out, exist_ok=True)
    droot = os.path.join(args.out, "data")
    yaml_path = make_synthetic_pair_dataset(droot, n=args.n_train,
                                            img=160, split="train")
    make_synthetic_pair_dataset(droot, n=8, img=160, seed=1, split="val")

    results = {}
    for arm in ("exact", "legacy"):
        per_seed = []
        for seed in range(args.seed_base, args.seed_base + args.seeds):
            r = run_arm(arm, yaml_path, args, seed)
            per_seed.append(r)
            print(f"[{arm} seed {seed}] mAP50={r['map50']:.4f} "
                  f"mAP={r['map']:.4f}", flush=True)
        results[arm] = per_seed

    import numpy as np
    summary = {
        arm: {k: round(float(np.mean([r[k] for r in rs])), 4)
              for k in ("map50", "map", "p", "r")}
        for arm, rs in results.items()}
    summary["delta_map50"] = round(
        summary["exact"]["map50"] - summary["legacy"]["map50"], 4)
    summary["config"] = {"epochs": args.epochs, "img": args.img,
                         "batch": args.batch, "seeds": args.seeds,
                         "scale": args.scale, "n_train": args.n_train}
    out = os.path.join(args.out, "ab_result.json")
    with open(out, "w") as fh:
        json.dump({"per_seed": results, "summary": summary}, fh, indent=1)
    print(json.dumps(summary))
    print(f"full record -> {out}")


if __name__ == "__main__":
    main()
