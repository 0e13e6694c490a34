"""Evaluation CLI — the reference ``test.py`` surface (test.py:311-384):
mAP table, --task speed benchmark, --task study resolution sweep."""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp

from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
from mmidet_tpu.data.loader import PairedLoader, RectLoader
from mmidet_tpu.eval.evaluator import evaluate
from mmidet_tpu.models.detector import TwoStreamDetector
from mmidet_tpu.models.spec import load_yolo_yaml
from mmidet_tpu.models.zoo import get_model_spec
from mmidet_tpu.utils.general import set_logging


def load_model_and_vars(model_name: str, weights: str, nc: int,
                        dtype=jnp.bfloat16, use_cem: bool = True):
    """Build model + load deploy variables from an orbax dir, a torch .pt
    (converted), or fresh init."""
    spec = load_yolo_yaml(model_name, nc=nc) \
        if model_name.endswith((".yaml", ".yml")) \
        else get_model_spec(model_name, nc=nc)
    model = TwoStreamDetector(spec=spec, use_cem=use_cem, aux_mode="off",
                              dtype=dtype)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, small, small,
                          train=False)
    if not weights:
        return model, template, spec
    if weights.endswith(".pt"):
        from mmidet_tpu.train.checkpoint import (convert_torch_state_dict,
                                                 load_torch_checkpoint)
        sd = load_torch_checkpoint(weights, reference_repo=None)
        variables = convert_torch_state_dict(template, sd, strict=False)
        return model, variables, spec
    # orbax deploy dir: {params, batch_stats} via StandardRestore
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        variables = ckptr.restore(weights, template)
    return model, variables, spec


def build_parser():
    p = argparse.ArgumentParser("mmidet-tpu val")
    p.add_argument("--weights", type=str, default="")
    p.add_argument("--cfg", type=str, default="yolov5l_fuse3_fourier")
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--conf-thres", type=float, default=0.001)
    p.add_argument("--iou-thres", type=float, default=0.6)
    p.add_argument("--task", type=str, default="val",
                   choices=["val", "test", "speed", "study"])
    p.add_argument("--verbose", action="store_true")
    p.add_argument("--merge", action="store_true",
                   help="merge-NMS: weighted-mean box merging (ref "
                        "general.py:566-574)")
    p.add_argument("--save-json", type=str, default="",
                   help="dump COCO-format detections to this path")
    p.add_argument("--coco91", action="store_true",
                   help="map class ids to COCO-paper 91-index ids in the "
                        "JSON (ref coco80_to_coco91_class)")
    p.add_argument("--rect", action="store_true",
                   help="aspect-bucketed rectangular eval (reference "
                        "rect=True pad=0.5)")
    p.add_argument("--augment", action="store_true",
                   help="TTA eval (3 scale/flip passes, ref --augment)")
    p.add_argument("--single-cls", action="store_true",
                   help="treat as single-class dataset")
    p.add_argument("--save-txt", action="store_true",
                   help="save per-image predictions to "
                        "<project>/<name>/labels/*.txt")
    p.add_argument("--save-conf", action="store_true",
                   help="append confidences in --save-txt rows")
    p.add_argument("--save-hybrid", action="store_true",
                   help="append ground-truth labels in --save-txt rows")
    p.add_argument("--project", type=str, default="runs/test")
    p.add_argument("--name", type=str, default="exp")
    p.add_argument("--exist-ok", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="s8-storage quantized deploy (activations cross "
                        "HBM as int8; scales calibrated on the first val "
                        "batch — see nn/quant.py)")
    p.add_argument("--int8-clip", type=float, default=1.0,
                   help="calibration absmax clip for --int8 (0.9 measured "
                        "best on a converged model, PERF.md round 4)")
    return p


def _apply_int8(model, variables, ds, img_size: int, clip: float = 1.0):
    """Fold + calibrate on the first val batch -> (q_model, q_vars)."""
    import jax.numpy as jnp
    from mmidet_tpu.data.loader import PairedLoader
    from mmidet_tpu.nn.quant import make_quant_deploy
    calib = next(iter(PairedLoader(ds, min(4, len(ds)), img_size,
                                   drop_last=False, scaleup=False)))
    rgb = jnp.asarray(calib["rgb"], jnp.float32) / 255.0
    ir = jnp.asarray(calib["ir"], jnp.float32) / 255.0
    return make_quant_deploy(model, variables, [(rgb, ir)], clip=clip)


def main(argv=None):
    set_logging()
    args = build_parser().parse_args(argv)
    data = load_data_yaml(args.data)
    nc = 1 if args.single_cls else int(data["nc"])
    names = ["item"] if args.single_cls else data.get("names")
    model, variables, spec = load_model_and_vars(args.cfg, args.weights, nc)
    ds = PairedDataset(data["val_rgb"], data["val_ir"],
                       nc=None if args.single_cls else nc)
    if args.single_cls:  # collapse labels (ref --single-cls)
        for lab in ds.labels:
            if len(lab):
                lab[:, 0] = 0.0
    if args.int8:
        model, variables = _apply_int8(model, variables, ds, args.img_size,
                                       clip=args.int8_clip)

    if args.task in ("val", "test"):
        import os
        from mmidet_tpu.utils.general import increment_path
        out_dir = None
        if args.save_txt:
            out_dir = increment_path(os.path.join(args.project, args.name),
                                     args.exist_ok)
        # scaleup=False: reference val-time letterbox only scales DOWN
        # (datasets.py:1484-1487)
        loader = RectLoader(ds, args.batch_size, args.img_size) \
            if args.rect else PairedLoader(ds, args.batch_size,
                                           args.img_size, drop_last=False,
                                           scaleup=False)
        res = evaluate(model, variables, loader, nc,
                       conf_thres=args.conf_thres, iou_thres=args.iou_thres,
                       names=names, verbose=True,
                       save_json=args.save_json or None,
                       augment=args.augment, coco91=args.coco91,
                       save_txt_dir=(os.path.join(out_dir, "labels")
                                     if out_dir else None),
                       save_conf=args.save_conf,
                       save_hybrid=args.save_hybrid, merge=args.merge)
        print(json.dumps({"P": res.mp, "R": res.mr, "mAP50": res.map50,
                          "mAP75": res.map75, "mAP": res.map,
                          "speed_ms": res.speed_ms[0]}))
        return res
    if args.task == "speed":
        # conf 0.25 / iou 0.45, timing only (ref test.py:367-369)
        loader = PairedLoader(ds, args.batch_size, args.img_size,
                              drop_last=False)
        res = evaluate(model, variables, loader, nc, conf_thres=0.25,
                       iou_thres=0.45, names=names)
        print(f"speed: {res.speed_ms[0]:.1f} ms/img inference")
        return res
    # study: resolution sweep 256..1536 step 128 (ref test.py:371-384)
    rows = []
    for sz in range(256, 1537, 128):
        loader = PairedLoader(ds, args.batch_size, sz, drop_last=False)
        res = evaluate(model, variables, loader, nc, names=names)
        rows.append((sz, res.map50, res.map, res.speed_ms[0]))
        print(f"{sz}: mAP50 {res.map50:.4f} mAP {res.map:.4f} "
              f"{res.speed_ms[0]:.1f} ms/img")
    return rows


if __name__ == "__main__":
    main()
