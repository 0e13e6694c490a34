"""One-command mAP parity check against the PyTorch reference (MMI-Det).

The acceptance gate (BASELINE.json) is mAP@50 within 0.5 of the reference
on M3FD with the released checkpoint.  This kit runs BOTH frameworks on the
same weights + data under the same protocol (rect=True, pad 0.5, conf 0.001,
iou 0.6 — reference test.py:21-93) and prints the side-by-side table:

  # the moment the released .pt + M3FD root exist on disk:
  python tools/parity_kit.py --weights best.pt --data /path/to/M3FD
  # bounded CPU-time spot check on the first N pairs:
  python tools/parity_kit.py --weights best.pt --data M3FD.yaml --max-images 64
  # end-to-end validation of the kit itself, no real assets needed:
  python tools/parity_kit.py --dry-run

--data takes either a reference data yaml (train_rgb/val_rgb/... keys,
data/multispectral/M3FD_8_2.yaml) or an M3FD-style root directory
(RGBimages/val_8_2, IRimages/val_8_2, labels/val_8_2).

The reference side runs the ACTUAL reference eval (`test.test`) on CPU; the
only substitutions are import stubs for packages absent from this image
(thop/torchsummary) and a pure-torch greedy NMS standing in for
torchvision.ops.nms (same semantics: descending-score greedy suppression at
an IoU threshold).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
DEFAULT_REF = "/root/reference"

PROTOCOL = dict(conf_thres=0.001, iou_thres=0.6)  # ref test.py defaults
GATE_MAP50 = 0.5  # acceptance: |our mAP50 - ref mAP50| * 100 <= 0.5 points


# ---------------------------------------------------------------- reference
def _torch_greedy_nms(boxes, scores, iou_threshold):
    """Pure-torch torchvision.ops.nms replacement (exact greedy semantics:
    keep by descending score, drop IoU > thr vs any kept box)."""
    import torch
    order = scores.argsort(descending=True)
    boxes = boxes[order]
    keep = []
    area = (boxes[:, 2] - boxes[:, 0]).clamp(min=0) * \
           (boxes[:, 3] - boxes[:, 1]).clamp(min=0)
    suppressed = torch.zeros(len(boxes), dtype=torch.bool)
    for i in range(len(boxes)):
        if suppressed[i]:
            continue
        keep.append(order[i])
        lt = torch.maximum(boxes[i, :2], boxes[i + 1:, :2])
        rb = torch.minimum(boxes[i, 2:], boxes[i + 1:, 2:])
        inter = (rb - lt).clamp(min=0).prod(dim=1)
        iou = inter / (area[i] + area[i + 1:] - inter + 1e-12)
        suppressed[i + 1:] |= iou > iou_threshold
    return torch.stack(keep) if keep else \
        torch.zeros(0, dtype=torch.long)


def install_reference(ref_repo: str):
    """Make the reference repo importable on this image: path + stubs for
    absent deps (thop/torchsummary; torchvision with a WORKING pure-torch
    nms) + the CPU .view fallback its GPT1_fourier needs
    (common.py:482 calls .view on a non-contiguous tensor)."""
    import torch
    if ref_repo not in sys.path:
        sys.path.insert(0, ref_repo)
    for name in ("thop", "torchsummary"):
        if name not in sys.modules:
            stub = types.ModuleType(name)
            stub.profile = lambda *a, **k: (0.0, 0.0)
            stub.clever_format = lambda *a, **k: ("0", "0")
            stub.summary = lambda *a, **k: None
            sys.modules[name] = stub
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        for sub in ("ops", "models", "utils", "transforms"):
            mod = types.ModuleType(f"torchvision.{sub}")
            setattr(tv, sub, mod)
            sys.modules[f"torchvision.{sub}"] = mod
        tv.ops.nms = _torch_greedy_nms
        tv.__version__ = "0.0-stub"
        sys.modules["torchvision"] = tv

    orig_view = torch.Tensor.view

    def safe_view(self, *shape):
        try:
            return orig_view(self, *shape)
        except RuntimeError:
            return self.reshape(*shape)

    torch.Tensor.view = safe_view

    # the reference targets torch<=1.x, whose torch.load default was
    # weights_only=False; its checkpoints pickle whole nn.Modules
    # (train.py:881-899), which torch>=2.6 refuses by default
    if not getattr(torch.load, "_parity_kit_patched", False):
        orig_load = torch.load

        def legacy_load(*a, **k):
            k.setdefault("weights_only", False)
            return orig_load(*a, **k)

        legacy_load._parity_kit_patched = True
        torch.load = legacy_load


def run_reference(weights: str, data: dict, img: int, batch: int,
                  ref_repo: str) -> dict:
    """The reference's own eval protocol (test.test, test.py:21-308) on CPU."""
    install_reference(ref_repo)
    import test as ref_test  # reference test.py

    opt = argparse.Namespace(
        task="val", device="cpu", single_cls=False, project="/tmp/ref_val",
        name="exp", exist_ok=True, verbose=False, save_txt=False,
        save_hybrid=False, save_conf=False, save_json=False, augment=False)
    (res, maps, t) = ref_test.test(
        dict(data), weights=weights, batch_size=batch, imgsz=img,
        conf_thres=PROTOCOL["conf_thres"], iou_thres=PROTOCOL["iou_thres"],
        opt=opt, half_precision=False, plots=False)
    mp, mr, map50, map75, mAP = res[:5]
    return {"P": float(mp), "R": float(mr), "mAP50": float(map50),
            "mAP75": float(map75), "mAP": float(mAP)}


# --------------------------------------------------------------------- ours
def run_ours(cfg, weights: str, data: dict, img: int, batch: int,
             ref_repo: str) -> dict:
    """Our eval under the same protocol (rect, pad 0.5, scale-down-only
    letterbox) with weights converted from the same .pt."""
    import jax
    # the reference side runs on CPU; ours must too for an apples-to-apples
    # f32 comparison — and this image's axon TPU plugin HANGS device init
    # when the relay is down, so never let it be the default backend here
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from mmidet_tpu.data.datasets import PairedDataset
    from mmidet_tpu.data.loader import RectLoader
    from mmidet_tpu.eval.evaluator import evaluate
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.spec import load_yolo_yaml
    from mmidet_tpu.models.zoo import get_model_spec
    from mmidet_tpu.train.checkpoint import (convert_torch_state_dict,
                                             load_torch_checkpoint)

    nc = int(data["nc"])
    if isinstance(cfg, dict) or str(cfg).endswith((".yaml", ".yml")):
        spec = load_yolo_yaml(cfg, nc=nc)
    else:
        spec = get_model_spec(cfg, nc=nc)
    # f32 eval for an apples-to-apples CPU comparison with the reference
    # run (half_precision is off there too); on TPU use cli/val.py (bf16)
    model = TwoStreamDetector(spec=spec, use_cem=True, aux_mode="off",
                              dtype=jnp.float32)
    small = jnp.zeros((1, 64, 64, 3), jnp.float32)
    template = model.init({"params": jax.random.PRNGKey(0)}, small, small,
                          train=False)
    sd = load_torch_checkpoint(weights, reference_repo=ref_repo)
    variables = convert_torch_state_dict(template, sd, strict=False)

    ds = PairedDataset(data["val_rgb"], data["val_ir"], nc=nc)
    loader = RectLoader(ds, batch, img)
    res = evaluate(model, variables, loader, nc,
                   conf_thres=PROTOCOL["conf_thres"],
                   iou_thres=PROTOCOL["iou_thres"],
                   names=data.get("names"), verbose=False)
    return {"P": res.mp, "R": res.mr, "mAP50": res.map50,
            "mAP75": res.map75, "mAP": res.map}


# --------------------------------------------------------------------- data
def resolve_data(data_arg: str, max_images: int | None,
                 tmp: str) -> dict:
    """--data yaml or M3FD-style root -> data dict; optionally subset the
    val split to the first N pairs via a symlinked tree (bounds the CPU
    reference run, which is minutes/image at 640px l-scale)."""
    import yaml
    if os.path.isdir(data_arg):
        root = data_arg
        splits = [s for s in ("val_8_2", "val", "test") if
                  os.path.isdir(os.path.join(root, "RGBimages", s))]
        if not splits:
            raise FileNotFoundError(
                f"{root}: no RGBimages/<val_8_2|val|test> split found")
        sp = splits[0]
        data = {"val_rgb": os.path.join(root, "RGBimages", sp),
                "val_ir": os.path.join(root, "IRimages", sp),
                "nc": 6,
                "names": ["People", "Car", "Bus", "Lamp", "Motorcycle",
                          "Truck"]}
    else:
        with open(data_arg) as fh:
            data = yaml.safe_load(fh)
    if max_images:
        data = dict(data, **_subset(data, max_images, tmp))
    return data


def _subset(data: dict, n: int, tmp: str) -> dict:
    from mmidet_tpu.data.datasets import img2label_path, list_images
    out = {}
    for key, dirname in (("val_rgb", "RGBimages"), ("val_ir", "IRimages")):
        src_files = list_images(data[key])[:n]
        img_dir = os.path.join(tmp, "subset", dirname, "val")
        lab_dir = os.path.join(tmp, "subset", "labels", "val")
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(lab_dir, exist_ok=True)
        for f in src_files:
            dst = os.path.join(img_dir, os.path.basename(f))
            if not os.path.exists(dst):
                os.symlink(os.path.abspath(f), dst)
            lab = img2label_path(os.path.abspath(f))
            dlab = os.path.join(lab_dir, os.path.basename(lab))
            if os.path.exists(lab) and not os.path.exists(dlab):
                os.symlink(lab, dlab)
        out[key] = img_dir
    return out


# ------------------------------------------------------------------ dry run
def make_dryrun_assets(tmp: str, ref_repo: str, n: int = 8,
                       img: int = 96) -> tuple[str, dict, dict]:
    """Synthesize everything the kit needs: a tiny paired dataset in the
    reference's M3FD layout (RGBimages/IRimages/shared labels) and a
    reference-format .pt of a random-init MINIATURE two-stream model (the
    flagship grammar at 1/16 width — tests/test_torch_parity.py MINI_CFG,
    whose converted-forward parity is already pinned by that suite)."""
    import copy
    import numpy as np
    import torch

    from mmidet_tpu.data.synthetic import make_synthetic_pair_dataset

    make_synthetic_pair_dataset(os.path.join(tmp, "synth"), n=n, img=img)
    # reshape into the M3FD layout the reference's img2label_paths expects
    for dirname, src_sub in (("RGBimages", "train_rgb"),
                             ("IRimages", "train_ir")):
        img_dir = os.path.join(tmp, "m3fd", dirname, "val")
        os.makedirs(img_dir, exist_ok=True)
        src = os.path.join(tmp, "synth", src_sub, "images")
        for f in sorted(os.listdir(src)):
            os.symlink(os.path.join(src, f), os.path.join(img_dir, f))
    lab_dir = os.path.join(tmp, "m3fd", "labels", "val")
    os.makedirs(lab_dir, exist_ok=True)
    src = os.path.join(tmp, "synth", "train_rgb", "labels")
    for f in sorted(os.listdir(src)):
        os.symlink(os.path.join(src, f), os.path.join(lab_dir, f))
    data = {"val_rgb": os.path.join(tmp, "m3fd", "RGBimages", "val"),
            "val_ir": os.path.join(tmp, "m3fd", "IRimages", "val"),
            "nc": 2, "names": ["box", "blob"]}

    install_reference(ref_repo)
    sys.path.insert(0, os.path.join(REPO, "tests"))
    from test_torch_parity import MINI_CFG  # single source of the mini cfg
    from models.yolo_test import Model  # reference import

    torch.manual_seed(0)
    m = Model(copy.deepcopy(MINI_CFG), ch=3, nc=2).float()
    m.names = data["names"]
    # briefly overfit the mini model on the synthetic set IN THE REFERENCE
    # framework: random weights give mAP 0 on both sides (the reference
    # zeroes its stats when there are no TPs, test.py:241), which would
    # validate nothing — a few SGD steps make the cross-framework mAP
    # comparison carry signal
    _fit_reference_model(m, data, img=64, steps=40)
    pt = os.path.join(tmp, "mini_ref.pt")
    torch.save({"model": m, "ema": None, "epoch": -1,
                "best_fitness": np.asarray([0.0]),
                "training_results": "", "optimizer": None,
                "wandb_id": None}, pt)
    cfg = {**copy.deepcopy(MINI_CFG),
           "head": [row if row[2] != "Detect" else
                    [row[0], row[1], "Detect", []]
                    for row in MINI_CFG["head"]]}
    return pt, data, cfg


def _fit_reference_model(m, data: dict, img: int, steps: int) -> None:
    """A few SGD steps with the reference's own loss/dataloader (CPU)."""
    import torch

    from utils.datasets import create_dataloader_rgb_ir  # reference imports
    from utils.loss import ComputeLoss

    opt_ns = argparse.Namespace(single_cls=False, task="val", device="cpu")
    dl = create_dataloader_rgb_ir(data["val_rgb"], data["val_ir"], img, 4,
                                  32, opt_ns, pad=0.5, rect=True)[0]
    m.train()
    m.hyp = {"box": 0.05, "obj": 1.0, "cls": 0.5, "cls_pw": 1.0,
             "obj_pw": 1.0, "anchor_t": 4.0, "fl_gamma": 0.0,
             "label_smoothing": 0.0}
    m.gr = 1.0
    compute_loss = ComputeLoss(m)
    opt = torch.optim.SGD(m.parameters(), lr=0.02, momentum=0.9)
    done = 0
    while done < steps:
        for imgs, targets, _, _ in dl:
            x = imgs.float() / 255.0
            pred, combine = m(x[:, :3], x[:, 3:])
            # 0-d -> (1,): the loss does len(CombineLoss) (loss.py:163)
            loss, _ = compute_loss(pred, targets, combine.reshape(-1),
                                   Flag=True)
            opt.zero_grad()
            loss.backward()
            opt.step()
            done += 1
            if done >= steps:
                break
    m.eval()


# --------------------------------------------------------------------- main
def main(argv=None):
    p = argparse.ArgumentParser("parity_kit")
    p.add_argument("--weights", type=str, default="",
                   help="released reference .pt (README.md:20-21)")
    p.add_argument("--data", type=str, default="",
                   help="reference data yaml or M3FD-style root dir")
    p.add_argument("--cfg", type=str, default="yolov5l_fuse3_fourier")
    p.add_argument("--img-size", type=int, default=640)
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--max-images", type=int, default=0,
                   help="evaluate only the first N pairs (symlinked subset)")
    p.add_argument("--ref", type=str, default=DEFAULT_REF)
    p.add_argument("--skip-reference", action="store_true",
                   help="run only our side (e.g. reference deps missing)")
    p.add_argument("--dry-run", action="store_true",
                   help="synthesize weights+data and validate the kit "
                        "end-to-end (no real assets needed)")
    args = p.parse_args(argv)

    tmp = tempfile.mkdtemp(prefix="parity_kit_")
    if args.dry_run:
        weights, data, cfg = make_dryrun_assets(tmp, args.ref)
        img, batch = 64, 4
    else:
        if not (args.weights and args.data):
            p.error("--weights and --data are required (or --dry-run)")
        weights, cfg = args.weights, args.cfg
        data = resolve_data(args.data, args.max_images or None, tmp)
        img, batch = args.img_size, args.batch_size

    ours = run_ours(cfg, weights, data, img, batch, args.ref)
    ref = None
    if not args.skip_reference:
        ref = run_reference(weights, data, img, batch, args.ref)

    print(f"\n{'':12s}{'P':>10s}{'R':>10s}{'mAP50':>10s}{'mAP75':>10s}"
          f"{'mAP':>10s}")
    print("ours (TPU)  " + "".join(f"{ours[k]:10.4f}" for k in
                                   ("P", "R", "mAP50", "mAP75", "mAP")))
    if ref is not None:
        print("reference   " + "".join(f"{ref[k]:10.4f}" for k in
                                       ("P", "R", "mAP50", "mAP75", "mAP")))
        delta = abs(ours["mAP50"] - ref["mAP50"]) * 100
        ok = delta <= GATE_MAP50
        print(f"\nmAP50 delta: {delta:.3f} points "
              f"({'PASS' if ok else 'FAIL'}, gate {GATE_MAP50})")
        print(json.dumps({"ours": ours, "reference": ref,
                          "map50_delta_points": round(delta, 4),
                          "pass": ok}))
        return 0 if ok else 1
    print(json.dumps({"ours": ours}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
