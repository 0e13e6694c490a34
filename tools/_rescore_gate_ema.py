"""Re-score a converged_parity ours-arm run at its FINAL EMA (round-5
protocol fix: the tool had scored ours at the best-VAL deploy checkpoint
while the reference arm was scored at its final ModelEMA — asymmetric).

Usage: python tools/_rescore_gate_ema.py <run_out_dir>  (e.g.
/tmp/gates_r5/fourier_s0/fourier) — reads ours/ckpt (latest step),
mini_model.yaml and data/, prints the corrected ours val + train-split
metrics under the gate protocol.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from parity_kit import PROTOCOL


def main(out_dir, img=96, batch=8):
    import orbax.checkpoint as ocp
    import yaml

    from mmidet_tpu.data.datasets import PairedDataset, load_data_yaml
    from mmidet_tpu.data.loader import RectLoader
    from mmidet_tpu.eval.evaluator import evaluate
    from mmidet_tpu.models.detector import TwoStreamDetector
    from mmidet_tpu.models.spec import load_yolo_yaml

    data = load_data_yaml(os.path.join(out_dir, "data", "synthetic.yaml"))
    spec = load_yolo_yaml(os.path.join(out_dir, "mini_model.yaml"),
                          nc=int(data["nc"]))
    model = TwoStreamDetector(spec=spec, use_cem=True, aux_mode="off",
                              dtype=jnp.float32)
    ckpt_dir = os.path.abspath(os.path.join(out_dir, "ours", "ckpt"))
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = mgr.latest_step()
        raw = mgr.restore(step, args=ocp.args.Composite(
            state=ocp.args.StandardRestore()))["state"]
    ema = raw["ema"]
    variables = {"params": ema["params"], "batch_stats": ema["batch_stats"]}
    print(f"restored step {step} from {ckpt_dir}", file=sys.stderr)

    def _eval(rgb_dir, ir_dir):
        ds = PairedDataset(rgb_dir, ir_dir, nc=int(data["nc"]))
        ev = evaluate(model, variables, RectLoader(ds, batch, img),
                      int(data["nc"]), conf_thres=PROTOCOL["conf_thres"],
                      iou_thres=PROTOCOL["iou_thres"],
                      names=data.get("names"), verbose=False)
        return {"P": ev.mp, "R": ev.mr, "mAP50": ev.map50,
                "mAP75": ev.map75, "mAP": ev.map}

    out = _eval(data["val_rgb"], data["val_ir"])
    out["train_split"] = _eval(data["train_rgb"], data["train_ir"])
    print(json.dumps(out))


if __name__ == "__main__":
    main(sys.argv[1], img=int(sys.argv[2]) if len(sys.argv) > 2 else 96)
