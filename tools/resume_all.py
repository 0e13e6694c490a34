#!/usr/bin/env python
"""Resume every interrupted training run found under a runs directory.

Functional parity surface: reference ``utils/aws/resume.py:1-37`` — the spot
-instance restart loop that scans for ``last.pt`` checkpoints and relaunches
training.  Here: any run dir with a ``ckpt/`` whose recorded epoch is short
of the configured epochs gets resumed (in-process, sequentially)."""

import argparse
import glob
import os

import yaml


def find_interrupted(search_dir: str):
    out = []
    for opt_path in glob.glob(os.path.join(search_dir, "**", "opt.yaml"),
                              recursive=True):
        workdir = os.path.dirname(opt_path)
        ckpt = os.path.join(workdir, "ckpt")
        if not os.path.isdir(ckpt):
            continue
        with open(opt_path) as fh:
            opt = yaml.safe_load(fh)
        steps = [int(os.path.basename(p)) for p in glob.glob(
            os.path.join(ckpt, "[0-9]*")) if os.path.basename(p).isdigit()]
        if not steps:
            continue
        last_epoch = max(steps)
        if last_epoch < int(opt.get("epochs", 0)) - 1:
            out.append((workdir, opt, last_epoch))
    return out


def main():
    p = argparse.ArgumentParser("resume interrupted runs")
    p.add_argument("search_dir", nargs="?", default="runs/train")
    p.add_argument("--dry-run", action="store_true")
    args = p.parse_args()
    from mmidet_tpu.train.trainer import TrainConfig, train
    todo = find_interrupted(args.search_dir)
    print(f"{len(todo)} interrupted run(s) found")
    for workdir, opt, last_epoch in todo:
        print(f"resuming {workdir} from epoch {last_epoch + 1} "
              f"(target {opt['epochs']})")
        if args.dry_run:
            continue
        opt = {k: v for k, v in opt.items()
               if k in TrainConfig.__dataclass_fields__}
        cfg = TrainConfig(**{**opt, "resume": workdir})
        train(cfg)


if __name__ == "__main__":
    main()
