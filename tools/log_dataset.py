"""Standalone dataset-artifact upload (reference
``utils/wandb_logging/log_dataset.py``: the 'Dataset Creation' job).

Versions every split of a data yaml (both modalities + shared labels)
into the artifact store and writes ``<data>_wandb.yaml`` whose paths are
``wandb-artifact://`` references — train directly from that yaml with
``--artifact-alias`` pinning.

    python tools/log_dataset.py --data configs/data/m3fd_8_2.yaml
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser("log_dataset")
    p.add_argument("--data", type=str, required=True, help="data yaml")
    p.add_argument("--project", type=str, default="mmidet_tpu")
    args = p.parse_args(argv)

    import yaml

    from mmidet_tpu.utils.artifacts import (default_backend,
                                            log_dataset_artifact)
    with open(args.data) as fh:
        data = yaml.safe_load(fh)
    out_yaml = "_wandb.".join(args.data.rsplit(".", 1))
    backend = default_backend(project=args.project)
    logged = log_dataset_artifact(data, backend, project=args.project,
                                  out_yaml=out_yaml)
    print(f"dataset artifacts logged; artifact-path yaml -> {out_yaml}")
    for k, v in logged.items():
        print(f"  {k}: {v}")
    return out_yaml


if __name__ == "__main__":
    main()
