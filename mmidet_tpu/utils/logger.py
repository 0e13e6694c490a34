"""Experiment metric logging.

Functional parity surface: reference W&B subsystem
(``utils/wandb_logging/wandb_utils.py:80-306``) and the disabled
TensorBoard writer (train.py:1041-1042).  Backends: JSONL (always),
TensorBoard event files via flax.metric_writers when available, and W&B
when the package + an API key exist (it does not in this image — gated)."""

from __future__ import annotations

import json
import os
import time


class MetricLogger:
    """Multiplexing logger: log_metrics(step, {...}) fans out to every
    available backend; JSONL is the source of truth."""

    def __init__(self, log_dir: str, use_wandb: bool = False,
                 project: str = "mmidet_tpu", run_name: str | None = None,
                 config: dict | None = None, entity: str | None = None):
        os.makedirs(log_dir, exist_ok=True)
        self.log_dir = log_dir
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from flax.metrics import tensorboard
            self._tb = tensorboard.SummaryWriter(log_dir)
        except Exception:
            self._tb = None
        self._wandb = None
        if use_wandb:
            try:
                import wandb
                self._wandb = wandb.init(project=project, name=run_name,
                                         entity=entity or None,
                                         config=config or {},
                                         dir=log_dir)
            except Exception:
                self._wandb = None

    def log_metrics(self, step: int, metrics: dict):
        rec = {"step": int(step), "time": time.time(),
               **{k: float(v) for k, v in metrics.items()}}
        self._jsonl.write(json.dumps(rec) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.scalar(k, float(v), step)
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def log_image(self, step: int, tag: str, image):
        if self._tb is not None:
            self._tb.image(tag, image, step)

    def log_media_files(self, step: int, tag: str, paths):
        """Log annotated-image files (ref W&B bbox media panels,
        --bbox_interval): wandb.Image list when wandb is live; the files
        themselves are the offline record."""
        if self._wandb is not None:
            try:
                import wandb
                self._wandb.log(
                    {tag: [wandb.Image(str(p)) for p in paths]}, step=step)
            except Exception:
                pass

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.flush()
        if self._wandb is not None:
            self._wandb.finish()
