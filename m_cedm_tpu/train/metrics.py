"""Metrics registry and logging.

Replaces the reference's wandb/PL `self.log` plumbing (logger_utils.py,
run.py:44-49) with a host-side registry: per-epoch means are appended to a
JSONL file and echoed to the console, and forwarded to wandb when the package
is importable (the reference runs wandb offline). Metric keys are identical
to the reference's so downstream tooling ports unchanged.
"""
from __future__ import annotations

import json
import os
import time
from collections import defaultdict
from typing import Dict, Optional

import numpy as np

from m_cedm_tpu.utils import get_logger, is_main_process

log = get_logger(__name__)


class MetricsLogger:
    def __init__(self, out_dir: str, run_name: str = "run",
                 use_wandb: bool = False, wandb_project: str = "gen_no"):
        self.out_dir = out_dir
        self.run_name = run_name
        self._epoch_acc: Dict[str, list] = defaultdict(list)
        self._jsonl_path = os.path.join(out_dir, "metrics.jsonl")
        self.summary: Dict[str, float] = {}
        self._wandb = None
        if use_wandb and is_main_process():
            try:
                import wandb

                self._wandb = wandb.init(project=wandb_project, name=run_name,
                                         mode="offline")
            except ImportError:
                log.info("wandb not installed; logging to JSONL only")
        if is_main_process():
            os.makedirs(out_dir, exist_ok=True)

    def accumulate(self, metrics: Dict):
        """Store raw (possibly device-resident) scalars; host materialization
        is deferred to flush_epoch so the train loop never blocks per step —
        on tunneled backends a per-step float() costs a ~30 ms round-trip."""
        for k, v in metrics.items():
            self._epoch_acc[k].append(v)

    def flush_epoch(self, epoch: int, extra: Optional[Dict] = None) -> Dict[str, float]:
        means = {k: float(np.mean([float(v) for v in vals]))
                 for k, vals in self._epoch_acc.items()}
        self._epoch_acc.clear()
        if extra:
            means.update({k: float(v) for k, v in extra.items()})
        self.summary.update(means)
        record = {"epoch": epoch, "time": time.time(), **means}
        if is_main_process():
            with open(self._jsonl_path, "a") as f:
                f.write(json.dumps(record) + "\n")
            if self._wandb is not None:
                self._wandb.log(means, step=epoch)
        return means

    def log_config(self, cfg: Dict):
        if is_main_process():
            with open(os.path.join(self.out_dir, "config.json"), "w") as f:
                json.dump(cfg, f, indent=2, default=str)
            if self._wandb is not None:
                self._wandb.config.update(cfg, allow_val_change=True)

    def save_artifact(self, path: str, tag: str = "latest",
                      name: str = "model"):
        """Attach a checkpoint directory/file to the wandb run (reference
        logger_utils.save_wandb_artifact, :31-38). No-op without wandb."""
        if self._wandb is None or not is_main_process():
            return
        import wandb

        artifact = wandb.Artifact(name, type="model")
        if os.path.isdir(path):
            artifact.add_dir(path)
        else:
            artifact.add_file(path)
        self._wandb.log_artifact(artifact, aliases=[tag])

    def finish(self):
        if self._wandb is not None:
            self._wandb.finish()
