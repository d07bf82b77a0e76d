"""Orbax checkpointing of TrainState (+ resume).

Replaces PL ModelCheckpoint + `ckpt_path` resume (reference run.py:68-72,99;
configs/callbacks/*.yaml). Layout mirrors the reference's
`<run_dir>/checkpoints/` with a `last` alias and optional monitored-best
retention; checkpoints carry params, EMA params, optimizer state, normalizer
stats and the step counter (the reference stores the same via
register_buffer + Lightning state dicts).
"""
from __future__ import annotations

import os
from typing import Optional

import orbax.checkpoint as ocp

from m_cedm_tpu.utils import get_logger, is_main_process

log = get_logger(__name__)


class CheckpointManager:
    def __init__(self, ckpt_dir: str, monitor: Optional[str] = None,
                 mode: str = "min", save_top_k: int = 1):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        self.monitor = monitor
        self.mode = mode
        self.best_value: Optional[float] = None
        self.best_step: Optional[int] = None
        if is_main_process():
            os.makedirs(self.ckpt_dir, exist_ok=True)
        # async: the save overlaps the next training epoch (orbax waits
        # internally before starting a newer save); readers wait explicitly
        self._mgr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max(save_top_k + 1, 2), create=True,
                enable_async_checkpointing=True))

    def save(self, step: int, state, metrics: Optional[dict] = None):
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if self.monitor and metrics and self.monitor in metrics:
            value = float(metrics[self.monitor])
            better = (self.best_value is None
                      or (value < self.best_value if self.mode == "min"
                          else value > self.best_value))
            if better:
                self.best_value = value
                self.best_step = step

    def wait_until_finished(self):
        """Block until any in-flight async save has committed."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        self._mgr.wait_until_finished()
        return self._mgr.latest_step()

    def restore(self, target, step: Optional[int] = None):
        """Restore into the structure of `target` (an initialized TrainState)."""
        self._mgr.wait_until_finished()
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(target))
        log.info(f"Restored checkpoint at step {step} from {self.ckpt_dir}")
        return restored

    def close(self):
        self._mgr.close()


def resolve_ckpt_dir(ckpt_path: Optional[str]) -> Optional[str]:
    """Accept a run directory (appends checkpoints/) or a checkpoint dir,
    mirroring run.py:68-72."""
    if ckpt_path is None:
        return None
    sub = os.path.join(ckpt_path, "checkpoints")
    if os.path.isdir(sub):
        return sub
    return ckpt_path
