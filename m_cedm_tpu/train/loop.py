"""Host-side training loop (the pytorch_lightning.Trainer equivalent).

Owns: epochs, batch placement on the device mesh, validation cadence, test
evaluation, checkpointing/resume, metric aggregation, callbacks. Everything
numeric happens inside the tasks' jitted functions; this file is pure
orchestration.

Parity anchors:
  - fit/test flow, ckpt resume:   reference run.py:99-112, eval_model.py
  - val cadence for diffusion:    models/mcedm.py:284 ("plot validation
                                  images every 100 epochs") — tasks carry
                                  `val_every`
  - grad clip:                    configs/trainer/trainer_ddim.yaml:8-10
                                  (handled inside task optimizers)
  - DDP semantics:                parallel/mesh.py (batch sharded over
                                  'data', XLA emits the grad all-reduce)
"""
from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import jax
import numpy as np

from m_cedm_tpu.config import register
from m_cedm_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from m_cedm_tpu.train.checkpoint import CheckpointManager, resolve_ckpt_dir
from m_cedm_tpu.train.metrics import MetricsLogger
from m_cedm_tpu.utils import get_logger

log = get_logger(__name__)


@register("pytorch_lightning.Trainer", "m_cedm_tpu.train.Trainer")
def _build_trainer(**kw):
    """Accepts the reference trainer-config surface; maps what applies."""
    return Trainer(
        max_epochs=kw.get("max_epochs", 500),
        check_val_every_n_epoch=kw.get("check_val_every_n_epoch", 1),
        gradient_clip_val=kw.get("gradient_clip_val"),
        callbacks=kw.get("callbacks", ()),
        logger=kw.get("logger"),
        out_dir=kw.get("out_dir", "."),
        use_mesh=True,
    )


class Trainer:
    def __init__(self, max_epochs: int = 500, check_val_every_n_epoch: int = 1,
                 gradient_clip_val: Optional[float] = None,
                 callbacks: Sequence = (), logger: Optional[MetricsLogger] = None,
                 out_dir: str = ".", seed: int = 0, use_mesh: bool = True,
                 ckpt_monitor: Optional[str] = None, ckpt_mode: str = "min",
                 limit_train_batches: Optional[int] = None,
                 debug_nans: bool = False,
                 profile_dir: Optional[str] = None,
                 profile_epochs: int = 1):
        # capture a device trace of the first profile_epochs epochs
        # (TensorBoard/XProf-compatible; train/profiler.py)
        self.profile_dir = profile_dir
        self.profile_epochs = profile_epochs
        if debug_nans:
            # dev-mode numeric sanitizer (SURVEY.md §5: the TPU-native
            # equivalent of a race/NaN detector — deterministic PRNG threading
            # makes data races structurally absent, NaNs are trapped here)
            jax.config.update("jax_debug_nans", True)
        self.max_epochs = max_epochs
        self.check_val_every_n_epoch = check_val_every_n_epoch
        self.gradient_clip_val = gradient_clip_val
        self.callbacks = list(callbacks)
        self.out_dir = out_dir
        self.seed = seed
        self.limit_train_batches = limit_train_batches
        self.logger = logger or MetricsLogger(out_dir)
        self.mesh = make_mesh() if use_mesh and len(jax.devices()) > 1 else None
        self.ckpt = CheckpointManager(f"{out_dir}/checkpoints",
                                      monitor=ckpt_monitor, mode=ckpt_mode)
        self.state = None
        self.current_epoch = 0
        for cb in self.callbacks:
            if hasattr(cb, "setup"):
                cb.setup(out_dir, getattr(self.logger, "_wandb", None))

    # ------------------------------------------------------------------ fit

    def fit(self, task, datamodule, ckpt_path: Optional[str] = None):
        rng = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(self.seed)

        if hasattr(task, "set_train_mask_kind") and getattr(
                datamodule, "train_mask_kind", None):
            task.set_train_mask_kind(datamodule.train_mask_kind)
        task.down_factor = (datamodule.down_factor
                            if getattr(datamodule, "down_interp", True) else 1)

        steps_per_epoch = datamodule.num_batches("train")
        if hasattr(task, "configure_lr_schedule"):
            try:
                task.configure_lr_schedule(steps_per_epoch, self.max_epochs)
            except TypeError:
                task.configure_lr_schedule(steps_per_epoch)

        key, init_key = jax.random.split(key)
        state = task.init_state(init_key, datamodule.get_norm_stats())

        start_epoch = 0
        resume_dir = resolve_ckpt_dir(ckpt_path)
        if resume_dir:
            mgr = CheckpointManager(resume_dir)
            restored = mgr.restore(state)
            mgr.close()
            if restored is not None:
                state = restored
                start_epoch = int(state.step) // max(steps_per_epoch, 1)
                log.info(f"Resuming from epoch {start_epoch}")
        state = replicate(state, self.mesh)

        val_every = getattr(task, "val_every", None) or self.check_val_every_n_epoch

        profiling = False
        if self.profile_dir:
            jax.profiler.start_trace(self.profile_dir)
            profiling = True

        for epoch in range(start_epoch, self.max_epochs):
            if profiling and epoch - start_epoch >= self.profile_epochs:
                jax.profiler.stop_trace()
                profiling = False
            self.current_epoch = epoch
            t0 = time.time()
            n_batches = 0
            for batch in datamodule.iter_split("train", rng):
                if (self.limit_train_batches
                        and n_batches >= self.limit_train_batches):
                    break
                batch = shard_batch(batch, self.mesh)
                key, step_key = jax.random.split(key)
                state, metrics = task.train_step(state, batch, step_key)
                self.logger.accumulate(metrics)
                n_batches += 1

            run_val = (epoch % val_every == 0 or epoch == 0
                       or epoch == self.max_epochs - 1)
            if run_val:
                key, val_key = jax.random.split(key)
                self._run_eval(task, state, datamodule, "val", epoch, val_key)

            epoch_metrics = self.logger.flush_epoch(
                epoch, {"epoch_time_s": time.time() - t0})
            if epoch % 10 == 0 or run_val:
                msg = ", ".join(f"{k}={v:.4g}" for k, v in epoch_metrics.items()
                                if not k.startswith("epoch_"))
                log.info(f"epoch {epoch}: {msg} "
                         f"({epoch_metrics.get('epoch_time_s', 0):.1f}s)")
            self.ckpt.save(int(jax.device_get(state.step)), state, epoch_metrics)

        if profiling:
            jax.profiler.stop_trace()

        # async saves overlap training; the last one must commit before fit
        # returns (a process exiting mid-commit hits orbax's shut-down
        # executor: "cannot schedule new futures after shutdown")
        self.ckpt.wait_until_finished()
        self.state = state
        return state

    # ----------------------------------------------------------------- test

    def test(self, task, datamodule, state=None, verbose: bool = True):
        state = state if state is not None else self.state
        assert state is not None, "call fit() first or pass a state"
        state = replicate(state, self.mesh)  # e.g. freshly-restored checkpoints
        key = jax.random.PRNGKey(self.seed + 12345)
        task.down_factor = (datamodule.down_factor
                            if getattr(datamodule, "down_interp", True) else 1)
        self._run_eval(task, state, datamodule, "test", self.current_epoch, key)
        metrics = self.logger.flush_epoch(self.current_epoch)
        if verbose:
            for k, v in sorted(metrics.items()):
                log.info(f"  {k}: {v:.6g}")
        return metrics

    # ------------------------------------------------------------- eval core

    def _run_eval(self, task, state, datamodule, split, epoch, key):
        from m_cedm_tpu.tasks.diffusion import DiffusionTaskBase, McedmTask

        sp = getattr(task, "test_sparams", None)
        n_samples = 1
        if split == "test" and sp is not None:
            n_samples = int(sp.get("n_samples", 1) if hasattr(sp, "get")
                            else getattr(sp, "n_samples", 1))

        for batch_idx, batch in enumerate(datamodule.iter_split(split)):
            batch = shard_batch(batch, self.mesh)
            # SPMD ensemble parallelism (SURVEY §2.9): when the batch axis
            # cannot shard over the mesh (the reference's n_samples=100 /
            # test_batch_size=1 regime, run.py:52-54) but the ensemble can,
            # the n_samples axis becomes the parallel axis instead
            ens_mesh = None
            if self.mesh is not None and n_samples > 1:
                ndev = self.mesh.shape["data"]
                bsz = int(np.asarray(batch[0]).shape[0])
                if bsz % ndev != 0 and n_samples % ndev == 0:
                    ens_mesh = self.mesh
            key, k = jax.random.split(key)
            outputs: Dict = {}
            if isinstance(task, McedmTask):
                masks = datamodule.eval_masks(split)
                down_mask = self._down_mask(task, batch[0].shape)
                for name, mask in masks.items():
                    metrics, pred = task.eval_step(
                        state, batch, k, jax.device_put(mask), split=split,
                        n_samples=n_samples, mask_name=name,
                        down_mask=down_mask if split == "test" else None,
                        mesh=ens_mesh)
                    self.logger.accumulate(metrics)
                    h_un, _, _, u_un = batch
                    gt = task.transform.forward(state, h_un, u_un)
                    outputs[f"traj_{name}"] = np.asarray(pred)[:, None]
                    outputs[f"gt_{name}"] = np.asarray(gt)
            elif isinstance(task, DiffusionTaskBase):
                metrics, pred = task.eval_step(state, batch, k, split=split,
                                               n_samples=n_samples,
                                               mesh=ens_mesh)
                self.logger.accumulate(metrics)
                outputs["traj"] = np.asarray(pred)[:, None]
                h_un, _, _, u_un = batch
                gt = np.asarray(task.transform.forward(state, h_un, u_un))
                # conditional tasks predict only the u block; plot matching gt
                outputs["gt"] = gt[..., -pred.shape[-1]:]
            else:
                metrics, pred = task.eval_step(state, batch, k, split=split)
                self.logger.accumulate(metrics)
                outputs["pred"] = np.asarray(pred)
                target_fn = getattr(task, "eval_target", None)
                outputs["target"] = np.asarray(
                    target_fn(batch) if target_fn else batch[3])
            for cb in self.callbacks:
                cb.on_eval_batch(outputs, batch_idx, split)
        for cb in self.callbacks:
            cb.on_eval_end(epoch, split)

    @staticmethod
    def _down_mask(task, shape):
        down = getattr(task, "down_factor", 1)
        if down <= 1:
            return None
        each = 2 ** (down - 1)
        m = np.zeros(shape[1:3] + (1,), np.float32)
        m[::each, ::each] = 1.0
        return jax.device_put(m[None])
