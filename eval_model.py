#!/usr/bin/env python
"""Test-only driver: restore a checkpoint and run the test loop.

Parity with reference eval_model.py:17-91 — loads `<ckpt_path>/checkpoints`
(latest), runs `trainer.test`, returns test_mae_u_scaled.

    python eval_model.py --config-name=config_adm_edm_mcedm_res32.yaml \
        ckpt_path=logs/runs/adm_edm_mcedm... diff_sampler.n_samples=5
"""
from __future__ import annotations

import os

import jax
import numpy as np

from m_cedm_tpu.config import compose, instantiate, to_plain
from m_cedm_tpu.parallel import distributed_init
from m_cedm_tpu.train.checkpoint import CheckpointManager, resolve_ckpt_dir
from m_cedm_tpu.train.loop import Trainer
from m_cedm_tpu.train.metrics import MetricsLogger
from m_cedm_tpu.utils import get_logger, override_data_folders
from run import (build_run_dir, hydra_setting, parse_args,
                 split_hydra_overrides, warn_unconsumed_hydra)

log = get_logger(__name__)


def main(argv=None) -> float:
    args = parse_args(argv)
    distributed_init()
    job_overrides, hydra_cli = split_hydra_overrides(args.overrides)
    warn_unconsumed_hydra(hydra_cli, consumed={"hydra.run.dir"})
    cfg, hydra_block = compose(args.config_path, args.config_name,
                               job_overrides, return_hydra=True)

    res = cfg.get("res", 128)
    n_train = cfg.get("n_train", 1000)
    cfg.datamodule = override_data_folders(cfg.datamodule, cfg.dataroot,
                                           cfg.get("system"), res, n_train=n_train)

    if cfg.get("diff_sampler") is not None and cfg.diff_sampler.get("n_samples") == 100:
        cfg.datamodule.test_batch_size = 1

    out_dir = (hydra_cli.get("hydra.run.dir")
               or hydra_setting(hydra_block, {}, "hydra.run.dir")
               or build_run_dir(cfg))
    logger = MetricsLogger(out_dir, run_name=f"eval_{cfg.model.hparams.name}")
    logger.log_config(to_plain(cfg))

    datamodule = instantiate(cfg.datamodule)
    task = instantiate(cfg.model)
    if cfg.get("diff_sampler") is not None:
        task.set_test_sampler_params(cfg.diff_sampler)
    if cfg.get("system") is not None:
        task.set_pde_loss_function(cfg.system, datamodule.flip_xy)

    ckpt_dir = resolve_ckpt_dir(cfg.get("ckpt_path"))
    assert ckpt_dir and os.path.isdir(ckpt_dir), f"no checkpoint dir at {ckpt_dir}"

    state = task.init_state(jax.random.PRNGKey(cfg.get("seed", 0)),
                            datamodule.get_norm_stats())
    mgr = CheckpointManager(ckpt_dir)
    state = mgr.restore(state)
    mgr.close()
    assert state is not None, f"no checkpoint found in {ckpt_dir}"

    trainer = Trainer(max_epochs=0, logger=logger, out_dir=out_dir,
                      seed=cfg.get("seed", 0))
    metrics = trainer.test(task, datamodule, state=state)
    logger.finish()
    return float(metrics.get("test_mae_u_scaled", np.inf))


if __name__ == "__main__":
    main()
