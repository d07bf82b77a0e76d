#!/usr/bin/env python
"""Train + test driver (the reference's `run.py` CLI, hydra-compatible).

Usage (identical surface to the reference, README.md:16-62):

    python run.py --config-name=config_adm_edm_mcedm_res32.yaml \
        trainer.max_epochs=1 datamodule.batch_size=16 system=swe_per

Flow (parity with reference run.py:30-123): compose config -> route dataset
paths by system/res/n_train -> seed -> build datamodule, callbacks, trainer,
task -> set test sampler + PDE loss -> fit (with optional resume) -> test ->
return the optuna objective (val_mae_u_scaled).
"""
from __future__ import annotations

import argparse
import datetime
import os
import sys

import numpy as np

from m_cedm_tpu.config import compose, instantiate, to_plain
from m_cedm_tpu.parallel import distributed_init
from m_cedm_tpu.train.loop import Trainer
from m_cedm_tpu.train.metrics import MetricsLogger
from m_cedm_tpu.utils import get_logger, override_data_folders

log = get_logger(__name__)


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-name", default="config.yaml")
    # like @hydra.main(config_path=...): resolved relative to this script,
    # not the cwd (runs launched from any directory find the repo configs)
    p.add_argument("--config-path",
                   default=os.path.join(os.path.dirname(
                       os.path.abspath(__file__)), "configs"))
    p.add_argument("-m", "--multirun", action="store_true",
                   help="hydra --multirun parity: overrides like "
                        "'lr=tag(log, interval(1e-4, 1e-2))' define the "
                        "search space; runs the TPE sweep configured by the "
                        "config's hydra.sweeper block (n_trials/n_jobs/"
                        "study_name/sampler.seed, minimize)")
    p.add_argument("--n-trials", type=int, default=None,
                   help="sweep trials under --multirun (overrides the "
                        "config's hydra.sweeper.n_trials; a CLI "
                        "hydra.sweeper.n_trials=N override wins over both)")
    p.add_argument("overrides", nargs="*", help="hydra-style key=value overrides")
    return p.parse_args(argv)


def build_run_dir(cfg) -> str:
    stamp = datetime.datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
    root = cfg.get("logs_root_folder", "") or ""
    return os.path.join(f"{root}logs", "runs",
                        f"{cfg.get('name', 'run')}{cfg.get('subname', '')}{stamp}")


def split_hydra_overrides(overrides):
    """Hydra consumes `hydra.*` overrides itself rather than composing them
    into the job config (reference CLI surface: `hydra.run.dir=...` sets the
    output directory). Returns (job_overrides, hydra_cfg)."""
    job, hydra_cfg = [], {}
    for o in overrides:
        key = o.split("=", 1)[0].lstrip("+")
        if key == "hydra" or key.startswith("hydra."):
            k, _, v = o.partition("=")
            hydra_cfg[k.lstrip("+")] = v
        else:
            job.append(o)
    return job, hydra_cfg


# hydra.* CLI keys the drivers actually consume; anything else is a likely
# typo and gets a visible warning instead of being silently swallowed
_CONSUMED_HYDRA_KEYS = frozenset({
    "hydra.run.dir", "hydra.sweep.dir", "hydra.sweeper.n_trials",
    "hydra.sweeper.n_jobs", "hydra.sweeper.study_name",
    "hydra.sweeper.sampler.seed",
})


def warn_unconsumed_hydra(hydra_cli, consumed=_CONSUMED_HYDRA_KEYS):
    for k in hydra_cli:
        if k not in consumed:
            log.warning(f"hydra override {k!r} is not supported by this "
                        f"driver and is ignored")


def hydra_setting(hydra_block, hydra_cli, dotted_key, default=None):
    """Resolve a `hydra.x.y` setting: CLI override wins over the config's
    `hydra:` block (reference sweeper surface, e.g.
    `hydra.sweeper.n_trials=30` on the command line)."""
    import yaml

    if dotted_key in hydra_cli:
        return yaml.safe_load(hydra_cli[dotted_key])
    node = hydra_block or {}
    for part in dotted_key.split(".")[1:]:
        if not isinstance(node, dict) or part not in node:
            return default
        node = node[part]
    return default if node is None else node


def main(argv=None) -> float:
    args = parse_args(argv)
    if args.multirun:
        from sweep import run_sweep, split_multirun_overrides

        job_overrides, hydra_cli = split_hydra_overrides(args.overrides)
        warn_unconsumed_hydra(hydra_cli)
        constants, space = split_multirun_overrides(job_overrides)
        if not space:
            raise SystemExit(
                "--multirun needs at least one sweep override, e.g. "
                "'model.hparams.lr=tag(log, interval(1e-4, 1e-2))'")
        # sweeper settings come from the config's hydra block (reference
        # configs/config_*.yaml hydra.sweeper), CLI hydra.sweeper.* wins
        _, hydra_block = compose(args.config_path, args.config_name,
                                 constants, return_hydra=True)
        n_trials = args.n_trials or hydra_setting(
            hydra_block, {}, "hydra.sweeper.n_trials", 15)
        if "hydra.sweeper.n_trials" in hydra_cli:
            n_trials = hydra_setting(hydra_block, hydra_cli,
                                     "hydra.sweeper.n_trials")
        return run_sweep(
            args.config_name, args.config_path, constants, space,
            n_trials=int(n_trials),
            seed=int(hydra_setting(hydra_block, hydra_cli,
                                   "hydra.sweeper.sampler.seed", 0)),
            n_jobs=int(hydra_setting(hydra_block, hydra_cli,
                                     "hydra.sweeper.n_jobs", 1)),
            study_name=hydra_setting(hydra_block, hydra_cli,
                                     "hydra.sweeper.study_name"),
            sweep_dir=hydra_setting(hydra_block, hydra_cli,
                                    "hydra.sweep.dir"))
    distributed_init()
    job_overrides, hydra_cfg = split_hydra_overrides(args.overrides)
    warn_unconsumed_hydra(hydra_cfg)
    cfg, hydra_block = compose(args.config_path, args.config_name,
                               job_overrides, return_hydra=True)

    res = cfg.get("res", 128)
    n_train = cfg.get("n_train", 1000)
    cfg.datamodule = override_data_folders(cfg.datamodule, cfg.dataroot,
                                           cfg.get("system"), res, n_train=n_train)

    model_name = cfg.model.hparams.name
    dataset = cfg.datamodule.name
    log.info(f"This run trains and tests the model {model_name} on the {dataset} dataset")

    seed = cfg.get("seed", 0)
    np.random.seed(seed)

    out_dir = (hydra_cfg.get("hydra.run.dir")
               or hydra_setting(hydra_block, {}, "hydra.run.dir")
               or build_run_dir(cfg))
    sampler_name = (cfg.get("diff_sampler") or {}).get("name", "")
    run_name = f"{model_name}_{dataset}_{seed}{sampler_name}{cfg.get('subname', '')}"
    logger = MetricsLogger(out_dir, run_name=run_name, use_wandb=True)
    logger.log_config(to_plain(cfg))
    log.info(f"Output dir is {out_dir}")

    # n_samples == 100 -> test batch size 1 (reference run.py:52-54)
    if cfg.get("diff_sampler") is not None and cfg.diff_sampler.get("n_samples") == 100:
        cfg.datamodule.test_batch_size = 1

    datamodule = instantiate(cfg.datamodule)

    callbacks = []
    ckpt_monitor, ckpt_mode = None, "min"
    for cb_name, cb_conf in (cfg.get("callbacks") or {}).items():
        if not isinstance(cb_conf, dict) or "_target_" not in cb_conf:
            continue
        if "CheckpointManager" in cb_conf["_target_"] or "ModelCheckpoint" in cb_conf["_target_"]:
            ckpt_monitor = cb_conf.get("monitor")
            ckpt_mode = cb_conf.get("mode", "min")
            continue  # checkpointing is owned by the Trainer
        callbacks.append(instantiate(cb_conf))

    trainer_kw = {k: v for k, v in cfg.trainer.items() if k != "_target_"}
    trainer = Trainer(
        max_epochs=trainer_kw.get("max_epochs", 500),
        check_val_every_n_epoch=trainer_kw.get("check_val_every_n_epoch", 1),
        gradient_clip_val=trainer_kw.get("gradient_clip_val"),
        callbacks=callbacks, logger=logger, out_dir=out_dir, seed=seed,
        ckpt_monitor=ckpt_monitor, ckpt_mode=ckpt_mode)

    # trainer precision 'bf16'/'bfloat16' selects the mixed-precision
    # compute path (fp32 master params; tasks/diffusion.py for the diffusion
    # families — their model hparams live under hparams.model — and
    # tasks/{fno,oformer}.py whose hparams are flat)
    if str(trainer_kw.get("precision", "32")) in ("bf16", "bfloat16"):
        if "model" in cfg.model.hparams:
            cfg.model.hparams.model["dtype"] = "bfloat16"
        else:
            cfg.model.hparams["dtype"] = "bfloat16"

    task = instantiate(cfg.model,
                       grad_clip=trainer_kw.get("gradient_clip_val"))

    if cfg.get("diff_sampler") is not None:
        log.info("Set sampler params")
        task.set_test_sampler_params(cfg.diff_sampler)

    if cfg.get("system") is not None:
        log.info("Set pde loss for a concrete system")
        task.set_pde_loss_function(cfg.system, datamodule.flip_xy)

    ckpt_path = cfg.get("ckpt_path")
    # override_epochs (reference run.py:78-80). Parity note: in the
    # reference this guard is dead code — trainer.max_epochs is constructed
    # from cfg.trainer.max_epochs, so the `<` comparison can never be true —
    # and the same holds here. The *behavior* the flag guards (a resumed run
    # trains on to the newly-configured max_epochs) happens unconditionally
    # in both frameworks and is pinned by
    # tests/test_cli.py::test_resume_override_epochs.
    cfg_epochs = int(cfg.trainer.get("max_epochs", trainer.max_epochs))
    if (cfg.get("override_epochs", False) and ckpt_path is not None
            and trainer.max_epochs < cfg_epochs):
        log.info(f"override_epochs: extending max_epochs "
                 f"{trainer.max_epochs} -> {cfg_epochs}")
        trainer.max_epochs = cfg_epochs
    trainer.fit(task, datamodule, ckpt_path=ckpt_path)

    metric_key = "val_mae_u_scaled"
    metric = logger.summary.get(metric_key, np.inf)
    if metric is np.inf:
        log.warning(f"Metric {metric_key} not found in summary")

    trainer.test(task, datamodule)
    logger.finish()
    return float(metric)


if __name__ == "__main__":
    main()
