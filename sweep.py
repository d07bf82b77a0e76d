#!/usr/bin/env python
"""Hyperparameter sweep driver.

The reference wires Hydra's optuna sweeper (TPE, 15 trials, minimize) into
every top-level config (configs/config_*.yaml hydra.sweeper blocks). This
driver reproduces that surface without a hydra dependency: each trial
composes the config with sampled overrides, calls run.main, and minimizes
the returned objective (val_mae_u_scaled, as in reference run.py:102).

Uses optuna's TPE when optuna is importable; falls back to random search
otherwise (this image ships no optuna).

    python sweep.py --config-name=config_fnostatereconstrabs2d.yaml \
        --n-trials 15 \
        --space model.hparams.lr=loguniform:1e-4:1e-2 \
        --space model.hparams.width=choice:16,32,64 \
        system=swe_per dataroot=data trainer.max_epochs=5
"""
from __future__ import annotations

import argparse
import json
import math
import os
import random
from typing import Dict, List, Tuple

import numpy as np

import run as run_module
from m_cedm_tpu.utils import get_logger

log = get_logger(__name__)


def parse_space(specs: List[str]):
    """key=kind:args -> sampling spec. Kinds: uniform:lo:hi,
    loguniform:lo:hi, int:lo:hi, choice:a,b,c."""
    space = {}
    for spec in specs:
        key, rhs = spec.split("=", 1)
        kind, _, args = rhs.partition(":")
        if kind in ("uniform", "loguniform", "int"):
            lo, hi = args.split(":")
            space[key] = (kind, float(lo), float(hi))
        elif kind == "choice":
            space[key] = ("choice", [json_load(v) for v in args.split(",")])
        else:
            raise ValueError(f"unknown space kind {kind!r}")
    return space


def json_load(v: str):
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


def sample_random(space, rng: random.Random) -> Dict[str, str]:
    out = {}
    for key, spec in space.items():
        if spec[0] == "uniform":
            out[key] = str(rng.uniform(spec[1], spec[2]))
        elif spec[0] == "loguniform":
            out[key] = str(math.exp(rng.uniform(math.log(spec[1]),
                                                math.log(spec[2]))))
        elif spec[0] == "int":
            out[key] = str(rng.randint(int(spec[1]), int(spec[2])))
        elif spec[0] == "choice":
            out[key] = json.dumps(rng.choice(spec[1]))
    return out


def suggest_optuna(trial, space) -> Dict[str, str]:
    out = {}
    for key, spec in space.items():
        if spec[0] == "uniform":
            out[key] = str(trial.suggest_float(key, spec[1], spec[2]))
        elif spec[0] == "loguniform":
            out[key] = str(trial.suggest_float(key, spec[1], spec[2], log=True))
        elif spec[0] == "int":
            out[key] = str(trial.suggest_int(key, int(spec[1]), int(spec[2])))
        elif spec[0] == "choice":
            out[key] = json.dumps(trial.suggest_categorical(key, spec[1]))
    return out


def main(argv=None) -> float:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-name", required=True)
    p.add_argument("--config-path", default="configs")
    p.add_argument("--n-trials", type=int, default=15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--space", action="append", default=[],
                   help="key=kind:args sampling spec (repeatable)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)
    space = parse_space(args.space)

    results: List[Tuple[float, Dict[str, str]]] = []

    def objective(params: Dict[str, str]) -> float:
        trial_overrides = args.overrides + [f"{k}={v}" for k, v in params.items()]
        log.info(f"trial params: {params}")
        value = run_module.main([f"--config-name={args.config_name}",
                                 f"--config-path={args.config_path}"]
                                + trial_overrides)
        results.append((value, params))
        return value

    try:
        import optuna

        sampler = optuna.samplers.TPESampler(seed=args.seed)
        study = optuna.create_study(direction="minimize", sampler=sampler)
        study.optimize(lambda t: objective(suggest_optuna(t, space)),
                       n_trials=args.n_trials)
        best_value, best_params = study.best_value, study.best_params
    except ImportError:
        log.info("optuna not installed; using random search")
        rng = random.Random(args.seed)
        for _ in range(args.n_trials):
            objective(sample_random(space, rng))
        best_value, best_params = min(results, key=lambda r: r[0])

    log.info(f"best objective: {best_value} with {best_params}")
    with open("sweep_results.json", "w") as f:
        json.dump({"best_value": float(best_value), "best_params": best_params,
                   "trials": [{"value": float(v), "params": p}
                              for v, p in results]}, f, indent=2, default=str)
    return float(best_value)


if __name__ == "__main__":
    main()
