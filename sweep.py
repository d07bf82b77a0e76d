#!/usr/bin/env python
"""Hyperparameter sweep driver (the Hydra optuna-TPE sweeper equivalent).

The reference wires Hydra's optuna sweeper (TPE, 15 trials, minimize) into
every top-level config (configs/config_*.yaml hydra.sweeper blocks) and
defines the search space with CLI override syntax under --multirun, e.g.

    python run.py --multirun --config-name=config_fnostatereconstrabs2d.yaml \
        'model.hparams.lr=tag(log, interval(1e-4, 1e-2))' \
        'model.hparams.width=choice(16, 32, 64)'

This driver reproduces that behavior in-image: each trial composes the
config with sampled overrides, calls run.main, and minimizes the returned
objective (val/test_mae_u_scaled, reference run.py:102-119). The sampler is
optuna's TPE when optuna is importable, otherwise the vendored TPE
(m_cedm_tpu/tpe.py — same algorithm family, no dependency); --sampler random
forces random search.

Space syntax (both accepted):
  * hydra sweep overrides: key=interval(lo,hi) | tag(log, interval(lo,hi))
    | range(lo, hi[, step]) | choice(a, b, c)
  * --space key=kind:args with kind in uniform|loguniform|int|choice
"""
from __future__ import annotations

import argparse
import functools
import itertools
import json
import math
import os
import random
import re
import threading
from typing import Dict, List, Tuple

from m_cedm_tpu.tpe import TPESampler
from m_cedm_tpu.utils import get_logger

log = get_logger(__name__)


# ---------------------------------------------------------------------------
# search-space parsing
# ---------------------------------------------------------------------------

def json_load(v: str):
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


def parse_space_spec(spec: str):
    """--space syntax: kind:args."""
    kind, _, args = spec.partition(":")
    if kind in ("uniform", "loguniform", "int"):
        lo, hi = args.split(":")
        return (kind, float(lo), float(hi))
    if kind == "choice":
        return ("choice", [json_load(v) for v in args.split(",")])
    raise ValueError(f"unknown space kind {kind!r}")


_HYDRA_RE = re.compile(
    r"^\s*(tag\(\s*log\s*,\s*)?(interval|range|choice)\s*\(([^()]*)\)\s*\)?\s*$")


def parse_hydra_sweep(value: str):
    """Hydra --multirun override syntax -> space spec, or None if the value
    is a plain (constant) override."""
    m = _HYDRA_RE.match(value)
    if not m:
        return None
    log_tag, fn, args_s = m.groups()
    args = [a.strip() for a in args_s.split(",") if a.strip()]
    if fn == "interval":
        lo, hi = float(args[0]), float(args[1])
        return ("loguniform" if log_tag else "uniform", lo, hi)
    if fn == "range":
        lo, hi = float(args[0]), float(args[1])
        step = float(args[2]) if len(args) > 2 else 1.0
        if step == 1.0 and lo == int(lo) and hi == int(hi):
            return ("int", lo, hi)
        opts, v = [], lo
        while v <= hi + 1e-12:
            opts.append(int(v) if v == int(v) else v)
            v += step
        return ("choice", opts)
    if fn == "choice":
        return ("choice", [json_load(a) for a in args])
    return None


def split_multirun_overrides(overrides: List[str]):
    """Partition key=value overrides into (constant overrides, space)."""
    constants, space = [], {}
    for ov in overrides:
        key, _, value = ov.partition("=")
        spec = parse_hydra_sweep(value)
        if spec is None:
            constants.append(ov)
        else:
            space[key] = spec
    return constants, space


def _format(v) -> str:
    return json.dumps(v) if isinstance(v, (list, bool)) else str(v)


# ---------------------------------------------------------------------------
# sweep core
# ---------------------------------------------------------------------------

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))


def _subprocess_objective(config_name: str, config_path: str,
                          overrides: List[str]) -> float:
    """Run one trial as `python run.py ...` in a fresh process and parse the
    returned objective. This is the n_jobs>1 trial executor (the reference's
    hydra.sweeper n_jobs=2 trial parallelism, joblib-launcher equivalent):
    separate processes keep the trials' jit caches, RNG and logging state
    fully isolated."""
    import subprocess
    import sys

    code = ("import json, sys\n"
            "import run\n"
            "v = run.main(json.loads(sys.argv[1]))\n"
            "print('SWEEP_OBJECTIVE=' + repr(float(v)))\n")
    argv = ([f"--config-name={config_name}", f"--config-path={config_path}"]
            + overrides)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [_REPO_ROOT] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    proc = subprocess.run([sys.executable, "-c", code, json.dumps(argv)],
                          capture_output=True, text=True, cwd=_REPO_ROOT,
                          env=env)
    for line in reversed(proc.stdout.splitlines()):
        if line.startswith("SWEEP_OBJECTIVE="):
            return float(line.split("=", 1)[1])
    raise RuntimeError(
        f"sweep trial subprocess failed (exit {proc.returncode}):\n"
        f"{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}")


def run_sweep(config_name: str, config_path: str, constants: List[str],
              space: Dict[str, Tuple], n_trials: int = 15, seed: int = 0,
              sampler: str = "tpe", results_file: str = "sweep_results.json",
              objective_fn=None, n_jobs: int = 1, study_name: str = None,
              sweep_dir: str = None) -> float:
    """TPE (or random) minimization over run.main's returned objective.
    Mirrors hydra.sweeper (reference configs/config_adm_edm_mcedm_res32.yaml:
    20-31): n_trials/n_jobs/study_name/sampler seed, direction=minimize.
    sweep_dir: hydra.sweep.dir equivalent — per-trial outputs land in
    `<sweep_dir>/<job_num>` (the reference's `subdir: ${hydra.job.num}`)."""
    import run as run_module

    if sweep_dir:
        os.makedirs(sweep_dir, exist_ok=True)
        if results_file == "sweep_results.json":
            results_file = os.path.join(sweep_dir, results_file)

    if objective_fn is None:
        if n_jobs > 1:
            objective_fn = functools.partial(_subprocess_objective,
                                             config_name, config_path)
        else:
            objective_fn = lambda overrides: run_module.main(  # noqa: E731
                [f"--config-name={config_name}",
                 f"--config-path={config_path}"] + overrides)

    results: List[Tuple[float, Dict[str, str]]] = []
    results_lock = threading.Lock()
    job_counter = itertools.count()

    def evaluate(params) -> float:
        job_num = next(job_counter)
        overrides = constants + [f"{k}={_format(v)}" for k, v in params.items()]
        if sweep_dir:
            overrides = overrides + [
                f"hydra.run.dir={os.path.join(sweep_dir, str(job_num))}"]
        log.info(f"trial {job_num}: {params}")
        value = float(objective_fn(overrides))
        with results_lock:
            results.append((value, {k: _format(v) for k, v in params.items()}))
        return value

    # ask/tell drivers for each sampler — a single batched loop below runs
    # min(n_jobs, remaining) trials concurrently between tells
    finish = None
    if sampler == "tpe":
        try:
            import optuna
        except ImportError:
            optuna = None  # only the import lives in the try: an
            # ImportError raised *inside a trial* must propagate, not
            # silently restart the sweep on the vendored sampler
        if optuna is not None:
            ostudy = optuna.create_study(
                direction="minimize", study_name=study_name,
                sampler=optuna.samplers.TPESampler(seed=seed))

            def ask():
                trial = ostudy.ask()
                params = {}
                for key, spec in space.items():
                    if spec[0] == "uniform":
                        params[key] = trial.suggest_float(key, spec[1], spec[2])
                    elif spec[0] == "loguniform":
                        params[key] = trial.suggest_float(key, spec[1],
                                                          spec[2], log=True)
                    elif spec[0] == "int":
                        params[key] = trial.suggest_int(key, int(spec[1]),
                                                        int(spec[2]))
                    else:
                        params[key] = trial.suggest_categorical(key, spec[1])
                return trial, params

            def tell(handle, params, value):
                ostudy.tell(handle, value)

            def finish():
                return ostudy.best_value, {k: _format(v) for k, v in
                                           ostudy.best_params.items()}
        else:
            log.info("optuna not installed; using the vendored TPE sampler "
                     "(m_cedm_tpu/tpe.py)")
            tpe = TPESampler(space, seed=seed)

            def ask():
                return None, tpe.suggest()

            def tell(handle, params, value):
                tpe.tell(params, value)

            def finish():
                params, value = tpe.best
                return value, {k: _format(v) for k, v in params.items()}
    else:  # random search
        probe = TPESampler(space, seed=seed, n_startup=10 ** 9)  # pure random
        probe.rng = random.Random(seed)

        def ask():
            return None, probe.suggest()

        def tell(handle, params, value):
            pass

    done = 0
    while done < n_trials:
        batch = min(max(int(n_jobs), 1), n_trials - done)
        asks = [ask() for _ in range(batch)]
        if batch == 1:
            values = [evaluate(asks[0][1])]
        else:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(batch) as ex:
                values = list(ex.map(lambda hp: evaluate(hp[1]), asks))
        for (handle, params), value in zip(asks, values):
            tell(handle, params, value)
        done += batch

    if finish is not None:
        best_value, best_params = finish()
    else:
        best_value, best_params = min(results, key=lambda r: r[0])

    log.info(f"best objective: {best_value} with {best_params}")
    with open(results_file, "w") as f:
        json.dump({"best_value": float(best_value), "best_params": best_params,
                   "sampler": sampler, "study_name": study_name,
                   "n_jobs": int(n_jobs),
                   "trials": [{"value": float(v), "params": p}
                              for v, p in results]}, f, indent=2, default=str)
    return float(best_value)


def main(argv=None) -> float:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-name", required=True)
    p.add_argument("--config-path", default="configs")
    p.add_argument("--n-trials", type=int, default=15)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sampler", choices=("tpe", "random"), default="tpe")
    p.add_argument("--space", action="append", default=[],
                   help="key=kind:args sampling spec (repeatable)")
    p.add_argument("overrides", nargs="*",
                   help="constant overrides, or hydra sweep overrides like "
                        "'lr=tag(log, interval(1e-4, 1e-2))'")
    args = p.parse_args(argv)

    space = {}
    for spec in args.space:
        key, rhs = spec.split("=", 1)
        space[key] = parse_space_spec(rhs)
    constants, hydra_space = split_multirun_overrides(args.overrides)
    space.update(hydra_space)
    if not space:
        raise SystemExit("no search space given (--space or sweep overrides)")

    return run_sweep(args.config_name, args.config_path, constants, space,
                     n_trials=args.n_trials, seed=args.seed,
                     sampler=args.sampler)


if __name__ == "__main__":
    main()
