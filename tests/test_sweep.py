"""Sweep system: vendored TPE sampler + hydra --multirun override parity."""
import json
import math
import os

import numpy as np
import pytest

from m_cedm_tpu.tpe import TPESampler
from sweep import parse_hydra_sweep, run_sweep, split_multirun_overrides


class TestTPESampler:
    def test_minimizes_quadratic(self):
        """TPE must concentrate near the optimum of a smooth 1-D objective
        well beyond the startup-random phase."""
        space = {"x": ("uniform", 0.0, 1.0)}
        tpe = TPESampler(space, seed=0, n_startup=5)
        for _ in range(40):
            p = tpe.suggest()
            tpe.tell(p, (p["x"] - 0.3) ** 2)
        best, value = tpe.best
        assert abs(best["x"] - 0.3) < 0.08, best
        # late suggestions are drawn from the good-region Parzen mixture
        late = [tpe.suggest()["x"] for _ in range(20)]
        assert np.median(np.abs(np.asarray(late) - 0.3)) < 0.2

    def test_beats_random_on_average(self):
        """Across seeds, TPE's best-of-N should beat pure random search on
        the same budget (sanity that the l/g scoring actually steers)."""
        def run(sampler_cls_kwargs, seed):
            tpe = TPESampler({"x": ("uniform", -2.0, 2.0)}, seed=seed,
                             **sampler_cls_kwargs)
            for _ in range(50):
                p = tpe.suggest()
                tpe.tell(p, abs(p["x"] - 1.234))
            return tpe.best[1]

        seeds = range(10)
        tpe_scores = [run(dict(n_startup=5), s) for s in seeds]
        rnd_scores = [run(dict(n_startup=10 ** 9), s) for s in seeds]
        assert np.mean(tpe_scores) < np.mean(rnd_scores)

    def test_mixed_space_types(self):
        space = {"lr": ("loguniform", 1e-5, 1e-1),
                 "width": ("int", 4, 64),
                 "act": ("choice", ["relu", "gelu", "silu"])}
        tpe = TPESampler(space, seed=1, n_startup=4)
        for _ in range(25):
            p = tpe.suggest()
            assert 1e-5 <= p["lr"] <= 1e-1
            assert 4 <= p["width"] <= 64 and isinstance(p["width"], int)
            assert p["act"] in space["act"][1]
            loss = (math.log10(p["lr"]) + 3) ** 2 + abs(p["width"] - 32) / 32 \
                + (0.0 if p["act"] == "gelu" else 0.5)
            tpe.tell(p, loss)
        best, _ = tpe.best
        assert 1e-4 <= best["lr"] <= 1e-2

    def test_nonfinite_objective_handled(self):
        tpe = TPESampler({"x": ("uniform", 0, 1)}, seed=0, n_startup=2)
        p = tpe.suggest()
        tpe.tell(p, float("nan"))
        tpe.tell(tpe.suggest(), 0.5)
        for _ in range(5):
            tpe.tell(tpe.suggest(), 0.4)
        assert math.isfinite(tpe.best[1])


class TestHydraOverrideParsing:
    def test_interval(self):
        assert parse_hydra_sweep("interval(1e-4, 1e-2)") == ("uniform", 1e-4, 1e-2)

    def test_tag_log_interval(self):
        assert parse_hydra_sweep("tag(log, interval(0.0001, 0.01))") == (
            "loguniform", 0.0001, 0.01)

    def test_range_int(self):
        assert parse_hydra_sweep("range(1, 5)") == ("int", 1.0, 5.0)

    def test_range_step(self):
        kind, opts = parse_hydra_sweep("range(0.0, 1.0, 0.25)")
        assert kind == "choice"
        assert opts == [0, 0.25, 0.5, 0.75, 1.0]

    def test_choice(self):
        assert parse_hydra_sweep("choice(16, 32, 64)") == ("choice", [16, 32, 64])

    def test_plain_values_pass_through(self):
        assert parse_hydra_sweep("swe_per") is None
        assert parse_hydra_sweep("0.001") is None
        constants, space = split_multirun_overrides(
            ["system=swe_per", "lr=tag(log, interval(1e-4, 1e-2))",
             "trainer.max_epochs=1"])
        assert constants == ["system=swe_per", "trainer.max_epochs=1"]
        assert list(space) == ["lr"]


class TestHydraSweeperSurface:
    CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")

    def test_multirun_reads_hydra_block(self, monkeypatch):
        """run.py --multirun pulls n_trials/n_jobs/study_name/sampler.seed/
        sweep.dir from the config's hydra block (reference
        configs/config_adm_edm_mcedm_res32.yaml:20-33)."""
        import run as run_module
        import sweep as sweep_module

        captured = {}

        def fake_run_sweep(config_name, config_path, constants, space, **kw):
            captured.update(kw)
            captured["space"] = space
            return 0.5

        monkeypatch.setattr(sweep_module, "run_sweep", fake_run_sweep)
        v = run_module.main(
            ["-m", "--config-name=config_adm_edm_mcedm_res32.yaml",
             f"--config-path={self.CONFIG_DIR}",
             "model.hparams.optimization.lr=tag(log, interval(1e-4, 1e-2))"])
        assert v == 0.5
        assert captured["n_trials"] == 15
        assert captured["n_jobs"] == 2
        assert captured["seed"] == 0
        assert captured["study_name"] == "adm_edm_mcedm"
        assert "logs/sweepruns/adm_edm_mcedm" in captured["sweep_dir"]
        assert list(captured["space"]) == ["model.hparams.optimization.lr"]

    def test_multirun_cli_hydra_overrides_win(self, monkeypatch):
        """Reference-style `hydra.sweeper.n_trials=30` CLI overrides beat
        both the yaml block and the --n-trials flag."""
        import run as run_module
        import sweep as sweep_module

        captured = {}

        def fake_run_sweep(config_name, config_path, constants, space, **kw):
            captured.update(kw)
            captured["constants"] = constants
            return 0.0

        monkeypatch.setattr(sweep_module, "run_sweep", fake_run_sweep)
        run_module.main(
            ["-m", "--config-name=config_adm_edm_mcedm_res32.yaml",
             f"--config-path={self.CONFIG_DIR}", "--n-trials=7",
             "hydra.sweeper.n_trials=30", "hydra.sweeper.n_jobs=1",
             "hydra.sweeper.sampler.seed=5", "system=swe_per",
             "model.hparams.optimization.lr=interval(1e-4, 1e-2)"])
        assert captured["n_trials"] == 30
        assert captured["n_jobs"] == 1
        assert captured["seed"] == 5
        # hydra.* overrides are consumed, not composed into the job config
        assert captured["constants"] == ["system=swe_per"]

    def test_single_run_out_dir_from_yaml_hydra_block(self):
        """With the hydra block restored, compose exposes run.dir resolved
        against the job config (the ${now:...} template)."""
        from m_cedm_tpu.config import compose
        from run import hydra_setting

        cfg, block = compose(self.CONFIG_DIR, "config_adm_edm_mcedm_res32",
                             ["subname=_X"], return_hydra=True)
        d = hydra_setting(block, {}, "hydra.run.dir")
        assert d.startswith("logs/runs/adm_edm_mcedm_X20")
        # CLI hydra.* beats the yaml block
        assert hydra_setting(block, {"hydra.run.dir": "/x"},
                             "hydra.run.dir") == "/x"
        assert hydra_setting(block, {}, "hydra.sweeper.n_jobs") == 2
        assert hydra_setting(block, {}, "hydra.nope.missing", 9) == 9


class TestRunSweep:
    def test_n_jobs_parallel_trials(self, tmp_path):
        """n_jobs=2 runs trials concurrently between tells and routes each
        trial's output into <sweep_dir>/<job_num> (hydra.sweep.subdir
        equivalent)."""
        import threading
        import time

        seen_threads, seen_dirs = set(), []
        lock = threading.Lock()

        def objective(overrides):
            with lock:
                seen_threads.add(threading.get_ident())
                seen_dirs.extend(o.split("=", 1)[1] for o in overrides
                                 if o.startswith("hydra.run.dir="))
            time.sleep(0.05)
            lr = float(next(o.split("=")[1] for o in overrides
                            if o.startswith("lr=")))
            return abs(math.log10(lr) + 3)

        sweep_dir = str(tmp_path / "sweeprun")
        best = run_sweep("cfg.yaml", "configs", [],
                         {"lr": ("loguniform", 1e-5, 1e-1)},
                         n_trials=6, seed=0, objective_fn=objective,
                         n_jobs=2, study_name="s", sweep_dir=sweep_dir)
        assert math.isfinite(best)
        assert len(seen_threads) >= 2, "trials should run on worker threads"
        assert sorted(seen_dirs) == [os.path.join(sweep_dir, str(i))
                                     for i in range(6)]
        res = json.load(open(os.path.join(sweep_dir, "sweep_results.json")))
        assert len(res["trials"]) == 6
        assert res["study_name"] == "s"
    def test_tpe_sweep_plumbing(self, tmp_path, monkeypatch):
        """run_sweep drives objective_fn with composed overrides, minimizes,
        and writes the reference-style results file (15-trial TPE default)."""
        monkeypatch.chdir(tmp_path)
        calls = []

        def objective(overrides):
            assert "system=swe_per" in overrides
            lr = float(next(o.split("=")[1] for o in overrides
                            if o.startswith("model.lr=")))
            calls.append(lr)
            return (math.log10(lr) + 3) ** 2

        best = run_sweep("cfg.yaml", "configs", ["system=swe_per"],
                         {"model.lr": ("loguniform", 1e-5, 1e-1)},
                         n_trials=15, seed=0, objective_fn=objective)
        assert len(calls) == 15
        res = json.load(open(tmp_path / "sweep_results.json"))
        assert res["best_value"] == pytest.approx(best)
        assert len(res["trials"]) == 15
        assert 1e-4 <= float(res["best_params"]["model.lr"]) <= 1e-2
