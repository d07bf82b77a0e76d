"""End-to-end CLI tests: run.py (train+val+test) and eval_model.py restore,
on CPU with tiny shapes through the real config surface."""
import glob
import json
import os

import jax
import numpy as np
import pytest

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")


@pytest.fixture(scope="module")
def dataroot(tmp_path_factory):
    """Synthetic res-16 data placed at the reference path layout (the path
    router always uses the *_128_per names for training)."""
    from m_cedm_tpu.data.synthetic import write_swe_dataset

    root = tmp_path_factory.mktemp("dataroot")
    sub = root / "1D_swp_128_per"
    sub.mkdir()
    write_swe_dataset(str(sub / "1D_swp_128_per_train.h5"),
                      jax.random.PRNGKey(0), 8, 16, 16)
    write_swe_dataset(str(sub / "1D_swp_128_per_test.h5"),
                      jax.random.PRNGKey(1), 4, 16, 16, seed_offset=1000)
    return str(root)


TINY_OVERRIDES = [
    "system=swe_per",
    "trainer.max_epochs=1",
    "datamodule.batch_size=4",
    "model.hparams.model.resolution=16",
    "model.hparams.model.ch=16",
    "model.hparams.model.attn_resolutions=[8]",
    "model.hparams.model.ch_mult=[1,1]",
    "diff_sampler.timesteps=4",
    "diff_sampler.n_samples=1",
]


class TestRunCli:
    def test_mcedm_train_and_test(self, dataroot, tmp_path, monkeypatch):
        import run as run_module

        monkeypatch.chdir(tmp_path)
        metric = run_module.main(
            ["--config-name=config_adm_edm_mcedm_res32.yaml",
             f"--config-path={CONFIG_DIR}", f"dataroot={dataroot}"]
            + TINY_OVERRIDES)
        # mcedm logs no val_mae_u_scaled (reference parity) -> inf objective
        assert metric == float("inf") or np.isfinite(metric)

        run_dirs = glob.glob(str(tmp_path / "logs" / "runs" / "*"))
        assert run_dirs, "run directory created"
        metrics_file = os.path.join(run_dirs[0], "metrics.jsonl")
        records = [json.loads(l) for l in open(metrics_file)]
        keys = set().union(*[set(r) for r in records])
        assert "train_loss" in keys
        assert "test_mae_u" in keys and "test_mae_h" in keys
        assert "test_pde_loss_gt" in keys
        assert os.path.isdir(os.path.join(run_dirs[0], "checkpoints"))
        self._run_dir = run_dirs[0]

    def test_resume_override_epochs(self, dataroot, tmp_path, monkeypatch):
        """Resume from a finished run with a raised max_epochs +
        override_epochs: the extra epochs must actually run
        (reference run.py:78-80)."""
        import run as run_module

        monkeypatch.chdir(tmp_path)
        run_module.main(
            ["--config-name=config_adm_edm_mcedm_res32.yaml",
             f"--config-path={CONFIG_DIR}", f"dataroot={dataroot}"]
            + TINY_OVERRIDES)
        run_dir = sorted(glob.glob(str(tmp_path / "logs" / "runs" / "*")))[-1]

        overrides = [o for o in TINY_OVERRIDES
                     if not o.startswith("trainer.max_epochs")]
        run_module.main(
            ["--config-name=config_adm_edm_mcedm_res32.yaml",
             f"--config-path={CONFIG_DIR}", f"dataroot={dataroot}",
             f"ckpt_path={run_dir}", "trainer.max_epochs=3",
             "override_epochs=true"] + overrides)
        new_dir = sorted(glob.glob(str(tmp_path / "logs" / "runs" / "*")))[-1]
        assert new_dir != run_dir
        records = [json.loads(l)
                   for l in open(os.path.join(new_dir, "metrics.jsonl"))]
        train_epochs = {r["epoch"] for r in records if "train_loss" in r}
        assert {1, 2} <= train_epochs, (
            f"resume should have trained epochs 1-2, got {train_epochs}")

    def test_eval_model_restores(self, dataroot, tmp_path, monkeypatch):
        import run as run_module
        import eval_model

        monkeypatch.chdir(tmp_path)
        run_module.main(
            ["--config-name=config_adm_edm_mcedm_res32.yaml",
             f"--config-path={CONFIG_DIR}", f"dataroot={dataroot}"]
            + TINY_OVERRIDES)
        run_dir = sorted(glob.glob(str(tmp_path / "logs" / "runs" / "*")))[-1]

        metric = eval_model.main(
            ["--config-name=config_adm_edm_mcedm_res32.yaml",
             f"--config-path={CONFIG_DIR}", f"dataroot={dataroot}",
             f"ckpt_path={run_dir}"] + TINY_OVERRIDES)
        assert metric == float("inf") or np.isfinite(metric)


# tiny-shape overrides per config family (the 8 top-level configs; the JAX
# equivalent of the reference's README smoke commands, README.md:16-62)
_DIFF_TINY = TINY_OVERRIDES
# the DDPM U-Net normalizes with a fixed 32 groups (reference diffusion
# models/diffusion.py GroupNorm(32, ch)) — ch must stay a multiple of 32
_DDPM_TINY = [o if not o.startswith("model.hparams.model.ch=")
              else "model.hparams.model.ch=32" for o in TINY_OVERRIDES]
_FNO_TINY = [
    "system=swe_per",
    "trainer.max_epochs=1",
    "datamodule.batch_size=4",
    "model.hparams.modes_1=4",
    "model.hparams.modes_2=4",
    "model.hparams.width=8",
    "model.hparams.num_layers=2",
    "model.hparams.time_history=16",
]
_OFORMER_TINY = [
    "system=swe_per",
    "trainer.max_epochs=1",
    "datamodule.batch_size=4",
    "model.hparams.time_history=16",
    "model.hparams.encoder.res=16",
    "model.hparams.decoder.res=16",
    "model.hparams.encoder.in_emb_dim=16",
    "model.hparams.encoder.out_channels=16",
    "model.hparams.encoder.depth=1",
    "model.hparams.decoder.latent_channels=16",
    "model.hparams.curriculum_steps=2",
]

SMOKE_MATRIX = [
    # (config, overrides, expected metric-key subset)
    ("config_adm_edm_mcedm_res32.yaml", _DIFF_TINY,
     {"train_loss", "test_mae_h", "test_mae_u", "test_pde_loss_gt"}),
    ("config_ddim_res32.yaml", _DDPM_TINY,
     {"train_loss", "test_mae_h", "test_mae_u", "test_pde_loss_gt"}),
    ("config_ddim_res32_cond_h.yaml", _DDPM_TINY,
     {"train_loss", "test_mae_u", "test_pde_loss_gt"}),
    ("config_adm_res32_cond_h.yaml", _DIFF_TINY,
     {"train_loss", "test_mae_u", "test_pde_loss_gt"}),
    ("config_adm_edm_res32_cond_h.yaml", _DIFF_TINY,
     {"train_loss", "test_mae_u", "test_pde_loss_gt"}),
    ("config_edm_res32_cond_h.yaml", _DDPM_TINY,
     {"train_loss", "test_mae_u", "test_pde_loss_gt"}),
    ("config_fnostatereconstrabs2d.yaml", _FNO_TINY,
     {"train_loss", "test_mae_u", "test_pde_loss_gt"}),
    ("config_oformer_t.yaml", _OFORMER_TINY,
     {"train_loss", "test_mae_u", "test_pde_loss_gt"}),
]


class TestAllConfigsSmoke:
    """Every top-level config driven end-to-end through run.py main
    (train + val + test) on tiny synthetic data: finite losses and the
    family's metric keys present. The reference's de-facto smoke tests are
    its README run commands for each config (README.md:16-62)."""

    @pytest.mark.parametrize("config,overrides,want_keys",
                             [pytest.param(*row, id=row[0][7:-5])
                              for row in SMOKE_MATRIX])
    def test_config_smoke(self, config, overrides, want_keys, dataroot,
                          tmp_path, monkeypatch):
        import run as run_module

        monkeypatch.chdir(tmp_path)
        metric = run_module.main(
            [f"--config-name={config}", f"--config-path={CONFIG_DIR}",
             f"dataroot={dataroot}"] + list(overrides))
        assert metric == float("inf") or np.isfinite(metric)

        run_dirs = glob.glob(str(tmp_path / "logs" / "runs" / "*"))
        assert run_dirs, "run directory created"
        records = [json.loads(l)
                   for l in open(os.path.join(run_dirs[0], "metrics.jsonl"))]
        keys = set().union(*[set(r) for r in records])
        missing = want_keys - keys
        assert not missing, f"{config}: missing metric keys {missing}"
        for r in records:
            for k in want_keys & set(r):
                v = r[k]
                if isinstance(v, (int, float)):
                    assert np.isfinite(v), f"{config}: {k} not finite ({v})"
