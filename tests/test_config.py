"""Config system tests: hydra-compatible composition + instantiate registry,
and compose-ability of every shipped top-level config."""
import os

import pytest

from m_cedm_tpu.config import (
    DotDict,
    apply_override,
    compose,
    instantiate,
    register,
    to_dotdict,
)

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "configs")

ALL_TOP_CONFIGS = [
    "config_adm_edm_mcedm_res32",
    "config_adm_edm_res32_cond_h",
    "config_adm_res32_cond_h",
    "config_ddim_res32",
    "config_ddim_res32_cond_h",
    "config_edm_res32_cond_h",
    "config_fnostatereconstrabs2d",
    "config_oformer_t",
]


class TestCompose:
    def test_defaults_composition(self):
        cfg = compose(CONFIG_DIR, "config_adm_edm_mcedm_res32")
        assert cfg.model.hparams.name == "adm_edm_mcedm"
        assert cfg.datamodule.name == "h5_mask_datamodule"
        assert cfg.trainer.max_epochs == 500
        assert cfg.diff_sampler.type == "edm"
        assert cfg.system == "swe"
        assert cfg.seed == 1

    def test_dot_override(self):
        cfg = compose(CONFIG_DIR, "config_adm_edm_mcedm_res32",
                      ["trainer.max_epochs=3", "datamodule.batch_size=4",
                       "seed=7", "system=swe_per"])
        assert cfg.trainer.max_epochs == 3
        assert cfg.datamodule.batch_size == 4
        assert cfg.seed == 7
        assert cfg.system == "swe_per"

    def test_group_override(self):
        cfg = compose(CONFIG_DIR, "config_adm_edm_mcedm_res32",
                      ["diff_sampler=edm_sampler_inv"])
        assert cfg.diff_sampler.n_time_h == 0
        assert cfg.diff_sampler.n_time_u == 128

    def test_additive_override(self):
        cfg = compose(CONFIG_DIR, "config_adm_edm_mcedm_res32", ["+res=32"])
        assert cfg.res == 32

    def test_unknown_key_rejected(self):
        with pytest.raises(KeyError):
            compose(CONFIG_DIR, "config_adm_edm_mcedm_res32", ["nonexistent=1"])

    def test_null_override(self):
        cfg = compose(CONFIG_DIR, "config_adm_edm_mcedm_res32",
                      ["ckpt_path=null"])
        assert cfg.ckpt_path is None

    @pytest.mark.parametrize("name", ALL_TOP_CONFIGS)
    def test_all_top_configs_compose(self, name):
        cfg = compose(CONFIG_DIR, name)
        assert "_target_" in cfg.model
        assert "_target_" in cfg.datamodule
        assert "hparams" in cfg.model

    @pytest.mark.parametrize("name", ALL_TOP_CONFIGS)
    def test_all_model_targets_registered(self, name):
        import m_cedm_tpu.tasks  # noqa: F401 - populate registry
        from m_cedm_tpu.config import _REGISTRY

        cfg = compose(CONFIG_DIR, name)
        assert cfg.model._target_ in _REGISTRY


class TestInstantiate:
    def test_registered_builder(self):
        @register("tests.dummy.Thing")
        def build(**kw):
            return ("built", kw)

        out = instantiate(DotDict({"_target_": "tests.dummy.Thing", "a": 1}))
        assert out == ("built", {"a": 1})

    def test_reference_alias_paths_resolve(self):
        """Unmodified reference configs (torch class paths) must resolve."""
        import m_cedm_tpu.tasks  # noqa: F401
        import m_cedm_tpu.data  # noqa: F401
        from m_cedm_tpu.config import _REGISTRY

        for alias in ["models.mcedm.PlMcedm", "models.ddim.PlDdim",
                      "models.ddim.PlCondDdim", "models.ddim.PlCondEdm",
                      "models.fno_state_2d.PlFnoStateReconstr2d",
                      "models.oformer.PlOformer",
                      "datamodules.pl_datamodule.HDF5MaskDatamodule",
                      "datamodules.pl_oformer_datamodule.PlOformerSwpDatamodule"]:
            assert alias in _REGISTRY, alias

    def test_apply_override_nested(self):
        cfg = to_dotdict({"a": {"b": {"c": 1}}})
        apply_override(cfg, "a.b.c", "5")
        assert cfg.a.b.c == 5
