"""Mixed-precision (bfloat16 compute) tests for the diffusion tasks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m_cedm_tpu.tasks import McedmTask
from tests.test_tasks import grid_batch, mcedm_hparams

RES = 16


class TestBf16Compute:
    def setup_method(self):
        hp32 = mcedm_hparams()
        hp16 = mcedm_hparams()
        hp16["model"]["dtype"] = "bfloat16"
        self.t32 = McedmTask(hp32)
        self.t16 = McedmTask(hp16)
        for t in (self.t32, self.t16):
            t.set_pde_loss_function("swe_per", False)
        self.state = self.t32.init_state(jax.random.PRNGKey(0))
        self.batch = grid_batch(jax.random.PRNGKey(1))

    def test_master_params_stay_fp32(self):
        state, _ = self.t16.train_step(self.state, self.batch,
                                       jax.random.PRNGKey(2))
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.ema_params):
            assert leaf.dtype == jnp.float32

    def test_forward_outputs_close(self):
        x = jax.random.normal(jax.random.PRNGKey(3), (2, RES, RES, 2))
        cond = jnp.zeros((2, RES, RES, 2))
        sigma = jnp.full((2,), 1.0)
        d32 = self.t32.model_precond(self.state.params, x, sigma, cond)
        d16 = self.t16.model_precond(self.state.params, x, sigma, cond)
        assert d16.dtype == jnp.float32  # output restored to fp32
        # bf16 has ~3 decimal digits; activations are O(1)
        np.testing.assert_allclose(np.asarray(d16), np.asarray(d32), atol=0.05)

    def test_train_loss_close(self):
        key = jax.random.PRNGKey(4)
        _, m32 = self.t32.train_step(self.state, self.batch, key)
        _, m16 = self.t16.train_step(self.state, self.batch, key)
        l32, l16 = float(m32["train_loss"]), float(m16["train_loss"])
        assert abs(l32 - l16) / abs(l32) < 0.1

    def test_sampling_close(self):
        mask = jnp.concatenate([jnp.zeros((2, RES, RES, 1)),
                                jnp.ones((2, RES, RES, 1))], axis=-1)
        cond = jnp.zeros((2, RES, RES, 2))
        key = jax.random.PRNGKey(5)
        o32 = self.t32.sample_edm(self.state, cond, mask, key)
        o16 = self.t16.sample_edm(self.state, cond, mask, key)
        # same PRNG path, same schedule; only net arithmetic differs
        mad = float(jnp.mean(jnp.abs(o32 - o16)))
        assert mad < 0.1


class TestFamilyBf16:
    """bf16 compute for the FNO / OFormer families (hparams['dtype'],
    wired from trainer.precision=bf16 by run.py — round-4 TPU profile:
    fp32 matmuls run as 3-pass bf16x3 decompositions, so explicit bf16
    halves HBM traffic and triples MXU rate)."""

    def test_fno_bf16_close_and_fp32_master(self):
        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.tasks import FnoStateReconstrTask

        T = X = 32
        hp = dict(name="fno_state_reconstr_2d", modes_1=5, modes_2=5,
                  width=8, num_layers=2, padding_t=4, padding_x=0,
                  inst_norm=False, time_history=T, time_future=0,
                  input_size=1, state_size=1, norm_shape=[], factor=0.3,
                  step_size=50, loss="l1", lr=1e-3, weight_decay=0)
        t32 = FnoStateReconstrTask(to_dotdict(dict(hp)))
        t16 = FnoStateReconstrTask(to_dotdict(dict(hp, dtype="bfloat16")))
        for t in (t32, t16):
            t.set_pde_loss_function("swe_per", False)
        state = t32.init_state(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        u = jax.random.normal(key, (2, T, X, 1))
        s = jax.random.normal(jax.random.fold_in(key, 1), (2, T, X, 1))
        x = jnp.broadcast_to(jnp.linspace(0, 1, X)[None], (2, X))
        t = jnp.broadcast_to(jnp.linspace(0, 1, T)[None], (2, T))
        p32 = t32._predict(state.params, u, x, t)
        p16 = t16._predict(state.params, u, x, t)
        assert p16.dtype == jnp.float32  # model returns fp32
        np.testing.assert_allclose(np.asarray(p16), np.asarray(p32),
                                   atol=0.02)
        st, m = t16.train_step(state, (u, x, t, s), jax.random.PRNGKey(2))
        assert np.isfinite(float(m["train_loss"]))
        for leaf in jax.tree_util.tree_leaves(st.params):
            assert leaf.dtype == jnp.float32

    def test_oformer_bf16_close_and_fp32_master(self):
        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.tasks import OformerTask

        T = X = 16
        ntok = T * X
        hp = {
            "name": "oformer_t", "time_history": T,
            "encoder": {"input_channels": 3, "time_window": 1,
                        "in_emb_dim": 32, "out_channels": 32,
                        "max_node_type": 2, "heads": 1, "depth": 2,
                        "res": X, "use_ln": True, "emb_dropout": 0.0,
                        "relative_emb_dim": 2},
            "decoder": {"max_node_type": 2, "latent_channels": 32,
                        "out_channels": 1, "res": X, "scale": 2,
                        "dropout": 0.0, "relative_emb_dim": 2},
            "norm_shape": [], "loss": "mse", "lr": 1e-3,
            "weight_decay": 1e-4, "curriculum_steps": 0,
            "curriculum_ratio": 0.2,
        }
        t32 = OformerTask(to_dotdict(hp))
        t16 = OformerTask(to_dotdict(dict(hp, dtype="bfloat16")))
        for t in (t32, t16):
            t.set_pde_loss_function("swe_per", False)
        state = t32.init_state(jax.random.PRNGKey(0))
        rs = jax.random.PRNGKey(1)
        xtok = jax.random.normal(rs, (2, 1, ntok, 3))
        y = jax.random.normal(jax.random.fold_in(rs, 1), (2, 1, ntok, 1))
        nt = jnp.zeros((2, ntok, 1), jnp.int32)
        tg, xg = jnp.meshgrid(jnp.linspace(0, 1, T), jnp.linspace(0, 1, X),
                              indexing="ij")
        pos = jnp.broadcast_to(jnp.stack([tg, xg], -1).reshape(1, ntok, 2),
                               (2, ntok, 2))
        f32 = t32.model.apply(state.params, xtok, nt, nt, pos, pos, 1)
        f16 = t16.model.apply(state.params, xtok, nt, nt, pos, pos, 1)
        assert f16.dtype == jnp.float32
        scale = float(jnp.abs(f32).mean())
        assert float(jnp.abs(f16 - f32).mean()) < 0.05 * max(scale, 1.0)
        n_time = jnp.full((2,), T, jnp.int32)
        st, m = t16.train_step(state, (xtok, y, nt, pos, n_time),
                               jax.random.PRNGKey(2))
        assert np.isfinite(float(m["train_loss"]))
        for leaf in jax.tree_util.tree_leaves(st.params["params"]):
            assert leaf.dtype == jnp.float32

    def test_oformer_rollout_bf16_drift_bounded(self):
        """Multi-step latent rollout in bf16 (r5: the rollout task was
        silently fp32 while train/infer ran bf16): the scan carries the
        latent in bf16 for 16 steps — per-step drift must not compound
        beyond the single-step tolerance band."""
        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.tasks import OformerTimePredTask

        T = X = 16
        nh = T // 2
        hp = {
            "name": "oformer_t", "time_history": T,
            "encoder": {"input_channels": 3, "time_window": 1,
                        "in_emb_dim": 32, "out_channels": 32,
                        "max_node_type": 2, "heads": 1, "depth": 2,
                        "res": X, "use_ln": True, "emb_dropout": 0.0,
                        "relative_emb_dim": 2},
            "decoder": {"max_node_type": 2, "latent_channels": 32,
                        "out_channels": 1, "res": X, "scale": 2,
                        "dropout": 0.0, "relative_emb_dim": 2},
            "norm_shape": [], "loss": "mse", "lr": 1e-3,
            "weight_decay": 1e-4, "curriculum_steps": 0,
            "curriculum_ratio": 0.2,
        }
        t32 = OformerTimePredTask(to_dotdict(hp))
        t16 = OformerTimePredTask(to_dotdict(dict(hp, dtype="bfloat16")))
        for t in (t32, t16):
            t.set_pde_loss_function("swe_per", False)
        state = t32.init_state(jax.random.PRNGKey(0))
        rs = jax.random.PRNGKey(1)
        xh = jax.random.normal(rs, (2, 1, nh * X, 3))
        nth = jnp.zeros((2, nh * X, 1), jnp.int32)
        tg, xg = jnp.meshgrid(jnp.linspace(0, 1, T), jnp.linspace(0, 1, X),
                              indexing="ij")
        pos = jnp.broadcast_to(
            jnp.stack([tg, xg], -1).reshape(1, T * X, 2), (2, T * X, 2))
        ph, pf = pos[:, :nh * X], pos[:, nh * X:]
        r32 = t32.model.apply(state.params, xh, nth, nth, ph, pf, nh * 2)
        r16 = t16.model.apply(state.params, xh, nth, nth, ph, pf, nh * 2)
        assert r16.dtype == jnp.float32
        scale = float(jnp.abs(r32).mean())
        # whole-rollout band AND last-step band (catches compounding)
        assert float(jnp.abs(r16 - r32).mean()) < 0.05 * max(scale, 1.0)
        last32, last16 = r32[:, -1], r16[:, -1]
        assert (float(jnp.abs(last16 - last32).mean())
                < 0.1 * max(float(jnp.abs(last32).mean()), 1.0))
