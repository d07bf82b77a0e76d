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
