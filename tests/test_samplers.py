"""Sampler kernel tests: schedule constants, clamping semantics, and a
known-denoiser convergence check (if the denoiser is an oracle that always
returns the clean target, Heun sampling must converge to that target)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m_cedm_tpu.ops.schedules import alphas_cumprod_from_betas, get_beta_schedule
from m_cedm_tpu.samplers.ddim import (
    ddim_sample_cond,
    ddim_sample_repaint,
    make_ddim_schedule,
)
from m_cedm_tpu.samplers.edm import (
    heun_sample_cond,
    heun_sample_masked,
    heun_sample_repaint,
    make_edm_schedule,
)

B, H, W, C = 2, 8, 8, 2


@pytest.fixture(scope="module")
def abar():
    betas = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=1000)
    return alphas_cumprod_from_betas(betas)


class TestEdmSchedule:
    def test_grid_and_churn(self):
        s = make_edm_schedule(50, 0.002, 80.0, S_churn=15.0)
        assert s.num_steps == 50
        assert s.t_cur[0] == pytest.approx(80.0, rel=1e-4)
        assert s.t_next[-1] == 0.0
        gamma = min(15.0 / 50, np.sqrt(2) - 1)
        np.testing.assert_allclose(s.t_hat, s.t_cur * (1 + gamma), rtol=1e-5)

    def test_churn_window(self):
        s = make_edm_schedule(50, 0.002, 80.0, S_churn=15.0, S_min=1.0, S_max=10.0)
        outside = (s.t_cur < 1.0) | (s.t_cur > 10.0)
        np.testing.assert_allclose(s.t_hat[outside], s.t_cur[outside])
        inside = ~outside
        assert np.all(s.t_hat[inside] > s.t_cur[inside])

    def test_sigma_table_rounding(self, abar):
        table = np.sqrt((1 - abar) / abar)[::-1].copy()
        s = make_edm_schedule(18, 0.002, float(table[0]), sigma_table=table)
        # every scheduled sigma is a table entry
        for v in s.t_cur:
            assert np.min(np.abs(table - v)) < 1e-6

    def test_alpha_quirk_lookup(self, abar):
        """alphas are indexed at int(sigma) (reference compute_alpha quirk)."""
        table = np.sqrt((1 - abar) / abar)[::-1].copy()
        s = make_edm_schedule(18, 0.002, float(table[0]), sigma_table=table,
                              alphas_cumprod=abar)
        ext = np.concatenate([[1.0], abar])
        for t_next, a in zip(s.t_next, s.alpha_next):
            assert a == pytest.approx(ext[int(t_next) + 1], rel=1e-5)


class TestHeunSamplers:
    def oracle(self, target):
        """Denoiser oracle: always returns the clean target."""
        return lambda x, t, key: jnp.broadcast_to(target, x.shape)

    def test_masked_converges_to_oracle(self):
        target = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, C))
        mask = jnp.zeros((B, H, W, C)).at[..., 1].set(1.0)  # recover channel 1
        sched = make_edm_schedule(32, 0.002, 80.0)
        out = heun_sample_masked(self.oracle(target), jax.random.PRNGKey(0),
                                 target, mask, sched)
        final = out[:, -1]
        np.testing.assert_allclose(np.asarray(final), np.asarray(target),
                                   atol=1e-2)

    def test_masked_observed_region_untouched(self):
        known = jax.random.normal(jax.random.PRNGKey(2), (B, H, W, C))
        mask = jnp.zeros((B, H, W, C)).at[..., 1].set(1.0)
        sched = make_edm_schedule(8, 0.002, 80.0, S_churn=15.0)
        noisy_oracle = lambda x, t, key: x * 0.9  # arbitrary imperfect denoiser
        out = heun_sample_masked(noisy_oracle, jax.random.PRNGKey(0), known,
                                 mask, sched)
        final = out[:, -1]
        # channel 0 is observed: must be exactly the known values
        np.testing.assert_allclose(np.asarray(final[..., 0]),
                                   np.asarray(known[..., 0]), atol=1e-6)

    def test_cond_converges_to_oracle(self):
        target = jax.random.normal(jax.random.PRNGKey(3), (B, H, W, 1))
        sched = make_edm_schedule(32, 0.002, 80.0)
        out = heun_sample_cond(self.oracle(target), jax.random.PRNGKey(0),
                               (B, H, W, 1), sched)
        np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(target),
                                   atol=1e-2)

    def test_repaint_clamps_known(self, abar):
        table = np.sqrt((1 - abar) / abar)[::-1].copy()
        sched = make_edm_schedule(8, 0.002, float(table[0]), sigma_table=table,
                                  alphas_cumprod=abar)
        known = jax.random.normal(jax.random.PRNGKey(4), (B, H, W, C))
        mask = jnp.zeros((B, H, W, C)).at[..., 0].set(1.0)  # ch 0 observed
        out = heun_sample_repaint(self.oracle(known), jax.random.PRNGKey(0),
                                  known, mask, sched, n_repeat=2)
        final = out[:, -1]
        np.testing.assert_allclose(np.asarray(final[..., 0]),
                                   np.asarray(known[..., 0]), atol=1e-6)

    def test_return_all_steps(self):
        target = jnp.zeros((B, H, W, C))
        sched = make_edm_schedule(10, 0.002, 80.0)
        out = heun_sample_cond(self.oracle(target), jax.random.PRNGKey(0),
                               (B, H, W, C), sched, return_last=False)
        assert out.shape == (B, 10, H, W, C)

    def test_jit_compiles_once(self):
        sched = make_edm_schedule(4, 0.002, 80.0)
        target = jnp.zeros((B, H, W, C))
        f = jax.jit(lambda k: heun_sample_cond(self.oracle(target), k,
                                               (B, H, W, C), sched))
        out = f(jax.random.PRNGKey(0))
        assert out.shape == (B, 1, H, W, C)


class TestDdimSchedule:
    def test_uniform_sequence(self, abar):
        s = make_ddim_schedule(abar, 50, "uniform")
        assert s.num_steps == 50
        assert s.t[0] == 980  # reversed range(0, 1000, 20)
        assert s.t[-1] == 0
        ext = np.concatenate([[1.0], abar])
        np.testing.assert_allclose(s.at, ext[s.t.astype(int) + 1], rtol=1e-6)
        assert s.at_next[-1] == 1.0  # alpha_bar(-1) = 1

    def test_quad_sequence(self, abar):
        s = make_ddim_schedule(abar, 20, "quad")
        assert s.num_steps == 20
        assert np.all(np.diff(s.t) < 0)


class TestDdimSamplers:
    def eps_oracle(self, target, abar_arr):
        """eps oracle derived from the clean target: eps = (x - sqrt(a) x0) / sqrt(1-a)."""
        abar_j = jnp.asarray(abar_arr)

        def eps(x, t, x_sc, key):
            a = abar_j[t.astype(jnp.int32)]
            return (x - jnp.sqrt(a) * target) / jnp.sqrt(1 - a)

        return eps

    def test_cond_converges(self, abar):
        target = jax.random.normal(jax.random.PRNGKey(5), (B, H, W, 1))
        s = make_ddim_schedule(abar, 50, "uniform")
        out = ddim_sample_cond(self.eps_oracle(target, abar),
                               jax.random.PRNGKey(0), (B, H, W, 1), s)
        np.testing.assert_allclose(np.asarray(out[:, -1]), np.asarray(target),
                                   atol=5e-2)

    def test_repaint_clamps_and_converges(self, abar):
        target = jax.random.normal(jax.random.PRNGKey(6), (B, H, W, C))
        mask = jnp.zeros((B, H, W, C)).at[..., 0].set(1.0)
        s = make_ddim_schedule(abar, 50, "uniform")
        out = ddim_sample_repaint(self.eps_oracle(target, abar),
                                  jax.random.PRNGKey(0), target, mask, s,
                                  n_repeat=3)
        final = out[:, -1]
        np.testing.assert_allclose(np.asarray(final), np.asarray(target), atol=6e-2)
