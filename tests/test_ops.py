"""Golden numerics tests for ops primitives vs independently-computed values
and (where useful) torch reference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m_cedm_tpu.ops import losses
from m_cedm_tpu.ops.normalizer import Normalizer
from m_cedm_tpu.ops.schedules import (
    alphas_cumprod_from_betas,
    ddpm_as_edm_coeffs,
    edm_loss_weight,
    edm_precond_coeffs,
    edm_train_sigma,
    fourier_positional_embedding,
    get_beta_schedule,
    karras_sigma_grid,
    sinusoidal_timestep_embedding,
)


class TestBetaSchedules:
    def test_linear_endpoints(self):
        b = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=1000)
        assert b.shape == (1000,)
        np.testing.assert_allclose(b[0], 1e-4, rtol=1e-6)
        np.testing.assert_allclose(b[-1], 0.02, rtol=1e-6)

    def test_quad(self):
        b = get_beta_schedule("quad", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=10)
        expected = np.linspace(1e-2, 0.02 ** 0.5, 10) ** 2
        np.testing.assert_allclose(b, expected, rtol=1e-5)

    def test_jsd(self):
        b = get_beta_schedule("jsd", beta_start=0, beta_end=0, num_diffusion_timesteps=4)
        np.testing.assert_allclose(b, [1 / 4, 1 / 3, 1 / 2, 1.0], rtol=1e-6)

    def test_sigmoid_monotone(self):
        b = get_beta_schedule("sigmoid", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=100)
        assert np.all(np.diff(b) > 0)
        # sigmoid(-6)*(end-start)+start, per the reference formula
        expected0 = 1 / (np.exp(6.0) + 1) * (0.02 - 1e-4) + 1e-4
        assert b[0] == pytest.approx(expected0, rel=1e-4)

    def test_alphas_cumprod(self):
        b = get_beta_schedule("linear", beta_start=1e-4, beta_end=0.02,
                              num_diffusion_timesteps=1000)
        a = alphas_cumprod_from_betas(b)
        assert a[0] == pytest.approx(1 - 1e-4, rel=1e-6)
        assert np.all(np.diff(a) < 0)
        # known value for the standard schedule
        assert a[-1] == pytest.approx(4.0358e-5, rel=1e-3)


class TestKarrasGrid:
    def test_endpoints_and_zero(self):
        t = karras_sigma_grid(50, 0.002, 80.0, rho=7.0)
        assert t.shape == (51,)
        assert t[0] == pytest.approx(80.0, rel=1e-5)
        assert t[49] == pytest.approx(0.002, rel=1e-4)
        assert t[50] == 0.0
        assert np.all(np.diff(t) < 0)

    def test_formula_float64(self):
        # matches the reference formula evaluated in float64
        n, smin, smax, rho = 18, 0.002, 80.0, 7.0
        i = np.arange(n, dtype=np.float64)
        expected = (smax ** (1 / rho) + i / (n - 1) * (smin ** (1 / rho) - smax ** (1 / rho))) ** rho
        got = karras_sigma_grid(n, smin, smax, rho)[:-1]
        np.testing.assert_allclose(got, expected, rtol=1e-6)


class TestEdmPrecond:
    def test_coeffs(self):
        sigma = jnp.array([0.002, 1.0, 80.0])
        c_skip, c_out, c_in, c_noise = edm_precond_coeffs(sigma, sigma_data=1.0)
        np.testing.assert_allclose(c_skip, 1.0 / (sigma ** 2 + 1), rtol=1e-6)
        np.testing.assert_allclose(c_out, sigma / np.sqrt(sigma ** 2 + 1), rtol=1e-6)
        np.testing.assert_allclose(c_in, 1 / np.sqrt(1 + sigma ** 2), rtol=1e-6)
        np.testing.assert_allclose(c_noise, np.log(sigma) / 4, rtol=1e-5)

    def test_identity_at_sigma_data(self):
        # c_skip + c_out structure: at sigma=sigma_data, c_skip = 0.5
        c_skip, *_ = edm_precond_coeffs(1.0, sigma_data=1.0)
        assert float(c_skip) == pytest.approx(0.5)

    def test_loss_weight(self):
        sigma = jnp.array([0.5, 2.0])
        w = edm_loss_weight(sigma, 1.0)
        np.testing.assert_allclose(w, (sigma ** 2 + 1) / sigma ** 2, rtol=1e-6)

    def test_train_sigma_lognormal(self):
        key = jax.random.PRNGKey(0)
        z = jax.random.normal(key, (20000,))
        s = edm_train_sigma(z)
        assert np.log(s).mean() == pytest.approx(-1.2, abs=0.05)
        assert np.log(s).std() == pytest.approx(1.2, abs=0.05)

    def test_ddpm_as_edm(self):
        sigma = jnp.array([0.1, 1.0, 10.0])
        c_skip, c_out, c_in = ddpm_as_edm_coeffs(sigma)
        np.testing.assert_allclose(c_skip, 1.0)
        np.testing.assert_allclose(c_out, -sigma)
        np.testing.assert_allclose(c_in, 1 / np.sqrt(sigma ** 2 + 1), rtol=1e-6)


class TestEmbeddings:
    def test_sinusoidal_matches_reference_formula(self):
        import math
        t = np.array([0.0, 1.0, 500.0])
        dim = 64
        half = dim // 2
        freqs = np.exp(np.arange(half) * -(math.log(10000.0) / (half - 1)))
        args = t[:, None] * freqs[None, :]
        expected = np.concatenate([np.sin(args), np.cos(args)], axis=1)
        got = sinusoidal_timestep_embedding(jnp.asarray(t), dim)
        # fp32 sin/cos at large phases: ~4e-4 abs error is expected
        np.testing.assert_allclose(got, expected, atol=5e-4)

    def test_sinusoidal_odd_dim_pads(self):
        e = sinusoidal_timestep_embedding(jnp.array([1.0]), 9)
        assert e.shape == (1, 9)
        assert float(e[0, -1]) == 0.0

    def test_fourier_matches_reference_formula(self):
        x = np.array([0.5, -1.3])
        dim = 32
        half = dim // 2
        freqs = (1 / 10000) ** (np.arange(half) / half)
        args = x[:, None] * freqs[None, :]
        expected = np.concatenate([np.cos(args), np.sin(args)], axis=1)
        got = fourier_positional_embedding(jnp.asarray(x), dim)
        np.testing.assert_allclose(got, expected, atol=2e-6)


class TestNormalizer:
    def test_roundtrip(self):
        n = Normalizer.gauss(mean=np.array([1.0, -2.0]), std=np.array([3.0, 0.5]))
        x = jnp.asarray(np.random.RandomState(0).randn(4, 8, 8, 2).astype(np.float32))
        np.testing.assert_allclose(n(n(x), inverse=True), x, rtol=1e-5, atol=1e-6)

    def test_scalar_stats(self):
        n = Normalizer.gauss(mean=2.0, std=4.0)
        np.testing.assert_allclose(n(jnp.array([10.0])), [2.0])

    def test_is_pytree(self):
        n = Normalizer.identity((2,))
        leaves = jax.tree_util.tree_leaves(n)
        assert len(leaves) == 2

    def test_jittable(self):
        n = Normalizer.gauss(1.0, 2.0)
        f = jax.jit(lambda norm, x: norm(x))
        np.testing.assert_allclose(f(n, jnp.array([5.0])), [2.0])


class TestLosses:
    def setup_method(self):
        rs = np.random.RandomState(42)
        self.pred = jnp.asarray(rs.randn(3, 8, 8, 2).astype(np.float32))
        self.target = jnp.asarray(rs.randn(3, 8, 8, 2).astype(np.float32))

    def test_noise_estimation_loss(self):
        w = jnp.ones((3, 1, 1, 1)) * 2.0
        got = losses.noise_estimation_loss(self.pred, self.target, w)
        expected = (2.0 * np.square(np.asarray(self.pred) - np.asarray(self.target))
                    ).sum(axis=(1, 2, 3)).mean()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_masked_loss(self):
        mask = jnp.zeros_like(self.pred).at[:, :4].set(1.0)
        got = losses.masked_loss(self.pred, self.target, mask)
        p, t, m = map(np.asarray, (self.pred, self.target, mask))
        expected = np.abs(p * m - t * m).sum() / m.sum()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_masked_loss_channel_slice(self):
        mask = jnp.ones_like(self.pred)
        got = losses.masked_loss(self.pred, self.target, mask, loss_dim=jnp.array([0]))
        p, t = map(np.asarray, (self.pred, self.target))
        expected = np.abs(p[..., :1] - t[..., :1]).sum() / mask[..., :1].sum()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_correlation_perfect(self):
        c = losses.correlation(self.pred, self.pred)
        np.testing.assert_allclose(c, np.ones(2), atol=1e-5)

    def test_correlation_anticorrelated(self):
        c = losses.correlation(self.pred, -self.pred)
        np.testing.assert_allclose(c, -np.ones(2), atol=1e-5)

    def test_lp_loss(self):
        got = losses.lp_loss(self.pred, self.target, p=2)
        p = np.asarray(self.pred).reshape(3, -1)
        t = np.asarray(self.target).reshape(3, -1)
        expected = (np.linalg.norm(p - t, axis=1) / np.linalg.norm(t, axis=1)).mean()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_scaled_mae_identical_after_affine(self):
        # min-max rescale removes affine differences
        got = losses.scaled_mae_loss(self.pred * 5 + 3, self.pred)
        np.testing.assert_allclose(got, 0.0, atol=1e-5)

    def test_multi_loss(self):
        got = losses.multi_loss(self.pred, self.target, kind="mse")
        expected = np.square(np.asarray(self.pred) - np.asarray(self.target)).sum(-1).mean()
        np.testing.assert_allclose(got, expected, rtol=1e-5)

    def test_downsampled(self):
        got = losses.downsampled_loss(self.pred, self.target, down_factor=2)
        p, t = map(np.asarray, (self.pred, self.target))
        expected = np.abs(p[:, ::2, ::2] - t[:, ::2, ::2]).mean()
        np.testing.assert_allclose(got, expected, rtol=1e-5)
