"""Tests of the PDE residual losses, cross-checked against an independent
torch implementation of the same FORCE/finite-difference formulas."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from m_cedm_tpu.ops.normalizer import Normalizer
from m_cedm_tpu.physics import DarcyLoss, SweFvLoss, get_pde_loss_function


def torch_force_step(s_t, dt, x_min, x_max, n_ghosts=2, g=1.0, eps=1e-8):
    """Independent torch transcription of the FORCE update formulas
    (Toro's centred scheme) for cross-checking."""
    b, t, nx, c = s_t.shape
    step = (x_max - x_min) / nx
    dx = step
    s_ext = torch.nn.functional.pad(s_t, (0, 0, n_ghosts, n_ghosts), mode="replicate")
    h = s_ext[..., 0]
    hu = s_ext[..., 1] * s_ext[..., 0]
    hm = 0.5 * (h[..., :-1] + h[..., 1:]) - 0.5 * dt * (hu[..., 1:] - hu[..., :-1]) / dx
    upd = hu ** 2 / (h + eps) + 0.5 * g * h ** 2
    hum = 0.5 * (hu[..., :-1] + hu[..., 1:]) - 0.5 * dt * (upd[..., 1:] - upd[..., :-1]) / dx
    h_next = 0.5 * (hm[..., :-1] + hm[..., 1:]) - 0.5 * dt * (hum[..., 1:] - hum[..., :-1]) / dx
    upd2 = hum ** 2 / (hm + eps) + 0.5 * g * hm ** 2
    hu_next = 0.5 * (hum[..., :-1] + hum[..., 1:]) - 0.5 * dt * (upd2[..., 1:] - upd2[..., :-1]) / dx
    h_out = h_next[..., n_ghosts - 1:-n_ghosts + 1]
    u_out = hu_next[..., n_ghosts - 1:-n_ghosts + 1] / (h_out + eps)
    return torch.stack((h_out, u_out), dim=-1)


class TestSweFvLoss:
    def setup_method(self):
        rs = np.random.RandomState(0)
        # positive water height, small velocities
        h = 1.0 + 0.1 * rs.rand(2, 16, 32, 1).astype(np.float32)
        u = 0.1 * rs.randn(2, 16, 32, 1).astype(np.float32)
        self.state = np.concatenate([h, u], axis=-1)
        self.loss = SweFvLoss(Tn=0.128, x_min=-0.5, x_max=0.5)

    def test_step_matches_torch(self):
        dt = 0.128 / 16
        got = self.loss.step(jnp.asarray(self.state), dt)
        expected = torch_force_step(torch.tensor(self.state), dt, -0.5, 0.5)
        np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=2e-4, atol=1e-5)

    def test_residual_zero_for_exact_trajectory(self):
        # build a trajectory by actually integrating with the FV scheme;
        # its one-step residual against itself must be ~0
        ic = jnp.asarray(self.state[:, 0:1])
        traj = self.loss.unroll_from_init(ic, 15)
        norm = Normalizer.identity(())
        res = self.loss.residual(traj, traj, norm, norm)
        assert float(jnp.mean(res)) < 1e-6  # fp32 accumulation noise

    def test_residual_nonzero_for_noise(self):
        norm = Normalizer.identity(())
        pred = jnp.asarray(self.state)
        gt = pred + 0.5
        res = self.loss.residual(pred, gt, norm, norm)
        assert float(jnp.mean(res)) > 0.01

    def test_grad_shape_and_finite(self):
        norm = Normalizer.identity(())
        pred = jnp.asarray(self.state)
        d = self.loss(pred, pred, norm, norm, return_d=True)
        assert d.shape == pred.shape
        assert bool(jnp.all(jnp.isfinite(d)))

    def test_grad_matches_finite_difference(self):
        norm = Normalizer.identity(())
        pred = jnp.asarray(self.state[:1, :4, :8])
        gt = pred + 0.1

        def scalar(p):
            return jnp.mean(self.loss.residual(p, gt, norm, norm))

        d = self.loss(pred, gt, norm, norm, return_d=True)
        eps = 1e-3
        probe = np.zeros_like(np.asarray(pred))
        probe[0, 2, 3, 0] = eps
        fd = (scalar(pred + probe) - scalar(pred - probe)) / (2 * eps)
        np.testing.assert_allclose(float(d[0, 2, 3, 0]), float(fd), rtol=2e-2, atol=1e-5)

    def test_unroll_shapes(self):
        ic = jnp.asarray(self.state[:, 0:1])
        traj = self.loss.unroll_from_init(ic, 7)
        assert traj.shape == (2, 8, 32, 2)
        np.testing.assert_allclose(traj[:, 0], self.state[:, 0], rtol=1e-6)

    def test_scaling_by_normalizer_variance(self):
        norm_h = Normalizer.gauss(0.0, 2.0)
        norm_u = Normalizer.gauss(0.0, 4.0)
        pred = jnp.asarray(self.state)
        gt = pred + 1.0
        res = self.loss.residual(pred, gt, norm_h, norm_u)
        res_id = self.loss.residual(pred, gt, Normalizer.identity(()), Normalizer.identity(()))
        np.testing.assert_allclose(np.asarray(res[..., 0]), np.asarray(res_id[..., 0]) / 4, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(res[..., 1]), np.asarray(res_id[..., 1]) / 16, rtol=1e-5)

    def test_jit_compatible(self):
        norm = Normalizer.identity(())
        f = jax.jit(lambda p, g: jnp.sum(self.loss(p, g, norm, norm, clamp_loss=True)))
        out = f(jnp.asarray(self.state), jnp.asarray(self.state) + 0.1)
        assert np.isfinite(float(out))


class TestDarcyLoss:
    def setup_method(self):
        rs = np.random.RandomState(1)
        a = 1.0 + rs.rand(2, 16, 16, 1).astype(np.float32)
        u = rs.randn(2, 16, 16, 1).astype(np.float32) * 0.01
        self.pred = jnp.asarray(np.concatenate([a, u], axis=-1))
        self.loss = DarcyLoss()

    def test_residual_matches_torch_stencil(self):
        p = torch.tensor(np.asarray(self.pred))
        size = p.shape[1]
        a, u = p[..., 0], p[..., 1]
        dx = 1.0 / size
        ux = (u[:, 2:, 1:-1] - u[:, :-2, 1:-1]) / (2 * dx)
        uy = (u[:, 1:-1, 2:] - u[:, 1:-1, :-2]) / (2 * dx)
        a_in = a[:, 1:-1, 1:-1]
        aux, auy = a_in * ux, a_in * uy
        auxx = (aux[:, 2:, 1:-1] - aux[:, :-2, 1:-1]) / (2 * dx)
        auyy = (auy[:, 1:-1, 2:] - auy[:, 1:-1, :-2]) / (2 * dx)
        expected = ((-(auxx + auyy)) - 1.0) ** 2
        got = self.loss.residual(self.pred)
        np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=1e-3, atol=1e-3)

    def test_forward_normalizes_by_area(self):
        norm = Normalizer.identity(())
        full = self.loss.residual(self.pred)
        out = self.loss(self.pred, self.pred, norm, norm)
        t, n = full.shape[1], full.shape[2]
        np.testing.assert_allclose(np.asarray(out), np.asarray(full) / (t * n), rtol=1e-6)

    def test_grad_finite(self):
        norm = Normalizer.identity(())
        d = self.loss(self.pred, self.pred, norm, norm, return_d=True, calc_prob=True)
        assert d.shape == self.pred.shape
        assert bool(jnp.all(jnp.isfinite(d)))


class TestRegistry:
    def test_systems(self):
        f, sim = get_pde_loss_function("swe", flip_xy=False)
        assert isinstance(f, SweFvLoss) and f.Tn == pytest.approx(1.28)
        f, _ = get_pde_loss_function("swe_per", flip_xy=False)
        assert f.Tn == pytest.approx(0.128) and f.x_min == -0.5
        f, _ = get_pde_loss_function("darcy", flip_xy=True)
        assert isinstance(f, DarcyLoss) and f.flip_xy
        f, _ = get_pde_loss_function("unknown_system", flip_xy=False)
        assert isinstance(f, SweFvLoss)
