"""PyClaw-backed simulator-oracle loss (host-side, optional).

Parity target: models/pde_loss_sim.py:9-114 in the reference — a SweFvLoss
whose one-step transition is the PyClaw ground-truth solver instead of the
FORCE scheme. Non-differentiable; runs per-batch-item on the host CPU.

This module raises ImportError when clawpack is unavailable, and the registry
(physics/pde_loss.py:_maybe_simulator_loss) falls back to the FV loss — the
same graceful degradation as the reference (loss_helper.py:3-10).
"""
from __future__ import annotations

import numpy as np

from clawpack import pyclaw  # noqa: F401 - gate on availability
from clawpack import riemann

import jax.numpy as jnp

from m_cedm_tpu.physics.pde_loss import SweFvLoss, flip_state, _norm_channels


class SweSimulatorLoss:
    """SweFvLoss-compatible loss that advances each time slice with PyClaw."""

    def __init__(self, fv_loss: SweFvLoss):
        self.fv = fv_loss
        self.flip_xy = fv_loss.flip_xy
        self.Tn = fv_loss.Tn
        self.x_min = fv_loss.x_min
        self.x_max = fv_loss.x_max

    def _make_solver(self, xdim: int):
        solver = pyclaw.ClawSolver1D(riemann.shallow_roe_with_efix_1D)
        solver.limiters = pyclaw.limiters.tvd.vanleer
        solver.kernel_language = "Fortran"
        solver.num_waves = 2
        solver.num_eqn = 2
        solver.bc_lower[0] = pyclaw.BC.extrap
        solver.bc_upper[0] = pyclaw.BC.extrap
        x = pyclaw.Dimension(self.x_min, self.x_max, xdim, name="x")
        domain = pyclaw.Domain(x)
        return solver, domain

    def step(self, s_t, dt):
        """One PyClaw step for every (batch, time) slice. s_t: (B, T, X, 2)."""
        s = np.asarray(s_t)
        b, t, xdim, _ = s.shape
        solver, domain = self._make_solver(xdim)
        out = np.empty_like(s)
        for bi in range(b):
            for ti in range(t):
                state = pyclaw.State(domain, solver.num_eqn)
                state.problem_data["grav"] = self.fv.g
                state.problem_data["dry_tolerance"] = 1e-3
                state.problem_data["sea_level"] = 0.0
                h = s[bi, ti, :, 0]
                u = s[bi, ti, :, 1]
                state.q[0, :] = h
                state.q[1, :] = h * u
                solution = pyclaw.Solution(state, domain)
                solver.evolve_to_time(solution, dt)
                h_next = solution.state.q[0, :]
                hu_next = solution.state.q[1, :]
                out[bi, ti, :, 0] = h_next
                out[bi, ti, :, 1] = hu_next / (h_next + self.fv.eps)
        return jnp.asarray(out)

    def unroll_from_init(self, ic, n_steps: int):
        states = [np.asarray(ic)]
        dt = self.Tn / n_steps
        s = ic
        for _ in range(n_steps):
            s = self.step(s, dt)
            states.append(np.asarray(s))
        return jnp.concatenate([jnp.asarray(a) for a in states], axis=1)

    def unroll_loss(self, pred, gt, normalizer_h, normalizer_u,
                    return_unroll=False):
        if self.flip_xy:
            pred, gt = flip_state(pred, gt, _norm_channels(normalizer_h),
                                  _norm_channels(normalizer_u))
        unrolled = self.unroll_from_init(pred[:, 0:1], pred.shape[1] - 1)
        loss = (unrolled - gt) ** 2 / self.fv._scale(normalizer_h, normalizer_u)
        if return_unroll:
            return loss, unrolled
        return loss

    def __call__(self, pred, gt, normalizer_h, normalizer_u, return_d=False,
                 calc_prob=False, clamp_loss=False):
        if return_d:
            raise NotImplementedError(
                "simulator loss is not differentiable; use the FV loss")
        if self.flip_xy:
            pred, gt = flip_state(pred, gt, _norm_channels(normalizer_h),
                                  _norm_channels(normalizer_u))
        n_times = pred.shape[1]
        dt = self.Tn / n_times
        pred_next = self.step(pred, dt)
        pred_next_ic = jnp.concatenate([pred[:, 0:1], pred_next[:, :-1]], axis=1)
        pred_next_ic = jnp.nan_to_num(pred_next_ic)
        scale = self.fv._scale(normalizer_h, normalizer_u)
        loss = (pred_next_ic - gt) ** 2 / scale
        if clamp_loss:
            loss = jnp.clip(loss, max=1.0)
        return loss
