"""Differentiable PDE residual losses (jnp), with gradients via jax.grad.

Parity targets in the reference:
  - SweFvLoss  (FORCE finite-volume SWE residual):  models/pde_loss.py:89-248
  - DarcyLoss  (central-difference -div(a grad u)=1): models/pde_loss.py:19-86
  - SweFvGtLoss sigmoid->log-prob guidance variant:  models/pde_loss.py:393-396
  - registry get_pde_loss_function:                  models/loss_helper.py:13-38

Design notes (TPU-first redesign, not a translation):
  * The reference computes d(loss)/d(pred) by escaping torch inference mode and
    calling autograd (models/pde_loss.py:227-248). Here the residual is a pure
    function, so guidance gradients are simply `jax.grad` — they compose inside
    jit/scan sampler loops with no escape hatch.
  * `calc_prob` (sigmoid log-likelihood shaping used by classifier guidance) is
    folded into the same pure function.
  * NaN guards use jnp.nan_to_num (reference zeroes NaNs in-place).
  * The full-rollout `unroll_from_init` is a lax.scan.

All fields are NHWC-style (B, T, X, C) with C = (h, u).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def flip_state(pred, gt, h_ch: int, u_ch: int):
    """Swap the (h, u) channel blocks (used when the datamodule flipped x/y)."""
    pred = jnp.concatenate([pred[..., h_ch:u_ch + h_ch], pred[..., :h_ch]], axis=-1)
    gt = jnp.concatenate([gt[..., h_ch:u_ch + h_ch], gt[..., :h_ch]], axis=-1)
    return pred, gt


def _norm_channels(normalizer) -> int:
    arr = jnp.asarray(normalizer.subtract)
    return int(arr.shape[-1]) if arr.ndim > 0 else 1


@dataclasses.dataclass(frozen=True)
class SweFvLoss:
    """One-step FORCE finite-volume residual for 1D shallow-water equations.

    The predicted trajectory (B, T, X, 2) is advanced one FV step at every time
    slice simultaneously; the residual against the ground truth (scaled by the
    normalizer variances) is the physics loss.
    """
    Tn: float = 0.128
    x_min: float = -2.5
    x_max: float = 2.5
    n_ghosts: int = 2
    flip_xy: bool = False
    g: float = 1.0
    eps: float = 1e-8

    def _dx(self, nx: int) -> float:
        # cell spacing of the (ghost-extended) grid; for even nx the cell
        # centers are offset by step/2, either way spacing == step
        return (self.x_max - self.x_min) / nx

    def step(self, s_t, dt):
        """One FORCE step applied to every time slice. s_t: (B, T, X, 2)."""
        n_g = self.n_ghosts
        nx = s_t.shape[2]
        dx = self._dx(nx)

        # replicate-pad ghost cells along the spatial axis
        s_ext = jnp.concatenate(
            [jnp.repeat(s_t[:, :, :1], n_g, axis=2), s_t,
             jnp.repeat(s_t[:, :, -1:], n_g, axis=2)], axis=2)
        h = s_ext[..., 0]
        hu = s_ext[..., 1] * s_ext[..., 0]

        # half step: midpoints between adjacent cells
        hm = 0.5 * (h[..., :-1] + h[..., 1:]) - 0.5 * dt * (hu[..., 1:] - hu[..., :-1]) / dx
        flux = hu ** 2 / (h + self.eps) + 0.5 * self.g * h ** 2
        hum = 0.5 * (hu[..., :-1] + hu[..., 1:]) - 0.5 * dt * (flux[..., 1:] - flux[..., :-1]) / dx

        # full step on the interior nodes
        h_next = 0.5 * (hm[..., :-1] + hm[..., 1:]) - 0.5 * dt * (hum[..., 1:] - hum[..., :-1]) / dx
        flux_m = hum ** 2 / (hm + self.eps) + 0.5 * self.g * hm ** 2
        hu_next = 0.5 * (hum[..., :-1] + hum[..., 1:]) - 0.5 * dt * (flux_m[..., 1:] - flux_m[..., :-1]) / dx

        h_out = h_next[..., n_g - 1:-(n_g - 1)] if n_g > 1 else h_next
        hu_out = hu_next[..., n_g - 1:-(n_g - 1)] if n_g > 1 else hu_next
        u_out = hu_out / (h_out + self.eps)
        return jnp.stack([h_out, u_out], axis=-1)

    def _scale(self, normalizer_h, normalizer_u):
        sh = jnp.asarray(normalizer_h.divide, jnp.float32).reshape(-1)
        su = jnp.asarray(normalizer_u.divide, jnp.float32).reshape(-1)
        if self.flip_xy:
            scale = jnp.concatenate([su, sh], axis=-1)
        else:
            scale = jnp.concatenate([sh, su], axis=-1)
        return scale ** 2

    def residual(self, pred, gt, normalizer_h, normalizer_u):
        """Per-element squared residual of a one-step FV advance vs gt."""
        n_times = pred.shape[1]
        dt = self.Tn / n_times
        pred_next = self.step(pred, dt)
        pred_next_ic = jnp.concatenate([pred[:, 0:1], pred_next[:, :-1]], axis=1)
        pred_next_ic = jnp.nan_to_num(pred_next_ic)
        scale = self._scale(normalizer_h, normalizer_u)
        return (pred_next_ic - gt) ** 2 / scale

    def unroll_from_init(self, ic, n_steps: int):
        """Roll out n_steps from the initial slice ic: (B, 1, X, 2) via scan."""
        dt = self.Tn / n_steps

        def body(s, _):
            s2 = self.step(s, dt)
            return s2, s2

        _, states = jax.lax.scan(body, ic, None, length=n_steps)
        # states: (n_steps, B, 1, X, 2) -> (B, n_steps, X, 2)
        states = jnp.moveaxis(states[:, :, 0], 0, 1)
        return jnp.concatenate([ic, states], axis=1)

    def unroll_loss(self, pred, gt, normalizer_h, normalizer_u, return_unroll=False):
        if self.flip_xy:
            pred, gt = flip_state(pred, gt, _norm_channels(normalizer_h),
                                  _norm_channels(normalizer_u))
        unrolled = self.unroll_from_init(pred[:, 0:1], pred.shape[1] - 1)
        loss = (unrolled - gt) ** 2 / self._scale(normalizer_h, normalizer_u)
        if return_unroll:
            return loss, unrolled
        return loss

    def __call__(self, pred, gt, normalizer_h, normalizer_u, return_d=False,
                 calc_prob=False, clamp_loss=False):
        if self.flip_xy:
            pred, gt = flip_state(pred, gt, _norm_channels(normalizer_h),
                                  _norm_channels(normalizer_u))
        if return_d:
            def scalar_loss(p):
                m = self.residual(p, gt, normalizer_h, normalizer_u)
                if calc_prob:
                    m = 2.0 * (1.0 - jax.nn.sigmoid(1e5 * m))
                    m = jnp.log(m + 1e-12)
                return jnp.mean(m)

            return jnp.nan_to_num(jax.grad(scalar_loss)(pred))
        loss = self.residual(pred, gt, normalizer_h, normalizer_u)
        if clamp_loss:
            loss = jnp.clip(loss, max=1.0)
        return loss


# The reference ships SweFvGtLoss as a near-duplicate of SweFvLoss whose only
# behavioral difference is applying the sigmoid log-prob transform in the
# gradient path (models/pde_loss.py:251-409). Here that is just calc_prob=True.
SweFvGtLoss = SweFvLoss


@dataclasses.dataclass(frozen=True)
class DarcyLoss:
    """Central-difference residual of -div(a grad u) = 1 on the unit square.

    Channels: C = (a, u). Residual shape (B, H-4, W-4) padded semantics follow
    the reference (interior-only stencil).
    """
    flip_xy: bool = False
    D: float = 1.0
    eps: float = 1e-8

    def residual(self, pred):
        size = pred.shape[1]
        a = pred[..., 0]
        u = pred[..., 1]
        dx = self.D / size
        dy = dx
        ux = (u[:, 2:, 1:-1] - u[:, :-2, 1:-1]) / (2 * dx)
        uy = (u[:, 1:-1, 2:] - u[:, 1:-1, :-2]) / (2 * dy)
        a_in = a[:, 1:-1, 1:-1]
        aux = a_in * ux
        auy = a_in * uy
        auxx = (aux[:, 2:, 1:-1] - aux[:, :-2, 1:-1]) / (2 * dx)
        auyy = (auy[:, 1:-1, 2:] - auy[:, 1:-1, :-2]) / (2 * dy)
        Du = -(auxx + auyy)
        return (Du - 1.0) ** 2

    def __call__(self, pred, gt, normalizer_h, normalizer_u, return_d=False,
                 calc_prob=False, clamp_loss=False):
        if self.flip_xy:
            pred, gt = flip_state(pred, gt, _norm_channels(normalizer_h),
                                  _norm_channels(normalizer_u))
        if return_d:
            def scalar_loss(p):
                m = self.residual(p)
                if calc_prob:
                    m = 2.0 * (1.0 - jax.nn.sigmoid(1e5 * m))
                    m = jnp.log(m + 1e-12)
                return jnp.mean(m)

            return jnp.nan_to_num(jax.grad(scalar_loss)(pred))
        loss = self.residual(pred)
        t, n = loss.shape[1], loss.shape[2]
        loss = loss / (t * n)
        if clamp_loss:
            loss = jnp.clip(loss, max=1.0)
        return loss


def get_pde_loss_function(system: str, flip_xy: bool, Tn_mult: float = 1.0):
    """system -> (differentiable FV loss, simulator-oracle loss).

    The reference falls back to the FV loss when PyClaw is unavailable
    (models/loss_helper.py:3-10); on TPU the FV loss *is* the oracle, and an
    optional host-side PyClaw wrapper can be layered on when present.
    (The reference's `reactor` branch references an undefined ReactorLoss —
    a latent bug we do not reproduce; unknown systems route to the default.)
    """
    if system == "swe":
        loss = SweFvLoss(Tn=1.28 * Tn_mult, flip_xy=flip_xy)
        return loss, _maybe_simulator_loss(loss)
    if system == "swe_per":
        loss = SweFvLoss(Tn=0.128 * Tn_mult, x_min=-0.5, x_max=0.5, flip_xy=flip_xy)
        return loss, _maybe_simulator_loss(loss)
    if system == "darcy":
        loss = DarcyLoss(flip_xy=flip_xy)
        return loss, loss
    loss = SweFvLoss(Tn=1.28 * Tn_mult, flip_xy=flip_xy)
    return loss, _maybe_simulator_loss(loss)


def _maybe_simulator_loss(fv_loss: SweFvLoss):
    """Use the PyClaw-backed simulator oracle when clawpack is importable,
    otherwise the FV loss doubles as the simulator (reference fallback)."""
    try:
        from m_cedm_tpu.physics.pde_loss_sim import SweSimulatorLoss

        return SweSimulatorLoss(fv_loss)
    except ImportError:
        return fv_loss
