"""DDIM / RePaint samplers as jax.lax.scan kernels.

Parity targets in the reference:
  ddim_sample_cond     <- PlCondDdim.sample        (models/ddim.py:1452-1530)
  ddim_sample_repaint  <- PlDdim.sample_with_repeat (models/ddim.py:808-913)
  ddim_sample_joint_h  <- PlDdim.sample            (models/ddim.py:706-806)
                          joint model; channel 0 (h) rides a fixed noisy
                          trajectory of the known field

Static schedule (sub-sequence of training timesteps, the per-step
\bar{alpha} pairs) is precomputed on host. Self-conditioning threads the
previous x0 estimate through the scan carry, exactly like the reference keeps
`x0_t` across iterations.

Known divergence (documented): the reference adds `torch.rand_like` (uniform)
noise in the eta > 0 DDIM branch (ddim.py:781,890,1512) where `randn_like` is
clearly intended; eta == 0 in every shipped config so the branch is dead
there. We use Gaussian noise.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class DdimSchedule:
    """Per-(reversed)-step constants: timestep index, alpha_bar pairs.

    a_init: alpha_bar at the LAST training timestep (T-1), used to noise the
    known field at initialization. The reference noises with
    `a[total_noise_levels - 1]` (ddim.py:735, 841-843) — i.e. abar(999), NOT
    abar(seq[-1]); with 50 uniform steps those differ (abar(980) vs abar(999)).
    None falls back to at[0] for hand-built schedules.
    """
    t: np.ndarray        # (N,) int timestep fed to the net
    at: np.ndarray       # (N,) alpha_bar(t)
    at_next: np.ndarray  # (N,) alpha_bar(t_next), with alpha_bar(-1) = 1
    eta: float
    a_init: Optional[float] = None

    @property
    def num_steps(self) -> int:
        return len(self.t)


def make_ddim_schedule(alphas_cumprod: np.ndarray, timesteps: int,
                       skip_type: str = "uniform", eta: float = 0.0) -> DdimSchedule:
    num_train = len(alphas_cumprod)
    if skip_type == "uniform":
        skip = num_train // timesteps
        seq = list(range(0, num_train, skip))
    elif skip_type == "quad":
        seq = (np.linspace(0, np.sqrt(num_train * 0.8), timesteps) ** 2)
        seq = [int(s) for s in seq]
    else:
        raise NotImplementedError(skip_type)
    seq_next = [-1] + seq[:-1]

    ext = np.concatenate([[1.0], np.asarray(alphas_cumprod, np.float64)])
    t = np.asarray(list(reversed(seq)), np.float32)
    at = ext[np.asarray(list(reversed(seq)), np.int64) + 1]
    at_next = ext[np.asarray(list(reversed(seq_next)), np.int64) + 1]
    return DdimSchedule(t=t, at=at.astype(np.float32),
                        at_next=at_next.astype(np.float32), eta=float(eta),
                        a_init=float(ext[-1]))


def _ddim_update(x0_t, et, at, at_next, eta, key, shape):
    """x_{t_next} from the x0 estimate and predicted noise."""
    if abs(eta) > 1e-10:
        c1 = eta * jnp.sqrt((1 - at / at_next) * (1 - at_next) / (1 - at))
        c2 = jnp.sqrt((1 - at_next) - c1 ** 2)
        z = jax.random.normal(key, shape, jnp.float32)
        return jnp.sqrt(at_next) * x0_t + c1 * z + c2 * et
    c2 = jnp.sqrt(1 - at_next)
    return jnp.sqrt(at_next) * x0_t + c2 * et


def ddim_sample_cond(eps_fn: Callable, key, shape, schedule: DdimSchedule,
                     self_condition: bool = False, guidance_fn=None,
                     return_last: bool = True, init_noise=None):
    """Conditional DDIM: start from pure noise, denoise with eps_fn.

    eps_fn(x, t, x_self_cond, key) -> predicted noise (CFG/conditioning live
    inside the closure). guidance_fn(x) -> d log p (classifier guidance);
    applied as et -= 5 * sqrt(1 - at) * guidance_fn(xt).
    """
    k_init, k_loop = jax.random.split(key)
    x = (jax.random.normal(k_init, shape, jnp.float32)
         if init_noise is None else init_noise)

    steps = (jnp.asarray(schedule.t), jnp.asarray(schedule.at),
             jnp.asarray(schedule.at_next),
             jax.random.split(k_loop, schedule.num_steps))

    def body(carry, step):
        xt, x0_prev = carry
        t, at, at_next, k = step
        k_eps, k_eta = jax.random.split(k)
        x_sc = x0_prev if self_condition else None
        et = eps_fn(xt, t, x_sc, k_eps)
        if guidance_fn is not None:
            et = et - 5.0 * jnp.sqrt(1 - at) * guidance_fn(xt)
        x0_t = (xt - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)
        xt_next = _ddim_update(x0_t, et, at, at_next, schedule.eta, k_eta, shape)
        return (xt_next, x0_t), (None if return_last else xt_next)

    (x_final, _), xs = jax.lax.scan(body, (x, jnp.zeros_like(x)), steps)
    if return_last:
        return x_final[:, None]
    return jnp.moveaxis(xs, 0, 1)


def ddim_sample_repaint(eps_fn: Callable, key, known, mask,
                        schedule: DdimSchedule, n_repeat: int = 1,
                        self_condition: bool = False, guidance_fn=None,
                        return_last: bool = True, init_noise=None):
    """RePaint-style conditional inpainting with an unconditional joint model.

    known: clean (B, H, W, C); mask: 1 = observed (clamped), 0 = free.
    Each outer DDIM step runs n_repeat harmonization rounds: denoise, clamp
    the known part of x0, re-noise back to level t; the final round proceeds
    to t_next and the known part is re-inserted at the t_next noise level.
    init_noise overrides the single Gaussian draw (the reference's hu_noise,
    ddim.py:836) for cross-framework parity tests.
    """
    k_noise, k_loop = jax.random.split(key)
    noise = (jax.random.normal(k_noise, known.shape, jnp.float32)
             if init_noise is None else jnp.asarray(init_noise, jnp.float32))

    a_T = schedule.a_init if schedule.a_init is not None else schedule.at[0]
    known_T = known * jnp.sqrt(a_T) + noise * jnp.sqrt(1.0 - a_T)
    x = known_T * mask + noise * (1.0 - mask)

    steps = (jnp.asarray(schedule.t), jnp.asarray(schedule.at),
             jnp.asarray(schedule.at_next),
             jax.random.split(k_loop, schedule.num_steps))

    def body(carry, step):
        xt0, x0_prev = carry
        t, at, at_next, k = step
        k_eta, k_inner = jax.random.split(k)

        def inner(inner_carry, rk):
            xt, x0_prev_k = inner_carry
            x_sc = x0_prev_k if self_condition else None
            et = eps_fn(xt, t, x_sc, rk)
            if guidance_fn is not None:
                et = et - 5.0 * jnp.sqrt(1 - at) * guidance_fn(xt)
            x0_t = (xt - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)
            x0_t = known * mask + x0_t * (1.0 - mask)
            xt_renoise = jnp.sqrt(at) * x0_t + jnp.sqrt(1 - at) * et
            return (xt_renoise, x0_t), (x0_t, et)

        (_, _), (x0_ts, ets) = jax.lax.scan(
            inner, (xt0, x0_prev), jax.random.split(k_inner, n_repeat))
        x0_t, et = x0_ts[-1], ets[-1]

        xt_next = _ddim_update(x0_t, et, at, at_next, schedule.eta, k_eta,
                               known.shape)
        c2 = jnp.sqrt(1 - at_next)
        known_t = jnp.sqrt(at_next) * known + c2 * noise
        xt_next = known_t * mask + xt_next * (1.0 - mask)
        return (xt_next, x0_t), (None if return_last else xt_next)

    (x_final, _), xs = jax.lax.scan(body, (x, jnp.zeros_like(x)), steps)
    if return_last:
        return x_final[:, None]
    return jnp.moveaxis(xs, 0, 1)


def ddim_sample_joint_h(eps_fn: Callable, key, h, schedule: DdimSchedule,
                        h_ch: int = 1, self_condition: bool = False,
                        guidance_fn=None, return_last: bool = True,
                        h_noise=None, u_noise=None):
    """Joint-model DDIM where the h channel block rides a fixed noisy
    trajectory of the known field and only u is truly denoised.

    h: clean (B, H, W, h_ch). The state is [h_t | u] channel-concat; after
    each DDIM update the h block is overwritten with
    sqrt(at_next) * h + sqrt(1 - at_next) * h_noise. The reference takes the
    initial u noise as an argument and draws h_noise internally
    (ddim.py:706,728); both are injectable here for parity tests.
    """
    k_h, k_u, k_loop = jax.random.split(key, 3)
    if h_noise is None:
        h_noise = jax.random.normal(k_h, h.shape, jnp.float32)
    u_shape = h.shape  # joint model: u block mirrors h block shape
    if u_noise is None:
        u_noise = jax.random.normal(k_u, u_shape, jnp.float32)

    a_T = schedule.a_init if schedule.a_init is not None else schedule.at[0]
    h_t0 = h * jnp.sqrt(a_T) + h_noise * jnp.sqrt(1.0 - a_T)
    x = jnp.concatenate([h_t0, u_noise], axis=-1)

    steps = (jnp.asarray(schedule.t), jnp.asarray(schedule.at),
             jnp.asarray(schedule.at_next),
             jax.random.split(k_loop, schedule.num_steps))

    def body(carry, step):
        xt, x0_prev = carry
        t, at, at_next, k = step
        k_eps, k_eta = jax.random.split(k)
        x_sc = x0_prev if self_condition else None
        et = eps_fn(xt, t, x_sc, k_eps)
        if guidance_fn is not None:
            et = et - 5.0 * jnp.sqrt(1 - at) * guidance_fn(xt)
        x0_t = (xt - et * jnp.sqrt(1 - at)) / jnp.sqrt(at)
        xt_next = _ddim_update(x0_t, et, at, at_next, schedule.eta, k_eta, x.shape)
        c2 = jnp.sqrt(1 - at_next)
        h_t = jnp.sqrt(at_next) * h + c2 * h_noise
        xt_next = jnp.concatenate([h_t[..., :h_ch], xt_next[..., h_ch:]], axis=-1)
        return (xt_next, x0_t), (None if return_last else xt_next)

    (x_final, _), xs = jax.lax.scan(body, (x, jnp.zeros_like(x)), steps)
    if return_last:
        return x_final[:, None]
    return jnp.moveaxis(xs, 0, 1)
