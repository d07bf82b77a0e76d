"""Deterministic/stochastic Heun (EDM) samplers as jax.lax.scan kernels.

Parity targets in the reference:
  heun_sample_masked   <- PlMcedm.sample_edm      (models/mcedm.py:570-638)
                          known-part clamping via the observation mask; the
                          Heun update touches only the unobserved region
  heun_sample_cond     <- PlCondDdim/PlCondEdm.sample_edm (models/ddim.py:1532-1601)
                          plain conditional Heun loop (EDM self-cond variant)
  heun_sample_repaint  <- PlDdim.sample_edm       (models/ddim.py:959-1051)
                          joint model driven as an EDM denoiser with a
                          RePaint-style n_repeat harmonization inner loop and
                          DDPM-alpha renoising of the known part

TPU-first design:
  * The sigma grid, churn factors (gamma), rounded t_hat values and the
    DDPM-alpha lookups of the known-part renoising are all *static*: computed
    on host in float64 numpy at trace time and fed to the scan as constants.
    The reference's data-dependent `gamma = ... if S_min <= t <= S_max`
    (mcedm.py:606) becomes a host-side table — same numbers, no dynamic
    control flow on device.
  * The reference runs the loop in float64 (mcedm.py:594); TPUs have no fast
    f64, so the on-device state is float32 while every schedule constant is
    computed in f64 on host. Validated against an f64 CPU reference in tests.
  * The second-order correction is computed unconditionally with a
    guarded divisor and blended out on the final step via jnp.where — one
    static XLA program, no lax.cond per step.
  * `return_last=False` stacks the per-step states as scan ys.

The `denoise_fn(x, t_hat, key) -> D(x)` closure owns EDM preconditioning,
conditioning, CFG blending and dx-conditioning; guidance_fn (optional) maps a
denoised state to the score-correction term (PDE log-prob gradient).
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

GUIDANCE_WEIGHT = 5.0  # classifier-guidance scale used throughout the reference


@dataclasses.dataclass(frozen=True)
class EdmSchedule:
    """Static per-step schedule constants (host numpy, float64 -> float32)."""
    t_cur: np.ndarray    # (N,)
    t_hat: np.ndarray    # (N,) after churn + rounding
    t_next: np.ndarray   # (N,)
    is_last: np.ndarray  # (N,) bool
    S_noise: float
    # DDPM-alpha lookups for the repaint variant (known-part renoising).
    # The reference indexes alphas_cumprod at int(sigma) (ddim.py:1029
    # `compute_alpha(t_next.long())`) — a quirk we reproduce exactly.
    alpha_t0: float = 1.0
    alpha_next: Optional[np.ndarray] = None  # (N,)
    repeat_t_hat: Optional[np.ndarray] = None  # (N,) fresh t_hat for the inner loop

    @property
    def num_steps(self) -> int:
        return len(self.t_cur)


def _round_to_table(values: np.ndarray, table: Optional[np.ndarray]) -> np.ndarray:
    if table is None:
        return values
    idx = np.abs(values[:, None] - table[None, :]).argmin(axis=1)
    return table[idx]


def make_edm_schedule(num_steps: int, sigma_min: float, sigma_max: float,
                      rho: float = 7.0, S_churn: float = 0.0, S_min: float = 0.0,
                      S_max: float = float("inf"), S_noise: float = 1.0,
                      sigma_table: Optional[np.ndarray] = None,
                      alphas_cumprod: Optional[np.ndarray] = None) -> EdmSchedule:
    """Build all static schedule constants in float64 on host.

    sigma_table: discrete training sigmas for DDPM-as-EDM rounding
    (ddim.py:949-957); None = identity rounding (true EDM nets).
    alphas_cumprod: DDPM \bar{alpha} table for known-part renoising in the
    repaint variant.
    """
    i = np.arange(num_steps, dtype=np.float64)
    t = (sigma_max ** (1 / rho)
         + i / (num_steps - 1) * (sigma_min ** (1 / rho) - sigma_max ** (1 / rho))) ** rho
    t = _round_to_table(t, sigma_table)
    t_steps = np.concatenate([t, [0.0]])

    gamma_base = min(S_churn / num_steps, np.sqrt(2.0) - 1.0)
    gammas = np.where((t_steps[:-1] >= S_min) & (t_steps[:-1] <= S_max), gamma_base, 0.0)
    t_hat = _round_to_table(t_steps[:-1] * (1.0 + gammas), sigma_table)

    alpha_next = None
    alpha_t0 = 1.0
    repeat_t_hat = None
    if alphas_cumprod is not None:
        ext = np.concatenate([[1.0], np.asarray(alphas_cumprod, np.float64)])

        def alpha_at(sig):
            # reference quirk: alphas indexed at int(sigma) + 1 on the
            # [1, abar] extended table (compute_alpha, ddim.py:700-704)
            idx = np.clip(sig.astype(np.int64) + 1, 0, len(ext) - 1)
            return ext[idx]

        alpha_next = alpha_at(t_steps[1:])
        alpha_t0 = float(alpha_at(np.asarray([t_steps[0]]))[0])
        # inner-repeat renoising jumps to t_hat = round(t_next * (1 + (sqrt2-1)))
        gamma1 = np.sqrt(2.0) - 1.0
        repeat_t_hat = _round_to_table(t_steps[1:] * (1.0 + gamma1), sigma_table)

    return EdmSchedule(
        t_cur=t_steps[:-1].astype(np.float32),
        t_hat=t_hat.astype(np.float32),
        t_next=t_steps[1:].astype(np.float32),
        is_last=(np.arange(num_steps) == num_steps - 1),
        S_noise=float(S_noise),
        alpha_t0=alpha_t0,
        alpha_next=None if alpha_next is None else alpha_next.astype(np.float32),
        repeat_t_hat=None if repeat_t_hat is None else repeat_t_hat.astype(np.float32),
    )


def _heun_step(denoise_fn, guidance_fn, x_hat, t_hat, t_next, is_last, key,
               update_mask=None, guidance_div_t: bool = False):
    """Shared Euler + 2nd-order-correction core. Returns x_next.

    guidance_div_t: the single-task conditional sampler divides the guidance
    term by t_hat in both sub-steps (ddim.py:1578,1590); the mixed-conditional
    and joint samplers do not (mcedm.py:617, ddim.py:1014).
    """
    k1, k2 = jax.random.split(key)
    gdiv = t_hat if guidance_div_t else 1.0  # static flag, traced divisor
    denoised = denoise_fn(x_hat, t_hat, k1)
    d_cur = (x_hat - denoised) / t_hat
    if guidance_fn is not None:
        d_cur = d_cur - GUIDANCE_WEIGHT * guidance_fn(denoised) / gdiv
    upd = (t_next - t_hat) * d_cur
    if update_mask is not None:
        upd = upd * update_mask
    x_next = x_hat + upd

    # 2nd-order correction, blended out on the final step (t_next == 0)
    t_next_safe = jnp.where(is_last, jnp.float32(1.0), t_next)
    denoised2 = denoise_fn(x_next, t_next_safe, k2)
    d_prime = (x_next - denoised2) / t_next_safe
    if guidance_fn is not None:
        d_prime = d_prime - GUIDANCE_WEIGHT * guidance_fn(denoised2) / gdiv
    upd2 = (t_next - t_hat) * (0.5 * d_cur + 0.5 * d_prime)
    if update_mask is not None:
        upd2 = upd2 * update_mask
    x_next2 = x_hat + upd2
    return jnp.where(is_last, x_next, x_next2), denoised


def heun_sample_masked(denoise_fn: Callable, key, known, mask,
                       schedule: EdmSchedule, guidance_fn=None,
                       return_last: bool = True, init_noise=None):
    """Mixed-conditional Heun sampler: the observed region (mask == 0) is held
    at its clean known values; churn noise and Heun updates apply only where
    mask == 1. known/mask: (B, H, W, C). init_noise overrides the initial
    Gaussian draw (cross-framework parity tests inject matched noise)."""
    k_init, k_loop = jax.random.split(key)
    noise = (jax.random.normal(k_init, known.shape, jnp.float32)
             if init_noise is None else jnp.asarray(init_noise, jnp.float32))
    x0 = noise * schedule.t_cur[0]
    x0 = known * (1.0 - mask) + x0 * mask

    steps = (
        jnp.asarray(schedule.t_cur), jnp.asarray(schedule.t_hat),
        jnp.asarray(schedule.t_next), jnp.asarray(schedule.is_last),
        jax.random.split(k_loop, schedule.num_steps),
    )

    def body(x_cur, step):
        t_cur, t_hat, t_next, is_last, k = step
        k_churn, k_heun = jax.random.split(k)
        churn = jnp.sqrt(jnp.maximum(t_hat ** 2 - t_cur ** 2, 0.0))
        eps = jax.random.normal(k_churn, x_cur.shape, x_cur.dtype)
        x_hat = x_cur + churn * schedule.S_noise * eps * mask
        x_next, _ = _heun_step(denoise_fn, guidance_fn, x_hat, t_hat, t_next,
                               is_last, k_heun, update_mask=mask)
        return x_next, (None if return_last else x_next)

    x_final, xs = jax.lax.scan(body, x0, steps)
    if return_last:
        return x_final[:, None]  # (B, 1, H, W, C) — t axis of length 1
    return jnp.moveaxis(xs, 0, 1)  # (B, N, H, W, C)


def heun_sample_cond(denoise_fn: Callable, key, shape,
                     schedule: EdmSchedule, guidance_fn=None,
                     return_last: bool = True, init_noise=None,
                     guidance_div_t: bool = True,
                     self_condition: bool = False):
    """Plain conditional Heun loop (conditioning lives in denoise_fn).

    self_condition: thread the previous denoised estimate through the scan
    carry and hand it to denoise_fn as `x_self_cond` (ddim.py:1573,1586,
    1770-1773 — PlCondEdm's get_self_cond_edm). denoise_fn must then accept
    (x, t, key, x_self_cond) and return the denoised estimate.
    """
    k_init, k_loop = jax.random.split(key)
    noise = (jax.random.normal(k_init, shape, jnp.float32)
             if init_noise is None else init_noise)
    x0 = noise * schedule.t_cur[0]

    steps = (
        jnp.asarray(schedule.t_cur), jnp.asarray(schedule.t_hat),
        jnp.asarray(schedule.t_next), jnp.asarray(schedule.is_last),
        jax.random.split(k_loop, schedule.num_steps),
    )

    def body(carry, step):
        x_cur, x_sc = carry
        t_cur, t_hat, t_next, is_last, k = step
        k_churn, k_heun = jax.random.split(k)
        churn = jnp.sqrt(jnp.maximum(t_hat ** 2 - t_cur ** 2, 0.0))
        eps = jax.random.normal(k_churn, x_cur.shape, x_cur.dtype)
        x_hat = x_cur + churn * schedule.S_noise * eps
        if self_condition:
            fn = lambda x, t, kk: denoise_fn(x, t, kk, x_sc)
        else:
            fn = denoise_fn
        x_next, denoised = _heun_step(fn, guidance_fn, x_hat, t_hat, t_next,
                                      is_last, k_heun,
                                      guidance_div_t=guidance_div_t)
        # next step's self-cond input: the Euler-step denoised estimate
        new_sc = denoised if self_condition else x_sc
        return (x_next, new_sc), (None if return_last else x_next)

    (x_final, _), xs = jax.lax.scan(body, (x0, jnp.zeros_like(x0)), steps)
    if return_last:
        return x_final[:, None]
    return jnp.moveaxis(xs, 0, 1)


def heun_sample_repaint(denoise_fn: Callable, key, known, mask,
                        schedule: EdmSchedule, n_repeat: int = 1,
                        guidance_fn=None, return_last: bool = True,
                        init_noise=None):
    """Joint-model Heun loop with RePaint harmonization: after each Heun step
    the known region (mask == 1 observed — note the reference's hu_mask is
    *1 for known* here, inverted vs the mcedm mask) is re-inserted at the
    matching DDPM noise level, and the inner loop re-noises back up n_repeat
    times. Requires schedule built with alphas_cumprod.

    known: clean (B, H, W, C); mask: 1 = observed/clamped, 0 = free.
    """
    assert schedule.alpha_next is not None, "repaint needs a DDPM alpha table"
    k_noise, k_loop = jax.random.split(key)
    hu_noise = (jax.random.normal(k_noise, known.shape, jnp.float32)
                if init_noise is None else jnp.asarray(init_noise, jnp.float32))

    a0 = jnp.float32(schedule.alpha_t0)
    known_t0 = known * jnp.sqrt(a0) + hu_noise * jnp.sqrt(1.0 - a0)
    x0 = known_t0 * mask + hu_noise * (1.0 - mask)
    x0 = x0 * schedule.t_cur[0]

    steps = (
        jnp.asarray(schedule.t_cur), jnp.asarray(schedule.t_hat),
        jnp.asarray(schedule.t_next), jnp.asarray(schedule.is_last),
        jnp.asarray(schedule.alpha_next), jnp.asarray(schedule.repeat_t_hat),
        jax.random.split(k_loop, schedule.num_steps),
    )

    def body(x_cur, step):
        t_cur, t_hat0, t_next, is_last, a_next, rep_t_hat, k = step
        k_churn, k_inner = jax.random.split(k)
        churn = jnp.sqrt(jnp.maximum(t_hat0 ** 2 - t_cur ** 2, 0.0))
        eps = jax.random.normal(k_churn, x_cur.shape, x_cur.dtype)
        x_hat = x_cur + churn * schedule.S_noise * eps

        def inner(carry, rk):
            x_hat_k, t_hat_k = carry
            x_next, _ = _heun_step(denoise_fn, guidance_fn, x_hat_k, t_hat_k,
                                   t_next, is_last, rk)
            # clamp the known part at the t_next noise level (DDPM alphas)
            known_t = jnp.sqrt(a_next) * known + jnp.sqrt(1.0 - a_next) * hu_noise
            x_next = known_t * mask + x_next * (1.0 - mask)
            # re-noise up for the next harmonization round
            k_re, _ = jax.random.split(rk)
            churn_re = jnp.sqrt(jnp.maximum(rep_t_hat ** 2 - t_next ** 2, 0.0))
            x_re = x_next + churn_re * schedule.S_noise * jax.random.normal(
                k_re, x_next.shape, x_next.dtype)
            return (x_re, rep_t_hat), x_next

        (_, _), inner_xs = jax.lax.scan(
            inner, (x_hat, t_hat0), jax.random.split(k_inner, n_repeat))
        x_next = inner_xs[-1]
        # on the very last outer step, insert the clean known part
        x_next = jnp.where(is_last, known * mask + x_next * (1.0 - mask), x_next)
        return x_next, (None if return_last else x_next)

    x_final, xs = jax.lax.scan(body, x0, steps)
    if return_last:
        return x_final[:, None]
    return jnp.moveaxis(xs, 0, 1)
