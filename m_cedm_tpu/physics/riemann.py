"""Godunov-type finite-volume solvers for the 1D shallow-water equations
(pure jnp; vmappable/scannable — the on-device alternative to PyClaw's
Fortran kernels).

Parity target: generate/src/riemann_solvers.py in the reference ships
pure-Python Roe/HLL/fwave/exact solvers as alternates to the Fortran ones
(:49-400). Here we provide HLL and Roe-with-entropy-fix flux functions and a
first-order Godunov update; the synthetic data generator can use these for
sharper solutions than the FORCE scheme.

State: (..., X, 2) with channels (h, hu) — conservative variables.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

G_DEFAULT = 1.0
EPS = 1e-8


def swe_flux(q, g=G_DEFAULT):
    """Physical flux F(q) = (hu, hu^2/h + g h^2 / 2)."""
    h = q[..., 0]
    hu = q[..., 1]
    u = hu / (h + EPS)
    return jnp.stack([hu, hu * u + 0.5 * g * h * h], axis=-1)


def hll_flux(ql, qr, g=G_DEFAULT):
    """HLL approximate Riemann flux at an interface between states ql, qr."""
    hl, hul = ql[..., 0], ql[..., 1]
    hr, hur = qr[..., 0], qr[..., 1]
    ul = hul / (hl + EPS)
    ur = hur / (hr + EPS)
    cl = jnp.sqrt(g * jnp.maximum(hl, 0.0))
    cr = jnp.sqrt(g * jnp.maximum(hr, 0.0))

    s_l = jnp.minimum(ul - cl, ur - cr)
    s_r = jnp.maximum(ul + cl, ur + cr)

    fl = swe_flux(ql, g)
    fr = swe_flux(qr, g)
    sl = s_l[..., None]
    sr = s_r[..., None]
    f_star = (sr * fl - sl * fr + sl * sr * (qr - ql)) / (sr - sl + EPS)
    return jnp.where(sl >= 0, fl, jnp.where(sr <= 0, fr, f_star))


def roe_flux(ql, qr, g=G_DEFAULT, efix: bool = True):
    """Roe linearized flux with Harten-Hyman entropy fix."""
    hl, hul = ql[..., 0], ql[..., 1]
    hr, hur = qr[..., 0], qr[..., 1]
    ul = hul / (hl + EPS)
    ur = hur / (hr + EPS)

    # Roe averages
    sqhl = jnp.sqrt(jnp.maximum(hl, 0.0))
    sqhr = jnp.sqrt(jnp.maximum(hr, 0.0))
    u_hat = (sqhl * ul + sqhr * ur) / (sqhl + sqhr + EPS)
    h_bar = 0.5 * (hl + hr)
    c_hat = jnp.sqrt(g * h_bar)

    lam1 = u_hat - c_hat
    lam2 = u_hat + c_hat

    dh = hr - hl
    dhu = hur - hul
    # wave strengths
    a1 = 0.5 * (dh * lam2 - dhu) / (c_hat + EPS)
    a2 = 0.5 * (dhu - dh * lam1) / (c_hat + EPS)

    if efix:
        # Harten-Hyman: broaden eigenvalues inside transonic rarefactions
        lam1_l = ul - jnp.sqrt(g * jnp.maximum(hl, 0.0))
        lam1_r = ur - jnp.sqrt(g * jnp.maximum(hr, 0.0))
        lam2_l = ul + jnp.sqrt(g * jnp.maximum(hl, 0.0))
        lam2_r = ur + jnp.sqrt(g * jnp.maximum(hr, 0.0))
        d1 = jnp.maximum(jnp.maximum(lam1_r - lam1_l, 0.0) * 2, EPS)
        d2 = jnp.maximum(jnp.maximum(lam2_r - lam2_l, 0.0) * 2, EPS)
        abs1 = jnp.where(jnp.abs(lam1) < 0.5 * d1,
                         lam1 * lam1 / d1 + 0.25 * d1, jnp.abs(lam1))
        abs2 = jnp.where(jnp.abs(lam2) < 0.5 * d2,
                         lam2 * lam2 / d2 + 0.25 * d2, jnp.abs(lam2))
    else:
        abs1, abs2 = jnp.abs(lam1), jnp.abs(lam2)

    # |A| dq = sum_k |lam_k| a_k r_k with r1 = (1, lam1), r2 = (1, lam2)
    diss_h = abs1 * a1 + abs2 * a2
    diss_hu = abs1 * a1 * lam1 + abs2 * a2 * lam2

    fl = swe_flux(ql, g)
    fr = swe_flux(qr, g)
    return 0.5 * (fl + fr) - 0.5 * jnp.stack([diss_h, diss_hu], axis=-1)


FLUXES = {"hll": hll_flux, "roe": roe_flux}


def godunov_step(q, dt, dx, g=G_DEFAULT, flux: str = "hll",
                 boundary: str = "extrap"):
    """One first-order Godunov update with ghost-cell boundaries.

    q: (..., X, 2) conservative (h, hu). boundary: 'extrap' (replicate) or
    'periodic'.
    """
    flux_fn = FLUXES[flux]
    if boundary == "periodic":
        qp = jnp.concatenate([q[..., -1:, :], q, q[..., :1, :]], axis=-2)
    else:
        qp = jnp.concatenate([q[..., :1, :], q, q[..., -1:, :]], axis=-2)
    ql = qp[..., :-1, :]
    qr = qp[..., 1:, :]
    f = flux_fn(ql, qr, g)  # (..., X+1, 2) interface fluxes
    return q - dt / dx * (f[..., 1:, :] - f[..., :-1, :])


@partial(jax.jit, static_argnames=("n_store", "substeps", "flux", "boundary"))
def integrate(q0, dt_store, dx, n_store: int, substeps: int = 4,
              g=G_DEFAULT, flux: str = "hll", boundary: str = "extrap"):
    """Integrate and store n_store states at dt_store spacing.

    q0: (..., X, 2). Returns (..., n_store, X, 2) with q0 as the first state.
    """
    dt = dt_store / substeps

    def outer(q, _):
        def inner(qi, _):
            return godunov_step(qi, dt, dx, g, flux, boundary), None

        q_next, _ = jax.lax.scan(inner, q, None, length=substeps)
        return q_next, q_next

    _, traj = jax.lax.scan(outer, q0, None, length=n_store - 1)
    traj = jnp.moveaxis(traj, 0, -3)  # (..., n_store-1, X, 2)
    return jnp.concatenate([q0[..., None, :, :], traj], axis=-3)


def conservative_to_primitive(q):
    """(h, hu) -> (h, u)."""
    h = q[..., 0]
    u = q[..., 1] / (h + EPS)
    return jnp.stack([h, u], axis=-1)
