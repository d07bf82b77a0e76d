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


def fwave_flux(ql, qr, g=G_DEFAULT):
    """f-wave formulation: decompose the flux difference (not the state
    difference) onto the Roe eigenvectors — well-balanced for source terms
    (the reference ships shallow_fwave_1d as a PyClaw alternate)."""
    hl, hul = ql[..., 0], ql[..., 1]
    hr, hur = qr[..., 0], qr[..., 1]
    ul = hul / (hl + EPS)
    ur = hur / (hr + EPS)
    sqhl = jnp.sqrt(jnp.maximum(hl, 0.0))
    sqhr = jnp.sqrt(jnp.maximum(hr, 0.0))
    u_hat = (sqhl * ul + sqhr * ur) / (sqhl + sqhr + EPS)
    c_hat = jnp.sqrt(g * 0.5 * (hl + hr))
    s1 = u_hat - c_hat
    s2 = u_hat + c_hat

    df = swe_flux(qr, g) - swe_flux(ql, g)
    df1, df2 = df[..., 0], df[..., 1]
    # project flux difference onto r1=(1, s1), r2=(1, s2)
    beta1 = (s2 * df1 - df2) / (s2 - s1 + EPS)
    beta2 = (df2 - s1 * df1) / (s2 - s1 + EPS)

    # F_interface = F(ql) + sum of left-going f-waves
    z1_h = jnp.where(s1 < 0, beta1, 0.0)
    z1_hu = jnp.where(s1 < 0, beta1 * s1, 0.0)
    z2_h = jnp.where(s2 < 0, beta2, 0.0)
    z2_hu = jnp.where(s2 < 0, beta2 * s2, 0.0)
    fl = swe_flux(ql, g)
    return fl + jnp.stack([z1_h + z2_h, z1_hu + z2_hu], axis=-1)


def _star_height(hl, ul, hr, ur, g=G_DEFAULT, iters: int = 20):
    """Exact Riemann star-region depth via Newton iteration (two-rarefaction
    initial guess; Toro's depth function phi)."""
    cl = jnp.sqrt(g * jnp.maximum(hl, EPS))
    cr = jnp.sqrt(g * jnp.maximum(hr, EPS))
    # two-rarefaction approximation as the initial guess
    h0 = ((0.5 * (cl + cr) + 0.25 * (ul - ur)) ** 2) / g
    h0 = jnp.maximum(h0, EPS)

    def phi_k(h, hk, ck):
        # rarefaction branch: 2(sqrt(gh) - ck); shock branch uses the jump
        rare = 2.0 * (jnp.sqrt(g * h) - ck)
        shock = (h - hk) * jnp.sqrt(0.5 * g * (h + hk) / (h * hk + EPS))
        return jnp.where(h <= hk, rare, shock)

    def dphi_k(h, hk, ck):
        rare = jnp.sqrt(g / jnp.maximum(h, EPS))
        gk = jnp.sqrt(0.5 * g * (h + hk) / (h * hk + EPS))
        shock = gk - 0.25 * g * (h - hk) * (h + 2 * hk) / (
            gk * (h * hk + EPS) * (h + hk) * h + EPS)
        return jnp.where(h <= hk, rare, shock)

    def body(_, h):
        f = phi_k(h, hl, cl) + phi_k(h, hr, cr) + ur - ul
        df = dphi_k(h, hl, cl) + dphi_k(h, hr, cr)
        return jnp.maximum(h - f / (df + EPS), EPS)

    return jax.lax.fori_loop(0, iters, body, h0)


def exact_flux(ql, qr, g=G_DEFAULT):
    """Godunov flux from the exact Riemann solution sampled at x/t = 0
    (the reference ships a scipy-newton shallow_exact_1D; here Newton runs
    as a fixed-iteration lax.fori_loop, fully on device)."""
    hl, hul = ql[..., 0], ql[..., 1]
    hr, hur = qr[..., 0], qr[..., 1]
    ul = hul / (hl + EPS)
    ur = hur / (hr + EPS)
    cl = jnp.sqrt(g * jnp.maximum(hl, EPS))
    cr = jnp.sqrt(g * jnp.maximum(hr, EPS))

    h_star = _star_height(hl, ul, hr, ur, g)
    c_star = jnp.sqrt(g * h_star)

    # u* from the depth functions (symmetric form)
    def phi(h, hk, ck):
        rare = 2.0 * (jnp.sqrt(g * h) - ck)
        shock = (h - hk) * jnp.sqrt(0.5 * g * (h + hk) / (h * hk + EPS))
        return jnp.where(h <= hk, rare, shock)

    u_star = 0.5 * (ul + ur) + 0.5 * (phi(h_star, hr, cr) - phi(h_star, hl, cl))

    # sample the solution at xi = 0 (Toro ch. 5 sampling logic)
    # left wave
    sl_shock = ul - cl * jnp.sqrt(0.5 * (h_star + hl) * h_star / (hl * hl + EPS))
    head_l = ul - cl
    tail_l = u_star - c_star
    left_is_shock = h_star > hl
    # right wave
    sr_shock = ur + cr * jnp.sqrt(0.5 * (h_star + hr) * h_star / (hr * hr + EPS))
    head_r = ur + cr
    tail_r = u_star + c_star
    right_is_shock = h_star > hr

    # in-fan state for a transonic left rarefaction
    h_fan_l = ((ul + 2.0 * cl) ** 2) / (9.0 * g)
    u_fan_l = (ul + 2.0 * cl) / 3.0
    h_fan_r = ((-ur + 2.0 * cr) ** 2) / (9.0 * g)
    u_fan_r = (ur - 2.0 * cr) / 3.0 * -1.0

    def pick(h, u):
        return jnp.stack([h, h * u], axis=-1)

    # decide the state at xi=0
    left_of_contact = u_star >= 0

    # left side resolution
    state_l = jnp.where(
        left_is_shock[..., None],
        jnp.where(sl_shock[..., None] >= 0, pick(hl, ul), pick(h_star, u_star)),
        jnp.where(head_l[..., None] >= 0, pick(hl, ul),
                  jnp.where(tail_l[..., None] <= 0, pick(h_star, u_star),
                            pick(h_fan_l, u_fan_l))))
    state_r = jnp.where(
        right_is_shock[..., None],
        jnp.where(sr_shock[..., None] <= 0, pick(hr, ur), pick(h_star, u_star)),
        jnp.where(head_r[..., None] <= 0, pick(hr, ur),
                  jnp.where(tail_r[..., None] >= 0, pick(h_star, u_star),
                            pick(h_fan_r, u_fan_r))))
    q0 = jnp.where(left_of_contact[..., None], state_l, state_r)
    return swe_flux(q0, g)


FLUXES = {"hll": hll_flux, "roe": roe_flux, "fwave": fwave_flux,
          "exact": exact_flux}


def roe_waves(ql, qr, g=G_DEFAULT):
    """Roe wave decomposition with the Harten-Hyman entropy fix, matching
    the reference's pure-Python PyClaw solver number-for-number
    (generate/src/riemann_solvers.py:49-153, itself validated there against
    the Fortran rp1_shallow_roe_with_efix).

    Returns (waves, speeds, amdq, apdq) with waves (..., 2 fam, 2 eqn) and
    speeds (..., 2): the inputs to Clawpack's wave-propagation update.
    """
    hl, hul = ql[..., 0], ql[..., 1]
    hr, hur = qr[..., 0], qr[..., 1]
    sqhl = jnp.sqrt(jnp.maximum(hl, EPS))
    sqhr = jnp.sqrt(jnp.maximum(hr, EPS))
    ubar = (hul / sqhl + hur / sqhr) / (sqhl + sqhr)
    cbar = jnp.sqrt(0.5 * g * (hl + hr))

    dh = hr - hl
    dhu = hur - hul
    a1 = 0.5 * (-dhu + (ubar + cbar) * dh) / (cbar + EPS)
    a2 = 0.5 * (dhu - (ubar - cbar) * dh) / (cbar + EPS)

    s1 = ubar - cbar
    s2 = ubar + cbar
    w1 = jnp.stack([a1, a1 * s1], axis=-1)
    w2 = jnp.stack([a2, a2 * s2], axis=-1)

    amdq = (jnp.minimum(s1, 0.0)[..., None] * w1
            + jnp.minimum(s2, 0.0)[..., None] * w2)
    apdq = (jnp.maximum(s1, 0.0)[..., None] * w1
            + jnp.maximum(s2, 0.0)[..., None] * w2)

    # Harten-Hyman transonic-rarefaction fix (reference :120-152): split the
    # wave's fluctuation by beta so beta*lam_left + (1-beta)*lam_mid = s.
    def lam1(q):
        return q[..., 1] / (q[..., 0] + EPS) - jnp.sqrt(
            g * jnp.maximum(q[..., 0], 0.0))

    def lam2(q):
        return q[..., 1] / (q[..., 0] + EPS) + jnp.sqrt(
            g * jnp.maximum(q[..., 0], 0.0))

    qm = ql + w1
    l1l, l1m = lam1(ql), lam1(qm)
    l2m, l2r = lam2(qm), lam2(qr)
    trans1 = (l1l < 0.0) & (l1m > 0.0)
    trans2 = (l2m < 0.0) & (l2r > 0.0)
    beta1 = (l1m - s1) / (l1m - l1l + EPS)
    beta2 = (l2r - s2) / (l2r - l2m + EPS)

    am1 = jnp.where(s1 >= 0.0, beta1 * l1l, beta1 * l1l - s1)
    ap1 = jnp.where(s1 < 0.0, (1 - beta1) * l1m, (1 - beta1) * l1m - s1)
    am2 = jnp.where(s2 >= 0.0, beta2 * l2m, beta2 * l2m - s2)
    ap2 = jnp.where(s2 < 0.0, (1 - beta2) * l2r, (1 - beta2) * l2r - s2)

    amdq = amdq + (jnp.where(trans1, am1, 0.0)[..., None] * w1
                   + jnp.where(trans2, am2, 0.0)[..., None] * w2)
    apdq = apdq + (jnp.where(trans1, ap1, 0.0)[..., None] * w1
                   + jnp.where(trans2, ap2, 0.0)[..., None] * w2)

    waves = jnp.stack([w1, w2], axis=-2)  # (..., fam, eqn)
    speeds = jnp.stack([s1, s2], axis=-1)
    return waves, speeds, amdq, apdq


def limiter_phi(theta, name: str):
    """TVD limiter functions (pyclaw.limiters.tvd ids used by the
    reference: vanleer is what sim_dam_break_1d.py:445 configures)."""
    if name == "vanleer":
        return (theta + jnp.abs(theta)) / (1.0 + jnp.abs(theta))
    if name == "mc":
        return jnp.maximum(0.0, jnp.minimum(
            jnp.minimum((1.0 + theta) / 2.0, 2.0), 2.0 * theta))
    if name == "minmod":
        return jnp.maximum(0.0, jnp.minimum(1.0, theta))
    if name == "superbee":
        return jnp.maximum(0.0, jnp.maximum(
            jnp.minimum(1.0, 2.0 * theta), jnp.minimum(2.0, theta)))
    if name == "none":
        return jnp.ones_like(theta)
    raise ValueError(f"unknown limiter {name!r}")


def waveprop_step(q, dt, dx, g=G_DEFAULT, limiter: str = "vanleer",
                  boundary: str = "extrap"):
    """One Clawpack-style wave-propagation update (LeVeque's classic
    ClawSolver1D step_hyperbolic): first-order Godunov fluctuations from
    the Roe+efix decomposition plus limited second-order correction waves.

      q_i -= dt/dx (apdq_{i-1/2} + amdq_{i+1/2})
             + dt/dx (F~_{i+1/2} - F~_{i-1/2}),
      F~ = 1/2 sum_p |s^p| (1 - dt/dx |s^p|) phi(theta^p) W^p,
      theta^p_{i-1/2} = <W^p_{I-1/2}, W^p_{i-1/2}> / ||W^p_{i-1/2}||^2,
      I = i-1 if s^p >= 0 else i+1.

    This is the numerical scheme the reference's datasets were actually
    produced with (sim_dam_break_1d.py:424-446: ClawSolver1D +
    shallow_roe_with_efix + vanleer limiter), so `--scheme waveprop`
    datasets share its shock fingerprint. q: (..., X, 2).
    """
    if boundary == "periodic":
        qp = jnp.concatenate([q[..., -2:, :], q, q[..., :2, :]], axis=-2)
    else:
        qp = jnp.concatenate([q[..., :1, :], q[..., :1, :], q,
                              q[..., -1:, :], q[..., -1:, :]], axis=-2)
    # interfaces j = 1..X+3 between padded cells (j-1, j)
    ql = qp[..., :-1, :]
    qr = qp[..., 1:, :]
    waves, speeds, amdq, apdq = roe_waves(ql, qr, g)  # (..., X+3, fam, .)

    # first-order update on real cells i=2..X+1:
    # apdq at interface i-1/2 (index i-1 in the interface array),
    # amdq at interface i+1/2 (index i)
    dq1 = apdq[..., 1:-2, :] + amdq[..., 2:-1, :]

    # limited waves: theta from the upwind interface's same-family wave
    wsq = jnp.sum(waves * waves, axis=-1)  # (..., X+3, fam)
    dot_prev = jnp.sum(waves[..., 1:, :, :] * waves[..., :-1, :, :], axis=-1)
    up = jnp.where(speeds[..., 1:-1, :] >= 0.0, dot_prev[..., :-1, :],
                   dot_prev[..., 1:, :])
    theta = up / (wsq[..., 1:-1, :] + 1e-30)
    wlim = limiter_phi(theta, limiter)[..., None] * waves[..., 1:-1, :, :]

    nu = (dt / dx) * jnp.abs(speeds[..., 1:-1, :])
    f2 = 0.5 * jnp.sum((jnp.abs(speeds[..., 1:-1, :]) * (1.0 - nu))[..., None]
                       * wlim, axis=-2)  # (..., X+1, eqn) at j=2..X+2
    dq2 = f2[..., 1:, :] - f2[..., :-1, :]

    return q - dt / dx * (dq1 + dq2)


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


def max_wave_speed(q, g=G_DEFAULT):
    """Max |u| + c over the grid, per trajectory: q (..., X, 2) -> (...,).
    This is Clawpack's CFL quantity for 1D SWE (the classic solver computes
    cfl = dt/dx * max|s| from the Riemann speeds; |u|+sqrt(gh) bounds them)."""
    h = jnp.maximum(q[..., 0], 0.0)
    u = q[..., 1] / (q[..., 0] + EPS)
    return jnp.max(jnp.abs(u) + jnp.sqrt(g * h), axis=-1)


@partial(jax.jit, static_argnames=("n_store", "max_substeps", "flux",
                                   "boundary", "scheme", "limiter"))
def integrate_adaptive(q0, dt_store, dx, n_store: int, max_substeps: int = 8,
                       g=G_DEFAULT, flux: str = "hll",
                       boundary: str = "extrap", scheme: str = "waveprop",
                       limiter: str = "vanleer", cfl_desired: float = 0.9):
    """CFL-adaptive integration: per-substep dt from the max wave speed.

    The reference's solver steps at an adaptive CFL-limited dt
    (sim_dam_break_1d.py:424-446 configures ClawSolver1D, whose classic
    defaults are cfl_desired=0.9 / cfl_max=1.0) rather than a fixed
    subdivision of the output interval. Here each stored interval of
    length `dt_store` is covered by at most `max_substeps` sub-steps with
    dt_i = min(cfl_desired * dx / max|s|, t_remaining), per trajectory
    (dt broadcasts as (..., 1, 1) into the step update). Exhausted
    intervals step with dt=0 (identity update), so `max_substeps` is a
    static bound, not a fixed count.

    Returns (traj, deficit): traj (..., n_store, X, 2) with q0 first, and
    deficit = the max un-integrated time left in any interval (0.0 when
    `max_substeps` sufficed — callers must check on host).
    """

    def one_step(q, dt):
        if scheme == "waveprop":
            return waveprop_step(q, dt, dx, g, limiter, boundary)
        return godunov_step(q, dt, dx, g, flux, boundary)

    def advance_interval(q):
        t_rem0 = jnp.full(q.shape[:-2], dt_store, q.dtype)

        def sub(carry, _):
            qi, t_rem = carry
            dt = jnp.minimum(cfl_desired * dx / (max_wave_speed(qi, g) + EPS),
                             t_rem)
            qn = one_step(qi, dt[..., None, None])
            return (qn, t_rem - dt), None

        (qn, t_rem), _ = jax.lax.scan(sub, (q, t_rem0), None,
                                      length=max_substeps)
        return qn, jnp.max(t_rem)

    def outer(carry, _):
        q, deficit = carry
        qn, rem = advance_interval(q)
        return (qn, jnp.maximum(deficit, rem)), qn

    (_, deficit), traj = jax.lax.scan(
        outer, (q0, jnp.zeros((), q0.dtype)), None, length=n_store - 1)
    traj = jnp.moveaxis(traj, 0, -3)
    return jnp.concatenate([q0[..., None, :, :], traj], axis=-3), deficit


@partial(jax.jit, static_argnames=("n_store", "substeps", "flux", "boundary",
                                   "scheme", "limiter"))
def integrate(q0, dt_store, dx, n_store: int, substeps: int = 4,
              g=G_DEFAULT, flux: str = "hll", boundary: str = "extrap",
              scheme: str = "godunov", limiter: str = "vanleer"):
    """Integrate and store n_store states at dt_store spacing.

    q0: (..., X, 2). Returns (..., n_store, X, 2) with q0 as the first state.
    scheme: 'godunov' (first-order, `flux` selects the interface solver) or
    'waveprop' (Clawpack-style limited second-order — the reference's actual
    dataset scheme; `limiter` selects the TVD limiter).
    """
    dt = dt_store / substeps

    def step_fn(qi):
        if scheme == "waveprop":
            return waveprop_step(qi, dt, dx, g, limiter, boundary)
        return godunov_step(qi, dt, dx, g, flux, boundary)

    def outer(q, _):
        def inner(qi, _):
            return step_fn(qi), None

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
