"""On-device synthetic dataset generation (pure JAX — no PyClaw/Fortran).

The reference generates data with PyClaw's Fortran Riemann solvers in a
multiprocessing pool (generate/gen_swe_period_1d.py) and converts PDEBench
Darcy files (preprocess_darcy.py). For a self-contained TPU-native stack we
generate physically-consistent datasets directly on device:

  * SWE-periodic: random Fourier-series initial height fields with the same
    distribution as the reference generator (sim_dam_break_1d.py:474-484 —
    h_init = 1 + minmax(sum_k lambda_k cos(2 pi k x) + gamma_k sin(2 pi k x))),
    unrolled with the FORCE finite-volume scheme (physics/pde_loss.py) under
    jax.lax.scan, vmapped over the whole trajectory batch at once.
  * Darcy: random smoothed lognormal-binarized coefficient fields a(x, y) and
    a conjugate-gradient solve of -div(a grad u) = 1 with u=0 boundary.

These datasets follow the exact h5 layout + attrs of the reference, so the
datamodules cannot tell the difference. PyClaw-generated data remains fully
compatible and preferred for paper-accuracy reproduction when available.
"""
from __future__ import annotations

import argparse
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.data.h5_io import write_store
from m_cedm_tpu.physics.pde_loss import SweFvLoss


def random_fourier_ic(key, x, n2: int = 3):
    """Initial height field: 1 + minmax-normalized random Fourier series."""
    n = 2 * n2 + 1
    k_l, k_g = jax.random.split(key)
    lambdas = jax.random.normal(k_l, (n,))
    gammas = jax.random.normal(k_g, (n,))
    ks = jnp.arange(n) - n2
    phases = 2 * jnp.pi * ks[:, None] * x[None, :]
    h_hat = jnp.sum(lambdas[:, None] * jnp.cos(phases)
                    + gammas[:, None] * jnp.sin(phases), axis=0)
    h_init = 1.0 + (h_hat - h_hat.min()) / (h_hat.max() - h_hat.min())
    return h_init, lambdas, gammas


@partial(jax.jit, static_argnames=("xdim", "n_time_steps", "n2", "n_traj",
                                   "x_min", "x_max", "T_end", "substeps",
                                   "scheme"))
def generate_swe_periodic_batch(key, n_traj: int, xdim: int = 128,
                                n_time_steps: int = 128, T_end: float = 0.128,
                                x_min: float = -0.5, x_max: float = 0.5,
                                n2: int = 3, substeps: int = 4,
                                scheme: str = "waveprop"):
    """Generate (h, u) trajectories: (n_traj, T, X) each, fully on device.

    scheme: 'waveprop' (DEFAULT since r5) — the Clawpack wave-propagation
    Godunov update with Roe+efix waves and the van Leer limiter at a
    CFL-adaptive dt (cfl_desired=0.9), i.e. the numerical scheme AND time
    stepping the reference's datasets were actually produced with
    (sim_dam_break_1d.py:424-446, ClawSolver1D classic defaults);
    `substeps` is its static per-interval substep BOUND. 'force' (centred
    FV, most diffusive — the r1-r4 default) keeps `substeps` as a fixed
    subdivision. Boundary is extrapolation to match
    SwPeriodic1D.set_boundary_conditions (the reference uses extrap BCs
    even for the periodic-IC system).

    Returns (trajs, x, t, lambdas, gammas, deficit): deficit is the max
    un-integrated time in any stored interval (0.0 when the substep bound
    sufficed — writers check it on host).
    """
    step = (x_max - x_min) / xdim
    x = jnp.linspace(x_min + step / 2, x_max - step / 2, xdim)

    keys = jax.random.split(key, n_traj)
    ics = jax.vmap(lambda k: random_fourier_ic(k, x, n2))(keys)
    h0, lambdas, gammas = ics

    if scheme == "waveprop":
        from m_cedm_tpu.physics.riemann import (conservative_to_primitive,
                                                integrate_adaptive)

        q0 = jnp.stack([h0, jnp.zeros_like(h0)], axis=-1)
        dt_store = T_end / n_time_steps
        traj_q, deficit = integrate_adaptive(
            q0, dt_store, step, n_time_steps, max_substeps=substeps,
            scheme="waveprop", limiter="vanleer", boundary="extrap")
        trajs = conservative_to_primitive(traj_q)
        t = jnp.linspace(0.0, T_end, n_time_steps)
        return trajs, x, t, lambdas, gammas, deficit

    fv = SweFvLoss(Tn=T_end, x_min=x_min, x_max=x_max)
    dt = T_end / (n_time_steps * substeps)

    def integrate(h_init):
        s0 = jnp.stack([h_init, jnp.zeros_like(h_init)], axis=-1)[None, None]

        def outer(s, _):
            def inner(si, _):
                return fv.step(si, dt), None

            s_next, _ = jax.lax.scan(inner, s, None, length=substeps)
            return s_next, s_next[0, 0]

        _, traj = jax.lax.scan(outer, s0, None, length=n_time_steps - 1)
        return jnp.concatenate([s0[0], traj], axis=0)  # (T, X, 2)

    trajs = jax.vmap(integrate)(h0)
    t = jnp.linspace(0.0, T_end, n_time_steps)
    return trajs, x, t, lambdas, gammas, jnp.zeros(())


@partial(jax.jit, static_argnames=("xdim", "n_time_steps", "n_traj",
                                   "substeps", "scheme"))
def generate_swe_dam_break_batch(key, n_traj: int, xdim: int = 128,
                                 n_time_steps: int = 128, T_end: float = 1.28,
                                 x_min: float = -2.5, x_max: float = 2.5,
                                 substeps: int = 8, scheme: str = "waveprop"):
    """Dam-break / Gaussian-perturbation trajectories (the `swe` system).

    Initial conditions mirror the reference generator
    (generate/gen_dam_break_1d.py:64-81 with sim_dam_break_1d.py:307-322):
      h0 = h_in + eps * exp(-0.5 (x - x0)^2 / sigma^2),  hu0 = init_u
      h_in ~ U(1.2, 5.2), eps ~ U(0.05, 1), x0 ~ U(-1, 1),
      init_u ~ U(-2.2, 2.2), sigma ~ U(0.2, 2)
    Integrated on [-2.5, 2.5] with extrapolation boundaries.
    scheme='waveprop' (DEFAULT since r5) is the Clawpack wave-propagation
    update (Roe+efix waves, van Leer limiter) at a CFL-adaptive dt — the
    reference's actual scheme and stepping (sim_dam_break_1d.py:424-446);
    `substeps` is its static per-interval substep bound. 'godunov' (HLL,
    first-order — the r1-r4 default) keeps `substeps` fixed.

    Returns (trajs, x, t, consts, deficit) — see
    generate_swe_periodic_batch for deficit semantics.
    """
    from m_cedm_tpu.physics.riemann import (conservative_to_primitive,
                                            integrate, integrate_adaptive)

    step = (x_max - x_min) / xdim
    x = jnp.linspace(x_min + step / 2, x_max - step / 2, xdim)

    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    h_in = jax.random.uniform(k1, (n_traj, 1), minval=1.2, maxval=5.2)
    eps = jax.random.uniform(k2, (n_traj, 1), minval=0.05, maxval=1.0)
    x0 = jax.random.uniform(k3, (n_traj, 1), minval=-1.0, maxval=1.0)
    init_u = jax.random.uniform(k4, (n_traj, 1), minval=-2.2, maxval=2.2)
    sigma = jax.random.uniform(k5, (n_traj, 1), minval=0.2, maxval=2.0)

    h0 = h_in + eps * jnp.exp(-0.5 * (x[None, :] - x0) ** 2 / sigma ** 2)
    hu0 = jnp.broadcast_to(init_u, h0.shape)
    q0 = jnp.stack([h0, hu0], axis=-1)

    dt_store = T_end / n_time_steps
    if scheme == "waveprop":
        traj_q, deficit = integrate_adaptive(
            q0, dt_store, step, n_time_steps, max_substeps=substeps,
            boundary="extrap", scheme="waveprop", limiter="vanleer")
    else:
        traj_q = integrate(q0, dt_store, step, n_time_steps,
                           substeps=substeps, flux="hll", boundary="extrap",
                           scheme=scheme, limiter="vanleer")
        deficit = jnp.zeros(())
    trajs = conservative_to_primitive(traj_q)
    t = jnp.linspace(0.0, T_end, n_time_steps)
    consts = dict(inner_height=h_in[:, 0], init_stimulus=eps[:, 0],
                  x0=x0[:, 0], init_u=init_u[:, 0], sigma=sigma[:, 0])
    return trajs, x, t, consts, deficit


def _check_deficit(deficit, what: str):
    """Host-side completeness check for CFL-adaptive integration: a
    positive deficit means the static substep bound was too small for the
    CFL-limited dt and part of an interval went un-integrated."""
    d = float(deficit)
    if d > 0.0:
        raise RuntimeError(
            f"{what}: CFL-adaptive integration left {d:.3e}s un-integrated "
            "in some interval — raise `substeps` (the static bound)")


def write_swe_dam_break_dataset(path: str, key, n_traj: int, xdim: int = 128,
                                n_time_steps: int = 128, T_end: float = 1.28,
                                seed_offset: int = 0,
                                scheme: str = "waveprop"):
    trajs, x, t, consts, deficit = generate_swe_dam_break_batch(
        key, n_traj, xdim, n_time_steps, T_end, scheme=scheme)
    _check_deficit(deficit, f"swe dam-break {path}")
    trajs = np.asarray(trajs, np.float32)  # storage is f32 even under --f64
    write_store(path, inputs=trajs[..., 0:1], targets=trajs[..., 1:2],
                x=np.broadcast_to(np.asarray(x, np.float32), (n_traj, xdim)),
                t=np.broadcast_to(np.asarray(t, np.float32),
                                  (n_traj, n_time_steps)),
                consts={k: np.asarray(v, np.float32)
                        for k, v in consts.items()},
                seed_offset=seed_offset)


def _gaussian_smooth_2d(field, sigma: float = 3.0):
    """Separable Gaussian blur via two 1D convolutions."""
    radius = int(3 * sigma)
    xs = jnp.arange(-radius, radius + 1)
    k = jnp.exp(-0.5 * (xs / sigma) ** 2)
    k = k / k.sum()

    def conv1d(f, axis):
        f = jnp.moveaxis(f, axis, -1)
        pad = [(0, 0)] * (f.ndim - 1) + [(radius, radius)]
        fp = jnp.pad(f, pad, mode="reflect")
        out = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(
            fp.reshape(-1, fp.shape[-1])).reshape(f.shape)
        return jnp.moveaxis(out, -1, axis)

    return conv1d(conv1d(field, 0), 1)


@partial(jax.jit, static_argnames=("n_fields", "size", "cg_iters"))
def generate_darcy_batch(key, n_fields: int, size: int = 128, cg_iters: int = 400):
    """Random piecewise-constant diffusion fields a in {4, 12} (PDEBench
    beta=1 style) and CG solutions of -div(a grad u) = 1, u|boundary = 0."""
    keys = jax.random.split(key, n_fields)

    def one(k):
        noise = jax.random.normal(k, (size, size))
        smooth = _gaussian_smooth_2d(noise, sigma=size / 16)
        a = jnp.where(smooth >= 0, 12.0, 4.0)

        dx = 1.0 / size

        def apply_A(u):
            # 5-point flux stencil with harmonic-free simple averaging
            up = jnp.pad(u, 1)
            a_e = 0.5 * (a + jnp.roll(a, -1, 0))
            a_w = 0.5 * (a + jnp.roll(a, 1, 0))
            a_n = 0.5 * (a + jnp.roll(a, -1, 1))
            a_s = 0.5 * (a + jnp.roll(a, 1, 1))
            lap = (a_e * (up[2:, 1:-1] - up[1:-1, 1:-1])
                   - a_w * (up[1:-1, 1:-1] - up[:-2, 1:-1])
                   + a_n * (up[1:-1, 2:] - up[1:-1, 1:-1])
                   - a_s * (up[1:-1, 1:-1] - up[1:-1, :-2])) / dx ** 2
            return -lap

        b = jnp.ones((size, size))

        def cg_body(carry, _):
            u, r, p, rs = carry
            Ap = apply_A(p)
            alpha = rs / (jnp.sum(p * Ap) + 1e-12)
            u = u + alpha * p
            r = r - alpha * Ap
            rs_new = jnp.sum(r * r)
            p = r + (rs_new / (rs + 1e-12)) * p
            return (u, r, p, rs_new), None

        u0 = jnp.zeros_like(b)
        r0 = b - apply_A(u0)
        (u, *_), _ = jax.lax.scan(cg_body, (u0, r0, r0, jnp.sum(r0 * r0)),
                                  None, length=cg_iters)
        return a, u

    return jax.vmap(one)(keys)


def write_swe_dataset(path: str, key, n_traj: int, xdim: int = 128,
                      n_time_steps: int = 128, T_end: float = 0.128,
                      seed_offset: int = 0, scheme: str = "waveprop"):
    trajs, x, t, lambdas, gammas, deficit = generate_swe_periodic_batch(
        key, n_traj, xdim, n_time_steps, T_end, scheme=scheme)
    _check_deficit(deficit, f"swe_per {path}")
    trajs = np.asarray(trajs, np.float32)  # storage is f32 even under --f64
    h = trajs[..., 0:1]
    u = trajs[..., 1:2]
    consts = {"init_u": np.zeros(n_traj, np.float32)}
    write_store(path, inputs=h, targets=u,
                x=np.broadcast_to(np.asarray(x, np.float32), (n_traj, xdim)),
                t=np.broadcast_to(np.asarray(t, np.float32),
                                  (n_traj, n_time_steps)),
                consts=consts, seed_offset=seed_offset)


def write_darcy_dataset(path: str, key, n_fields: int, size: int = 128,
                        seed_offset: int = 0):
    a, u = generate_darcy_batch(key, n_fields, size)
    a = np.asarray(a)[..., None]
    u = np.asarray(u)[..., None]
    grid = np.linspace(0, 1, size, dtype=np.float32)
    write_store(path, inputs=a, targets=u,
                x=np.broadcast_to(grid, (n_fields, size)),
                t=np.broadcast_to(grid, (n_fields, size)),
                seed_offset=seed_offset)


def main():
    p = argparse.ArgumentParser(description="Generate synthetic datasets on device")
    p.add_argument("--out", default="data", help="data root directory")
    p.add_argument("--system", default="swe_per", choices=["swe_per", "swe", "darcy"])
    p.add_argument("--n-train", type=int, default=64)
    p.add_argument("--n-test", type=int, default=16)
    p.add_argument("--res", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--scheme", default=None,
                   choices=["force", "godunov", "waveprop"],
                   help="SWE integrator: default 'waveprop' (the "
                        "reference's Clawpack scheme — Roe+efix waves, van "
                        "Leer limiter, CFL-adaptive dt); 'force' / "
                        "'godunov' keep the r1-r4 fixed-dt schemes")
    p.add_argument("--f64", action="store_true",
                   help="integrate in float64 (the reference generator is "
                        "f64 numpy/Fortran); storage stays f32")
    p.add_argument("--config", default=None,
                   help="configs/generate/*.yaml dataset spec (overrides "
                        "--system/--res/--n-train/--n-test)")
    args = p.parse_args()

    if args.config:
        import yaml

        with open(args.config) as f:
            gen_cfg = yaml.safe_load(f)
        args.system = gen_cfg.get("system", args.system)
        args.res = gen_cfg.get("xdim", args.res)
        args.n_train = gen_cfg.get("n_train", args.n_train)
        args.n_test = gen_cfg.get("n_test", args.n_test)

    if args.f64:
        jax.config.update("jax_enable_x64", True)
    key = jax.random.PRNGKey(args.seed)
    k_train, k_test = jax.random.split(key)
    res = args.res
    if args.system == "swe_per":
        scheme = args.scheme or "waveprop"
        sub = base = f"1D_swp_{res}_per"
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
        write_swe_dataset(os.path.join(args.out, sub, f"{base}_train.h5"),
                          k_train, args.n_train, res, res, 0.128,
                          scheme=scheme)
        write_swe_dataset(os.path.join(args.out, sub, f"{base}_test.h5"),
                          k_test, args.n_test, res, res, 0.128,
                          seed_offset=1000, scheme=scheme)
    elif args.system == "swe":
        scheme = args.scheme or "waveprop"
        sub = base = f"1D_swp_{res}"
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
        write_swe_dam_break_dataset(
            os.path.join(args.out, sub, f"{base}_train.h5"), k_train,
            args.n_train, res, res, 1.28, scheme=scheme)
        write_swe_dam_break_dataset(
            os.path.join(args.out, sub, f"{base}_test.h5"), k_test,
            args.n_test, res, res, 1.28, seed_offset=1000, scheme=scheme)
    else:
        sub = "1D_darcy_128"
        os.makedirs(os.path.join(args.out, sub), exist_ok=True)
        write_darcy_dataset(os.path.join(args.out, sub, "darcy_train.h5"),
                            k_train, args.n_train, res)
        write_darcy_dataset(os.path.join(args.out, sub, "darcy_test.h5"),
                            k_test, args.n_test, res, seed_offset=9000)
    print(f"wrote {args.system} dataset under {args.out}")


if __name__ == "__main__":
    main()
