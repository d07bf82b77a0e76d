"""Fused GroupNorm (+ per-sample FiLM modulation) + SiLU as Pallas kernels.

The U-Net hot path repeats the pattern

    y = silu(group_norm(x) * gamma_eff + beta_eff)        (+ conv)

(adm_blocks.py:161,166 / ddim_blocks.py:147-153 in the reference; the ADM
adaptive scale-shift folds into per-sample gamma_eff/beta_eff).

TPU kernel structure (res 128: each sample is 16384 x 64 fp32 = 4 MB, so a
whole sample plus temporaries exceeds the 16 MB scoped-VMEM budget — the
work is tiled over rows with the sequential-grid accumulation pattern):

  forward:  stats kernel   grid (B, T): per-tile channel sum / sum-of-squares
                           accumulated into (B, C) outputs (out block index
                           is constant over T, initialized at t == 0)
            apply kernel   grid (B, T): group statistics from the sums via a
                           constant (C, C) group-averaging matmul, then
                           normalize + FiLM + SiLU on the VPU per tile
  backward: grad-stats     grid (B, T): accumulate dgamma, dbeta and the two
                           group reduction terms (recomputing xhat per tile)
            grad-apply     grid (B, T): dx per tile

Per-sample vectors ((B, C) with C = 64 lanes) ride as whole-array blocks and
each program addresses its row — TPU tiling rejects (1, C<128) blocks.
Group averaging is a small constant matmul (Mosaic rejects reshape-based
grouping).

`pallas_enabled()` gates use: real kernels on TPU, pure-jnp fallback with
identical math elsewhere (and whenever the row count does not tile evenly).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.pallas import ledger

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except ImportError:  # pragma: no cover
    _PALLAS_IMPORTED = False

def _max_tile_rows() -> int:
    """Stats/apply kernel row tile (flattened N axis). 2048 x 64 fp32 =
    512 KB per buffer; MCEDM_STATS_TILE overrides for on-device sweeps
    (read per trace so same-process A/Bs can flip it)."""
    return int(os.environ.get("MCEDM_STATS_TILE", "2048"))


def pallas_enabled() -> bool:
    flag = os.environ.get("MCEDM_PALLAS", "auto")
    if flag == "0":
        return False
    if flag == "1":
        return True
    if not _PALLAS_IMPORTED:
        return False
    try:
        backend = jax.devices()[0].platform
    except Exception:
        backend = jax.default_backend()
    return backend in ("tpu", "axon")


def _tile_rows(n: int):
    tile = min(n, _max_tile_rows())
    return tile if n % tile == 0 else None


# ---------------------------------------------------------------------------
# Reference (pure jnp) implementation — ground truth & CPU fallback
# ---------------------------------------------------------------------------

def group_norm_silu_reference(x, gamma, beta, num_groups: int,
                              eps: float = 1e-5):
    """x: (B, N, C); gamma/beta: (B, C) per-sample effective modulation."""
    b, n, c = x.shape
    g = num_groups
    xg = x.reshape(b, n, g, c // g)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.var(xg, axis=(1, 3), keepdims=True)
    xhat = ((xg - mean) / jnp.sqrt(var + eps)).reshape(b, n, c)
    y = xhat * gamma[:, None, :] + beta[:, None, :]
    return y * jax.nn.sigmoid(y)


# ---------------------------------------------------------------------------
# Kernel building blocks
# ---------------------------------------------------------------------------

def _group_matrix(num_groups: int, c: int) -> np.ndarray:
    """(C, C) constant averaging channels within their group (vec @ A)."""
    per = c // num_groups
    a = np.zeros((c, c), np.float32)
    for g in range(num_groups):
        a[g * per:(g + 1) * per, g * per:(g + 1) * per] = 1.0 / per
    return a


def _gc(vec, gmat):
    return jax.lax.dot_general(vec, gmat, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _mean_rstd(sums, sumsq, gmat, n, eps):
    mean = _gc(sums / n, gmat)
    ex2 = _gc(sumsq / n, gmat)
    return mean, jax.lax.rsqrt(ex2 - mean * mean + eps)


def _stats_kernel(x_ref, sums_ref, sumsq_ref):
    b, t = pl.program_id(0), pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (tile, C)

    @pl.when(t == 0)
    def _():
        sums_ref[pl.ds(b, 1), :] = jnp.zeros_like(sums_ref[pl.ds(b, 1), :])
        sumsq_ref[pl.ds(b, 1), :] = jnp.zeros_like(sumsq_ref[pl.ds(b, 1), :])

    sums_ref[pl.ds(b, 1), :] += jnp.sum(x, axis=0, keepdims=True)
    sumsq_ref[pl.ds(b, 1), :] += jnp.sum(x * x, axis=0, keepdims=True)


def _apply_kernel(x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref, gmat_ref,
                  out_ref, *, n: int, eps: float):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    y = (x - mean) * rstd * gamma_ref[pl.ds(b, 1), :] + beta_ref[pl.ds(b, 1), :]
    out_ref[0] = (y * jax.nn.sigmoid(y)).astype(out_ref.dtype)


def _grad_stats_kernel(x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref,
                       gmat_ref, g_ref, dgamma_ref, dbeta_ref, s1_ref, s2_ref,
                       *, n: int, eps: float):
    b, t = pl.program_id(0), pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    gamma = gamma_ref[pl.ds(b, 1), :]
    xhat = (x - mean) * rstd
    y = xhat * gamma + beta_ref[pl.ds(b, 1), :]
    sig = jax.nn.sigmoid(y)
    dy = g * sig * (1.0 + y * (1.0 - sig))
    dxhat = dy * gamma

    @pl.when(t == 0)
    def _():
        dgamma_ref[pl.ds(b, 1), :] = jnp.zeros_like(dgamma_ref[pl.ds(b, 1), :])
        dbeta_ref[pl.ds(b, 1), :] = jnp.zeros_like(dbeta_ref[pl.ds(b, 1), :])
        s1_ref[pl.ds(b, 1), :] = jnp.zeros_like(s1_ref[pl.ds(b, 1), :])
        s2_ref[pl.ds(b, 1), :] = jnp.zeros_like(s2_ref[pl.ds(b, 1), :])

    dgamma_ref[pl.ds(b, 1), :] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta_ref[pl.ds(b, 1), :] += jnp.sum(dy, axis=0, keepdims=True)
    s1_ref[pl.ds(b, 1), :] += jnp.sum(dxhat, axis=0, keepdims=True)
    s2_ref[pl.ds(b, 1), :] += jnp.sum(dxhat * xhat, axis=0, keepdims=True)


def _grad_apply_kernel(x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref,
                       gmat_ref, g_ref, s1_ref, s2_ref, dx_ref,
                       *, n: int, eps: float):
    b = pl.program_id(0)
    x = x_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    gmat = gmat_ref[:]
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat, n, eps)
    gamma = gamma_ref[pl.ds(b, 1), :]
    xhat = (x - mean) * rstd
    y = xhat * gamma + beta_ref[pl.ds(b, 1), :]
    sig = jax.nn.sigmoid(y)
    dy = g * sig * (1.0 + y * (1.0 - sig))
    dxhat = dy * gamma
    m1 = _gc(s1_ref[pl.ds(b, 1), :] / n, gmat)
    m2 = _gc(s2_ref[pl.ds(b, 1), :] / n, gmat)
    dx_ref[0] = (rstd * (dxhat - m1 - xhat * m2)).astype(dx_ref.dtype)


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------

def _specs(b, n, c, tile):
    x_spec = pl.BlockSpec((1, tile, c), lambda i, t: (i, t, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((b, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((c, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    return x_spec, vec_spec, mat_spec


def _compute_stats(x, tile):
    b, n, c = x.shape
    x_spec, vec_spec, _ = _specs(b, n, c, tile)
    ledger.track(0, x)
    return pl.pallas_call(
        _stats_kernel,
        grid=(b, n // tile),
        in_specs=[x_spec],
        out_specs=[vec_spec, vec_spec],
        out_shape=[jax.ShapeDtypeStruct((b, c), jnp.float32)] * 2,
    )(x)


def _pair_tile(n: int):
    """Paired-lane gate for the flattened (B, N, C) kernels: bitcast
    (N, C) -> (N/2, 2C) fills all 128 lanes at C=64 (same trick as
    fused_norm_conv's paired conv kernels; the bitcast is free in XLA).
    Returns the paired row tile or None when pairing is off/unavailable."""
    from m_cedm_tpu.pallas.fused_norm_conv import pair_enabled

    if not pair_enabled() or n % 2:
        return None
    return _tile_rows(n // 2)


def _pair_stats(x, tile2):
    """Full-lane stats pass through the paired layout, folded to (B, C)."""
    b, n, c = x.shape
    sp, ssp = _compute_stats(x.reshape(b, n // 2, 2 * c), tile2)
    return sp[:, :c] + sp[:, c:], ssp[:, :c] + ssp[:, c:]


def _pair_dup(v):
    return jnp.concatenate([v, v], axis=-1)


def _pair_gmat2(num_groups, c):
    g = _group_matrix(num_groups, c)
    out = np.zeros((2 * c, 2 * c), np.float32)
    out[:c, :c] = g
    out[c:, c:] = g
    return jnp.asarray(out)


def _pallas_forward(x, gamma, beta, num_groups, eps, tile, stats=None):
    b, n, c = x.shape
    ledger.track(0, x, jax.ShapeDtypeStruct(x.shape, x.dtype))
    tile2 = _pair_tile(n)
    if tile2 is not None:
        sums, sumsq = (stats if stats is not None else _pair_stats(x, tile2))
        xp = x.reshape(b, n // 2, 2 * c)
        x_spec, vec_spec, mat_spec = _specs(b, n // 2, 2 * c, tile2)
        out = pl.pallas_call(
            functools.partial(_apply_kernel, n=n, eps=eps),
            grid=(b, (n // 2) // tile2),
            in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                      mat_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        )(xp, _pair_dup(gamma), _pair_dup(beta), _pair_dup(sums),
          _pair_dup(sumsq), _pair_gmat2(num_groups, c))
        return out.reshape(x.shape), sums, sumsq
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    sums, sumsq = stats if stats is not None else _compute_stats(x, tile)
    x_spec, vec_spec, mat_spec = _specs(b, n, c, tile)
    out = pl.pallas_call(
        functools.partial(_apply_kernel, n=n, eps=eps),
        grid=(b, n // tile),
        in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec, mat_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, gamma, beta, sums, sumsq, gmat)
    return out, sums, sumsq


def _pallas_backward(x, gamma, beta, sums, sumsq, g, num_groups, eps, tile):
    b, n, c = x.shape
    ledger.track(0, x, g, x, g, jax.ShapeDtypeStruct(x.shape, x.dtype))
    tile2 = _pair_tile(n)
    if tile2 is not None:
        # paired-lane backward: per-parity dgamma/dbeta/s1/s2 fold to full
        # channels between the two calls (the grad-apply group reductions
        # need FULL-channel sums), then ride back in duplicated
        xp = x.reshape(b, n // 2, 2 * c)
        gp = g.reshape(b, n // 2, 2 * c)
        gmat2 = _pair_gmat2(num_groups, c)
        x_spec, vec_spec, mat_spec = _specs(b, n // 2, 2 * c, tile2)
        dgamma2, dbeta2, s1_2, s2_2 = pl.pallas_call(
            functools.partial(_grad_stats_kernel, n=n, eps=eps),
            grid=(b, (n // 2) // tile2),
            in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                      mat_spec, x_spec],
            out_specs=[vec_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((b, 2 * c), jnp.float32)] * 4,
        )(xp, _pair_dup(gamma), _pair_dup(beta), _pair_dup(sums),
          _pair_dup(sumsq), gmat2, gp)
        s1 = s1_2[:, :c] + s1_2[:, c:]
        s2 = s2_2[:, :c] + s2_2[:, c:]
        dx = pl.pallas_call(
            functools.partial(_grad_apply_kernel, n=n, eps=eps),
            grid=(b, (n // 2) // tile2),
            in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                      mat_spec, x_spec, vec_spec, vec_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        )(xp, _pair_dup(gamma), _pair_dup(beta), _pair_dup(sums),
          _pair_dup(sumsq), gmat2, gp, _pair_dup(s1), _pair_dup(s2))
        return (dx.reshape(x.shape), dgamma2[:, :c] + dgamma2[:, c:],
                dbeta2[:, :c] + dbeta2[:, c:])
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    x_spec, vec_spec, mat_spec = _specs(b, n, c, tile)
    dgamma, dbeta, s1, s2 = pl.pallas_call(
        functools.partial(_grad_stats_kernel, n=n, eps=eps),
        grid=(b, n // tile),
        in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec, mat_spec,
                  x_spec],
        out_specs=[vec_spec] * 4,
        out_shape=[jax.ShapeDtypeStruct((b, c), jnp.float32)] * 4,
    )(x, gamma, beta, sums, sumsq, gmat, g)
    dx = pl.pallas_call(
        functools.partial(_grad_apply_kernel, n=n, eps=eps),
        grid=(b, n // tile),
        in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec, mat_spec,
                  x_spec, vec_spec, vec_spec],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, gamma, beta, sums, sumsq, gmat, g, s1, s2)
    return dx, dgamma, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_silu(x, gamma, beta, num_groups: int, eps: float = 1e-5):
    """silu(group_norm(x) * gamma + beta) with per-sample gamma/beta.

    x: (B, N, C); gamma, beta: (B, C). Pallas kernels on TPU (tiled over N),
    jnp reference elsewhere.
    """
    tile = _tile_rows(x.shape[1])
    if not pallas_enabled() or tile is None:
        return group_norm_silu_reference(x, gamma, beta, num_groups, eps)
    out, _, _ = _pallas_forward(x, gamma, beta, num_groups, eps, tile)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_group_norm_silu_stats(x, gamma, beta, sums_in, sumsq_in,
                                num_groups: int, eps: float = 1e-5):
    """fused_group_norm_silu with externally-chained sums/sumsq (B, C)
    statistics (from a producing kernel's emit_stats) — skips the stats
    pass over x. Backward recomputes the reference composition from x (the
    chained stats duplicate what the reference derives internally, so the
    full gradient flows through the recompute path and the stats get zero
    cotangents)."""
    tile = _tile_rows(x.shape[1])
    if not pallas_enabled() or tile is None:
        return group_norm_silu_reference(x, gamma, beta, num_groups, eps)
    out, _, _ = _pallas_forward(x, gamma, beta, num_groups, eps, tile,
                                stats=(sums_in, sumsq_in))
    return out


def _fgns_stats_fwd(x, gamma, beta, sums_in, sumsq_in, num_groups, eps):
    out = fused_group_norm_silu_stats(x, gamma, beta, sums_in, sumsq_in,
                                      num_groups, eps)
    return out, (x, gamma, beta, sums_in, sumsq_in)


def _fgns_stats_bwd(num_groups, eps, residuals, g):
    x, gamma, beta, sums_in, sumsq_in = residuals
    ref_out, vjp = jax.vjp(
        lambda xx, gg, bb: group_norm_silu_reference(xx, gg, bb, num_groups,
                                                     eps), x, gamma, beta)
    # the pallas primal returns x.dtype while the reference recompute runs
    # (and expects cotangents) in its promoted dtype — cast both ways
    dx, dgamma, dbeta = vjp(g.astype(ref_out.dtype))
    return (dx.astype(x.dtype), dgamma.astype(gamma.dtype),
            dbeta.astype(beta.dtype),
            jnp.zeros_like(sums_in), jnp.zeros_like(sumsq_in))


fused_group_norm_silu_stats.defvjp(_fgns_stats_fwd, _fgns_stats_bwd)


def _fgns_fwd(x, gamma, beta, num_groups, eps):
    tile = _tile_rows(x.shape[1])
    if not pallas_enabled() or tile is None:
        out = group_norm_silu_reference(x, gamma, beta, num_groups, eps)
        return out, (x, gamma, beta, None, None)
    out, sums, sumsq = _pallas_forward(x, gamma, beta, num_groups, eps, tile)
    return out, (x, gamma, beta, sums, sumsq)


def _fgns_bwd(num_groups, eps, residuals, g):
    x, gamma, beta, sums, sumsq = residuals
    if sums is None:
        _, vjp = jax.vjp(
            lambda xx, gg, bb: group_norm_silu_reference(xx, gg, bb,
                                                         num_groups, eps),
            x, gamma, beta)
        return vjp(g)
    tile = _tile_rows(x.shape[1])
    return _pallas_backward(x, gamma, beta, sums, sumsq, g, num_groups, eps,
                            tile)


fused_group_norm_silu.defvjp(_fgns_fwd, _fgns_bwd)
