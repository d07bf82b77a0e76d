"""Fused GroupNorm (+FiLM) + SiLU + 3x3 Conv as a Pallas kernel.

The U-Net hot path is `conv3x3(silu(group_norm(x) * gamma + beta))`
(adm_blocks.py:161-166, ddim_blocks.py:147-153). Unfused — even with the
fused-norm kernel — the normalized intermediate makes a full HBM round trip
between the norm and the conv:

    stats(x): read x                    |  1 pass
    norm+silu: read x, write y          |  2 passes
    conv: read y, write z               |  2 passes

This kernel computes the normalized activation in VMEM and convolves it in
place, eliminating y entirely:

    stats(x): read x                    |  1 pass
    norm+silu+conv: read x, write z     |  2 passes

At the flagship shape (res 128, C=64, bf16) each fusion saves ~270 MB of
HBM traffic per batch-16 call on a workload that is bandwidth-bound
(BENCH_r02: sampling at 73% of peak HBM BW), directly raising the roofline
ceiling.

Kernel structure: grid (B, H/R) over row tiles (R=16; a handful of MB of
VMEM per step at any model shape). Halo rows come from row-shifted views of
the same input array (three BlockSpecs with clamped index maps) and are
zeroed at the image edges AFTER normalization (SAME zero padding applies to
the normalized activation). The 3x3 conv is 9 shifted (R*W, C) x (C, O)
MXU matmuls over a W-zero-padded copy of the normalized strip. Group
statistics ride in as the same (B, C) sum/sumsq vectors used by fused_norm
(group combine = constant (C, C) matmul — Mosaic rejects reshape-based
channel grouping; weights ride as a 2D (9C, O) block and bias as (1, O) —
Mosaic rejects 1D blocks and >2D ref indexing).

Backward falls back to XLA autodiff of the identical-math reference
composition (recompute; nothing is stored but the inputs) — sampling (the
headline metric) only runs the forward.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.pallas.fused_norm import (
    _compute_stats,
    _group_matrix,
    _mean_rstd,
    _tile_rows,
    group_norm_silu_reference,
    pallas_enabled,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except ImportError:  # pragma: no cover
    _PALLAS_IMPORTED = False


def gn_silu_conv_reference(x, gamma, beta, w, bias, num_groups: int,
                           eps: float = 1e-5):
    """Identical-math reference: conv3x3(silu(gn(x)*gamma+beta)), SAME pad.

    x: (B, H, W, C); gamma/beta: (B, C); w: (3, 3, C, O); bias: (O,) or None.
    The normalized activation is cast back to x.dtype before the conv — the
    exact dtype flow of the unfused GroupNormSiLU + Conv2d composition.
    """
    b, h, wdt, c = x.shape
    y = group_norm_silu_reference(x.reshape(b, h * wdt, c), gamma, beta,
                                  num_groups, eps)
    y = y.reshape(b, h, wdt, c).astype(x.dtype)
    out = jax.lax.conv_general_dilated(
        y, w.astype(y.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _row_tile(h: int, dtype=None) -> int:
    """Row-tile dividing h. 16 everywhere: R=32 at 128x128 fp32 crashes this
    backend's Mosaic compile helper (empirically), and R=32 measured no
    faster in bf16. Per-step VMEM stays tiny."""
    del dtype
    for r in (16, 8):
        if h % r == 0:
            return r
    return 0


def _gnsc_kernel(xp_ref, xc_ref, xn_ref, gamma_ref, beta_ref, sums_ref,
                 sumsq_ref, gmat_ref, w_ref, bias_ref, out_ref,
                 *, n: int, eps: float, n_tiles: int):
    """Row-tiled fused norm+silu+conv: grid (B, H/R). The halo rows come from
    the row-shifted views of the same input (xp = tile above, xn = tile
    below); at the image edges they are zeroed (SAME zero padding)."""
    b, t = pl.program_id(0), pl.program_id(1)
    r, wdt, c = xc_ref.shape[1], xc_ref.shape[2], xc_ref.shape[3]
    o = out_ref.shape[-1]
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    gamma = (gamma_ref[pl.ds(b, 1), :] * rstd).reshape(1, 1, c)
    beta = (beta_ref[pl.ds(b, 1), :]
            - gamma_ref[pl.ds(b, 1), :] * rstd * mean).reshape(1, 1, c)

    top_live = (t > 0).astype(jnp.float32)
    bot_live = (t < n_tiles - 1).astype(jnp.float32)
    top = xp_ref[0, r - 1:r].astype(jnp.float32) * top_live  # (1, W, C)
    bot = xn_ref[0, 0:1].astype(jnp.float32) * bot_live
    strip = jnp.concatenate([top, xc_ref[0].astype(jnp.float32), bot], axis=0)

    y = strip * gamma + beta
    y = y * jax.nn.sigmoid(y)
    # off-image halo rows must contribute zeros to the conv: beta shifts the
    # already-zeroed halo inputs, so re-zero the halo rows of y explicitly
    top_row = jax.lax.slice(y, (0, 0, 0), (1, wdt, c)) * top_live
    mid = jax.lax.slice(y, (1, 0, 0), (1 + r, wdt, c))
    bot_row = jax.lax.slice(y, (1 + r, 0, 0), (2 + r, wdt, c)) * bot_live
    y = jnp.concatenate([top_row, mid, bot_row], axis=0)
    # zero-pad the W axis via concatenation (Mosaic lacks
    # dynamic_update_slice on the TC core)
    zcol = jnp.zeros((r + 2, 1, c), jnp.float32)
    ypad = jnp.concatenate([zcol, y, zcol], axis=1)  # (R+2, W+2, C)

    # weights ride as a 2D (9*C, O) block; bias as (1, O) — Mosaic tiling
    # rejects 1D blocks and >2D ref indexing here
    acc = jnp.broadcast_to(bias_ref[:].astype(jnp.float32), (r * wdt, o))
    for dr in range(3):
        for dw in range(3):
            blk = jax.lax.slice(ypad, (dr, dw, 0), (dr + r, dw + wdt, c))
            blk = blk.reshape(r * wdt, c)
            wk = w_ref[pl.ds((dr * 3 + dw) * c, c), :]
            acc = acc + jax.lax.dot_general(
                blk, wk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(r, wdt, o).astype(out_ref.dtype)


def _pallas_gnsc(x, gamma, beta, w, bias, num_groups, eps):
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    n = h * wdt
    r = _row_tile(h, x.dtype)
    n_tiles = h // r
    tile = _tile_rows(n)  # guaranteed by _use_pallas
    sums, sumsq = _compute_stats(x.reshape(b, n, c), tile)
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    w2 = w.astype(jnp.float32).reshape(9 * c, o)  # (dr, dw, C, O) row-major
    bias2 = (bias if bias is not None
             else jnp.zeros((o,))).astype(jnp.float32).reshape(1, o)

    def shifted(delta):
        if delta < 0:
            return lambda i, t: (i, jnp.maximum(t - 1, 0), 0, 0)
        if delta > 0:
            return lambda i, t: (i, jnp.minimum(t + 1, n_tiles - 1), 0, 0)
        return lambda i, t: (i, t, 0, 0)

    def x_spec(delta):
        return pl.BlockSpec((1, r, wdt, c), shifted(delta),
                            memory_space=pltpu.VMEM)

    out_spec = pl.BlockSpec((1, r, wdt, o), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((b, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((c, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9 * c, o), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, o), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gnsc_kernel, n=n, eps=eps, n_tiles=n_tiles),
        grid=(b, n_tiles),
        in_specs=[x_spec(-1), x_spec(0), x_spec(1), vec_spec, vec_spec,
                  vec_spec, vec_spec, mat_spec, w_spec, bias_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, wdt, o), x.dtype),
    )(x, x, x, gamma, beta, sums, sumsq, gmat, w2, bias2)


def _use_pallas(x) -> bool:
    if not pallas_enabled():
        return False
    b, h, wdt, c = x.shape
    # _tile_rows(h*w) must divide evenly or the stats kernel's sequential
    # grid drops the remainder rows — silently wrong statistics (the same
    # guard fused_norm.py applies to this kernel)
    return (_row_tile(h, x.dtype) > 0 and wdt >= 8 and wdt % 8 == 0
            and c % 8 == 0 and _tile_rows(h * wdt) is not None)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_gn_silu_conv(x, gamma, beta, w, bias, num_groups: int,
                       eps: float = 1e-5):
    """conv3x3_same(silu(group_norm(x) * gamma + beta)) + bias.

    Pallas on TPU (forward fused in VMEM), identical-math XLA elsewhere.
    Backward is XLA autodiff of the reference composition (recompute).
    """
    if not _use_pallas(x):
        return gn_silu_conv_reference(x, gamma, beta, w, bias, num_groups, eps)
    return _pallas_gnsc(x, gamma, beta, w, bias, num_groups, eps)


def _fgsc_fwd(x, gamma, beta, w, bias, num_groups, eps):
    out = fused_gn_silu_conv(x, gamma, beta, w, bias, num_groups, eps)
    return out, (x, gamma, beta, w, bias)


def _fgsc_bwd(num_groups, eps, residuals, g):
    x, gamma, beta, w, bias = residuals
    has_bias = bias is not None

    def f(x, gamma, beta, w, bias):
        return gn_silu_conv_reference(x, gamma, beta, w,
                                      bias if has_bias else None,
                                      num_groups, eps)

    _, vjp = jax.vjp(f, x, gamma, beta, w,
                     bias if has_bias else jnp.zeros((w.shape[-1],), w.dtype))
    dx, dgamma, dbeta, dw, dbias = vjp(g)
    return dx, dgamma, dbeta, dw, (dbias if has_bias else None)


fused_gn_silu_conv.defvjp(_fgsc_fwd, _fgsc_bwd)
