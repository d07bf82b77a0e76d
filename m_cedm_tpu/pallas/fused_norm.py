"""Fused GroupNorm (+ per-sample FiLM modulation) + SiLU as a Pallas kernel.

The U-Net hot path repeats the pattern

    y = silu(group_norm(x) * gamma_eff + beta_eff)        (+ conv)

(adm_blocks.py:161,166 / ddim_blocks.py:147-153 in the reference; the ADM
adaptive scale-shift folds into per-sample gamma_eff/beta_eff). Unfused,
XLA materializes the normalized tensor and the activation separately; this
kernel does one HBM read and one HBM write per sample:

  grid = (B,); block = the whole (H*W, C) sample in VMEM (res 128, ch 64
  fp32 = 4 MB < 16 MB VMEM). Per block: one pass computes sum / sum-of-
  squares per channel (sublane reduction), group statistics are combined on
  the (1, C) vector, then normalize+modulate+SiLU on the VPU.

A custom VJP implements the standard GroupNorm backward fused with the SiLU
derivative — also one read of (x, g) per sample.

`pallas_enabled()` gates use: real kernel on TPU backends, pure-jnp
fallback elsewhere (identical math; used for CPU tests and as the always-
correct reference).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except ImportError:  # pragma: no cover
    _PALLAS_IMPORTED = False


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
# Pallas kernels
# ---------------------------------------------------------------------------

def _group_matrix(num_groups: int, c: int) -> np.ndarray:
    """(C, C) constant that averages channels within their group: row i has
    1/(C/G) on every column of i's group. vec @ A == per-group means
    broadcast back to channels — a single small MXU matmul, which Mosaic
    lowers cleanly (reshape-based grouping is not supported in kernels)."""
    per = c // num_groups
    a = np.zeros((c, c), np.float32)
    for g in range(num_groups):
        a[g * per:(g + 1) * per, g * per:(g + 1) * per] = 1.0 / per
    return a


def _group_combine(vec_c, group_mat):
    """Average a (1, C) per-channel vector within each group -> (1, C)."""
    return jax.lax.dot_general(
        vec_c, group_mat, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _fwd_kernel(x_ref, gamma_ref, beta_ref, gmat_ref, out_ref, mean_ref,
                rstd_ref, *, eps: float):
    x = x_ref[0].astype(jnp.float32)  # block (1, N, C) -> (N, C)
    gmat = gmat_ref[:]
    n = x.shape[0]
    sum_c = jnp.sum(x, axis=0, keepdims=True)          # (1, C)
    sumsq_c = jnp.sum(x * x, axis=0, keepdims=True)    # (1, C)
    mean = _group_combine(sum_c / n, gmat)
    ex2 = _group_combine(sumsq_c / n, gmat)
    var = ex2 - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x - mean) * rstd
    y = xhat * gamma_ref[:] + beta_ref[:]
    out = y * jax.nn.sigmoid(y)
    out_ref[0] = out.astype(out_ref.dtype)
    mean_ref[:] = mean
    rstd_ref[:] = rstd


def _bwd_kernel(x_ref, gamma_ref, beta_ref, mean_ref, rstd_ref, g_ref,
                gmat_ref, dx_ref, dgamma_ref, dbeta_ref):
    x = x_ref[0].astype(jnp.float32)
    gmat = gmat_ref[:]
    gamma = gamma_ref[:]
    mean = mean_ref[:]
    rstd = rstd_ref[:]
    g = g_ref[0].astype(jnp.float32)
    n = x.shape[0]

    xhat = (x - mean) * rstd
    y = xhat * gamma + beta_ref[:]
    sig = jax.nn.sigmoid(y)
    # d silu(y)/dy = sig * (1 + y * (1 - sig))
    dy = g * sig * (1.0 + y * (1.0 - sig))

    dgamma_ref[:] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta_ref[:] = jnp.sum(dy, axis=0, keepdims=True)

    dxhat = dy * gamma
    # group means of dxhat and dxhat*xhat
    m1 = _group_combine(jnp.sum(dxhat, axis=0, keepdims=True) / n, gmat)
    m2 = _group_combine(jnp.sum(dxhat * xhat, axis=0, keepdims=True) / n, gmat)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pallas_fwd(x, gamma, beta, num_groups, eps):
    b, n, c = x.shape
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    kernel = functools.partial(_fwd_kernel, eps=eps)
    out, mean, rstd = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
    )(x, gamma, beta, gmat)
    return out, mean, rstd


def _pallas_bwd(x, gamma, beta, mean, rstd, g, num_groups):
    b, n, c = x.shape
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    kernel = _bwd_kernel
    dx, dgamma, dbeta = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n, c), x.dtype),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
    )(x, gamma, beta, mean, rstd, g, gmat)
    return dx, dgamma, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_group_norm_silu(x, gamma, beta, num_groups: int, eps: float = 1e-5):
    """silu(group_norm(x) * gamma + beta) with per-sample gamma/beta.

    x: (B, N, C); gamma, beta: (B, C). Uses the Pallas kernel on TPU and the
    jnp reference elsewhere.
    """
    if not pallas_enabled():
        return group_norm_silu_reference(x, gamma, beta, num_groups, eps)
    out, _, _ = _pallas_fwd(x, gamma, beta, num_groups, eps)
    return out


def _fgns_fwd(x, gamma, beta, num_groups, eps):
    if not pallas_enabled():
        out = group_norm_silu_reference(x, gamma, beta, num_groups, eps)
        return out, (x, gamma, beta, None, None)
    out, mean, rstd = _pallas_fwd(x, gamma, beta, num_groups, eps)
    return out, (x, gamma, beta, mean, rstd)


def _fgns_bwd(num_groups, eps, residuals, g):
    x, gamma, beta, mean, rstd = residuals
    if mean is None:
        # fallback: differentiate the reference implementation
        _, vjp = jax.vjp(
            lambda xx, gg, bb: group_norm_silu_reference(xx, gg, bb,
                                                         num_groups, eps),
            x, gamma, beta)
        return vjp(g)
    dx, dgamma, dbeta = _pallas_bwd(x, gamma, beta, mean, rstd, g, num_groups)
    return dx, dgamma, dbeta


fused_group_norm_silu.defvjp(_fgns_fwd, _fgns_bwd)
