"""Galerkin linear attention as two streaming Pallas primitives.

The OFormer's linear attention is `q @ (k^T v) / n` (reference
models/oformer.py:319-327): a contraction of (B, N, D) operands over
N = 16384 tokens down to a (D, E) = (128, 128) factor, then a streaming
matmul against that small resident factor. On this backend the jnp/einsum
form lowers through the TPU convolution emitter — the round-5 train HLO
holds 64 `convolution-base-dilated` ops (one per attention einsum, forward
AND transpose), each fed by async batch-chunk slice DMAs that materialize
~2.5 GB/step of operand copies (tools/audit_family.py). Both einsums are
structurally perfect Pallas kernels instead:

  * `kv_dots(k, v)`   — stream row tiles of k and v once, accumulate
    k_tile^T @ v_tile into a VMEM-resident fp32 (D, E) block. One HBM read
    of k and v, one (D, E) write.
  * `apply_dots(q, d)` — stream row tiles of q against the VMEM-resident
    (D, E) factor. One HBM read of q, one write of the output.

All four backward terms are the same two shapes (dq = g @ d^T,
d(dots) = kv_dots(q, g), dk = apply_dots(v, dots-grad^T),
dv = apply_dots(k, dots-grad)), so each primitive carries a custom VJP
built from the other and nothing quadratic or layout-hostile ever exists.

The 1/denom scaling rides on the small (D, E) factor in the caller
(models/oformer.py::_linear_attn) — linearity makes it the same math as
scaling the (N,)-sized output, and JAX differentiates that tiny elementwise
op natively.

MEASURED LOSER (round-5 same-session TPU A/B, tools/bench_family_ab.py):
train 219.1 vs 151.0 ms (0.74x), infer 96.3 vs 67.1 ms for the plain-XLA
3D-reshape form (MCEDM_OFORMER_ATTN3=xla, the default). Once the einsums
are single-batch-dim 3D dots, XLA's own lowering keeps the (D, E) factor
VMEM-resident across fusions and pipelines the streaming matmuls better
than the per-tile pallas grid. Kept gated (MCEDM_OFORMER_ATTN3=1) for
re-measurement on future backends.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from m_cedm_tpu.pallas import ledger
from m_cedm_tpu.pallas.fused_norm import pallas_enabled

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except ImportError:  # pragma: no cover
    _PALLAS_IMPORTED = False

_TN = 2048  # row-tile: (2048, 128) bf16 = 512 KB per operand tile


def _use_kernel(k) -> bool:
    """(B, N, D) with N a multiple of the row tile and D/E full lane
    widths; the tiny golden shapes (N=64, D=32) fall back to jnp."""
    if not pallas_enabled():
        return False
    b, n, d = k.shape
    return n % _TN == 0 and d % 128 == 0


# -- kv_dots: (B, N, D) x (B, N, E) -> (B, D, E) contraction ----------------


def _kv_kernel(k_ref, v_ref, o_ref):
    @pl.when(pl.program_id(1) == 0)
    def _init():
        o_ref[0] = jnp.zeros_like(o_ref[0])

    o_ref[0] += jax.lax.dot_general(
        k_ref[0], v_ref[0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _kv_pallas(k, v):
    b, n, d = k.shape
    e = v.shape[-1]
    out_shape = jax.ShapeDtypeStruct((b, d, e), jnp.float32)
    ledger.track(2 * b * n * d * e, k, v, out_shape)
    return pl.pallas_call(
        _kv_kernel,
        grid=(b, n // _TN),
        in_specs=[
            pl.BlockSpec((1, _TN, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TN, e), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, e), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(k, v)


def _kv_reference(k, v):
    return jnp.einsum("bnd,bne->bde", k.astype(jnp.float32),
                      v.astype(jnp.float32))


@jax.custom_vjp
def kv_dots(k, v):
    """fp32 (B, D, E) = sum_n k[:, n, :]^T v[:, n, :]."""
    if not _use_kernel(k):
        return _kv_reference(k, v)
    return _kv_pallas(k, v)


def _kv_fwd(k, v):
    return kv_dots(k, v), (k, v)


def _kv_bwd(res, g):
    k, v = res
    # d k = v @ g^T, d v = k @ g — the streaming-matmul shape
    dk = apply_dots(v, jnp.swapaxes(g, 1, 2)).astype(k.dtype)
    dv = apply_dots(k, g).astype(v.dtype)
    return dk, dv


kv_dots.defvjp(_kv_fwd, _kv_bwd)


# -- apply_dots: (B, N, D) x (B, D, E) -> (B, N, E) resident-RHS matmul -----


def _apply_kernel(q_ref, d_ref, o_ref):
    o_ref[0] = jax.lax.dot_general(
        q_ref[0], d_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _apply_pallas(q, dots):
    b, n, d = q.shape
    e = dots.shape[-1]
    dots = dots.astype(q.dtype)
    out_shape = jax.ShapeDtypeStruct((b, n, e), q.dtype)
    ledger.track(2 * b * n * d * e, q, dots, out_shape)
    return pl.pallas_call(
        _apply_kernel,
        grid=(b, n // _TN),
        in_specs=[
            pl.BlockSpec((1, _TN, d), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, e), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TN, e), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=out_shape,
    )(q, dots)


def _apply_reference(q, dots):
    return jnp.einsum("bnd,bde->bne", q, dots.astype(q.dtype))


@jax.custom_vjp
def apply_dots(q, dots):
    """(B, N, E) = q @ dots with the (D, E) factor VMEM-resident."""
    if not _use_kernel(q):
        return _apply_reference(q, dots)
    return _apply_pallas(q, dots)


def _apply_fwd(q, dots):
    return apply_dots(q, dots), (q, dots)


def _apply_bwd(res, g):
    q, dots = res
    dq = apply_dots(g, jnp.swapaxes(dots, 1, 2).astype(g.dtype)
                    ).astype(q.dtype)
    ddots = kv_dots(q, g).astype(dots.dtype)
    return dq, ddots


apply_dots.defvjp(_apply_fwd, _apply_bwd)
