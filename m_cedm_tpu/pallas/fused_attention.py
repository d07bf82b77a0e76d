"""Fused fp32 softmax attention as a Pallas kernel.

The U-Nets attend over flattened spatial grids at the attention resolutions
(adm_blocks.py:100-118 AttentionOp, ddim_blocks.py:167-219 AttnBlock): at the
flagship shapes L = 32*32 = 1024 tokens, D = 64 channels per head. Unfused,
XLA materializes the (L, L) logits and probability matrices in HBM between
kernels; here the whole softmax(q k^T / sqrt(D)) v chain runs per head-batch
in VMEM (q/k/v 256 KB each + the 4 MB logits block), one HBM read of q/k/v
and one write of the output.

Backward recomputes the probability matrix from (q, k) — flash-style — so
nothing quadratic is ever stored: dv = w^T g; dl = w * (g v^T - rowsum);
dq = dl k / sqrt(D); dk = dl^T q / sqrt(D).

Exposed through `fused_attention(q, k, v)`; falls back to the identical-math
jnp reference off-TPU (layers.fp32_softmax_attention routes here).
"""
from __future__ import annotations

import functools
import math

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


def attention_reference(q, k, v):
    """softmax(q k^T / sqrt(D)) v in fp32. q/k/v: (N, L, D)."""
    dtype = q.dtype
    scale = 1.0 / math.sqrt(k.shape[-1])
    logits = jnp.einsum("nqd,nkd->nqk", q.astype(jnp.float32),
                        k.astype(jnp.float32) * scale)
    w = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("nqk,nkd->nqd", w, v.astype(jnp.float32)).astype(dtype)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0].astype(jnp.float32)  # (L, D)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(q, k * scale, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    w = p / denom
    out = jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[0] = out.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, g_ref, dq_ref, dk_ref, dv_ref,
                *, scale: float):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    g = g_ref[0].astype(jnp.float32)
    # recompute probabilities
    logits = jax.lax.dot_general(q, k * scale, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp(logits - m)
    w = p / jnp.sum(p, axis=-1, keepdims=True)

    dv = jax.lax.dot_general(w, g, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (L, D)
    dw = jax.lax.dot_general(g, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (L, L)
    dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(dl, k, (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dl, q, (((0,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32) * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _block_specs(n, l, d):
    return [pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)]


def _pallas_fwd(q, k, v):
    n, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    # qk^T + av: 2 matmuls of (L,L,D) per head-batch
    ledger.track(2 * 2 * n * l * l * d, q, k, v,
                 jax.ShapeDtypeStruct(q.shape, q.dtype))
    spec = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
    )(q, k, v)


def _pallas_bwd(q, k, v, g):
    n, l, d = q.shape
    scale = 1.0 / math.sqrt(d)
    # recompute (2) + dv/dw/dq/dk (4): 6 (L,L,D) matmuls per head-batch
    ledger.track(6 * 2 * n * l * l * d, q, k, v, g,
                 [jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3)
    spec = pl.BlockSpec((1, l, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(n,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[jax.ShapeDtypeStruct(q.shape, q.dtype)] * 3,
    )(q, k, v, g)


def _use_kernel(q) -> bool:
    """The whole-head kernel stages the (L, L) fp32 logits/probs in scoped
    VMEM (~3 L^2 fp32): 12 MB at the flagship L=1024, but 200+ MB at the
    L=4096 a res-256 eval produces (measured Mosaic failure) — Mosaic's
    stack is hard-capped at 64 MB, so large grids fall back to the
    identical-math XLA path (batched MXU matmuls, no VMEM residency)."""
    l = q.shape[1]
    # 5 L^2: the backward additionally stages dw (L, L); use its bound for
    # both directions so fwd/bwd take the same path
    return pallas_enabled() and 5 * l * l * 4 <= 60 * 2 ** 20


@jax.custom_vjp
def fused_attention(q, k, v):
    """Fused fp32 attention; Pallas on TPU, jnp reference elsewhere."""
    if not _use_kernel(q):
        return attention_reference(q, k, v)
    return _pallas_fwd(q, k, v)


def _fa_fwd(q, k, v):
    if not _use_kernel(q):
        return attention_reference(q, k, v), (q, k, v)
    return _pallas_fwd(q, k, v), (q, k, v)


def _fa_bwd(residuals, g):
    q, k, v = residuals
    if not _use_kernel(q):  # trace-time decision, same as forward
        _, vjp = jax.vjp(attention_reference, q, k, v)
        return vjp(g)
    return _pallas_bwd(q, k, v, g)


fused_attention.defvjp(_fa_fwd, _fa_bwd)
