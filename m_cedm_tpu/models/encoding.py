"""Rotary position embeddings (pure jnp).

Parity target: models/encoding.py:12-63 in the reference (x-transformers-style
RoPE with min_freq/scale interpolation and multi-dimensional application).
"""
from __future__ import annotations

from typing import List

import jax.numpy as jnp


def rotary_freqs(coordinates, dim: int, min_freq: float = 1 / 64,
                 scale: float = 1.0):
    """coordinates: (..., n) -> (..., n, dim) frequency phases.

    inv_freq = 10000^(-2i/dim); coordinates are rescaled by scale/min_freq.
    """
    inv_freq = 1.0 / (10000 ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))
    t = coordinates * (scale / min_freq)
    freqs = t[..., None] * inv_freq  # (..., n, dim//2)
    return jnp.concatenate([freqs, freqs], axis=-1)


def rotate_half(x):
    d = x.shape[-1] // 2
    x1, x2 = x[..., :d], x[..., d:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb_1d(t, freqs):
    # phases stay fp32; the rotation factors are applied in t's dtype so a
    # bf16 activation stream is not silently promoted back to fp32
    return (t * jnp.cos(freqs).astype(t.dtype)
            + rotate_half(t) * jnp.sin(freqs).astype(t.dtype))


def apply_rotary_pos_emb_multi(t, freqs: List):
    """Split the head dim across spatial axes and rotate each slice by its
    axis frequencies. t: (b, h, n, d); freqs: list of (b, h, n, d_i)."""
    space_dim = len(freqs)
    d = t.shape[-1]
    d1 = d // space_dim
    parts = []
    for i, freq in enumerate(freqs):
        s = i * d1
        e = (i + 1) * d1 if i < space_dim - 1 else d
        parts.append(apply_rotary_pos_emb_1d(t[..., s:e], freq))
    return jnp.concatenate(parts, axis=-1)
