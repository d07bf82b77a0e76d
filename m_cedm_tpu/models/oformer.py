"""OFormer: Galerkin/Fourier linear-attention operator transformer (flax).

Parity targets (reference models/oformer.py):
  LinearAttention / CrossLinearAttention  (:128-558)  k^T v then q (k^T v)
      linear attention with non-affine instance norm on k/v (galerkin) or
      q/k (fourier), RoPE relative embeddings, orthogonal+diagonal init
  TransformerCatNoCls                     (:561-651)
  IrregSTEncoder                          (:654-723)  temporal conv patching
      + node-type embedding + galerkin transformer
  GaussianFourierFeatureTransform         (:728-758)  frozen random features
  CrossFormer / IrregSTDecoder            (:761-924)  coordinate-projection
      queries, latent propagate rollout + decode

TPU-first notes:
  * Linear attention is two einsums, O(N d^2) — no softmax, no N x N matrix;
    maps straight onto the MXU.
  * The latent `propagate` rollout is a lax.scan over forward_steps.
  * The Gaussian Fourier feature matrix is a frozen variable in the
    'constants' collection (the reference uses requires_grad=False); tasks
    freeze that collection in the optimizer.
"""
from __future__ import annotations

import dataclasses
import math
import os
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.models.encoding import apply_rotary_pos_emb_multi, rotary_freqs

# Mixed precision (TPU-first; round-4 profile): with fp32 compute, XLA's
# bf16x3 matmul decomposition dominates the device profile — every
# (B, 16384, 512) operand is split into bf16 hi/lo planes and each dot runs
# 3 passes. Threading an explicit bf16 compute dtype (fp32 params, fp32
# norm statistics — see instance_norm_tokens) removes the decomposition
# traffic and runs the MXU at native bf16 rate. Selected per-task via
# hparams['dtype'] (run.py maps trainer.precision=bf16 onto it), exactly
# like the flagship diffusion tasks.

Dtype = Optional[jnp.dtype]


def _f32(x):
    return x.astype(jnp.float32)


def _linear_attn(q, k, v, denom):
    """einsum('bhnd,bhde->bhne', q, einsum('bhnd,bhne->bhde', k, v)) / denom
    with the head dim folded into batch (MCEDM_OFORMER_ATTN3).

    The 4D two-batch-dim dot_generals lower through the TPU backend's
    convolution emitter: the round-5 train HLO has 64 `convolution-base-
    dilated` ops (one per attention einsum, fwd AND transpose), each fed by
    async batch-chunk slice DMAs (~2.5 GB/step of materialized slices,
    tools/audit_family.py). Reshaping (b, h, n, d) -> (b*h, n, d) — a free
    bitcast, h is adjacent to b in row-major — gives single-batch-dim 3D
    dots that lower as plain batched MXU matmuls. `denom` (scalar token
    count or (b, 1, 1, 1) masked count) rides on the small (d, e) factor
    instead of the (n,)-sized output: linearity makes it the same math, and
    it saves a full-size elementwise pass over (b, n, e).

    Modes: "0" = legacy 4D einsums; "xla" = 3D reshape, plain XLA dots
    (DEFAULT — same-session TPU A/B: train 161.5 -> 151.0 ms (1.070x),
    infer 71.8 -> 67.1 ms (1.071x)); "1" = 3D reshape + the streaming
    Pallas kernels (pallas/linear_attention.py) — measured LOSER (219 ms
    train, 0.74x): XLA already keeps the small (d, e) factor VMEM-resident
    across its fusions, and the kernel pays per-tile grid overhead for
    matmuls the MXU pipeline handles natively. Kept for re-measurement.

    Reference math anchor: models/oformer.py:319-327 (k^T v then q(k^T v)).
    """
    mode = os.environ.get("MCEDM_OFORMER_ATTN3", "xla")
    if mode == "0":
        dots = jnp.einsum("bhnd,bhne->bhde", k, v)
        return jnp.einsum("bhnd,bhde->bhne", q, dots) / denom
    b, h, nq, d = q.shape
    nk, e = k.shape[2], v.shape[-1]
    q3 = q.reshape(b * h, nq, d)
    k3 = k.reshape(b * h, nk, d)
    v3 = v.reshape(b * h, nk, e)
    if mode == "1":
        from m_cedm_tpu.pallas.linear_attention import apply_dots, kv_dots

        dots = kv_dots(k3, v3)
    else:
        dots = jnp.einsum("bnd,bne->bde", k3, v3)
    denom = jnp.asarray(denom, dots.dtype)
    if denom.ndim:  # (b, 1, 1, 1) masked grid count -> (b*h, 1, 1)
        denom = jnp.broadcast_to(denom, (b, h, 1, 1)).reshape(b * h, 1, 1)
    dots = dots / denom
    if mode == "1":
        out = apply_dots(q3, dots)
    else:
        out = jnp.einsum("bnd,bde->bne", q3, dots.astype(q3.dtype))
    return out.reshape(b, h, nq, e)


class ChunkedDense(nn.Module):
    """use_bias=False Dense whose output chunks come from separate
    kernel-column-slice matmuls instead of one concatenated output that is
    immediately re-split (the re-split of a (B, 16384, 3*inner) activation
    is a pure HBM round-trip — 3.2 ms/call for the decoder kv split in the
    round-4 profile). The parameter layout ('kernel', (in, features)) is
    identical to nn.Dense, so checkpoints and goldens are unchanged."""
    features: int
    n_chunks: int
    kernel_init: nn.initializers.Initializer
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features))
        dt = self.dtype or jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        c = self.features // self.n_chunks
        return tuple(x @ kernel[:, i * c:(i + 1) * c]
                     for i in range(self.n_chunks))


class RowBlockDense(nn.Module):
    """use_bias=False Dense over a CONCATENATED input, exposed as row-block
    matmuls (`block(x, start)` = x @ kernel[start:start+x.shape[-1]]).

    Linearity makes Dense(concat(a, b)) == block(a, 0) + block(b, a_dim);
    the decoder rollout uses this to precompute the loop-invariant blocks
    (node embedding, propagate positions) ONCE outside the lax.scan instead
    of re-concatenating + re-multiplying them every scan step
    (MCEDM_OFORMER_INVFOLD). Parameter layout ('kernel', (in_features,
    features)) is identical to nn.Dense on the concatenated input, so
    checkpoints/goldens are unchanged and the folded/unfolded paths share
    params. Reference anchor: models/oformer.py:747-760 (propagator MLP
    over torch.cat([z, x_node, pos]))."""
    features: int
    in_features: int
    dtype: Dtype = None

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features))

    def block(self, x, start: int):
        dt = self.dtype or jnp.promote_types(x.dtype, self.kernel.dtype)
        k = jax.lax.slice_in_dim(self.kernel, start, start + x.shape[-1],
                                 axis=0).astype(dt)
        return x.astype(dt) @ k

    def __call__(self, x):
        return self.block(x, 0)


def _qkv_init(heads: int, dim_head: int, n_chunks: int, boosted: Tuple[int, ...],
              init_gain: float, diagonal_weight: float):
    """Initializer for fused (dim -> inner*n_chunks) projection weights.

    torch layout is (out, in) with per-head orthogonal init + diagonal boost
    on the chunks listed in `boosted` (q for galerkin, v for fourier, etc.);
    the remaining rows keep torch Linear's default kaiming_uniform(a=sqrt(5)).
    Returned kernel is transposed to flax's (in, out).
    """

    def init(key, shape, dtype=jnp.float32):
        d_in, d_out = shape  # flax layout
        inner = heads * dim_head
        assert d_out == inner * n_chunks
        k_default, k_orth = jax.random.split(key)
        bound = math.sqrt(6.0 / ((1 + 5) * d_in))
        w = jax.random.uniform(k_default, (d_out, d_in), dtype, -bound, bound)
        orth_init = jax.nn.initializers.orthogonal(scale=init_gain)
        eye = jnp.eye(dim_head, d_in, dtype=dtype)
        keys = jax.random.split(k_orth, n_chunks * heads)
        for ci, chunk in enumerate(range(n_chunks)):
            if chunk not in boosted:
                continue
            for h in range(heads):
                row0 = (chunk * heads + h) * dim_head
                block = orth_init(keys[chunk * heads + h], (dim_head, d_in), dtype)
                block = block + diagonal_weight * eye
                w = w.at[row0:row0 + dim_head].set(block)
        return w.T

    return init


def instance_norm_tokens(x, eps: float = 1e-5):
    """Non-affine normalization of each token over the head-dim axis.

    Parity note (verified by tests/test_golden.py): the reference's
    `norm_wrt_domain` (oformer.py:243-247) passes (b*h, n, d) into
    torch.nn.InstanceNorm1d(dim_head), which treats the layout as (N, C=n,
    L=d) and therefore normalizes over the LAST axis per token — not over the
    token/domain axis the Galerkin paper intends (torch warns num_features is
    unused). We reproduce the actual behavior, not the intent.

    Statistics run in fp32 (mixed-precision safety) but the normalization
    itself applies in the input dtype — materializing an fp32 copy of a
    bf16 activation just to subtract/scale doubles the HBM traffic (the
    round-4 profile showed ~23 ms/step of convert fusions)."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True)
    if x.dtype == jnp.float32:  # bit-exact legacy path (goldens)
        return (x32 - mean) / jnp.sqrt(var + eps)
    scale = (1.0 / jnp.sqrt(var + eps)).astype(x.dtype)
    return (x - mean.astype(x.dtype)) * scale


def masked_instance_norm(x, mask, eps: float = 1e-5):
    """x: (N, L, C); mask: (N, L, 1) with 1 = valid. fp32 statistics."""
    x32 = x.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    denom = jnp.sum(mask, axis=1)
    mean = jax.lax.stop_gradient(jnp.sum(x32 * mask, axis=1) / denom)
    var_term = ((x32 - mean[:, None]) * mask) ** 2
    var = jax.lax.stop_gradient(jnp.sum(var_term, axis=1) / denom)
    return ((x32 - mean[:, None])
            / jnp.sqrt(var[:, None] + eps)).astype(x.dtype)


class GeGELU(nn.Module):
    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        return nn.gelu(x[..., : c // 2]) * x[..., c // 2:]


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int
    dropout: float = 0.0
    use_relu: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.use_relu:
            x = nn.relu(nn.Dense(self.hidden_dim, dtype=self.dtype)(x))
        else:
            x = GeGELU()(nn.Dense(self.hidden_dim * 2, dtype=self.dtype)(x))
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = nn.Dense(self.dim, dtype=self.dtype)(x)
        if self.dropout > 0:
            x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class LinearAttention(nn.Module):
    """Galerkin (`q (k_n^T v_n) / N`) or Fourier (`(q_n k_n^T) v / N`) linear
    attention with optional RoPE relative embeddings."""
    dim: int
    attn_type: str  # 'galerkin' | 'fourier'
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    relative_emb: bool = False
    scale: float = 1.0
    init_method: str = "orthogonal"
    init_gain: Optional[float] = None
    relative_emb_dim: int = 2
    min_freq: float = 1 / 64
    cat_pos: bool = False
    pos_dim: int = 2
    use_ln: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, pos=None, not_assoc: bool = False,
                 padding_mask=None, deterministic: bool = True):
        heads, dh = self.heads, self.dim_head
        inner = heads * dh
        gain = self.init_gain if self.init_gain is not None else 1.0 / dh
        boosted = (0,) if self.attn_type == "galerkin" else (2,)
        q, k, v = ChunkedDense(
            inner * 3, 3, name="to_qkv", dtype=self.dtype,
            kernel_init=_qkv_init(heads, dh, 3, boosted, gain, gain))(x)
        b, n, _ = q.shape
        q = q.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, heads, dh).transpose(0, 2, 1, 3)

        if padding_mask is None:
            if self.attn_type == "galerkin":
                if self.use_ln:
                    k = nn.LayerNorm(name="k_norm", dtype=self.dtype)(k)
                    v = nn.LayerNorm(name="v_norm", dtype=self.dtype)(v)
                else:
                    k = instance_norm_tokens(k)
                    v = instance_norm_tokens(v)
            else:
                if self.use_ln:
                    q = nn.LayerNorm(name="q_norm", dtype=self.dtype)(q)
                    k = nn.LayerNorm(name="k_norm", dtype=self.dtype)(k)
                else:
                    q = instance_norm_tokens(q)
                    k = instance_norm_tokens(k)
            grid_size = n
        else:
            pm = jnp.broadcast_to(padding_mask[:, None], (b, heads, n, 1))
            grid_size = jnp.sum(padding_mask, axis=(-1, -2)).reshape(-1, 1, 1, 1)

            def mnorm(t):
                flat = t.reshape(b * heads, n, dh)
                m = jnp.broadcast_to(padding_mask[:, None], (b, heads, n, 1)
                                     ).reshape(b * heads, n, 1)
                return masked_instance_norm(flat, m).reshape(b, heads, n, dh)

            if self.attn_type == "galerkin":
                k, v = mnorm(k), mnorm(v)
            else:
                q, k = mnorm(q), mnorm(k)
            q = jnp.where(pm > 0, q, 0.0)
            k = jnp.where(pm > 0, k, 0.0)
            v = jnp.where(pm > 0, v, 0.0)

        if self.relative_emb:
            assert pos is not None, "RoPE needs coordinates"
            freqs = []
            for i in range(self.relative_emb_dim):
                f = rotary_freqs(pos[:, :, i], dh // self.relative_emb_dim,
                                 self.min_freq, self.scale)  # (b, n, d_i)
                freqs.append(jnp.broadcast_to(f[:, None],
                                              (b, heads, n, f.shape[-1])))
            q = apply_rotary_pos_emb_multi(q, freqs)
            k = apply_rotary_pos_emb_multi(k, freqs)
        elif self.cat_pos:
            p = jnp.broadcast_to(pos[:, None], (b, heads, n, self.pos_dim)
                                 ).astype(q.dtype)
            q = jnp.concatenate([p, q], axis=-1)
            k = jnp.concatenate([p, k], axis=-1)
            v = jnp.concatenate([p, v], axis=-1)

        if not_assoc:
            score = jnp.einsum("bhnd,bhmd->bhnm", q, k)
            out = jnp.einsum("bhnm,bhmd->bhnd", score, v) / grid_size
        else:
            out = _linear_attn(q, k, v, grid_size)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, -1)
        out_dim = out.shape[-1]
        if not (heads == 1 and dh == self.dim and not self.cat_pos):
            out = nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class CrossLinearAttention(nn.Module):
    """Cross attention: queries from coordinates x, keys/values from latents z."""
    dim: int
    attn_type: str = "galerkin"
    heads: int = 8
    dim_head: int = 64
    dropout: float = 0.0
    relative_emb: bool = False
    scale: float = 1.0
    init_gain: Optional[float] = None
    relative_emb_dim: int = 2
    min_freq: float = 1 / 64
    cat_pos: bool = False
    pos_dim: int = 2
    use_ln: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, z, x_pos=None, z_pos=None, deterministic: bool = True):
        heads, dh = self.heads, self.dim_head
        inner = heads * dh
        gain = self.init_gain if self.init_gain is not None else 1.0 / dh
        q = nn.Dense(inner, use_bias=False, name="to_q", dtype=self.dtype,
                     kernel_init=_qkv_init(heads, dh, 1, (0,), gain, gain))(x)
        k, v = ChunkedDense(
            inner * 2, 2, name="to_kv", dtype=self.dtype,
            kernel_init=_qkv_init(heads, dh, 2, (0, 1), gain, gain))(z)
        b, n1 = x.shape[0], x.shape[1]
        n2 = z.shape[1]
        q = q.reshape(b, n1, heads, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, n2, heads, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n2, heads, dh).transpose(0, 2, 1, 3)

        if self.attn_type == "galerkin":
            k = instance_norm_tokens(k)
            v = instance_norm_tokens(v)
        else:
            q = instance_norm_tokens(q)
            k = instance_norm_tokens(k)

        if self.relative_emb:
            def rope(t, pos, n):
                freqs = []
                for i in range(self.relative_emb_dim):
                    f = rotary_freqs(pos[:, :, i], dh // self.relative_emb_dim,
                                     self.min_freq, self.scale)
                    freqs.append(jnp.broadcast_to(f[:, None],
                                                  (b, heads, n, f.shape[-1])))
                return apply_rotary_pos_emb_multi(t, freqs)

            q = rope(q, x_pos, n1)
            k = rope(k, z_pos, n2)
        elif self.cat_pos:
            px = jnp.broadcast_to(x_pos[:, None], (b, heads, n1, self.pos_dim)
                                  ).astype(q.dtype)
            pz = jnp.broadcast_to(z_pos[:, None], (b, heads, n2, self.pos_dim)
                                  ).astype(k.dtype)
            q = jnp.concatenate([px, q], axis=-1)
            k = jnp.concatenate([pz, k], axis=-1)
            v = jnp.concatenate([pz, v], axis=-1)

        out = _linear_attn(q, k, v, n2)
        out = out.transpose(0, 2, 1, 3).reshape(b, n1, -1)
        if not (heads == 1 and dh == self.dim and not self.cat_pos):
            out = nn.Dense(self.dim, name="to_out", dtype=self.dtype)(out)
            if self.dropout > 0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out


class TransformerCatNoCls(nn.Module):
    dim: int
    depth: int
    heads: int
    dim_head: int
    mlp_dim: int
    attn_type: str = "galerkin"
    use_ln: bool = False
    scale: Sequence[float] = (16,)
    relative_emb_dim: int = 2
    min_freq: float = 1 / 64
    dropout: float = 0.0
    use_relu: bool = False
    cat_pos: bool = False
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, pos_embedding, deterministic: bool = True):
        scales = list(self.scale)
        if len(scales) == 1:
            scales = scales * self.depth
        x = x.astype(self.dtype or x.dtype)
        for d in range(self.depth):
            if scales[d] != -1 or not self.cat_pos:
                attn = LinearAttention(
                    self.dim, self.attn_type, heads=self.heads,
                    dim_head=self.dim_head, dropout=self.dropout,
                    relative_emb=True, scale=scales[d],
                    relative_emb_dim=self.relative_emb_dim,
                    min_freq=self.min_freq, use_ln=False, name=f"attn_{d}",
                    dtype=self.dtype)
            else:
                attn = LinearAttention(
                    self.dim, self.attn_type, heads=self.heads,
                    dim_head=self.dim_head, dropout=self.dropout,
                    cat_pos=True, pos_dim=self.relative_emb_dim,
                    relative_emb=False, name=f"attn_{d}", dtype=self.dtype)
            ffn = FeedForward(self.dim, self.mlp_dim, self.dropout,
                              self.use_relu, name=f"ffn_{d}",
                              dtype=self.dtype)
            if self.use_ln:
                x = nn.LayerNorm(name=f"ln1_{d}", dtype=self.dtype)(x)
                x = attn(x, pos_embedding, deterministic=deterministic) + x
                x = nn.LayerNorm(name=f"ln2_{d}", dtype=self.dtype)(x)
                x = ffn(x, deterministic) + x
            else:
                x = attn(x, pos_embedding, deterministic=deterministic) + x
                x = ffn(x, deterministic) + x
        return x


@dataclasses.dataclass(frozen=True)
class OformerEncoderConfig:
    input_channels: int = 3
    time_window: int = 1
    in_emb_dim: int = 128
    out_channels: int = 128
    max_node_type: int = 2
    heads: int = 1
    depth: int = 4
    res: int = 128
    use_ln: bool = True
    emb_dropout: float = 0.0
    relative_emb_dim: int = 2

    @staticmethod
    def from_hparams(hp):
        get = (hp.get if hasattr(hp, "get")
               else lambda k, d=None: getattr(hp, k, d))
        return OformerEncoderConfig(
            input_channels=get("input_channels", 3),
            time_window=get("time_window", 1),
            in_emb_dim=get("in_emb_dim", 128),
            out_channels=get("out_channels", 128),
            max_node_type=get("max_node_type", 2),
            heads=get("heads", 1), depth=get("depth", 4),
            res=get("res", 128), use_ln=get("use_ln", True),
            emb_dropout=get("emb_dropout", 0.0),
            relative_emb_dim=get("relative_emb_dim", 2))


class IrregSTEncoder(nn.Module):
    """Token encoder: temporal conv patching + node-type embedding +
    galerkin transformer stack."""
    cfg: OformerEncoderConfig
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, node_type, input_pos, deterministic: bool = True):
        cfg = self.cfg
        b, t, n, c = x.shape
        tw = cfg.time_window
        # conv (tw,1)/stride (tw,1) over [t, n] == dense over tw-grouped frames
        x = x.transpose(0, 2, 1, 3).reshape(b, n, t // tw, tw * c)
        x = x.squeeze(2) if t // tw == 1 else x.reshape(b, n * (t // tw), tw * c)
        x = nn.Dense(cfg.in_emb_dim, use_bias=False, name="emb0",
                     dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dense(cfg.in_emb_dim, use_bias=False, name="emb1",
                     dtype=self.dtype)(x)

        x_node = nn.Embed(cfg.max_node_type, cfg.in_emb_dim,
                          name="node_embedding")(node_type[..., 0])
        x = nn.Dense(cfg.in_emb_dim, use_bias=False, name="combine_embedding",
                     dtype=self.dtype)(
            jnp.concatenate([x, x_node.astype(x.dtype)], axis=-1))
        x_skip = x
        if cfg.emb_dropout > 0:
            x = nn.Dropout(cfg.emb_dropout)(x, deterministic=deterministic)

        if cfg.depth > 4:
            scales = [32, 16, 8, 8] + [1] * (cfg.depth - 4)
        else:
            scales = [32] + [16] * (cfg.depth - 2) + [1]
        x = TransformerCatNoCls(
            cfg.in_emb_dim, cfg.depth, cfg.heads, cfg.in_emb_dim,
            cfg.in_emb_dim, "galerkin", cfg.use_ln, scale=tuple(scales),
            relative_emb_dim=cfg.relative_emb_dim, min_freq=1 / cfg.res,
            name="s_transformer", dtype=self.dtype)(x, input_pos,
                                                    deterministic)
        x = nn.LayerNorm(name="ln", dtype=self.dtype)(x + x_skip)
        x = nn.Dense(cfg.in_emb_dim, use_bias=False, name="out0",
                     dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Dense(cfg.out_channels, use_bias=False, name="out1",
                        dtype=self.dtype)(x)


class GaussianFourierFeatureTransform(nn.Module):
    """Frozen random Fourier features; B lives in the 'constants' collection
    (requires_grad=False in the reference)."""
    num_input_channels: int
    mapping_size: int = 256
    scale: float = 10.0

    @nn.compact
    def __call__(self, x):
        B = self.variable(
            "constants", "B",
            lambda: jax.random.normal(self.make_rng("params"),
                                      (self.num_input_channels, self.mapping_size)
                                      ) * self.scale)
        proj = 2 * jnp.pi * (x @ jax.lax.stop_gradient(B.value))
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class CrossFormer(nn.Module):
    dim: int
    attn_type: str = "galerkin"
    heads: int = 4
    dim_head: int = 128
    mlp_dim: int = 128
    residual: bool = True
    use_ffn: bool = True
    use_ln: bool = False
    relative_emb: bool = True
    scale: float = 32.0
    relative_emb_dim: int = 2
    min_freq: float = 1 / 64
    dropout: float = 0.0
    dtype: Dtype = None

    @nn.compact
    def __call__(self, x, z, x_pos=None, z_pos=None, deterministic: bool = True):
        attn = CrossLinearAttention(
            self.dim, self.attn_type, heads=self.heads, dim_head=self.dim_head,
            dropout=self.dropout, relative_emb=self.relative_emb,
            scale=self.scale, relative_emb_dim=self.relative_emb_dim,
            min_freq=self.min_freq, name="cross_attn", dtype=self.dtype)
        x = x.astype(self.dtype or x.dtype)
        z = z.astype(self.dtype or z.dtype)
        if self.use_ln:
            z = nn.LayerNorm(name="ln1", dtype=self.dtype)(z)
            y = nn.LayerNorm(name="ln2", dtype=self.dtype)(
                attn(x, z, x_pos, z_pos, deterministic))
            x = y + x if self.residual else y
        else:
            y = attn(x, z, x_pos, z_pos, deterministic)
            x = y + x if self.residual else y
        if self.use_ffn:
            x = FeedForward(self.dim, self.mlp_dim, self.dropout,
                            name="ffn", dtype=self.dtype)(x, deterministic) + x
        return x


@dataclasses.dataclass(frozen=True)
class OformerDecoderConfig:
    max_node_type: int = 2
    latent_channels: int = 128
    out_channels: int = 1
    res: int = 128
    scale: float = 2.0
    dropout: float = 0.1
    relative_emb_dim: int = 2

    @staticmethod
    def from_hparams(hp):
        get = (hp.get if hasattr(hp, "get")
               else lambda k, d=None: getattr(hp, k, d))
        return OformerDecoderConfig(
            max_node_type=get("max_node_type", 2),
            latent_channels=get("latent_channels", 128),
            out_channels=get("out_channels", 1), res=get("res", 128),
            scale=get("scale", 2.0), dropout=get("dropout", 0.1),
            relative_emb_dim=get("relative_emb_dim", 2))


class IrregSTDecoder(nn.Module):
    """Coordinate-query decoder with latent `propagate` rollout (lax.scan)."""
    cfg: OformerDecoderConfig
    dtype: Dtype = None

    @nn.compact
    def __call__(self, z, propagate_pos, prop_node_type, forward_steps: int,
                 input_pos, deterministic: bool = True):
        cfg = self.cfg
        lc = cfg.latent_channels
        space_dim = cfg.relative_emb_dim
        cdt = self.dtype or z.dtype

        x_node = nn.Embed(cfg.max_node_type, lc, name="node_type_embedding")(
            prop_node_type[..., 0]).astype(cdt)
        x = GaussianFourierFeatureTransform(space_dim, lc // 2, cfg.scale,
                                            name="fourier_features")(propagate_pos)
        x = x.astype(cdt)
        x = nn.Dense(lc, use_bias=False, name="coord_proj0",
                     dtype=self.dtype)(x)
        x = nn.gelu(x)
        x = nn.Dense(lc, use_bias=False, name="coord_proj1",
                     dtype=self.dtype)(x)
        x = nn.Dense(lc, use_bias=False, name="combine_layer",
                     dtype=self.dtype)(
            jnp.concatenate([x, x_node], axis=-1))

        if cfg.dropout > 0:
            z = nn.Dropout(cfg.dropout)(z, deterministic=deterministic)
        z = CrossFormer(lc, "galerkin", 4, lc, lc, relative_emb=True,
                        scale=32.0, relative_emb_dim=space_dim,
                        min_freq=1 / cfg.res, name="decoding_transformer",
                        dtype=self.dtype)(
            x, z, propagate_pos, input_pos, deterministic)
        z = LinearAttention(lc, "galerkin", heads=1, dim_head=lc,
                            relative_emb=True, scale=32.0,
                            relative_emb_dim=space_dim, min_freq=1 / cfg.res,
                            use_ln=False, name="mix_layer", dtype=self.dtype)(
            z, propagate_pos, deterministic=deterministic) + z
        z = nn.Dense(lc * 2, use_bias=False, name="expand_layer",
                     dtype=self.dtype)(z)

        prop_norm = nn.LayerNorm(name="prop_norm", dtype=self.dtype)
        zdim = lc * 2  # z width entering the rollout (after expand_layer)
        prop_mlp0 = RowBlockDense(lc * 2, zdim + lc + space_dim,
                                  name="prop_mlp0", dtype=self.dtype)
        prop_mlp = [nn.Dense(lc * 2, use_bias=False, name=f"prop_mlp{i}",
                             dtype=self.dtype)
                    for i in range(1, 4)]
        out_norm = nn.LayerNorm(name="out_norm", dtype=self.dtype)
        to_out0 = RowBlockDense(lc * 2, zdim + lc, name="to_out0",
                                dtype=self.dtype)
        to_out = [nn.Dense(lc, use_bias=False, name="to_out1",
                           dtype=self.dtype),
                  nn.Dense(cfg.out_channels, use_bias=True, name="to_out2",
                           dtype=self.dtype)]
        ppos = propagate_pos.astype(cdt)

        # x_node and ppos are constant across the rollout: their rows of the
        # first matmul in propagate/decode are precomputed ONCE here, so the
        # scan body never re-concatenates or re-multiplies them (the concat
        # alone re-materialized the full token tensor every step). Fold is
        # value-equal up to fp reassociation (split-matmul accumulation);
        # MCEDM_OFORMER_INVFOLD=0 restores the concat form.
        invfold = os.environ.get("MCEDM_OFORMER_INVFOLD", "1") != "0"
        if invfold:
            prop_inv = (prop_mlp0.block(x_node, zdim)
                        + prop_mlp0.block(ppos, zdim + lc))
            out_inv = to_out0.block(x_node, zdim)

        def propagate(zz):
            if invfold:
                h = prop_mlp0.block(prop_norm(zz), 0) + prop_inv
            else:
                h = prop_mlp0(jnp.concatenate([prop_norm(zz), x_node, ppos],
                                              axis=-1))
            for layer in prop_mlp:
                h = layer(nn.gelu(h))
            return h + zz

        def decode(zz):
            h = out_norm(zz)
            if invfold:
                h = to_out0.block(h, 0) + out_inv
            else:
                h = to_out0(jnp.concatenate([h, x_node], axis=-1))
            h = nn.relu(to_out[0](nn.relu(h)))
            return _f32(to_out[1](h))

        # materialize all params with one call OUTSIDE the scan (flax cannot
        # create params inside a lax.scan trace); the scan then reuses them
        _ = decode(propagate(z))

        def body(zz, _):
            zz = propagate(zz)
            return zz, decode(zz)

        _, history = jax.lax.scan(body, z, None, length=forward_steps)
        # history: (steps, b, n, c) -> (b, steps, n, c)
        return jnp.moveaxis(history, 0, 1)
