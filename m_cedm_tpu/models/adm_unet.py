"""ADM / EDM-style U-Net ("DhariwalUNet") in flax.linen, NHWC.

Parity target: models/adm_blocks.py:124-404 in the reference (EDM's ADM
variant with adaptive scale-shift conditioning, fp32 attention, Fourier
noise embedding, and the m-cedm conditioning extensions: channel-concat
cond / separate cond encoder / dx conditioning / self-conditioning).

TPU-first notes:
  * NHWC layout; attention tokens are the flattened (H*W) spatial grid at the
    attention resolutions (<= 32x32 = 1024 tokens in all shipped configs).
  * The fp32 attention custom-autograd op of the reference is simply fp32
    einsums here — XLA differentiates them natively (no custom VJP needed)
    and fuses the softmax.
  * Resampling uses exact nearest/mean-pool equivalents (see layers.py).
  * Shape bookkeeping (skip channel matching) happens at trace time, so the
    compiled graph is a single static XLA program.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from m_cedm_tpu.models.layers import (
    Conv2d,
    GroupNormSiLU,
    Linear,
    adm_group_norm,
    fp32_softmax_attention,
)
from m_cedm_tpu.ops.schedules import fourier_positional_embedding


def _adm_groups(c: int) -> int:
    return min(32, c // 4)


def _pairio_concats_aligned(cfg) -> bool:
    """True iff every decoder skip-concat's GroupNorm groups align with the
    concat boundary: c1 % ((c1 + c2) // groups) == 0 for each concat of a
    c1-channel decoder stream with a c2-channel encoder skip.

    The paired (dual-order) kernels slice a block-diagonal group matrix at
    the boundary (_pair_gmat_split) and stack the halves' chained stats —
    both silently compute wrong statistics when a group straddles it (e.g.
    ch_mult [1,2,2,2]: a 192-channel concat with 32 groups has per=6 and
    c1=128 not divisible by 6). Shipped configs (ch_mult [1,1,1]) are
    aligned; anything else falls back to the unpaired path."""
    ch = cfg.ch
    skips = [ch * cfg.ch_mult[0]]
    cout = skips[0]
    for level, mult in enumerate(cfg.ch_mult):
        if level > 0:
            skips.append(cout)  # down block keeps channel count
        for _ in range(cfg.num_res_blocks):
            cout = ch * mult
            skips.append(cout)
    for level, mult in reversed(list(enumerate(cfg.ch_mult))):
        for _ in range(cfg.num_res_blocks + 1):
            c2 = skips.pop()
            c = cout + c2
            if cout % (c // _adm_groups(c)) != 0:
                return False
            cout = ch * mult
    return not skips

INIT = dict(init_mode="kaiming_uniform", init_weight=3 ** -0.5, init_bias=3 ** -0.5)
INIT_ZERO = dict(init_mode="kaiming_uniform", init_weight=0.0, init_bias=0.0)


@dataclasses.dataclass(frozen=True)
class AdmUNetConfig:
    in_channels: int
    out_ch: int
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 1, 1)
    num_res_blocks: int = 1
    attn_resolutions: Tuple[int, ...] = (32,)
    resolution: int = 128
    dropout: float = 0.0
    cond_channels: int = 0
    cat_cond: bool = False
    self_cond: bool = False
    dx_cond: bool = False
    cat_dx: bool = False
    label_dim: int = 0
    augment_dim: int = 0
    label_dropout: float = 0.0
    remat: bool = False  # jax.checkpoint each block: FLOPs for HBM headroom

    @staticmethod
    def from_hparams(hparams) -> "AdmUNetConfig":
        m = hparams["model"]

        def get(key, default):
            return m.get(key, default) if hasattr(m, "get") else getattr(m, key, default)

        return AdmUNetConfig(
            in_channels=m["in_channels"],
            out_ch=m["out_ch"],
            ch=m["ch"],
            ch_mult=tuple(m["ch_mult"]),
            num_res_blocks=m["num_res_blocks"],
            attn_resolutions=tuple(m["attn_resolutions"]),
            resolution=m["resolution"],
            dropout=get("dropout", 0.0),
            cond_channels=get("cond_channels", 0),
            cat_cond=get("cat_cond", False),
            self_cond=get("self_cond", False),
            dx_cond=get("dx_cond", False),
            cat_dx=get("cat_dx", False),
            label_dim=get("label_dim", 0),
            augment_dim=get("augment_dim", 0),
            label_dropout=get("label_dropout", 0.0),
            remat=get("remat", False),
        )

    @property
    def total_in_channels(self) -> int:
        c = self.in_channels * (2 if self.self_cond else 1)
        if self.cat_cond:
            c += self.cond_channels
        if self.dx_cond and self.cat_dx:
            c += self.in_channels
        return c


class UNetBlock(nn.Module):
    """Residual block with adaptive scale-shift emb conditioning and optional
    self-attention; the union block used by the ADM encoder/decoder."""
    out_channels: int
    up: bool = False
    down: bool = False
    attention: bool = False
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    adaptive_scale: bool = True

    @nn.compact
    def __call__(self, x, emb, deterministic: bool = True, x2=None,
                 in_stats=None, want_stats: bool = False,
                 paired: bool = False, splits=None):
        """x2: second half of a channel-concat input (the decoder's skip) —
        on the fully-fused path the concat is never materialized (dual-input
        kernels); otherwise it is concatenated here. in_stats: chained
        (sums, sumsq) channel statistics of the (concatenated) input from
        the producing kernel. want_stats: also return the output's channel
        statistics (or None when attention runs after the tail kernel).
        paired: x is a PAIRED (B, H, W/2, 2C) activation (MCEDM_PAIRIO
        threading; dual-order when splits=(c1, c2)) and the output stays
        paired."""
        if paired:
            return self._paired(x, emb, in_stats, want_stats, splits)
        in_channels = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        c = self.out_channels
        num_heads = c // self.channels_per_head if self.attention else 0

        orig = x
        # norm0+silu+conv0 fuse into one Pallas kernel when conv0 does not
        # resample (the normalized intermediate never round-trips HBM); the
        # second kernel then swallows the whole block tail: norm1(+FiLM)+
        # silu+conv1 + the skip path (identity or 1x1 projection) + the
        # residual add — and hands conv0's output statistics to norm1 so no
        # separate stats pass over h runs either
        from m_cedm_tpu.models.layers import (block_fusion_enabled,
                                              conv_fusion_enabled,
                                              stats_chain_enabled,
                                              train_trace,
                                              upconv_kernel_enabled,
                                              upres_kernel_enabled)
        from m_cedm_tpu.pallas.fused_block import (fused_unet_block,
                                                   mega_enabled)

        norm0 = GroupNormSiLU(_adm_groups(in_channels), eps=self.eps,
                              name="norm0")
        # fuse_tail: norm1(+FiLM)+silu+conv1+skip+add in one kernel — also
        # for resampling blocks (their skip is resampled by its module first
        # and rides as an identity residual). fuse_block additionally fuses
        # conv0 and chains its output stats into norm1. (An in-kernel
        # norm+pool for down blocks was tried and is impossible on this
        # Mosaic backend: stride-2 vector slices and lane-repacking reshapes
        # are both rejected — the pooling win is captured by the
        # dtype-preserving downsample2x_mean in layers.py instead.)
        fuse_tail = (conv_fusion_enabled() and block_fusion_enabled()
                     and self.adaptive_scale and self.dropout == 0)
        fuse_block = fuse_tail and not self.up and not self.down
        chain = fuse_block and stats_chain_enabled()
        # the megakernel covers plain blocks and up blocks (conv0's upsample
        # rides in-kernel); down blocks keep the two-kernel path (Mosaic
        # rejects every in-kernel pooling formulation — see the fuse_tail
        # comment above)
        mega = (fuse_tail and not self.down and mega_enabled()
                and not train_trace())
        if x2 is not None and not chain and not mega:
            # dual input only rides unmaterialized on the fully-fused path
            x = jnp.concatenate([x, x2], axis=-1)
            orig = x
            x2 = None
        conv0 = Conv2d(c, kernel=3, up=self.up, down=self.down, **INIT,
                       name="conv0")
        fold_probe = (x if x2 is None else
                      jnp.zeros(x.shape[:1] + (1, 1, in_channels), x.dtype))
        if mega:
            # megakernel: the WHOLE block (both convs, the skip path, the
            # residual add) as one Pallas program — conv0's output and the
            # residual stay resident in VMEM scratch, and a decoder's skip
            # concat never materializes (pallas/fused_block.py). Sampling
            # traces only: its backward is XLA recompute, which loses to
            # the per-conv kernels' hand-written backward.
            g0f, b0f = norm0(fold_probe, fold_only=True)
            conv0_w, conv0_b = conv0(x, x2=x2, params_only=True)
            params = Linear(c * 2, **INIT, name="affine")(emb)
            scale, shift = jnp.split(params, 2, axis=-1)
            norm1 = GroupNormSiLU(_adm_groups(c), eps=self.eps, name="norm1")
            conv1 = Conv2d(c, kernel=3, **INIT_ZERO, name="conv1")
            probe_c = jnp.zeros(x.shape[:1] + (1, 1, c), x.dtype)
            g1f, b1f = norm1(probe_c, film_scale=scale, film_shift=shift,
                             fold_only=True)
            conv1_w, conv1_b = conv1(probe_c, params_only=True)
            skw = skb = None
            if c != in_channels:
                skw, skb = Conv2d(c, kernel=1, **INIT, name="skip")(
                    fold_probe, params_only=True)
            emit = (want_stats and not num_heads and self.skip_scale == 1.0
                    and stats_chain_enabled())
            outk = fused_unet_block(
                x, g0f, b0f, conv0_w, conv0_b, g1f, b1f, conv1_w, conv1_b,
                _adm_groups(in_channels), _adm_groups(c), self.eps, x2=x2,
                skip_w=skw, skip_b=skb, stats=in_stats, emit_stats=emit,
                up=self.up)
            out_stats = None
            if emit:
                outk, os_, oss_ = outk
                out_stats = (os_, oss_)
            out = self._attention(outk * self.skip_scale, c, num_heads)
            return (out, out_stats) if want_stats else out
        h_sums = h_sumsq = None
        if chain:
            g0, b0 = norm0(fold_probe, fold_only=True)
            h, h_sums, h_sumsq = conv0(
                x, x2=x2,
                fused_norm=(g0, b0, _adm_groups(in_channels), self.eps),
                fused_stats=in_stats, emit_stats=True)
        elif conv_fusion_enabled() and not self.up and not self.down:
            g0, b0 = norm0(x, fold_only=True)
            h = conv0(x, fused_norm=(g0, b0, _adm_groups(in_channels),
                                     self.eps))
        elif self.up and conv_fusion_enabled() and upconv_kernel_enabled():
            # whole up prefix in one kernel: norm+silu at low res, upsample
            # in VMEM, conv3x3 at high res (chained stats skip the stats
            # pass too)
            g0, b0 = norm0(x, fold_only=True)
            h = conv0(x, fused_norm=(g0, b0, _adm_groups(in_channels),
                                     self.eps), fused_stats=in_stats)
        else:
            h = conv0(norm0(x, stats=in_stats))

        params = Linear(c * (2 if self.adaptive_scale else 1), **INIT, name="affine")(emb)
        if self.adaptive_scale:
            scale, shift = jnp.split(params, 2, axis=-1)  # (B, C) each
            norm1 = GroupNormSiLU(_adm_groups(c), eps=self.eps, name="norm1")
            conv1 = Conv2d(c, kernel=3, **INIT_ZERO, name="conv1")
            if fuse_tail:
                g1, b1 = norm1(h, film_scale=scale, film_shift=shift,
                               fold_only=True)
                fn = (g1, b1, _adm_groups(c), self.eps)
                stats = (h_sums, h_sumsq) if h_sums is not None else None
                # the tail kernel can emit the block output's channel stats
                # for the next consumer — only valid when nothing (attention,
                # skip_scale) transforms the output afterwards
                emit = (want_stats and not num_heads
                        and self.skip_scale == 1.0)
                if self.up or self.down:
                    # resample the skip with its own module, then it rides
                    # as an identity residual in the tail kernel
                    skip_kernel = 1 if c != in_channels else 0
                    if self.up and upres_kernel_enabled():
                        # the skip rides into the tail at LOW res (1x1-
                        # projected there if channels differ — commutes
                        # with nearest upsampling) and is upsampled in VMEM
                        orig_low = (Conv2d(c, kernel=1, **INIT,
                                           name="skip")(orig)
                                    if skip_kernel else orig)
                        h = conv1(h, fused_norm=fn,
                                  fused_residual=(orig_low,),
                                  emit_stats=emit, res_up=True)
                    else:
                        orig_t = Conv2d(c, kernel=skip_kernel, up=self.up,
                                        down=self.down, **INIT,
                                        name="skip")(orig)
                        h = conv1(h, fused_norm=fn, fused_residual=(orig_t,),
                                  emit_stats=emit)
                elif x2 is not None:
                    skw, skb = Conv2d(c, kernel=1, **INIT, name="skip")(
                        fold_probe, params_only=True)
                    h = conv1(h, fused_norm=fn, fused_stats=stats,
                              fused_residual=(orig, x2, skw, skb),
                              emit_stats=emit)
                elif c != in_channels:
                    skw, skb = Conv2d(c, kernel=1, **INIT, name="skip")(
                        orig, params_only=True)
                    h = conv1(h, fused_norm=fn, fused_stats=stats,
                              fused_residual=(orig, skw, skb),
                              emit_stats=emit)
                else:
                    h = conv1(h, fused_norm=fn, fused_stats=stats,
                              fused_residual=(orig,), emit_stats=emit)
                out_stats = None
                if emit:
                    h, os_, oss_ = h
                    out_stats = (os_, oss_)
                out = self._attention(h * self.skip_scale, c, num_heads)
                return (out, out_stats) if want_stats else out
            if self.dropout > 0 or not conv_fusion_enabled():
                h = norm1(h, film_scale=scale, film_shift=shift)
                if self.dropout > 0:
                    h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
                h = conv1(h)
            else:
                g1, b1 = norm1(h, film_scale=scale, film_shift=shift,
                               fold_only=True)
                h = conv1(h, fused_norm=(g1, b1, _adm_groups(c), self.eps))
        else:
            h = nn.silu(adm_group_norm(c, eps=self.eps)(
                h + params[:, None, None, :].astype(h.dtype)))
            if self.dropout > 0:
                h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = Conv2d(c, kernel=3, **INIT_ZERO, name="conv1")(h)

        if c != in_channels or self.up or self.down:
            skip_kernel = 1 if c != in_channels else 0
            orig = Conv2d(c, kernel=skip_kernel, up=self.up, down=self.down,
                          **INIT, name="skip")(orig)
        out = self._attention((h + orig) * self.skip_scale, c, num_heads)
        return (out, None) if want_stats else out

    def _paired(self, xp, emb, in_stats, want_stats, splits):
        """Paired-IO block body (MCEDM_PAIRIO): every activation enters and
        leaves in the (B, H, W/2, 2C) paired layout — the pallas kernels
        chain in the default tiled layout with no relayout copies. Module
        names match the unpaired path exactly (checkpoint-compatible)."""
        from m_cedm_tpu.models.layers import downsample2x_mean_paired
        from m_cedm_tpu.pallas.fused_norm_conv import (
            fused_block_paired, fused_gn_silu_paired, fused_up_paired,
            pair_array, unpair_array)

        assert self.adaptive_scale and self.dropout == 0
        in_channels = xp.shape[-1] // 2
        c = self.out_channels
        num_heads = c // self.channels_per_head if self.attention else 0
        eps = self.eps
        gin = _adm_groups(in_channels)
        gc = _adm_groups(c)
        zc = jnp.zeros((0,), jnp.float32)

        norm0 = GroupNormSiLU(gin, eps=eps, name="norm0")
        fold_probe = jnp.zeros(xp.shape[:1] + (1, 1, in_channels), xp.dtype)
        g0, b0 = norm0(fold_probe, fold_only=True)
        conv0 = Conv2d(c, kernel=3, up=self.up, down=self.down, **INIT,
                       name="conv0")
        conv0_w, conv0_b = conv0(fold_probe, params_only=True)
        params = Linear(c * 2, **INIT, name="affine")(emb)
        scale, shift = jnp.split(params, 2, axis=-1)
        norm1 = GroupNormSiLU(gc, eps=eps, name="norm1")
        probe_c = jnp.zeros(xp.shape[:1] + (1, 1, c), xp.dtype)
        g1, b1 = norm1(probe_c, film_scale=scale, film_shift=shift,
                       fold_only=True)
        conv1 = Conv2d(c, kernel=3, **INIT_ZERO, name="conv1")
        conv1_w, conv1_b = conv1(probe_c, params_only=True)
        skw = skb = None
        if c != in_channels:
            skw, skb = Conv2d(c, kernel=1, **INIT, name="skip")(
                fold_probe, params_only=True)

        h_stats = None
        res_kw = {}
        if self.down:
            assert splits is None
            y = fused_gn_silu_paired(xp, g0, b0,
                                     in_stats[0] if in_stats else zc,
                                     in_stats[1] if in_stats else zc,
                                     gin, eps, None, in_stats is not None)
            y = downsample2x_mean_paired(y)
            h, hs, hss = fused_block_paired(y, None, None, conv0_w, conv0_b,
                                            gin, eps, act=False,
                                            emit_stats=True)
            h_stats = (hs, hss)
            res_kw = dict(residual=downsample2x_mean_paired(xp),
                          skip_w=skw, skip_b=skb)
        elif self.up:
            assert splits is None
            # one cheap LOW-res relayout; the up kernel re-emits paired and
            # hands the tail norm its stats (no high-res stats pass)
            x_lo = unpair_array(xp)
            h, hs, hss = fused_up_paired(
                x_lo, g0, b0, conv0_w, conv0_b, gin, eps,
                tuple(in_stats) if in_stats else (zc, zc),
                in_stats is not None, True)
            h_stats = (hs, hss)
            res_lo = x_lo
            if skw is not None:
                # 1x1-project the skip at LOW res (commutes with nearest up)
                res_lo = jnp.einsum("bhwc,co->bhwo", x_lo.astype(xp.dtype),
                                    skw.astype(xp.dtype))
                if skb is not None:
                    res_lo = res_lo + skb.astype(res_lo.dtype)
            res_kw = dict(residual=res_lo, res_up=True)
        else:
            h, hs, hss = fused_block_paired(xp, g0, b0, conv0_w, conv0_b,
                                            gin, eps, splits=splits,
                                            stats=in_stats, emit_stats=True)
            h_stats = (hs, hss)
            # a concat (dual-order) input with no channel-count change would
            # add a dual-order residual to a plain-paired output — the proj
            # path (skw) is the only valid residual for split inputs
            assert splits is None or skw is not None, (
                "paired concat input requires a projection residual")
            res_kw = (dict(residual=xp, skip_w=skw, skip_b=skb,
                           res_splits=splits)
                      if skw is not None else dict(residual=xp))

        emit = (want_stats and not num_heads and self.skip_scale == 1.0)
        out = fused_block_paired(h, g1, b1, conv1_w, conv1_b, gc, eps,
                                 stats=h_stats, emit_stats=emit, **res_kw)
        out_stats = None
        if emit:
            out, os_, oss_ = out
            out_stats = (os_, oss_)
        if self.skip_scale != 1.0:
            out = out * jnp.asarray(self.skip_scale, out.dtype)
        if num_heads:
            # attention stays in the unpaired layout (res-32 tensors — the
            # two relayouts are cheap)
            out = pair_array(self._attention(unpair_array(out), c,
                                             num_heads))
        return (out, out_stats) if want_stats else out

    def _attention(self, x, c, num_heads):
        # plain helper called from the compact __call__ — same module scope,
        # so param names ("qkv", "proj", auto-named GroupNorm) are unchanged
        if not num_heads:
            return x
        b, hh, ww, _ = x.shape
        y = adm_group_norm(c, eps=self.eps)(x)
        qkv_conv = Conv2d(c * 3, kernel=1, **INIT, name="qkv")
        if os.environ.get("MCEDM_QKV_SPLIT", "1") == "1":
            # one 3c-wide matmul then a (B,L,3,heads,d) split costs a
            # relayout copy per attention site (the 192-lane tensor
            # re-tiles on the split — 12.6 MB/site in the fwd HLO byte
            # audit); slicing the SAME "qkv" param into three c-wide
            # matmuls keeps channels at c end-to-end and the copy never
            # exists. Identical params/math, different contraction
            # grouping.
            wqkv, bqkv = qkv_conv(y, params_only=True)  # (c,3c), (3c,)
            y_flat = y.reshape(b, hh * ww, c)

            def _one(i):
                t = jnp.einsum(
                    "blc,co->blo", y_flat,
                    wqkv[:, i * c:(i + 1) * c].astype(y.dtype))
                t = t + bqkv[i * c:(i + 1) * c].astype(t.dtype)
                return t.reshape(b, hh * ww, num_heads, -1).transpose(
                    0, 2, 1, 3).reshape(b * num_heads, hh * ww, -1)

            q, k, v = _one(0), _one(1), _one(2)
        else:
            qkv = qkv_conv(y)
            qkv = qkv.reshape(b, hh * ww, 3, num_heads, c // num_heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            # (B, L, H, D) -> (B*H, L, D)
            q = q.transpose(0, 2, 1, 3).reshape(b * num_heads, hh * ww, -1)
            k = k.transpose(0, 2, 1, 3).reshape(b * num_heads, hh * ww, -1)
            v = v.transpose(0, 2, 1, 3).reshape(b * num_heads, hh * ww, -1)
        a = fp32_softmax_attention(q, k, v)
        a = a.reshape(b, num_heads, hh * ww, -1).transpose(0, 2, 1, 3).reshape(b, hh, ww, c)
        return (Conv2d(c, kernel=1, **INIT_ZERO, name="proj")(a) + x) * self.skip_scale


class CondEncoder(nn.Module):
    """Two-conv GELU encoder for non-concatenated conditioning streams."""
    features: int

    @nn.compact
    def __call__(self, x):
        x = Conv2d(self.features, kernel=3, **INIT)(x)
        x = nn.gelu(x)
        return Conv2d(self.features, kernel=3, **INIT)(x)


class AdmUNet(nn.Module):
    """The full ADM U-Net; input/output are NHWC (B, H, W, C)."""
    cfg: AdmUNetConfig

    @nn.compact
    def __call__(self, x, noise_labels, cond=None, x_self_cond=None, dx=None,
                 class_labels=None, augment_labels=None, deterministic: bool = True):
        cfg = self.cfg
        ch = cfg.ch
        emb_channels = ch
        block_kwargs = dict(channels_per_head=64, dropout=cfg.dropout)
        # rematerialize each residual block under grad: activations are
        # recomputed in backward instead of stored (bigger batches / res)
        Block = (nn.remat(UNetBlock, static_argnums=(3,)) if cfg.remat
                 else UNetBlock)

        # --- noise-level embedding ---------------------------------------
        emb = fourier_positional_embedding(noise_labels, ch)
        if cfg.augment_dim and augment_labels is not None:
            emb = emb + Linear(ch, use_bias=False, **INIT_ZERO, name="map_augment")(augment_labels)
        emb = nn.silu(Linear(emb_channels, **INIT, name="map_layer0")(emb))
        emb = Linear(emb_channels, **INIT, name="map_layer1")(emb)
        if cfg.label_dim and class_labels is not None:
            emb = emb + Linear(emb_channels, use_bias=False, init_mode="kaiming_normal",
                               init_weight=cfg.label_dim ** 0.5, name="map_label")(class_labels)
        emb = nn.silu(emb)

        # --- input-channel conditioning ----------------------------------
        if cfg.self_cond:
            sc = jnp.zeros_like(x) if x_self_cond is None else x_self_cond
            x = jnp.concatenate([sc, x], axis=-1)
        if cfg.cat_cond and cfg.cond_channels > 0:
            if cond is None:
                cond_cat = jnp.zeros(x.shape[:3] + (cfg.cond_channels,), x.dtype)
            else:
                cond_cat = cond
            x = jnp.concatenate([cond_cat, x], axis=-1)
        if cfg.dx_cond and cfg.cat_dx:
            dx_cat = jnp.zeros(x.shape[:3] + (cfg.in_channels,), x.dtype) if dx is None else dx
            x = jnp.concatenate([x, dx_cat], axis=-1)

        feat_ch = ch * cfg.ch_mult[0]
        conv_in = Conv2d(feat_ch, kernel=3, **INIT, name="conv_in")
        x_raw = x
        x = conv_in(x)

        # --- feature-level conditioning encoders -------------------------
        combine = []
        if cfg.cond_channels > 0 and not cfg.cat_cond:
            if cond is not None:
                combine.append(CondEncoder(feat_ch, name="cond_enc")(cond))
            else:
                combine.append(jnp.zeros_like(x))
        if cfg.dx_cond and not cfg.cat_dx:
            if dx is not None:
                combine.append(CondEncoder(feat_ch, name="dx_enc")(dx))
            else:
                combine.append(jnp.zeros_like(x))
        if combine:
            x = jnp.concatenate([x] + combine, axis=-1)
            x = Conv2d(feat_ch, kernel=3, **INIT, name="combine_enc")(x)

        # --- encoder ------------------------------------------------------
        # chain: thread each block's emitted channel statistics into the
        # next block's norm (and the decoder's concat inputs ride into
        # dual-input kernels without the concat ever being materialized)
        from m_cedm_tpu.models.layers import (block_fusion_enabled,
                                              conv_fusion_enabled,
                                              dual_input_enabled,
                                              out_fusion_enabled,
                                              stats_chain_enabled)

        from m_cedm_tpu.models.layers import train_trace
        from m_cedm_tpu.pallas.fused_block import mega_enabled

        use_chain = (conv_fusion_enabled() and block_fusion_enabled()
                     and stats_chain_enabled() and not cfg.remat)
        use_dual = use_chain and dual_input_enabled()
        # on the megakernel path the skip-concat never materializes — both
        # halves ride into the block kernel as separate row-tiled streams
        use_mega = use_chain and mega_enabled() and not train_trace()
        # paired-IO threading: activations flow between kernels in the
        # (B, H, W/2, 2C) paired layout end-to-end (no relayout copies);
        # the decoder concat is a channel-concat of paired halves handled
        # by dual-order constants. Requires the fully-fused chain, the
        # standard input-conditioning structure, and widths divisible by 16
        # at every level.
        from m_cedm_tpu.models.layers import pair_io_enabled

        # train traces additionally need MCEDM_PAIRIO_TRAIN: every paired
        # primitive now has a hand-written backward, but the default stays
        # measured (the first pairio-train A/B with recompute backwards
        # lost 88.4 vs 67.5 ms/step)
        from m_cedm_tpu.models.layers import pair_io_train_enabled

        min_res = cfg.resolution >> (len(cfg.ch_mult) - 1)
        use_pairio = ((conv_fusion_enabled() and block_fusion_enabled()
                       and not cfg.remat)
                      and pair_io_enabled() and not use_mega
                      and (not train_trace() or pair_io_train_enabled())
                      and cfg.dropout == 0 and min_res % 16 == 0
                      and not (cfg.cond_channels > 0 and not cfg.cat_cond)
                      and not (cfg.dx_cond and not cfg.cat_dx)
                      and _pairio_concats_aligned(cfg))

        def run(blk, x, x2=None, in_stats=None):
            if use_pairio:
                splits = None
                if x2 is not None:
                    splits = (x.shape[-1] // 2, x2.shape[-1] // 2)
                    x = jnp.concatenate([x, x2], axis=-1)
                return blk(x, emb, deterministic, in_stats=in_stats,
                           want_stats=True, paired=True, splits=splits)
            if use_chain:
                if x2 is not None and not use_dual and not use_mega:
                    # materialize the concat (measured faster than the
                    # dual-input kernel) but keep its chained stats
                    x = jnp.concatenate([x, x2], axis=-1)
                    x2 = None
                return blk(x, emb, deterministic, x2=x2, in_stats=in_stats,
                           want_stats=True)
            if x2 is not None:
                x = jnp.concatenate([x, x2], axis=-1)
            return blk(x, emb, deterministic), None

        stats = None
        if use_pairio:
            from m_cedm_tpu.models.layers import in_head_kernel_enabled
            from m_cedm_tpu.pallas.fused_norm_conv import (
                fused_block_paired, pair_array)

            if (in_head_kernel_enabled() and x_raw.shape[-1] % 4 == 0
                    and not combine):
                # conv_in as a linear paired kernel: the XLA conv's
                # spatial-major layout preference cost two full-res copies
                # against the kernels' default-layout pins, and the output
                # lands paired with the first block's stats for free
                w_in, b_in = conv_in(x_raw, params_only=True)
                x, s_in, ss_in = fused_block_paired(
                    pair_array(x_raw), None, None, w_in, b_in, 1,
                    act=False, emit_stats=True)
                stats = (s_in, ss_in)
            else:
                x = pair_array(x)
        skips = [(x, stats)]
        cout = feat_ch
        for level, mult in enumerate(cfg.ch_mult):
            res = cfg.resolution >> level
            if level > 0:
                x, stats = run(Block(cout, down=True, **block_kwargs,
                                     name=f"enc_{res}x{res}_down"), x,
                               in_stats=stats)
                skips.append((x, stats))
            for idx in range(cfg.num_res_blocks):
                cout = ch * mult
                x, stats = run(Block(cout,
                                     attention=(res in cfg.attn_resolutions),
                                     **block_kwargs,
                                     name=f"enc_{res}x{res}_block{idx}"), x,
                               in_stats=stats)
                skips.append((x, stats))

        # --- decoder ------------------------------------------------------
        for level, mult in reversed(list(enumerate(cfg.ch_mult))):
            res = cfg.resolution >> level
            if level == len(cfg.ch_mult) - 1:
                x, stats = run(Block(cout, attention=True, **block_kwargs,
                                     name=f"dec_{res}x{res}_in0"), x,
                               in_stats=stats)
                x, stats = run(Block(cout, **block_kwargs,
                                     name=f"dec_{res}x{res}_in1"), x,
                               in_stats=stats)
            else:
                x, stats = run(Block(cout, up=True, **block_kwargs,
                                     name=f"dec_{res}x{res}_up"), x,
                               in_stats=stats)
            for idx in range(cfg.num_res_blocks + 1):
                skip, skip_stats = skips.pop()
                cat_stats = None
                if stats is not None and skip_stats is not None:
                    # per-channel stats of an unmaterialized concat are the
                    # concat of the halves' stats (ADM groups never straddle
                    # the boundary)
                    cat_stats = (
                        jnp.concatenate([stats[0], skip_stats[0]], -1),
                        jnp.concatenate([stats[1], skip_stats[1]], -1))
                cout = ch * mult
                x, stats = run(Block(cout,
                                     attention=(res in cfg.attn_resolutions),
                                     **block_kwargs,
                                     name=f"dec_{res}x{res}_block{idx}"), x,
                               x2=skip, in_stats=cat_stats)
        assert not skips

        from m_cedm_tpu.models.layers import out_head_mode

        out_norm = GroupNormSiLU(_adm_groups(cout), name="out_norm")
        out_conv = Conv2d(cfg.out_ch, kernel=3, **INIT_ZERO, name="out_conv")
        if use_pairio:
            # paired out-head norm, then ONE unpair relayout into the small
            # XLA out conv (O=2 Pallas stores measured slower in round 2)
            from m_cedm_tpu.pallas.fused_norm_conv import (
                fused_gn_silu_paired, unpair_array)

            zc_ = jnp.zeros((0,), jnp.float32)
            g, b = out_norm(jnp.zeros(x.shape[:1] + (1, 1, cout), x.dtype),
                            fold_only=True)
            y = fused_gn_silu_paired(x, g, b,
                                     stats[0] if stats is not None else zc_,
                                     stats[1] if stats is not None else zc_,
                                     _adm_groups(cout), 1e-5, None,
                                     stats is not None)
            if os.environ.get("MCEDM_OUTPAIR", "1") == "1":
                # consume the paired tensor directly: the unpair bitcast is
                # NOT free at the (8,128)-tiled layout (2 relayout copies,
                # 67 MB/call in the fwd HLO byte audit); measured 1.057x on
                # the 50-step sampler (pallas/fused_norm_conv.py
                # paired_out_conv).
                from m_cedm_tpu.pallas.fused_norm_conv import paired_out_conv

                w_oc, b_oc = out_conv(unpair_array(y[:1, :1, :1]),
                                      params_only=True)  # (3,3,C,2), (2,)
                return paired_out_conv(y, w_oc, b_oc)
            return out_conv(unpair_array(y))
        if conv_fusion_enabled() and out_fusion_enabled():
            g, b = out_norm(x, fold_only=True)
            return out_conv(x, fused_norm=(g, b, _adm_groups(cout), 1e-5))
        if (use_chain and out_head_mode() == "pad"
                and cfg.out_ch < x.shape[-1]):
            # fused out head with the output channels zero-padded to the
            # input width: full-lane Pallas stores (direct out_ch-lane
            # stores measured +192 ms on the sampler), then a cheap slice.
            # Zero weight columns cost only free MXU flops.
            from m_cedm_tpu.pallas.fused_norm_conv import \
                fused_gn_silu_conv_block

            g, b = out_norm(x, fold_only=True)
            w, bias_ = out_conv(x, params_only=True)
            pad_o = x.shape[-1] - cfg.out_ch
            w_pad = jnp.pad(w, ((0, 0), (0, 0), (0, 0), (0, pad_o)))
            b_pad = jnp.pad(bias_, ((0, pad_o),))
            out64 = fused_gn_silu_conv_block(
                x, g, b, w_pad, b_pad, _adm_groups(cout), 1e-5, stats=stats)
            return out64[..., :cfg.out_ch]
        return out_conv(out_norm(x, stats=stats))
