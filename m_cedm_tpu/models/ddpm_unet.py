"""Classic DDPM/DDIM U-Net ("Model") in flax.linen, NHWC.

Parity target: models/ddim_blocks.py:62-470 in the reference (the
ermongroup/ddim architecture: sinusoidal t-embedding with a 2-layer MLP,
ResnetBlocks with additive t-conditioning, single-head softmax attention,
nearest-upsample / asymmetric-pad strided-conv downsample, plus the m-cedm
conditioning extensions shared with the ADM net).

TPU-first notes:
  * NHWC; attention over flattened spatial tokens in fp32.
  * The asymmetric (0,1,0,1) downsample padding of the reference is kept
    exactly (it changes which pixels each output sees).
  * Bayesian per-t logvar option is a (num_timesteps,) param vector.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from m_cedm_tpu.models.layers import (
    GroupNormSiLU,
    TorchConv2d,
    TorchLinear,
    ddpm_group_norm,
    upsample2x_nearest,
)
from m_cedm_tpu.ops.schedules import sinusoidal_timestep_embedding


@dataclasses.dataclass(frozen=True)
class DdpmUNetConfig:
    in_channels: int
    out_ch: int
    ch: int = 64
    ch_mult: Tuple[int, ...] = (1, 1, 1)
    num_res_blocks: int = 1
    attn_resolutions: Tuple[int, ...] = (32,)
    resolution: int = 128
    dropout: float = 0.0
    resamp_with_conv: bool = True
    cond_channels: int = 0
    cat_cond: bool = False
    self_cond: bool = False
    dx_cond: bool = False
    cat_dx: bool = False
    bayesian: bool = False
    num_timesteps: int = 1000

    @staticmethod
    def from_hparams(hparams) -> "DdpmUNetConfig":
        m = hparams["model"]

        def get(key, default):
            return m.get(key, default) if hasattr(m, "get") else getattr(m, key, default)

        diffusion = hparams.get("diffusion", {}) or {}
        return DdpmUNetConfig(
            in_channels=m["in_channels"],
            out_ch=m["out_ch"],
            ch=m["ch"],
            ch_mult=tuple(m["ch_mult"]),
            num_res_blocks=m["num_res_blocks"],
            attn_resolutions=tuple(m["attn_resolutions"]),
            resolution=m["resolution"],
            dropout=get("dropout", 0.0),
            resamp_with_conv=get("resamp_with_conv", True),
            cond_channels=get("cond_channels", 0),
            cat_cond=get("cat_cond", False),
            self_cond=get("self_cond", False),
            dx_cond=get("dx_cond", False),
            cat_dx=get("cat_dx", False),
            bayesian=(get("type", "simple") == "bayesian"),
            num_timesteps=diffusion.get("num_diffusion_timesteps", 1000),
        )

    @property
    def total_in_channels(self) -> int:
        c = self.in_channels * (2 if self.self_cond else 1)
        if self.cat_cond:
            c += self.cond_channels
        if self.dx_cond and self.cat_dx:
            c += self.in_channels
        return c


def ddpm_pair_enabled() -> bool:
    """MCEDM_DDPM_PAIR gates the paired-kernel DDPM ResnetBlock (default
    ON: same-session 50-step DDIM joint-sampler A/B, B=16 res128 bf16:
    679.6 -> 553.7 ms, 1.227x, 28.9 samples/s). The round-2 UNPAIRED
    kernels were a measured net loss for this net (5.97 samples/s pure-XLA
    vs 5.46 with kernels) — the paired layout reverses the verdict.
    MCEDM_DDPM_PAIR=0 restores pure XLA."""
    import os

    return os.environ.get("MCEDM_DDPM_PAIR", "1") != "0"


def ddpm_pairio_enabled() -> bool:
    """MCEDM_DDPM_PAIRIO threads the paired layout BETWEEN DDPM blocks
    (skips stored paired, dual-order decoder concats, chained output
    stats), so each ResnetBlock's pair/unpair boundary — two relayout
    copies of the full activation at the (8,128)-tiled layout — never
    materializes. The r5 DDPM sampler profile showed ~30% of each DDIM
    step in copies/layout, the per-block pair/unpair tax. Resamples and
    attention stay unpaired (level-transition boundaries only).

    Default ON: same-session 50-step DDIM A/B 518.9 -> 341.8 ms (1.518x,
    46.8 samples/s) — threading alone 1.104x, the paired out head with
    chained stats (MCEDM_DDPM_OUTHEAD, kills the full-res XLA GroupNorm
    pass + unpair boundary) takes it to 1.518x."""
    import os

    return (ddpm_pair_enabled()
            and os.environ.get("MCEDM_DDPM_PAIRIO", "1") != "0")


class ResnetBlock(nn.Module):
    """DDPM residual block. Default: the PAIRED fused kernels (two paired
    norm+conv kernels + one fused temb add with chained adjusted stats —
    see ddpm_pair_enabled; measured 1.227x on the joint DDIM sampler).
    The round-2 UNPAIRED kernels were a measured net loss (5.97 samples/s
    pure-XLA vs 5.46), which the paired layout reverses; MCEDM_DDPM_PAIR=0
    restores the pure-XLA composition below."""
    out_channels: int
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, temb, deterministic: bool = True, *,
                 paired_in=None, splits=None, in_stats=None,
                 want_paired: bool = False):
        """paired_in: (B, H, W/2, 2C) paired activation (dual-order when
        splits=(c1, c2) — the decoder's channel-concat) replacing x (pass
        x=None). in_stats: chained per-original-channel (sums, sumsq) of
        the input from the producing kernel. want_paired: return
        (paired_out, (sums, sumsq)) instead of the unpaired tensor —
        the MCEDM_DDPM_PAIRIO threading protocol."""
        if paired_in is not None:
            bp, hp_, w2p, c2p = paired_in.shape
            x_shape = (bp, hp_, 2 * w2p, c2p // 2)
            in_ch = c2p // 2
        else:
            x_shape = x.shape
            in_ch = x.shape[-1]
        c = self.out_channels
        from m_cedm_tpu.pallas.fused_norm_conv import _use_pallas

        # kernel path ONLY: the chained ADJUSTED statistics must be
        # honored by the consumer, which the reference fallback (used on
        # CPU) cannot do (it recomputes stats from its input) — fall back
        # to the plain composition whenever the kernels wouldn't run
        use_pair = (ddpm_pair_enabled() and x_shape[2] % 16 == 0
                    and in_ch % 8 == 0 and c % 8 == 0
                    and (self.dropout == 0 or deterministic)
                    and _use_pallas(jax.ShapeDtypeStruct(
                        (x_shape[0], x_shape[1], x_shape[2] // 2,
                         2 * in_ch),
                        x.dtype if paired_in is None else paired_in.dtype)))
        if paired_in is not None:
            # threaded callers pre-check the gate (ddpm_pairio_enabled)
            return self._paired(None, temb, xp=paired_in, splits=splits,
                                in_stats=in_stats, want_paired=want_paired)
        if use_pair:
            return self._paired(x, temb)
        h = GroupNormSiLU(32, eps=1e-6, use_kernel=False, name="norm1")(x)
        h = TorchConv2d(self.out_channels, kernel=3, name="conv1")(h)
        h = h + TorchLinear(self.out_channels, name="temb_proj")(nn.silu(temb))[:, None, None, :]
        h = GroupNormSiLU(32, eps=1e-6, use_kernel=False, name="norm2")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = TorchConv2d(self.out_channels, kernel=3, name="conv2")(h)
        if in_ch != self.out_channels:
            x = TorchConv2d(self.out_channels, kernel=1, name="nin_shortcut")(x)
        return x + h

    def _paired(self, x, temb, *, xp=None, splits=None, in_stats=None,
                want_paired=False):
        """Whole block as two paired kernels plus one fused add. The temb
        add happens on the PAIRED activation, and the second kernel's
        statistics come adjusted from the first kernel's emitted stats
        (sums' = sums + N t; sumsq' = sumsq + 2 t sums + N t^2 — exact
        stats of h + t), so no stats pass ever reads the full-res tensor.
        Module/param names match the unpaired path (checkpoint-compatible).

        Threaded mode (MCEDM_DDPM_PAIRIO): xp enters PAIRED (dual-order
        when splits=(c1, c2)), in_stats chain from the producer, and
        want_paired returns (paired_out, output stats) so the next block's
        norm never reads the full-res tensor either.
        """
        from m_cedm_tpu.pallas.fused_norm_conv import (
            fused_block_paired, pair_array, unpair_array)

        if xp is None:
            in_ch = x.shape[-1]
            b, hh, w2x = x.shape[0], x.shape[1], x.shape[2] // 2
        else:
            b, hh, w2x, c2x = xp.shape
            in_ch = c2x // 2
        c = self.out_channels
        npix = hh * 2 * w2x
        eps = 1e-6
        dtype = (x if xp is None else xp).dtype
        probe_in = jnp.zeros((b, 1, 1, in_ch), dtype)
        probe_c = jnp.zeros((b, 1, 1, c), dtype)
        g1, b1 = GroupNormSiLU(32, eps=eps, use_kernel=False,
                               name="norm1")(probe_in, fold_only=True)
        w1, bias1 = TorchConv2d(c, kernel=3, name="conv1")(
            probe_in, params_only=True)
        t = TorchLinear(c, name="temb_proj")(nn.silu(temb)).astype(
            jnp.float32)
        g2, b2 = GroupNormSiLU(32, eps=eps, use_kernel=False,
                               name="norm2")(probe_c, fold_only=True)
        w2, bias2 = TorchConv2d(c, kernel=3, name="conv2")(
            probe_c, params_only=True)
        skw = skb = None
        if in_ch != c:
            skw, skb = TorchConv2d(c, kernel=1, name="nin_shortcut")(
                probe_in, params_only=True)

        # a dual-order identity residual is not a supported kernel layout;
        # every dual-order site in this net is a channel concat (in != out
        # channels), so the residual is always the 1x1 projection there
        assert splits is None or skw is not None
        if xp is None:
            xp = pair_array(x)
        h, hs, hss = fused_block_paired(xp, g1, b1, w1, bias1, 32, eps,
                                        splits=splits, stats=in_stats,
                                        emit_stats=True)
        t_pair = jnp.concatenate([t, t], axis=-1)
        h = h + t_pair[:, None, None, :].astype(h.dtype)
        # exact (pre-rounding) channel stats of h + t — the chained-stats
        # convention stays valid because they are a deterministic function
        # of the consumer's input
        sums_t = hs + npix * t
        sumsq_t = hss + 2.0 * t * hs + npix * t * t
        out = fused_block_paired(h, g2, b2, w2, bias2, 32, eps,
                                 residual=xp, res_splits=splits,
                                 skip_w=skw, skip_b=skb,
                                 stats=(sums_t, sumsq_t),
                                 emit_stats=want_paired)
        if want_paired:
            out, osums, osumsq = out
            return out, (osums, osumsq)
        return unpair_array(out)


class AttnBlock(nn.Module):
    @nn.compact
    def __call__(self, x):
        from m_cedm_tpu.pallas.fused_attention import attention_reference

        b, hh, ww, c = x.shape
        y = ddpm_group_norm(c)(x)
        q = TorchConv2d(c, kernel=1, name="q")(y).reshape(b, hh * ww, c)
        k = TorchConv2d(c, kernel=1, name="k")(y).reshape(b, hh * ww, c)
        v = TorchConv2d(c, kernel=1, name="v")(y).reshape(b, hh * ww, c)
        # pure-XLA attention: kernels measure slower for this net (see
        # ResnetBlock note)
        a = attention_reference(q, k, v).reshape(b, hh, ww, c)
        return x + TorchConv2d(c, kernel=1, name="proj_out")(a)


class Downsample(nn.Module):
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        if self.with_conv:
            # torch pads (left, right, top, bottom) = (0,1,0,1) then valid conv
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            return TorchConv2d(x.shape[-1], kernel=3, stride=2, padding="valid",
                               name="conv")(x)
        b, h, w, c = x.shape
        return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class Upsample(nn.Module):
    with_conv: bool = True

    @nn.compact
    def __call__(self, x):
        x = upsample2x_nearest(x)
        if self.with_conv:
            x = TorchConv2d(x.shape[-1], kernel=3, name="conv")(x)
        return x


class CondEncoder(nn.Module):
    """1x1 conv -> GELU -> circular 3x3 conv feature encoder for conditioning."""
    features: int

    @nn.compact
    def __call__(self, x):
        x = TorchConv2d(self.features, kernel=1)(x)
        x = nn.gelu(x)
        return TorchConv2d(self.features, kernel=3, padding_mode="circular")(x)


class DdpmUNet(nn.Module):
    """The DDPM U-Net; input/output are NHWC (B, H, W, C); t is (B,)."""
    cfg: DdpmUNetConfig

    @nn.compact
    def __call__(self, x, t, cond=None, x_self_cond=None, dx=None,
                 deterministic: bool = True):
        cfg = self.cfg
        assert x.shape[1] == x.shape[2] == cfg.resolution
        ch = cfg.ch
        temb_ch = ch * 4
        if cfg.bayesian:
            self.param("logvar", nn.initializers.zeros, (cfg.num_timesteps,))

        temb = sinusoidal_timestep_embedding(t, ch)
        temb = TorchLinear(temb_ch, name="temb_dense0")(temb)
        temb = TorchLinear(temb_ch, name="temb_dense1")(nn.silu(temb))

        # --- input-channel conditioning ----------------------------------
        if cfg.self_cond:
            sc = jnp.zeros_like(x) if x_self_cond is None else x_self_cond
            x = jnp.concatenate([sc, x], axis=-1)
        if cfg.cat_cond and cfg.cond_channels > 0:
            if cond is None:
                cond = jnp.zeros(x.shape[:3] + (cfg.cond_channels,), x.dtype)
            x = jnp.concatenate([cond, x], axis=-1)
        if cfg.dx_cond and cfg.cat_dx:
            dx_cat = jnp.zeros(x.shape[:3] + (cfg.in_channels,), x.dtype) if dx is None else dx
            x = jnp.concatenate([x, dx_cat], axis=-1)

        x = TorchConv2d(ch, kernel=3, name="conv_in")(x)

        combine = []
        if cfg.cond_channels > 0 and not cfg.cat_cond:
            combine.append(CondEncoder(ch, name="cond_enc")(cond)
                           if cond is not None else jnp.zeros_like(x))
        if cfg.dx_cond and not cfg.cat_dx:
            combine.append(CondEncoder(ch, name="dx_enc")(dx)
                           if dx is not None else jnp.zeros_like(x))
        if combine:
            x = jnp.concatenate([x] + combine, axis=-1)
            x = TorchConv2d(ch, kernel=1, name="combine_enc")(x)

        num_resolutions = len(cfg.ch_mult)
        curr_res = cfg.resolution

        if self._pairio_ok(x, deterministic):
            return self._forward_pairio(x, temb, deterministic)

        # --- encoder ------------------------------------------------------
        hs = [x]
        h = x
        for i_level in range(num_resolutions):
            block_out = ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                h = ResnetBlock(block_out, cfg.dropout,
                                name=f"down_{i_level}_block_{i_block}")(h, temb, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"down_{i_level}_attn_{i_block}")(h)
                hs.append(h)
            if i_level != num_resolutions - 1:
                h = Downsample(cfg.resamp_with_conv, name=f"down_{i_level}_downsample")(hs[-1])
                hs.append(h)
                curr_res //= 2

        # --- middle -------------------------------------------------------
        block_in = h.shape[-1]
        h = ResnetBlock(block_in, cfg.dropout, name="mid_block_1")(h, temb, deterministic)
        h = AttnBlock(name="mid_attn_1")(h)
        h = ResnetBlock(block_in, cfg.dropout, name="mid_block_2")(h, temb, deterministic)

        # --- decoder ------------------------------------------------------
        for i_level in reversed(range(num_resolutions)):
            block_out = ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = ResnetBlock(block_out, cfg.dropout,
                                name=f"up_{i_level}_block_{i_block}")(h, temb, deterministic)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"up_{i_level}_attn_{i_block}")(h)
            if i_level != 0:
                h = Upsample(cfg.resamp_with_conv, name=f"up_{i_level}_upsample")(h)
                curr_res *= 2
        assert not hs

        h = GroupNormSiLU(32, eps=1e-6, use_kernel=False, name="norm_out")(h)
        return TorchConv2d(cfg.out_ch, kernel=3, name="conv_out")(h)

    def _pairio_ok(self, x, deterministic) -> bool:
        """Gate for the threaded paired forward: every block must take the
        paired-kernel path (shape/dtype/backend checks) and every decoder
        concat's GroupNorm groups must align with the concat boundary."""
        from m_cedm_tpu.pallas.fused_norm_conv import _use_pallas

        cfg = self.cfg
        if not (ddpm_pairio_enabled()
                and (cfg.dropout == 0 or deterministic)):
            return False
        # simulate the skip stack's channel counts and check every block's
        # shape gates + every decoder concat's group alignment
        n = len(cfg.ch_mult)
        res = cfg.resolution
        ok = True
        hs_c = [cfg.ch]
        c_h = cfg.ch
        curr = res
        for i in range(n):
            c_out = cfg.ch * cfg.ch_mult[i]
            ok = ok and curr % 16 == 0 and c_h % 8 == 0 and c_out % 8 == 0
            for _ in range(cfg.num_res_blocks):
                c_h = c_out
                hs_c.append(c_h)
            if i != n - 1:
                hs_c.append(c_h)
                curr //= 2
        for i in reversed(range(n)):
            c_out = cfg.ch * cfg.ch_mult[i]
            for _ in range(cfg.num_res_blocks + 1):
                c_s = hs_c.pop()
                tot = c_h + c_s
                per = tot // 32 if tot % 32 == 0 else 0
                ok = (ok and per > 0 and c_h % per == 0
                      and curr % 16 == 0 and tot % 8 == 0)
                c_h = c_out
            if i != 0:
                curr *= 2
        return ok and _use_pallas(jax.ShapeDtypeStruct(
            (x.shape[0], x.shape[1], x.shape[2] // 2, 2 * cfg.ch), x.dtype))

    def _forward_pairio(self, x, temb, deterministic):
        """MCEDM_DDPM_PAIRIO: the encoder/middle/decoder chain runs with
        every activation PAIRED — skips stored paired with their chained
        channel stats, decoder concats dual-order (splits), blocks emit
        output stats for the next norm. Attention and resamples run
        unpaired (res-32 / level-transition tensors only). Param names
        and math match the unpaired forward (reference
        models/ddim_blocks.py:300-470)."""
        from m_cedm_tpu.pallas.fused_norm_conv import pair_array, unpair_array

        cfg = self.cfg
        ch = cfg.ch
        num_resolutions = len(cfg.ch_mult)
        curr_res = cfg.resolution

        def blk(name, hp, splits, stats, block_out):
            return ResnetBlock(block_out, cfg.dropout, name=name)(
                None, temb, deterministic, paired_in=hp, splits=splits,
                in_stats=stats, want_paired=True)

        # (paired tensor, stats-or-None); stats invalidate through any
        # unpaired op (attention, resample, conv_in)
        hp = pair_array(x)
        hs = [(hp, None)]
        stats = None
        for i_level in range(num_resolutions):
            block_out = ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks):
                hp, stats = blk(f"down_{i_level}_block_{i_block}", hp,
                                None, stats, block_out)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"down_{i_level}_attn_{i_block}")(
                        unpair_array(hp))
                    hp, stats = pair_array(h), None
                hs.append((hp, stats))
            if i_level != num_resolutions - 1:
                h = Downsample(cfg.resamp_with_conv,
                               name=f"down_{i_level}_downsample")(
                    unpair_array(hs[-1][0]))
                hp, stats = pair_array(h), None
                hs.append((hp, stats))
                curr_res //= 2

        block_in = hp.shape[-1] // 2
        hp, stats = blk("mid_block_1", hp, None, stats, block_in)
        h = AttnBlock(name="mid_attn_1")(unpair_array(hp))
        hp, stats = pair_array(h), None
        hp, stats = blk("mid_block_2", hp, None, stats, block_in)

        for i_level in reversed(range(num_resolutions)):
            block_out = ch * cfg.ch_mult[i_level]
            for i_block in range(cfg.num_res_blocks + 1):
                skip, skip_stats = hs.pop()
                c_h = hp.shape[-1] // 2
                c_s = skip.shape[-1] // 2
                cat = jnp.concatenate([hp, skip], axis=-1)
                if stats is not None and skip_stats is not None:
                    cat_stats = (
                        jnp.concatenate([stats[0], skip_stats[0]], -1),
                        jnp.concatenate([stats[1], skip_stats[1]], -1))
                else:
                    cat_stats = None
                hp, stats = blk(f"up_{i_level}_block_{i_block}", cat,
                                (c_h, c_s), cat_stats, block_out)
                if curr_res in cfg.attn_resolutions:
                    h = AttnBlock(name=f"up_{i_level}_attn_{i_block}")(
                        unpair_array(hp))
                    hp, stats = pair_array(h), None
            if i_level != 0:
                h = Upsample(cfg.resamp_with_conv,
                             name=f"up_{i_level}_upsample")(unpair_array(hp))
                hp, stats = pair_array(h), None
                curr_res *= 2
        assert not hs

        # paired out head: norm_out consumes the last block's chained
        # stats, conv_out runs on the paired tensor via block taps — the
        # full-res unpair boundary never materializes
        from m_cedm_tpu.pallas.fused_norm_conv import (
            fused_gn_silu_paired, paired_out_conv)
        import os

        if os.environ.get("MCEDM_DDPM_OUTHEAD", "1") != "1":
            h = GroupNormSiLU(32, eps=1e-6, use_kernel=False,
                              name="norm_out")(unpair_array(hp))
            return TorchConv2d(cfg.out_ch, kernel=3, name="conv_out")(h)

        c_out = hp.shape[-1] // 2
        probe = jnp.zeros((hp.shape[0], 1, 1, c_out), hp.dtype)
        g, b = GroupNormSiLU(32, eps=1e-6, use_kernel=False,
                             name="norm_out")(probe, fold_only=True)
        zc = jnp.zeros((0,), jnp.float32)
        y = fused_gn_silu_paired(hp, g, b,
                                 stats[0] if stats is not None else zc,
                                 stats[1] if stats is not None else zc,
                                 32, 1e-6, None, stats is not None)
        w_oc, b_oc = TorchConv2d(cfg.out_ch, kernel=3, name="conv_out")(
            probe, params_only=True)
        return paired_out_conv(y, w_oc, b_oc)
