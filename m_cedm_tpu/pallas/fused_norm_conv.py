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
(XLA cost analysis: fwd intensity 7.5 flop/byte vs v5e ridge ~240),
directly raising the roofline ceiling. The block-tail extension (residual
+ stats emission below) measured a further 1.10x on the 50-step Heun
sampler (same-session A/B: 1208.5 -> 1098.2 ms, B=16 res128 bf16).

Kernel structure: grid (B, H/R) over row tiles (R=16; a handful of MB of
VMEM per step at any model shape). Halo rows ride in as thin pre-sliced
(B, H/R, W, C) row arrays with clamped index maps — 2*(H/R) rows of extra
traffic instead of the 2 full input passes that whole-neighbor-tile halo
fetches would cost — and are zeroed at the image edges AFTER normalization
(SAME zero padding applies to the normalized activation). The 3x3 conv is 9 shifted (R*W, C) x (C, O)
MXU matmuls over a W-zero-padded copy of the normalized strip. Group
statistics ride in as the same (B, C) sum/sumsq vectors used by fused_norm
(group combine = constant (C, C) matmul — Mosaic rejects reshape-based
channel grouping; weights ride as a 2D (9C, O) block and bias as (1, O) —
Mosaic rejects 1D blocks and >2D ref indexing).

Backward (training): a hand-written phase-A kernel accumulates
dW/dbias/dgamma/dbeta and emits the pre-activation cotangent da (the
transpose-conv taps are mirrored slices of the same zero-padded strip);
dx then follows as one fused XLA elementwise pass and the skip cotangents
as plain XLA matmuls/pools. Measured 1.022x over unfused XLA autodiff and
1.33x over the recompute fallback (same-session, B=16 res128 bf16) —
MCEDM_BWD_KERNEL=0 restores the recompute path.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.pallas import ledger
from m_cedm_tpu.pallas.fused_norm import (
    _compute_stats,
    _gc,
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


def gn_silu_conv_block_reference(x, gamma, beta, w, bias, num_groups: int,
                                 eps: float = 1e-5, residual=None,
                                 skip_w=None, skip_b=None):
    """Reference for the fully-fused residual-block tail:

        conv3x3(silu(gn(x)*gamma+beta)) + skip(residual)

    where `residual` is the block input (a different tensor than x = the
    first conv's output) and skip is the identity (skip_w None; requires
    residual channels == O) or the block's 1x1 skip projection (`skip_w`:
    (C_res, O), `skip_b`: (O,) or None) — adm_blocks.py:168-171 in the
    reference (skip conv + residual add).
    """
    out = gn_silu_conv_reference(x, gamma, beta, w, bias, num_groups, eps)
    if residual is None:
        return out
    if skip_w is None:
        return out + residual.astype(out.dtype)
    proj = jnp.einsum("bhwc,co->bhwo", residual.astype(out.dtype),
                      skip_w.astype(out.dtype))
    if skip_b is not None:
        proj = proj + skip_b.astype(out.dtype)
    return out + proj


def _out_stats_reference(out):
    """(B, O) channel sum / sum-of-squares of a (B, H, W, O) activation —
    the quantities the next GroupNorm's stats pass would recompute."""
    o32 = out.astype(jnp.float32)
    return jnp.sum(o32, axis=(1, 2)), jnp.sum(o32 * o32, axis=(1, 2))


def _row_tile(h: int, dtype=None, wdt: int = None, c: int = None,
              cands=(64, 32, 16, 8)) -> int:
    """Largest row-tile from (64, 32, 16, 8) dividing h. Round-3 on-device
    sweep (50-step sampler, B=16 res128 bf16, raised VMEM caps): R=64 is
    1.041x over the round-2 R=16 (1029.5 vs 1072.1 ms; R=32 1035.5) —
    fewer grid steps amortize the per-step pad/copy work that is the
    kernels' measured floor. R=128 (whole image) exceeded even a 48 MB
    scoped-VMEM cap. Round 2's R=16 choice predated the raised caps.
    MCEDM_TILE_R overrides for experiments (verbatim, no footprint cap).

    When the caller passes wdt the tile additionally shrinks until the
    estimated Mosaic stack fits the hard 64 MB scoped-VMEM ceiling, so
    larger-than-flagship shapes (res-256 eval) auto-drop to R=32/16 instead
    of failing to compile. The estimate is calibrated on on-device anchors:
    the fp32 forward FAILS at ~79.91 MB for R=64/W=258/C=64 while
    R=64/W=130/C=128 (flagship fp32 decoder tail, bench-train) compiles —
    the stack is ~linear in R*(W+2)*bytes and SUBlinear in C, modeled as
    sqrt(C/64) (K = 79.91e6 / (64*258*4) ~= 1210 bytes/strip-col at C=64;
    the paired fp32 decoder conv0 — R=128/W2=66/C=256 — measured 64.59 MB
    vs 40.9 predicted channel-blind, and sqrt scaling excludes it while
    keeping every measured-good config)."""
    import os

    cscale = max(1.0, (c or 64) / 64.0) ** 0.5

    r_env = os.environ.get("MCEDM_TILE_R")
    if r_env:
        r = int(r_env)
        if 0 < r <= h and h % r == 0:
            return r
    r = 0
    for cand in cands:
        if h % cand == 0:
            r = cand
            break
    if r and wdt is not None:
        bytes_per = 2 if dtype == jnp.bfloat16 else 4
        while (r > 8 and h % (r // 2) == 0
               and r * (wdt + 2) * bytes_per * 1210 * cscale > 60 * 2 ** 20):
            r //= 2
    return r


def _compiler_params(r: int, wdt: int, c: int):
    """Raise the scoped-VMEM cap (default 16 MB; v5e has 128 MB). The fp32
    proj-tail kernel's stack measures ~18 MB at the flagship shape (Mosaic
    materializes the tap slices concurrently), and MCEDM_TILE_R experiments
    with whole-image strips need far more."""
    need = max(r * wdt * c * 4 * 8,  # rough: fp32 strip copies + staging
               32 * 2 ** 20)
    # Mosaic clamps the scoped (stack) limit to a hard 64 MB on this
    # backend (observed: requesting more still reports "limit 64.00M")
    return pltpu.CompilerParams(
        vmem_limit_bytes=min(int(need * 2), 64 * 2 ** 20))


def _gnsc_kernel(*refs, n: int, eps: float, n_tiles: int,
                 res_mode: str = "none", emit_stats: bool = False,
                 dual: bool = False, act: bool = True,
                 sh_halves: tuple = ()):
    """Row-tiled fused norm+silu+conv: grid (B, H/R). The halo rows ride in
    as thin pre-sliced (B, n_tiles, W, C) row arrays (xp = last row of the
    tile above, xn = first row of the tile below) — fetching them as whole
    neighbor tiles would re-read the entire input twice more. At the image
    edges they are zeroed (SAME zero padding).

    dual=True: the logical input is concat(x1, x2) along C, but the concat
    is NEVER materialized — both inputs ride in as separate row-tiled
    triples and each conv tap contracts two channel-row slices of the full
    weight block (the decoder's skip-concat pattern; GroupNorm groups never
    straddle the concat boundary at ADM's 4-channels-per-group minimum).

    res_mode extends the kernel to the whole residual-block tail (the
    residual is the BLOCK input — a separate tensor riding in as one more
    row-tiled input):
      "identity": out += res (the block's skip when channels match)
      "proj":     out += res @ skip_w + skip_b (the 1x1 skip conv as a 10th
                  MXU matmul on the already-resident residual tile)
      "proj2":    out += res1 @ skip_w[:C1] + res2 @ skip_w[C1:] + skip_b
                  (the skip projection of an unmaterialized concat)
    emit_stats adds (B, O) channel sum / sumsq outputs of the final result,
    accumulated across row tiles — the next GroupNorm's stats pass for free.
    """
    (xp_ref, xc_ref, xn_ref), rest = refs[:3], refs[3:]
    xp2_ref = xc2_ref = xn2_ref = None
    if dual:
        (xp2_ref, xc2_ref, xn2_ref), rest = rest[:3], rest[3:]
    (gamma_ref, beta_ref, sums_ref, sumsq_ref, gmat_ref, w_ref,
     bias_ref), rest = rest[:7], rest[7:]
    res_ref = res2_ref = skw_ref = skb_ref = None
    if res_mode in ("identity", "identity_up"):
        res_ref, rest = rest[0], rest[1:]
    elif res_mode == "proj":
        (res_ref, skw_ref, skb_ref), rest = rest[:3], rest[3:]
    elif res_mode == "proj2":
        (res_ref, res2_ref, skw_ref, skb_ref), rest = rest[:4], rest[4:]
    out_ref = rest[0]
    osums_ref = osumsq_ref = None
    if emit_stats:
        osums_ref, osumsq_ref = rest[1], rest[2]
    b, t = pl.program_id(0), pl.program_id(1)
    r, wdt, c1 = xc_ref.shape[1], xc_ref.shape[2], xc_ref.shape[3]
    c2 = xc2_ref.shape[3] if dual else 0
    c = c1 + c2
    o = out_ref.shape[-1]
    if act:
        mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                                sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n,
                                eps)
        gamma = (gamma_ref[pl.ds(b, 1), :] * rstd).reshape(1, 1, c)
        beta = (beta_ref[pl.ds(b, 1), :]
                - gamma_ref[pl.ds(b, 1), :] * rstd * mean).reshape(1, 1, c)
    else:
        # linear mode: plain conv3x3 (+skip/residual) on a pre-activated
        # input — the down-block prefix's conv after the paired pool
        gamma = beta = None

    top_live = (t > 0).astype(jnp.float32)
    bot_live = (t < n_tiles - 1).astype(jnp.float32)
    # the matmuls run in the NETWORK dtype (bf16 in production): profiling
    # showed fp32 dots made the kernels MXU-compute-bound (~1/4 MXU rate,
    # 0.56 ms vs 0.08 ms roofline per res-128 call). The reference's own
    # dtype flow casts the normalized activation to x.dtype before the conv
    # (gn_silu_conv_reference), so this also matches reference numerics;
    # accumulation stays fp32 (MXU native).
    mm_dtype = xc_ref.dtype

    import os as _os

    # linear mode has no round-2 pad structure to re-measure
    pad_v2 = _os.environ.get("MCEDM_PAD", "2") == "2" or not act

    def norm_pad(xp, xc, xn, gamma_s, beta_s):
        """(R+2, W+2, Ci) normalized, silu'd, halo/W-zero-padded strip.

        v2 (default) normalizes the three pieces separately and concatenates
        once per axis in the matmul dtype: no full-strip fp32 concat, no
        re-zeroing slices, no separate cast pass — per-step in-VMEM copies
        are the kernels' measured floor (same-session A/B: 1.010x on the
        50-step sampler, 1080.0 -> 1068.8 ms). MCEDM_PAD=1 keeps the
        round-2 structure for re-measurement."""
        ci = xc.shape[3]
        zcol = jnp.zeros((r + 2, 1, ci), mm_dtype)
        if pad_v2:
            def ns(v, live=None):
                if not act:
                    y = v.astype(mm_dtype)
                    if live is not None:
                        y = y * live.astype(mm_dtype)
                    return y
                y = v.astype(jnp.float32) * gamma_s + beta_s
                y = y * jax.nn.sigmoid(y)
                if live is not None:
                    # off-image halo rows must contribute zeros to the conv
                    # (beta shifts the already-zeroed halo inputs)
                    y = y * live
                return y.astype(mm_dtype)

            y = jnp.concatenate([ns(xp[0], top_live), ns(xc[0]),
                                 ns(xn[0], bot_live)], axis=0)
            return jnp.concatenate([zcol, y, zcol], axis=1)
        top = xp[0].astype(jnp.float32) * top_live  # (1, W, Ci)
        bot = xn[0].astype(jnp.float32) * bot_live
        strip = jnp.concatenate([top, xc[0].astype(jnp.float32), bot],
                                axis=0)
        y = strip * gamma_s + beta_s
        y = y * jax.nn.sigmoid(y)
        top_row = jax.lax.slice(y, (0, 0, 0), (1, wdt, ci)) * top_live
        mid = jax.lax.slice(y, (1, 0, 0), (1 + r, wdt, ci))
        bot_row = jax.lax.slice(y, (1 + r, 0, 0), (2 + r, wdt, ci)) * bot_live
        y = jnp.concatenate([top_row, mid, bot_row], axis=0).astype(mm_dtype)
        # zero-pad the W axis via concatenation (Mosaic lacks
        # dynamic_update_slice on the TC core)
        return jnp.concatenate([zcol, y, zcol], axis=1)

    ypad = norm_pad(xp_ref, xc_ref, xn_ref,
                    jax.lax.slice(gamma, (0, 0, 0), (1, 1, c1)) if act
                    else None,
                    jax.lax.slice(beta, (0, 0, 0), (1, 1, c1)) if act
                    else None)
    ypad2 = None
    if dual:
        ypad2 = norm_pad(xp2_ref, xc2_ref, xn2_ref,
                         jax.lax.slice(gamma, (0, 0, c1), (1, 1, c)),
                         jax.lax.slice(beta, (0, 0, c1), (1, 1, c)))

    # weights ride as a 2D (9*C, O) block; bias as (1, O) — Mosaic tiling
    # rejects 1D blocks and >2D ref indexing here. In dual mode each tap's
    # C weight rows split into the x1 rows and the x2 rows.
    acc = jnp.broadcast_to(bias_ref[:].astype(jnp.float32), (r * wdt, o))
    if sh_halves:
        # shifted-pair taps (see _pair_weights_shifted): build the one-pixel
        # shifted strip ysh (lane-half swap + column shift, once per tile —
        # per dual-order half when sh_halves has two entries) and run 6
        # dense (2C, 2O) matmuls instead of 9 half-zero ones.
        # Mosaic rejects concatenating slices whose layout offsets differ
        # ("result/input offset mismatch on non-concat dimension"), so the
        # swap+shift is expressed as lane/sublane ROTATES + an iota select:
        # ysh col s = [p1(s) | p0(s+1)] = where(lane < half,
        #   roll(ypad, -half, lanes)[s], roll(roll(ypad, half, lanes), -1,
        #   cols)[s]). The column-roll wrap garbage lands in column wdt+1,
        #   which the tap slices (max col s+wdt-1 = wdt) never read.
        lane = jax.lax.broadcasted_iota(jnp.int32, ypad.shape, 2)
        ysh = None
        off = 0
        n_lanes, n_cols = ypad.shape[2], ypad.shape[1]
        # Mosaic's rotate only handles 32-bit data — roll an fp32 view and
        # cast back (the strip is small: one halo'd row tile in VMEM)
        yp32 = ypad.astype(jnp.float32)
        for hw in sh_halves:
            half = hw // 2
            # pltpu.roll requires non-negative shifts: -s == size - s
            a = pltpu.roll(yp32, (n_lanes - half) % n_lanes, axis=2)
            bsh = pltpu.roll(pltpu.roll(yp32, half, axis=2),
                             n_cols - 1, axis=1)
            piece = jnp.where((lane - off) % hw < half, a, bsh)
            if ysh is None:
                ysh = piece
            else:
                ysh = jnp.where((lane >= off) & (lane < off + hw), piece, ysh)
            off += hw
        ysh = ysh.astype(ypad.dtype)
        for dr in range(3):
            for s in range(2):
                blk = jax.lax.slice(ysh, (dr, s, 0), (dr + r, s + wdt, c1))
                blk = blk.reshape(r * wdt, c1)
                wk = w_ref[pl.ds((dr * 2 + s) * c, c1), :]
                acc = acc + jax.lax.dot_general(
                    blk, wk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
    else:
        for dr in range(3):
            for dw in range(3):
                blk = jax.lax.slice(ypad, (dr, dw, 0), (dr + r, dw + wdt, c1))
                blk = blk.reshape(r * wdt, c1)
                wk = w_ref[pl.ds((dr * 3 + dw) * c, c1), :]
                acc = acc + jax.lax.dot_general(
                    blk, wk, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if dual:
                    blk2 = jax.lax.slice(ypad2, (dr, dw, 0),
                                         (dr + r, dw + wdt, c2))
                    blk2 = blk2.reshape(r * wdt, c2)
                    wk2 = w_ref[pl.ds((dr * 3 + dw) * c + c1, c2), :]
                    acc = acc + jax.lax.dot_general(
                        blk2, wk2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
    if res_mode == "identity":
        acc = acc + res_ref[0].astype(jnp.float32).reshape(r * wdt, o)
    elif res_mode == "identity_up":
        # the up block's identity skip rides in as a half-ROW tile (width
        # pre-repeated in XLA — Mosaic rejects the sublane interleave) and
        # is row-upsampled in VMEM: the fully-upsampled skip never exists
        res_up = jnp.repeat(res_ref[0].astype(jnp.float32), 2, axis=0)
        acc = acc + res_up.reshape(r * wdt, o)
    elif res_mode == "proj":
        cr = res_ref.shape[-1]
        acc = acc + jax.lax.dot_general(
            res_ref[0].reshape(r * wdt, cr), skw_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + skb_ref[:].astype(jnp.float32)
    elif res_mode == "proj2":
        cr1, cr2 = res_ref.shape[-1], res2_ref.shape[-1]
        acc = (acc + jax.lax.dot_general(
            res_ref[0].reshape(r * wdt, cr1), skw_ref[pl.ds(0, cr1), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            + jax.lax.dot_general(
            res2_ref[0].reshape(r * wdt, cr2), skw_ref[pl.ds(cr1, cr2), :],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
            + skb_ref[:].astype(jnp.float32))
    out_ref[0] = acc.reshape(r, wdt, o).astype(out_ref.dtype)
    if emit_stats:
        @pl.when(t == 0)
        def _():
            osums_ref[pl.ds(b, 1), :] = jnp.zeros_like(
                osums_ref[pl.ds(b, 1), :])
            osumsq_ref[pl.ds(b, 1), :] = jnp.zeros_like(
                osumsq_ref[pl.ds(b, 1), :])

        osums_ref[pl.ds(b, 1), :] += jnp.sum(acc, axis=0, keepdims=True)
        osumsq_ref[pl.ds(b, 1), :] += jnp.sum(acc * acc, axis=0,
                                              keepdims=True)


def _halo_rows(x, r):
    """Thin halo-row arrays (B, n_tiles, W, C): tile t's top halo is the
    last row of tile t-1 (x row t*R-1 = x_prev[t-1]); its bottom halo is the
    first row of tile t+1 (x row (t+1)*R = x_next[t+1]). Fetching these as
    1-row blocks costs 2*(H/R) rows of extra HBM traffic instead of the
    2 full input passes whole-tile halo fetches would incur."""
    return x[:, r - 1::r], x[:, ::r]


def _pallas_gnsc(x, gamma, beta, w, bias, num_groups, eps,
                 x2=None, residual=None, residual2=None,
                 skip_w=None, skip_b=None, res_mode="none",
                 emit_stats=False, stats=None,
                 gmat_arr=None, n_full=None, res_pre_up=False,
                 act=True, sh_halves=None):
    """x2: second half of an unmaterialized channel concat — gamma/beta/
    stats/w are for the combined (C1+C2) input. residual2: second half of an
    unmaterialized concat residual (res_mode='proj2').

    gmat_arr/n_full/res_pre_up: paired-lane plumbing (_pallas_gnsc_paired) —
    a caller-supplied group-combine matrix (block-diag of the unpaired one),
    the TRUE per-channel pixel count (h*wdt undercounts by 2x in the paired
    layout), and 'identity_up residual already width-matched' (the paired
    layout's channel-concat replaces the XLA W-repeat)."""
    b, h, wdt, c1 = x.shape
    c = c1 + (x2.shape[-1] if x2 is not None else 0)
    o = w.shape[-1]
    n = n_full if n_full is not None else h * wdt
    # paired strips are half-width: whole-image row tiles fit Mosaic's
    # scoped-VMEM ceiling and measured fastest (R=128 1.026x over R=64 on
    # the 50-step sampler); unpaired whole-image strips were rejected
    # on-device, so 128 stays paired-only
    cands = (128, 64, 32, 16, 8) if n_full is not None else (64, 32, 16, 8)
    r = _row_tile(h, x.dtype, wdt=wdt, c=max(c, o), cands=cands)
    n_tiles = h // r
    npix = h * wdt
    if not act:
        # linear mode: the norm constants are dead kernel inputs
        zv = jnp.zeros((b, c), jnp.float32)
        sums = sumsq = zv
        gamma = beta = zv
        stats = (sums, sumsq)
    if stats is not None:
        # chained from the producing kernel's emit_stats — no stats pass
        sums, sumsq = stats
    else:
        tile = _tile_rows(npix)  # guaranteed by _use_pallas
        if x2 is None:
            sums, sumsq = _compute_stats(x.reshape(b, npix, c), tile)
        else:
            s1, ss1 = _compute_stats(x.reshape(b, npix, c1), tile)
            s2, ss2 = _compute_stats(x2.reshape(b, npix, c - c1), tile)
            sums = jnp.concatenate([s1, s2], axis=-1)
            sumsq = jnp.concatenate([ss1, ss2], axis=-1)
    gmat = (gmat_arr if gmat_arr is not None
            else jnp.asarray(_group_matrix(num_groups, c)))
    # weights in the network dtype — the kernel's matmuls run at native MXU
    # rate for bf16 (fp32 nets keep fp32 weights and fp32 dots)
    n_taps = 6 if sh_halves else 9
    w2 = w.astype(x.dtype).reshape(n_taps * c, o)  # (dr, tap, C, O) row-major
    bias2 = (bias if bias is not None
             else jnp.zeros((o,))).astype(jnp.float32).reshape(1, o)

    def x_spec(ci):
        return pl.BlockSpec((1, r, wdt, ci), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)

    def halo_specs(ci):
        return (pl.BlockSpec((1, 1, wdt, ci),
                             lambda i, t: (i, jnp.maximum(t - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, wdt, ci),
                             lambda i, t: (i, jnp.minimum(t + 1, n_tiles - 1),
                                           0, 0),
                             memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((1, r, wdt, o), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((b, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((c, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((n_taps * c, o), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, o), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM)
    hp1, hn1 = halo_specs(c1)
    x_prev, x_next = _halo_rows(x, r)
    in_specs = [hp1, x_spec(c1), hn1]
    inputs = [x_prev, x, x_next]
    if x2 is not None:
        hp2, hn2 = halo_specs(c - c1)
        x2_prev, x2_next = _halo_rows(x2, r)
        in_specs += [hp2, x_spec(c - c1), hn2]
        inputs += [x2_prev, x2, x2_next]
    in_specs += [vec_spec, vec_spec, vec_spec, vec_spec, mat_spec, w_spec,
                 bias_spec]
    inputs += [gamma, beta, sums, sumsq, gmat, w2, bias2]
    if res_mode == "identity_up":
        # width pre-repeated in XLA (half-res cost); rows repeat in-kernel.
        # In the paired layout the caller's channel-concat IS the W repeat.
        in_specs.append(pl.BlockSpec(
            (1, r // 2, wdt, residual.shape[-1]),
            lambda i, t: (i, t, 0, 0), memory_space=pltpu.VMEM))
        inputs.append(residual if res_pre_up
                      else jnp.repeat(residual, 2, axis=2))
    elif res_mode != "none":
        in_specs.append(x_spec(residual.shape[-1]))
        inputs.append(residual)
    if res_mode == "proj2":
        in_specs.append(x_spec(residual2.shape[-1]))
        inputs.append(residual2)
    if res_mode in ("proj", "proj2"):
        crs = residual.shape[-1] + (residual2.shape[-1]
                                    if res_mode == "proj2" else 0)
        in_specs += [pl.BlockSpec((crs, o), lambda i, t: (0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((1, o), lambda i, t: (0, 0),
                                  memory_space=pltpu.VMEM)]
        skb2 = (skip_b if skip_b is not None
                else jnp.zeros((o,))).astype(jnp.float32).reshape(1, o)
        inputs += [skip_w.astype(x.dtype), skb2]
    out_specs = out_spec
    out_shape = jax.ShapeDtypeStruct((b, h, wdt, o), x.dtype)
    if emit_stats:
        ovec_spec = pl.BlockSpec((b, o), lambda i, t: (0, 0),
                                 memory_space=pltpu.VMEM)
        out_specs = [out_spec, ovec_spec, ovec_spec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, o), jnp.float32),
                     jax.ShapeDtypeStruct((b, o), jnp.float32)]
    cp = _compiler_params(r, wdt, c)
    ledger.track(2 * n_taps * b * h * wdt * c * o
                 + (2 * b * h * wdt * crs * o
                    if res_mode in ("proj", "proj2") else 0),
                 inputs, out_shape)
    return pl.pallas_call(
        functools.partial(_gnsc_kernel, n=n, eps=eps, n_tiles=n_tiles,
                          res_mode=res_mode, emit_stats=emit_stats,
                          dual=x2 is not None, act=act,
                          sh_halves=tuple(sh_halves or ())),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **({"compiler_params": cp} if cp else {}),
    )(*inputs)


# ---------------------------------------------------------------------------
# Paired-lane layout: bitcast (W, C) -> (W/2, 2C)
# ---------------------------------------------------------------------------
#
# The flagship's C=64 channels fill only HALF of the TPU's 128-lane vector
# registers, so every VPU op and in-VMEM copy in the kernels runs at 50%
# lane efficiency and the 9 tap matmuls run K=64/N=64 (<=25% MXU tiles) —
# exactly the "per-step VPU work + in-VMEM copies" floor the round-3 profile
# identified. Pairing two adjacent W pixels into the channel axis is FREE in
# XLA ((W, C) row-major == (W/2, 2C) row-major, a pure bitcast) and turns
# the same kernel into full-lane VPU work with K=128/N=128 matmuls. The conv
# becomes a 3-tap stencil over pixel PAIRS with a block-structured
# (3, 3, 2C, 2O) weight matrix (half structurally zero — 2x padded FLOPs at
# 4x better MXU tiling). GroupNorm statistics stay per ORIGINAL channel:
# the paired stats fold their two parity halves and ride in duplicated, with
# a block-diagonal group-combine matrix.


def pair_enabled() -> bool:
    """MCEDM_PAIR gates the paired-lane layout (default ON — measured
    same-session on the 50-step Heun sampler, B=16 res128 bf16: base
    1031.1 -> 888.2 ms paired -> 865.9 ms paired + whole-image row tiles
    (1.191x, 18.48 samples/s); train step 68.7 -> 67.3 ms with the paired
    phase-A backward; loss bit-identical across modes. MCEDM_PAIR=0
    restores the unpaired round-3 path)."""
    import os

    return os.environ.get("MCEDM_PAIR", "1") != "0"


def _pair_width_ok(x) -> bool:
    # paired width must still satisfy the kernels' lane-dim constraints
    return x.shape[2] % 16 == 0 and (x.shape[2] // 2) >= 8


def _use_pair(x, has_x2: bool, res_mode: str) -> bool:
    """Single-input paired gate (dual inputs route via _use_pair_dual)."""
    if not pair_enabled() or has_x2 or res_mode == "proj2":
        return False
    return _pair_width_ok(x)


def _use_pair_dual(x, x2, num_groups: int) -> bool:
    """Paired dual-input gate: both halves must be lane-tileable and the
    GroupNorm group boundary must not straddle the concat (ADM's
    4-channels-per-group minimum guarantees this for the decoder concats,
    but check anyway)."""
    if not pair_enabled() or not _pair_width_ok(x):
        return False
    c1, c2 = x.shape[-1], x2.shape[-1]
    per = (c1 + c2) // num_groups
    return c1 % 8 == 0 and c2 % 8 == 0 and per > 0 and c1 % per == 0


def _pair_vec(v):
    """(B, C) -> (B, 2C): per-channel vectors duplicated for both parities."""
    return jnp.concatenate([v, v], axis=-1)


def _pair_weights(w):
    """(3, 3, C, O) -> (3, 3, 2C, 2O) paired-lane conv weights.

    Output pair channel q*O+o at pair j contracts input pair channel p*C+c
    of pair j+dj-1 with w[dr, dw, c, o] where dw = 2*(dj-1) + p - q + 1;
    entries whose dw falls outside the 3-tap stencil are zero (half the
    paired matrix — the 2x FLOP padding buys full-K/N MXU tiles)."""
    c, o = w.shape[2], w.shape[3]
    z = jnp.zeros((c, o), w.dtype)
    rows = []
    for dr in range(3):
        cols = []
        for dj in range(3):
            blocks = []
            for p in range(2):
                qcols = []
                for q in range(2):
                    dw = 2 * (dj - 1) + p - q + 1
                    qcols.append(w[dr, dw] if 0 <= dw < 3 else z)
                blocks.append(jnp.concatenate(qcols, axis=-1))
            cols.append(jnp.concatenate(blocks, axis=0))
        rows.append(jnp.stack(cols))
    return jnp.stack(rows)


def shifted_pair_enabled() -> bool:
    """MCEDM_SHPAIR gates the shifted-pair tap layout for paired convs
    (plain and dual-order): the classic paired tap matrix runs 9 (2C, 2O) matmuls of
    which half the blocks are structural zeros (2x executed flops); pairing
    the stencil against a one-PIXEL-shifted view of the strip (ysh_j =
    [x_{2j+1}, x_{2j+2}] — a lane-half swap + column shift built once per
    tile in VMEM) covers the same 6 algorithmic blocks with 6 full (2C, 2O)
    matmuls (3/4 dense, 1.33x padding): 33% less executed MXU work per conv.
    Default ON: same-session 50-step Heun A/B (B=16 res128 bf16, TPU v5e)
    measured 607.3 -> 587.6 ms (1.034x) — the round-3 "densifying is
    likely a wash" prediction was wrong. The shifted strip is built with
    fp32 lane/sublane rotates + an iota select (Mosaic rejects concats of
    offset-mismatched slices and non-32-bit rotates). MCEDM_SHPAIR=0
    reverts."""
    import os

    return os.environ.get("MCEDM_SHPAIR", "1") != "0"


def _pair_weights_shifted_split(w, splits):
    """Shifted-pair tap blocks for a dual-order layout: per-half shifted
    blocks stacked along the rows ([x1 2C1 rows; x2 2C2 rows] — matching
    the kernel's per-half [p1(s), p0(s+1)] shifted-strip lane order)."""
    if splits is None:
        return _pair_weights_shifted(w)
    c1, _ = splits
    return jnp.concatenate([_pair_weights_shifted(w[:, :, :c1, :]),
                            _pair_weights_shifted(w[:, :, c1:, :])], axis=2)


def _pair_weights_shifted(w):
    """(3, 3, C, O) -> (3, 2, 2C, 2O) shifted-pair tap blocks.

    Output pair j = pixels (2j, 2j+1); shifted input pair ysh_s =
    [x_{2s+1}, x_{2s+2}]. Out pixel 2j needs x_{2j-1} w0 + x_{2j} w1 +
    x_{2j+1} w2 and pixel 2j+1 needs x_{2j} w0 + x_{2j+1} w1 + x_{2j+2} w2,
    so with rows [p0; p1] and cols [q0 | q1]:
      tap A (ysh_{j-1}): [[w0, 0], [w1, w0]]
      tap B (ysh_j):     [[w2, w1], [0, w2]]
    — every x pixel is covered by exactly these two taps (the center w1
    contributions ride in the shifted taps)."""
    c, o = w.shape[2], w.shape[3]
    z = jnp.zeros((c, o), w.dtype)
    rows = []
    for dr in range(3):
        w0, w1, w2_ = w[dr, 0], w[dr, 1], w[dr, 2]
        tap_a = jnp.concatenate([jnp.concatenate([w0, z], axis=-1),
                                 jnp.concatenate([w1, w0], axis=-1)], axis=0)
        tap_b = jnp.concatenate([jnp.concatenate([w2_, w1], axis=-1),
                                 jnp.concatenate([z, w2_], axis=-1)], axis=0)
        rows.append(jnp.stack([tap_a, tap_b]))
    return jnp.stack(rows)


def up_dense_enabled() -> bool:
    """MCEDM_UPDENSE gates dense up-conv taps in the paired up kernel
    (_gnsc_up_pair_kernel): the classic form duplicates the low-res lanes
    ([y, y]) and runs 9 (2C, 2O) taps against the duplicated strip; but
    since both W-parities of high pair j read low pixel j, the duplication
    folds into the WEIGHTS — 9 (C, 2O) taps against the unduplicated strip
    compute the identical conv with HALF the executed MXU work (and half
    the strip VMEM). Default OFF: the same-session 50-step Heun A/B (B=16
    res128 bf16, TPU v5e) measured 568.3 -> 580.2 ms (0.980x) — the up
    kernels are stream/VPU-bound, not MXU-bound, so halving K buys nothing
    and the narrower strip perturbs the tile layout for the worse.
    Interpret-mode parity incl. gradients is pinned by
    tests/test_pallas.py::TestUpDense; MCEDM_UPDENSE=1 re-enables for
    re-measurement."""
    import os

    return os.environ.get("MCEDM_UPDENSE", "0") == "1"


def _up_pair_weights_dense(w):
    """(3, 3, C, O) -> (3, 3, C, 2O) dense up-conv taps.

    High-res output pair j = (y(2j), y(2j+1)) of the 3x3 conv over the
    W-nearest-upsampled image: y(2j) = w0 lo(j-1) + (w1+w2) lo(j),
    y(2j+1) = (w0+w1) lo(j) + w2 lo(j+1). With the zero-padded low-res
    strip (column u holds lo(u-1)), tap dj contracts lo(j+dj-1):
      dj=0: [w0 | 0],  dj=1: [w1+w2 | w0+w1],  dj=2: [0 | w2].
    The H-axis upsampling stays a row repeat (rows are the matmul M axis,
    inherent to the output size)."""
    z = jnp.zeros_like(w[0, 0])
    rows = []
    for dr in range(3):
        w0, w1, w2_ = w[dr, 0], w[dr, 1], w[dr, 2]
        rows.append(jnp.stack([
            jnp.concatenate([w0, z], axis=-1),
            jnp.concatenate([w1 + w2_, w0 + w1], axis=-1),
            jnp.concatenate([z, w2_], axis=-1)]))
    return jnp.stack(rows)


def _pair_skip(skw):
    """(Cr, O) -> (2Cr, 2O) block-diagonal 1x1-projection weights (parity
    is preserved by a 1x1 conv)."""
    z = jnp.zeros_like(skw)
    return jnp.concatenate([jnp.concatenate([skw, z], axis=-1),
                            jnp.concatenate([z, skw], axis=-1)], axis=0)


def _pair_gmat(num_groups: int, c: int) -> np.ndarray:
    """Block-diagonal group-combine for duplicated per-channel sums."""
    g = _group_matrix(num_groups, c)
    out = np.zeros((2 * c, 2 * c), np.float32)
    out[:c, :c] = g
    out[c:, c:] = g
    return out


def _paired_stats(x):
    """Per-ORIGINAL-channel (sums, sumsq) computed through the paired layout
    (full-lane stats pass), folded back to (B, C). Falls back to the
    unpaired pass when the paired row count does not tile."""
    b, h, wdt, c = x.shape
    tile = _tile_rows(h * wdt // 2)
    if tile is not None:
        xp = x.reshape(b, h * wdt // 2, 2 * c)
        sp, ssp = _compute_stats(xp, tile)
        return sp[:, :c] + sp[:, c:], ssp[:, :c] + ssp[:, c:]
    return _compute_stats(x.reshape(b, h * wdt, c), _tile_rows(h * wdt))


# --- paired-IO (threading) helpers: dual-order channel layouts -------------
#
# Under MCEDM_PAIRIO the net threads paired activations END-TO-END, so the
# decoder's skip concat happens on paired halves: the channel order becomes
# [x1_p0, x1_p1, x2_p0, x2_p1] ("dual-order", described by splits=(c1, c2)).
# All constants absorb the order: per-half paired weights stacked per tap,
# per-half duplicated vectors, block_diag(g1, g1, g2, g2) group matrix.


def _stats4_kernel(x_ref, sums_ref, sumsq_ref):
    b, t = pl.program_id(0), pl.program_id(1)
    r, w2, c2 = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    x = x_ref[0].astype(jnp.float32).reshape(r * w2, c2)

    @pl.when(t == 0)
    def _():
        sums_ref[pl.ds(b, 1), :] = jnp.zeros_like(sums_ref[pl.ds(b, 1), :])
        sumsq_ref[pl.ds(b, 1), :] = jnp.zeros_like(sumsq_ref[pl.ds(b, 1), :])

    sums_ref[pl.ds(b, 1), :] += jnp.sum(x, axis=0, keepdims=True)
    sumsq_ref[pl.ds(b, 1), :] += jnp.sum(x * x, axis=0, keepdims=True)


def _compute_stats_4d(xp):
    """Per-PAIRED-channel (B, C2) sums/sumsq of a (B, H, W2, C2) activation.
    The 3D stats kernel's (B, N, C) input would cost a flatten RELAYOUT on
    TPU (the (8,128)-tiled layouts of (H, W2, C2) and (N, C2) differ); this
    kernel reads the 4D tensor in place."""
    b, h, w2, c2 = xp.shape
    r = _row_tile(h, xp.dtype, wdt=w2, c=c2)
    x_spec = pl.BlockSpec((1, r, w2, c2), lambda i, t: (i, t, 0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((b, c2), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((b, c2), jnp.float32)] * 2
    ledger.track(0, xp, out_shape)
    return pl.pallas_call(
        _stats4_kernel, grid=(b, h // r),
        in_specs=[x_spec], out_specs=[vec_spec] * 2,
        out_shape=out_shape,
        compiler_params=_compiler_params(r, w2, c2))(xp)


def _fold_stats(sp, splits):
    """Paired per-parity (B, 2C) sums -> per-original-channel (B, C);
    splits=(c1, c2) folds a dual-order layout's halves independently."""
    if splits is None:
        c = sp.shape[-1] // 2
        return sp[:, :c] + sp[:, c:]
    c1, c2 = splits
    return jnp.concatenate([sp[:, :c1] + sp[:, c1:2 * c1],
                            sp[:, 2 * c1:2 * c1 + c2] + sp[:, 2 * c1 + c2:]],
                           -1)


def _dual_vec(v, splits):
    """Per-original-channel (B, C) -> paired (dual-order) (B, 2C)."""
    if splits is None:
        return _pair_vec(v)
    c1 = splits[0]
    return jnp.concatenate([_pair_vec(v[:, :c1]), _pair_vec(v[:, c1:])], -1)


def _pair_weights_split(w, splits):
    if splits is None:
        return _pair_weights(w)
    c1 = splits[0]
    return jnp.concatenate([_pair_weights(w[:, :, :c1, :]),
                            _pair_weights(w[:, :, c1:, :])], axis=2)


def _pair_skip_split(skw, splits):
    if splits is None:
        return _pair_skip(skw)
    c1 = splits[0]
    return jnp.concatenate([_pair_skip(skw[:c1]), _pair_skip(skw[c1:])],
                           axis=0)


def _pair_gmat_split(num_groups: int, c: int, splits) -> np.ndarray:
    g = _group_matrix(num_groups, c)
    out = np.zeros((2 * c, 2 * c), np.float32)
    if splits is None:
        out[:c, :c] = g
        out[c:, c:] = g
        return out
    c1, c2 = splits
    out[:c1, :c1] = g[:c1, :c1]
    out[c1:2 * c1, c1:2 * c1] = g[:c1, :c1]
    out[2 * c1:2 * c1 + c2, 2 * c1:2 * c1 + c2] = g[c1:, c1:]
    out[2 * c1 + c2:, 2 * c1 + c2:] = g[c1:, c1:]
    return out


def _fold_dw(dw_p9, c, o, splits):
    """Paired tap-weight gradients (9*2C, 2O) -> (3, 3, C, O): each original
    tap (dr, dw) sums its two (dj, p, q) slots (see _pair_weights)."""
    slots = {0: [(0, 1, 0), (1, 0, 1)],
             1: [(1, 0, 0), (1, 1, 1)],
             2: [(1, 1, 0), (2, 0, 1)]}

    def fold(dw_p):
        # dw_p: (3, 3, 2, ci, 2, o) = (dr, dj, p, ci, q, o)
        return jnp.stack([
            jnp.stack([sum(dw_p[dr, dj, p, :, q, :]
                           for dj, p, q in slots[dwi]) for dwi in range(3)])
            for dr in range(3)])

    if splits is None:
        return fold(dw_p9.reshape(3, 3, 2, c, 2, o))
    c1, c2 = splits
    per_tap = dw_p9.reshape(9, 2 * c, 2 * o)
    d1 = fold(per_tap[:, :2 * c1].reshape(3, 3, 2, c1, 2, o))
    d2 = fold(per_tap[:, 2 * c1:].reshape(3, 3, 2, c2, 2, o))
    return jnp.concatenate([d1, d2], axis=2)


def unpair_array(xp, splits=None):
    """(B, H, W2, 2C) paired [dual-order when splits] -> (B, H, W, C)."""
    b, h, w2, c2 = xp.shape
    if splits is None:
        return xp.reshape(b, h, w2 * 2, c2 // 2)
    c1, c2_ = splits
    return jnp.concatenate(
        [xp[..., :2 * c1].reshape(b, h, 2 * w2, c1),
         xp[..., 2 * c1:].reshape(b, h, 2 * w2, c2_)], -1)


def pair_array(x, splits=None):
    """(B, H, W, C) -> paired (B, H, W/2, 2C) [dual-order when splits]."""
    b, h, w, c = x.shape
    if splits is None:
        return x.reshape(b, h, w // 2, 2 * c)
    c1, c2 = splits
    return jnp.concatenate(
        [x[..., :c1].reshape(b, h, w // 2, 2 * c1),
         x[..., c1:].reshape(b, h, w // 2, 2 * c2)], -1)


def paired_out_conv(yp, w, bias):
    """conv3x3_same(unpair(yp)) computed WITHOUT unpairing: the unpair
    bitcast is not free at the (8,128)-tiled layout (two relayout copies
    of the full activation in the optimized HLO), so run the conv in
    paired space with a (3, 3, 2C, 2O) block tap matrix — output parity p
    taps paired cols {w2-1, w2} (p=0) / {w2, w2+1} (p=1), input parity q
    is the channel half — and unpair the (B, H, W/2, 2O) result instead
    (tiny when O is the net's out_ch). Exact same 9*C terms per output,
    different accumulation order. Used by both U-Net out heads
    (MCEDM_OUTPAIR / the DDPM pairio out head)."""
    o = w.shape[-1]
    w = w.astype(yp.dtype)
    z = jnp.zeros_like(w[:, :1])  # (3, 1, C, O)
    zz = jnp.concatenate([z, z], axis=2)  # (3, 1, 2C, O)
    # j=0 (col w2-1): p=0 <- dx=-1 on q=1
    t_j0 = jnp.concatenate(
        [jnp.concatenate([z, w[:, 0:1]], axis=2), zz], axis=3)
    # j=1 (col w2): p=0 <- dx=0 (q=0), dx=+1 (q=1);
    #               p=1 <- dx=-1 (q=0), dx=0 (q=1)
    t_j1 = jnp.concatenate(
        [jnp.concatenate([w[:, 1:2], w[:, 2:3]], axis=2),
         jnp.concatenate([w[:, 0:1], w[:, 1:2]], axis=2)], axis=3)
    # j=2 (col w2+1): p=1 <- dx=+1 on q=0
    t_j2 = jnp.concatenate(
        [zz, jnp.concatenate([w[:, 2:3], z], axis=2)], axis=3)
    taps = jnp.concatenate([t_j0, t_j1, t_j2], axis=1)
    y = jax.lax.conv_general_dilated(
        yp, taps, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        y = y + jnp.concatenate([bias, bias]).astype(y.dtype)
    b, h, w2, _ = y.shape
    return y.reshape(b, h, w2 * 2, o)


def _pallas_gnsc_paired(x, gamma, beta, w, bias, num_groups, eps,
                        x2=None, residual=None, residual2=None,
                        skip_w=None, skip_b=None,
                        res_mode="none", emit_stats=False, stats=None):
    """The paired-lane front end of _pallas_gnsc: bitcast inputs/outputs,
    paired weights/vectors, block-diag group matrix. `stats` are UNPAIRED
    (B, C) channel statistics (chained or precomputed); emitted stats fold
    back to (B, O).

    Dual (x2 given): each half pairs independently — per-half paired
    weights stacked per tap, per-half duplicated vectors, and a
    block_diag(g1, g1, g2, g2) group matrix (groups must not straddle the
    concat boundary — gated by _use_pair_dual)."""
    b, h, wdt, c1 = x.shape
    c2 = x2.shape[-1] if x2 is not None else 0
    c = c1 + c2
    o = w.shape[-1]
    w2 = wdt // 2
    xp = x.reshape(b, h, w2, 2 * c1)
    x2p = x2.reshape(b, h, w2, 2 * c2) if x2 is not None else None

    if x2 is None:
        if stats is None:
            stats = _paired_stats(x)
        stats_p = (_pair_vec(stats[0]), _pair_vec(stats[1]))
        sh = (2 * c,) if shifted_pair_enabled() else None
        w_p = _pair_weights_shifted(w) if sh else _pair_weights(w)
        gamma_p, beta_p = _pair_vec(gamma), _pair_vec(beta)
        gmat_p = jnp.asarray(_pair_gmat(num_groups, c))
        skw_p = _pair_skip(skip_w) if skip_w is not None else None
    else:
        if stats is None:
            s1 = _paired_stats(x)
            s2 = _paired_stats(x2)
            stats = (jnp.concatenate([s1[0], s2[0]], -1),
                     jnp.concatenate([s1[1], s2[1]], -1))

        def dual_vec(v):
            return jnp.concatenate([_pair_vec(v[:, :c1]),
                                    _pair_vec(v[:, c1:])], -1)

        stats_p = (dual_vec(stats[0]), dual_vec(stats[1]))
        gamma_p, beta_p = dual_vec(gamma), dual_vec(beta)
        sh = None  # dual two-tensor inputs keep the classic taps
        # per-half paired tap weights stacked per tap (the dual kernel
        # contracts the first 2C1 rows against x1 and the rest against x2)
        w_p = jnp.concatenate([_pair_weights(w[:, :, :c1, :]),
                               _pair_weights(w[:, :, c1:, :])], axis=2)
        # groups never straddle the boundary, so the combined group matrix
        # splits cleanly into per-half blocks
        g_full = _group_matrix(num_groups, c)
        gmat_np = np.zeros((2 * c, 2 * c), np.float32)
        gmat_np[:c1, :c1] = g_full[:c1, :c1]
        gmat_np[c1:2 * c1, c1:2 * c1] = g_full[:c1, :c1]
        gmat_np[2 * c1:2 * c1 + c2, 2 * c1:2 * c1 + c2] = g_full[c1:, c1:]
        gmat_np[2 * c1 + c2:, 2 * c1 + c2:] = g_full[c1:, c1:]
        gmat_p = jnp.asarray(gmat_np)
        if skip_w is not None:
            cr1 = residual.shape[-1]
            skw_p = jnp.concatenate([_pair_skip(skip_w[:cr1]),
                                     _pair_skip(skip_w[cr1:])], axis=0)
        else:
            skw_p = None

    kw = {}
    res_p = res2_p = None
    if res_mode == "identity":
        res_p = residual.reshape(b, h, w2, 2 * o)
    elif res_mode == "identity_up":
        # half-res skip: channel-concat IS the paired W-repeat (out pixel
        # 2j+q reads res[.., j, :] for both q) — no XLA repeat at all
        res_p = jnp.concatenate([residual, residual], axis=-1)
        kw["res_pre_up"] = True
    elif res_mode == "proj":
        res_p = residual.reshape(b, h, w2, 2 * residual.shape[-1])
    elif res_mode == "proj2":
        res_p = residual.reshape(b, h, w2, 2 * residual.shape[-1])
        res2_p = residual2.reshape(b, h, w2, 2 * residual2.shape[-1])
    out = _pallas_gnsc(
        xp, gamma_p, beta_p, w_p,
        (jnp.concatenate([bias, bias]) if bias is not None else None),
        num_groups, eps, x2=x2p,
        residual=res_p, residual2=res2_p,
        skip_w=skw_p,
        skip_b=(jnp.concatenate([skip_b, skip_b])
                if skip_b is not None else None),
        res_mode=res_mode, emit_stats=emit_stats,
        stats=stats_p,
        gmat_arr=gmat_p,
        n_full=h * wdt, sh_halves=sh, **kw)
    if emit_stats:
        outp, osums, osumsq = out
        return [outp.reshape(b, h, wdt, o),
                osums[:, :o] + osums[:, o:], osumsq[:, :o] + osumsq[:, o:]]
    return out.reshape(b, h, wdt, o)


# ---------------------------------------------------------------------------
# Fused norm + SiLU + nearest-upsample-2x + conv3x3 (the up-block prefix)
# ---------------------------------------------------------------------------
#
# The decoder's up blocks run conv0 as conv3x3(upsample2x(silu(gn(x))))
# (adm_blocks.py:158-161 with up=True; layers.py upsample2x_nearest). In XLA
# that materializes the 4x upsampled activation in HBM (broadcast write +
# full-res read). This kernel normalizes the LOW-res strip (silu∘gn commutes
# with nearest upsampling exactly), duplicates rows/columns in VMEM —
# sublane repeats, which this Mosaic accepts, unlike the lane-repacking
# reshapes an in-kernel *interleave* would need — and convolves at high res
# in place: read x (low res), write out (high res); the upsampled tensor
# never exists in HBM.


def gn_silu_up_conv_reference(x, gamma, beta, w, bias, num_groups: int,
                              eps: float = 1e-5):
    """conv3x3_same(upsample2x_nearest(silu(gn(x)*gamma+beta))) + bias."""
    b, h, wdt, c = x.shape
    y = group_norm_silu_reference(x.reshape(b, h * wdt, c), gamma, beta,
                                  num_groups, eps)
    y = y.reshape(b, h, wdt, c).astype(x.dtype)
    y = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)
    out = jax.lax.conv_general_dilated(
        y, w.astype(y.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def _gnsc_up_kernel(xp_ref, xc_ref, xn_ref, gamma_ref, beta_ref, sums_ref,
                    sumsq_ref, gmat_ref, w_ref, bias_ref, out_ref,
                    *, n: int, eps: float, n_tiles: int):
    """Grid (B, H/R) over row tiles of the WIDTH-pre-upsampled input
    (B, H, 2W, C); each step writes a (2R, 2W, O) high-res output tile.
    High-res rows [2tR-1, 2tR+2R] map to input rows [tR-1, tR+R]
    (j -> j//2), so the halo structure is identical to the standard
    kernel's. The ROW interleave happens in VMEM via an axis-0 repeat (the
    untiled axis — allowed); the WIDTH interleave cannot (Mosaic rejects
    sublane-interleaving reshapes: vector<...> -> unit-dim-inserting shape
    casts), so the caller pre-repeats W in XLA at half-res cost."""
    b, t = pl.program_id(0), pl.program_id(1)
    r, w2, c = xc_ref.shape[1], xc_ref.shape[2], xc_ref.shape[3]
    o = out_ref.shape[-1]
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    gamma = (gamma_ref[pl.ds(b, 1), :] * rstd).reshape(1, 1, c)
    beta = (beta_ref[pl.ds(b, 1), :]
            - gamma_ref[pl.ds(b, 1), :] * rstd * mean).reshape(1, 1, c)
    top_live = (t > 0).astype(jnp.float32)
    bot_live = (t < n_tiles - 1).astype(jnp.float32)
    mm_dtype = xc_ref.dtype

    def ns(v, live=None):
        y = v.astype(jnp.float32) * gamma + beta
        y = y * jax.nn.sigmoid(y)
        if live is not None:
            # off-image halo rows contribute zeros (SAME padding applies to
            # the upsampled activation's edges)
            y = y * live
        return y.astype(mm_dtype)

    # row-upsample in VMEM: high-res padded rows [2tR-1, 2tR+2R] = 1 halo
    # row (2nd copy of input row tR-1) + 2x row-repeated mid + 1 halo row
    # (1st copy of input row tR+R)
    mid_up = jnp.repeat(ns(xc_ref[0]), 2, axis=0)
    ypad = jnp.concatenate([ns(xp_ref[0], top_live), mid_up,
                            ns(xn_ref[0], bot_live)], axis=0)
    zcol = jnp.zeros((2 * r + 2, 1, c), mm_dtype)
    ypad = jnp.concatenate([zcol, ypad, zcol], axis=1)  # (2R+2, 2W+2, C)

    r2 = 2 * r
    acc = jnp.broadcast_to(bias_ref[:].astype(jnp.float32), (r2 * w2, o))
    for dr in range(3):
        for dwi in range(3):
            blk = jax.lax.slice(ypad, (dr, dwi, 0), (dr + r2, dwi + w2, c))
            acc = acc + jax.lax.dot_general(
                blk.reshape(r2 * w2, c), w_ref[pl.ds((dr * 3 + dwi) * c, c), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(r2, w2, o).astype(out_ref.dtype)


def _pallas_gnsc_up(x, gamma, beta, w, bias, num_groups, eps, stats=None):
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    n = h * wdt
    # the up kernel's strips are width-doubled (W pre-upsampled in XLA)
    r = _row_tile(h, x.dtype, wdt=2 * wdt, c=max(c, o))
    n_tiles = h // r
    if stats is not None:
        sums, sumsq = stats
    else:
        # stats over the LOW-res input (column duplication preserves the
        # per-channel mean/var, so low-res stats are the upsampled stats)
        sums, sumsq = _compute_stats(x.reshape(b, n, c), _tile_rows(n))
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    w2 = w.astype(x.dtype).reshape(9 * c, o)
    bias2 = (bias if bias is not None
             else jnp.zeros((o,))).astype(jnp.float32).reshape(1, o)
    # WIDTH is pre-upsampled in XLA at half-res cost (Mosaic rejects the
    # in-kernel sublane interleave); rows interleave inside the kernel
    xw = jnp.repeat(x, 2, axis=2)
    x_prev, x_next = _halo_rows(xw, r)
    w2dt = 2 * wdt

    x_spec = pl.BlockSpec((1, r, w2dt, c), lambda i, t: (i, t, 0, 0),
                          memory_space=pltpu.VMEM)
    hp = pl.BlockSpec((1, 1, w2dt, c),
                      lambda i, t: (i, jnp.maximum(t - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hn = pl.BlockSpec((1, 1, w2dt, c),
                      lambda i, t: (i, jnp.minimum(t + 1, n_tiles - 1), 0, 0),
                      memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((b, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((c, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec((9 * c, o), lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, o), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2 * r, 2 * wdt, o), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((b, 2 * h, 2 * wdt, o), x.dtype)
    ledger.track(2 * 9 * (b * 2 * h * 2 * wdt) * c * o,
                 [xw, gamma, beta, sums, sumsq, gmat, w2, bias2], out_shape)
    return pl.pallas_call(
        functools.partial(_gnsc_up_kernel, n=n, eps=eps, n_tiles=n_tiles),
        grid=(b, n_tiles),
        in_specs=[hp, x_spec, hn, vec_spec, vec_spec, vec_spec, vec_spec,
                  mat_spec, w_spec, bias_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        compiler_params=_compiler_params(2 * r, 2 * wdt, c),
    )(x_prev, xw, x_next, gamma, beta, sums, sumsq, gmat, w2, bias2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 8))
def _up_core(x, gamma, beta, w, bias, num_groups, eps, stats_in, has_stats):
    out, _ = _up_fwd(x, gamma, beta, w, bias, num_groups, eps, stats_in,
                     has_stats)
    return out


def _up_fwd(x, gamma, beta, w, bias, num_groups, eps, stats_in, has_stats):
    if _use_pallas(x):
        out = _pallas_gnsc_up(x, gamma, beta, w, bias, num_groups, eps,
                              stats=tuple(stats_in) if has_stats else None)
    else:
        out = gn_silu_up_conv_reference(x, gamma, beta, w, bias, num_groups,
                                        eps)
    return out, (x, gamma, beta, w, bias, stats_in)


def _up_bwd(num_groups, eps, has_stats, residuals, g):
    x, gamma, beta, w, bias, stats_in = residuals

    def f(x, gamma, beta, w, bias):
        return gn_silu_up_conv_reference(x, gamma, beta, w, bias, num_groups,
                                         eps)

    _, vjp = jax.vjp(f, x, gamma, beta, w, bias)
    grads = vjp(g)
    return grads + (jax.tree_util.tree_map(jnp.zeros_like, stats_in),)


_up_core.defvjp(_up_fwd, _up_bwd)


def fused_gn_silu_up_conv(x, gamma, beta, w, bias, num_groups: int,
                          eps: float = 1e-5, stats=None):
    """conv3x3_same(upsample2x_nearest(silu(gn(x)*gamma+beta))) + bias.

    Pallas on TPU (upsample in VMEM — the 4x tensor never touches HBM),
    identical-math XLA elsewhere. `stats`: chained (sums, sumsq) of x.
    Backward: XLA autodiff of the reference composition (the up blocks run
    unfused in train traces; this op serves the sampling path)."""
    zc = jnp.zeros((0,), jnp.float32)
    return _up_core(x, gamma, beta, w,
                    bias if bias is not None else zc,
                    num_groups, eps,
                    tuple(stats) if stats is not None else (zc, zc),
                    stats is not None)


# ---------------------------------------------------------------------------
# Hand-written backward kernels
# ---------------------------------------------------------------------------
#
# Backward of out = conv3x3(silu(gn(x)*gamma+beta)) [+ res @ skip_w + skip_b]
# is itself a norm+conv-shaped bandwidth problem. The XLA-recompute fallback
# re-runs the whole reference composition under autodiff (~12 image-sized HBM
# passes); these two kernels do it in 5:
#
#   phase A (read x, g):    dW, dbias, dgamma, dbeta [, dskip_w]
#                           — all small accumulators over the sequential grid
#   (XLA, (B,C)-sized)      m1 = mean_G(gamma*da), m2 = mean_G(gamma*da*xhat)
#                           via the constant group matrix
#   phase B (read x, g,
#            write dx):     dx = rstd * (gamma*da - m1 - xhat*m2)
#                           [+ dres = g @ skip_w^T for the 1x1-projection
#                           skip — g is already resident]
#
# Both phases recompute a = xhat*gamma+beta and da = conv3x3^T(g) * silu'(a)
# from x and g per tile (VPU work; the kernels stay stream-bound). g halo
# rows ride in exactly like the forward's x halo; the transpose-conv taps are
# the mirrored slices of the same zero-padded strip. Math identities used:
#   sum_hw(dyhat)      = gamma * dbeta   (per (B, C))
#   sum_hw(dyhat*xhat) = gamma * dgamma
# so the two GroupNorm reduction terms come free from phase A's outputs.


def bwd_kernel_enabled() -> bool:
    """Gate for the hand-written backward kernels (MCEDM_BWD_KERNEL=0 falls
    back to XLA autodiff of the reference composition — the round-2
    behavior, kept re-measurable)."""
    import os

    return os.environ.get("MCEDM_BWD_KERNEL", "1") != "0"


def _g_pad(gp_ref, gc_ref, gn_ref, r, wdt, o, top_live, bot_live, dtype):
    """(R+2, W+2, O) zero-padded cotangent strip: halo rows zeroed at the
    image edges, one zero column each side (cotangent of SAME zero padding
    is zero outside the image)."""
    top = gp_ref[0].astype(jnp.float32) * top_live
    bot = gn_ref[0].astype(jnp.float32) * bot_live
    strip = jnp.concatenate([top, gc_ref[0].astype(jnp.float32), bot],
                            axis=0).astype(dtype)
    zcol = jnp.zeros((r + 2, 1, o), dtype)
    return jnp.concatenate([zcol, strip, zcol], axis=1)


def _act_from_x(x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref, gmat_ref,
                b, n, eps):
    """Recompute (xhat, a, silu(a), silu'(a)) for the tile from x and the
    saved channel statistics. All fp32 (bf16 VPU math measured no faster)."""
    c = x_ref.shape[-1]
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    gamma = gamma_ref[pl.ds(b, 1), :].reshape(1, 1, c)
    beta = beta_ref[pl.ds(b, 1), :].reshape(1, 1, c)
    mean = mean.reshape(1, 1, c)
    rstd = rstd.reshape(1, 1, c)
    x = x_ref[0].astype(jnp.float32)
    xhat = (x - mean) * rstd
    a = xhat * gamma + beta
    sig = jax.nn.sigmoid(a)
    s = a * sig
    dsilu = sig * (1.0 + a * (1.0 - sig))
    return xhat, s, dsilu, gamma, rstd


def _gnsc_bwd_kernel_a(*refs, n: int, eps: float, n_tiles: int,
                       has_res: bool, act: bool = True):
    """Phase A: accumulate dW (9C, O), dbias (1, O), dgamma/dbeta (B, C)
    [, dskip_w (C_res, O)] over the (B, H/R) grid, and emit da (the
    pre-activation cotangent) as a full tensor — dx is then ONE fused XLA
    elementwise pass (dx = rstd*(gamma*da - m1 - xhat*m2) with per-(B,C)
    coefficients), so the transpose-conv taps run exactly once."""
    (gp_ref, gc_ref, gn_ref, x_ref, gamma_ref, beta_ref, sums_ref,
     sumsq_ref, gmat_ref, wt_ref), rest = refs[:10], refs[10:]
    res_ref = None
    if has_res:
        res_ref, rest = rest[0], rest[1:]
    dw_ref, db_ref, dgamma_ref, dbeta_ref, da_ref = rest[:5]
    dskw_ref = rest[5] if has_res else None
    b, t = pl.program_id(0), pl.program_id(1)
    r, wdt, c = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    o = gc_ref.shape[-1]
    top_live = (t > 0).astype(jnp.float32)
    bot_live = (t < n_tiles - 1).astype(jnp.float32)
    mm_dtype = x_ref.dtype

    if act:
        xhat, s, dsilu, gamma, rstd = _act_from_x(
            x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref, gmat_ref, b, n,
            eps)
        s_mm = s.astype(mm_dtype).reshape(r * wdt, c)
    else:
        # linear mode: the conv input IS the saved x; da is the transpose
        # conv itself and the norm reductions are dead outputs
        s_mm = x_ref[0].astype(mm_dtype).reshape(r * wdt, c)
    gpad = _g_pad(gp_ref, gc_ref, gn_ref, r, wdt, o, top_live, bot_live,
                  mm_dtype)

    @pl.when((b == 0) & (t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)
        if has_res:
            dskw_ref[:] = jnp.zeros_like(dskw_ref)

    @pl.when(t == 0)
    def _():
        dgamma_ref[pl.ds(b, 1), :] = jnp.zeros_like(
            dgamma_ref[pl.ds(b, 1), :])
        dbeta_ref[pl.ds(b, 1), :] = jnp.zeros_like(dbeta_ref[pl.ds(b, 1), :])

    ds = jnp.zeros((r * wdt, c), jnp.float32)
    for dr in range(3):
        for dwi in range(3):
            # transpose-conv tap: the mirrored slice of the padded strip
            gs = jax.lax.slice(gpad, (2 - dr, 2 - dwi, 0),
                               (2 - dr + r, 2 - dwi + wdt, o))
            gs = gs.reshape(r * wdt, o)
            # dW[tap] += s^T gs  (contract the pixel axis)
            dw_ref[pl.ds((dr * 3 + dwi) * c, c), :] += jax.lax.dot_general(
                s_mm, gs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # ds += gs @ W[tap]^T
            ds = ds + jax.lax.dot_general(
                gs, wt_ref[pl.ds((dr * 3 + dwi) * o, o), :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    g32 = gc_ref[0].astype(jnp.float32).reshape(r * wdt, o)
    db_ref[:] += jnp.sum(g32, axis=0, keepdims=True)
    if has_res:
        res_mm = res_ref[0].astype(mm_dtype).reshape(r * wdt, -1)
        dskw_ref[:] += jax.lax.dot_general(
            res_mm, gc_ref[0].astype(mm_dtype).reshape(r * wdt, o),
            (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)

    if act:
        da = ds * dsilu.reshape(r * wdt, c)
        dgamma_ref[pl.ds(b, 1), :] += jnp.sum(
            da * xhat.reshape(r * wdt, c), axis=0, keepdims=True)
        dbeta_ref[pl.ds(b, 1), :] += jnp.sum(da, axis=0, keepdims=True)
    else:
        da = ds
    da_ref[0] = da.reshape(r, wdt, c).astype(da_ref.dtype)


def _pallas_gnsc_bwd_paired(x, gamma, beta, w, sums, sumsq, g, num_groups,
                            eps, residual=None, skip_w=None, res_mode="none"):
    """Paired-lane front end of _pallas_gnsc_bwd: bitcast x/g/residual,
    paired weights and statistics, then fold the gradients back —
    dw[dr,dw] sums the two (dj,p,q) slots of the paired tap matrix that
    carry it; dgamma/dbeta/dbias fold their parity halves; dskip_w sums the
    diagonal blocks (the off-diagonal blocks are structural zeros of the
    pairing, so their cotangents drop). da/dx stay elementwise-per-channel,
    so the phase-A da emission bitcasts straight back."""
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    w2 = wdt // 2
    n = h * wdt
    has_res = res_mode == "proj"
    outs = _bwd_phase_a(
        x.reshape(b, h, w2, 2 * c), _pair_vec(gamma), _pair_vec(beta),
        _pair_weights(w), _pair_vec(sums), _pair_vec(sumsq),
        g.reshape(b, h, w2, 2 * o), num_groups, eps,
        residual=(residual.reshape(b, h, w2, 2 * residual.shape[-1])
                  if has_res else None),
        res_mode=res_mode,
        gmat_arr=jnp.asarray(_pair_gmat(num_groups, c)), n_full=n)
    dw_p9, db2, dgamma2, dbeta2, da_p = outs[:5]
    dgamma = dgamma2[:, :c] + dgamma2[:, c:]
    dbeta = dbeta2[:, :c] + dbeta2[:, c:]
    db2 = db2.reshape(2 * o)
    dbias = db2[:o] + db2[o:]
    # dx from the UNPAIRED quantities — the group reduction terms need
    # full-channel dgamma/dbeta, so fold before the elementwise pass
    da = da_p.reshape(b, h, wdt, c)
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    dx = _dx_from_da(x, da, gamma, dgamma, dbeta, sums, sumsq, gmat, n, eps)
    # fold the paired tap gradients: dw[dr, dw] = sum of the two (dj, p, q)
    # slots with 2*(dj-1)+p-q+1 == dw (see _pair_weights)
    dw_p = dw_p9.reshape(3, 3, 2, c, 2, o)  # (dr, dj, p, c, q, o)
    slots = {0: [(0, 1, 0), (1, 0, 1)],
             1: [(1, 0, 0), (1, 1, 1)],
             2: [(1, 1, 0), (2, 0, 1)]}
    dw = jnp.stack([
        jnp.stack([sum(dw_p[dr, dj, p, :, q, :] for dj, p, q in slots[dwi])
                   for dwi in range(3)])
        for dr in range(3)]).astype(w.dtype)
    if has_res:
        dres = jnp.einsum("bhwo,ro->bhwr", g.astype(x.dtype),
                          skip_w.astype(x.dtype))
        dskw2 = outs[5].reshape(2, residual.shape[-1], 2, o)
        dskw = (dskw2[0, :, 0, :] + dskw2[1, :, 1, :]).astype(skip_w.dtype)
        return dx, dgamma, dbeta, dw, dbias, dres, dskw, dbias
    return dx, dgamma, dbeta, dw, dbias


def _dx_from_da(x, da, gamma, dgamma, dbeta, sums, sumsq, gmat, n, eps):
    """dx in ONE fused XLA elementwise pass: the GroupNorm reduction terms
    come from phase A's channel sums via the identities in the header.
    All arguments UNPAIRED (full-channel statistics)."""
    mean, rstd = _mean_rstd(sums, sumsq, gmat, n, eps)
    m1 = _gc(gamma * dbeta / n, gmat)
    m2 = _gc(gamma * dgamma / n, gmat)
    a_c = (rstd * gamma)[:, None, None, :]
    b_c = (rstd * rstd * m2)[:, None, None, :]
    c_c = (rstd * m1)[:, None, None, :]
    mean_c = mean[:, None, None, :]
    return (da.astype(jnp.float32) * a_c
            - (x.astype(jnp.float32) - mean_c) * b_c - c_c).astype(x.dtype)


def _bwd_phase_a(x, gamma, beta, w, sums, sumsq, g, num_groups, eps,
                 residual=None, res_mode="none",
                 gmat_arr=None, n_full=None, act=True):
    """Phase-A pallas_call: returns (dw9, db, dgamma, dbeta, da [, dskw]).
    gmat_arr/n_full: paired-lane plumbing (block-diag group matrix and the
    true per-channel pixel count)."""
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    n = n_full if n_full is not None else h * wdt
    has_res = res_mode == "proj"
    r = _row_tile(h, x.dtype)
    # phase A stages x+g+res tiles plus fp32 ds/da/accumulators: measured
    # stack ~70 MB at fp32 r=64 proj vs Mosaic's hard 64 MB scoped ceiling
    # — shrink the backward's tile until the estimate fits
    bytes_per = 4 if x.dtype == jnp.float32 else 2
    cr = residual.shape[-1] if has_res else 0
    while (r > 8 and h % (r // 2) == 0
           and r * wdt * ((c + o + cr) * bytes_per * 6 + (2 * c) * 4 * 4)
           > 52 * 2 ** 20):
        r //= 2
    n_tiles = h // r
    gmat = (gmat_arr if gmat_arr is not None
            else jnp.asarray(_group_matrix(num_groups, c)))
    # per-tap transposed weights (9*O, C) in the network dtype
    wt = jnp.transpose(w.astype(x.dtype), (0, 1, 3, 2)).reshape(9 * o, c)
    g_prev, g_next = _halo_rows(g, r)

    def x_spec(ci):
        return pl.BlockSpec((1, r, wdt, ci), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)

    def const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)

    halo_p = pl.BlockSpec((1, 1, wdt, o),
                          lambda i, t: (i, jnp.maximum(t - 1, 0), 0, 0),
                          memory_space=pltpu.VMEM)
    halo_n = pl.BlockSpec((1, 1, wdt, o),
                          lambda i, t: (i, jnp.minimum(t + 1, n_tiles - 1),
                                        0, 0),
                          memory_space=pltpu.VMEM)
    vec_spec = const_spec(b, c)

    in_specs = [halo_p, x_spec(o), halo_n, x_spec(c), vec_spec, vec_spec,
                vec_spec, vec_spec, const_spec(c, c), const_spec(9 * o, c)]
    inputs = [g_prev, g, g_next, x, gamma, beta, sums, sumsq, gmat, wt]
    out_specs = [const_spec(9 * c, o), const_spec(1, o), vec_spec, vec_spec,
                 x_spec(c)]
    out_shape = [jax.ShapeDtypeStruct((9 * c, o), jnp.float32),
                 jax.ShapeDtypeStruct((1, o), jnp.float32),
                 jax.ShapeDtypeStruct((b, c), jnp.float32),
                 jax.ShapeDtypeStruct((b, c), jnp.float32),
                 jax.ShapeDtypeStruct(x.shape, x.dtype)]
    if has_res:
        cr = residual.shape[-1]
        in_specs.append(x_spec(cr))
        inputs.append(residual)
        out_specs.append(const_spec(cr, o))
        out_shape.append(jax.ShapeDtypeStruct((cr, o), jnp.float32))
    cp = _compiler_params(r, wdt, c + o)
    ledger.track(2 * (2 * 9 * b * h * wdt * c * o)
                 + (2 * b * h * wdt * cr * o if has_res else 0),
                 inputs, out_shape)
    return pl.pallas_call(
        functools.partial(_gnsc_bwd_kernel_a, n=n, eps=eps, n_tiles=n_tiles,
                          has_res=has_res, act=act),
        grid=(b, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        **({"compiler_params": cp} if cp else {}),
    )(*inputs)


def _pallas_gnsc_bwd(x, gamma, beta, w, sums, sumsq, g, num_groups, eps,
                     residual=None, skip_w=None, res_mode="none"):
    """Two-phase Pallas backward. Returns (dx, dgamma, dbeta, dw, dbias
    [, dres, dskip_w, dskip_b]). res_mode: "none" | "identity" | "proj".
    For "identity" the residual cotangent is g itself (returned by the
    caller without touching this function)."""
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    n = h * wdt
    has_res = res_mode == "proj"
    outs = _bwd_phase_a(x, gamma, beta, w, sums, sumsq, g, num_groups, eps,
                        residual=residual, res_mode=res_mode)
    dw9, db, dgamma, dbeta, da = outs[:5]
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    dx = _dx_from_da(x, da, gamma, dgamma, dbeta, sums, sumsq, gmat, n, eps)
    dw = dw9.reshape(3, 3, c, o).astype(w.dtype)
    if has_res:
        # the 1x1 skip's input cotangent — a single XLA matmul
        dres = jnp.einsum("bhwo,ro->bhwr", g.astype(x.dtype),
                          skip_w.astype(x.dtype))
        dskw = outs[5].astype(skip_w.dtype)
        return dx, dgamma, dbeta, dw, db.reshape(o), dres, dskw, db.reshape(o)
    return dx, dgamma, dbeta, dw, db.reshape(o)


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
    if _use_pair(x, False, "none"):
        return _pallas_gnsc_paired(x, gamma, beta, w, bias, num_groups, eps)
    return _pallas_gnsc(x, gamma, beta, w, bias, num_groups, eps)


def fused_gn_silu_conv_block(x, gamma, beta, w, bias, num_groups: int,
                             eps: float = 1e-5, *, x2=None, residual=None,
                             residual2=None, skip_w=None, skip_b=None,
                             stats=None, emit_stats: bool = False,
                             res_up: bool = False):
    """The whole residual-block tail in one kernel:

        out = conv3x3_same(silu(group_norm(xin) * gamma + beta)) + bias
              [+ res                    (identity skip; O == C_res)]
              [+ res @ skip_w + skip_b  (the 1x1 skip projection)]

    where xin = x, or the never-materialized concat(x, x2) when `x2` is
    given (the decoder's skip-concat input — both halves ride into the
    kernel separately and each conv tap contracts two weight-row slices);
    res = residual, or concat(residual, residual2) likewise.

    `residual` is the BLOCK input (a different tensor than x, which is the
    first conv's output — adm_blocks.py:158-171: norm1+silu+conv1+skip+add).

    `stats`: optional (sums, sumsq) (B, C) fp32 channel statistics of xin,
    chained from the producing kernel's `emit_stats` — skips this kernel's
    own stats pass (one full HBM read).
    `emit_stats`: additionally return (out, sums, sumsq) where sums/sumsq
    are (B, O) fp32 channel statistics of out (accumulated in VMEM from the
    fp32 accumulator) — the next GroupNorm's stats pass for free. Note they
    are statistics of the pre-rounding fp32 result; for bf16 outputs they
    differ from recomputed stats by rounding only.

    Pallas on TPU; identical-math XLA elsewhere. Backward recomputes via the
    reference composition (training traces run with fusion gated off, but
    gradients through this op are correct regardless).
    """
    if residual2 is not None:
        res_mode = "proj2"
    elif residual is None:
        res_mode = "none"
    elif skip_w is not None:
        res_mode = "proj"
    else:
        res_mode = "identity_up" if res_up else "identity"
    zc = jnp.zeros((0,), jnp.float32)
    return _block_core(
        x, gamma, beta, w,
        bias if bias is not None else zc,
        x2 if x2 is not None else zc,
        residual if residual is not None else zc,
        residual2 if residual2 is not None else zc,
        skip_w if skip_w is not None else zc,
        skip_b if skip_b is not None else zc,
        stats[0] if stats is not None else zc,
        stats[1] if stats is not None else zc,
        num_groups, eps, res_mode, emit_stats,
        bias is not None, skip_b is not None, stats is not None,
        x2 is not None)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(12, 13, 14, 15, 16, 17, 18, 19))
def _block_core(x, gamma, beta, w, bias, x2, residual, residual2,
                skip_w, skip_b, sums_in, sumsq_in,
                num_groups, eps, res_mode, emit_stats,
                has_bias, has_skip_b, has_stats, has_x2):
    out, _ = _block_fwd(x, gamma, beta, w, bias, x2, residual, residual2,
                        skip_w, skip_b, sums_in, sumsq_in, num_groups, eps,
                        res_mode, emit_stats, has_bias, has_skip_b,
                        has_stats, has_x2)
    return out


def _block_reference(x, gamma, beta, w, bias, x2, residual, residual2,
                     skip_w, skip_b, num_groups, eps, res_mode, emit_stats,
                     has_bias, has_skip_b, has_x2):
    xin = jnp.concatenate([x, x2], axis=-1) if has_x2 else x
    res = residual if res_mode != "none" else None
    if res_mode == "proj2":
        res = jnp.concatenate([residual, residual2], axis=-1)
    elif res_mode == "identity_up":
        res = jnp.repeat(jnp.repeat(residual, 2, axis=1), 2, axis=2)
    out = gn_silu_conv_block_reference(
        xin, gamma, beta, w, bias if has_bias else None, num_groups, eps,
        residual=res,
        skip_w=skip_w if res_mode in ("proj", "proj2") else None,
        skip_b=(skip_b if (res_mode in ("proj", "proj2") and has_skip_b)
                else None))
    if emit_stats:
        osums, osumsq = _out_stats_reference(out)
        return out, osums, osumsq
    return out


def _block_fwd(x, gamma, beta, w, bias, x2, residual, residual2,
               skip_w, skip_b, sums_in, sumsq_in, num_groups, eps,
               res_mode, emit_stats, has_bias, has_skip_b, has_stats,
               has_x2):
    saved_stats = None
    if _use_pallas(x):
        pair = (_use_pair_dual(x, x2, num_groups) if has_x2
                else _use_pair(x, has_x2, res_mode))
        stats = (sums_in, sumsq_in) if has_stats else None
        if stats is None and not has_x2:
            # precompute (and save) the channel statistics so a hand-written
            # backward can reuse them without another pass over x
            if pair:
                stats = _paired_stats(x)
            else:
                b_, h_, w_, c_ = x.shape
                stats = _compute_stats(x.reshape(b_, h_ * w_, c_),
                                       _tile_rows(h_ * w_))
        if pair:
            out = _pallas_gnsc_paired(
                x, gamma, beta, w, bias if has_bias else None, num_groups,
                eps, x2=x2 if has_x2 else None,
                residual=residual if res_mode != "none" else None,
                residual2=residual2 if res_mode == "proj2" else None,
                skip_w=skip_w if res_mode in ("proj", "proj2") else None,
                skip_b=(skip_b if (res_mode in ("proj", "proj2")
                                   and has_skip_b) else None),
                res_mode=res_mode, emit_stats=emit_stats, stats=stats)
        else:
            out = _pallas_gnsc(
                x, gamma, beta, w, bias if has_bias else None, num_groups,
                eps, x2=x2 if has_x2 else None,
                residual=residual if res_mode != "none" else None,
                residual2=residual2 if res_mode == "proj2" else None,
                skip_w=skip_w if res_mode in ("proj", "proj2") else None,
                skip_b=(skip_b if (res_mode in ("proj", "proj2")
                                   and has_skip_b) else None),
                res_mode=res_mode, emit_stats=emit_stats, stats=stats)
        saved_stats = stats
        if emit_stats:
            out = tuple(out)  # pallas_call returns a list
    else:
        out = _block_reference(x, gamma, beta, w, bias, x2, residual,
                               residual2, skip_w, skip_b, num_groups, eps,
                               res_mode, emit_stats, has_bias, has_skip_b,
                               has_x2)
    return out, (x, gamma, beta, w, bias, x2, residual, residual2,
                 skip_w, skip_b, sums_in, sumsq_in, saved_stats)


def _block_bwd(num_groups, eps, res_mode, emit_stats, has_bias, has_skip_b,
               has_stats, has_x2, residuals, g):
    (x, gamma, beta, w, bias, x2, residual, residual2, skip_w, skip_b,
     sums_in, sumsq_in, saved_stats) = residuals

    if (saved_stats is not None and bwd_kernel_enabled() and not emit_stats
            and not has_x2
            and res_mode in ("none", "identity", "identity_up", "proj")):
        # hand-written Pallas backward (phase A + fused XLA dx) instead of
        # the ~12-pass XLA recompute of the composition
        bwd_fn = (_pallas_gnsc_bwd_paired if _use_pair(x, False, "none")
                  else _pallas_gnsc_bwd)
        outs = bwd_fn(
            x, gamma, beta, w, saved_stats[0], saved_stats[1], g,
            num_groups, eps,
            residual=residual if res_mode == "proj" else None,
            skip_w=skip_w if res_mode == "proj" else None,
            res_mode="proj" if res_mode == "proj" else "none")
        dx, dgamma, dbeta, dw, dbias = outs[:5]
        dres = jnp.zeros_like(residual)
        dskw, dskb = jnp.zeros_like(skip_w), jnp.zeros_like(skip_b)
        if res_mode == "identity":
            dres = g.astype(residual.dtype)
        elif res_mode == "identity_up":
            # cotangent of the in-kernel 2x nearest upsample: each low-res
            # skip cell receives the sum of its four high-res copies
            g32 = g.astype(jnp.float32)
            b_, hh, ww, oo = g32.shape
            dres = g32.reshape(b_, hh // 2, 2, ww // 2, 2, oo).sum(
                axis=(2, 4)).astype(residual.dtype)
        elif res_mode == "proj":
            dres = outs[5].astype(residual.dtype)
            dskw = outs[6]
            if has_skip_b:
                dskb = outs[7].astype(skip_b.dtype)
        return (dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
                dw.astype(w.dtype),
                dbias.astype(bias.dtype) if has_bias
                else jnp.zeros_like(bias),
                jnp.zeros_like(x2), dres, jnp.zeros_like(residual2),
                dskw.astype(skip_w.dtype) if res_mode == "proj"
                else jnp.zeros_like(skip_w),
                dskb,
                jnp.zeros_like(sums_in), jnp.zeros_like(sumsq_in))

    def f(x, gamma, beta, w, bias, x2, residual, residual2, skip_w, skip_b):
        return _block_reference(x, gamma, beta, w, bias, x2, residual,
                                residual2, skip_w, skip_b, num_groups, eps,
                                res_mode, emit_stats, has_bias, has_skip_b,
                                has_x2)

    _, vjp = jax.vjp(f, x, gamma, beta, w, bias, x2, residual, residual2,
                     skip_w, skip_b)
    grads = vjp(g)
    # provided stats duplicate what the reference recomputes from x, so the
    # full gradient flows through the recompute path; stats get zero
    # cotangents (shape-matched to their primals)
    return grads + (jnp.zeros_like(sums_in), jnp.zeros_like(sumsq_in))


_block_core.defvjp(_block_fwd, _block_bwd)


def _fgsc_fwd(x, gamma, beta, w, bias, num_groups, eps):
    if not _use_pallas(x):
        out = gn_silu_conv_reference(x, gamma, beta, w, bias, num_groups, eps)
        return out, (x, gamma, beta, w, bias, None)
    b, h, wdt, c = x.shape
    if _use_pair(x, False, "none"):
        stats = _paired_stats(x)
        out = _pallas_gnsc_paired(x, gamma, beta, w, bias, num_groups, eps,
                                  stats=stats)
    else:
        stats = _compute_stats(x.reshape(b, h * wdt, c), _tile_rows(h * wdt))
        out = _pallas_gnsc(x, gamma, beta, w, bias, num_groups, eps,
                           stats=stats)
    return out, (x, gamma, beta, w, bias, stats)


def _fgsc_bwd(num_groups, eps, residuals, g):
    x, gamma, beta, w, bias, stats = residuals
    has_bias = bias is not None
    if stats is not None and bwd_kernel_enabled():
        bwd_fn = (_pallas_gnsc_bwd_paired if _use_pair(x, False, "none")
                  else _pallas_gnsc_bwd)
        dx, dgamma, dbeta, dw, dbias = bwd_fn(
            x, gamma, beta, w, stats[0], stats[1], g, num_groups, eps)
        return (dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
                dw.astype(w.dtype),
                dbias.astype(bias.dtype) if has_bias else None)

    def f(x, gamma, beta, w, bias):
        return gn_silu_conv_reference(x, gamma, beta, w,
                                      bias if has_bias else None,
                                      num_groups, eps)

    _, vjp = jax.vjp(f, x, gamma, beta, w,
                     bias if has_bias else jnp.zeros((w.shape[-1],), w.dtype))
    dx, dgamma, dbeta, dw, dbias = vjp(g)
    return dx, dgamma, dbeta, dw, (dbias if has_bias else None)


fused_gn_silu_conv.defvjp(_fgsc_fwd, _fgsc_bwd)


# ---------------------------------------------------------------------------
# Paired-IO block entry (MCEDM_PAIRIO end-to-end threading)
# ---------------------------------------------------------------------------
#
# Under paired threading the net never materializes the unpaired layout
# between kernels — the (B, H, W/2, 2C) activations flow straight from one
# pallas_call to the next in the default tiled layout, eliminating the
# layout-assignment copies XLA inserts at every pallas <-> XLA-conv boundary
# (profiled at ~1.5 GB/call of pure relayout traffic at the flagship shape).


def conv3x3_same_reference(x, w, bias):
    out = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1, 1),
        padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def fused_block_paired(xp, gamma, beta, w, bias, num_groups, eps=1e-5, *,
                       splits=None, res_splits=None, residual=None,
                       skip_w=None, skip_b=None,
                       stats=None, emit_stats=False, res_up=False,
                       act=True):
    """Paired-IO residual-block tail: everything enters and leaves PAIRED.

    xp: (B, H, W/2, 2C) paired activation (dual-order when splits=(c1, c2)
    — the decoder's channel-concat of two paired halves). gamma/beta/stats:
    per-ORIGINAL-channel (B, C). residual: paired (identity: (B,H,W/2,2O);
    proj: any paired layout, described by res_splits when dual-order —
    independent of the input's splits) — EXCEPT identity_up (res_up=True),
    where it is the UNPAIRED low-res skip (B, H/2, W/2, O) (its channel-
    concat is the paired W-repeat). act=False runs the conv without the
    norm+SiLU prefix (the down-block conv after the paired pool).
    Returns paired out [+ folded (B, O) stats when emit_stats]."""
    if residual is None:
        res_mode = "none"
    elif skip_w is not None:
        res_mode = "proj"
    else:
        res_mode = "identity_up" if res_up else "identity"
    assert act or res_mode == "none"
    zc = jnp.zeros((0,), jnp.float32)
    return _blockp_core(
        xp, gamma if act else zc, beta if act else zc, w,
        bias if bias is not None else zc,
        residual if residual is not None else zc,
        skip_w if skip_w is not None else zc,
        skip_b if skip_b is not None else zc,
        stats[0] if stats is not None else zc,
        stats[1] if stats is not None else zc,
        num_groups, eps, splits, res_splits, res_mode, emit_stats,
        bias is not None, skip_b is not None, stats is not None, act)


def _blockp_reference(xp, gamma, beta, w, bias, residual, skip_w, skip_b,
                      num_groups, eps, splits, res_splits, res_mode,
                      emit_stats, has_bias, has_skip_b, act):
    """Identical-math fallback: unpair -> reference composition -> re-pair."""
    x = unpair_array(xp, splits)
    res = None
    if res_mode == "identity":
        res = unpair_array(residual)
    elif res_mode == "identity_up":
        res = jnp.repeat(jnp.repeat(residual, 2, axis=1), 2, axis=2)
    elif res_mode == "proj":
        res = unpair_array(residual, res_splits)
    if act:
        out = gn_silu_conv_block_reference(
            x, gamma, beta, w, bias if has_bias else None, num_groups, eps,
            residual=res, skip_w=skip_w if res_mode == "proj" else None,
            skip_b=(skip_b if (res_mode == "proj" and has_skip_b)
                    else None))
    else:
        out = conv3x3_same_reference(x, w, bias if has_bias else None)
        if res is not None:
            out = out + res.astype(out.dtype)
    if emit_stats:
        osums, osumsq = _out_stats_reference(out)
        return pair_array(out), osums, osumsq
    return pair_array(out)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(10, 11, 12, 13, 14, 15, 16, 17, 18, 19))
def _blockp_core(xp, gamma, beta, w, bias, residual, skip_w, skip_b,
                 sums_in, sumsq_in, num_groups, eps, splits, res_splits,
                 res_mode, emit_stats, has_bias, has_skip_b, has_stats, act):
    out, _ = _blockp_fwd(xp, gamma, beta, w, bias, residual, skip_w, skip_b,
                         sums_in, sumsq_in, num_groups, eps, splits,
                         res_splits, res_mode, emit_stats, has_bias,
                         has_skip_b, has_stats, act)
    return out


def _blockp_fwd(xp, gamma, beta, w, bias, residual, skip_w, skip_b,
                sums_in, sumsq_in, num_groups, eps, splits, res_splits,
                res_mode, emit_stats, has_bias, has_skip_b, has_stats, act):
    b, h, w2, c2 = xp.shape
    o = w.shape[-1]
    c = c2 // 2
    saved = None
    if _use_pallas(xp):
        # saved doubles as the "forward ran the pallas path" marker the
        # backward gate needs (zero-size placeholders in linear mode)
        stats_u = (jnp.zeros((0,), jnp.float32),) * 2
        if act:
            if has_stats:
                stats_u = (sums_in, sumsq_in)
            else:
                sp, ssp = _compute_stats_4d(xp)
                stats_u = (_fold_stats(sp, splits), _fold_stats(ssp, splits))
        kw = {}
        res_p = residual if res_mode in ("identity", "proj") else None
        if res_mode == "identity_up":
            # unpaired low-res skip: channel-concat IS the paired W-repeat
            res_p = jnp.concatenate([residual, residual], axis=-1)
            kw["res_pre_up"] = True
        if shifted_pair_enabled():
            sh = ((2 * c,) if splits is None
                  else (2 * splits[0], 2 * splits[1]))
        else:
            sh = None
        out = _pallas_gnsc(
            xp,
            _dual_vec(gamma, splits) if act else gamma,
            _dual_vec(beta, splits) if act else beta,
            (_pair_weights_shifted_split(w, splits) if sh
             else _pair_weights_split(w, splits)),
            (jnp.concatenate([bias, bias]) if has_bias else None),
            num_groups, eps,
            residual=res_p,
            skip_w=(_pair_skip_split(skip_w, res_splits)
                    if res_mode == "proj" else None),
            skip_b=(jnp.concatenate([skip_b, skip_b])
                    if (res_mode == "proj" and has_skip_b) else None),
            res_mode=res_mode, emit_stats=emit_stats,
            stats=((_dual_vec(stats_u[0], splits),
                    _dual_vec(stats_u[1], splits)) if act else None),
            gmat_arr=(jnp.asarray(_pair_gmat_split(num_groups, c, splits))
                      if act else None),
            n_full=h * w2 * 2, act=act, sh_halves=sh, **kw)
        saved = stats_u
        if emit_stats:
            outp, os_, osq = out
            out = (outp, os_[:, :o] + os_[:, o:], osq[:, :o] + osq[:, o:])
    else:
        out = _blockp_reference(xp, gamma, beta, w, bias, residual, skip_w,
                                skip_b, num_groups, eps, splits, res_splits,
                                res_mode, emit_stats, has_bias, has_skip_b,
                                act)
    return out, (xp, gamma, beta, w, bias, residual, skip_w, skip_b,
                 sums_in, sumsq_in, saved)


def _fold_dskw(dskw2, cr, o, splits):
    if splits is None:
        d = dskw2.reshape(2, cr, 2, o)
        return d[0, :, 0, :] + d[1, :, 1, :]
    c1, c2 = splits
    d1 = dskw2[:2 * c1].reshape(2, c1, 2, o)
    d2 = dskw2[2 * c1:].reshape(2, c2, 2, o)
    return jnp.concatenate([d1[0, :, 0, :] + d1[1, :, 1, :],
                            d2[0, :, 0, :] + d2[1, :, 1, :]], axis=0)


def _blockp_bwd(num_groups, eps, splits, res_splits, res_mode, emit_stats,
                has_bias, has_skip_b, has_stats, act, residuals, g):
    (xp, gamma, beta, w, bias, residual, skip_w, skip_b,
     sums_in, sumsq_in, saved) = residuals
    # emitted stats receive structurally-zero cotangents in this framework
    # (every consumer's custom VJP zeroes its chained-stats inputs — the
    # statistical dependence on x is already inside the dx identities), so
    # the kernel backward ignores g[1:] when emit_stats
    gp = g[0] if emit_stats else g
    if (saved is not None and bwd_kernel_enabled()
            and res_mode in ("none", "identity", "identity_up", "proj")):
        b, h, w2, c2 = xp.shape
        c = c2 // 2
        o = w.shape[-1]
        n = h * w2 * 2
        if act:
            gamma_p = _dual_vec(gamma, splits)
            beta_p = _dual_vec(beta, splits)
            sums_p = _dual_vec(saved[0], splits)
            sumsq_p = _dual_vec(saved[1], splits)
            gmat_p = jnp.asarray(_pair_gmat_split(num_groups, c, splits))
        else:
            zv = jnp.zeros((b, c2), jnp.float32)
            gamma_p = beta_p = sums_p = sumsq_p = zv
            gmat_p = jnp.zeros((c2, c2), jnp.float32)
        outs = _bwd_phase_a(
            xp, gamma_p, beta_p,
            _pair_weights_split(w, splits),
            sums_p, sumsq_p,
            gp, num_groups, eps,
            residual=residual if res_mode == "proj" else None,
            res_mode="proj" if res_mode == "proj" else "none",
            gmat_arr=gmat_p, n_full=n, act=act)
        dw_p9, db2, dgamma2, dbeta2, da_p = outs[:5]
        db2 = db2.reshape(2 * o)
        dbias = db2[:o] + db2[o:]
        dw = _fold_dw(dw_p9, c, o, splits).astype(w.dtype)
        if act:
            dgamma = _fold_stats(dgamma2, splits)
            dbeta = _fold_stats(dbeta2, splits)
            # dx stays PAIRED: per-original-channel coefficients,
            # dual_vec'd, applied elementwise to the paired da/x
            gmat = jnp.asarray(_group_matrix(num_groups, c))
            mean, rstd = _mean_rstd(saved[0], saved[1], gmat, n, eps)
            m1 = _gc(gamma * dbeta / n, gmat)
            m2 = _gc(gamma * dgamma / n, gmat)

            def dv(vec):
                return _dual_vec(vec, splits)[:, None, None, :]

            dx = (da_p.astype(jnp.float32) * dv(rstd * gamma)
                  - (xp.astype(jnp.float32) - dv(mean))
                  * dv(rstd * rstd * m2)
                  - dv(rstd * m1)).astype(xp.dtype)
        else:
            # linear conv: da IS the input cotangent
            dgamma, dbeta = jnp.zeros_like(gamma), jnp.zeros_like(beta)
            dx = da_p.astype(xp.dtype)
        dres = jnp.zeros_like(residual)
        dskw = jnp.zeros_like(skip_w)
        dskb = jnp.zeros_like(skip_b)
        if res_mode == "identity":
            dres = gp.astype(residual.dtype)
        elif res_mode == "identity_up":
            # each low-res skip cell feeds both rows and both parities.
            # Strided ROW slices (g32[:, 0::2]) lower to H-major transpose
            # copies on this backend (CLAUDE.md audit) — split the major dim
            # by reshape (layout-free) and index instead. Reshape in the
            # COTANGENT dtype (an up-front .astype(f32) materialized a
            # 67 MB/step f32 copy in the r5 byte audit); the f32 casts on
            # the row slices fuse into the adds.
            bb, hh = gp.shape[0], gp.shape[1]
            g4 = gp.reshape(bb, hh // 2, 2, *gp.shape[2:])
            e = (g4[:, :, 0].astype(jnp.float32)
                 + g4[:, :, 1].astype(jnp.float32))
            dres = (e[..., :o] + e[..., o:]).astype(residual.dtype)
        elif res_mode == "proj":
            skw_p = _pair_skip_split(skip_w, res_splits).astype(xp.dtype)
            dres = jnp.einsum("bhwo,ro->bhwr", gp.astype(xp.dtype), skw_p)
            dskw = _fold_dskw(outs[5], skip_w.shape[0], o,
                              res_splits).astype(skip_w.dtype)
            if has_skip_b:
                dskb = dbias.astype(skip_b.dtype)
        return (dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
                dw,
                dbias.astype(bias.dtype) if has_bias
                else jnp.zeros_like(bias),
                dres, dskw, dskb,
                jnp.zeros_like(sums_in), jnp.zeros_like(sumsq_in))

    def f(xp, gamma, beta, w, bias, residual, skip_w, skip_b):
        return _blockp_reference(xp, gamma, beta, w, bias, residual, skip_w,
                                 skip_b, num_groups, eps, splits, res_splits,
                                 res_mode, emit_stats, has_bias, has_skip_b,
                                 act)

    _, vjp = jax.vjp(f, xp, gamma, beta, w, bias, residual, skip_w, skip_b)
    grads = vjp(g)
    return grads + (jnp.zeros_like(sums_in), jnp.zeros_like(sumsq_in))


_blockp_core.defvjp(_blockp_fwd, _blockp_bwd)


# ---------------------------------------------------------------------------
# Paired up-block prefix: norm+silu at low res -> upsample2x in VMEM ->
# conv3x3 emitting the HIGH-res activation directly in the paired layout.
# ---------------------------------------------------------------------------
#
# The unpaired up kernel needed the W axis pre-repeated in XLA (Mosaic
# rejects sublane interleaves), which lost on-device. In the PAIRED layout
# the W-repeat is trivial: high pair j covers high pixels 2j, 2j+1 = low
# pixel j twice, so the upsampled paired strip is a channel CONCAT of the
# normalized low-res strip with itself — an in-VMEM lane concat. Combined
# with the axis-0 row repeat, the 4x upsampled tensor never exists outside
# VMEM and the output lands paired for the next paired-IO consumer.


def _gnsc_up_pair_kernel(xp_ref, xc_ref, xn_ref, gamma_ref, beta_ref,
                         sums_ref, sumsq_ref, gmat_ref, w_ref, bias_ref,
                         *out_refs, n: int, eps: float, n_tiles: int,
                         emit_stats: bool = False):
    out_ref = out_refs[0]
    osums_ref = osumsq_ref = None
    if emit_stats:
        osums_ref, osumsq_ref = out_refs[1], out_refs[2]
    b, t = pl.program_id(0), pl.program_id(1)
    r, wl, c = xc_ref.shape[1], xc_ref.shape[2], xc_ref.shape[3]
    c2 = 2 * c
    o2 = out_ref.shape[-1]
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    gamma = (gamma_ref[pl.ds(b, 1), :] * rstd).reshape(1, 1, c)
    beta = (beta_ref[pl.ds(b, 1), :]
            - gamma_ref[pl.ds(b, 1), :] * rstd * mean).reshape(1, 1, c)
    top_live = (t > 0).astype(jnp.float32)
    bot_live = (t < n_tiles - 1).astype(jnp.float32)
    mm_dtype = xc_ref.dtype

    def ns(v, live=None):
        y = v.astype(jnp.float32) * gamma + beta
        y = y * jax.nn.sigmoid(y)
        if live is not None:
            y = y * live
        return y.astype(mm_dtype)

    def pair2(y):
        # paired W-repeat: both parities of high pair j read low pixel j
        return jnp.concatenate([y, y], axis=-1)

    dense_w = w_ref.shape[0] == 9 * c  # see _up_pair_weights_dense
    ck = c if dense_w else c2
    rep = (lambda y: y) if dense_w else pair2
    mid_up = jnp.repeat(rep(ns(xc_ref[0])), 2, axis=0)  # (2R, Wl, C|2C)
    ypad = jnp.concatenate([rep(ns(xp_ref[0], top_live)), mid_up,
                            rep(ns(xn_ref[0], bot_live))], axis=0)
    zcol = jnp.zeros((2 * r + 2, 1, ck), mm_dtype)
    ypad = jnp.concatenate([zcol, ypad, zcol], axis=1)  # (2R+2, Wl+2, ck)

    r2 = 2 * r
    acc = jnp.broadcast_to(bias_ref[:].astype(jnp.float32), (r2 * wl, o2))
    for dr in range(3):
        for dj in range(3):
            blk = jax.lax.slice(ypad, (dr, dj, 0), (dr + r2, dj + wl, ck))
            acc = acc + jax.lax.dot_general(
                blk.reshape(r2 * wl, ck),
                w_ref[pl.ds((dr * 3 + dj) * ck, ck), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    out_ref[0] = acc.reshape(r2, wl, o2).astype(out_ref.dtype)
    if emit_stats:
        @pl.when(t == 0)
        def _():
            osums_ref[pl.ds(b, 1), :] = jnp.zeros_like(
                osums_ref[pl.ds(b, 1), :])
            osumsq_ref[pl.ds(b, 1), :] = jnp.zeros_like(
                osumsq_ref[pl.ds(b, 1), :])

        osums_ref[pl.ds(b, 1), :] += jnp.sum(acc, axis=0, keepdims=True)
        osumsq_ref[pl.ds(b, 1), :] += jnp.sum(acc * acc, axis=0,
                                              keepdims=True)


def _pallas_gnsc_up_pair(x, gamma, beta, w, bias, num_groups, eps,
                         stats=None, emit_stats=False):
    """x: UNPAIRED low-res (B, Hl, Wl, C); returns PAIRED high-res
    (B, 2Hl, Wl, 2O)."""
    b, hl, wl, c = x.shape
    o = w.shape[-1]
    n = hl * wl
    r = _row_tile(hl, x.dtype, wdt=2 * wl, c=max(2 * c, 2 * o))
    n_tiles = hl // r
    if stats is None:
        # the 4D stats kernel reads any (B, H, W, C) block layout — run it
        # on the unpaired low-res input directly (no fold needed)
        stats = _compute_stats_4d(x)
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    if up_dense_enabled():
        w2 = _up_pair_weights_dense(w).astype(x.dtype).reshape(9 * c, 2 * o)
    else:
        w2 = _pair_weights(w).astype(x.dtype).reshape(9 * 2 * c, 2 * o)
    bias2 = jnp.concatenate(
        [bias, bias]).astype(jnp.float32).reshape(1, 2 * o) if bias is not None \
        else jnp.zeros((1, 2 * o), jnp.float32)
    x_prev, x_next = _halo_rows(x, r)

    x_spec = pl.BlockSpec((1, r, wl, c), lambda i, t: (i, t, 0, 0),
                          memory_space=pltpu.VMEM)
    hp = pl.BlockSpec((1, 1, wl, c),
                      lambda i, t: (i, jnp.maximum(t - 1, 0), 0, 0),
                      memory_space=pltpu.VMEM)
    hn = pl.BlockSpec((1, 1, wl, c),
                      lambda i, t: (i, jnp.minimum(t + 1, n_tiles - 1), 0, 0),
                      memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((b, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((c, c), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(w2.shape, lambda i, t: (0, 0),
                          memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, 2 * o), lambda i, t: (0, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 2 * r, wl, 2 * o), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)
    out_specs = out_spec
    out_shape = jax.ShapeDtypeStruct((b, 2 * hl, wl, 2 * o), x.dtype)
    if emit_stats:
        ovec = pl.BlockSpec((b, 2 * o), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)
        out_specs = [out_spec, ovec, ovec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, 2 * o), jnp.float32),
                     jax.ShapeDtypeStruct((b, 2 * o), jnp.float32)]
    ledger.track(2 * (b * 2 * hl * wl) * w2.shape[0] * (2 * o),
                 [x, gamma, beta, stats[0], stats[1], gmat, w2, bias2],
                 out_shape)
    return pl.pallas_call(
        functools.partial(_gnsc_up_pair_kernel, n=n, eps=eps,
                          n_tiles=n_tiles, emit_stats=emit_stats),
        grid=(b, n_tiles),
        in_specs=[hp, x_spec, hn, vec_spec, vec_spec, vec_spec, vec_spec,
                  mat_spec, w_spec, bias_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=_compiler_params(2 * r, wl, 2 * max(c, o)),
    )(x_prev, x, x_next, gamma, beta, stats[0], stats[1], gmat, w2, bias2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 8, 9))
def fused_up_paired(x, gamma, beta, w, bias, num_groups, eps, stats_in,
                    has_stats, emit_stats=False):
    """Paired-IO up-block prefix. x: UNPAIRED low-res (B, Hl, Wl, C)
    (one cheap low-res relayout from the paired chain); stats_in: chained
    (B, C) low-res channel statistics (column/row duplication preserves
    them). Returns the PAIRED high-res conv output (B, 2Hl, Wl, 2O)
    [+ folded (B, O) output stats when emit_stats — the tail norm's stats
    pass for free]."""
    out, _ = _up_pair_fwd(x, gamma, beta, w, bias, num_groups, eps,
                          stats_in, has_stats, emit_stats)
    return out


def _up_pair_fwd(x, gamma, beta, w, bias, num_groups, eps, stats_in,
                 has_stats, emit_stats):
    saved = None
    if _use_pallas(x) and x.shape[2] % 16 == 0:
        saved = (tuple(stats_in) if has_stats
                 else tuple(_compute_stats_4d(x)))
        out = _pallas_gnsc_up_pair(x, gamma, beta, w, bias, num_groups, eps,
                                   stats=saved, emit_stats=emit_stats)
        if emit_stats:
            o = w.shape[-1]
            outp, os_, osq = out
            out = (outp, os_[:, :o] + os_[:, o:], osq[:, :o] + osq[:, o:])
    else:
        y = gn_silu_up_conv_reference(x, gamma, beta, w, bias, num_groups,
                                      eps)
        out = pair_array(y)
        if emit_stats:
            osums, osumsq = _out_stats_reference(y)
            out = (out, osums, osumsq)
    return out, (x, gamma, beta, w, bias, stats_in, saved)


def _up_pair_bwd(num_groups, eps, has_stats, emit_stats, residuals, g):
    x, gamma, beta, w, bias, stats_in, saved = residuals
    if saved is not None and bwd_kernel_enabled():
        # emitted stats carry structurally-zero cotangents (see _blockp_bwd)
        gp = g[0] if emit_stats else g
        dx, dgamma, dbeta, dw, dbias = _pallas_up_pair_bwd(
            x, gamma, beta, w, saved[0], saved[1], gp, num_groups, eps)
        return (dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype),
                dw, dbias.astype(bias.dtype),
                jax.tree_util.tree_map(jnp.zeros_like, stats_in))

    def f(x, gamma, beta, w, bias):
        y = gn_silu_up_conv_reference(x, gamma, beta, w, bias, num_groups,
                                      eps)
        out = pair_array(y)
        if emit_stats:
            osums, osumsq = _out_stats_reference(y)
            return out, osums, osumsq
        return out

    ref_out, vjp = jax.vjp(f, x, gamma, beta, w, bias)
    if emit_stats:
        g = (g[0].astype(ref_out[0].dtype), g[1], g[2])
    else:
        g = g.astype(ref_out.dtype)
    grads = vjp(g)
    return grads + (jax.tree_util.tree_map(jnp.zeros_like, stats_in),)


fused_up_paired.defvjp(_up_pair_fwd, _up_pair_bwd)


# ---------------------------------------------------------------------------
# Paired-IO standalone GroupNorm+SiLU (4D blocks, no flatten relayout)
# ---------------------------------------------------------------------------


def _apply4_kernel(x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref,
                   gmat_ref, out_ref, *, n: int, eps: float):
    b = pl.program_id(0)
    c2 = x_ref.shape[-1]
    x = x_ref[0].astype(jnp.float32)
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    y = ((x - mean.reshape(1, 1, c2)) * rstd.reshape(1, 1, c2)
         * gamma_ref[pl.ds(b, 1), :].reshape(1, 1, c2)
         + beta_ref[pl.ds(b, 1), :].reshape(1, 1, c2))
    out_ref[0] = (y * jax.nn.sigmoid(y)).astype(out_ref.dtype)


def _grad_stats4_kernel(x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref,
                        gmat_ref, g_ref, dgamma_ref, dbeta_ref, s1_ref,
                        s2_ref, *, n: int, eps: float):
    b, t = pl.program_id(0), pl.program_id(1)
    r, w2, c2 = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    x = x_ref[0].astype(jnp.float32).reshape(r * w2, c2)
    g = g_ref[0].astype(jnp.float32).reshape(r * w2, c2)
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
        for ref in (dgamma_ref, dbeta_ref, s1_ref, s2_ref):
            ref[pl.ds(b, 1), :] = jnp.zeros_like(ref[pl.ds(b, 1), :])

    dgamma_ref[pl.ds(b, 1), :] += jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta_ref[pl.ds(b, 1), :] += jnp.sum(dy, axis=0, keepdims=True)
    s1_ref[pl.ds(b, 1), :] += jnp.sum(dxhat, axis=0, keepdims=True)
    s2_ref[pl.ds(b, 1), :] += jnp.sum(dxhat * xhat, axis=0, keepdims=True)


def _grad_apply4_kernel(x_ref, gamma_ref, beta_ref, sums_ref, sumsq_ref,
                        gmat_ref, g_ref, s1_ref, s2_ref, dx_ref,
                        *, n: int, eps: float):
    b = pl.program_id(0)
    r, w2, c2 = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    x = x_ref[0].astype(jnp.float32).reshape(r * w2, c2)
    g = g_ref[0].astype(jnp.float32).reshape(r * w2, c2)
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
    dx = rstd * (dxhat - m1 - xhat * m2)
    dx_ref[0] = dx.reshape(r, w2, c2).astype(dx_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_gn_silu_paired(xp, gamma, beta, sums_in, sumsq_in,
                         num_groups, eps, splits, has_stats):
    """silu(gn(x)*gamma+beta) on a PAIRED (B, H, W/2, 2C) activation
    [dual-order when splits], per-ORIGINAL-channel gamma/beta/stats
    (B, C). Reads and writes the paired layout in place — no flatten
    relayout, full 128-lane tiles. Backward recomputes the reference
    composition through the unpaired view."""
    out, _ = _gnsp_fwd(xp, gamma, beta, sums_in, sumsq_in, num_groups, eps,
                       splits, has_stats)
    return out


def _gnsp_fwd(xp, gamma, beta, sums_in, sumsq_in, num_groups, eps, splits,
              has_stats):
    b, h, w2, c2 = xp.shape
    c = c2 // 2
    saved = None
    if _use_pallas(xp):
        if has_stats:
            stats = (sums_in, sumsq_in)
        else:
            sp, ssp = _compute_stats_4d(xp)
            stats = (_fold_stats(sp, splits), _fold_stats(ssp, splits))
        saved = stats
        r = _row_tile(h, xp.dtype, wdt=w2, c=c2,
                      cands=(128, 64, 32, 16, 8))
        x_spec = pl.BlockSpec((1, r, w2, c2), lambda i, t: (i, t, 0, 0),
                              memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((b, c2), lambda i, t: (0, 0),
                                memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((c2, c2), lambda i, t: (0, 0),
                                memory_space=pltpu.VMEM)
        ledger.track(0, xp, jax.ShapeDtypeStruct(xp.shape, xp.dtype))
        out = pl.pallas_call(
            functools.partial(_apply4_kernel, n=h * w2 * 2, eps=eps),
            grid=(b, h // r),
            in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                      mat_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            compiler_params=_compiler_params(r, w2, c2),
        )(xp, _dual_vec(gamma, splits), _dual_vec(beta, splits),
          _dual_vec(stats[0], splits), _dual_vec(stats[1], splits),
          jnp.asarray(_pair_gmat_split(num_groups, c, splits)))
    else:
        x = unpair_array(xp, splits)
        b_, hh, ww, cc = x.shape
        out = group_norm_silu_reference(
            x.reshape(b_, hh * ww, cc), gamma, beta, num_groups,
            eps).reshape(x.shape).astype(xp.dtype)
        out = pair_array(out, splits)
    return out, (xp, gamma, beta, sums_in, sumsq_in, saved)


def _gnsp_bwd(num_groups, eps, splits, has_stats, residuals, g):
    xp, gamma, beta, sums_in, sumsq_in, saved = residuals
    if saved is not None and bwd_kernel_enabled():
        # hand-written paired backward: grad-stats accumulates per-paired-
        # channel reductions, folded to full channels between the calls
        # (the grad-apply group reductions need FULL-channel sums)
        b, h, w2, c2 = xp.shape
        c = c2 // 2
        n = h * w2 * 2
        r = _row_tile(h, xp.dtype, wdt=w2, c=c2,
                      cands=(128, 64, 32, 16, 8))
        gamma_p = _dual_vec(gamma, splits)
        beta_p = _dual_vec(beta, splits)
        sums_p = _dual_vec(saved[0], splits)
        sumsq_p = _dual_vec(saved[1], splits)
        gmat_p = jnp.asarray(_pair_gmat_split(num_groups, c, splits))
        x_spec = pl.BlockSpec((1, r, w2, c2), lambda i, t: (i, t, 0, 0),
                              memory_space=pltpu.VMEM)
        vec_spec = pl.BlockSpec((b, c2), lambda i, t: (0, 0),
                                memory_space=pltpu.VMEM)
        mat_spec = pl.BlockSpec((c2, c2), lambda i, t: (0, 0),
                                memory_space=pltpu.VMEM)
        cp = _compiler_params(r, w2, c2)
        ledger.track(0, xp, g)  # grad-stats pass (reductions only)
        dgamma2, dbeta2, s1_2, s2_2 = pl.pallas_call(
            functools.partial(_grad_stats4_kernel, n=n, eps=eps),
            grid=(b, h // r),
            in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                      mat_spec, x_spec],
            out_specs=[vec_spec] * 4,
            out_shape=[jax.ShapeDtypeStruct((b, c2), jnp.float32)] * 4,
            compiler_params=cp,
        )(xp, gamma_p, beta_p, sums_p, sumsq_p, gmat_p, g)
        s1 = _dual_vec(_fold_stats(s1_2, splits), splits)
        s2 = _dual_vec(_fold_stats(s2_2, splits), splits)
        ledger.track(0, xp, g, jax.ShapeDtypeStruct(xp.shape, xp.dtype))
        dx = pl.pallas_call(
            functools.partial(_grad_apply4_kernel, n=n, eps=eps),
            grid=(b, h // r),
            in_specs=[x_spec, vec_spec, vec_spec, vec_spec, vec_spec,
                      mat_spec, x_spec, vec_spec, vec_spec],
            out_specs=x_spec,
            out_shape=jax.ShapeDtypeStruct(xp.shape, xp.dtype),
            compiler_params=cp,
        )(xp, gamma_p, beta_p, sums_p, sumsq_p, gmat_p, g, s1, s2)
        return (dx, _fold_stats(dgamma2, splits).astype(gamma.dtype),
                _fold_stats(dbeta2, splits).astype(beta.dtype),
                jnp.zeros_like(sums_in), jnp.zeros_like(sumsq_in))

    def f(xp, gamma, beta):
        x = unpair_array(xp, splits)
        b_, hh, ww, cc = x.shape
        out = group_norm_silu_reference(
            x.reshape(b_, hh * ww, cc), gamma, beta, num_groups,
            eps).reshape(x.shape).astype(xp.dtype)
        return pair_array(out, splits)

    _, vjp = jax.vjp(f, xp, gamma, beta)
    grads = vjp(g)
    return grads + (jnp.zeros_like(sums_in), jnp.zeros_like(sumsq_in))


fused_gn_silu_paired.defvjp(_gnsp_fwd, _gnsp_bwd)


# ---------------------------------------------------------------------------
# Hand-written backward for the paired up kernel
# ---------------------------------------------------------------------------
#
# Backward of out = conv3x3_pair(up2x(silu(gn(x)))) without ever
# materializing the upsampled activation: one kernel recomputes the
# upsampled strip from the LOW-res x (exactly like the forward), runs the
# mirrored transpose-conv taps against the high-res cotangent, accumulates
# dW/dbias, and emits the CHANNEL-FOLDED pre-pool cotangent (parities of a
# pair are W-copies of the same low pixel, so their cotangents add — a lane
# fold in VMEM). Rows then fold in XLA via a layout-free major-dim split,
# and the GroupNorm/SiLU backward runs as one cheap low-res elementwise
# pass.


def _up_pair_bwd_kernel(gp_ref, gc_ref, gn_ref, xp_ref, xc_ref, xn_ref,
                        gamma_ref, beta_ref, sums_ref, sumsq_ref, gmat_ref,
                        wt_ref, dw_ref, db_ref, ds_ref,
                        *, n: int, eps: float, n_tiles: int):
    b, t = pl.program_id(0), pl.program_id(1)
    r, wl, c = xc_ref.shape[1], xc_ref.shape[2], xc_ref.shape[3]
    c2, o2 = 2 * c, gc_ref.shape[-1]
    r2 = 2 * r
    mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                            sumsq_ref[pl.ds(b, 1), :], gmat_ref[:], n, eps)
    gamma = (gamma_ref[pl.ds(b, 1), :] * rstd).reshape(1, 1, c)
    beta = (beta_ref[pl.ds(b, 1), :]
            - gamma_ref[pl.ds(b, 1), :] * rstd * mean).reshape(1, 1, c)
    top_live = (t > 0).astype(jnp.float32)
    bot_live = (t < n_tiles - 1).astype(jnp.float32)
    mm_dtype = xc_ref.dtype

    def ns(v, live=None):
        y = v.astype(jnp.float32) * gamma + beta
        y = y * jax.nn.sigmoid(y)
        if live is not None:
            y = y * live
        return y.astype(mm_dtype)

    def pair2(y):
        return jnp.concatenate([y, y], axis=-1)

    # the same upsampled padded strip the forward builds
    mid_up = jnp.repeat(pair2(ns(xc_ref[0])), 2, axis=0)
    spad = jnp.concatenate([pair2(ns(xp_ref[0], top_live)), mid_up,
                            pair2(ns(xn_ref[0], bot_live))], axis=0)
    zcol_s = jnp.zeros((r2 + 2, 1, c2), mm_dtype)
    spad = jnp.concatenate([zcol_s, spad, zcol_s], axis=1)
    # zero-padded cotangent strip (halo rows zeroed at the image edges)
    gpad = _g_pad(gp_ref, gc_ref, gn_ref, r2, wl, o2, top_live, bot_live,
                  mm_dtype)

    @pl.when((b == 0) & (t == 0))
    def _():
        dw_ref[:] = jnp.zeros_like(dw_ref)
        db_ref[:] = jnp.zeros_like(db_ref)

    s_c = jax.lax.slice(spad, (1, 1, 0), (1 + r2, 1 + wl, c2))
    s_mm = s_c.reshape(r2 * wl, c2)
    ds = jnp.zeros((r2 * wl, c2), jnp.float32)
    for dr in range(3):
        for dj in range(3):
            gs = jax.lax.slice(gpad, (2 - dr, 2 - dj, 0),
                               (2 - dr + r2, 2 - dj + wl, o2))
            gs = gs.reshape(r2 * wl, o2)
            dw_ref[pl.ds((dr * 3 + dj) * c2, c2), :] += jax.lax.dot_general(
                s_mm, gs, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            ds = ds + jax.lax.dot_general(
                gs, wt_ref[pl.ds((dr * 3 + dj) * o2, o2), :],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    db_ref[:] += jnp.sum(gc_ref[0].astype(jnp.float32).reshape(r2 * wl, o2),
                         axis=0, keepdims=True)
    # lane fold: a pair's two parities are W-copies of the same low pixel
    ds = ds.reshape(r2, wl, c2)
    ds_f = (jax.lax.slice(ds, (0, 0, 0), (r2, wl, c))
            + jax.lax.slice(ds, (0, 0, c), (r2, wl, c2)))
    ds_ref[0] = ds_f.astype(ds_ref.dtype)


def _pallas_up_pair_bwd(x, gamma, beta, w, sums, sumsq, g, num_groups, eps):
    """x: UNPAIRED low-res (B, Hl, Wl, C); g: PAIRED high-res cotangent
    (B, 2Hl, Wl, 2O). Returns (dx, dgamma, dbeta, dw, dbias)."""
    b, hl, wl, c = x.shape
    o = w.shape[-1]
    n = hl * wl
    r = _row_tile(hl, x.dtype, wdt=2 * wl, c=max(2 * c, 2 * o))
    n_tiles = hl // r
    gmat = jnp.asarray(_group_matrix(num_groups, c))
    w_p = _pair_weights(w).astype(x.dtype)
    wt = jnp.transpose(w_p, (0, 1, 3, 2)).reshape(9 * 2 * o, 2 * c)
    x_prev, x_next = _halo_rows(x, r)
    g_prev, g_next = _halo_rows(g, 2 * r)

    def blk(rows, ci):
        return pl.BlockSpec((1, rows, wl, ci), lambda i, t: (i, t, 0, 0),
                            memory_space=pltpu.VMEM)

    def halo(ci, lo):
        return (pl.BlockSpec((1, 1, wl, ci),
                             lambda i, t: (i, jnp.maximum(t - 1, 0), 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, wl, ci),
                             lambda i, t: (i, jnp.minimum(t + 1, lo), 0, 0),
                             memory_space=pltpu.VMEM))

    def cvec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i, t: (0, 0),
                            memory_space=pltpu.VMEM)

    gp, gn_ = halo(2 * o, n_tiles - 1)
    xp_, xn_ = halo(c, n_tiles - 1)
    ledger.track(2 * (2 * 9 * (b * 2 * hl * wl) * (2 * c) * (2 * o)),
                 [g, x, gamma, beta, sums, sumsq, gmat, wt],
                 [jax.ShapeDtypeStruct((9 * 2 * c, 2 * o), jnp.float32),
                  jax.ShapeDtypeStruct((b, 2 * hl, wl, c), jnp.float32)])
    dw9, db, ds = pl.pallas_call(
        functools.partial(_up_pair_bwd_kernel, n=n, eps=eps,
                          n_tiles=n_tiles),
        grid=(b, n_tiles),
        in_specs=[gp, blk(2 * r, 2 * o), gn_, xp_, blk(r, c), xn_,
                  cvec(b, c), cvec(b, c), cvec(b, c), cvec(b, c),
                  cvec(c, c), cvec(9 * 2 * o, 2 * c)],
        out_specs=[cvec(9 * 2 * c, 2 * o), cvec(1, 2 * o),
                   blk(2 * r, c)],
        out_shape=[jax.ShapeDtypeStruct((9 * 2 * c, 2 * o), jnp.float32),
                   jax.ShapeDtypeStruct((1, 2 * o), jnp.float32),
                   jax.ShapeDtypeStruct((b, 2 * hl, wl, c), jnp.float32)],
        compiler_params=_compiler_params(2 * r, wl, 2 * max(c, o)),
    )(g_prev, g, g_next, x_prev, x, x_next, gamma, beta, sums, sumsq, gmat,
      wt)

    # rows fold via a layout-free major-dim split; then ONE low-res
    # elementwise pass for the SiLU/GroupNorm backward
    ds_low = ds.reshape(b, hl, 2, wl, c).sum(axis=2)
    mean, rstd = _mean_rstd(sums, sumsq, gmat, n, eps)
    x32 = x.astype(jnp.float32)
    xhat = (x32 - mean[:, None, None, :]) * rstd[:, None, None, :]
    a = xhat * gamma[:, None, None, :] + beta[:, None, None, :]
    sig = jax.nn.sigmoid(a)
    da = ds_low * (sig * (1.0 + a * (1.0 - sig)))
    dgamma = jnp.sum(da * xhat, axis=(1, 2))
    dbeta = jnp.sum(da, axis=(1, 2))
    m1 = _gc(gamma * dbeta / n, gmat)
    m2 = _gc(gamma * dgamma / n, gmat)
    dx = (da * (rstd * gamma)[:, None, None, :]
          - (x32 - mean[:, None, None, :])
          * (rstd * rstd * m2)[:, None, None, :]
          - (rstd * m1)[:, None, None, :]).astype(x.dtype)
    db2 = db.reshape(2 * o)
    dbias = db2[:o] + db2[o:]
    dw = _fold_dw(dw9, c, o, None).astype(w.dtype)
    return dx, dgamma, dbeta, dw, dbias
