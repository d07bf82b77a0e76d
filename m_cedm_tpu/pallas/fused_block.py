"""Whole-UNetBlock "megablock" Pallas kernel: both convs in one program.

The ADM residual block (reference adm_blocks.py:158-171) is

    h   = conv0(silu(gn0(xin)))
    out = conv1(silu(gn1(h) * film_scale + film_shift)) + skip(xin)

where xin is the block input (for decoder blocks, the channel-concat of the
trunk and the encoder skip) and skip is identity or a 1x1 projection.

Round 2 ran this as TWO fused kernels (pallas/fused_norm_conv.py): conv0 and
the block tail, with h making a full HBM round trip between them, the
residual re-read from HBM by the tail, and — for decoder blocks — the
skip-concat materialized by XLA beforehand (read x1 + read x2 + write the
2C concat). The round-3 device profile put 65% of the forward in these
kernels plus ~1 ms of XLA concat/formatting between them.

This kernel runs the WHOLE block as one Pallas program with grid
(B, 2 phases, H/R row tiles) and keeps everything between the two convs
resident in VMEM scratch:

    phase 0 (per row tile): norm0+silu+conv0 exactly as the round-2 kernel
        (halo rows ride in as thin pre-sliced arrays; 9 shifted MXU matmuls
        over a zero-padded strip) — but the output tile lands in a
        whole-image VMEM scratch instead of HBM, conv0-out channel
        statistics accumulate into a scratch vector (norm1's stats pass),
        and the input tile(s) are stashed in scratch for the residual.
    phase 1 (per row tile): norm1(+FiLM)+silu+conv1 reads its (R+2)-row
        input window straight from the scratch image (no HBM h, no halo
        DMAs — every row of this sample is already resident), adds the
        skip path from the stashed input (identity, or the 1x1 projection
        as a 10th MXU matmul), and writes the only HBM output.

HBM traffic per block call: read xin + write out — 2 image passes instead
of round 2's 5 (7 with the decoder concat). The TPU grid is sequential, so
all of phase 0 completes (stats included) before phase 1 runs for a given
batch element; scratch persists across grid steps.

Decoder blocks: x1/x2 ride in as SEPARATE row-tiled inputs and the concat
is never materialized anywhere — each conv0 tap contracts two weight-row
slices (the round-2 dual-input kernels lost because six streams + four
halo gathers per step beat one XLA concat; here the concat disappears from
HBM entirely while the halo structure stays the standard thin-row one).

Scratch-image alignment: conv1's window for row tile t is image rows
[tR-1, tR+R]; the scratch stores conv0-out shifted DOWN by 8 rows (zero
rows [0,8) and [H+8, H+16)), so both the phase-0 store (offset tR+8) and
the phase-1 load (offset tR, length R+16) start on 8-row sublane
boundaries. The (R+2)-row window is a static slice of the loaded block.

Numerics match the round-2 chained-stats path exactly: the matmuls run in
the network dtype, accumulation is fp32, and norm1 consumes statistics of
the fp32 accumulator while normalizing the dtype-rounded tensor (the
documented chained-stats divergence, bounded by the interpret-mode tests).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from m_cedm_tpu.pallas.fused_norm import (
    _compute_stats,
    _group_matrix,
    _mean_rstd,
    _tile_rows,
    pallas_enabled,
)
from m_cedm_tpu.pallas.fused_norm_conv import (
    _compiler_params,
    _halo_rows,
    _row_tile,
    gn_silu_conv_block_reference,
    gn_silu_conv_reference,
    gn_silu_up_conv_reference,
    _out_stats_reference,
)

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_IMPORTED = True
except ImportError:  # pragma: no cover
    _PALLAS_IMPORTED = False


def mega_enabled() -> bool:
    """Gate for the whole-block megakernel (MCEDM_MEGA; default OFF until
    the on-device A/B lands). "1" replaces the round-2 two-kernel path."""
    return os.environ.get("MCEDM_MEGA", "0") == "1"


def fused_unet_block_reference(x, g0, b0, w0, bias0, g1, b1, w1, bias1,
                               groups0: int, groups1: int, eps: float,
                               x2=None, skip_w=None, skip_b=None,
                               emit_stats: bool = False, up: bool = False):
    """Identical-math reference: the two-stage composition via the round-2
    reference helpers. xin = concat(x, x2); skip = identity when skip_w is
    None (requires xin channels == O), else xin @ skip_w + skip_b. up=True
    is the up-block: conv0 sees the 2x-nearest-upsampled activation and the
    residual is the 2x-upsampled input (reference adm_blocks.py:158-171
    with up=True; 1x1 skip conv commutes with nearest upsampling)."""
    xin = jnp.concatenate([x, x2], axis=-1) if x2 is not None else x
    if up:
        h = gn_silu_up_conv_reference(xin, g0, b0, w0, bias0, groups0, eps)
        res = jnp.repeat(jnp.repeat(xin, 2, axis=1), 2, axis=2)
    else:
        h = gn_silu_conv_reference(xin, g0, b0, w0, bias0, groups0, eps)
        res = xin
    out = gn_silu_conv_block_reference(h, g1, b1, w1, bias1, groups1, eps,
                                       residual=res, skip_w=skip_w,
                                       skip_b=skip_b)
    if emit_stats:
        osums, osumsq = _out_stats_reference(out)
        return out, osums, osumsq
    return out


def _mega_kernel(*refs, n: int, n1: int, eps: float, n_tiles: int,
                 h_pad: int, r: int, dual: bool, proj: bool,
                 emit_stats: bool, up: bool):
    """Grid (B, 2, H/R). See module docstring for the phase structure.

    up=True is the decoder up-block variant: the input rides in WIDTH-
    pre-upsampled (XLA repeat at half-res cost — Mosaic rejects sublane
    interleaves); phase 0 normalizes at low res, row-upsamples in VMEM
    (axis-0 repeat — the untiled axis), and convolves at high res into the
    scratch image; phase 1's residual row-upsamples the stashed low-res
    input likewise. n is the norm0 pixel count (low res for up), n1 the
    norm1 pixel count (conv0-out resolution)."""
    (xp_ref, xc_ref, xn_ref), rest = refs[:3], refs[3:]
    xp2_ref = xc2_ref = xn2_ref = None
    if dual:
        (xp2_ref, xc2_ref, xn2_ref), rest = rest[:3], rest[3:]
    (g0_ref, b0_ref, sums_ref, sumsq_ref, gmat0_ref, w0_ref, bias0_ref,
     g1_ref, b1_ref, gmat1_ref, w1_ref, bias1_ref), rest = rest[:12], rest[12:]
    skw_ref = skb_ref = None
    if proj:
        (skw_ref, skb_ref), rest = rest[:2], rest[2:]
    out_ref, rest = rest[0], rest[1:]
    osums_ref = osumsq_ref = None
    if emit_stats:
        (osums_ref, osumsq_ref), rest = rest[:2], rest[2:]
    # scratch refs come after the outputs in the kernel signature
    if dual:
        h_s, r1_s, r2_s, hsum_s, hsq_s = rest
    else:
        (h_s, r1_s, hsum_s, hsq_s), r2_s = rest, None

    b, p, t = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    wdt, c1 = xc_ref.shape[2], xc_ref.shape[3]
    c2 = xc2_ref.shape[3] if dual else 0
    c = c1 + c2
    o = out_ref.shape[-1]
    ro = 2 * r if up else r  # conv0-out rows per tile
    mm_dtype = xc_ref.dtype
    top_live = (t > 0).astype(jnp.float32)
    bot_live = (t < n_tiles - 1).astype(jnp.float32)

    def norm_pad(xp, xc, xn, gamma_s, beta_s, ci):
        """(Ro+2, W+2, Ci) normalized+silu'd, halo/W-zero-padded strip — the
        round-2 pad-v2 structure (pieces normalized separately, one concat
        per axis in the matmul dtype). For up, the mid rows interleave 2x in
        VMEM and the single halo rows stand for themselves (high-res rows
        2tR-1 / 2tR+2R are the 2nd/1st copies of low-res rows tR-1 / tR+R)."""
        zcol = jnp.zeros((ro + 2, 1, ci), mm_dtype)

        def ns(v, live=None):
            y = v.astype(jnp.float32) * gamma_s + beta_s
            y = y * jax.nn.sigmoid(y)
            if live is not None:
                y = y * live
            return y.astype(mm_dtype)

        mid = ns(xc[0])
        if up:
            mid = jnp.repeat(mid, 2, axis=0)
        y = jnp.concatenate([ns(xp[0], top_live), mid,
                             ns(xn[0], bot_live)], axis=0)
        return jnp.concatenate([zcol, y, zcol], axis=1)

    @pl.when(p == 0)
    def _phase0():
        mean, rstd = _mean_rstd(sums_ref[pl.ds(b, 1), :],
                                sumsq_ref[pl.ds(b, 1), :], gmat0_ref[:],
                                n, eps)
        gamma = (g0_ref[pl.ds(b, 1), :] * rstd).reshape(1, 1, c)
        beta = (b0_ref[pl.ds(b, 1), :]
                - g0_ref[pl.ds(b, 1), :] * rstd * mean).reshape(1, 1, c)

        @pl.when(t == 0)
        def _():
            # zero the scratch image's 8-row top/bottom pads once per run
            # (they are never written afterwards) and this sample's conv0-out
            # statistics accumulator
            @pl.when(b == 0)
            def _():
                zrows = jnp.zeros((8, wdt, o), mm_dtype)
                h_s[pl.ds(0, 8)] = zrows
                h_s[pl.ds(h_pad - 8, 8)] = zrows

            hsum_s[:] = jnp.zeros_like(hsum_s)
            hsq_s[:] = jnp.zeros_like(hsq_s)

        ypad = norm_pad(xp_ref, xc_ref, xn_ref,
                        jax.lax.slice(gamma, (0, 0, 0), (1, 1, c1)),
                        jax.lax.slice(beta, (0, 0, 0), (1, 1, c1)), c1)
        ypad2 = None
        if dual:
            ypad2 = norm_pad(xp2_ref, xc2_ref, xn2_ref,
                             jax.lax.slice(gamma, (0, 0, c1), (1, 1, c)),
                             jax.lax.slice(beta, (0, 0, c1), (1, 1, c)), c2)

        acc = jnp.broadcast_to(bias0_ref[:].astype(jnp.float32),
                               (ro * wdt, o))
        for dr in range(3):
            for dw in range(3):
                blk = jax.lax.slice(ypad, (dr, dw, 0),
                                    (dr + ro, dw + wdt, c1))
                acc = acc + jax.lax.dot_general(
                    blk.reshape(ro * wdt, c1),
                    w0_ref[pl.ds((dr * 3 + dw) * c, c1), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if dual:
                    blk2 = jax.lax.slice(ypad2, (dr, dw, 0),
                                         (dr + ro, dw + wdt, c2))
                    acc = acc + jax.lax.dot_general(
                        blk2.reshape(ro * wdt, c2),
                        w0_ref[pl.ds((dr * 3 + dw) * c + c1, c2), :],
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
        h_s[pl.ds(8 + t * ro, ro)] = acc.reshape(ro, wdt, o).astype(mm_dtype)
        hsum_s[:] += jnp.sum(acc, axis=0, keepdims=True)
        hsq_s[:] += jnp.sum(acc * acc, axis=0, keepdims=True)
        # stash the input tile(s) for the phase-1 skip path
        r1_s[pl.ds(t * r, r)] = xc_ref[0].astype(mm_dtype)
        if dual:
            r2_s[pl.ds(t * r, r)] = xc2_ref[0].astype(mm_dtype)

    @pl.when(p == 1)
    def _phase1():
        mean1, rstd1 = _mean_rstd(hsum_s[:], hsq_s[:], gmat1_ref[:], n1, eps)
        gamma1 = (g1_ref[pl.ds(b, 1), :] * rstd1).reshape(1, 1, o)
        beta1 = (b1_ref[pl.ds(b, 1), :]
                 - g1_ref[pl.ds(b, 1), :] * rstd1 * mean1).reshape(1, 1, o)
        # the (Ro+2)-row window straight from the resident scratch image:
        # aligned load [tRo, tRo+Ro+16), static slice to rows [7, Ro+9)
        hwin = h_s[pl.ds(t * ro, ro + 16)]
        hwin = jax.lax.slice(hwin, (7, 0, 0), (ro + 9, wdt, o))
        y = hwin.astype(jnp.float32) * gamma1 + beta1
        y = y * jax.nn.sigmoid(y)
        # off-image halo rows contribute zeros (scratch pads hold zeros, but
        # beta shifts them — mask post-activation like the round-2 kernels)
        idx = jax.lax.broadcasted_iota(jnp.int32, (ro + 2, 1, 1), 0)
        live = jnp.where(idx == 0, top_live,
                         jnp.where(idx == ro + 1, bot_live, 1.0))
        y = (y * live).astype(mm_dtype)
        zcol = jnp.zeros((ro + 2, 1, o), mm_dtype)
        ypad1 = jnp.concatenate([zcol, y, zcol], axis=1)

        acc = jnp.broadcast_to(bias1_ref[:].astype(jnp.float32),
                               (ro * wdt, o))
        for dr in range(3):
            for dw in range(3):
                blk = jax.lax.slice(ypad1, (dr, dw, 0),
                                    (dr + ro, dw + wdt, o))
                acc = acc + jax.lax.dot_general(
                    blk.reshape(ro * wdt, o),
                    w1_ref[pl.ds((dr * 3 + dw) * o, o), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

        res1 = r1_s[pl.ds(t * r, r)]
        if up:
            # the residual's row interleave (the width was pre-repeated
            # before the kernel; the stash holds low-res rows)
            res1 = jnp.repeat(res1, 2, axis=0)
        if proj:
            acc = acc + jax.lax.dot_general(
                res1.reshape(ro * wdt, c1), skw_ref[pl.ds(0, c1), :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if dual:
                res2 = r2_s[pl.ds(t * r, r)]
                acc = acc + jax.lax.dot_general(
                    res2.reshape(ro * wdt, c2), skw_ref[pl.ds(c1, c2), :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            acc = acc + skb_ref[:].astype(jnp.float32)
        else:
            acc = acc + res1.astype(jnp.float32).reshape(ro * wdt, o)
        out_ref[0] = acc.reshape(ro, wdt, o).astype(out_ref.dtype)
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


def _mega_row_tile(h: int, wdt: int, c: int, o: int, dtype,
                   up: bool = False) -> int:
    """Row tile for the megakernel: start from the standard sweep winner and
    shrink until the estimated Mosaic stack (the concurrently-materialized
    tap slices of both phases dominate) fits the hard 64 MB scoped ceiling.
    For up, each input row tile produces 2x output rows (and the width is
    pre-doubled), so the estimate uses the output-tile footprint."""
    r = _row_tile(h, dtype)
    if r == 0:
        return 0
    bytes_per = 4 if dtype == jnp.float32 else 2
    mult = 4 if up else 1
    while (r > 8 and h % (r // 2) == 0
           and r * wdt * (c + o) * bytes_per * 10 * mult > 48 * 2 ** 20):
        r //= 2
    return r


def _pallas_mega(x, g0, b0, w0, bias0, g1, b1, w1, bias1, groups0, groups1,
                 eps, x2=None, skip_w=None, skip_b=None, stats=None,
                 emit_stats=False, up=False):
    b, h, wl, c1 = x.shape
    c2 = x2.shape[-1] if x2 is not None else 0
    c = c1 + c2
    o = w1.shape[-1]
    n = h * wl
    dual = x2 is not None
    assert not (dual and up)
    proj = skip_w is not None
    r = _mega_row_tile(h, wl, c, o, x.dtype, up=up)
    n_tiles = h // r
    if stats is not None:
        # chained: (sums, sumsq) of the LOW-res input (W duplication
        # preserves per-channel mean/var, so these serve the up variant too)
        sums, sumsq = stats
    else:
        tile = _tile_rows(n)
        if not dual:
            sums, sumsq = _compute_stats(x.reshape(b, n, c), tile)
        else:
            s1, ss1 = _compute_stats(x.reshape(b, n, c1), tile)
            s2, ss2 = _compute_stats(x2.reshape(b, n, c2), tile)
            sums = jnp.concatenate([s1, s2], axis=-1)
            sumsq = jnp.concatenate([ss1, ss2], axis=-1)
    if up:
        # the width interleave is impossible in-kernel (Mosaic rejects
        # sublane-interleaving shape casts) — pre-repeat W in XLA at
        # half-res cost; rows interleave inside the kernel
        x = jnp.repeat(x, 2, axis=2)
    wdt = x.shape[2]
    ro = 2 * r if up else r
    h_out = 2 * h if up else h
    n1 = h_out * wdt
    h_pad = h_out + 16
    gmat0 = jnp.asarray(_group_matrix(groups0, c))
    gmat1 = jnp.asarray(_group_matrix(groups1, o))
    w0_2 = w0.astype(x.dtype).reshape(9 * c, o)
    w1_2 = w1.astype(x.dtype).reshape(9 * o, o)
    bias0_2 = (bias0 if bias0 is not None
               else jnp.zeros((o,))).astype(jnp.float32).reshape(1, o)
    bias1_2 = (bias1 if bias1 is not None
               else jnp.zeros((o,))).astype(jnp.float32).reshape(1, o)

    def x_spec(ci):
        # phase 0 walks the tiles; phase 1 parks on tile 0 (one redundant
        # tile fetch per phase transition — the data itself comes from
        # scratch in phase 1)
        return pl.BlockSpec(
            (1, r, wdt, ci),
            lambda i, p, t: (i, jnp.where(p == 0, t, 0), 0, 0),
            memory_space=pltpu.VMEM)

    def halo_specs(ci):
        return (pl.BlockSpec(
                    (1, 1, wdt, ci),
                    lambda i, p, t: (i, jnp.where(p == 0,
                                                  jnp.maximum(t - 1, 0), 0),
                                     0, 0),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(
                    (1, 1, wdt, ci),
                    lambda i, p, t: (i, jnp.where(p == 0,
                                                  jnp.minimum(t + 1,
                                                              n_tiles - 1),
                                                  0), 0, 0),
                    memory_space=pltpu.VMEM))

    def const_spec(rows, cols):
        return pl.BlockSpec((rows, cols), lambda i, p, t: (0, 0),
                            memory_space=pltpu.VMEM)

    vec0 = const_spec(b, c)
    vec1 = const_spec(b, o)
    hp1, hn1 = halo_specs(c1)
    x_prev, x_next = _halo_rows(x, r)
    in_specs = [hp1, x_spec(c1), hn1]
    inputs = [x_prev, x, x_next]
    if dual:
        hp2, hn2 = halo_specs(c2)
        x2_prev, x2_next = _halo_rows(x2, r)
        in_specs += [hp2, x_spec(c2), hn2]
        inputs += [x2_prev, x2, x2_next]
    in_specs += [vec0, vec0, vec0, vec0, const_spec(c, c),
                 const_spec(9 * c, o), const_spec(1, o),
                 vec1, vec1, const_spec(o, o), const_spec(9 * o, o),
                 const_spec(1, o)]
    inputs += [g0, b0, sums, sumsq, gmat0, w0_2, bias0_2,
               g1, b1, gmat1, w1_2, bias1_2]
    if proj:
        in_specs += [const_spec(c, o), const_spec(1, o)]
        skb2 = (skip_b if skip_b is not None
                else jnp.zeros((o,))).astype(jnp.float32).reshape(1, o)
        inputs += [skip_w.astype(x.dtype), skb2]

    out_spec = pl.BlockSpec(
        (1, ro, wdt, o),
        lambda i, p, t: (i, jnp.where(p == 1, t, 0), 0, 0),
        memory_space=pltpu.VMEM)
    out_specs = out_spec
    out_shape = jax.ShapeDtypeStruct((b, h_out, wdt, o), x.dtype)
    if emit_stats:
        ovec = pl.BlockSpec((b, o), lambda i, p, t: (0, 0),
                            memory_space=pltpu.VMEM)
        out_specs = [out_spec, ovec, ovec]
        out_shape = [out_shape,
                     jax.ShapeDtypeStruct((b, o), jnp.float32),
                     jax.ShapeDtypeStruct((b, o), jnp.float32)]
    scratch = [pltpu.VMEM((h_pad, wdt, o), x.dtype),       # conv0-out image
               pltpu.VMEM((h, wdt, c1), x.dtype)]          # stashed input
    if dual:
        scratch.append(pltpu.VMEM((h, wdt, c2), x.dtype))
    scratch += [pltpu.VMEM((1, o), jnp.float32),           # conv0-out sums
                pltpu.VMEM((1, o), jnp.float32)]           # conv0-out sumsq
    cp = _compiler_params(ro, wdt, c + o)
    return pl.pallas_call(
        functools.partial(_mega_kernel, n=n, n1=n1, eps=eps, n_tiles=n_tiles,
                          h_pad=h_pad, r=r, dual=dual, proj=proj,
                          emit_stats=emit_stats, up=up),
        grid=(b, 2, n_tiles),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        **({"compiler_params": cp} if cp else {}),
    )(*inputs)


def _use_mega(x, x2, o, up: bool = False) -> bool:
    from m_cedm_tpu.pallas.fused_norm_conv import _use_pallas

    if not _use_pallas(x):
        return False
    if x2 is not None and not _use_pallas(x2):
        return False
    return o % 8 == 0 and _mega_row_tile(
        x.shape[1], x.shape[2],
        x.shape[-1] + (x2.shape[-1] if x2 is not None else 0), o,
        x.dtype, up=up) > 0


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14, 15, 16, 17, 18))
def _mega_core(x, g0, b0, w0, bias0, g1, b1, w1, bias1, x2, skip_w, skip_b,
               stats_in, groups0, groups1, eps, emit_stats, has_stats, flags):
    out, _ = _mega_fwd(x, g0, b0, w0, bias0, g1, b1, w1, bias1, x2, skip_w,
                       skip_b, stats_in, groups0, groups1, eps, emit_stats,
                       has_stats, flags)
    return out


def _mega_fwd(x, g0, b0, w0, bias0, g1, b1, w1, bias1, x2, skip_w, skip_b,
              stats_in, groups0, groups1, eps, emit_stats, has_stats, flags):
    has_bias0, has_bias1, has_x2, has_proj, has_skb, up = flags
    if _use_mega(x, x2 if has_x2 else None, w1.shape[-1], up=up):
        out = _pallas_mega(
            x, g0, b0, w0, bias0 if has_bias0 else None,
            g1, b1, w1, bias1 if has_bias1 else None,
            groups0, groups1, eps,
            x2=x2 if has_x2 else None,
            skip_w=skip_w if has_proj else None,
            skip_b=skip_b if (has_proj and has_skb) else None,
            stats=tuple(stats_in) if has_stats else None,
            emit_stats=emit_stats, up=up)
        if emit_stats:
            out = tuple(out)
    else:
        out = fused_unet_block_reference(
            x, g0, b0, w0, bias0 if has_bias0 else None,
            g1, b1, w1, bias1 if has_bias1 else None,
            groups0, groups1, eps,
            x2=x2 if has_x2 else None,
            skip_w=skip_w if has_proj else None,
            skip_b=skip_b if (has_proj and has_skb) else None,
            emit_stats=emit_stats, up=up)
    return out, (x, g0, b0, w0, bias0, g1, b1, w1, bias1, x2, skip_w, skip_b,
                 stats_in)


def _mega_bwd(groups0, groups1, eps, emit_stats, has_stats, flags,
              residuals, g):
    (x, g0, b0, w0, bias0, g1, b1, w1, bias1, x2, skip_w, skip_b,
     stats_in) = residuals
    has_bias0, has_bias1, has_x2, has_proj, has_skb, up = flags

    def f(x, g0, b0, w0, bias0, g1, b1, w1, bias1, x2, skip_w, skip_b):
        return fused_unet_block_reference(
            x, g0, b0, w0, bias0 if has_bias0 else None,
            g1, b1, w1, bias1 if has_bias1 else None,
            groups0, groups1, eps,
            x2=x2 if has_x2 else None,
            skip_w=skip_w if has_proj else None,
            skip_b=skip_b if (has_proj and has_skb) else None,
            emit_stats=emit_stats, up=up)

    _, vjp = jax.vjp(f, x, g0, b0, w0, bias0, g1, b1, w1, bias1, x2,
                     skip_w, skip_b)
    grads = vjp(g)
    return grads + (jax.tree_util.tree_map(jnp.zeros_like, stats_in),)


_mega_core.defvjp(_mega_fwd, _mega_bwd)


def fused_unet_block(x, g0, b0, w0, bias0, g1, b1, w1, bias1,
                     groups0: int, groups1: int, eps: float = 1e-5, *,
                     x2=None, skip_w=None, skip_b=None, stats=None,
                     emit_stats: bool = False, up: bool = False):
    """The whole ADM residual block as one Pallas program (see module
    docstring). g0/b0: folded (B, Cin) norm0 modulation; g1/b1: folded
    (B, O) norm1+FiLM modulation; w0: (3, 3, Cin, O); w1: (3, 3, O, O);
    skip_w: (Cin, O) 1x1 projection (None = identity skip, requires
    Cin == O); stats: chained (sums, sumsq) channel statistics of
    concat(x, x2); emit_stats: also return the output's channel statistics;
    up: the decoder up-block variant (conv0 on the 2x-upsampled activation,
    residual upsampled — output is 2x the input resolution).

    Pallas on TPU; identical-math XLA composition elsewhere. Backward is
    XLA autodiff of the reference composition (the megakernel serves the
    sampling path; train traces use the round-2 per-conv kernels with the
    hand-written backward)."""
    zc = jnp.zeros((0,), jnp.float32)
    flags = (bias0 is not None, bias1 is not None, x2 is not None,
             skip_w is not None, skip_b is not None, up)
    return _mega_core(
        x, g0, b0, w0,
        bias0 if bias0 is not None else zc,
        g1, b1, w1,
        bias1 if bias1 is not None else zc,
        x2 if x2 is not None else zc,
        skip_w if skip_w is not None else zc,
        skip_b if skip_b is not None else zc,
        tuple(stats) if stats is not None else (zc, zc),
        groups0, groups1, eps, emit_stats, stats is not None, flags)
