"""Shared neural-net layers (flax.linen, NHWC) with reference-matching init.

Parity targets:
  - weight_init modes:            models/adm_blocks.py:10-15
  - Linear / Conv2d w/ resampling: models/adm_blocks.py:19-82
  - GroupNorm conventions:        models/adm_blocks.py:86-97 (eps 1e-5,
                                  groups=min(32, C//4)) and
                                  models/ddim_blocks.py:62-63 (eps 1e-6, 32)

TPU-first design notes:
  * NHWC everywhere — the native layout for XLA:TPU convolutions; the MXU sees
    convs as large implicit GEMMs without transposes.
  * All reference configs use resample_filter=[1,1]; with that filter the EDM
    "conv_transpose x4 filter" upsample is exactly nearest-neighbour 2x and the
    downsample is exactly 2x2 mean pooling, so we implement them as
    jnp.repeat / avg-pool which XLA fuses into neighbouring ops (no grouped
    conv needed). General filters would use a depthwise conv.
"""
from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


_CONV_FUSION = True
_TRAIN_TRACE = False


def train_trace() -> bool:
    """True while a grad-bearing graph is being traced in "train" fusion
    mode (fused kernels with hand-written backwards; stats chaining and
    emission off — chained/emitted stats carry cotangents the backward
    kernels don't model, and the chain's one-saved-pass matters less than
    the backward's)."""
    return _TRAIN_TRACE


def block_fusion_enabled() -> bool:
    """Gate (trace-time) for the whole-block fused tail (residual + stats
    emission in one kernel), separate from per-conv fusion — lets benchmarks
    A/B the block-level fusion against the per-conv-fusion program on the
    same device session. MCEDM_BLOCK_FUSION levels (sampler bisect on TPU
    v5e, 50-step Heun B=16 res128 bf16, same session): "0" none (1208.5 ms),
    "res" residual fusion only (1112.4), "1"/"blocks" (default) + stats
    chaining (1098.2 — the production setting), "all" + fused out head
    (1290.5 — the 2-channel Pallas output write is pathologically slow on
    this Mosaic backend, so the out head stays unfused by default)."""
    import os

    return os.environ.get("MCEDM_BLOCK_FUSION", "1") != "0"


def dual_input_enabled() -> bool:
    """Gate for dual-input (unmaterialized-concat) decoder kernels. Default
    OFF: same-session sampler A/B measured them ~110 ms SLOWER than
    materializing the concat (1201.1 vs 1093.0 ms, 50-step Heun B=16 res128
    bf16) — six row-tiled input streams plus four halo-row gathers per
    kernel cost more than one XLA concat. The cross-block STATS chaining
    they enabled is kept (concat stats = concat of halves' stats) and is
    independent of this gate. MCEDM_DUAL=1 re-enables for re-measurement."""
    import os

    return os.environ.get("MCEDM_DUAL", "0") == "1"


def stats_chain_enabled() -> bool:
    """Gate for conv0 stats emission -> conv1 chained stats inside the fused
    block tail (bisect: MCEDM_BLOCK_FUSION="res" turns only this off).
    Always off in train traces (see train_trace)."""
    import os

    return (not _TRAIN_TRACE
            and os.environ.get("MCEDM_BLOCK_FUSION", "1")
            in ("1", "blocks", "all"))


def out_fusion_enabled() -> bool:
    """Gate for the direct fused out_norm+out_conv head. Default OFF: the
    O=2 output write measured +192 ms on the 50-step sampler (see
    block_fusion_enabled docstring) — enable with MCEDM_BLOCK_FUSION=all
    only to re-measure. See out_head_mode() for the padded variant."""
    import os

    return os.environ.get("MCEDM_BLOCK_FUSION", "1") == "all"


def out_head_mode() -> str:
    """How the out_norm+out_conv head runs (MCEDM_OUT_HEAD):
      "xla" (default): chained-stats norm kernel + XLA conv
      "pad": fused kernel writing zero-padded full-lane output channels +
             an XLA slice to out_ch — measured MUCH slower (1297.6 vs
             1068.0 ms on the 50-step sampler; the minor-dim slice reads
             whole padded tiles), like every other attempt to beat XLA's
             narrow-channel handling on this backend"""
    import os

    return os.environ.get("MCEDM_OUT_HEAD", "xla")


def conv_fusion_enabled() -> bool:
    """Trace-time switch for the fused norm+silu+conv path. Fusion wins in
    forward-only graphs (sampling: the normalized intermediate never touches
    HBM) but loses under autodiff (the custom-vjp backward recomputes the
    composition), so train steps disable it while tracing."""
    return _CONV_FUSION


def train_fusion_mode() -> str:
    """MCEDM_TRAIN_FUSION selects how grad-bearing graphs trace:
      "train" (default): fused kernels with the hand-written Pallas
              backward (phase A emits dW/db/dgamma/dbeta + da; dx is one
              fused XLA pass); stats chaining/emission off. Measured
              1.022x vs mode 0 same-session (70.0 vs 71.5 ms/step, B=16
              res128 bf16; the earlier two-phase backward was parity at
              77.3 vs 77.2).
      "0":    fusion fully off — XLA autodiff of the unfused composition
              (the round-2 production setting).
      "full": sampling-mode fusion incl. stats chaining; backward falls
              back to XLA recompute where cotangents flow through
              chained/emitted stats (measured 93.3 ms same-session — the
              round-2 loser, kept re-measurable)."""
    import os

    v = os.environ.get("MCEDM_TRAIN_FUSION", "train")
    return {"0": "0", "1": "train", "train": "train", "full": "full"}.get(
        v, "train")


class disable_conv_fusion:
    """Context manager wrapping grad-bearing traces: applies the measured
    train-fusion mode (see train_fusion_mode). The name is historical —
    mode "0" disables fusion outright, the default "train" mode keeps the
    kernels and routes their backward through the hand-written phase A/B
    kernels instead of XLA recompute. `mode` overrides the env selection
    (tests/benchmarks A/B the modes explicitly)."""

    def __init__(self, mode: str = None):
        self._mode = mode

    def __enter__(self):
        global _CONV_FUSION, _TRAIN_TRACE
        self._prev = (_CONV_FUSION, _TRAIN_TRACE)
        mode = self._mode or train_fusion_mode()
        if mode == "0":
            _CONV_FUSION = False
        elif mode == "train":
            _TRAIN_TRACE = True

    def __exit__(self, *exc):
        global _CONV_FUSION, _TRAIN_TRACE
        _CONV_FUSION, _TRAIN_TRACE = self._prev


def make_initializer(mode: str, scale: float, fan_in: int, fan_out: int):
    """Weight init distribution family used by ADM (explicit fan override:
    conv fans are in_ch*k*k, which differs from flax's defaults)."""

    def init(key, shape, dtype=jnp.float32):
        if mode == "xavier_uniform":
            bound = math.sqrt(6 / (fan_in + fan_out))
            return jax.random.uniform(key, shape, dtype, -bound, bound) * scale
        if mode == "xavier_normal":
            std = math.sqrt(2 / (fan_in + fan_out))
            return jax.random.normal(key, shape, dtype) * std * scale
        if mode == "kaiming_uniform":
            bound = math.sqrt(3 / fan_in)
            return jax.random.uniform(key, shape, dtype, -bound, bound) * scale
        if mode == "kaiming_normal":
            std = math.sqrt(1 / fan_in)
            return jax.random.normal(key, shape, dtype) * std * scale
        raise ValueError(f"invalid init mode {mode!r}")

    return init


class Linear(nn.Module):
    """Dense layer with ADM-style init (fan computed on features)."""
    features: int
    use_bias: bool = True
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        w_init = make_initializer(self.init_mode, self.init_weight, in_features, self.features)
        kernel = self.param("kernel", w_init, (in_features, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            b_init = make_initializer(self.init_mode, self.init_bias, in_features, self.features)
            bias = self.param("bias", b_init, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def upsample2x_nearest(x):
    """Exact equivalent of the EDM conv_transpose(f*4, stride 2) upsample for
    resample_filter=[1,1]: nearest-neighbour 2x. x: (B, H, W, C)."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


def upconv_phase_enabled() -> bool:
    """Gate for the phase-decomposed upsample+conv3x3 (see
    _upsample_phase_conv). Default OFF: same-session sampler A/B measured
    the phase path SLOWER (1112.5 vs 1079.1 ms, 50-step Heun B=16 res128
    bf16) — the 4-phase interleave stack/reshape costs more than the
    4x-smaller conv saves on this backend. MCEDM_UPCONV=phase re-enables."""
    import os

    return os.environ.get("MCEDM_UPCONV", "repeat") == "phase"


def upconv_kernel_enabled() -> bool:
    """Gate for the fused norm+silu+upsample+conv3x3 Pallas kernel
    (pallas/fused_norm_conv.py::fused_gn_silu_up_conv): rows interleave in
    VMEM, width pre-repeats in XLA (Mosaic rejects sublane interleaves).
    Default OFF: same-session sampler A/B measured it SLOWER (1099.1 vs
    1083.5 ms, 50-step Heun B=16 res128 bf16) — the half-res W-repeat +
    full-width kernel reads cost more than the saved upsample
    materialization. MCEDM_UPCONV=kernel re-enables."""
    import os

    return os.environ.get("MCEDM_UPCONV", "repeat") == "kernel"


def upres_kernel_enabled() -> bool:
    """Gate for the up block's upsampled identity residual riding into the
    tail kernel at half rows (width pre-repeated in XLA, rows repeated in
    VMEM). Default ON: same-session sampler A/B measured 1.014x (1068.7 vs
    1083.5 ms, 50-step Heun B=16 res128 bf16). MCEDM_UPRES=0 reverts."""
    import os

    return os.environ.get("MCEDM_UPRES", "1") == "1"


def _upsample_phase_conv(x, w, bias):
    """conv3x3_same(nearest_upsample_2x(x)) without materializing the
    upsampled tensor: the standard transposed-conv phase decomposition.

    Each output phase (a, b) in {0,1}^2 sees a 2x2 support in the
    low-resolution input, with taps that are sums of the original 3x3 taps
    (nearest upsampling means adjacent taps hit the same source pixel):
    rows a=0 -> offsets (-1, 0) with weights (w0, w1+w2); a=1 -> (0, +1)
    with (w0+w1, w2); columns likewise. 4 convs at low res (4/9 the FLOPs
    of the full-res conv) + a phase-interleave reshape replace the 4x-sized
    upsample materialization + full-res conv (profiled: broadcast 214us +
    conv 242us -> this path) on the sampler hot loop.
    """
    b, h, wdt, c = x.shape
    o = w.shape[-1]
    w = w.astype(x.dtype)
    # row-collapsed kernels: (2, 3, C, O); index 0 = nearer-zero offset
    wr = {0: jnp.stack([w[0], w[1] + w[2]], 0),
          1: jnp.stack([w[0] + w[1], w[2]], 0)}
    phases = {}
    for a, rpad in ((0, (1, 0)), (1, (0, 1))):
        wc = {0: jnp.stack([wr[a][:, 0], wr[a][:, 1] + wr[a][:, 2]], 1),
              1: jnp.stack([wr[a][:, 0] + wr[a][:, 1], wr[a][:, 2]], 1)}
        for bb, cpad in ((0, (1, 0)), (1, (0, 1))):
            phases[(a, bb)] = jax.lax.conv_general_dilated(
                x, wc[bb], (1, 1), padding=[rpad, cpad],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
    row0 = jnp.stack([phases[(0, 0)], phases[(0, 1)]], axis=3)
    row1 = jnp.stack([phases[(1, 0)], phases[(1, 1)]], axis=3)
    out = jnp.stack([row0, row1], axis=2).reshape(b, 2 * h, 2 * wdt, o)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def pair_io_enabled() -> bool:
    """MCEDM_PAIRIO gates END-TO-END paired threading through the ADM net:
    activations flow between the Pallas kernels in the (B, H, W/2, 2C)
    paired layout, eliminating the layout-assignment copies XLA inserts at
    every pallas <-> XLA-conv boundary (profiled: ~1.5 GB/call of pure
    relayout traffic at the flagship shape). Default ON for sampling traces
    (same-session 50-step Heun A/B, B=16 res128 bf16: 867.9 -> 642.4 ms,
    1.351x, 24.9 samples/s). Train traces also thread paired by default —
    adm_unet additionally gates them on pair_io_train_enabled(), whose
    hand-written paired backwards measured 61.2 vs 66.8 ms/step (the earlier
    recompute-backward attempt lost 88.4 vs 67.5 and is gone).
    MCEDM_PAIRIO=0 reverts both."""
    import os

    return os.environ.get("MCEDM_PAIRIO", "1") != "0"


def pair_io_train_enabled() -> bool:
    """MCEDM_PAIRIO_TRAIN extends paired threading to grad-bearing traces.
    Default ON: with hand-written paired backwards for every primitive
    (dual-order phase A, paired 4D norm, linear-conv phase A, up-kernel
    transpose with layout-free folds) the train step measured 61.2 vs
    66.8 ms/step same-session (B=16 res128 bf16, identical loss); the
    earlier recompute-backward attempt lost 88.4 vs 67.5 and is gone.
    MCEDM_PAIRIO_TRAIN=0 restores the unpaired-IO train path."""
    import os

    return os.environ.get("MCEDM_PAIRIO_TRAIN", "1") != "0"


def in_head_kernel_enabled() -> bool:
    """MCEDM_IN_HEAD gates conv_in as a linear paired kernel under paired
    threading (default kernel; =conv restores the XLA conv for A/Bs)."""
    import os

    return os.environ.get("MCEDM_IN_HEAD", "kernel") == "kernel"


@jax.custom_vjp
def downsample2x_mean_paired(xp):
    """2x2 mean pooling on a PAIRED (B, H, W/2, 2C) activation -> paired
    (B, H/2, W/4, 2C). Rows pool via strided adds (XLA, fused); the W pool
    is a channel FOLD (a pair's two parities are W-neighbours); the only
    layout op is one half-res re-pair."""
    from m_cedm_tpu.pallas.fused_norm_conv import pair_array

    b, h, w2, c2 = xp.shape
    c = c2 // 2
    # rows pool via a MAJOR-dim split (layout-free reshape: the minor
    # (W2, 2C) dims are untouched) + jnp.sum over the split dim: indexing
    # the pair dim (x4[:, :, 0] + x4[:, :, 1]) makes XLA materialize a
    # pair-dim-outermost relayout of the FULL-res operand (67 MB/call per
    # down level in the optimized-HLO byte audit) while the reduce form
    # audits to 0 MB. Wall-clock is a WASH (same-session 50-step A/B:
    # 569.3 idx vs 571.1 sum) — those copies ran on the async copy engines
    # under the MXU work — but the reduce form is kept so the HLO byte
    # audit (bench cost accounting) reflects true demand traffic.
    # MCEDM_POOL_IDX=1 restores the indexing form for re-measurement.
    x4 = xp.reshape(b, h // 2, 2, w2, c2)
    import os

    if os.environ.get("MCEDM_POOL_IDX", "0") == "1":  # re-measurement gate
        e = x4[:, :, 0] + x4[:, :, 1]
    else:
        e = jnp.sum(x4, axis=2)
    f = (e[..., :c] + e[..., c:]) * jnp.asarray(0.25, xp.dtype)
    return pair_array(f)


def _dsp_fwd(xp):
    return downsample2x_mean_paired(xp), None


def _dsp_bwd(_, g):
    from m_cedm_tpu.pallas.fused_norm_conv import unpair_array

    # each pooled cell feeds both rows and both parities of its source pair
    gh = unpair_array(g)
    ghr = jnp.repeat(gh, 2, axis=1)
    return (jnp.concatenate([ghr, ghr], -1) * jnp.asarray(0.25, g.dtype),)


downsample2x_mean_paired.defvjp(_dsp_fwd, _dsp_bwd)


@jax.custom_vjp
def downsample2x_mean(x):
    """Exact equivalent of the EDM depthwise conv(f, stride 2) downsample for
    resample_filter=[1,1]: 2x2 mean pooling. x: (B, H, W, C).

    Written as dtype-preserving pairwise adds: jnp.mean promotes the
    accumulation to fp32, which XLA lowers to a full-tensor convert + fp32
    reduce (~2x the traffic; profiled at ~400us/call at the flagship shape
    vs ~150us for the fused strided-slice adds). The custom VJP keeps the
    backward at mean-pooling cost (nearest-upsample of g / 4) instead of
    the pad-scatter XLA derives for strided slices."""
    a = x[:, 0::2] + x[:, 1::2]
    b = a[:, :, 0::2] + a[:, :, 1::2]
    return b * jnp.asarray(0.25, x.dtype)


def _ds2x_fwd(x):
    return downsample2x_mean(x), None


def _ds2x_bwd(_, g):
    g = jnp.repeat(jnp.repeat(g, 2, axis=1), 2, axis=2)
    return (g * jnp.asarray(0.25, g.dtype),)


downsample2x_mean.defvjp(_ds2x_fwd, _ds2x_bwd)


class Conv2d(nn.Module):
    """3x3/1x1 conv with optional (pre-)up/downsampling, ADM-style init.

    kernel == 0 means "resample only" (used by UNetBlock skip connections).
    Padding is SAME with zeros, matching torch's conv2d(padding=k//2).
    """
    features: int
    kernel: int = 3
    use_bias: bool = True
    up: bool = False
    down: bool = False
    init_mode: str = "kaiming_normal"
    init_weight: float = 1.0
    init_bias: float = 0.0

    @nn.compact
    def __call__(self, x, fused_norm=None, fused_stats=None,
                 fused_residual=None, emit_stats=False, x2=None,
                 params_only: bool = False, res_up: bool = False):
        assert not (self.up and self.down)
        phase_up = False
        fused_up = (self.up and self.kernel == 3 and fused_norm is not None)
        if not params_only:
            if self.up and not fused_up:
                if (self.kernel == 3 and fused_norm is None
                        and upconv_phase_enabled()):
                    phase_up = True  # fused upsample+conv below
                else:
                    x = upsample2x_nearest(x)
            if self.down:
                x = downsample2x_mean(x)
        if self.kernel == 0:
            return x
        in_ch = x.shape[-1] + (x2.shape[-1] if x2 is not None else 0)
        k = self.kernel
        fan_in = in_ch * k * k
        fan_out = self.features * k * k
        w_init = make_initializer(self.init_mode, self.init_weight, fan_in, fan_out)
        kernel = self.param("kernel", w_init, (k, k, in_ch, self.features))
        bias = None
        if self.use_bias:
            b_init = make_initializer(self.init_mode, self.init_bias, fan_in, fan_out)
            bias = self.param("bias", b_init, (self.features,))
        if params_only:
            # hand this conv's params to a fused-kernel consumer (the block
            # tail folds a 1x1 skip projection into its Pallas kernel)
            return kernel.reshape(in_ch, self.features) if k == 1 else kernel, bias
        if fused_norm is not None:
            # fused conv3x3(silu(group_norm(x)*gamma+beta)) [+ skip(x)]:
            # gamma/beta come folded from GroupNormSiLU(fold_only=True); one
            # Pallas kernel on TPU, identical-math XLA elsewhere
            # (pallas/fused_norm_conv.py)
            from m_cedm_tpu.pallas.fused_norm_conv import (
                fused_gn_silu_conv, fused_gn_silu_conv_block,
                fused_gn_silu_up_conv)

            assert k == 3 and not self.down
            gamma, beta, num_groups, eps = fused_norm
            if fused_up:
                # whole up-block prefix: norm+silu at LOW res, upsample in
                # VMEM, conv at high res — one kernel, one low-res read
                assert fused_residual is None and not emit_stats
                return fused_gn_silu_up_conv(x, gamma, beta, kernel, bias,
                                             num_groups, eps,
                                             stats=fused_stats)
            assert not self.up
            if (fused_stats is None and fused_residual is None
                    and not emit_stats):
                return fused_gn_silu_conv(x, gamma, beta, kernel, bias,
                                          num_groups, eps)
            # fused_residual: (residual,) identity skip,
            # (residual, skip_w, skip_b) 1x1-projection skip, or
            # (residual, residual2, skip_w, skip_b) projection of an
            # unmaterialized concat
            residual = residual2 = skip_w = skip_b = None
            if fused_residual is not None:
                residual = fused_residual[0]
                if len(fused_residual) == 3:
                    skip_w, skip_b = fused_residual[1:]
                elif len(fused_residual) == 4:
                    residual2, skip_w, skip_b = fused_residual[1:]
            return fused_gn_silu_conv_block(
                x, gamma, beta, kernel, bias, num_groups, eps, x2=x2,
                residual=residual, residual2=residual2,
                skip_w=skip_w, skip_b=skip_b,
                stats=fused_stats, emit_stats=emit_stats, res_up=res_up)
        if phase_up:
            return _upsample_phase_conv(x, kernel, bias)
        import os as _os

        if k == 1 and _os.environ.get("MCEDM_1X1", "matmul") == "matmul":
            # 1x1 conv as a matmul: lax dots are layout-neutral, while
            # conv_general_dilated pulls its operands into spatial-major
            # layouts (a relayout copy against the Pallas kernels'
            # default-layout pins — attention qkv/proj, skip projections).
            # MCEDM_1X1=conv restores the conv lowering for A/Bs.
            y = jnp.einsum("bhwc,co->bhwo", x,
                           kernel.reshape(in_ch, self.features)
                           .astype(x.dtype))
        else:
            y = jax.lax.conv_general_dilated(
                x, kernel.astype(x.dtype),
                window_strides=(1, 1),
                padding=[(k // 2, k // 2), (k // 2, k // 2)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if bias is not None:
            y = y + bias.astype(y.dtype)
        return y


class TorchConv2d(nn.Module):
    """Conv with torch's default init (kaiming_uniform a=sqrt(5) on weights,
    uniform(-1/sqrt(fan_in), .) bias) — used by the DDPM U-Net whose layers
    are plain torch.nn.Conv2d in the reference. Supports stride and explicit
    asymmetric padding (Downsample pads (0,1,0,1) before a valid conv)."""
    features: int
    kernel: int = 3
    stride: int = 1
    padding: Any = "same_torch"  # int, 'valid', or 'same_torch' (= k // 2)
    use_bias: bool = True
    padding_mode: str = "zeros"  # or 'circular'

    @nn.compact
    def __call__(self, x, params_only: bool = False):
        in_ch = x.shape[-1]
        k = self.kernel
        fan_in = in_ch * k * k
        bound_w = math.sqrt(6.0 / ((1 + 5) * fan_in))  # kaiming_uniform(a=sqrt(5))
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound_w, bound_w),
            (k, k, in_ch, self.features))
        if params_only:
            # hand the params to a fused-kernel consumer (paired DDPM block)
            bound_b = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound_b, bound_b),
                (self.features,)) if self.use_bias else None
            return (kernel.reshape(in_ch, self.features) if k == 1
                    else kernel), bias
        if self.padding == "same_torch":
            pad = k // 2
            padding = [(pad, pad), (pad, pad)]
        elif self.padding == "valid" or self.padding == 0:
            padding = [(0, 0), (0, 0)]
        elif isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * 2
        else:
            padding = self.padding
        if self.padding_mode == "circular" and padding != [(0, 0), (0, 0)]:
            x = jnp.pad(x, ((0, 0), padding[0], padding[1], (0, 0)), mode="wrap")
            padding = [(0, 0), (0, 0)]
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype),
            window_strides=(self.stride, self.stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bound_b = 1.0 / math.sqrt(fan_in)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound_b, bound_b),
                (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class TorchLinear(nn.Module):
    """Dense layer with torch's default nn.Linear init."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        bound_w = math.sqrt(6.0 / ((1 + 5) * in_features))
        kernel = self.param(
            "kernel",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound_w, bound_w),
            (in_features, self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bound_b = 1.0 / math.sqrt(in_features)
            bias = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound_b, bound_b),
                (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def adm_group_norm(num_channels: int, eps: float = 1e-5,
                   num_groups: int = 32, min_channels_per_group: int = 4) -> nn.GroupNorm:
    """ADM convention: groups = min(32, C // 4), eps 1e-5."""
    groups = min(num_groups, num_channels // min_channels_per_group)
    return nn.GroupNorm(num_groups=groups, epsilon=eps)


class GroupNormSiLU(nn.Module):
    """GroupNorm (+ optional per-sample FiLM modulation) fused with SiLU.

    Computes silu(gn(x) * (1 + film_scale) + film_shift) — the hot pattern of
    both U-Nets. On TPU this lowers to the fused Pallas kernel
    (pallas/fused_norm.py): one HBM read + one write instead of separate
    normalize / modulate / activate passes. Elsewhere the identical-math jnp
    reference runs (and XLA fuses what it can).
    """
    num_groups: int
    eps: float = 1e-5
    # ADM measures faster with the Pallas kernels; the DDPM U-Net measures
    # faster pure-XLA on this backend (ddpm_unet.py passes use_kernel=False)
    use_kernel: bool = True

    @nn.compact
    def __call__(self, x, film_scale=None, film_shift=None,
                 fold_only: bool = False, stats=None):
        from m_cedm_tpu.pallas.fused_norm import (
            fused_group_norm_silu, fused_group_norm_silu_stats,
            group_norm_silu_reference)

        c = x.shape[-1]
        b = x.shape[0]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        gamma = jnp.broadcast_to(scale[None].astype(jnp.float32), (b, c))
        beta = jnp.broadcast_to(bias[None].astype(jnp.float32), (b, c))
        if film_scale is not None:
            # silu(shift + gn(x) * (scale + 1)) folds into gamma/beta
            fs = film_scale.astype(jnp.float32) + 1.0
            gamma = gamma * fs
            beta = beta * fs + film_shift.astype(jnp.float32)
        if fold_only:
            # hand the folded per-sample modulation to a fused norm+conv
            # consumer (Conv2d(fused_norm=...)) — no compute here
            return gamma, beta
        x2 = x.reshape(b, -1, c)
        if not self.use_kernel:
            out = group_norm_silu_reference(x2, gamma, beta, self.num_groups,
                                            self.eps)
        elif stats is not None:
            # chained channel stats from the producing kernel's emit_stats
            out = fused_group_norm_silu_stats(x2, gamma, beta, stats[0],
                                              stats[1], self.num_groups,
                                              self.eps)
        else:
            out = fused_group_norm_silu(x2, gamma, beta, self.num_groups,
                                        self.eps)
        return out.reshape(x.shape).astype(x.dtype)


def ddpm_group_norm(num_channels: int) -> nn.GroupNorm:
    """DDPM convention: 32 groups, eps 1e-6."""
    return nn.GroupNorm(num_groups=32, epsilon=1e-6)


def fp32_softmax_attention(q, k, v):
    """softmax(q^T k / sqrt(d)) v with fp32 accumulation regardless of the
    activation dtype (ADM forces fp32 here for numeric safety; on TPU the MXU
    accumulates fp32 natively, we additionally keep the softmax in fp32).

    Routes to the fused Pallas attention kernel on TPU (pallas/
    fused_attention.py: whole-head-batch in VMEM, recompute-based backward);
    identical-math jnp elsewhere.

    q, k, v: (N, L, D) with N = batch*heads, L tokens, D channels per head.
    Returns (N, L, D).
    """
    from m_cedm_tpu.pallas.fused_attention import fused_attention

    return fused_attention(q, k, v)
