"""Fourier Neural Operator networks (flax.linen, NHWC).

Parity targets:
  SpectralConv2d <- models/fno_2d.py:16-55   (rfft2 -> truncated two-corner
                                             complex mode mix -> irfft2)
  Fno2d          <- models/fno_2d.py:58-126  (time-as-channels stepper with
                                             dx/dy/dt scalar channels)
  FnoState2d     <- models/fno_state_2d.py:17-118 (x/t grid channels,
                                             non-periodic padding, optional
                                             InstanceNorm)

TPU-first notes:
  * NHWC; the mode mix is one einsum per spectral corner — XLA maps the
    complex contraction onto MXU matmuls (real/imag parts).
  * Complex weights are stored as separate real/imag real-valued params so
    every optimizer/EMA/checkpoint path stays real-valued.
  * The zero-filled out-spectrum is built with .at[].set on a zeros buffer —
    under jit this fuses into two dynamic-update-slices, no host copies.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.models.layers import TorchConv2d, TorchLinear


def fno_dft_enabled() -> bool:
    """Truncated-DFT-as-matmul spectral conv (default on; MCEDM_FNO_DFT=0
    restores the rfft2 path). Rationale: the spectrum is truncated to
    modes1 x modes2 anyway, so a dense (W, m2) / (H, 2*m1) DFT matmul does
    strictly less arithmetic than a full FFT *and* runs on the MXU, while
    XLA lowers fft ops to the (bandwidth-starved) VPU — measured 4.0x
    train-step / 5.2x inference on v5e (fno_train_step_ms 96.2 -> 24.2,
    see BENCH_r04). Exact same math: equality with the rfft2 path is
    pinned to 2e-4 by tests/test_fno.py::test_dft_matches_fft."""
    import os

    return os.environ.get("MCEDM_FNO_DFT", "1") != "0"


def _dft_mats(h, w, m1, m2):
    """Trace-time constant DFT/inverse-DFT matrices for a spectrum truncated
    to rows {0..m1-1, h-m1..h-1} and rfft columns {0..m2-1}.

    Returns (cw, sw, ch, sh, icw, isw) with
      cw/sw:  (w, m2)  forward rfft over the W axis (cos / sin),
      ch/sh:  (h, 2*m1) forward DFT over the H axis at the kept rows,
      icw/isw:(m2, w)  inverse rfft including the hermitian doubling
              (2-delta_l0)/w and the numpy-irfft convention of dropping
              Im(bin 0); the H inverse reuses ch/sh with a 1/h factor.
    """
    kh = np.concatenate([np.arange(m1), np.arange(h - m1, h)])
    ang_h = 2.0 * np.pi * np.outer(np.arange(h), kh) / h          # (h, 2m1)
    ang_w = 2.0 * np.pi * np.outer(np.arange(w), np.arange(m2)) / w
    cw, sw = np.cos(ang_w), np.sin(ang_w)                          # (w, m2)
    ch, sh = np.cos(ang_h), np.sin(ang_h)                          # (h, 2m1)
    dbl = np.full((m2, 1), 2.0 / w)
    dbl[0, 0] = 1.0 / w
    icw = dbl * cw.T                                               # (m2, w)
    isw = -(dbl * sw.T)
    isw[0, :] = 0.0  # irfft drops Im(bin 0) of the W spectrum
    f32 = jnp.float32
    return (jnp.asarray(cw, f32), jnp.asarray(sw, f32),
            jnp.asarray(ch, f32), jnp.asarray(sh, f32),
            jnp.asarray(icw, f32), jnp.asarray(isw, f32))


class SpectralConv2d(nn.Module):
    """2D Fourier layer over the (H, W) axes of an NHWC tensor."""
    out_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x):
        b, h, w, in_ch = x.shape
        m1, m2 = self.modes1, self.modes2
        scale = 1.0 / (in_ch * self.out_channels)

        def u_init(key, shape):
            return jax.random.uniform(key, shape, jnp.float32, 0.0, scale)

        # torch.rand(cfloat): real and imag each uniform in [0, scale)
        w1r = self.param("w1_real", u_init, (in_ch, self.out_channels, m1, m2))
        w1i = self.param("w1_imag", u_init, (in_ch, self.out_channels, m1, m2))
        w2r = self.param("w2_real", u_init, (in_ch, self.out_channels, m1, m2))
        w2i = self.param("w2_imag", u_init, (in_ch, self.out_channels, m1, m2))

        def cmul(br, bi, wr, wi):
            # complex contraction as 4 real einsums — feeds the MXU directly
            # (and sidesteps missing complex-dot support in some backends)
            out_r = (jnp.einsum("bxyi,ioxy->bxyo", br, wr)
                     - jnp.einsum("bxyi,ioxy->bxyo", bi, wi))
            out_i = (jnp.einsum("bxyi,ioxy->bxyo", br, wi)
                     + jnp.einsum("bxyi,ioxy->bxyo", bi, wr))
            return out_r, out_i

        # the matmul path assumes non-overlapping corners and no Nyquist
        # column (true for every shipped config: m=12 vs h,w >= 128)
        if fno_dft_enabled() and 2 * m1 <= h and m2 <= w // 2:
            # truncated DFT as matmuls (see fno_dft_enabled): forward
            # contracts W (w -> m2 rfft bins) then H (h -> the 2*m1 kept
            # rows); inverse runs the same contractions transposed. All six
            # operands are trace-time constants baked into the program.
            cw, sw, ch, sh, icw, isw = _dft_mats(h, w, m1, m2)
            # the two full-grid contractions (W forward / W inverse) carry
            # ~95% of the flops: run them in the model's compute dtype (the
            # TPU MXU accumulates bf16 dots in fp32 natively; the truncated
            # middle is computed in fp32 either way). No preferred-f32
            # output: BF16xBF16=F32 dots are unsupported on the CPU backend
            # the test mesh runs on.
            mm_dt = x.dtype
            xw_r = jnp.einsum("bhwc,wl->bhlc", x,
                              cw.astype(mm_dt)).astype(jnp.float32)
            xw_i = -jnp.einsum("bhwc,wl->bhlc", x,
                               sw.astype(mm_dt)).astype(jnp.float32)
            y_r = (jnp.einsum("bhlc,hk->bklc", xw_r, ch)
                   + jnp.einsum("bhlc,hk->bklc", xw_i, sh))
            y_i = (jnp.einsum("bhlc,hk->bklc", xw_i, ch)
                   - jnp.einsum("bhlc,hk->bklc", xw_r, sh))
            top_r, top_i = cmul(y_r[:, :m1], y_i[:, :m1], w1r, w1i)
            bot_r, bot_i = cmul(y_r[:, m1:], y_i[:, m1:], w2r, w2i)
            o_r = jnp.concatenate([top_r, bot_r], axis=1)  # (b, 2m1, m2, O)
            o_i = jnp.concatenate([top_i, bot_i], axis=1)
            # H inverse: z(h) = (1/h) sum_k y_k e^{+2 pi i k h / h}
            z_r = (jnp.einsum("bklc,hk->bhlc", o_r, ch)
                   - jnp.einsum("bklc,hk->bhlc", o_i, sh)) * (1.0 / h)
            z_i = (jnp.einsum("bklc,hk->bhlc", o_i, ch)
                   + jnp.einsum("bklc,hk->bhlc", o_r, sh)) * (1.0 / h)
            # W inverse with hermitian doubling folded into icw/isw
            out = (jnp.einsum("bhlc,lw->bhwc", z_r.astype(mm_dt),
                              icw.astype(mm_dt))
                   + jnp.einsum("bhlc,lw->bhwc", z_i.astype(mm_dt),
                                isw.astype(mm_dt)))
            return out.astype(x.dtype)

        # fft path (fallback; also hit at init when the probe shape is too
        # small for the matmul corners): fp32 transform, dtype-preserving
        in_dt = x.dtype
        x_ft = jnp.fft.rfft2(x.astype(jnp.float32), axes=(1, 2))

        top_r, top_i = cmul(jnp.real(x_ft[:, :m1, :m2]),
                            jnp.imag(x_ft[:, :m1, :m2]), w1r, w1i)
        bot_r, bot_i = cmul(jnp.real(x_ft[:, -m1:, :m2]),
                            jnp.imag(x_ft[:, -m1:, :m2]), w2r, w2i)

        # assemble the truncated spectrum in real/imag planes (complex
        # constants are avoided entirely: some TPU runtimes lack them)
        spec_shape = (b, h, w // 2 + 1, self.out_channels)
        out_r = jnp.zeros(spec_shape, jnp.float32)
        out_i = jnp.zeros(spec_shape, jnp.float32)
        out_r = out_r.at[:, :m1, :m2].set(top_r).at[:, h - m1:, :m2].set(bot_r)
        out_i = out_i.at[:, :m1, :m2].set(top_i).at[:, h - m1:, :m2].set(bot_i)
        out_ft = jax.lax.complex(out_r, out_i)
        return jnp.fft.irfft2(out_ft, s=(h, w), axes=(1, 2)).astype(in_dt)


def _instance_norm(x, eps: float = 1e-5):
    """torch.nn.InstanceNorm2d default: per-(sample, channel) spatial
    normalization, no affine parameters. fp32 statistics."""
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=(1, 2), keepdims=True)
    var = jnp.var(x32, axis=(1, 2), keepdims=True)
    return ((x32 - mean) / jnp.sqrt(var + eps)).astype(x.dtype)


@dataclasses.dataclass(frozen=True)
class FnoConfig:
    modes_1: int = 12
    modes_2: int = 12
    width: int = 32
    num_layers: int = 5
    time_history: int = 128
    time_future: int = 0
    padding_t: int = 4
    padding_x: int = 0
    input_size: int = 1
    state_size: int = 1
    inst_norm: bool = False
    dtype: str = "float32"  # bf16 compute / fp32 params + spectral middle

    @property
    def compute_dtype(self):
        return (jnp.bfloat16 if self.dtype in ("bfloat16", "bf16")
                else jnp.float32)

    @staticmethod
    def from_hparams(hp) -> "FnoConfig":
        def get(key, default):
            return hp.get(key, default) if hasattr(hp, "get") else getattr(hp, key, default)

        return FnoConfig(
            modes_1=get("modes_1", 12), modes_2=get("modes_2", 12),
            width=get("width", 32), num_layers=get("num_layers", 5),
            time_history=get("time_history", 128),
            time_future=get("time_future", 0),
            padding_t=get("padding_t", 4), padding_x=get("padding_x", 0),
            input_size=get("input_size", 1), state_size=get("state_size", 1),
            inst_norm=get("inst_norm", False),
            dtype=get("dtype", "float32"))


class Fno2d(nn.Module):
    """Autoregressive time stepper: history frames as channels.

    u: (B, H, W, time_history); dx, dy, dt: (B,) scalars appended as constant
    channels. Output: (B, H, W, time_future).
    """
    cfg: FnoConfig

    @nn.compact
    def __call__(self, u, dx, dy, dt):
        cfg = self.cfg
        b, h, w, _ = u.shape
        const = jnp.stack([dx, dy, dt], axis=-1)[:, None, None, :]
        x = jnp.concatenate(
            [u, jnp.broadcast_to(const, (b, h, w, 3)).astype(u.dtype)], axis=-1)
        x = x.astype(cfg.compute_dtype)
        x = TorchLinear(cfg.width, name="fc0")(x)
        for i in range(cfg.num_layers):
            x1 = SpectralConv2d(cfg.width, cfg.modes_1, cfg.modes_2,
                                name=f"fourier_{i}")(x)
            x2 = TorchConv2d(cfg.width, kernel=1, name=f"conv_{i}")(x)
            x = nn.gelu(x1 + x2)
        x = nn.gelu(TorchLinear(128, name="fc1")(x))
        return TorchLinear(cfg.time_future, name="fc2")(x).astype(jnp.float32)


class FnoState2d(nn.Module):
    """State-reconstruction FNO: full space-time field with coordinate
    channels; pads the (non-periodic) axes before the spectral layers.

    u: (B, X, T, C_in); dx, dt either (B,) scalar spacings or None (then
    normalized [0, 1] grids are generated). Output: (B, T, X, C_out) — note
    the transpose to time-major on output, matching the reference.
    """
    cfg: FnoConfig

    @nn.compact
    def __call__(self, u, dx=None, dt=None):
        cfg = self.cfg
        b, sx, st, _ = u.shape
        if dx is not None and dt is not None:
            gx = jnp.broadcast_to(dx[:, None, None, None], (b, sx, st, 1)).astype(u.dtype)
            gt = jnp.broadcast_to(dt[:, None, None, None], (b, sx, st, 1)).astype(u.dtype)
        else:
            gx = jnp.broadcast_to(jnp.linspace(0, 1, sx)[None, :, None, None],
                                  (b, sx, st, 1)).astype(u.dtype)
            gt = jnp.broadcast_to(jnp.linspace(0, 1, st)[None, None, :, None],
                                  (b, sx, st, 1)).astype(u.dtype)
        x = jnp.concatenate([u, gx, gt], axis=-1)
        x = x.astype(cfg.compute_dtype)
        x = TorchLinear(cfg.width, name="fc0")(x)
        # pad the non-periodic trailing X/T edges (NHWC: axis 1 = X, axis 2 = T)
        x = jnp.pad(x, ((0, 0), (0, cfg.padding_x), (0, cfg.padding_t), (0, 0)))
        for i in range(cfg.num_layers):
            if cfg.inst_norm:
                x1 = _instance_norm(SpectralConv2d(cfg.width, cfg.modes_1,
                                                   cfg.modes_2,
                                                   name=f"fourier_{i}")(_instance_norm(x)))
            else:
                x1 = SpectralConv2d(cfg.width, cfg.modes_1, cfg.modes_2,
                                    name=f"fourier_{i}")(x)
            x2 = TorchConv2d(cfg.width, kernel=1, name=f"conv_{i}")(x)
            x = nn.gelu(x1 + x2)
        if cfg.padding_t > 0:
            x = x[:, :, :-cfg.padding_t]
        if cfg.padding_x > 0:
            x = x[:, :-cfg.padding_x]
        x = nn.gelu(TorchLinear(128, name="fc1")(x))
        x = TorchLinear(cfg.state_size, name="fc2")(x).astype(jnp.float32)
        return jnp.transpose(x, (0, 2, 1, 3))  # (B, X, T, C) -> (B, T, X, C)
