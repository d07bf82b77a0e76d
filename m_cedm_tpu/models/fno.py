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

        x_ft = jnp.fft.rfft2(x, axes=(1, 2))  # (B, H, W//2+1, C)

        def cmul(block, wr, wi):
            # complex contraction as 4 real einsums — feeds the MXU directly
            # (and sidesteps missing complex-dot support in some backends)
            br, bi = jnp.real(block), jnp.imag(block)
            out_r = (jnp.einsum("bxyi,ioxy->bxyo", br, wr)
                     - jnp.einsum("bxyi,ioxy->bxyo", bi, wi))
            out_i = (jnp.einsum("bxyi,ioxy->bxyo", br, wi)
                     + jnp.einsum("bxyi,ioxy->bxyo", bi, wr))
            return out_r, out_i

        top_r, top_i = cmul(x_ft[:, :m1, :m2], w1r, w1i)
        bot_r, bot_i = cmul(x_ft[:, -m1:, :m2], w2r, w2i)

        # assemble the truncated spectrum in real/imag planes (complex
        # constants are avoided entirely: some TPU runtimes lack them)
        spec_shape = (b, h, w // 2 + 1, self.out_channels)
        out_r = jnp.zeros(spec_shape, jnp.float32)
        out_i = jnp.zeros(spec_shape, jnp.float32)
        out_r = out_r.at[:, :m1, :m2].set(top_r).at[:, h - m1:, :m2].set(bot_r)
        out_i = out_i.at[:, :m1, :m2].set(top_i).at[:, h - m1:, :m2].set(bot_i)
        out_ft = jax.lax.complex(out_r, out_i)
        return jnp.fft.irfft2(out_ft, s=(h, w), axes=(1, 2))


def _instance_norm(x, eps: float = 1e-5):
    """torch.nn.InstanceNorm2d default: per-(sample, channel) spatial
    normalization, no affine parameters."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


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
            inst_norm=get("inst_norm", False))


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
        x = TorchLinear(cfg.width, name="fc0")(x)
        for i in range(cfg.num_layers):
            x1 = SpectralConv2d(cfg.width, cfg.modes_1, cfg.modes_2,
                                name=f"fourier_{i}")(x)
            x2 = TorchConv2d(cfg.width, kernel=1, name=f"conv_{i}")(x)
            x = nn.gelu(x1 + x2)
        x = nn.gelu(TorchLinear(128, name="fc1")(x))
        return TorchLinear(cfg.time_future, name="fc2")(x)


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
        x = TorchLinear(cfg.state_size, name="fc2")(x)
        return jnp.transpose(x, (0, 2, 1, 3))  # (B, X, T, C) -> (B, T, X, C)
