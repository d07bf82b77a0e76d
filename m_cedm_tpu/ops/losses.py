"""Loss zoo as pure jnp functions.

Parity targets (reference models/losses.py:7-204):
  multi_loss            <- MultiLoss        (sum over channels, mean elsewhere)
  noise_estimation_loss <- NoiseEstimationLoss (weighted MSE summed over CHW,
                                            mean over batch: the diffusion loss)
  masked_loss           <- MaskedLoss       (masked L1/MSE / #unmasked, optional
                                            channel slice)
  downsampled_loss      <- DownsampledLoss  (stride-subsampled L1/MSE)
  correlation           <- CorrelationLoss  (per-channel Pearson over (h w))
  scaled_mae_loss       <- ScaledMaeLoss    (per-sample min-max rescale, L1)
  lp_loss               <- LpLoss           (relative Lp, FNO convention)

All functions take arrays shaped (B, H, W, C) unless noted (NHWC throughout —
this framework never uses NCHW).
"""
from __future__ import annotations

import jax.numpy as jnp


def _elementwise(pred, target, kind: str):
    diff = pred - target
    if kind in ("l2", "mse"):
        return jnp.square(diff)
    if kind == "l1":
        return jnp.abs(diff)
    if kind == "smooth_l1":
        a = jnp.abs(diff)
        return jnp.where(a < 1.0, 0.5 * jnp.square(diff), a - 0.5)
    raise ValueError(f"unknown loss kind {kind!r}")


def multi_loss(pred, target, kind: str = "mse", reduction: str = "mean"):
    """Sum over the channel axis, then reduce over spatial dims and batch."""
    m = jnp.sum(_elementwise(pred, target, kind), axis=-1)
    if reduction == "mean":
        return jnp.mean(jnp.mean(m, axis=(1, 2)))
    if reduction == "sum":
        return jnp.sum(m)
    return m


def noise_estimation_loss(pred, target, weight=1.0, reduction: str = "mean"):
    """The diffusion training loss: weight * MSE summed over (H, W, C), then
    reduced over batch."""
    m = weight * jnp.square(pred - target)
    per_sample = jnp.sum(m, axis=(1, 2, 3))
    if reduction == "mean":
        return jnp.mean(per_sample)
    if reduction == "sum":
        return jnp.sum(per_sample)
    return per_sample


def masked_loss(pred, target, mask, loss_dim=None, kind: str = "l1"):
    """Masked error normalized by the mask count.

    loss_dim: optional static tuple/slice of channel indices to restrict to.
    """
    pred = pred * mask
    target = target * mask
    if loss_dim is not None:
        pred = pred[..., loss_dim]
        target = target[..., loss_dim]
        mask = mask[..., loss_dim]
    err = jnp.sum(_elementwise(pred, target, kind))
    return err / jnp.sum(mask)


def downsampled_loss(pred, target, down_factor: int = 1, kind: str = "l1"):
    """Error on a 2^(down_factor-1)-strided subgrid of (H, W)."""
    if down_factor > 1:
        each = 2 ** (down_factor - 1)
        pred = pred[:, ::each, ::each]
        target = target[:, ::each, ::each]
    return jnp.mean(_elementwise(pred, target, kind))


def correlation(pred, target, reduction: str = "none"):
    """Per-channel Pearson correlation over flattened (H, W), averaged over B.

    Returns shape (C,) for reduction='none'.
    """
    b, c = pred.shape[0], pred.shape[-1]
    x = pred.reshape(b, -1, c)
    y = target.reshape(b, -1, c)
    xb = x - jnp.mean(x, axis=1, keepdims=True)
    yb = y - jnp.mean(y, axis=1, keepdims=True)
    cov = jnp.sum(yb * xb, axis=1)
    vx = jnp.sum(xb * xb, axis=1)
    vy = jnp.sum(yb * yb, axis=1)
    denom = jnp.sqrt(vx * vy)
    denom = jnp.where(denom == 0, denom + 1e-7, denom)
    corr = jnp.mean(cov / denom, axis=0)
    if reduction == "mean":
        return jnp.mean(corr)
    if reduction == "sum":
        return jnp.sum(corr)
    return corr


def _scale_min_max(state):
    """Rescale each (sample, channel) plane to [0, 1] over its (H, W) extent."""
    b, c = state.shape[0], state.shape[-1]
    flat = state.reshape(b, -1, c)
    mn = jnp.min(flat, axis=1, keepdims=True)
    mx = jnp.max(flat, axis=1, keepdims=True)
    return ((flat - mn) / (mx - mn)).reshape(state.shape)


def scaled_mae_loss(pred, target, keep_channels: bool = False):
    """L1 between per-sample min-max-rescaled fields."""
    err = jnp.abs(_scale_min_max(pred) - _scale_min_max(target))
    if keep_channels:
        return jnp.mean(err, axis=(0, 1, 2))
    return jnp.mean(err)


def lp_loss(pred, target, p: int = 2, reduction: str = "mean"):
    """Relative Lp norm per sample (FNO convention)."""
    b = pred.shape[0]
    diff = jnp.linalg.norm((pred - target).reshape(b, -1), ord=p, axis=1)
    ynorm = jnp.linalg.norm(target.reshape(b, -1), ord=p, axis=1)
    rel = diff / ynorm
    if reduction == "mean":
        return jnp.mean(rel)
    if reduction == "sum":
        return jnp.sum(rel)
    return rel
