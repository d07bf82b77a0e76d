"""Observation-mask samplers as on-device jnp functions.

mask = 1 -> missing (to be recovered); mask = 0 -> observed.

Parity targets (reference datamodules/h5_dataset.py):
  sample_train_mask_var       <- HDF5MaskDataset.sample_mask        (:232-243)
                                 train: 50/50 "h observed" vs "u observed"
  sample_train_mask_time      <- HDF5TimeMaskDataset.get_train_mask (:306-337)
                                 40% u-missing / 40% h-missing / 20% both
                                 present, plus per-variable random observed-
                                 time cutoffs t_max in [T/2, T]
  sample_train_mask_sparse    <- HDF5SparseMaskDataset.get_train_mask (:438-478)
                                 33/33/33 variable masking plus random
                                 2^k spatial/temporal subsampling strides
  eval masks                  <- :244-253, :355-391, :497-546 — fixed task
                                 dicts; here a stacked (n_tasks, T, X, C)
                                 tensor + static task-name tuple (jit-friendly)

TPU-first: the reference samples masks in CPU DataLoader workers per item.
Here each is a pure function of a PRNG key, vmapped over the batch inside the
jitted train step — "on-device masking" per the north star. The sparse-stride
variant uses index-modulo arithmetic instead of Python strided slicing so all
shapes stay static under jit.
"""
from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _var_mask(choice, thresholds, t_dim, x_dim, inp_ch, tar_ch):
    """Block mask over the variable (channel) axis from a uniform draw.

    thresholds = (p_target_missing, p_input_missing): draw < t0 -> target
    missing; t0 <= draw < t1 -> input missing; else both present.
    """
    c = inp_ch + tar_ch
    ch_is_input = jnp.arange(c) < inp_ch  # (C,)
    target_missing = choice < thresholds[0]
    input_missing = (choice >= thresholds[0]) & (choice < thresholds[1])
    ch_missing = jnp.where(target_missing, ~ch_is_input,
                           jnp.where(input_missing, ch_is_input,
                                     jnp.zeros_like(ch_is_input)))
    return jnp.broadcast_to(ch_missing[None, None, :], (t_dim, x_dim, c))


def sample_train_mask_var(key, t_dim: int, x_dim: int, inp_ch: int = 1,
                          tar_ch: int = 1):
    """50/50: either the input block or the target block is missing.

    Matches HDF5MaskDataset: rand > 0.5 -> input observed / target missing.
    """
    choice = jax.random.uniform(key)
    # p(target missing) = p(rand > 0.5) = 0.5, else input missing
    mask = _var_mask(choice, (0.5, 1.0), t_dim, x_dim, inp_ch, tar_ch)
    return mask.astype(jnp.float32)


def sample_train_mask_time(key, t_dim: int, x_dim: int, inp_ch: int = 1,
                           tar_ch: int = 1):
    """Mixed-conditional time masking: 40% target-missing / 40% input-missing
    / 20% both-present, then additionally mask everything after a random
    per-variable time cutoff t_max in [T/2, T]."""
    k_var, k_t1, k_t2 = jax.random.split(key, 3)
    choice = jax.random.uniform(k_var)
    mask_var = _var_mask(choice, (0.4, 0.8), t_dim, x_dim, inp_ch, tar_ch)

    t_max1 = t_dim // 2 + jax.random.randint(k_t1, (), 0, t_dim // 2 + 1)
    t_max2 = t_dim // 2 + jax.random.randint(k_t2, (), 0, t_dim // 2 + 1)
    t_idx = jnp.arange(t_dim)[:, None, None]
    ch_is_input = (jnp.arange(inp_ch + tar_ch) < inp_ch)[None, None, :]
    observed_res = jnp.where(ch_is_input, t_idx < t_max1, t_idx < t_max2)
    mask_res = ~jnp.broadcast_to(observed_res, mask_var.shape)
    return (mask_var | mask_res).astype(jnp.float32)


def sample_train_mask_sparse(key, t_dim: int, x_dim: int, inp_ch: int = 1,
                             tar_ch: int = 1):
    """Sparse-observation masking: 33/33/33 variable masking plus random
    2^k spatial/temporal observation strides and time cutoffs."""
    k_var, k_r1, k_r2, k_t1, k_t2 = jax.random.split(key, 5)
    choice = jax.random.uniform(k_var)
    mask_var = _var_mask(choice, (1 / 3, 2 / 3), t_dim, x_dim, inp_ch, tar_ch)

    res_rand1 = jax.random.randint(k_r1, (), 0, 3) + 1  # 1..3
    res_rand2 = jax.random.randint(k_r2, (), 0, 3) + 1
    each1 = 2 ** (res_rand1 - 1)
    each2 = 2 ** (res_rand2 - 1)

    res_cur1 = t_dim // each1
    res_cur2 = t_dim // each2
    t_max1 = t_dim // 2 + res_rand1 * jax.random.randint(k_t1, (), 0, res_cur1 // 2 + 1)
    t_max2 = t_dim // 2 + res_rand2 * jax.random.randint(k_t2, (), 0, res_cur2 // 2 + 1)

    t_idx = jnp.arange(t_dim)[:, None, None]
    x_idx = jnp.arange(x_dim)[None, :, None]
    obs1 = (t_idx < t_max1) & (t_idx % each1 == 0) & (x_idx % each1 == 0)
    obs2 = (t_idx < t_max2) & (t_idx % each2 == 0) & (x_idx % each2 == 0)
    ch_is_input = (jnp.arange(inp_ch + tar_ch) < inp_ch)[None, None, :]
    observed = jnp.where(ch_is_input, obs1, obs2)
    mask_res = ~jnp.broadcast_to(observed, mask_var.shape)
    return (mask_var | mask_res).astype(jnp.float32)


TRAIN_MASK_SAMPLERS = {
    "var": sample_train_mask_var,
    "time": sample_train_mask_time,
    "sparse": sample_train_mask_sparse,
}


# ---------------------------------------------------------------------------
# Evaluation mask tasks (static, stacked)
# ---------------------------------------------------------------------------

def _block(t_dim, x_dim, inp_missing, tar_missing, inp_ch, tar_ch):
    inp = np.full((t_dim, x_dim, inp_ch), float(inp_missing), np.float32)
    tar = np.full((t_dim, x_dim, tar_ch), float(tar_missing), np.float32)
    return np.concatenate([inp, tar], axis=-1)


def eval_masks_var(t_dim: int, x_dim: int, inp_ch: int = 1, tar_ch: int = 1
                   ) -> Dict[str, np.ndarray]:
    """{"u": input observed / target missing, "h": the inverse}."""
    return {
        "u": _block(t_dim, x_dim, 0, 1, inp_ch, tar_ch),
        "h": _block(t_dim, x_dim, 1, 0, inp_ch, tar_ch),
    }


def eval_masks_time(t_dim: int, x_dim: int, inp_ch: int = 1, tar_ch: int = 1,
                    add_time_masks: bool = False) -> Dict[str, np.ndarray]:
    """Variable-recovery tasks, optionally replaced by the half-time forecast
    task set {"hu", "u", "h"} (reference h5_dataset.py:355-391)."""
    if not add_time_masks:
        return eval_masks_var(t_dim, x_dim, inp_ch, tar_ch)
    half = int(0.5 * t_dim)
    m_hu = _block(t_dim, x_dim, 0, 0, inp_ch, tar_ch)
    m_hu[half:] = 1.0
    m_u = _block(t_dim, x_dim, 0, 1, inp_ch, tar_ch)
    m_u[half:, :, :inp_ch] = 1.0
    m_h = _block(t_dim, x_dim, 1, 0, inp_ch, tar_ch)
    m_h[half:, :, inp_ch:] = 1.0
    return {"hu": m_hu, "u": m_u, "h": m_h}


def eval_masks_sparse(t_dim: int, x_dim: int, inp_ch: int = 1, tar_ch: int = 1,
                      add_res_masks: bool = False) -> Dict[str, np.ndarray]:
    """Variable-recovery tasks; with add_res_masks, every-4th-point
    observation variants (reference h5_dataset.py:497-546)."""
    if not add_res_masks:
        return eval_masks_var(t_dim, x_dim, inp_ch, tar_ch)
    m_u = _block(t_dim, x_dim, 1, 1, inp_ch, tar_ch)
    m_u[::4, ::4, :inp_ch] = 0.0
    m_h = _block(t_dim, x_dim, 1, 1, inp_ch, tar_ch)
    m_h[::4, ::4, inp_ch:] = 0.0
    return {"u": m_u, "h": m_h}


def stack_eval_masks(masks: Dict[str, np.ndarray]
                     ) -> Tuple[Tuple[str, ...], np.ndarray]:
    """Dict -> (static names, (n_tasks, T, X, C) tensor) for jit-friendly
    iteration over eval tasks."""
    names = tuple(masks.keys())
    return names, np.stack([masks[n] for n in names], axis=0)
