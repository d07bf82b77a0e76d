"""Shared task infrastructure: TrainState, optimizers, EMA, data transforms.

The reference wraps training logic in mutable LightningModules; here a task is
a thin object owning *pure jitted functions* over an immutable TrainState:

    state = task.init_state(rng, norm_stats)
    state, metrics = task.train_step(state, batch, rng)     # jit + pjit-able
    metrics = task.eval_step(state, batch, rng, split=...)  # jit-able

Parity anchors:
  - EMA update:       models/ddim_blocks.py:38-59 (deepcopy shadow) — here a
                      tree_map fused into train_step
  - optimizers:       models/mcedm.py:139-161 (Adam/RMSProp/SGD)
  - data transforms:  models/mcedm.py:170-197 (normalize/dequantize/rescale)
  - min-max scaling:  models/ddim.py:688-698 (scale_each_min_max)
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from m_cedm_tpu.ops.normalizer import Normalizer


@flax.struct.dataclass
class TrainState:
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray
    normalizer_input: Normalizer
    normalizer_target: Normalizer


def make_optimizer(opt_cfg, grad_clip: Optional[float] = None) -> optax.GradientTransformation:
    name = opt_cfg.get("optimizer", "Adam")
    lr = opt_cfg["lr"]
    wd = opt_cfg.get("weight_decay", 0.0)
    if name == "Adam":
        tx = optax.adam(lr, b1=opt_cfg.get("beta1", 0.9), b2=0.999,
                        eps=opt_cfg.get("eps", 1e-8))
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name == "AdamW":
        tx = optax.adamw(lr, b1=opt_cfg.get("beta1", 0.9), b2=0.999,
                         eps=opt_cfg.get("eps", 1e-8), weight_decay=wd)
    elif name == "RMSProp":
        tx = optax.rmsprop(lr)
        if wd:
            tx = optax.chain(optax.add_decayed_weights(wd), tx)
    elif name == "SGD":
        tx = optax.sgd(lr, momentum=0.9)
    else:
        raise NotImplementedError(f"Optimizer {name} not understood.")
    if grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(grad_clip), tx)
    return tx


def ema_update(ema_params, params, rate: float):
    """shadow <- shadow * rate + params * (1 - rate), fused into train_step."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + (1.0 - rate) * p, ema_params, params)


def normalizers_from_stats(stats, normalization: str,
                           inp_shape=(), tar_shape=()) -> Tuple[Normalizer, Normalizer]:
    """Build input/target normalizers from datamodule stats, matching
    PlMcedm.setup (models/mcedm.py:128-137)."""

    def squeeze(v):
        v = np.asarray(v, np.float32)
        return v.reshape(()) if v.size == 1 else v

    if normalization == "min_max":
        n_in = Normalizer.min_max(squeeze(stats["input_min"]), squeeze(stats["input_min_max"]))
        n_tar = Normalizer.min_max(squeeze(stats["target_min"]), squeeze(stats["target_min_max"]))
    else:
        n_in = Normalizer.gauss(squeeze(stats["input_mean"]), squeeze(stats["input_std"]))
        n_tar = Normalizer.gauss(squeeze(stats["target_mean"]), squeeze(stats["target_std"]))
    return n_in, n_tar


class DataTransform:
    """normalize -> (dequantize) -> (rescale) and its inverse, as static
    config + pure functions over the state's normalizers."""

    def __init__(self, data_cfg):
        self.normalization = data_cfg.get("normalization", "gauss")
        self.uniform_dequantization = data_cfg.get("uniform_dequantization", False)
        self.gaussian_dequantization = data_cfg.get("gaussian_dequantization", False)
        self.rescaled = data_cfg.get("rescaled", False)

    def forward(self, state: TrainState, h, u, key=None):
        h = state.normalizer_input(h)
        u = state.normalizer_target(u)
        x = jnp.concatenate([h, u], axis=-1)
        if self.uniform_dequantization:
            x = x / 256.0 * 255.0 + jax.random.uniform(key, x.shape) / 256.0
        if self.gaussian_dequantization:
            x = x + jax.random.normal(key, x.shape) * 0.01
        if self.rescaled:
            x = 2 * x - 1.0
        return x

    def inverse(self, state: TrainState, h, u):
        if self.rescaled:
            h = (h + 1.0) / 2.0
            u = (u + 1.0) / 2.0
        if self.normalization == "min_max":
            h = jnp.clip(h, 0.0, 1.0)
            u = jnp.clip(u, 0.0, 1.0)
        h = state.normalizer_input(h, inverse=True)
        u = state.normalizer_target(u, inverse=True)
        return h, u


def scale_each_min_max(state, return_min_max: bool = False):
    """Rescale each (sample, channel) field to [0, 1] over its (H, W) extent."""
    b, c = state.shape[0], state.shape[-1]
    flat = state.reshape(b, -1, c)
    mn = jnp.min(flat, axis=1, keepdims=True)
    mx = jnp.max(flat, axis=1, keepdims=True)
    scaled = ((flat - mn) / (mx - mn)).reshape(state.shape)
    if return_min_max:
        return scaled, mn, mx
    return scaled


def scale_back_min_max(scaled, mn, mx):
    b, c = scaled.shape[0], scaled.shape[-1]
    flat = scaled.reshape(b, -1, c)
    return (flat * (mx - mn) + mn).reshape(scaled.shape)


def chunked_ensemble(draw, keys, chunk: int = 4, mesh=None, axis: str = "data"):
    """vmap `draw` over an ensemble of PRNG keys in chunks.

    The reference folds the n_samples ensemble into the batch
    (mcedm.py:356-376, run.py:52-54 forces test_batch_size=1 at
    n_samples=100). A flat vmap over 100 Heun scans is one gigantic XLA
    program (compile time and activation memory scale with the ensemble), so
    large ensembles run as a `lax.map` over vmap-chunks: the chunk body is
    compiled once and iterated sequentially, bounding both. Chunks stay
    vmapped so each iteration still fills the chip.

    `mesh`: SPMD ensemble parallelism (SURVEY §2.9 headroom) — the chunk
    axis is sharding-constrained over the mesh's `axis`, so each device
    draws its ensemble members and the only cross-device traffic is the
    final ensemble reduction. Used by the production eval path when the
    batch axis itself is not shardable (the reference's
    n_samples=100/batch-1 test regime); requires n % mesh.shape[axis] == 0
    (falls back to the single-device chunking otherwise).
    """
    n = keys.shape[0]
    if mesh is not None and n > 1 and n % mesh.shape[axis] == 0:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.shape[axis]
        c = ndev * max(1, chunk // ndev)
        if n % c != 0:
            c = ndev
        if n == c:
            keys = jax.lax.with_sharding_constraint(
                keys, NamedSharding(mesh, P(axis)))
            return jax.vmap(draw)(keys)
        ks = keys.reshape((n // c, c) + keys.shape[1:])
        ks = jax.lax.with_sharding_constraint(
            ks, NamedSharding(mesh, P(None, axis)))
        out = jax.lax.map(lambda kk: jax.vmap(draw)(kk), ks)
        return jax.tree_util.tree_map(
            lambda x: x.reshape((n,) + x.shape[2:]), out)
    if n <= chunk or n % chunk != 0:
        return jax.vmap(draw)(keys)
    ks = keys.reshape((n // chunk, chunk) + keys.shape[1:])
    out = jax.lax.map(lambda kk: jax.vmap(draw)(kk), ks)
    return jax.tree_util.tree_map(
        lambda x: x.reshape((n,) + x.shape[2:]), out)


def mae(pred, target):
    return jnp.mean(jnp.abs(pred - target))
