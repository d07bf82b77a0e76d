"""Per-channel affine normalization as an immutable pytree.

Parity target: models/normalizer.py:5-65 in the reference (buffer-backed
(x - subtract) / divide with an inverse). Here the stats are a frozen pytree
carried inside TrainState, so normalization composes with jit/vmap/pjit and
is checkpointed alongside parameters.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Normalizer:
    """x_norm = (x - subtract) / divide; inverse: x = x_norm * divide + subtract.

    subtract/divide broadcast against the trailing (channel) axis.
    """
    subtract: Any
    divide: Any

    @staticmethod
    def identity(stats_shape=()):
        return Normalizer(subtract=jnp.zeros(stats_shape, jnp.float32),
                          divide=jnp.ones(stats_shape, jnp.float32))

    @staticmethod
    def gauss(mean, std):
        return Normalizer(subtract=jnp.asarray(mean, jnp.float32),
                          divide=jnp.asarray(std, jnp.float32))

    @staticmethod
    def min_max(minimum, value_range):
        return Normalizer(subtract=jnp.asarray(minimum, jnp.float32),
                          divide=jnp.asarray(value_range, jnp.float32))

    def __call__(self, x, inverse: bool = False):
        if inverse:
            return x * self.divide + self.subtract
        return (x - self.subtract) / self.divide

    def encode(self, x):
        return (x - self.subtract) / self.divide

    def decode(self, x):
        return x * self.divide + self.subtract

    @property
    def num_channels(self) -> int:
        arr = jnp.asarray(self.subtract)
        return int(arr.shape[-1]) if arr.ndim > 0 else 1
