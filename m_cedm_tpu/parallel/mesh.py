"""Device mesh + sharding helpers (the distributed layer).

The reference scales by PyTorch-Lightning DDP over NCCL (trainer config
`strategy: 'ddp'`, configs/trainer/trainer_ddim.yaml:8; SURVEY.md §2.9). The
TPU-native equivalent is declarative:

  * one `jax.sharding.Mesh` whose axes are ('data',) by default, extensible
    to ('data', 'model') for tensor-parallel runs;
  * batches placed with NamedSharding(P('data', ...)) — the batch axis is
    split across ICI;
  * TrainState replicated (NamedSharding(P()));
  * jit propagates the shardings through the train step and XLA emits the
    gradient all-reduce (psum) over ICI automatically — the entire DDP
    machinery of the reference is these ~60 lines.

Multi-host: `distributed_init()` wires DCN via jax.distributed.initialize;
`jax.process_index() == 0` gates host I/O (the reference's rank_zero_only).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init():
    """Initialize multi-host JAX if a coordinator is configured (no-op on a
    single host). Mirrors DDP process-group setup (reference
    configs/trainer/trainer_ddim.yaml:8 `strategy: 'ddp'`).

    On TPU pods the runtime autodetects everything, so a bare
    JAX_COORDINATOR_ADDRESS suffices; when JAX_NUM_PROCESSES/JAX_PROCESS_ID
    are also set (manual launches, the CPU gloo dryrun —
    tools/dryrun_2proc.py) they are passed explicitly."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    if nproc:
        jax.distributed.initialize(
            coordinator_address=addr, num_processes=int(nproc),
            process_id=int(os.environ["JAX_PROCESS_ID"]))
    else:
        jax.distributed.initialize(coordinator_address=addr)


def make_mesh(axes: Sequence[str] = ("data",),
              shape: Optional[Sequence[int]] = None,
              devices=None) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: every device on one 'data' axis — exactly the reference's
    data-parallel semantics. Pass axes=('data', 'model') + shape for
    tensor-parallel layouts.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = [len(devices)] + [1] * (len(axes) - 1)
    return Mesh(devices.reshape(shape), axis_names=tuple(axes))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Optional[Mesh], axis: str = "data"):
    """device_put a host batch with the batch axis split over the mesh.
    Arrays whose leading dim is not divisible by the mesh size (per-item
    constants, grids) are replicated."""
    if mesh is None:
        return jax.device_put(batch)
    n = mesh.shape[axis]
    b_shard = batch_sharding(mesh, axis)
    repl = replicated(mesh)

    def place(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 0:
            return jax.device_put(x, b_shard)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Optional[Mesh]):
    """Replicate a pytree (TrainState) across the mesh."""
    if mesh is None:
        return jax.device_put(tree)
    return jax.device_put(tree, replicated(mesh))


def shard_ensemble(keys, mesh: Optional[Mesh], axis: str = "data"):
    """Split an ensemble of PRNG keys over the mesh (SURVEY §2.9 headroom:
    the n_samples test ensemble is the natural extra parallel axis of this
    workload — the reference folds it into the batch).

    A `vmap(draw)` over the returned keys runs SPMD: with state replicated,
    XLA partitions the whole sampler over the ensemble axis and each device
    draws its members — no collectives until the ensemble reduction.
    Requires len(keys) % mesh.shape[axis] == 0 (callers fall back to the
    unsharded path otherwise)."""
    if mesh is None or keys.shape[0] % mesh.shape[axis] != 0:
        return keys
    return jax.device_put(keys, NamedSharding(mesh, P(axis)))
