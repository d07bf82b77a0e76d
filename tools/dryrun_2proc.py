#!/usr/bin/env python
"""Two-process DCN dryrun: the multi-HOST path of parallel/mesh.py executed
for real (gloo collectives between OS processes on CPU).

The single-process virtual-device tests (tests/test_parallel.py,
__graft_entry__.dryrun_multichip) prove the sharding semantics but never
exercise `distributed_init()` or cross-process collectives. This worker runs
under TWO coordinated processes (4 virtual CPU devices each → one 8-device
global 'data' mesh), executes one pjit-sharded train step of the flagship
task at toy resolution, and prints a parameter checksum — the spawning test
asserts both processes converge to the SAME replicated state (the DDP
invariant; reference configs/trainer/trainer_ddim.yaml:8).

Usage (the test spawns these):
    JAX_COORDINATOR_ADDRESS=127.0.0.1:<port> JAX_NUM_PROCESSES=2 \
        JAX_PROCESS_ID=<0|1> python tools/dryrun_2proc.py
"""
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from m_cedm_tpu.parallel.mesh import distributed_init, make_mesh  # noqa: E402


def main():
    distributed_init()
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert jax.local_device_count() == 4, jax.local_device_count()

    from __graft_entry__ import _flagship

    res = 16
    task = _flagship(res=res)
    state = task.init_state(jax.random.PRNGKey(0))
    mesh = make_mesh()
    bsh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    b = 8  # one sample per global device
    key = jax.random.PRNGKey(1)  # same seed on both processes
    h = np.asarray(jax.random.normal(key, (b, res, res, 1))) + 1.5
    u = np.asarray(jax.random.normal(jax.random.fold_in(key, 1),
                                     (b, res, res, 1))) * 0.1
    grid = np.broadcast_to(np.linspace(0, 1, res)[None, :, None, None],
                           (b, res, res, 1))
    pid = jax.process_index()
    lo, hi = pid * 4, pid * 4 + 4  # this process's 4 rows of the batch

    def shard(x):
        return jax.make_array_from_process_local_data(bsh, x[lo:hi])

    batch = tuple(shard(np.asarray(x, np.float32))
                  for x in (h, grid, np.transpose(grid, (0, 2, 1, 3)), u))

    def rep(x):
        return jax.make_array_from_process_local_data(repl, np.asarray(x))

    state = jax.tree_util.tree_map(
        lambda x: rep(x) if getattr(x, "ndim", None) is not None else x,
        state)
    step_key = rep(jax.random.PRNGKey(2))

    state, metrics = task.train_step(state, batch, step_key)
    loss = float(np.asarray(
        metrics["train_loss"].addressable_shards[0].data))
    assert np.isfinite(loss), loss

    # replicated-params checksum: must agree bit-for-bit across processes
    csum = 0.0
    for leaf in jax.tree_util.tree_leaves(state.params):
        shards = getattr(leaf, "addressable_shards", None)
        if shards:
            csum += float(np.abs(np.asarray(shards[0].data, np.float64)).sum())
    print(f"DRYRUN2PROC pid={pid} loss={loss:.6f} csum={csum:.6f}",
          flush=True)


if __name__ == "__main__":
    main()
