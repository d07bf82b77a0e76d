#!/usr/bin/env python
"""Same-session sampler A/B over env-gate variants on the real device.

Protocol (CLAUDE.md): jit the 50-step Heun scan per variant in ONE process,
flip the trace-time env gates between traces (compile cache makes each
variant ~20-60 s), subtract the measured host round-trip, report medians.
Cross-session comparisons are device-state-confounded — only same-process
ratios are trustworthy.

Usage:
    python tools/bench_sampler_ab.py \
        --variants 'base:' 'upk:MCEDM_UPCONV=kernel' \
                   'upk+res:MCEDM_UPCONV=kernel,MCEDM_UPRES=1'
"""
import argparse
import os
import statistics
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

_GATE_KEYS = ("MCEDM_BLOCK_FUSION", "MCEDM_DUAL", "MCEDM_UPCONV",
              "MCEDM_UPRES", "MCEDM_OUT_HEAD", "MCEDM_PALLAS",
              "MCEDM_BWD_KERNEL", "MCEDM_PAD", "MCEDM_TILE_R",
              "MCEDM_MEGA", "MCEDM_STATS_TILE", "MCEDM_PAIR",
              "MCEDM_PAIRIO", "MCEDM_1X1", "MCEDM_IN_HEAD", "MCEDM_SHPAIR",
              "MCEDM_UPDENSE", "MCEDM_POOL_IDX", "MCEDM_OUTPAIR",
              "MCEDM_QKV_SPLIT")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variants", nargs="+",
                    default=["base:", "upk:MCEDM_UPCONV=kernel",
                             "upres:MCEDM_UPRES=1",
                             "upk+res:MCEDM_UPCONV=kernel,MCEDM_UPRES=1"])
    args = ap.parse_args()

    os.environ.setdefault("MCEDM_PALLAS", "1")
    import bench as bench_mod

    B, RES = args.batch, bench_mod.RES
    key = jax.random.PRNGKey(0)

    z = jnp.zeros(())
    for _ in range(2):
        float(z)
    rts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(z)
        rts.append(time.perf_counter() - t0)
    roundtrip = statistics.median(rts)
    print(f"host round-trip: {roundtrip * 1e3:.1f} ms", flush=True)

    results = {}
    for spec in args.variants:
        name, _, envs = spec.partition(":")
        for k in _GATE_KEYS:
            if k != "MCEDM_PALLAS":
                os.environ.pop(k, None)
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
        task = bench_mod.make_task(args.dtype, pallas=True)
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
        u = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, RES, RES, 1)) * 0.1
        grid = jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None, None],
                                (B, RES, RES, 1))
        mask = jnp.concatenate([jnp.zeros((B, RES, RES, 1)),
                                jnp.ones((B, RES, RES, 1))], axis=-1)
        gt = task.transform.forward(state, h, u)
        cond = task.get_cond_in(gt, mask, grid,
                                jnp.transpose(grid, (0, 2, 1, 3)),
                                jax.random.PRNGKey(4))
        fn = jax.jit(lambda s, c, m, k: jnp.sum(task.sample_edm(s, c, m, k)))
        t0 = time.time()
        float(fn(state, cond, mask, jax.random.PRNGKey(5)))
        print(f"{name}: compile {time.time() - t0:.1f} s", flush=True)
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            float(fn(state, cond, mask, jax.random.PRNGKey(6 + i)))
            ts.append((time.perf_counter() - t0 - roundtrip) * 1e3)
        med = statistics.median(ts)
        results[name] = med
        print(f"{name}: {med:.1f} ms/50-step-sample (min {min(ts):.1f} "
              f"max {max(ts):.1f}) = {B / (med / 1e3):.2f} samples/s",
              flush=True)
    base = next(iter(results.values()))
    for name, med in results.items():
        print(f"{name}: {med:.1f} ms  ({base / med:.3f}x vs first)",
              flush=True)


if __name__ == "__main__":
    main()
