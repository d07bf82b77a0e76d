#!/usr/bin/env python
"""Same-session A/B of the DDPM-family joint sampler over env-gate variants
(notably MCEDM_DDPM_PAIR) on the real device. Mirrors bench_sampler_ab.py
for the DDIM/joint-DDPM net (res-128 bench shape; the round-2 recorded
baseline for this workload is 5.97 samples/s pure-XLA)."""
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

_GATE_KEYS = ("MCEDM_DDPM_PAIR", "MCEDM_PAIR", "MCEDM_PAIRIO", "MCEDM_1X1",
              "MCEDM_PALLAS", "MCEDM_DDPM_PAIRIO", "MCEDM_SHPAIR",
              "MCEDM_DDPM_OUTHEAD", "MCEDM_QKV_SPLIT", "MCEDM_OUTPAIR")


def make_ddim_task(dtype="bfloat16"):
    from bench import make_ddim_task as _mk

    return _mk(dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--variants", nargs="+",
                    default=["xla:", "pair:MCEDM_DDPM_PAIR=1"])
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
        task = make_ddim_task(args.dtype)
        state = task.init_state(jax.random.PRNGKey(0))
        h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
        u = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, RES, RES, 1)) * 0.1
        hu = task.transform.forward(state, h, u)
        h_only = hu[..., :task.h_ch]
        fn = jax.jit(lambda s, x, k: jnp.sum(task.sample(s, x, k)))
        t0 = time.time()
        float(fn(state, h_only, jax.random.PRNGKey(5)))
        print(f"{name}: compile {time.time() - t0:.1f} s", flush=True)
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            float(fn(state, h_only, jax.random.PRNGKey(6 + i)))
            ts.append((time.perf_counter() - t0 - roundtrip) * 1e3)
        med = statistics.median(ts)
        results[name] = med
        print(f"{name}: {med:.1f} ms/50-step-ddim (min {min(ts):.1f} "
              f"max {max(ts):.1f}) = {B / (med / 1e3):.2f} samples/s",
              flush=True)
    base = next(iter(results.values()))
    for name, med in results.items():
        print(f"{name}: {med:.1f} ms  ({base / med:.3f}x vs first)",
              flush=True)


if __name__ == "__main__":
    main()
