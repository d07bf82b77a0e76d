#!/usr/bin/env python
"""Same-session A/B of the train-fusion modes on the real device.

Modes (MCEDM_TRAIN_FUSION semantics, layers.train_fusion_mode):
  0     — fusion off under grad: XLA autodiff of the unfused composition
          (round-2 production default; 45.1 ms/step recorded)
  train — fused forward kernels + hand-written Pallas backward
          (pallas/fused_norm_conv.py phase A/B)
  full  — sampling-mode fusion incl. stats chaining; backward = XLA
          recompute of the reference composition (round-2's losing 64.1 ms)

Each mode builds a fresh task (the mode is read at trace time) and times
the full train step (fwd+bwd+optimizer+EMA) at the flagship shape,
subtracting the measured host round-trip. Cross-mode numbers are valid
within this process only (device-state drift across sessions).
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=9)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--modes", default="0,train,full")
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    os.environ["MCEDM_PALLAS"] = "1"
    import bench as bench_mod

    B, RES = args.batch, bench_mod.RES
    key = jax.random.PRNGKey(0)
    h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
    u = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 1)) * 0.1
    t = jnp.linspace(0, 1, RES)
    grid_t = jnp.broadcast_to(t[None, :, None, None], (B, RES, RES, 1))
    grid_x = jnp.broadcast_to(t[None, None, :, None], (B, RES, RES, 1))
    batch = (h, grid_t, grid_x, u)

    # host round-trip overhead (CLAUDE.md protocol)
    z = jnp.zeros(())
    for _ in range(2):
        float(z)
    rts = []
    for _ in range(7):
        t0 = time.perf_counter()
        float(z)
        rts.append(time.perf_counter() - t0)
    roundtrip = statistics.median(rts)
    print(f"host round-trip: {roundtrip * 1e3:.1f} ms")

    results = {}
    for mode in args.modes.split(","):
        # suffixes: "+pairio" threads the paired layout end-to-end,
        # "+pair"/"+nopair" force the paired-lane kernels on/off
        # (bare modes run the current defaults)
        fusion = mode
        os.environ["MCEDM_PAIRIO"] = "0"
        os.environ.pop("MCEDM_PAIR", None)
        os.environ.pop("MCEDM_PAIRIO_TRAIN", None)
        if fusion.endswith("+pairio"):
            os.environ["MCEDM_PAIRIO"] = "1"
            os.environ["MCEDM_PAIRIO_TRAIN"] = "1"
            fusion = fusion[:-len("+pairio")]
        elif fusion.endswith("+pair"):
            os.environ["MCEDM_PAIR"] = "1"
            fusion = fusion[:-len("+pair")]
        elif fusion.endswith("+nopair"):
            os.environ["MCEDM_PAIR"] = "0"
            fusion = fusion[:-len("+nopair")]
        os.environ["MCEDM_TRAIN_FUSION"] = fusion
        task = bench_mod.make_task(args.dtype, pallas=True)
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        t0 = time.time()
        state, m = task.train_step(state, batch, jax.random.PRNGKey(2))
        loss0 = float(m["train_loss"])
        print(f"mode={mode}: compile {time.time() - t0:.1f} s, "
              f"loss {loss0:.4f}")
        ts = []
        for i in range(args.reps):
            t0 = time.perf_counter()
            state, m = task.train_step(state, batch, jax.random.PRNGKey(3 + i))
            float(m["train_loss"])
            ts.append((time.perf_counter() - t0 - roundtrip) * 1e3)
        med = statistics.median(ts)
        results[mode] = med
        print(f"mode={mode}: {med:.1f} ms/step (min {min(ts):.1f}, "
              f"max {max(ts):.1f})")
    base = results.get("0")
    for mode, med in results.items():
        if base:
            print(f"mode={mode}: {med:.1f} ms  ({base / med:.3f}x vs mode 0)")


if __name__ == "__main__":
    main()
