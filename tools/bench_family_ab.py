#!/usr/bin/env python
"""Same-session A/B of family-level env gates (FNO / OFormer).

Protocol (CLAUDE.md): one process, flip trace-time env gates between jits,
median over reps with the host round-trip subtracted. Use for e.g.:

    python tools/bench_family_ab.py --family fno \
        --variants 'fft:MCEDM_FNO_DFT=0' 'dft:MCEDM_FNO_DFT=1'
"""
import argparse
import os
import statistics
import sys
import time

import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_GATE_KEYS = ("MCEDM_FNO_DFT", "MCEDM_OFORMER_BF16", "MCEDM_FNO_BF16",
              "MCEDM_OFORMER_ATTN3")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["fno", "oformer"], required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    ap.add_argument("--variants", nargs="+", required=True)
    args = ap.parse_args()

    import bench as bench_mod

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
            os.environ.pop(k, None)
        for kv in filter(None, envs.split(",")):
            k, _, v = kv.partition("=")
            os.environ[k] = v
        if args.family == "fno":
            task, state, batch = bench_mod.make_fno_setup()
        else:
            task, state, batch = bench_mod.make_oformer_setup()
        t0 = time.time()
        tms = bench_mod._chained_train_ms(task, state, batch, roundtrip,
                                          chain=args.chain, reps=args.reps)
        print(f"{name}: train {tms[0]:.2f} ms/step (min {tms[1]:.2f} max "
              f"{tms[2]:.2f})  [wall incl compile {time.time()-t0:.0f}s]",
              flush=True)
        if args.family == "fno":
            u, x, t, _ = batch
            infer = jax.jit(lambda p, u_, x_, t_: jnp.sum(
                task._predict(p, u_, x_, t_)))
            ims = bench_mod._timed_reps(
                lambda: float(infer(state.params, u, x, t)), roundtrip,
                n=args.reps)
        else:
            xtok, y, nt, pos, n_time = batch
            infer = jax.jit(lambda s, b: jnp.sum(task.model.apply(
                s.params, b[0], b[2], b[2], b[3], b[3], 1)))
            ims = bench_mod._timed_reps(lambda: float(infer(state, batch)),
                                        roundtrip, n=args.reps)
        print(f"{name}: infer {ims[0]:.2f} ms (min {ims[1]:.2f} max "
              f"{ims[2]:.2f})", flush=True)
        results[name] = (tms[0], ims[0])
    base = next(iter(results.values()))
    for name, (tm, im) in results.items():
        print(f"{name}: train {tm:.2f} ms ({base[0] / tm:.3f}x)  "
              f"infer {im:.2f} ms ({base[1] / im:.3f}x)", flush=True)


if __name__ == "__main__":
    main()
