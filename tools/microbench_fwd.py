#!/usr/bin/env python
"""Micro-benchmark: flagship ADM forward (the Heun sampler's inner net call)
on the real device, kernels on vs off, plus fused-kernel numerics vs the
identical-math jnp reference. Used to measure kernel optimizations in
isolation (full bench.py runs take ~10 min; this takes ~1)."""
import argparse
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--skip-check", action="store_true")
    args = ap.parse_args()

    import os

    os.environ["MCEDM_PALLAS"] = "1"
    from m_cedm_tpu.pallas.fused_norm_conv import (fused_gn_silu_conv,
                                                   gn_silu_conv_reference)

    B, RES = args.batch, args.res
    key = jax.random.PRNGKey(0)

    if not args.skip_check:
        # numerics: kernel vs identical-math jnp reference at flagship shape
        for dt in (jnp.float32, jnp.bfloat16):
            x = jax.random.normal(key, (2, RES, RES, 64), dt)
            gamma = jax.random.normal(jax.random.fold_in(key, 1), (2, 64))
            beta = jax.random.normal(jax.random.fold_in(key, 2), (2, 64))
            w = jax.random.normal(jax.random.fold_in(key, 3),
                                  (3, 3, 64, 64), dt) * 0.05
            bias = jax.random.normal(jax.random.fold_in(key, 4), (64,))
            got = np.asarray(fused_gn_silu_conv(x, gamma, beta, w, bias, 16)
                             .astype(jnp.float32))
            want = np.asarray(gn_silu_conv_reference(x, gamma, beta, w, bias,
                                                     16).astype(jnp.float32))
            d = np.abs(got - want).max()
            s = np.abs(want).max()
            print(f"kernel-vs-ref ({dt.__name__}): max delta {d:.3e} "
                  f"(scale {s:.2f})")
            assert d <= (5e-2 if dt == jnp.bfloat16 else 2e-3) * s, d

    # Flagship forward timing, kernels on vs off. Single-call wall timing is
    # polluted by a ~30 ms fixed dispatch/round-trip overhead on the tunneled
    # backend (measured: chain fit gave 11.44 ms/call where single-call
    # timing said 4.85), so time jitted CHAINS of n calls and take the slope
    # (t[n2]-t[n1])/(n2-n1) — fixed overhead cancels exactly.
    import bench as bench_mod

    def timed(pallas):
        task = bench_mod.make_task("bfloat16", pallas=pallas)
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        params = task._sample_params(state)
        x0 = jax.random.normal(key, (B, RES, RES, 2))
        cond = jax.random.normal(jax.random.fold_in(key, 9),
                                 (B, RES, RES, 2))

        def chain_ms(n):
            def f(x):
                for i in range(n):
                    x = task.model_precond(params, x,
                                           jnp.full((B,), 1.5 + i), cond)
                return jnp.sum(x)
            jf = jax.jit(f)
            float(jf(x0))  # compile
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                float(jf(x0))
                ts.append((time.perf_counter() - t0) * 1e3)
            return statistics.median(ts)

        # keep chains short: each distinct chain length is a fresh ~1-3 min
        # XLA compile on this backend (the persistent cache amortizes reruns)
        n1, n2 = 2, 8
        return (chain_ms(n2) - chain_ms(n1)) / (n2 - n1)

    on = timed(True)
    off = timed(False)
    os.environ["MCEDM_PALLAS"] = "1"
    print(f"fwd kernels-on : {on:.2f} ms/call (chain-slope)")
    print(f"fwd kernels-off: {off:.2f} ms/call (chain-slope)")
    print(f"speedup: {off / on:.3f}x")


if __name__ == "__main__":
    main()
