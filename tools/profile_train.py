#!/usr/bin/env python
"""Device-profile the flagship train step and print a per-op cost map.

The round-3 VERDICT's top ask: nobody ever mapped where the train step's
time goes the way tools/profile_fwd.py mapped the forward — the 2/3 of the
step that is backward + optimizer/EMA was unprofiled territory. This traces
ONE jitted program of `--calls` chained train steps (states feed each other,
so no dispatch can be skipped), parses the Chrome trace's TPU plane, and
prints per-bucket / per-op ms per step.

The forward is subtractable: run tools/profile_fwd.py at the same shape and
diff the buckets — what remains is backward + optimizer + EMA.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train.py \
        [--calls 10] [--dtype bfloat16] [--out /tmp/prof_train]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.profile_fwd import parse_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/prof_train")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    if not args.parse_only:
        os.environ.setdefault("MCEDM_PALLAS", "1")
        import jax
        import jax.numpy as jnp

        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass
        import bench as bench_mod

        B, RES = args.batch, bench_mod.RES
        task = bench_mod.make_task(args.dtype, pallas=True)
        state = task.init_state(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
        u = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, RES, RES, 1)) * 0.1
        grid = jnp.broadcast_to(
            jnp.linspace(0, 1, RES)[None, :, None, None], (B, RES, RES, 1))
        batch = (h, grid, jnp.transpose(grid, (0, 2, 1, 3)), u)

        raw = type(task).train_step
        raw = getattr(raw, "__wrapped__", raw)

        def f(s, k):
            for i in range(args.calls):
                s, m = raw(task, s, batch, jax.random.fold_in(k, i))
            return s, m["train_loss"]

        jf = jax.jit(f)
        s, loss = jf(state, key)
        float(loss)  # compile outside the trace
        with jax.profiler.trace(args.out):
            s, loss = jf(state, key)
            float(loss)

    path, per_op, per_bucket, total = parse_trace(args.out)
    calls = args.calls
    print(f"trace: {path}")
    print(f"device total: {total:.2f} ms over {calls} steps "
          f"= {total / calls:.3f} ms/step\n")
    print("== buckets (ms/step) ==")
    for b, ms in per_bucket.most_common():
        print(f"  {ms / calls:7.3f}  {b}")
    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, ms in per_op.most_common(args.top):
        print(f"  {ms / calls:7.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
