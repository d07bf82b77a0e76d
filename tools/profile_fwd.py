#!/usr/bin/env python
"""Device-profile the flagship ADM forward and print a per-op cost map.

Traces N jitted forward calls with jax.profiler, parses the Chrome trace
(plugins/profile/*/<host>.trace.json.gz — the TPU plane), aggregates
device-op durations by bucket, and prints the per-call breakdown. This is
the round-3 optimization map generator (CLAUDE.md): the only reliable view
of where the 10.4 ms/call goes.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_fwd.py \
        [--calls 30] [--dtype bfloat16] [--out /tmp/prof_fwd]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def bucket(name: str) -> str:
    """Collapse an XLA/Mosaic op name into a readable cost bucket."""
    n = name.lower()
    if "custom-call" in n or "tpu_custom_call" in n or "mosaic" in n:
        return "pallas kernels"
    if "convert" in n:
        return "dtype converts"
    if n.startswith("fusion") or ".fusion" in n:
        if "conv" in n:
            return "xla convs"
        return "xla fusions"
    if "convolution" in n or "conv" in n:
        return "xla convs"
    if "concatenate" in n or "concat" in n:
        return "concats"
    if "copy" in n or "bitcast" in n or "transpose" in n or "reshape" in n:
        return "copies/layout"
    if "broadcast" in n:
        return "broadcasts"
    if "dot" in n or "matmul" in n:
        return "matmuls"
    if "dynamic" in n or "slice" in n or "pad" in n:
        return "slice/pad"
    if "reduce" in n:
        return "reduces"
    return "other"


def parse_trace(trace_dir: str):
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # find device pids: process_name metadata containing TPU / device (not host threads)
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = str(ev.get("args", {}).get("name", ""))
            if re.search(r"tpu|/device|xla.*device", pname, re.I) and "host" not in pname.lower():
                dev_pids.add(ev["pid"])
    if not dev_pids:
        # fallback: the historical pid for the TPU plane on this backend
        dev_pids = {3}
    per_op = collections.Counter()
    per_bucket = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        if name.startswith("jit_") or name.startswith("pjit"):
            continue  # whole-program envelope event — would double count
        per_op[name] += dur
        per_bucket[bucket(name)] += dur
        total += dur
    return path, per_op, per_bucket, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=30)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/prof_fwd")
    ap.add_argument("--parse-only", action="store_true",
                    help="only parse an existing trace dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if not args.parse_only:
        os.environ.setdefault("MCEDM_PALLAS", "1")
        import jax
        import jax.numpy as jnp

        try:
            jax.config.update("jax_compilation_cache_dir", "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass
        sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        import bench as bench_mod

        B, RES = args.batch, bench_mod.RES
        task = bench_mod.make_task(args.dtype, pallas=True)
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        params = task._sample_params(state)
        key = jax.random.PRNGKey(1)
        x0 = jax.random.normal(key, (B, RES, RES, 2))
        cond = jax.random.normal(jax.random.fold_in(key, 9), (B, RES, RES, 2))

        # one jitted program of `calls` chained fwd calls (the sampler's inner
        # net call) — matches the microbench chain protocol so per-call times
        # line up with its slope numbers
        def f(x):
            for i in range(args.calls):
                x = task.model_precond(params, x, jnp.full((B,), 1.5 + i), cond)
            return jnp.sum(x)

        jf = jax.jit(f)
        float(jf(x0))  # compile outside the trace
        with jax.profiler.trace(args.out):
            float(jf(x0))

    path, per_op, per_bucket, total = parse_trace(args.out)
    calls = args.calls
    print(f"trace: {path}")
    print(f"device total: {total:.2f} ms over {calls} calls "
          f"= {total / calls:.3f} ms/call\n")
    print("== buckets (ms/call) ==")
    for b, ms in per_bucket.most_common():
        print(f"  {ms / calls:7.3f}  {b}")
    print(f"\n== top {args.top} ops (ms/call) ==")
    for name, ms in per_op.most_common(args.top):
        print(f"  {ms / calls:7.3f}  {name[:110]}")


if __name__ == "__main__":
    main()
