#!/usr/bin/env python
"""Device-profile the flagship train step: fwd / bwd / optimizer decomposed.

The round-3 verdict's top ask: nobody ever mapped the backward the way
tools/profile_fwd.py mapped the forward. This traces three jitted programs
in one device session —

  fwd:   the train-trace loss forward alone (N chained evaluations)
  grad:  value_and_grad of the same loss (fwd+bwd, N chained)
  step:  the full production train_step (loss + optimizer + EMA), N calls

— parses the Chrome trace per program, and prints per-call bucket maps plus
phase deltas (bwd = grad - fwd, opt = step - grad). Same trace-parsing
machinery as profile_fwd.py.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_train.py \
        [--calls 10] [--dtype bfloat16] [--out /tmp/prof_train]
"""
import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.profile_fwd import bucket  # noqa: E402


def parse_trace_by_program(trace_dir: str):
    """Aggregate device-op durations grouped by enclosing jit program name."""
    paths = glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    dev_pids = set()
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pname = str(ev.get("args", {}).get("name", ""))
            if re.search(r"tpu|/device|xla.*device", pname, re.I) and "host" not in pname.lower():
                dev_pids.add(ev["pid"])
    if not dev_pids:
        dev_pids = {3}
    # program envelopes: jit_* X events on the device plane
    envelopes = []  # (start, end, program)
    ops = []
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "?")
        ts, dur = ev.get("ts", 0), ev.get("dur", 0)
        if name.startswith("jit_") or name.startswith("pjit"):
            envelopes.append((ts, ts + dur, name))
        else:
            ops.append((ts, dur, name))
    per_prog = collections.defaultdict(lambda: (collections.Counter(),
                                                collections.Counter(), [0.0]))
    envelopes.sort()
    for ts, dur, name in ops:
        prog = None
        for s, e, p in envelopes:
            if s <= ts < e:
                prog = p
                break
        per_op, per_bucket, total = per_prog[prog or "?"]
        ms = dur / 1e3
        per_op[name] += ms
        per_bucket[bucket(name)] += ms
        total[0] += ms
    return path, {k: (po, pb, t[0]) for k, (po, pb, t) in per_prog.items()}


def show(tag, per_op, per_bucket, total, calls, top):
    print(f"\n=== {tag}: {total:.2f} ms / {calls} calls = "
          f"{total / calls:.3f} ms/call ===")
    for b, ms in per_bucket.most_common():
        print(f"  {ms / calls:7.3f}  {b}")
    print(f"  -- top {top} ops --")
    for name, ms in per_op.most_common(top):
        print(f"  {ms / calls:7.3f}  {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--calls", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--out", default="/tmp/prof_train")
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=20)
    args = ap.parse_args()

    if not args.parse_only:
        os.environ.setdefault("MCEDM_PALLAS", "1")
        import jax
        import jax.numpy as jnp

        import bench as bench_mod
        from m_cedm_tpu.models.layers import disable_conv_fusion

        B, RES = args.batch, bench_mod.RES
        task = bench_mod.make_task(args.dtype, pallas=True)
        state = task.init_state(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1)
        h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
        u = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 1)) * 0.1
        grid = jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None, None],
                                (B, RES, RES, 1))
        batch = (h, grid, jnp.transpose(grid, (0, 2, 1, 3)), u)

        # the exact loss composition of McedmTask.train_step, lifted so the
        # fwd-only and grad programs trace identical math
        import m_cedm_tpu.data.masks as mask_lib
        from m_cedm_tpu.ops import losses
        from m_cedm_tpu.ops.schedules import (edm_loss_weight,
                                              edm_train_sigma)
        from m_cedm_tpu.tasks.diffusion import P_MEAN, P_STD, SIGMA_DATA

        rng = jax.random.PRNGKey(2)
        h_un, t_grid, x_grid, u_un = batch
        b, t_dim, x_dim = h_un.shape[0], h_un.shape[1], h_un.shape[2]
        k_mask, k_cond, k_noise, k_sigma, _ = jax.random.split(rng, 5)
        sampler = mask_lib.TRAIN_MASK_SAMPLERS[task.train_mask_kind]
        mask = jax.vmap(lambda k: sampler(k, t_dim, x_dim, task.h_ch,
                                          task.u_ch))(
            jax.random.split(k_mask, b))
        x = task.transform.forward(state, h_un, u_un)
        cond_in = task.get_cond_in(x, mask, t_grid, x_grid, k_cond)
        noise = jax.random.normal(k_noise, x.shape)
        rnd_normal = jax.random.normal(k_sigma, (b, 1, 1, 1))
        sigma = edm_train_sigma(rnd_normal, P_MEAN, P_STD)
        weight = edm_loss_weight(sigma, SIGMA_DATA)
        x_noise = x + mask * noise * sigma

        def loss_fn(params):
            D_x = task.model_precond(params, x_noise, sigma, cond_in)
            return losses.noise_estimation_loss(D_x * mask, x * mask, weight)

        # the gating context is trace-time — it must wrap the traced body
        # (jit traces lazily at first call), exactly like train_step does
        def fwd_chain(params):
            # N distinct evaluations (scaled params) so XLA can't CSE;
            # the 1e-20*acc term is numerically nil but serializes the
            # calls (else all N forwards could be scheduled before any
            # backward, blowing activation memory)
            with disable_conv_fusion():
                acc = jnp.float32(0.0)
                for i in range(args.calls):
                    s_ = 1.0 + 1e-6 * (i + 1) + 1e-20 * acc
                    p = jax.tree_util.tree_map(
                        lambda q: q * s_.astype(q.dtype), params)
                    acc = acc + loss_fn(p)
                return acc

        def grad_chain(params):
            with disable_conv_fusion():
                acc = jnp.float32(0.0)
                for i in range(args.calls):
                    s_ = 1.0 + 1e-6 * (i + 1) + 1e-20 * acc
                    p = jax.tree_util.tree_map(
                        lambda q: q * s_.astype(q.dtype), params)
                    l, g = jax.value_and_grad(loss_fn)(p)
                    acc = acc + l + sum(
                        jnp.sum(t) for t in jax.tree_util.tree_leaves(g))
                return acc

        jf = jax.jit(fwd_chain)
        jg = jax.jit(grad_chain)
        js = task.train_step  # full production step (jitted method)

        print("compiling fwd chain...", flush=True)
        float(jf(state.params))
        print("compiling grad chain...", flush=True)
        float(jg(state.params))
        print("compiling full step...", flush=True)
        s2, m = js(state, batch, jax.random.PRNGKey(3))
        float(m["train_loss"])

        with jax.profiler.trace(args.out):
            float(jf(state.params))
            float(jg(state.params))
            s = state
            for i in range(args.calls):
                s, m = js(s, batch, jax.random.PRNGKey(4 + i))
            float(m["train_loss"])

    path, progs = parse_trace_by_program(args.out)
    print(f"trace: {path}")
    print("programs:", {k: round(t, 1) for k, (_, _, t) in progs.items()})
    totals = {}
    for prog, (po, pb, t) in sorted(progs.items(), key=lambda kv: -kv[1][2]):
        if "fwd_chain" in prog:
            tag, calls = "FWD (loss only)", args.calls
        elif "grad_chain" in prog:
            tag, calls = "FWD+BWD (value_and_grad)", args.calls
        elif "train_step" in prog:
            tag, calls = "FULL STEP (loss+opt+EMA)", args.calls
        else:
            continue
        totals[tag] = t / calls
        show(tag, po, pb, t, calls, args.top)
    if len(totals) == 3:
        f = totals["FWD (loss only)"]
        g = totals["FWD+BWD (value_and_grad)"]
        s = totals["FULL STEP (loss+opt+EMA)"]
        print("\n=== phase decomposition (ms/call, device) ===")
        print(f"  fwd  {f:7.3f}")
        print(f"  bwd  {g - f:7.3f}  (grad - fwd)")
        print(f"  opt  {s - g:7.3f}  (step - grad; optimizer+EMA+mask/noise)")
        print(f"  step {s:7.3f}")


if __name__ == "__main__":
    main()
