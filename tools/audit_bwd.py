#!/usr/bin/env python
"""Optimized-HLO byte audit of the flagship TRAIN step (VERDICT r4 #4).

Round 3 weighed the forward's relayout traffic in the optimized HLO
(copy/reshape/transpose weighted by bytes — 1460 -> 256 MB/call after
paired threading, commit 0d14675); the backward (14.3 of the 21 ms step)
never got the same treatment. This lowers the full train step, weighs
every copy/reshape/transpose/bitcast line by bytes, and prints the top
offenders with their shapes so they can be attacked the way the forward's
were.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/audit_bwd.py \
        [--dtype bfloat16] [--top 25] [--fwd]  # --fwd audits the fwd too
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_SHAPE_RE = re.compile(
    r"= (bf16|f32|s32|u32|s8|u8|f16|pred)\[([\d,]*)\]\S* "
    r"(copy|reshape|transpose|bitcast)\(")
_BYTES = {"bf16": 2, "f32": 4, "s32": 4, "u32": 4, "f16": 2, "s8": 1,
          "u8": 1, "pred": 1}


_META_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')


def weigh(txt, top=25):
    """(total_mb, per_kind_mb, top_lines) for relayout ops in optimized HLO.
    `bitcast` is counted separately (it is free — included for visibility,
    excluded from the total). Each top line carries the set of source
    locations (file:line from HLO metadata) that produced it."""
    per_kind = collections.Counter()
    lines = collections.Counter()
    srcs = collections.defaultdict(collections.Counter)
    for line in txt.splitlines():
        m = _SHAPE_RE.search(line)
        if not m:
            continue
        dt, dims, kind = m.groups()
        n = _BYTES[dt]
        for d in filter(None, dims.split(",")):
            n *= int(d)
        per_kind[kind] += n
        if kind != "bitcast":
            sig = f"{kind} {dt}[{dims}]"
            lines[sig] += n
            sm = _META_RE.search(line)
            om = _OPNAME_RE.search(line)
            loc = (f"{os.path.basename(sm.group(1))}:{sm.group(2)}"
                   if sm else "?")
            if om:
                # last two op-name segments carry the module path
                parts = om.group(1).split("/")
                loc += " " + "/".join(parts[-3:-1][:2])
            srcs[sig][loc] += n
    total = sum(v for k, v in per_kind.items() if k != "bitcast")
    top_lines = [(sig, n, srcs[sig].most_common(2))
                 for sig, n in lines.most_common(top)]
    return total / 1e6, {k: v / 1e6 for k, v in per_kind.items()}, top_lines


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--fwd", action="store_true",
                    help="also audit the forward alone (for subtraction)")
    args = ap.parse_args()

    os.environ.setdefault("MCEDM_PALLAS", "1")
    import jax
    import jax.numpy as jnp

    import bench as bench_mod

    B, RES = args.batch, bench_mod.RES
    task = bench_mod.make_task(args.dtype, pallas=True)
    task.set_pde_loss_function("swe_per", False)
    state = task.init_state(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
    u = jax.random.normal(jax.random.fold_in(key, 1),
                          (B, RES, RES, 1)) * 0.1
    grid = jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None, None],
                            (B, RES, RES, 1))
    batch = (h, grid, jnp.transpose(grid, (0, 2, 1, 3)), u)
    rng = jax.random.PRNGKey(2)

    raw = type(task).train_step
    raw = getattr(raw, "__wrapped__", raw)
    txt = jax.jit(lambda s, b, r: raw(task, s, b, r)).lower(
        state, batch, rng).compile().as_text()
    tot, kinds, top_lines = weigh(txt, args.top)
    print(f"train step relayout traffic: {tot:.0f} MB/step "
          f"({', '.join(f'{k} {v:.0f}' for k, v in kinds.items())})")
    print(f"\n== top {args.top} relayout shapes (MB/step) ==")
    for sig, n, locs in top_lines:
        where = "; ".join(f"{l} ({v/1e6:.0f})" for l, v in locs)
        print(f"  {n/1e6:8.1f}  {sig}  <- {where}")

    if args.fwd:
        params = task._sample_params(state)
        key = jax.random.PRNGKey(3)
        x0 = jax.random.normal(key, (B, RES, RES, 2))
        cond = jax.random.normal(jax.random.fold_in(key, 9),
                                 (B, RES, RES, 2))
        ftxt = jax.jit(lambda x: task.model_precond(
            params, x, jnp.full((B,), 1.5), cond)).lower(
            x0).compile().as_text()
        ftot, fkinds, ftop = weigh(ftxt, args.top)
        print(f"\nfwd-only relayout traffic: {ftot:.0f} MB/call "
              f"({', '.join(f'{k} {v:.0f}' for k, v in fkinds.items())})")
        print(f"== top fwd relayout shapes (MB/call) ==")
        for sig, n, locs in ftop:
            where = "; ".join(f"{l} ({v/1e6:.0f})" for l, v in locs)
            print(f"  {n/1e6:8.1f}  {sig}  <- {where}")


if __name__ == "__main__":
    main()
