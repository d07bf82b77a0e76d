#!/usr/bin/env python
"""Optimized-HLO byte audit for the non-flagship families (r5 follow-up).

tools/audit_bwd.py found every round-5 flagship win by weighing relayout
ops in the optimized HLO with source_file:line attribution. This applies
the same method to the FNO / OFormer / DDPM family programs, and extends
the op set with `convert` / standalone `slice` / `pad` / `concatenate` —
the OFormer train device profile (tools/profile_family.py --family
oformer --mode train) shows ~10 ms/step of materialized dtype converts
and ~14 ms of slice/pad, which the relayout-only audit is blind to.

Ops inside fusion computations move no HBM bytes on their own, so only
instructions in non-fusion computations (ENTRY, while bodies, ...) are
counted.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/audit_family.py \
        --family oformer --mode train [--top 30]
"""
import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_OP_RE = re.compile(
    r"=\s+(bf16|f32|f16|s32|u32|s8|u8|pred)\[([\d,]*)\]\S*\s+"
    r"(copy|reshape|transpose|bitcast|convert|slice|dynamic-slice|pad|"
    r"concatenate|dynamic-update-slice)\(")
_BYTES = {"bf16": 2, "f32": 4, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
          "u8": 1, "pred": 1}
_META_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')
_OPNAME_RE = re.compile(r'op_name="([^"]+)"')
_COMP_RE = re.compile(r"^(ENTRY\s+)?%?([\w.\-]+)\s+\([^)]*\)\s*->")


def weigh(txt, top=30):
    """(total_mb, per_kind_mb, top_lines) over materialized data-movement
    ops in the optimized HLO. Instructions inside fusion computations are
    skipped (a fusion's internal slice/convert moves no HBM bytes);
    `bitcast` is reported but excluded from the total (free)."""
    per_kind = collections.Counter()
    lines = collections.Counter()
    srcs = collections.defaultdict(collections.Counter)
    in_fusion_comp = False
    for line in txt.splitlines():
        cm = _COMP_RE.match(line)
        if cm:
            name = cm.group(2)
            in_fusion_comp = ("fused" in name or "fusion" in name)
            continue
        if in_fusion_comp:
            continue
        m = _OP_RE.search(line)
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
                parts = om.group(1).split("/")
                loc += " " + "/".join(parts[-3:-1][:2])
            srcs[sig][loc] += n
    total = sum(v for k, v in per_kind.items() if k != "bitcast")
    top_lines = [(sig, n, srcs[sig].most_common(2))
                 for sig, n in lines.most_common(top)]
    return total / 1e6, {k: v / 1e6 for k, v in per_kind.items()}, top_lines


def report(tag, txt, top):
    tot, kinds, top_lines = weigh(txt, top)
    print(f"{tag}: {tot:.0f} MB/call materialized data movement "
          f"({', '.join(f'{k} {v:.0f}' for k, v in sorted(kinds.items()))})")
    print(f"== top {top} shapes (MB/call) ==")
    for sig, n, locs in top_lines:
        where = "; ".join(f"{l} ({v/1e6:.0f})" for l, v in locs)
        print(f"  {n/1e6:8.1f}  {sig}  <- {where}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["fno", "oformer", "ddpm"],
                    required=True)
    ap.add_argument("--mode", choices=["train", "infer"], default="train")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            "/tmp/mcedm_jax_cache_cpu"
            if "cpu" in os.environ.get("JAX_PLATFORMS", "")
            else "/tmp/mcedm_jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import bench as bench_mod

    if args.family == "oformer":
        task, state, batch = bench_mod.make_oformer_setup()
    elif args.family == "fno":
        task, state, batch = bench_mod.make_fno_setup()
    else:
        task = bench_mod.make_ddim_task("bfloat16")
        state = task.init_state(jax.random.PRNGKey(0))
        B, RES = 16, bench_mod.RES
        key = jax.random.PRNGKey(1)
        h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
        u = jax.random.normal(jax.random.fold_in(key, 1),
                              (B, RES, RES, 1)) * 0.1
        batch = task.transform.forward(state, h, u)

    rng = jax.random.PRNGKey(2)
    if args.mode == "train":
        if args.family == "oformer":
            # the task's train_step picks curriculum steps on the host;
            # audit the full-horizon program (what bench measures)
            c = int(batch[1].shape[1])
            import functools
            txt = jax.jit(functools.partial(
                task._train_impl, c_steps=c)).lower(
                state, batch, rng).compile().as_text()
        else:
            raw = type(task).train_step
            raw = getattr(raw, "__wrapped__", raw)
            txt = jax.jit(lambda s, b, r: raw(task, s, b, r)).lower(
                state, batch, rng).compile().as_text()
    else:
        if args.family == "oformer":
            xtok, y, nt, pos, n_time = batch
            txt = jax.jit(lambda s: jnp.sum(task.model.apply(
                s.params, xtok, nt, nt, pos, pos, 1)).astype(
                jnp.float32)).lower(state).compile().as_text()
        else:
            raise SystemExit("--mode infer only wired for oformer")
    report(f"{args.family} {args.mode}", txt, args.top)


if __name__ == "__main__":
    main()
