#!/usr/bin/env python
"""Compile (without executing) the flagship forward / train step on the
current backend and print XLA's cost analysis: FLOPs, bytes accessed, and the
implied roofline times on TPU v5e (197 bf16 TFLOP/s, 819 GB/s HBM). This is
the ground truth for "how far from speed-of-light are we" — wall timings on
the tunneled backend carry a ~30 ms host round-trip, but cost analysis comes
straight from the compiled executable."""
import argparse

import jax
import jax.numpy as jnp

PEAK_BF16_TFLOPS = 197e12
PEAK_HBM_GBS = 819e9


def report(name, compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    bytes_acc = ca.get("bytes accessed", 0.0)
    t_flops = flops / PEAK_BF16_TFLOPS * 1e3
    t_bw = bytes_acc / PEAK_HBM_GBS * 1e3
    print(f"{name}:")
    print(f"  flops          {flops / 1e9:10.2f} GFLOP  -> {t_flops:7.3f} ms at peak MXU")
    print(f"  bytes accessed {bytes_acc / 1e9:10.2f} GB     -> {t_bw:7.3f} ms at peak HBM BW")
    print(f"  roofline bound: {'bandwidth' if t_bw > t_flops else 'compute'} "
          f"(intensity {flops / max(bytes_acc, 1):.1f} flop/byte)")
    return flops, bytes_acc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--pallas", default="1")
    ap.add_argument("--what", default="fwd,train",
                    help="comma list: fwd, train, sample")
    args = ap.parse_args()

    import os

    os.environ["MCEDM_PALLAS"] = args.pallas
    import bench as bench_mod

    B, RES = args.batch, args.res
    key = jax.random.PRNGKey(0)
    task = bench_mod.make_task("bfloat16")
    task.set_pde_loss_function("swe_per", False)
    state = task.init_state(jax.random.PRNGKey(0))
    params = task._sample_params(state)
    x = jax.random.normal(key, (B, RES, RES, 2))
    cond = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 2))
    what = args.what.split(",")

    if "fwd" in what:
        fwd = jax.jit(lambda p, x, c: task.model_precond(p, x, jnp.full((B,), 1.5), c))
        report("forward (model_precond)", fwd.lower(params, x, cond).compile())

    if "train" in what:
        h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
        u = jax.random.normal(jax.random.fold_in(key, 2), (B, RES, RES, 1)) * 0.1
        grid = jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None, None],
                                (B, RES, RES, 1))
        batch = (h, grid, jnp.transpose(grid, (0, 2, 1, 3)), u)
        step = jax.jit(task.train_step)
        report("train step", step.lower(state, batch, jax.random.PRNGKey(3)).compile())

    if "sample" in what:
        from m_cedm_tpu.samplers import edm as edm_samplers

        mask = jnp.concatenate([jnp.zeros((B, RES, RES, 1)),
                                jnp.ones((B, RES, RES, 1))], -1)
        sch = edm_samplers.make_edm_schedule(50, 0.002, 80.0, 7.0, S_churn=15.0)

        def dn(xx, t, k):
            return task.model_precond(params, xx, t, cond)

        fn = jax.jit(lambda k: edm_samplers.heun_sample_masked(dn, k, x, mask, sch))
        report("50-step Heun sampling (B=%d)" % B,
               fn.lower(jax.random.PRNGKey(4)).compile())


if __name__ == "__main__":
    main()
