#!/usr/bin/env python
"""Benchmark the flagship workload; prints ONE JSON line.

Measures, on the available accelerator:
  1. mcedm train-step latency (fwd+bwd+optimizer+EMA) at the reference
     workload shape: ADM U-Net ch=64, ch_mult [1,1,1], res 128, attn@32,
     batch 16 (BASELINE.md "reference workload shape")
  2. Heun EDM sampling throughput: 50 steps x 2 model calls, batch 16

Protocol (VERDICT r1 #3): per-iteration timings, median of >=5 reps with
min/max spread reported; every iteration materializes a scalar on host
(`block_until_ready` is unreliable on tunneled backends) and the measured
host round-trip is subtracted. The persisted baseline (bench_baseline.json)
is never rewritten once recorded.

Anchors:
  * vs_baseline   — against the recorded round-1 fp32 numbers (tracks the
    cumulative optimization gain of this framework across rounds).
  * vs_reference  — against the measured torch reference (PlMcedm driven
    directly; tools/bench_reference.py writes bench_reference.json). The
    reference could only be measured on the image's 1-thread CPU (no GPU,
    no pytorch_lightning), so this ratio spans hardware classes; it is
    reported with the reference device string for honesty.

Roofline: XLA cost analysis supplies flops + bytes accessed per step, from
which MFU (vs 197 TFLOP/s bf16 peak on v5e) and achieved HBM bandwidth
(vs ~819 GB/s) are derived. This workload (ch=64 at res 128) has arithmetic
intensity ~40 flops/byte — below the v5e ridge — so it is HBM-bandwidth
bound and bandwidth utilization is the number that says how close to the
hardware limit the implementation runs.
"""
import json
import os
import statistics
import time

import jax
import jax.numpy as jnp
import numpy as np

# persistent compilation cache: repeat bench invocations (and the driver's
# round-end run) skip the ~60-90 s sampler compiles when supported
try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcedm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

from m_cedm_tpu.config import to_dotdict
from m_cedm_tpu.tasks import McedmTask

_HERE = os.path.dirname(os.path.abspath(__file__))
BASELINE_FILE = os.path.join(_HERE, "bench_baseline.json")
REFERENCE_FILE = os.path.join(_HERE, "bench_reference.json")
B = 16
RES = 128
HEUN_STEPS = 50

# TPU v5e (v5 lite) single-chip peak numbers for roofline ratios
PEAK_BF16_FLOPS = 197e12
PEAK_HBM_BW = 819e9


def flagship_hparams():
    return to_dotdict({
        "name": "adm_edm_mcedm",
        "model": {
            "in_channels": 2, "cond_channels": 2, "cat_cond": True, "out_ch": 2,
            "ch": 64, "ch_mult": [1, 1, 1], "num_res_blocks": 1,
            "attn_resolutions": [32], "dropout": 0.0, "label_dim": 0,
            "augment_dim": 0, "label_dropout": 0, "ema_rate": 0.999,
            "ema": True, "resamp_with_conv": True, "resolution": RES,
            "self_cond": False, "cond_p": 1.0, "dx_cond": False,
            "cat_dx": False, "add_cond_mask": False, "add_xt": False,
        },
        "data": {"normalization": "gauss", "uniform_dequantization": False,
                 "gaussian_dequantization": False, "rescaled": False},
        "optimization": {"optimizer": "Adam", "lr": 2e-4, "weight_decay": 0.0,
                         "beta1": 0.9, "amsgrad": False, "eps": 1e-8,
                         "grad_clip": 1.0, "loss": "l2"},
        "sampler": {"name": "edm", "type": "edm", "timesteps": HEUN_STEPS,
                    "sigma_min": 0.002, "sigma_max": 80, "rho": 7,
                    "S_churn": 15.0, "S_min": 0, "S_max": "inf", "S_noise": 1,
                    "n_samples": 1, "n_repeat": 2, "n_time_h": RES,
                    "n_time_u": 0, "return_last": True, "select_by_pde": False,
                    "use_gt_pde_select": True, "guide_dx": False, "w": 0.0,
                    "plot_scaled": False},
    })


def _stats(xs):
    return (statistics.median(xs), min(xs), max(xs))


def measure(task, state, batch, roundtrip_s, n_train=5, n_sample=5):
    """Per-iteration medians: (train_ms (med, lo, hi), sps (med, lo, hi))."""
    h, grid_t, grid_x, u = batch
    state, m = task.train_step(state, batch, jax.random.PRNGKey(2))
    float(m["train_loss"])  # warmup/compile
    train_ts = []
    for i in range(n_train):
        t0 = time.perf_counter()
        state, metrics = task.train_step(state, batch, jax.random.PRNGKey(3 + i))
        float(metrics["train_loss"])
        train_ts.append(max((time.perf_counter() - t0 - roundtrip_s) * 1e3, 1e-3))

    mask = jnp.concatenate([jnp.zeros((B, RES, RES, 1)),
                            jnp.ones((B, RES, RES, 1))], axis=-1)
    gt = task.transform.forward(state, h, u)
    cond = task.get_cond_in(gt, mask, grid_t, grid_x, jax.random.PRNGKey(4))
    sample_fn = jax.jit(
        lambda s, c, m_, k: jnp.sum(task.sample_edm(s, c, m_, k)))
    float(sample_fn(state, cond, mask, jax.random.PRNGKey(5)))  # warmup
    sps = []
    for i in range(n_sample):
        t0 = time.perf_counter()
        float(sample_fn(state, cond, mask, jax.random.PRNGKey(6 + i)))
        sps.append(B / max(time.perf_counter() - t0 - roundtrip_s, 1e-6))
    return _stats(train_ts), _stats(sps)


def _ca(lowered):
    ca = lowered.compile().cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca


def cost_analysis(task, task_off, state, batch):
    """(train_flops, train_bytes, fwd_flops, fwd_bytes) via XLA.

    `bytes accessed` comes from the production (kernel-bearing) graph of
    `task`; `flops` from `task_off` (kernels disabled, identical math) —
    XLA's cost analysis cannot see inside Pallas custom calls, so the
    production graph under-reports flops. None on backends without cost
    analysis.
    """
    from m_cedm_tpu.models.layers import disable_conv_fusion

    task_off = task_off or task
    rng = jax.random.PRNGKey(2)
    x = jnp.ones((B, RES, RES, 2))
    sig = jnp.full((B,), 1.5)
    cond = jnp.zeros((B, RES, RES, 2))

    def fwd_of(t):
        return jax.jit(lambda p, x, s, c: t.model_precond(p, x, s, c))

    try:
        tb = float(_ca(type(task).train_step.lower(task, state, batch, rng)
                       ).get("bytes accessed", 0))
        fb = float(_ca(fwd_of(task).lower(state.params, x, sig, cond)
                       ).get("bytes accessed", 0))
    except Exception:
        tb = fb = None
    prev_flag = os.environ.get("MCEDM_PALLAS")
    os.environ["MCEDM_PALLAS"] = "0"  # pure-XLA traces: full flop counts
    try:
        with disable_conv_fusion():
            tf = float(_ca(type(task_off).train_step.lower(
                task_off, state, batch, rng)).get("flops", 0))
            ff = float(_ca(fwd_of(task_off).lower(state.params, x, sig, cond)
                           ).get("flops", 0))
    except Exception:
        tf = ff = None
    finally:
        if prev_flag is None:
            os.environ.pop("MCEDM_PALLAS", None)
        else:
            os.environ["MCEDM_PALLAS"] = prev_flag
    return tf, tb, ff, fb


def _probe_pallas():
    """Try the fused kernel once on the real device; disable it (jnp
    fallback, identical math) if this backend's Mosaic rejects it."""
    from m_cedm_tpu.pallas.fused_norm import fused_group_norm_silu, pallas_enabled

    if not pallas_enabled():
        return
    try:
        x = jnp.ones((2, 64, 64))
        g = jnp.ones((2, 64))
        b = jnp.zeros((2, 64))
        float(jnp.sum(fused_group_norm_silu(x, g, b, 16)))
        from m_cedm_tpu.pallas.fused_attention import fused_attention

        float(jnp.sum(fused_attention(x, x, x)))
        from m_cedm_tpu.pallas.fused_norm_conv import fused_gn_silu_conv

        # probe at a flagship-like multi-tile shape: Mosaic failures on this
        # backend are shape-dependent, so the probe must exercise the real
        # H/W/C (halo BlockSpecs, (9C, O) weight block), not a toy 8x8
        x4 = jnp.ones((1, RES, RES, 64))
        g4 = jnp.ones((1, 64))
        b4 = jnp.zeros((1, 64))
        w4 = jnp.ones((3, 3, 64, 64)) * 0.01
        float(jnp.sum(fused_gn_silu_conv(x4, g4, b4, w4, None, 16)))
    except Exception as e:  # pragma: no cover - device-specific
        import sys

        # the big-row-tile default may be the culprit (VMEM/compile-helper
        # limits are device-specific): retry at the conservative R=16
        # before disabling the kernels wholesale
        if os.environ.get("MCEDM_TILE_R") != "16":
            print(f"# pallas probe failed ({type(e).__name__}); retrying "
                  f"with MCEDM_TILE_R=16", file=sys.stderr, flush=True)
            os.environ["MCEDM_TILE_R"] = "16"
            return _probe_pallas()
        os.environ["MCEDM_PALLAS"] = "0"
        print(f"# pallas kernel disabled on this backend: {type(e).__name__}",
              file=sys.stderr, flush=True)


def make_task(dtype=None, pallas=None):
    if pallas is not None:
        os.environ["MCEDM_PALLAS"] = "1" if pallas else "0"
    hp = flagship_hparams()
    if dtype == "bfloat16":
        hp["model"]["dtype"] = "bfloat16"
    task = McedmTask(hp)
    task.set_pde_loss_function("swe_per", False)
    return task


def main():
    _probe_pallas()
    pallas_ok = os.environ.get("MCEDM_PALLAS", "auto") != "0"

    key = jax.random.PRNGKey(1)
    h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
    u = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 1)) * 0.1
    grid = jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None, None],
                            (B, RES, RES, 1))
    batch = (h, grid, jnp.transpose(grid, (0, 2, 1, 3)), u)

    # host round-trip overhead (scalar materialization per timed iteration)
    tiny = jax.jit(lambda k: jnp.sum(jax.random.normal(k, (8,))))
    float(tiny(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    for i in range(20):
        float(tiny(jax.random.PRNGKey(i)))
    roundtrip_s = (time.perf_counter() - t0) / 20

    state = make_task().init_state(jax.random.PRNGKey(0))

    # fp32 (kernels as probed), bf16 production (kernels on), bf16 kernels off
    task32 = make_task()
    (t32, t32_lo, t32_hi), (s32, s32_lo, s32_hi) = measure(
        task32, state, batch, roundtrip_s)
    task16 = make_task("bfloat16")
    (t16, t16_lo, t16_hi), (s16, s16_lo, s16_hi) = measure(
        task16, state, batch, roundtrip_s)
    if pallas_ok:
        task16_off = make_task("bfloat16", pallas=False)
        (t16o, _, _), (s16o, _, _) = measure(task16_off, state, batch,
                                             roundtrip_s, n_train=5, n_sample=3)
        os.environ["MCEDM_PALLAS"] = "1"
    else:
        task16_off = None
        t16o = s16o = None

    tf, tb, ff, fb = cost_analysis(task16, task16_off, state, batch)

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
    if baseline is None:
        baseline = {"heun_samples_per_sec": s32, "train_step_ms": t32}
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump(baseline, f, indent=2)
        except OSError:
            pass

    reference = {}
    if os.path.exists(REFERENCE_FILE):
        with open(REFERENCE_FILE) as f:
            reference = json.load(f)

    out = {
        "metric": "heun_edm_sampling_throughput",
        "value": round(s16, 3),
        "unit": "samples/sec",
        "vs_baseline": round(s16 / baseline["heun_samples_per_sec"], 3),
        "precision": "bfloat16 compute, fp32 master/softmax/norm-stats",
        # spread-reported medians (n=5 each)
        "bf16_samples_per_sec": round(s16, 3),
        "bf16_samples_per_sec_min": round(s16_lo, 3),
        "bf16_samples_per_sec_max": round(s16_hi, 3),
        "bf16_train_step_ms": round(t16, 3),
        "bf16_train_step_ms_min": round(t16_lo, 3),
        "bf16_train_step_ms_max": round(t16_hi, 3),
        "fp32_samples_per_sec": round(s32, 3),
        "fp32_samples_per_sec_min": round(s32_lo, 3),
        "fp32_samples_per_sec_max": round(s32_hi, 3),
        "fp32_train_step_ms": round(t32, 3),
        "fp32_train_step_ms_min": round(t32_lo, 3),
        "fp32_train_step_ms_max": round(t32_hi, 3),
        "bf16_vs_fp32_train_ratio": round(t16 / t32, 3),
        "baseline_fp32_samples_per_sec": baseline.get("heun_samples_per_sec"),
        "baseline_fp32_train_step_ms": baseline.get("train_step_ms"),
        "batch": B, "resolution": RES, "heun_steps": HEUN_STEPS,
        "device": str(jax.devices()[0]),
    }
    # Pallas kernel contribution (same bf16 config, kernels off)
    if t16o is not None:
        out["pallas_off_bf16_train_step_ms"] = round(t16o, 3)
        out["pallas_off_bf16_samples_per_sec"] = round(s16o, 3)
        out["pallas_train_speedup"] = round(t16o / t16, 3)
        out["pallas_sampling_speedup"] = round(s16 / s16o, 3)
    # roofline: MFU + achieved HBM bandwidth
    if tf:
        out["train_step_flops"] = tf
        out["train_step_bytes"] = tb
        out["mfu_train"] = round(tf / (t16 * 1e-3) / PEAK_BF16_FLOPS, 4)
        out["train_hbm_bw_util"] = round(tb / (t16 * 1e-3) / PEAK_HBM_BW, 4)
    if ff:
        out["fwd_flops"] = ff
        out["fwd_bytes"] = fb
        fwd_s = B / s16 / (2 * HEUN_STEPS - 1)  # net calls per Heun run
        out["mfu_sampling"] = round(ff / fwd_s / PEAK_BF16_FLOPS, 4)
        out["sampling_hbm_bw_util"] = round(fb / fwd_s / PEAK_HBM_BW, 4)
        out["bound_by"] = ("hbm_bandwidth"
                           if ff / max(fb, 1.0) < PEAK_BF16_FLOPS / PEAK_HBM_BW
                           else "mxu_flops")
    # measured torch-reference anchor
    if reference:
        out["ref_train_step_ms"] = round(reference["ref_train_step_ms"], 1)
        out["ref_samples_per_sec"] = round(reference["ref_samples_per_sec"], 4)
        out["ref_device"] = reference["ref_device"]
        out["vs_reference_sampling"] = round(
            s16 / reference["ref_samples_per_sec"], 1)
        out["vs_reference_train"] = round(
            reference["ref_train_step_ms"] / t16, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
