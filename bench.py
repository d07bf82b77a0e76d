#!/usr/bin/env python
"""Benchmark the flagship workload; prints ONE JSON line.

Measures, on the available accelerator:
  1. mcedm train-step latency (fwd+bwd+optimizer+EMA) at the reference
     workload shape: ADM U-Net ch=64, ch_mult [1,1,1], res 128, attn@32,
     batch 16 (BASELINE.md "reference workload shape")
  2. Heun EDM sampling throughput: 50 steps x 2 model calls, batch 16

Headline metric: Heun sampling throughput (samples/sec). `vs_baseline` is
the ratio against the recorded round-1 value in bench_baseline.json (the
reference repo publishes no numbers — BASELINE.md; the stored baseline is
this framework's own first measurement, so the series tracks optimization
progress across rounds).
"""
import json
import os
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

BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")
B = 16
RES = 128


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
        "sampler": {"name": "edm", "type": "edm", "timesteps": 50,
                    "sigma_min": 0.002, "sigma_max": 80, "rho": 7,
                    "S_churn": 15.0, "S_min": 0, "S_max": "inf", "S_noise": 1,
                    "n_samples": 1, "n_repeat": 2, "n_time_h": RES,
                    "n_time_u": 0, "return_last": True, "select_by_pde": False,
                    "use_gt_pde_select": True, "guide_dx": False, "w": 0.0,
                    "plot_scaled": False},
    })


def measure(task, state, batch, roundtrip_s):
    """(train_step_ms, samples_per_sec) for one task configuration."""
    h, grid_t, grid_x, u = batch
    state, m = task.train_step(state, batch, jax.random.PRNGKey(2))
    float(m["train_loss"])
    n_iter = 10
    t0 = time.perf_counter()
    for i in range(n_iter):
        state, metrics = task.train_step(state, batch, jax.random.PRNGKey(3 + i))
        float(metrics["train_loss"])
    train_step_ms = max(
        ((time.perf_counter() - t0) / n_iter - roundtrip_s) * 1000, 1e-3)

    mask = jnp.concatenate([jnp.zeros((B, RES, RES, 1)),
                            jnp.ones((B, RES, RES, 1))], axis=-1)
    gt = task.transform.forward(state, h, u)
    cond = task.get_cond_in(gt, mask, grid_t, grid_x, jax.random.PRNGKey(4))
    sample_fn = jax.jit(
        lambda s, c, m_, k: jnp.sum(task.sample_edm(s, c, m_, k)))
    float(sample_fn(state, cond, mask, jax.random.PRNGKey(5)))
    n_rep = 3
    t0 = time.perf_counter()
    for i in range(n_rep):
        float(sample_fn(state, cond, mask, jax.random.PRNGKey(6 + i)))
    sample_time = (time.perf_counter() - t0) / n_rep - roundtrip_s
    return train_step_ms, B / sample_time


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
    except Exception as e:  # pragma: no cover - device-specific
        os.environ["MCEDM_PALLAS"] = "0"
        import sys

        print(f"# pallas kernel disabled on this backend: {type(e).__name__}",
              file=sys.stderr, flush=True)


def main():
    _probe_pallas()
    task = McedmTask(flagship_hparams())
    task.set_pde_loss_function("swe_per", False)
    state = task.init_state(jax.random.PRNGKey(0))

    key = jax.random.PRNGKey(1)
    h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
    u = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 1)) * 0.1
    grid = jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None, None],
                            (B, RES, RES, 1))
    batch = (h, grid, jnp.transpose(grid, (0, 2, 1, 3)), u)

    # Timing protocol: every iteration materializes a scalar on host —
    # `block_until_ready` is unreliable on tunneled/remote backends, and
    # unconsumed dispatches can be skipped. The measured host round-trip
    # overhead is subtracted.
    tiny = jax.jit(lambda k: jnp.sum(jax.random.normal(k, (8,))))
    float(tiny(jax.random.PRNGKey(0)))
    t0 = time.perf_counter()
    for i in range(20):
        float(tiny(jax.random.PRNGKey(i)))
    roundtrip_s = (time.perf_counter() - t0) / 20

    batch = (h, grid, jnp.transpose(grid, (0, 2, 1, 3)), u)
    train_step_ms, samples_per_sec = measure(task, state, batch, roundtrip_s)

    # bfloat16 production mode (fp32 master params; see tasks/diffusion.py)
    hp16 = flagship_hparams()
    hp16["model"]["dtype"] = "bfloat16"
    task16 = McedmTask(hp16)
    task16.set_pde_loss_function("swe_per", False)
    train_step_ms_bf16, samples_per_sec_bf16 = measure(task16, state, batch,
                                                       roundtrip_s)

    baseline = None
    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            baseline = json.load(f)
    if baseline is None:
        baseline = {"heun_samples_per_sec": samples_per_sec,
                    "train_step_ms": train_step_ms}
        try:
            with open(BASELINE_FILE, "w") as f:
                json.dump(baseline, f, indent=2)
        except OSError:
            pass

    # headline = the production configuration (bf16 compute); baseline = the
    # recorded round-1 fp32 unoptimized numbers, so vs_baseline tracks the
    # cumulative optimization gain. Note: the tunneled device shows ~±30%
    # run-to-run variance; fp32 numbers are reported alongside for context.
    vs = samples_per_sec_bf16 / baseline["heun_samples_per_sec"]
    print(json.dumps({
        "metric": "heun_edm_sampling_throughput",
        "value": round(samples_per_sec_bf16, 3),
        "unit": "samples/sec",
        "vs_baseline": round(vs, 3),
        "precision": "bfloat16 compute, fp32 master/softmax/norm-stats",
        "fp32_samples_per_sec": round(samples_per_sec, 3),
        "fp32_train_step_ms": round(train_step_ms, 3),
        "bf16_train_step_ms": round(train_step_ms_bf16, 3),
        "baseline_fp32_samples_per_sec": baseline.get("heun_samples_per_sec"),
        "baseline_fp32_train_step_ms": baseline.get("train_step_ms"),
        "batch": B, "resolution": RES, "heun_steps": 50,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
