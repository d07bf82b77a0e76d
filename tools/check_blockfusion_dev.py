#!/usr/bin/env python
"""On-device bound for the chained-stats bf16 divergence (ADVICE r2 /
VERDICT r3 #8).

The fused block tails emit next-norm statistics from the kernel's fp32
accumulators while the unfused path recomputes them from the rounded-bf16
consumer input (pallas/fused_norm_conv.py emit-stats path). Interpret-mode
tests bound the divergence on CPU; this script records the ON-DEVICE bound:
one 50-step Heun sampler run with MCEDM_BLOCK_FUSION=1 (chained stats)
vs =res (per-block stats recomputed), same params/cond/key, max|delta| of
the sampled fields. Run on the TPU; result goes in VALIDATION.md.

MCEDM_PAIRIO is forced OFF for both variants: under the paired-IO
threading the stats chain is structural (adm_unet.py `run(...,
in_stats=stats)` is unconditional — the paired layout has no standalone
recompute path to fall back to), so "1" vs "res" traces the identical
program there and the delta is trivially zero. The block-fusion path
(pairio off) is where the gate actually flips the mechanism, and it is
the same emit-stats code the paired kernels use.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python tools/check_blockfusion_dev.py
"""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass

os.environ.setdefault("MCEDM_PALLAS", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench as bench_mod  # noqa: E402


def run_variant(block_fusion: str, dtype: str):
    os.environ["MCEDM_BLOCK_FUSION"] = block_fusion
    os.environ["MCEDM_PAIRIO"] = "0"  # see module docstring
    B, RES = 16, bench_mod.RES
    key = jax.random.PRNGKey(0)
    task = bench_mod.make_task(dtype, pallas=True)
    task.set_pde_loss_function("swe_per", False)
    state = task.init_state(jax.random.PRNGKey(0))
    h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
    u = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 1)) * 0.1
    grid = jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None, None],
                            (B, RES, RES, 1))
    mask = jnp.concatenate([jnp.zeros((B, RES, RES, 1)),
                            jnp.ones((B, RES, RES, 1))], axis=-1)
    gt = task.transform.forward(state, h, u)
    cond = task.get_cond_in(gt, mask, grid,
                            jnp.transpose(grid, (0, 2, 1, 3)),
                            jax.random.PRNGKey(4))
    fn = jax.jit(lambda s, c, m, k: task.sample_edm(s, c, m, k))
    out = np.asarray(fn(state, cond, mask, jax.random.PRNGKey(5)))
    return out


def main():
    for dtype in ("bfloat16", None):
        a = run_variant("1", dtype)
        b = run_variant("res", dtype)
        scale = np.abs(b).mean()
        d = np.abs(a - b)
        tag = dtype or "float32"
        print(f"[{tag}] chained-stats vs per-block stats, 50-step Heun "
              f"sampler output (normalized units):")
        print(f"  max|delta| = {d.max():.3e}   mean|delta| = {d.mean():.3e}  "
              f" field mean|x| = {scale:.3e}   rel max = {d.max() / scale:.3e}",
              flush=True)


if __name__ == "__main__":
    main()
