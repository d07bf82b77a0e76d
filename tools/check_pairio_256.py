#!/usr/bin/env python
"""On-device: flagship net forward at res 256 (cross-resolution eval shape)
with paired threading on vs off — exercises the paired tile auto-shrink and
the attention size-gate at larger-than-flagship shapes."""
import os

os.environ["MCEDM_PALLAS"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/mcedm_jax_cache_cpu" if "cpu" in __import__("os").environ.get("JAX_PLATFORMS", "") else "/tmp/mcedm_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass


def main():
    import bench as bench_mod

    B, RES = 2, 256
    key = jax.random.PRNGKey(0)
    ok = True
    for dtype in ("bfloat16", "float32"):
        hp = bench_mod.flagship_hparams()
        hp["model"]["resolution"] = RES
        if dtype == "bfloat16":
            hp["model"]["dtype"] = "bfloat16"
        from m_cedm_tpu.tasks.diffusion import McedmTask

        task = McedmTask(hp)
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        params = task._sample_params(state)
        x0 = jax.random.normal(key, (B, RES, RES, 2))
        cond = jax.random.normal(jax.random.fold_in(key, 9),
                                 (B, RES, RES, 2))

        def fwd():
            f = jax.jit(lambda x: task.model_precond(
                params, x, jnp.full((B,), 1.5), cond))
            return np.asarray(f(x0).astype(jnp.float32))

        os.environ["MCEDM_PAIRIO"] = "0"
        base = fwd()
        os.environ["MCEDM_PAIRIO"] = "1"
        got = fwd()
        os.environ.pop("MCEDM_PAIRIO")
        d = np.abs(got - base).max()
        s = max(np.abs(base).max(), 1e-6)
        tol = 5e-2 if dtype == "bfloat16" else 5e-3
        status = "OK " if d <= tol * s else "FAIL"
        ok &= d <= tol * s
        print(f"{status} res-256 pairio fwd {dtype}: max delta {d:.3e} "
              f"(scale {s:.2f}, rel {d / s:.2e})", flush=True)
    print("ALL OK" if ok else "FAILURES", flush=True)


if __name__ == "__main__":
    main()
