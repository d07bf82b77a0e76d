#!/usr/bin/env python
"""On-device check: flagship forward with MCEDM_PAIRIO=1 vs =0 (same
process, trace-time gate flip) — numerics must match to kernel rounding."""
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

    B, RES = 4, bench_mod.RES
    key = jax.random.PRNGKey(0)
    ok = True
    for dtype in ("float32", "bfloat16"):
        task = bench_mod.make_task(dtype, pallas=True)
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
        print(f"{status} pairio fwd {dtype}: max delta {d:.3e} "
              f"(scale {s:.2f}, rel {d / s:.2e})", flush=True)

        # train-step numerics: one step, loss must match closely
        batch = (x0[..., :1] + 1.5,
                 jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, :, None,
                                                          None],
                                  (B, RES, RES, 1)),
                 jnp.broadcast_to(jnp.linspace(0, 1, RES)[None, None, :,
                                                          None],
                                  (B, RES, RES, 1)),
                 x0[..., 1:] * 0.1)
        # train_step is jitted with static self: rebuild the task per
        # gate so each variant actually retraces
        os.environ["MCEDM_PAIRIO"] = "0"
        t0_ = bench_mod.make_task(dtype, pallas=True)
        t0_.set_pde_loss_function("swe_per", False)
        _, m0 = t0_.train_step(state, batch, jax.random.PRNGKey(2))
        l0 = float(m0["train_loss"])
        os.environ["MCEDM_PAIRIO"] = "1"
        t1_ = bench_mod.make_task(dtype, pallas=True)
        t1_.set_pde_loss_function("swe_per", False)
        _, m1 = t1_.train_step(state, batch, jax.random.PRNGKey(2))
        l1 = float(m1["train_loss"])
        os.environ.pop("MCEDM_PAIRIO")
        rel = abs(l1 - l0) / max(abs(l0), 1e-6)
        status = "OK " if rel < 1e-3 else "FAIL"
        ok &= rel < 1e-3
        print(f"{status} pairio train loss {dtype}: {l0:.4f} vs {l1:.4f} "
              f"(rel {rel:.2e})", flush=True)
    print("ALL OK" if ok else "FAILURES", flush=True)
    relayout_report()


def relayout_report():
    """Compile-time measure: total copy/reshape/transpose bytes in the
    optimized fwd HLO, MCEDM_PAIRIO on vs off."""
    import re

    import bench as bench_mod

    B, RES = 16, bench_mod.RES
    key = jax.random.PRNGKey(0)
    task = bench_mod.make_task("bfloat16", pallas=True)
    task.set_pde_loss_function("swe_per", False)
    state = task.init_state(jax.random.PRNGKey(0))
    params = task._sample_params(state)
    x0 = jax.random.normal(key, (B, RES, RES, 2))
    cond = jax.random.normal(jax.random.fold_in(key, 9), (B, RES, RES, 2))

    def relayout_mb():
        f = jax.jit(lambda x: task.model_precond(
            params, x, jnp.full((B,), 1.5), cond))
        txt = f.lower(x0).compile().as_text()
        tot = 0
        npall = 0
        for line in txt.splitlines():
            if "custom-call" in line:
                npall += 1
            m = re.search(r"= (\S+?)\[([\d,]*)\]\S* "
                          r"(copy|reshape|transpose)\(", line)
            if m:
                dt, dims, _ = m.groups()
                bp = {"bf16": 2, "f32": 4, "s32": 4}.get(dt, 4)
                cnt = 1
                for d in filter(None, dims.split(",")):
                    cnt *= int(d)
                tot += cnt * bp
        return tot / 1e6, npall

    os.environ["MCEDM_PAIRIO"] = "0"
    base, np0 = relayout_mb()
    os.environ["MCEDM_PAIRIO"] = "1"
    got, np1 = relayout_mb()
    os.environ.pop("MCEDM_PAIRIO")
    print(f"relayout traffic per fwd: {base:.0f} MB (pairio off, "
          f"{np0} custom-calls) -> {got:.0f} MB (pairio on, {np1})",
          flush=True)


if __name__ == "__main__":
    main()
