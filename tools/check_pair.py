#!/usr/bin/env python
"""On-device numerics check: paired-lane kernels (MCEDM_PAIR=1) vs the
identical-math XLA reference, across every res_mode the paired path serves."""
import os

os.environ["MCEDM_PALLAS"] = "1"
os.environ["MCEDM_PAIR"] = "1"

import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.pallas.fused_norm_conv import (
    _block_reference, fused_gn_silu_conv, fused_gn_silu_conv_block,
    gn_silu_conv_reference)


def check(name, got, want, tol):
    got = np.asarray(jax.tree_util.tree_map(
        lambda t: t.astype(jnp.float32), got))
    want = np.asarray(jax.tree_util.tree_map(
        lambda t: t.astype(jnp.float32), want))
    d = np.abs(got - want).max()
    s = max(np.abs(want).max(), 1e-6)
    status = "OK " if d <= tol * s else "FAIL"
    print(f"{status} {name}: max delta {d:.3e} (scale {s:.2f}, rel {d/s:.2e})",
          flush=True)
    return d <= tol * s


def main():
    key = jax.random.PRNGKey(0)
    B, H, W, C, O = 2, 128, 128, 64, 64
    ok = True
    for dt, tol in ((jnp.float32, 2e-3), (jnp.bfloat16, 5e-2)):
        x = jax.random.normal(key, (B, H, W, C), dt)
        gamma = jax.random.normal(jax.random.fold_in(key, 1), (B, C))
        beta = jax.random.normal(jax.random.fold_in(key, 2), (B, C))
        w = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, C, O),
                              dt) * 0.05
        bias = jax.random.normal(jax.random.fold_in(key, 4), (O,))
        res = jax.random.normal(jax.random.fold_in(key, 5), (B, H, W, O), dt)
        res_half = jax.random.normal(jax.random.fold_in(key, 6),
                                     (B, H // 2, W // 2, O), dt)
        cr = 32
        res_proj = jax.random.normal(jax.random.fold_in(key, 7),
                                     (B, H, W, cr), dt)
        skw = jax.random.normal(jax.random.fold_in(key, 8), (cr, O)) * 0.1
        skb = jax.random.normal(jax.random.fold_in(key, 9), (O,))
        nm = dt.__name__

        ok &= check(f"plain {nm}",
                    fused_gn_silu_conv(x, gamma, beta, w, bias, 16),
                    gn_silu_conv_reference(x, gamma, beta, w, bias, 16), tol)
        ok &= check(f"identity {nm}",
                    fused_gn_silu_conv_block(x, gamma, beta, w, bias, 16,
                                             residual=res),
                    _block_reference(x, gamma, beta, w, bias, None, res,
                                     None, None, None, 16, 1e-5, "identity",
                                     False, True, False, False), tol)
        ok &= check(f"proj {nm}",
                    fused_gn_silu_conv_block(x, gamma, beta, w, bias, 16,
                                             residual=res_proj, skip_w=skw,
                                             skip_b=skb),
                    _block_reference(x, gamma, beta, w, bias, None, res_proj,
                                     None, skw, skb, 16, 1e-5, "proj",
                                     False, True, True, False), tol)
        ok &= check(f"identity_up {nm}",
                    fused_gn_silu_conv_block(x, gamma, beta, w, bias, 16,
                                             residual=res_half, res_up=True),
                    _block_reference(x, gamma, beta, w, bias, None, res_half,
                                     None, None, None, 16, 1e-5,
                                     "identity_up", False, True, False,
                                     False), tol)
        # emit_stats + chaining into a consumer
        got3 = fused_gn_silu_conv_block(x, gamma, beta, w, bias, 16,
                                        residual=res, emit_stats=True)
        want3 = _block_reference(x, gamma, beta, w, bias, None, res, None,
                                 None, None, 16, 1e-5, "identity", True,
                                 True, False, False)
        ok &= check(f"emit out {nm}", got3[0], want3[0], tol)
        ok &= check(f"emit sums {nm}", got3[1], want3[1], tol)
        ok &= check(f"emit sumsq {nm}", got3[2], want3[2], tol)
        chained = fused_gn_silu_conv_block(got3[0], gamma, beta, w, bias, 16,
                                           stats=(got3[1], got3[2]))
        # two stacked kernel layers vs two stacked reference layers — the
        # per-layer rounding compounds, so allow 2x the single-layer tol
        ok &= check(f"chained {nm}", chained,
                    gn_silu_conv_reference(want3[0], gamma, beta, w, bias,
                                           16), 2 * tol)
        # wide output (up/down convs): O=128
        w_wide = jax.random.normal(jax.random.fold_in(key, 10),
                                   (3, 3, C, 128), dt) * 0.05
        bias_wide = jax.random.normal(jax.random.fold_in(key, 11), (128,))
        ok &= check(f"wide-O {nm}",
                    fused_gn_silu_conv(x, gamma, beta, w_wide, bias_wide, 16),
                    gn_silu_conv_reference(x, gamma, beta, w_wide, bias_wide,
                                           16), tol)

        # paired backward (phase A + folds) vs XLA autodiff of the reference
        gtol = 4 * tol

        def loss_k(x, gamma, beta, w, bias):
            y = fused_gn_silu_conv(x, gamma, beta, w, bias, 16)
            return jnp.sum(y.astype(jnp.float32) * cot)

        def loss_r(x, gamma, beta, w, bias):
            y = gn_silu_conv_reference(x, gamma, beta, w, bias, 16)
            return jnp.sum(y.astype(jnp.float32) * cot)

        cot = jax.random.normal(jax.random.fold_in(key, 20), (B, H, W, O))
        gk = jax.grad(loss_k, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w,
                                                       bias)
        gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w,
                                                       bias)
        for nm2, a, bb in zip(("dx", "dgamma", "dbeta", "dw", "dbias"), gk,
                              gr):
            ok &= check(f"grad {nm2} {nm}", a, bb, gtol)

        def loss_kb(x, gamma, beta, w, bias, res, skw, skb):
            y = fused_gn_silu_conv_block(x, gamma, beta, w, bias, 16,
                                         residual=res, skip_w=skw,
                                         skip_b=skb)
            return jnp.sum(y.astype(jnp.float32) * cot)

        def loss_rb(x, gamma, beta, w, bias, res, skw, skb):
            y = _block_reference(x, gamma, beta, w, bias, None, res, None,
                                 skw, skb, 16, 1e-5, "proj", False, True,
                                 True, False)
            return jnp.sum(y.astype(jnp.float32) * cot)

        gk = jax.grad(loss_kb, argnums=tuple(range(8)))(
            x, gamma, beta, w, bias, res_proj, skw, skb)
        gr = jax.grad(loss_rb, argnums=tuple(range(8)))(
            x, gamma, beta, w, bias, res_proj, skw, skb)
        for nm2, a, bb in zip(("dx", "dgamma", "dbeta", "dw", "dbias",
                               "dres", "dskw", "dskb"), gk, gr):
            ok &= check(f"grad-proj {nm2} {nm}", a, bb, gtol)
    print("ALL OK" if ok else "FAILURES", flush=True)


if __name__ == "__main__":
    main()
