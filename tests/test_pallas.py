"""Fused GroupNorm+SiLU kernel: reference-math equality + gradient checks.

On CPU the jnp fallback runs; the Pallas path itself is exercised on TPU
(bench/verify drives). These tests pin the *math* — the kernel and fallback
share formulas, and the custom VJP is validated against jax autodiff.
"""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m_cedm_tpu.models.layers import GroupNormSiLU
from m_cedm_tpu.pallas.fused_norm import (
    fused_group_norm_silu,
    group_norm_silu_reference,
)

B, N, C = 2, 64, 32
G = 8


class TestReferenceMath:
    def test_matches_unfused_composition(self):
        """reference == silu(flax GroupNorm(x) * (1+s) + t) with folded params."""
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        gn = nn.GroupNorm(num_groups=G, epsilon=1e-5)
        params = gn.init(jax.random.PRNGKey(0), x)
        scale = jnp.asarray(rs.randn(B, C).astype(np.float32) * 0.1)
        shift = jnp.asarray(rs.randn(B, C).astype(np.float32) * 0.1)

        normed = gn.apply(params, x)
        expected = jax.nn.silu(normed * (1 + scale[:, None]) + shift[:, None])

        gamma = (1 + scale)  # flax scale=1, bias=0 at init
        beta = shift
        got = group_norm_silu_reference(x, gamma, beta, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=2e-4, atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        rs = np.random.RandomState(1)
        x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B, C).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B, C).astype(np.float32))

        def f_fused(x, g, b):
            return jnp.sum(jnp.sin(fused_group_norm_silu(x, g, b, G)))

        def f_ref(x, g, b):
            return jnp.sum(jnp.sin(group_norm_silu_reference(x, g, b, G)))

        g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, gamma, beta)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-5)


class TestGroupNormSiLUModule:
    def test_module_plain(self):
        m = GroupNormSiLU(G)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, C))
        params = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(params, x)
        assert out.shape == x.shape
        # zero-mean unit-var per group before silu: output mean is silu-biased
        assert np.isfinite(np.asarray(out)).all()

    def test_module_film(self):
        m = GroupNormSiLU(G)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, C))
        fs = jax.random.normal(jax.random.PRNGKey(2), (B, C)) * 0.1
        ft = jax.random.normal(jax.random.PRNGKey(3), (B, C)) * 0.1
        params = m.init(jax.random.PRNGKey(1), x, fs, ft)
        out = m.apply(params, x, fs, ft)
        assert out.shape == x.shape

    def test_bf16_input_returns_bf16(self):
        m = GroupNormSiLU(G)
        x = jax.random.normal(jax.random.PRNGKey(0), (B, 8, 8, C)).astype(jnp.bfloat16)
        params = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(params, x)
        assert out.dtype == jnp.bfloat16


class TestKernelOnInterpreter:
    def test_pallas_kernel_interpret_matches_reference(self):
        """Force the Pallas path in interpret mode and compare vs reference."""
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn

        rs = np.random.RandomState(2)
        x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B, C).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B, C).astype(np.float32))

        orig_call = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
            fn.pl.pallas_call = pl.pallas_call
            # tile smaller than N to exercise the accumulation grid
            out, sums, sumsq = fn._pallas_forward(x, gamma, beta, G, 1e-5,
                                                  tile=N // 2)
        finally:
            pl.pallas_call = orig_call
            fn.pl.pallas_call = orig_call
        ref = group_norm_silu_reference(x, gamma, beta, G)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sums),
                                   np.asarray(jnp.sum(x, axis=1)), rtol=1e-4)

    def test_pallas_bwd_interpret_matches_autodiff(self):
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn

        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B, C).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B, C).astype(np.float32))
        g = jnp.asarray(rs.randn(B, N, C).astype(np.float32))

        orig_call = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
            fn.pl.pallas_call = pl.pallas_call
            out, sums, sumsq = fn._pallas_forward(x, gamma, beta, G, 1e-5,
                                                  tile=N // 2)
            dx, dgamma, dbeta = fn._pallas_backward(x, gamma, beta, sums,
                                                    sumsq, g, G, 1e-5,
                                                    tile=N // 2)
        finally:
            pl.pallas_call = orig_call
            fn.pl.pallas_call = orig_call

        def ref(x, gm, bt):
            return group_norm_silu_reference(x, gm, bt, G)

        _, vjp = jax.vjp(ref, x, gamma, beta)
        dx_r, dgamma_r, dbeta_r = vjp(g)
        np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dgamma), np.asarray(dgamma_r),
                                   rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(np.asarray(dbeta), np.asarray(dbeta_r),
                                   rtol=1e-3, atol=1e-4)


class TestFusedAttention:
    def _qkv(self):
        rs = np.random.RandomState(5)
        shape = (3, 32, 16)
        return tuple(jnp.asarray(rs.randn(*shape).astype(np.float32))
                     for _ in range(3))

    def test_reference_matches_layers_math(self):
        from m_cedm_tpu.pallas.fused_attention import attention_reference
        import torch

        q, k, v = self._qkv()
        scale = 1 / np.sqrt(16)
        qt, kt, vt = (torch.tensor(np.asarray(a)) for a in (q, k, v))
        w = torch.softmax(torch.einsum("nqd,nkd->nqk", qt, kt * scale), dim=-1)
        ref = torch.einsum("nqk,nkd->nqd", w, vt).numpy()
        got = attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        from m_cedm_tpu.pallas.fused_attention import (attention_reference,
                                                       fused_attention)

        q, k, v = self._qkv()

        def f(fn):
            return lambda *args: jnp.sum(jnp.tanh(fn(*args)))

        g1 = jax.grad(f(fused_attention), argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f(attention_reference), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=1e-5)

    def test_pallas_kernels_interpret(self):
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_attention as fa

        q, k, v = self._qkv()
        g = jnp.asarray(np.random.RandomState(6).randn(3, 32, 16).astype(np.float32))
        orig = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
            fa.pl.pallas_call = pl.pallas_call
            out = fa._pallas_fwd(q, k, v)
            dq, dk, dv = fa._pallas_bwd(q, k, v, g)
        finally:
            pl.pallas_call = orig
            fa.pl.pallas_call = orig
        ref = fa.attention_reference(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
        _, vjp = jax.vjp(fa.attention_reference, q, k, v)
        rq, rk, rv = vjp(g)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(rq), rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(dk), np.asarray(rk), rtol=1e-3,
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(rv), rtol=1e-3,
                                   atol=1e-4)


class TestFusedNormConv:
    """Fused GroupNorm+SiLU+Conv3x3 (pallas/fused_norm_conv.py)."""

    def _inputs(self, B=2, H=32, W=16, C=32, O=48, seed=7):
        rs = np.random.RandomState(seed)
        x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B, C).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B, C).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, C, O).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        return x, gamma, beta, w, bias

    def test_reference_matches_composition(self):
        """gn_silu_conv_reference == group_norm_silu_reference -> lax.conv."""
        from m_cedm_tpu.pallas.fused_norm_conv import gn_silu_conv_reference

        x, gamma, beta, w, bias = self._inputs()
        b, h, wd, c = x.shape
        y = group_norm_silu_reference(x.reshape(b, h * wd, c), gamma, beta,
                                      G).reshape(b, h, wd, c)
        expected = jax.lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        got = gn_silu_conv_reference(x, gamma, beta, w, bias, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected),
                                   rtol=1e-4, atol=1e-5)

    def test_custom_vjp_matches_autodiff(self):
        from m_cedm_tpu.pallas.fused_norm_conv import (fused_gn_silu_conv,
                                                       gn_silu_conv_reference)

        x, gamma, beta, w, bias = self._inputs(H=16, W=16)

        def f(fn):
            return lambda *a: jnp.sum(jnp.sin(fn(*a, G, 1e-5)))

        g1 = jax.grad(f(fused_gn_silu_conv), argnums=(0, 1, 2, 3, 4))(
            x, gamma, beta, w, bias)
        g2 = jax.grad(f(gn_silu_conv_reference), argnums=(0, 1, 2, 3, 4))(
            x, gamma, beta, w, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)

    def test_pallas_kernel_interpret_matches_reference(self):
        """Row-tiled kernel with halo exchange (H=32 -> 2 tiles of R=16) in
        interpret mode vs the reference composition."""
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        x, gamma, beta, w, bias = self._inputs(H=32, W=16)
        orig_call = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
            fn.pl.pallas_call = pl.pallas_call
            fnc.pl.pallas_call = pl.pallas_call
            out = fnc._pallas_gnsc(x, gamma, beta, w, bias, G, 1e-5)
        finally:
            pl.pallas_call = orig_call
            fn.pl.pallas_call = orig_call
            fnc.pl.pallas_call = orig_call
        ref = fnc.gn_silu_conv_reference(x, gamma, beta, w, bias, G, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=1e-4)

    def test_block_reference_matches_composition(self):
        """gn_silu_conv_block_reference (identity / 1x1-proj residual +
        emitted stats) == unfused composition."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        x, gamma, beta, w, bias = self._inputs()
        O = w.shape[-1]
        rs = np.random.RandomState(11)
        res_id = jnp.asarray(rs.randn(*x.shape[:3], O).astype(np.float32))
        res_in = jnp.asarray(rs.randn(*x.shape[:3], 24).astype(np.float32))
        skw = jnp.asarray(0.1 * rs.randn(24, O).astype(np.float32))
        skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        base = fnc.gn_silu_conv_reference(x, gamma, beta, w, bias, G)

        got = fnc.gn_silu_conv_block_reference(x, gamma, beta, w, bias, G,
                                               residual=res_id)
        np.testing.assert_allclose(np.asarray(got), np.asarray(base + res_id),
                                   rtol=1e-5, atol=1e-6)
        got = fnc.gn_silu_conv_block_reference(x, gamma, beta, w, bias, G,
                                               residual=res_in, skip_w=skw,
                                               skip_b=skb)
        want = base + jnp.einsum("bhwc,co->bhwo", res_in, skw) + skb
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_block_pallas_interpret_matches_reference(self):
        """The full residual-block-tail kernel (proj residual, chained input
        stats, emitted output stats) in interpret mode vs reference."""
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        x, gamma, beta, w, bias = self._inputs(H=32, W=16)
        b, h, wd, c = x.shape
        O = w.shape[-1]
        rs = np.random.RandomState(12)
        res = jnp.asarray(rs.randn(b, h, wd, 24).astype(np.float32))
        skw = jnp.asarray(0.1 * rs.randn(24, O).astype(np.float32))
        skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        x32 = x.reshape(b, h * wd, c).astype(jnp.float32)
        stats = (jnp.sum(x32, 1), jnp.sum(x32 * x32, 1))
        orig_call = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
            fn.pl.pallas_call = pl.pallas_call
            fnc.pl.pallas_call = pl.pallas_call
            out, osums, osumsq = fnc._pallas_gnsc(
                x, gamma, beta, w, bias, G, 1e-5, residual=res, skip_w=skw,
                skip_b=skb, res_mode="proj", emit_stats=True, stats=stats)
        finally:
            pl.pallas_call = orig_call
            fn.pl.pallas_call = orig_call
            fnc.pl.pallas_call = orig_call
        ref = fnc.gn_silu_conv_block_reference(x, gamma, beta, w, bias, G,
                                               1e-5, residual=res,
                                               skip_w=skw, skip_b=skb)
        rsums, rsumsq = fnc._out_stats_reference(ref)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(osums), np.asarray(rsums),
                                   rtol=2e-4, atol=2e-3)
        np.testing.assert_allclose(np.asarray(osumsq), np.asarray(rsumsq),
                                   rtol=2e-4, atol=2e-3)

    def test_block_grad_matches_unfused(self):
        """Gradients through the fully-fused block path (conv0 emit_stats ->
        conv1 chained stats + proj residual) == the unfused block: exercises
        the custom VJP incl. zero cotangents for the chained stats."""
        from m_cedm_tpu.models.adm_unet import UNetBlock
        from m_cedm_tpu.models.layers import disable_conv_fusion

        block = UNetBlock(out_channels=32)  # in_ch 48 != 32 -> proj skip
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 48))
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        params = block.init(jax.random.PRNGKey(2), x, emb)

        def loss(p, fused):
            if fused:
                return jnp.sum(jnp.sin(block.apply(p, x, emb)))
            with disable_conv_fusion(mode="0"):
                return jnp.sum(jnp.sin(block.apply(p, x, emb)))

        g1 = jax.grad(lambda p: loss(p, True))(params)
        g2 = jax.grad(lambda p: loss(p, False))(params)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        for a, b_ in zip(flat1, flat2):
            # 1x1-proj as einsum vs lax.conv reassociates fp32 sums
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=4e-4, atol=4e-5)

    def test_dual_input_block_pallas_interpret(self):
        """Dual-input kernel (unmaterialized concat + proj2 residual +
        chained stats + emitted stats) in interpret mode vs the
        concat-then-reference composition."""
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        rs = np.random.RandomState(21)
        B_, H, W_, C1, C2, O = 2, 32, 16, 32, 16, 48
        x1 = jnp.asarray(rs.randn(B_, H, W_, C1).astype(np.float32))
        x2 = jnp.asarray(rs.randn(B_, H, W_, C2).astype(np.float32))
        C = C1 + C2
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B_, C).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B_, C).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, C, O).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        r1 = jnp.asarray(rs.randn(B_, H, W_, C1).astype(np.float32))
        r2 = jnp.asarray(rs.randn(B_, H, W_, C2).astype(np.float32))
        skw = jnp.asarray(0.1 * rs.randn(C, O).astype(np.float32))
        skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        cat = jnp.concatenate([x1, x2], -1).reshape(B_, H * W_, C)
        stats = (jnp.sum(cat, 1), jnp.sum(cat * cat, 1))
        orig_call = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
            fn.pl.pallas_call = pl.pallas_call
            fnc.pl.pallas_call = pl.pallas_call
            out, osums, osumsq = fnc._pallas_gnsc(
                x1, gamma, beta, w, bias, G, 1e-5, x2=x2, residual=r1,
                residual2=r2, skip_w=skw, skip_b=skb, res_mode="proj2",
                emit_stats=True, stats=stats)
        finally:
            pl.pallas_call = orig_call
            fn.pl.pallas_call = orig_call
            fnc.pl.pallas_call = orig_call
        ref = fnc.gn_silu_conv_block_reference(
            jnp.concatenate([x1, x2], -1), gamma, beta, w, bias, G, 1e-5,
            residual=jnp.concatenate([r1, r2], -1), skip_w=skw, skip_b=skb)
        rsums, rsumsq = fnc._out_stats_reference(ref)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(osums), np.asarray(rsums),
                                   rtol=2e-4, atol=5e-3)
        np.testing.assert_allclose(np.asarray(osumsq), np.asarray(rsumsq),
                                   rtol=2e-4, atol=5e-3)

    def test_admunet_chain_toggle_same_outputs(self):
        """Full AdmUNet forward: stats-chained dual-input path == fusion-off
        path on CPU (pins the encoder/decoder stats-flow plumbing)."""
        from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig
        from m_cedm_tpu.models.layers import disable_conv_fusion

        cfg = AdmUNetConfig(in_channels=2, out_ch=2, ch=32,
                            ch_mult=(1, 1), num_res_blocks=1,
                            attn_resolutions=(16,), resolution=32)
        net = AdmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        t = jnp.asarray([1.5, 0.3])
        params = net.init(jax.random.PRNGKey(1), x, t)
        out_chain = net.apply(params, x, t)
        with disable_conv_fusion(mode="0"):
            out_off = net.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(out_chain),
                                   np.asarray(out_off),
                                   rtol=1e-4, atol=1e-5)
        # gradients through the chained path (MCEDM_TRAIN_FUSION=1
        # semantics: fusion stays on under autodiff)
        g_chain = jax.grad(lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(
            params)

        def loss_off(p):
            with disable_conv_fusion(mode="0"):
                return jnp.sum(jnp.sin(net.apply(p, x, t)))

        g_off = jax.grad(loss_off)(params)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_chain),
                         jax.tree_util.tree_leaves(g_off)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-4)

    def test_upsample_phase_conv_matches_materialized(self):
        """Phase-decomposed upsample+conv3x3 == conv3x3(nearest_upsample)."""
        from m_cedm_tpu.models.layers import (_upsample_phase_conv,
                                              upsample2x_nearest)

        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(2, 16, 12, 24).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, 24, 40).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(40).astype(np.float32))
        want = jax.lax.conv_general_dilated(
            upsample2x_nearest(x), w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        got = _upsample_phase_conv(x, w, bias)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_down_block_fusion_toggle_same_outputs(self):
        """A down-sampling UNetBlock (pool-fused prefix + fused tail) is
        identical with fusion on/off on CPU."""
        from m_cedm_tpu.models.adm_unet import UNetBlock
        from m_cedm_tpu.models.layers import disable_conv_fusion

        block = UNetBlock(out_channels=32, down=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        params = block.init(jax.random.PRNGKey(2), x, emb)
        out_fused = block.apply(params, x, emb)
        with disable_conv_fusion(mode="0"):
            out_unfused = block.apply(params, x, emb)
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_unfused),
                                   rtol=1e-5, atol=1e-6)

    def test_unet_block_fusion_toggle_same_outputs(self):
        """A UNetBlock forward is identical with fusion enabled/disabled
        (on CPU both route to the same reference math; this pins the module
        plumbing: fold_only + Conv2d(fused_norm=...))."""
        from m_cedm_tpu.models.adm_unet import UNetBlock
        from m_cedm_tpu.models.layers import disable_conv_fusion

        block = UNetBlock(out_channels=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        params = block.init(jax.random.PRNGKey(2), x, emb)
        out_fused = block.apply(params, x, emb)
        with disable_conv_fusion(mode="0"):
            out_unfused = block.apply(params, x, emb)
        np.testing.assert_allclose(np.asarray(out_fused),
                                   np.asarray(out_unfused),
                                   rtol=1e-5, atol=1e-6)

    def test_use_pallas_gate_requires_divisible_stats_tile(self, monkeypatch):
        """Regression (round-2 review): H*W not divisible by the 2048-row
        stats tile must fall back — the stats kernel's sequential grid would
        silently drop the remainder rows (wrong mean/rstd)."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        monkeypatch.setattr(fnc, "pallas_enabled", lambda: True)
        ok = jnp.zeros((1, 128, 128, 64))
        assert fnc._use_pallas(ok)
        bad = jnp.zeros((1, 48, 48, 16))  # n = 2304, 2304 % 2048 = 256
        assert not fnc._use_pallas(bad)
        small = jnp.zeros((1, 16, 16, 32))  # n = 256 <= 2048 and divides
        assert fnc._use_pallas(small)


class TestFusedNormConvBackward:
    """Hand-written two-phase Pallas backward (phase A reductions + phase B
    dx/dres) vs jax autodiff of the reference composition, in interpret
    mode with the Pallas path forced."""

    def _force(self, monkeypatch):
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        orig_call = pl.pallas_call
        wrapped = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
        monkeypatch.setattr(pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn.pl, "pallas_call", wrapped, raising=False)
        monkeypatch.setattr(fnc.pl, "pallas_call", wrapped, raising=False)
        monkeypatch.setattr(fn, "pallas_enabled", lambda: True)
        monkeypatch.setattr(fnc, "pallas_enabled", lambda: True)
        # keep these classes pinned to the UNPAIRED kernels (the paired
        # path has its own coverage in TestPairedLane)
        monkeypatch.setenv("MCEDM_PAIR", "0")
        return fnc

    def _inputs(self, dtype=jnp.float32, H=32):
        rs = np.random.RandomState(11)
        B_, W_, C_, O = 2, 16, 32, 32
        x = jnp.asarray(rs.randn(B_, H, W_, C_).astype(np.float32), dtype)
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, C_, O).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        ct = jnp.asarray(rs.randn(B_, H, W_, O).astype(np.float32), dtype)
        return x, gamma, beta, w, bias, ct

    def test_base_grad_parity(self, monkeypatch):
        fnc = self._force(monkeypatch)
        x, gamma, beta, w, bias, ct = self._inputs()
        assert fnc._use_pallas(x)

        g1 = jax.grad(lambda *a: jnp.sum(
            fnc.fused_gn_silu_conv(*a, G, 1e-5) * ct),
            argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, bias)
        g2 = jax.grad(lambda *a: jnp.sum(
            fnc.gn_silu_conv_reference(*a, G, 1e-5) * ct),
            argnums=(0, 1, 2, 3, 4))(x, gamma, beta, w, bias)
        for name, a, b_ in zip(("dx", "dgamma", "dbeta", "dw", "dbias"),
                               g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4, err_msg=name)

    @pytest.mark.parametrize("mode", ["identity", "proj"])
    def test_block_grad_parity(self, mode, monkeypatch):
        fnc = self._force(monkeypatch)
        x, gamma, beta, w, bias, ct = self._inputs()
        rs = np.random.RandomState(12)
        if mode == "identity":
            res = jnp.asarray(rs.randn(*ct.shape).astype(np.float32))
            kw = dict(residual=res)
            args = (x, gamma, beta, w, bias, res)
            wrap = lambda f: lambda x, g, b_, w_, bi, r: jnp.sum(
                f(x, g, b_, w_, bi, G, residual=r) * ct)
        else:
            cr = 24
            res = jnp.asarray(rs.randn(x.shape[0], x.shape[1], x.shape[2],
                                       cr).astype(np.float32))
            skw = jnp.asarray(0.2 * rs.randn(cr, ct.shape[-1])
                              .astype(np.float32))
            skb = jnp.asarray(0.1 * rs.randn(ct.shape[-1]).astype(np.float32))
            args = (x, gamma, beta, w, bias, res, skw, skb)
            wrap = lambda f: lambda x, g, b_, w_, bi, r, sw, sb: jnp.sum(
                f(x, g, b_, w_, bi, G, residual=r, skip_w=sw, skip_b=sb) * ct)
        nargs = tuple(range(len(args)))
        g1 = jax.grad(wrap(fnc.fused_gn_silu_conv_block), argnums=nargs)(*args)
        g2 = jax.grad(wrap(fnc.gn_silu_conv_block_reference),
                      argnums=nargs)(*args)
        names = ("dx", "dgamma", "dbeta", "dw", "dbias", "dres", "dskw",
                 "dskb")[:len(args)]
        for name, a, b_ in zip(names, g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4, err_msg=name)

    def test_bwd_gate_falls_back(self, monkeypatch):
        """MCEDM_BWD_KERNEL=0 routes backward through XLA recompute of the
        reference — same gradients."""
        fnc = self._force(monkeypatch)
        x, gamma, beta, w, bias, ct = self._inputs()

        def grads():
            return jax.grad(lambda *a: jnp.sum(
                fnc.fused_gn_silu_conv(*a, G, 1e-5) * ct),
                argnums=(0, 3))(x, gamma, beta, w, bias)

        g_kernel = grads()
        monkeypatch.setenv("MCEDM_BWD_KERNEL", "0")
        g_fallback = grads()
        for a, b_ in zip(g_kernel, g_fallback):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4)

    def test_train_trace_unet_block_grads(self, monkeypatch):
        """UNetBlock traced in "train" fusion mode (fused kernels, backward
        kernels, no stats chain) == mode "0" (everything unfused)."""
        from m_cedm_tpu.models.adm_unet import UNetBlock
        from m_cedm_tpu.models.layers import disable_conv_fusion

        self._force(monkeypatch)
        block = UNetBlock(out_channels=32)  # in_ch 48 != 32 -> proj skip
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 16, 48))
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        params = block.init(jax.random.PRNGKey(2), x, emb)

        def loss(p, mode):
            with disable_conv_fusion(mode=mode):
                return jnp.sum(jnp.sin(block.apply(p, x, emb)))

        out_train = loss(params, "train")
        out_off = loss(params, "0")
        np.testing.assert_allclose(float(out_train), float(out_off),
                                   rtol=1e-4)
        g1 = jax.grad(lambda p: loss(p, "train"))(params)
        g2 = jax.grad(lambda p: loss(p, "0"))(params)
        paths1 = jax.tree_util.tree_leaves_with_path(g1)
        paths2 = jax.tree_util.tree_leaves_with_path(g2)
        for (p1, a), (_, b_) in zip(paths1, paths2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=6e-4, atol=6e-5,
                err_msg=jax.tree_util.keystr(p1))

    def test_bf16_grad_parity(self, monkeypatch):
        """bf16 activations: backward kernels vs autodiff of the reference
        (both see the same cast points; bf16-level tolerance)."""
        fnc = self._force(monkeypatch)
        x, gamma, beta, w, bias, ct = self._inputs(dtype=jnp.bfloat16)
        wb = w.astype(jnp.bfloat16)

        g1 = jax.grad(lambda *a: jnp.sum(
            (fnc.fused_gn_silu_conv(*a, G, 1e-5) * ct)
            .astype(jnp.float32)), argnums=(0, 3))(x, gamma, beta, wb, bias)
        g2 = jax.grad(lambda *a: jnp.sum(
            (fnc.gn_silu_conv_reference(*a, G, 1e-5) * ct)
            .astype(jnp.float32)), argnums=(0, 3))(x, gamma, beta, wb, bias)
        for name, a, b_ in zip(("dx", "dw"), g1, g2):
            a32 = np.asarray(a, np.float32)
            b32 = np.asarray(b_, np.float32)
            scale = np.abs(b32).max()
            assert np.abs(a32 - b32).max() <= 0.05 * max(scale, 1.0), name


class TestUpConvKernel:
    """Fused norm+silu+upsample2x+conv3x3 kernel and the res_up tail."""

    def _force(self, monkeypatch):
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        orig_call = pl.pallas_call
        wrapped = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
        monkeypatch.setattr(pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn.pl, "pallas_call", wrapped, raising=False)
        monkeypatch.setattr(fnc.pl, "pallas_call", wrapped, raising=False)
        monkeypatch.setattr(fn, "pallas_enabled", lambda: True)
        monkeypatch.setattr(fnc, "pallas_enabled", lambda: True)
        # keep these classes pinned to the UNPAIRED kernels (the paired
        # path has its own coverage in TestPairedLane)
        monkeypatch.setenv("MCEDM_PAIR", "0")
        return fnc

    def test_up_kernel_interpret_matches_reference(self, monkeypatch):
        fnc = self._force(monkeypatch)
        rs = np.random.RandomState(5)
        x = jnp.asarray(rs.randn(2, 32, 16, 16).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(2, 16).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(2, 16).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, 16, 24).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(24).astype(np.float32))
        got = fnc.fused_gn_silu_up_conv(x, gamma, beta, w, bias, 4)
        want = fnc.gn_silu_up_conv_reference(x, gamma, beta, w, bias, 4)
        assert got.shape == (2, 64, 32, 24)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)
        # reference itself == unfused composition
        y = group_norm_silu_reference(x.reshape(2, -1, 16), gamma, beta, 4)
        y = jnp.repeat(jnp.repeat(y.reshape(x.shape), 2, 1), 2, 2)
        comp = jax.lax.conv_general_dilated(
            y, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + bias
        np.testing.assert_allclose(np.asarray(want), np.asarray(comp),
                                   rtol=1e-4, atol=1e-5)

    def test_res_up_tail_interpret(self, monkeypatch):
        """identity_up residual: low-res skip upsampled in VMEM == upsample
        then add."""
        fnc = self._force(monkeypatch)
        rs = np.random.RandomState(6)
        x = jnp.asarray(rs.randn(2, 32, 16, 16).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(2, 16).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(2, 16).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, 16, 16).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(16).astype(np.float32))
        res_low = jnp.asarray(rs.randn(2, 16, 8, 16).astype(np.float32))
        got = fnc.fused_gn_silu_conv_block(x, gamma, beta, w, bias, 4,
                                           residual=res_low, res_up=True)
        res_hi = jnp.repeat(jnp.repeat(res_low, 2, 1), 2, 2)
        want = fnc.gn_silu_conv_block_reference(x, gamma, beta, w, bias, 4,
                                                residual=res_hi)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-4, atol=2e-4)

    def test_admunet_up_kernel_toggle_same_outputs(self, monkeypatch):
        """Full AdmUNet: MCEDM_UPCONV=kernel + MCEDM_UPRES=1 == default
        path (CPU reference math; pins the wiring + param-tree compat)."""
        from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig

        cfg = AdmUNetConfig(in_channels=2, out_ch=2, ch=32,
                            ch_mult=(1, 1), num_res_blocks=1,
                            attn_resolutions=(16,), resolution=32)
        net = AdmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        t = jnp.asarray([1.5, 0.3])
        params = net.init(jax.random.PRNGKey(1), x, t)
        out_ref = net.apply(params, x, t)
        monkeypatch.setenv("MCEDM_UPCONV", "kernel")
        monkeypatch.setenv("MCEDM_UPRES", "1")
        out_k = net.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_ref),
                                   rtol=1e-4, atol=1e-5)


class TestIdentityUpBackward:
    def test_identity_up_grad_parity(self, monkeypatch):
        """res_up (identity_up) block: Pallas backward (da emission + XLA
        pooled dres) == autodiff of upsample-then-add reference."""
        fnc = TestFusedNormConvBackward()._force(monkeypatch)
        rs = np.random.RandomState(13)
        x = jnp.asarray(rs.randn(2, 32, 16, 16).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(2, 16).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(2, 16).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, 16, 16).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(16).astype(np.float32))
        res_low = jnp.asarray(rs.randn(2, 16, 8, 16).astype(np.float32))
        ct = jnp.asarray(rs.randn(2, 32, 16, 16).astype(np.float32))

        def loss_fused(x, g, b_, w_, bi, r):
            return jnp.sum(fnc.fused_gn_silu_conv_block(
                x, g, b_, w_, bi, 4, residual=r, res_up=True) * ct)

        def loss_ref(x, g, b_, w_, bi, r):
            r_hi = jnp.repeat(jnp.repeat(r, 2, 1), 2, 2)
            return jnp.sum(fnc.gn_silu_conv_block_reference(
                x, g, b_, w_, bi, 4, residual=r_hi) * ct)

        nargs = tuple(range(6))
        g1 = jax.grad(loss_fused, argnums=nargs)(x, gamma, beta, w, bias,
                                                 res_low)
        g2 = jax.grad(loss_ref, argnums=nargs)(x, gamma, beta, w, bias,
                                               res_low)
        for name, a, b_ in zip(("dx", "dgamma", "dbeta", "dw", "dbias",
                                "dres"), g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-4, err_msg=name)

    def test_train_trace_up_block_grads(self, monkeypatch):
        """An up-sampling UNetBlock traced in "train" mode (fused tail with
        res_up + backward kernels) == mode "0" (unfused)."""
        from m_cedm_tpu.models.adm_unet import UNetBlock
        from m_cedm_tpu.models.layers import disable_conv_fusion

        TestFusedNormConvBackward()._force(monkeypatch)
        block = UNetBlock(out_channels=32, up=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 32))
        emb = jax.random.normal(jax.random.PRNGKey(1), (2, 32))
        params = block.init(jax.random.PRNGKey(2), x, emb)

        def loss(p, mode):
            with disable_conv_fusion(mode=mode):
                return jnp.sum(jnp.sin(block.apply(p, x, emb)))

        np.testing.assert_allclose(float(loss(params, "train")),
                                   float(loss(params, "0")), rtol=1e-4)
        g1 = jax.grad(lambda p: loss(p, "train"))(params)
        g2 = jax.grad(lambda p: loss(p, "0"))(params)
        for (p1, a), (_, b_) in zip(
                jax.tree_util.tree_leaves_with_path(g1),
                jax.tree_util.tree_leaves_with_path(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=6e-4, atol=6e-5,
                err_msg=jax.tree_util.keystr(p1))


class TestMegaBlock:
    """Whole-UNetBlock megakernel (pallas/fused_block.py): interpret-mode
    parity vs the two-stage reference composition, whole-net toggle
    equality, and gradients through the recompute fallback."""

    def _force_interpret(self):
        from jax.experimental import pallas as pl
        import m_cedm_tpu.pallas.fused_norm as fn

        orig_call = pl.pallas_call
        orig_enabled = fn.pallas_enabled
        fn.pallas_enabled = lambda: True
        pl.pallas_call = lambda *a, **k: orig_call(*a, **{**k,
                                                          "interpret": True})
        fn.pl.pallas_call = pl.pallas_call
        import m_cedm_tpu.pallas.fused_block as fb
        import m_cedm_tpu.pallas.fused_norm_conv as fnc
        fnc.pl.pallas_call = pl.pallas_call
        fb.pl.pallas_call = pl.pallas_call

        def restore():
            pl.pallas_call = orig_call
            fn.pl.pallas_call = orig_call
            fnc.pl.pallas_call = orig_call
            fb.pl.pallas_call = orig_call
            fn.pallas_enabled = orig_enabled

        return restore

    def test_mega_identity_interpret_matches_reference(self):
        pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_block as fb

        rs = np.random.RandomState(5)
        B_, H, W_, C_ = 2, 32, 16, 16
        x = jnp.asarray(rs.randn(B_, H, W_, C_).astype(np.float32))
        g0 = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        b0 = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w0 = jnp.asarray(0.1 * rs.randn(3, 3, C_, C_).astype(np.float32))
        bias0 = jnp.asarray(0.1 * rs.randn(C_).astype(np.float32))
        g1 = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        b1 = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w1 = jnp.asarray(0.1 * rs.randn(3, 3, C_, C_).astype(np.float32))
        bias1 = jnp.asarray(0.1 * rs.randn(C_).astype(np.float32))
        restore = self._force_interpret()
        try:
            out = fb._pallas_mega(x, g0, b0, w0, bias0, g1, b1, w1, bias1,
                                  4, 4, 1e-5)
        finally:
            restore()
        ref = fb.fused_unet_block_reference(x, g0, b0, w0, bias0, g1, b1,
                                            w1, bias1, 4, 4, 1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_mega_dual_proj_emit_interpret_matches_reference(self):
        """Dual input (unmaterialized concat) + 1x1-projection skip +
        chained input stats + emitted output stats."""
        pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_block as fb
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        rs = np.random.RandomState(6)
        B_, H, W_, C1, C2, O = 2, 32, 16, 16, 8, 24
        C_ = C1 + C2
        x1 = jnp.asarray(rs.randn(B_, H, W_, C1).astype(np.float32))
        x2 = jnp.asarray(rs.randn(B_, H, W_, C2).astype(np.float32))
        g0 = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        b0 = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w0 = jnp.asarray(0.1 * rs.randn(3, 3, C_, O).astype(np.float32))
        bias0 = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        g1 = jnp.asarray(1 + 0.1 * rs.randn(B_, O).astype(np.float32))
        b1 = jnp.asarray(0.1 * rs.randn(B_, O).astype(np.float32))
        w1 = jnp.asarray(0.1 * rs.randn(3, 3, O, O).astype(np.float32))
        bias1 = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        skw = jnp.asarray(0.1 * rs.randn(C_, O).astype(np.float32))
        skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        cat = jnp.concatenate([x1, x2], -1).reshape(B_, H * W_, C_)
        stats = (jnp.sum(cat, 1), jnp.sum(cat * cat, 1))
        restore = self._force_interpret()
        try:
            out, osums, osumsq = fb._pallas_mega(
                x1, g0, b0, w0, bias0, g1, b1, w1, bias1, 4, 4, 1e-5,
                x2=x2, skip_w=skw, skip_b=skb, stats=stats, emit_stats=True)
        finally:
            restore()
        ref, rsums, rsumsq = fb.fused_unet_block_reference(
            x1, g0, b0, w0, bias0, g1, b1, w1, bias1, 4, 4, 1e-5,
            x2=x2, skip_w=skw, skip_b=skb, emit_stats=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(osums), np.asarray(rsums),
                                   rtol=2e-4, atol=5e-3)
        np.testing.assert_allclose(np.asarray(osumsq), np.asarray(rsumsq),
                                   rtol=2e-4, atol=5e-3)

    def test_admunet_mega_toggle_same_outputs(self, monkeypatch):
        """Full AdmUNet: MCEDM_MEGA=1 == fusion-off on CPU (pins the module
        plumbing: params_only/fold_only wiring, skip-concat bypass, emitted
        stats threading) and param structure is unchanged."""
        from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig
        from m_cedm_tpu.models.layers import disable_conv_fusion

        cfg = AdmUNetConfig(in_channels=2, out_ch=2, ch=32,
                            ch_mult=(1, 1), num_res_blocks=1,
                            attn_resolutions=(16,), resolution=32)
        net = AdmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        t = jnp.asarray([1.5, 0.3])
        params = net.init(jax.random.PRNGKey(1), x, t)
        monkeypatch.setenv("MCEDM_MEGA", "1")
        out_mega = net.apply(params, x, t)
        params_mega = net.init(jax.random.PRNGKey(1), x, t)
        with disable_conv_fusion(mode="0"):
            out_off = net.apply(params, x, t)
        np.testing.assert_allclose(np.asarray(out_mega), np.asarray(out_off),
                                   rtol=1e-4, atol=1e-5)
        assert (jax.tree_util.tree_structure(params)
                == jax.tree_util.tree_structure(params_mega))
        # gradients flow through the recompute-fallback custom VJP
        g_mega = jax.grad(lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(
            params)

        def loss_off(p):
            with disable_conv_fusion(mode="0"):
                return jnp.sum(jnp.sin(net.apply(p, x, t)))

        g_off = jax.grad(loss_off)(params)
        for a, b_ in zip(jax.tree_util.tree_leaves(g_mega),
                         jax.tree_util.tree_leaves(g_off)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-4)

    def test_mega_up_interpret_matches_reference(self):
        """Up-block megakernel: norm at low res, row-upsample in VMEM,
        conv at high res, tail + upsampled residual — vs the reference
        upsample composition (identity and proj skips)."""
        pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_block as fb

        rs = np.random.RandomState(9)
        B_, H, W_, C_, O = 2, 16, 8, 16, 16
        x = jnp.asarray(rs.randn(B_, H, W_, C_).astype(np.float32))
        g0 = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        b0 = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w0 = jnp.asarray(0.1 * rs.randn(3, 3, C_, O).astype(np.float32))
        bias0 = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        g1 = jnp.asarray(1 + 0.1 * rs.randn(B_, O).astype(np.float32))
        b1 = jnp.asarray(0.1 * rs.randn(B_, O).astype(np.float32))
        w1 = jnp.asarray(0.1 * rs.randn(3, 3, O, O).astype(np.float32))
        bias1 = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        skw = jnp.asarray(0.1 * rs.randn(C_, O).astype(np.float32))
        skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        restore = self._force_interpret()
        try:
            out = fb._pallas_mega(x, g0, b0, w0, bias0, g1, b1, w1, bias1,
                                  4, 4, 1e-5, up=True)
            out_p, osums, _ = fb._pallas_mega(
                x, g0, b0, w0, bias0, g1, b1, w1, bias1, 4, 4, 1e-5,
                up=True, skip_w=skw, skip_b=skb, emit_stats=True)
        finally:
            restore()
        ref = fb.fused_unet_block_reference(x, g0, b0, w0, bias0, g1, b1,
                                            w1, bias1, 4, 4, 1e-5, up=True)
        ref_p, rsums, _ = fb.fused_unet_block_reference(
            x, g0, b0, w0, bias0, g1, b1, w1, bias1, 4, 4, 1e-5,
            up=True, skip_w=skw, skip_b=skb, emit_stats=True)
        assert out.shape == (B_, 2 * H, 2 * W_, O)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(out_p), np.asarray(ref_p),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(osums), np.asarray(rsums),
                                   rtol=2e-4, atol=5e-3)


class TestPairedLane:
    """Paired-lane layout ((W, C) bitcast to (W/2, 2C) — full 128-lane
    registers, K/N-doubled tap matmuls): interpret-mode parity of every
    paired res_mode plus gradient parity through the paired phase-A
    backward. Real-device numerics are certified by tools/check_pair.py."""

    def _force(self, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc
        pl = pytest.importorskip("jax.experimental.pallas")

        orig_call = pl.pallas_call
        wrapped = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
        monkeypatch.setattr(pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn.pl, "pallas_call", wrapped)
        monkeypatch.setattr(fnc.pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn, "pallas_enabled", lambda: True)
        monkeypatch.setattr(fnc, "pallas_enabled", lambda: True)
        monkeypatch.setenv("MCEDM_PAIR", "1")
        monkeypatch.setenv("MCEDM_BWD_KERNEL", "1")

    def _inputs(self, B=2, H=32, W=16, C=32, O=32, seed=31):
        rs = np.random.RandomState(seed)
        x = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B, C).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B, C).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, C, O).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        return x, gamma, beta, w, bias

    def test_pair_weights_identity(self):
        """The paired tap matrix reproduces the conv exactly (pure math)."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        rs = np.random.RandomState(3)
        B_, H, W_, C_, O = 2, 8, 16, 4, 6
        x = jnp.asarray(rs.randn(B_, H, W_, C_).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, C_, O).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wp = fnc._pair_weights(w)
        xp = jnp.pad(x.reshape(B_, H, W_ // 2, 2 * C_),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        got = sum(
            jnp.einsum("bhwc,co->bhwo",
                       jax.lax.dynamic_slice(
                           xp, (0, dr, dj, 0),
                           (B_, H, W_ // 2, 2 * C_)), wp[dr, dj])
            for dr in range(3) for dj in range(3))
        np.testing.assert_allclose(
            np.asarray(got.reshape(B_, H, W_, O)), np.asarray(ref),
            rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode", ["none", "identity", "proj",
                                      "identity_up"])
    def test_paired_forward_interpret(self, mode, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        self._force(monkeypatch)
        x, gamma, beta, w, bias = self._inputs()
        B_, H, W_, C_ = x.shape
        O = w.shape[-1]
        rs = np.random.RandomState(17)
        kwargs, ref_kwargs = {}, {}
        if mode == "identity":
            res = jnp.asarray(rs.randn(B_, H, W_, O).astype(np.float32))
            kwargs = dict(residual=res)
        elif mode == "identity_up":
            res = jnp.asarray(
                rs.randn(B_, H // 2, W_ // 2, O).astype(np.float32))
            kwargs = dict(residual=res, res_up=True)
        elif mode == "proj":
            res = jnp.asarray(rs.randn(B_, H, W_, 24).astype(np.float32))
            skw = jnp.asarray(0.1 * rs.randn(24, O).astype(np.float32))
            skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
            kwargs = dict(residual=res, skip_w=skw, skip_b=skb)
        assert fnc._use_pair(x, False, mode)
        got, osums, osumsq = fnc.fused_gn_silu_conv_block(
            x, gamma, beta, w, bias, G, emit_stats=True, **kwargs)
        res_ref = kwargs.get("residual")
        if mode == "identity_up":
            res_ref = jnp.repeat(jnp.repeat(res_ref, 2, axis=1), 2, axis=2)
        ref = fnc.gn_silu_conv_block_reference(
            x, gamma, beta, w, bias, G, residual=res_ref,
            skip_w=kwargs.get("skip_w"), skip_b=kwargs.get("skip_b"))
        rsums, rsumsq = fnc._out_stats_reference(ref)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(osums), np.asarray(rsums),
                                   rtol=2e-4, atol=5e-3)
        np.testing.assert_allclose(np.asarray(osumsq), np.asarray(rsumsq),
                                   rtol=2e-4, atol=5e-3)

    def test_paired_chained_stats_interpret(self, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        self._force(monkeypatch)
        x, gamma, beta, w, bias = self._inputs()
        B_, H, W_, C_ = x.shape
        x32 = x.reshape(B_, H * W_, C_)
        stats = (jnp.sum(x32, 1), jnp.sum(x32 * x32, 1))
        got = fnc.fused_gn_silu_conv_block(x, gamma, beta, w, bias, G,
                                           stats=stats)
        ref = fnc.gn_silu_conv_reference(x, gamma, beta, w, bias, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.parametrize("mode", ["plain", "proj"])
    def test_paired_backward_interpret(self, mode, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        self._force(monkeypatch)
        x, gamma, beta, w, bias = self._inputs()
        B_, H, W_, C_ = x.shape
        O = w.shape[-1]
        rs = np.random.RandomState(19)
        cot = jnp.asarray(rs.randn(B_, H, W_, O).astype(np.float32))
        if mode == "plain":
            args = (x, gamma, beta, w, bias)

            def f_fused(*a):
                return jnp.sum(fnc.fused_gn_silu_conv(*a, G) * cot)

            def f_ref(*a):
                return jnp.sum(fnc.gn_silu_conv_reference(*a, G) * cot)
        else:
            res = jnp.asarray(rs.randn(B_, H, W_, 24).astype(np.float32))
            skw = jnp.asarray(0.1 * rs.randn(24, O).astype(np.float32))
            skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
            args = (x, gamma, beta, w, bias, res, skw, skb)

            def f_fused(*a):
                return jnp.sum(fnc.fused_gn_silu_conv_block(
                    a[0], a[1], a[2], a[3], a[4], G, residual=a[5],
                    skip_w=a[6], skip_b=a[7]) * cot)

            def f_ref(*a):
                return jnp.sum(fnc.gn_silu_conv_block_reference(
                    a[0], a[1], a[2], a[3], a[4], G, residual=a[5],
                    skip_w=a[6], skip_b=a[7]) * cot)

        idx = tuple(range(len(args)))
        g1 = jax.grad(f_fused, argnums=idx)(*args)
        g2 = jax.grad(f_ref, argnums=idx)(*args)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-4)

    def test_paired_group_norm_silu_interpret(self, monkeypatch):
        """Paired standalone GroupNorm+SiLU kernel: forward + custom VJP."""
        import m_cedm_tpu.pallas.fused_norm as fn

        self._force(monkeypatch)
        rs = np.random.RandomState(23)
        x = jnp.asarray(rs.randn(B, N, C).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B, C).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B, C).astype(np.float32))
        assert fn._pair_tile(N) is not None
        got = fn.fused_group_norm_silu(x, gamma, beta, G)
        ref = fn.group_norm_silu_reference(x, gamma, beta, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=1e-4)

        def f_fused(x, g, b):
            return jnp.sum(jnp.sin(fn.fused_group_norm_silu(x, g, b, G)))

        def f_ref(x, g, b):
            return jnp.sum(jnp.sin(fn.group_norm_silu_reference(x, g, b, G)))

        g1 = jax.grad(f_fused, argnums=(0, 1, 2))(x, gamma, beta)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(x, gamma, beta)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-5)

    def test_paired_dual_interpret(self, monkeypatch):
        """Paired dual-input kernel (unmaterialized decoder concat + proj2
        residual + emitted stats) vs the concat-then-reference composition."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        self._force(monkeypatch)
        rs = np.random.RandomState(29)
        B_, H, W_, C1, C2, O = 2, 32, 16, 16, 16, 32
        x1 = jnp.asarray(rs.randn(B_, H, W_, C1).astype(np.float32))
        x2 = jnp.asarray(rs.randn(B_, H, W_, C2).astype(np.float32))
        C_ = C1 + C2
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, C_, O).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        r1 = jnp.asarray(rs.randn(B_, H, W_, C1).astype(np.float32))
        r2 = jnp.asarray(rs.randn(B_, H, W_, C2).astype(np.float32))
        skw = jnp.asarray(0.1 * rs.randn(C_, O).astype(np.float32))
        skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        assert fnc._use_pair_dual(x1, x2, G)
        got, osums, osumsq = fnc.fused_gn_silu_conv_block(
            x1, gamma, beta, w, bias, G, x2=x2, residual=r1, residual2=r2,
            skip_w=skw, skip_b=skb, emit_stats=True)
        ref = fnc.gn_silu_conv_block_reference(
            jnp.concatenate([x1, x2], -1), gamma, beta, w, bias, G,
            residual=jnp.concatenate([r1, r2], -1), skip_w=skw, skip_b=skb)
        rsums, rsumsq = fnc._out_stats_reference(ref)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(osums), np.asarray(rsums),
                                   rtol=2e-4, atol=5e-3)
        np.testing.assert_allclose(np.asarray(osumsq), np.asarray(rsumsq),
                                   rtol=2e-4, atol=5e-3)

    def test_paired_dual_chained_stats_interpret(self, monkeypatch):
        """Paired dual with CHAINED concat stats (= concat of halves' stats,
        the decoder's production path)."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        self._force(monkeypatch)
        rs = np.random.RandomState(37)
        B_, H, W_, C1, C2, O = 2, 32, 16, 16, 16, 32
        x1 = jnp.asarray(rs.randn(B_, H, W_, C1).astype(np.float32))
        x2 = jnp.asarray(rs.randn(B_, H, W_, C2).astype(np.float32))
        C_ = C1 + C2
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, C_, O).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        cat = jnp.concatenate([x1, x2], -1).reshape(B_, H * W_, C_)
        stats = (jnp.sum(cat, 1), jnp.sum(cat * cat, 1))
        got = fnc.fused_gn_silu_conv_block(x1, gamma, beta, w, bias, G,
                                           x2=x2, stats=stats)
        ref = fnc.gn_silu_conv_reference(jnp.concatenate([x1, x2], -1),
                                         gamma, beta, w, bias, G)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)


class TestPairedIO:
    """MCEDM_PAIRIO end-to-end paired threading: the full-net toggle must be
    bit-identical through the reference fallbacks on CPU, and the paired-IO
    primitives must match the reference composition with kernels forced in
    interpret mode."""

    def _force(self, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc
        pl = pytest.importorskip("jax.experimental.pallas")

        orig_call = pl.pallas_call
        wrapped = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
        monkeypatch.setattr(pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn.pl, "pallas_call", wrapped)
        monkeypatch.setattr(fnc.pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn, "pallas_enabled", lambda: True)
        monkeypatch.setattr(fnc, "pallas_enabled", lambda: True)
        monkeypatch.setenv("MCEDM_PAIR", "1")
        monkeypatch.setenv("MCEDM_BWD_KERNEL", "1")

    def test_net_toggle_bit_identical(self, monkeypatch):
        from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig

        cfg = AdmUNetConfig(in_channels=2, out_ch=2, ch=32, ch_mult=(1, 1),
                            num_res_blocks=1, attn_resolutions=(16,),
                            resolution=32)
        net = AdmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        t = jnp.asarray([1.5, 0.3])
        params = net.init(jax.random.PRNGKey(1), x, t)
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        params = jax.tree_util.tree_unflatten(
            treedef, [0.05 * jax.random.normal(k, l.shape, l.dtype)
                      for k, l in zip(keys, leaves)])

        # MCEDM_OUTPAIR reorders the out-conv accumulation (paired block
        # taps), so the strict bitwise arm pins it off; the tolerance arm
        # below covers the production default.
        monkeypatch.setenv("MCEDM_OUTPAIR", "0")
        monkeypatch.setenv("MCEDM_PAIRIO", "0")
        base = np.asarray(net.apply(params, x, t))
        g0 = jax.grad(lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(params)
        monkeypatch.setenv("MCEDM_PAIRIO", "1")
        got = np.asarray(net.apply(params, x, t))
        g1 = jax.grad(lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(params)
        np.testing.assert_array_equal(got, base)
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

        # production default: paired block-tap out conv (same math, 18
        # half-zero taps instead of 9 — accumulation order differs)
        monkeypatch.setenv("MCEDM_OUTPAIR", "1")
        got_op = np.asarray(net.apply(params, x, t))
        gop = jax.grad(lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(params)
        np.testing.assert_allclose(got_op, base, rtol=1e-5, atol=1e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(gop)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(b_ / scale, a / scale,
                                       rtol=2e-5, atol=2e-5)

    def test_qkv_split_bit_identical(self, monkeypatch):
        """MCEDM_QKV_SPLIT slices the one qkv param into three c-wide
        matmuls (kills the 192-lane split relayout); per-output-channel
        contractions are unchanged, so outputs and grads are bitwise
        equal to the single-matmul composition."""
        from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig

        cfg = AdmUNetConfig(in_channels=2, out_ch=2, ch=32, ch_mult=(1, 1),
                            num_res_blocks=1, attn_resolutions=(16,),
                            resolution=32)
        net = AdmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        t = jnp.asarray([1.5, 0.3])
        params = net.init(jax.random.PRNGKey(1), x, t)

        monkeypatch.setenv("MCEDM_QKV_SPLIT", "0")
        base = np.asarray(net.apply(params, x, t))
        g0 = jax.grad(lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(params)
        monkeypatch.setenv("MCEDM_QKV_SPLIT", "1")
        got = np.asarray(net.apply(params, x, t))
        g1 = jax.grad(lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(params)
        np.testing.assert_array_equal(got, base)
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    def test_paired_io_primitives_interpret(self, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        self._force(monkeypatch)
        rs = np.random.RandomState(0)
        B_, H, W_, C_, O = 2, 32, 16, 32, 32

        def arr(*s):
            return jnp.asarray(rs.randn(*s).astype(np.float32))

        x = arr(B_, H, W_, C_)
        gamma = 1 + 0.1 * arr(B_, C_)
        beta = 0.1 * arr(B_, C_)
        w = 0.1 * arr(3, 3, C_, O)
        bias = 0.1 * arr(O)
        xp = fnc.pair_array(x)
        zc = jnp.zeros((0,), jnp.float32)

        # plain / linear / up / norm
        want = fnc.gn_silu_conv_reference(x, gamma, beta, w, bias, G)
        got = fnc.fused_block_paired(xp, gamma, beta, w, bias, G)
        np.testing.assert_allclose(np.asarray(fnc.unpair_array(got)),
                                   np.asarray(want), rtol=2e-4, atol=2e-4)
        got = fnc.fused_block_paired(xp, None, None, w, bias, G, act=False)
        np.testing.assert_allclose(
            np.asarray(fnc.unpair_array(got)),
            np.asarray(fnc.conv3x3_same_reference(x, w, bias)),
            rtol=2e-4, atol=2e-4)
        got = fnc.fused_up_paired(x, gamma, beta, w, bias, G, 1e-5,
                                  (zc, zc), False)
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(fnc.pair_array(fnc.gn_silu_up_conv_reference(
                x, gamma, beta, w, bias, G))), rtol=2e-4, atol=2e-4)
        got = fnc.fused_gn_silu_paired(xp, gamma, beta, zc, zc, G, 1e-5,
                                       None, False)
        from m_cedm_tpu.pallas.fused_norm import group_norm_silu_reference
        want = group_norm_silu_reference(
            x.reshape(B_, H * W_, C_), gamma, beta, G).reshape(x.shape)
        np.testing.assert_allclose(np.asarray(fnc.unpair_array(got)),
                                   np.asarray(want), rtol=2e-4, atol=2e-4)

        # dual-order proj + gradients through the paired backward
        C1 = C2 = C_ // 2
        xcat_p = jnp.concatenate([fnc.pair_array(x[..., :C1]),
                                  fnc.pair_array(x[..., C1:])], -1)
        skw = 0.1 * arr(C_, O)
        skb = 0.1 * arr(O)
        cot = arr(B_, H, W_ // 2, 2 * O)

        def f_k(xcat_p, gamma, beta, w, bias, skw, skb):
            return jnp.sum(fnc.fused_block_paired(
                xcat_p, gamma, beta, w, bias, G, splits=(C1, C2),
                residual=xcat_p, res_splits=(C1, C2), skip_w=skw,
                skip_b=skb) * cot)

        def f_r(xcat_p, gamma, beta, w, bias, skw, skb):
            xx = fnc.unpair_array(xcat_p, (C1, C2))
            y = fnc.gn_silu_conv_block_reference(
                xx, gamma, beta, w, bias, G, residual=xx, skip_w=skw,
                skip_b=skb)
            return jnp.sum(fnc.pair_array(y) * cot)

        v_k = f_k(xcat_p, gamma, beta, w, bias, skw, skb)
        v_r = f_r(xcat_p, gamma, beta, w, bias, skw, skb)
        np.testing.assert_allclose(float(v_k), float(v_r), rtol=1e-4)
        gk = jax.grad(f_k, argnums=tuple(range(7)))(xcat_p, gamma, beta, w,
                                                    bias, skw, skb)
        gr = jax.grad(f_r, argnums=tuple(range(7)))(xcat_p, gamma, beta, w,
                                                    bias, skw, skb)
        for nm, a, b_ in zip(("dx", "dgamma", "dbeta", "dw", "dbias",
                              "dskw", "dskb"), gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-4, err_msg=nm)

    def test_paired_pool_and_vjp(self):
        from m_cedm_tpu.models.layers import (downsample2x_mean,
                                              downsample2x_mean_paired)
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        rs = np.random.RandomState(3)
        x = jnp.asarray(rs.randn(2, 16, 16, 8).astype(np.float32))
        want = downsample2x_mean(x)
        got = fnc.unpair_array(downsample2x_mean_paired(fnc.pair_array(x)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-6)
        cot = jnp.asarray(rs.randn(2, 8, 4, 16).astype(np.float32))
        g1 = jax.grad(lambda x: jnp.sum(
            downsample2x_mean_paired(fnc.pair_array(x)) * cot))(x)
        g2 = jax.grad(lambda x: jnp.sum(
            fnc.pair_array(downsample2x_mean(x)) * cot))(x)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=1e-6, atol=1e-6)

    def test_paired_train_backwards_interpret(self, monkeypatch):
        """The pairio-train hand-written backwards (paired 4D norm, linear
        conv phase A, up kernel, emitting block) vs reference autodiff."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc
        from m_cedm_tpu.pallas.fused_norm import group_norm_silu_reference

        self._force(monkeypatch)
        rs = np.random.RandomState(5)
        B_, H, W_, C_, O = 2, 32, 16, 32, 32

        def arr(*s):
            return jnp.asarray(rs.randn(*s).astype(np.float32))

        x = arr(B_, H, W_, C_)
        gamma = 1 + 0.1 * arr(B_, C_)
        beta = 0.1 * arr(B_, C_)
        w = 0.1 * arr(3, 3, C_, O)
        bias = 0.1 * arr(O)
        xp = fnc.pair_array(x)
        zc = jnp.zeros((0,), jnp.float32)
        cot = arr(B_, H, W_ // 2, 2 * C_)

        def cmp_grads(f_k, f_r, args, names, tol=2e-3):
            idx = tuple(range(len(args)))
            gk = jax.grad(f_k, argnums=idx)(*args)
            gr = jax.grad(f_r, argnums=idx)(*args)
            for nm, a, b_ in zip(names, gk, gr):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                           rtol=tol, atol=2e-4, err_msg=nm)

        # paired 4D norm backward (saved-stats kernel path)
        cmp_grads(
            lambda xp, g_, b_: jnp.sum(fnc.fused_gn_silu_paired(
                xp, g_, b_, zc, zc, G, 1e-5, None, False) * cot),
            lambda xp, g_, b_: jnp.sum(fnc.pair_array(
                group_norm_silu_reference(
                    fnc.unpair_array(xp).reshape(B_, H * W_, C_), g_, b_,
                    G).reshape(B_, H, W_, C_)) * cot),
            (xp, gamma, beta), ("dx", "dgamma", "dbeta"))

        # linear conv backward (act=False phase A)
        cot_o = arr(B_, H, W_ // 2, 2 * O)
        cmp_grads(
            lambda xp, w_, b_: jnp.sum(fnc.fused_block_paired(
                xp, None, None, w_, b_, G, act=False) * cot_o),
            lambda xp, w_, b_: jnp.sum(fnc.pair_array(
                fnc.conv3x3_same_reference(fnc.unpair_array(xp), w_, b_))
                * cot_o),
            (xp, w, bias), ("dx", "dw", "dbias"))

        # emitting block backward (kernel path; stats outputs unconsumed)
        cmp_grads(
            lambda xp, g_, b_, w_, bi: jnp.sum(fnc.fused_block_paired(
                xp, g_, b_, w_, bi, G, emit_stats=True)[0] * cot_o),
            lambda xp, g_, b_, w_, bi: jnp.sum(fnc.pair_array(
                fnc.gn_silu_conv_reference(fnc.unpair_array(xp), g_, b_,
                                           w_, bi, G)) * cot_o),
            (xp, gamma, beta, w, bias),
            ("dx", "dgamma", "dbeta", "dw", "dbias"))

        # up-kernel backward (hand-written phase A + layout-free folds)
        cot_up = arr(B_, 2 * H, W_, 2 * O)
        cmp_grads(
            lambda x, g_, b_, w_, bi: jnp.sum(fnc.fused_up_paired(
                x, g_, b_, w_, bi, G, 1e-5, (zc, zc), False) * cot_up),
            lambda x, g_, b_, w_, bi: jnp.sum(fnc.pair_array(
                fnc.gn_silu_up_conv_reference(x, g_, b_, w_, bi, G))
                * cot_up),
            (x, gamma, beta, w, bias),
            ("dx", "dgamma", "dbeta", "dw", "dbias"))

    def test_concats_aligned_gate(self):
        """The pairio gate must reject configs whose decoder concats have
        GroupNorm groups straddling the concat boundary (the sliced
        block-diagonal group matrix would silently compute wrong stats)."""
        from m_cedm_tpu.models.adm_unet import (AdmUNetConfig,
                                                _pairio_concats_aligned)

        ok = AdmUNetConfig(in_channels=2, out_ch=2, ch=64,
                           ch_mult=(1, 1, 1), num_res_blocks=2,
                           attn_resolutions=(16,), resolution=128)
        assert _pairio_concats_aligned(ok)
        ok2 = AdmUNetConfig(in_channels=2, out_ch=2, ch=32, ch_mult=(1, 2),
                            num_res_blocks=1, attn_resolutions=(16,),
                            resolution=32)
        assert _pairio_concats_aligned(ok2)
        # ch=64 ch_mult (1,2): the dec level-1 concat of a 128-ch stream
        # with a 64-ch skip -> 192 channels, 32 groups, per=6, 128 % 6 != 0
        bad = AdmUNetConfig(in_channels=2, out_ch=2, ch=64, ch_mult=(1, 2),
                            num_res_blocks=1, attn_resolutions=(16,),
                            resolution=32)
        assert not _pairio_concats_aligned(bad)

    def test_misaligned_config_falls_back_bit_identical(self, monkeypatch):
        """A group-straddling config must produce identical outputs with
        MCEDM_PAIRIO on and off (the gate routes it off the paired path)."""
        from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig

        cfg = AdmUNetConfig(in_channels=2, out_ch=2, ch=64, ch_mult=(1, 2),
                            num_res_blocks=1, attn_resolutions=(8,),
                            resolution=32)
        net = AdmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 2))
        t = jnp.asarray([1.5])
        params = net.init(jax.random.PRNGKey(1), x, t)
        monkeypatch.setenv("MCEDM_PAIRIO", "0")
        base = np.asarray(net.apply(params, x, t))
        monkeypatch.setenv("MCEDM_PAIRIO", "1")
        got = np.asarray(net.apply(params, x, t))
        np.testing.assert_array_equal(got, base)


class TestDdpmPaired:
    """Paired DDPM ResnetBlock (MCEDM_DDPM_PAIR): the temb-add folds into
    adjusted stats + effective beta — valid ONLY on the kernel path (the
    reference fallback recomputes stats from h), so these tests force the
    kernels in interpret mode."""

    def _force(self, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc
        pl = pytest.importorskip("jax.experimental.pallas")

        orig_call = pl.pallas_call
        wrapped = lambda *a, **k: orig_call(*a, **{**k, "interpret": True})
        monkeypatch.setattr(pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn.pl, "pallas_call", wrapped)
        monkeypatch.setattr(fnc.pl, "pallas_call", wrapped)
        monkeypatch.setattr(fn, "pallas_enabled", lambda: True)
        monkeypatch.setattr(fnc, "pallas_enabled", lambda: True)
        monkeypatch.setenv("MCEDM_PAIR", "1")

    @pytest.mark.parametrize("in_ch,out_ch", [(64, 64), (32, 64)])
    def test_block_toggle_matches(self, in_ch, out_ch, monkeypatch):
        from m_cedm_tpu.models.ddpm_unet import ResnetBlock

        self._force(monkeypatch)
        rs = np.random.RandomState(7)
        x = jnp.asarray(rs.randn(2, 16, 16, in_ch).astype(np.float32))
        temb = jnp.asarray(rs.randn(2, 128).astype(np.float32))
        blk = ResnetBlock(out_ch)
        params = blk.init(jax.random.PRNGKey(0), x, temb)
        leaves, td = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
        params = jax.tree_util.tree_unflatten(
            td, [0.2 * jax.random.normal(k, l.shape, l.dtype)
                 for k, l in zip(keys, leaves)])
        monkeypatch.setenv("MCEDM_DDPM_PAIR", "0")
        base = np.asarray(blk.apply(params, x, temb))
        monkeypatch.setenv("MCEDM_DDPM_PAIR", "1")
        got = np.asarray(blk.apply(params, x, temb))
        np.testing.assert_allclose(got, base, rtol=2e-5, atol=2e-5)

        # gradients through the paired path (reference fallbacks on CPU)
        def loss(p, flag):
            monkeypatch.setenv("MCEDM_DDPM_PAIR", flag)
            return jnp.sum(jnp.sin(blk.apply(p, x, temb)))

        g0 = jax.grad(lambda p: loss(p, "0"))(params)
        g1 = jax.grad(lambda p: loss(p, "1"))(params)
        for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                         jax.tree_util.tree_leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-4, atol=2e-5)

    def test_net_toggle_matches(self, monkeypatch):
        from m_cedm_tpu.models.ddpm_unet import DdpmUNet, DdpmUNetConfig

        self._force(monkeypatch)
        cfg = DdpmUNetConfig(in_channels=2, out_ch=2, ch=32, ch_mult=(1, 1),
                             num_res_blocks=1, attn_resolutions=(16,),
                             resolution=32)
        net = DdpmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        t = jnp.asarray([3, 7], jnp.int32)
        params = net.init(jax.random.PRNGKey(1), x, t)
        monkeypatch.setenv("MCEDM_DDPM_PAIR", "0")
        base = np.asarray(net.apply(params, x, t))
        monkeypatch.setenv("MCEDM_DDPM_PAIR", "1")
        got = np.asarray(net.apply(params, x, t))
        np.testing.assert_allclose(got, base, rtol=2e-5, atol=2e-5)

    def test_net_pairio_threading_matches(self, monkeypatch):
        """MCEDM_DDPM_PAIRIO end-to-end: paired skips, dual-order decoder
        concats, chained output stats, paired out head — outputs and
        grads match the pure-XLA composition (r5; 518.9 -> 341.8 ms
        same-session on the joint DDIM sampler)."""
        from m_cedm_tpu.models.ddpm_unet import DdpmUNet, DdpmUNetConfig

        self._force(monkeypatch)
        cfg = DdpmUNetConfig(in_channels=2, out_ch=2, ch=32, ch_mult=(1, 1),
                             num_res_blocks=1, attn_resolutions=(16,),
                             resolution=32)
        net = DdpmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
        t = jnp.asarray([3, 7], jnp.int32)
        params = net.init(jax.random.PRNGKey(1), x, t)
        leaves, td = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
        params = jax.tree_util.tree_unflatten(
            td, [0.05 * jax.random.normal(k, l.shape, l.dtype)
                 for k, l in zip(keys, leaves)])

        def run(pairio):
            monkeypatch.setenv("MCEDM_DDPM_PAIR", "1")
            monkeypatch.setenv("MCEDM_DDPM_PAIRIO", pairio)
            y = np.asarray(net.apply(params, x, t))
            g = jax.grad(
                lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(params)
            return y, g

        monkeypatch.setenv("MCEDM_DDPM_PAIRIO", "0")
        monkeypatch.setenv("MCEDM_DDPM_PAIR", "0")
        base = np.asarray(net.apply(params, x, t))
        gbase = jax.grad(
            lambda p: jnp.sum(jnp.sin(net.apply(p, x, t))))(params)
        got, ggot = run("1")
        np.testing.assert_allclose(got, base, rtol=2e-5, atol=2e-5)
        for a, b_ in zip(jax.tree_util.tree_leaves(gbase),
                         jax.tree_util.tree_leaves(ggot)):
            a, b_ = np.asarray(a), np.asarray(b_)
            scale = max(np.abs(a).max(), 1.0)
            np.testing.assert_allclose(b_ / scale, a / scale,
                                       rtol=2e-4, atol=2e-4)


class TestShiftedPair:
    """Shifted-pair tap layout (MCEDM_SHPAIR): 6 dense (2C, 2O) matmuls
    against a one-pixel-shifted strip replace the classic 9 half-zero
    paired taps (fused_norm_conv._pair_weights_shifted)."""

    def test_shifted_weights_identity(self):
        """Pure math: the two shifted tap blocks reproduce the conv."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        rs = np.random.RandomState(5)
        B_, H, W_, C_, O = 2, 8, 16, 4, 6
        x = jnp.asarray(rs.randn(B_, H, W_, C_).astype(np.float32))
        w = jnp.asarray(rs.randn(3, 3, C_, O).astype(np.float32))
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wp = fnc._pair_weights_shifted(w)  # (3, 2, 2C, 2O)
        # paired, W-padded by one PAIR on each side (pixel -2,-1 and W,W+1)
        xp = jnp.pad(x.reshape(B_, H, W_ // 2, 2 * C_),
                     ((0, 0), (1, 1), (1, 1), (0, 0)))
        # shifted strip: ysh col s = [xp[:, s, C:], xp[:, s+1, :C]]
        ysh = jnp.concatenate([xp[:, :, :-1, C_:], xp[:, :, 1:, :C_]],
                              axis=-1)
        got = sum(
            jnp.einsum("bhwc,co->bhwo",
                       jax.lax.dynamic_slice(
                           ysh, (0, dr, s, 0),
                           (B_, H, W_ // 2, 2 * C_)), wp[dr, s])
            for dr in range(3) for s in range(2))
        np.testing.assert_allclose(
            np.asarray(got.reshape(B_, H, W_, O)), np.asarray(ref),
            rtol=1e-4, atol=1e-4)

    @pytest.mark.parametrize("mode", ["none", "identity", "proj"])
    def test_shifted_forward_interpret(self, mode, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        TestPairedLane._force(self, monkeypatch)
        monkeypatch.setenv("MCEDM_SHPAIR", "1")
        x, gamma, beta, w, bias = TestPairedLane._inputs(self)
        B_, H, W_, C_ = x.shape
        O = w.shape[-1]
        rs = np.random.RandomState(17)
        kwargs = {}
        if mode == "identity":
            kwargs = dict(residual=jnp.asarray(
                rs.randn(B_, H, W_, O).astype(np.float32)))
        elif mode == "proj":
            kwargs = dict(
                residual=jnp.asarray(rs.randn(B_, H, W_, 24)
                                     .astype(np.float32)),
                skip_w=jnp.asarray(0.1 * rs.randn(24, O).astype(np.float32)),
                skip_b=jnp.asarray(0.1 * rs.randn(O).astype(np.float32)))
        assert fnc.shifted_pair_enabled()
        got, osums, osumsq = fnc.fused_gn_silu_conv_block(
            x, gamma, beta, w, bias, G, emit_stats=True, **kwargs)
        ref = fnc.gn_silu_conv_block_reference(
            x, gamma, beta, w, bias, G, residual=kwargs.get("residual"),
            skip_w=kwargs.get("skip_w"), skip_b=kwargs.get("skip_b"))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_shifted_gradients_match(self, monkeypatch):
        """Autodiff through the shifted forward must equal the classic
        paired path's gradients (the custom VJP backward is tap-layout
        independent)."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        TestPairedLane._force(self, monkeypatch)
        x, gamma, beta, w, bias = TestPairedLane._inputs(self, H=16)

        def loss(x_, g_, b_, w_, bi_):
            out = fnc.fused_gn_silu_conv(x_, g_, b_, w_, bi_, G)
            return jnp.sum(out * out)

        monkeypatch.setenv("MCEDM_SHPAIR", "1")
        g1 = jax.grad(loss, argnums=(0, 3))(x, gamma, beta, w, bias)
        monkeypatch.setenv("MCEDM_SHPAIR", "0")
        g2 = jax.grad(loss, argnums=(0, 3))(x, gamma, beta, w, bias)
        for a, b_ in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=1e-3, atol=1e-4)

    def test_shifted_dual_order_interpret(self, monkeypatch):
        """Shifted taps on a dual-order decoder-concat input (splits) match
        the reference, values and gradients."""
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        TestPairedLane._force(self, monkeypatch)
        monkeypatch.setenv("MCEDM_PAIRIO", "1")
        monkeypatch.setenv("MCEDM_SHPAIR", "1")
        x, gamma, beta, w, bias = TestPairedLane._inputs(self, H=16)
        B_, H, W_, C_ = x.shape
        O = w.shape[-1]
        rs = np.random.RandomState(23)
        C1 = C2 = C_ // 2
        xcat_p = jnp.concatenate([fnc.pair_array(x[..., :C1]),
                                  fnc.pair_array(x[..., C1:])], -1)
        skw = jnp.asarray(0.1 * rs.randn(C_, O).astype(np.float32))
        skb = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        cot = jnp.asarray(rs.randn(B_, H, W_ // 2, 2 * O).astype(np.float32))

        def f_k(xcat_p, w):
            return jnp.sum(fnc.fused_block_paired(
                xcat_p, gamma, beta, w, bias, G, splits=(C1, C2),
                residual=xcat_p, res_splits=(C1, C2), skip_w=skw,
                skip_b=skb) * cot)

        def f_r(xcat_p, w):
            xx = fnc.unpair_array(xcat_p, (C1, C2))
            y = fnc.gn_silu_conv_block_reference(
                xx, gamma, beta, w, bias, G, residual=xx, skip_w=skw,
                skip_b=skb)
            return jnp.sum(fnc.pair_array(y) * cot)

        np.testing.assert_allclose(float(f_k(xcat_p, w)),
                                   float(f_r(xcat_p, w)), rtol=1e-4)
        gk = jax.grad(f_k, argnums=(0, 1))(xcat_p, w)
        gr = jax.grad(f_r, argnums=(0, 1))(xcat_p, w)
        for nm, a, b_ in zip(("dx", "dw"), gk, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                       rtol=2e-3, atol=2e-4, err_msg=nm)


class TestUpDense:
    """Dense up-conv taps (MCEDM_UPDENSE): fold the paired W-repeat into
    combined (C, 2O) weights — half the executed MXU work of the classic
    duplicated-lane 9x(2C, 2O) form (fused_norm_conv._up_pair_weights_dense)."""

    def _run(self, monkeypatch, gate):
        pl = pytest.importorskip("jax.experimental.pallas")
        import m_cedm_tpu.pallas.fused_norm as fn
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        monkeypatch.setenv("MCEDM_UPDENSE", gate)
        rs = np.random.RandomState(11)
        B_, H, W_, C_, O = 2, 16, 16, 32, 32
        x = jnp.asarray(rs.randn(B_, H, W_, C_).astype(np.float32))
        gamma = jnp.asarray(1 + 0.1 * rs.randn(B_, C_).astype(np.float32))
        beta = jnp.asarray(0.1 * rs.randn(B_, C_).astype(np.float32))
        w = jnp.asarray(0.1 * rs.randn(3, 3, C_, O).astype(np.float32))
        bias = jnp.asarray(0.1 * rs.randn(O).astype(np.float32))
        zc = jnp.zeros((0,), jnp.float32)
        orig_call = pl.pallas_call
        try:
            pl.pallas_call = lambda *a, **k: orig_call(
                *a, **{**k, "interpret": True})
            fn.pl.pallas_call = pl.pallas_call
            fnc.pl.pallas_call = pl.pallas_call
            out = fnc.fused_up_paired(x, gamma, beta, w, bias, 8, 1e-5,
                                      (zc, zc), False)
            grads = jax.grad(lambda x_, w_: jnp.sum(
                fnc.fused_up_paired(x_, gamma, beta, w_, bias, 8, 1e-5,
                                    (zc, zc), False) ** 2),
                argnums=(0, 1))(x, w)
        finally:
            pl.pallas_call = orig_call
            fn.pl.pallas_call = orig_call
            fnc.pl.pallas_call = orig_call
        return np.asarray(out), [np.asarray(g) for g in grads]

    def test_dense_matches_classic_and_reference(self, monkeypatch):
        import m_cedm_tpu.pallas.fused_norm_conv as fnc

        out_d, g_d = self._run(monkeypatch, "1")
        out_c, g_c = self._run(monkeypatch, "0")
        np.testing.assert_allclose(out_d, out_c, rtol=1e-5, atol=1e-5)
        for a, b_ in zip(g_d, g_c):
            np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-5)
