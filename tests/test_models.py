"""Shape / jit / gradient tests for the U-Net backbones, plus torch
cross-checks of the layer primitives (GroupNorm, conv padding, resampling,
fp32 attention)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from m_cedm_tpu.config import DotDict, to_dotdict
from m_cedm_tpu.models import build_backbone
from m_cedm_tpu.models.adm_unet import AdmUNet, AdmUNetConfig
from m_cedm_tpu.models.ddpm_unet import DdpmUNet, DdpmUNetConfig
from m_cedm_tpu.models.layers import (
    downsample2x_mean,
    fp32_softmax_attention,
    upsample2x_nearest,
)

RES = 16


def adm_cfg(**kw):
    base = dict(in_channels=2, out_ch=2, ch=32, ch_mult=(1, 1), num_res_blocks=1,
                attn_resolutions=(8,), resolution=RES)
    base.update(kw)
    return AdmUNetConfig(**base)


def ddpm_cfg(**kw):
    base = dict(in_channels=2, out_ch=2, ch=32, ch_mult=(1, 1), num_res_blocks=1,
                attn_resolutions=(8,), resolution=RES)
    base.update(kw)
    return DdpmUNetConfig(**base)


class TestLayerPrimitives:
    def test_upsample_matches_torch_conv_transpose(self):
        """For resample_filter=[1,1], EDM's conv_transpose(f*4, stride 2) is
        exactly nearest-neighbour upsampling."""
        x = torch.randn(2, 3, 8, 8)
        f = torch.tensor([[1.0, 1.0]])
        f2 = (f.t() @ f).unsqueeze(0).unsqueeze(0) / 4.0  # ger / sum^2
        ref = torch.nn.functional.conv_transpose2d(
            x, (f2 * 4).tile(3, 1, 1, 1), groups=3, stride=2, padding=0)
        got = upsample2x_nearest(jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)

    def test_downsample_matches_torch_depthwise_conv(self):
        x = torch.randn(2, 3, 8, 8)
        f = torch.tensor([[1.0, 1.0]])
        f2 = (f.t() @ f).unsqueeze(0).unsqueeze(0) / 4.0
        ref = torch.nn.functional.conv2d(x, f2.tile(3, 1, 1, 1), groups=3, stride=2)
        got = downsample2x_mean(jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-6)

    def test_fp32_attention_matches_torch(self):
        torch.manual_seed(0)
        q = torch.randn(4, 10, 16)
        k = torch.randn(4, 10, 16)
        v = torch.randn(4, 10, 16)
        scale = 1 / np.sqrt(16)
        w = torch.softmax(torch.einsum("nqd,nkd->nqk", q, k * scale), dim=-1)
        ref = torch.einsum("nqk,nkd->nqd", w, v)
        got = fp32_softmax_attention(jnp.asarray(q.numpy()), jnp.asarray(k.numpy()),
                                     jnp.asarray(v.numpy()))
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)

    def test_group_norm_matches_torch(self):
        from m_cedm_tpu.models.layers import adm_group_norm
        x = torch.randn(2, 32, 8, 8)
        ref = torch.nn.functional.group_norm(x, num_groups=8, eps=1e-5)
        gn = adm_group_norm(32)
        # ADM: groups = min(32, 32 // 4) = 8
        params = gn.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 32)))
        got = gn.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)

    def test_conv_same_padding_matches_torch(self):
        from m_cedm_tpu.models.layers import TorchConv2d
        x = torch.randn(1, 3, 8, 8)
        conv = TorchConv2d(5, kernel=3)
        params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        kernel = np.asarray(params["params"]["kernel"])  # (kh, kw, in, out)
        bias = np.asarray(params["params"]["bias"])
        ref = torch.nn.functional.conv2d(
            x, torch.tensor(kernel).permute(3, 2, 0, 1), torch.tensor(bias), padding=1)
        got = conv.apply(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()))
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)

    def test_ddpm_downsample_asymmetric_padding_matches_torch(self):
        """The reference pads (0,1,0,1) then convs stride 2 valid."""
        from m_cedm_tpu.models.ddpm_unet import Downsample
        x = torch.randn(1, 4, 8, 8)
        ds = Downsample(with_conv=True)
        xj = jnp.asarray(x.permute(0, 2, 3, 1).numpy())
        params = ds.init(jax.random.PRNGKey(0), xj)
        kernel = np.asarray(params["params"]["conv"]["kernel"])
        bias = np.asarray(params["params"]["conv"]["bias"])
        xp = torch.nn.functional.pad(x, (0, 1, 0, 1))
        ref = torch.nn.functional.conv2d(
            xp, torch.tensor(kernel).permute(3, 2, 0, 1), torch.tensor(bias), stride=2)
        got = ds.apply(params, xj)
        assert got.shape == (1, 4, 4, 4)
        np.testing.assert_allclose(
            np.asarray(got), ref.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5)


class TestAdmUNet:
    def test_forward_shapes(self):
        cfg = adm_cfg(cond_channels=2, cat_cond=True)
        model = AdmUNet(cfg)
        x = jnp.zeros((2, RES, RES, 2))
        cond = jnp.zeros((2, RES, RES, 2))
        noise = jnp.zeros((2,)) + 0.5
        params = model.init(jax.random.PRNGKey(0), x, noise, cond)
        y = model.apply(params, x, noise, cond)
        assert y.shape == (2, RES, RES, 2)

    def test_zero_init_output_is_zero(self):
        """out_conv is zero-initialized, so the raw net output must be 0."""
        cfg = adm_cfg()
        model = AdmUNet(cfg)
        x = jnp.ones((1, RES, RES, 2))
        params = model.init(jax.random.PRNGKey(1), x, jnp.ones((1,)))
        y = model.apply(params, x, jnp.ones((1,)))
        np.testing.assert_allclose(np.asarray(y), 0.0, atol=1e-7)

    def test_jit_and_grad(self):
        cfg = adm_cfg(cond_channels=2, cat_cond=True)
        model = AdmUNet(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, RES, RES, 2))
        cond = jnp.zeros((2, RES, RES, 2))
        noise = jnp.full((2,), 0.5)
        params = model.init(jax.random.PRNGKey(0), x, noise, cond)

        @jax.jit
        def loss_fn(p):
            return jnp.mean(model.apply(p, x, noise, cond) ** 2)

        g = jax.grad(loss_fn)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(l))) for l in leaves)

    def test_self_cond_and_dx(self):
        cfg = adm_cfg(self_cond=True, dx_cond=True, cat_dx=True)
        model = AdmUNet(cfg)
        x = jnp.zeros((1, RES, RES, 2))
        params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)))
        y = model.apply(params, x, jnp.ones((1,)), x_self_cond=x, dx=x)
        assert y.shape == (1, RES, RES, 2)

    def test_separate_cond_encoder(self):
        cfg = adm_cfg(cond_channels=2, cat_cond=False)
        model = AdmUNet(cfg)
        x = jnp.zeros((1, RES, RES, 2))
        cond = jnp.ones((1, RES, RES, 2))
        params = model.init(jax.random.PRNGKey(0), x, jnp.ones((1,)), cond)
        assert "cond_enc" in params["params"]
        assert "combine_enc" in params["params"]


class TestDdpmUNet:
    def test_forward_shapes(self):
        cfg = ddpm_cfg()
        model = DdpmUNet(cfg)
        x = jnp.zeros((2, RES, RES, 2))
        t = jnp.array([0.0, 999.0])
        params = model.init(jax.random.PRNGKey(0), x, t)
        y = model.apply(params, x, t)
        assert y.shape == (2, RES, RES, 2)

    def test_self_cond(self):
        cfg = ddpm_cfg(self_cond=True)
        model = DdpmUNet(cfg)
        x = jnp.zeros((1, RES, RES, 2))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
        y = model.apply(params, x, jnp.zeros((1,)), x_self_cond=x)
        assert y.shape == (1, RES, RES, 2)

    def test_cond_cat(self):
        cfg = ddpm_cfg(cond_channels=2, cat_cond=True)
        model = DdpmUNet(cfg)
        x = jnp.zeros((1, RES, RES, 2))
        cond = jnp.zeros((1, RES, RES, 2))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)), cond)
        y = model.apply(params, x, jnp.zeros((1,)), cond)
        assert y.shape == (1, RES, RES, 2)

    def test_bayesian_logvar_param(self):
        cfg = ddpm_cfg(bayesian=True, num_timesteps=100)
        model = DdpmUNet(cfg)
        x = jnp.zeros((1, RES, RES, 2))
        params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,)))
        assert params["params"]["logvar"].shape == (100,)


class TestBuildBackbone:
    def test_name_routing(self):
        hp = to_dotdict({
            "name": "adm_edm_mcedm",
            "model": {"in_channels": 2, "out_ch": 2, "ch": 32, "ch_mult": [1, 1],
                      "num_res_blocks": 1, "attn_resolutions": [8], "resolution": 16,
                      "cond_channels": 2, "cat_cond": True},
        })
        model, cfg = build_backbone(hp)
        assert isinstance(model, AdmUNet)
        hp["name"] = "ddim"
        hp["model"]["type"] = "simple"
        hp["model"]["resamp_with_conv"] = True
        model, cfg = build_backbone(hp)
        assert isinstance(model, DdpmUNet)


class TestRemat:
    def test_remat_matches_plain(self):
        """Rematerialized blocks must produce identical values and grads."""
        cfg_plain = adm_cfg()
        cfg_remat = adm_cfg(remat=True)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, RES, RES, 2))
        noise = jnp.full((2,), 0.7)
        m1, m2 = AdmUNet(cfg_plain), AdmUNet(cfg_remat)
        params = m1.init(jax.random.PRNGKey(1), x, noise)

        def loss(m):
            return lambda p: jnp.mean(m.apply(p, x, noise) ** 2)

        v1, g1 = jax.value_and_grad(loss(m1))(params)
        v2, g2 = jax.value_and_grad(loss(m2))(params)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)
