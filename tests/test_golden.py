"""Whole-network golden parity: port the reference's torch weights into the
flax pytrees and assert forward-output deltas <= 1e-3 on fixed inputs.

The reference modules are imported from /root/reference (read-only) and
executed in place — none of their code lives in this repo. pytorch_lightning
is not installed in the image, so a minimal LightningModule stub is provided
for the modules that subclass it.

Targets (SURVEY.md §7 step 11):
  DhariwalUNet   adm_blocks.py:203-404   <-> models/adm_unet.py
  Model (DDPM)   ddim_blocks.py:222-470  <-> models/ddpm_unet.py
  SpectralConv2d fno_2d.py:16-55         <-> models/fno.py
  FnoState2d     fno_state_2d.py:17-118  <-> models/fno.py
"""
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE = "/root/reference"


# ---------------------------------------------------------------------------
# reference import scaffolding
# ---------------------------------------------------------------------------

class Dot(dict):
    """Attribute dict raising AttributeError on misses (hasattr-compatible,
    like the OmegaConf objects the reference receives from hydra)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    __setattr__ = dict.__setitem__

    @classmethod
    def wrap(cls, o):
        if isinstance(o, dict):
            return cls({k: cls.wrap(v) for k, v in o.items()})
        if isinstance(o, list):
            return [cls.wrap(v) for v in o]
        return o


@pytest.fixture(scope="module")
def reference():
    if "pytorch_lightning" not in sys.modules:
        import torch.nn as nn

        class LightningModule(nn.Module):
            def save_hyperparameters(self):
                pass

            def log(self, *a, **k):
                pass

        pl = types.ModuleType("pytorch_lightning")
        pl.LightningModule = LightningModule
        sys.modules["pytorch_lightning"] = pl
    if REFERENCE not in sys.path:
        sys.path.insert(0, REFERENCE)
    yield REFERENCE


# ---------------------------------------------------------------------------
# weight-porting helpers
# ---------------------------------------------------------------------------

def t2n(t):
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def conv_w(t):
    """torch OIHW -> flax HWIO."""
    return t2n(t).transpose(2, 3, 1, 0)


def linear_w(t):
    """torch (out, in) -> flax (in, out)."""
    return t2n(t).T


def set_leaf(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node[p]
    old = node[path[-1]]
    assert old.shape == value.shape, (path, old.shape, value.shape)
    node[path[-1]] = jnp.asarray(value)


def _deep_dict(d):
    if isinstance(d, dict) or hasattr(d, "items"):
        return {k: _deep_dict(v) for k, v in d.items()}
    return d


def qkv_permutation(c, channels_per_head=64):
    """Output-channel permutation torch->flax for the ADM qkv conv.

    torch (adm_blocks.py:176-177): (B, 3C, H, W).reshape(B*nh, c_h, 3, HW)
      => torch channel index = head*(c_h*3) + chan*3 + qkv
    flax (models/adm_unet.py): reshape(b, hw, 3, nh, c_h)
      => flax channel index  = qkv*(nh*c_h) + head*c_h + chan
    Returns perm with new_w[f] = old_w[perm[f]].
    """
    nh = max(c // channels_per_head, 1)
    c_h = c // nh
    perm = np.zeros(3 * c, np.int64)
    for j in range(3):
        for h in range(nh):
            for ch in range(c_h):
                perm[j * nh * c_h + h * c_h + ch] = h * c_h * 3 + ch * 3 + j
    return perm


# ---------------------------------------------------------------------------
# DhariwalUNet (ADM)
# ---------------------------------------------------------------------------

ADM_SUB = {"norm0": "norm0", "norm1": "norm1", "norm2": "GroupNorm_0",
           "conv0": "conv0", "conv1": "conv1", "skip": "skip",
           "affine": "affine", "qkv": "qkv", "proj": "proj"}


def port_adm(state_dict, params):
    tree = _deep_dict(params)
    ported = set()
    for key, tval in state_dict.items():
        parts = key.split(".")
        if parts[-1] == "resample_filter":
            continue  # constant [1,1] filter: realized as exact resize ops
        if parts[0] in ("enc", "dec"):
            if parts[1].endswith("_conv"):  # enc.{R}x{R}_conv -> conv_in
                path = ("conv_in",)
                sub = None
            else:
                path = (f"{parts[0]}_{parts[1]}",)
                sub = ADM_SUB[parts[2]]
        elif parts[0] in ("map_layer0", "map_layer1", "out_norm", "out_conv"):
            path = (parts[0],)
            sub = None
        elif parts[0] in ("cond_enc", "dx_enc"):
            path = (parts[0],)
            sub = f"Conv2d_{int(parts[1]) // 2}"
        elif parts[0] == "combine_enc":
            path = ("combine_enc",)
            sub = None
        else:
            raise AssertionError(f"unmapped reference key {key}")
        kind = parts[-1]  # weight | bias
        val = tval
        if sub == "qkv":
            perm = qkv_permutation(val.shape[0] // 3)
            val = val[perm]
        is_norm = ("norm" in (sub or parts[0])) or sub == "GroupNorm_0"
        if kind == "weight":
            if val.dim() == 4:
                arr, leaf = conv_w(val), "kernel"
            elif val.dim() == 2:
                arr, leaf = linear_w(val), "kernel"
            else:
                arr, leaf = t2n(val), ("scale" if is_norm else "kernel")
        else:
            arr, leaf = t2n(val), "bias"
        full = ("params",) + path + ((sub,) if sub else ()) + (leaf,)
        set_leaf(tree, full, arr)
        ported.add(full)
    # every flax leaf must have been overwritten
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    all_paths = {tuple(p.key for p in path) for path, _ in flat}
    missing = all_paths - ported
    assert not missing, f"flax leaves not ported: {sorted(missing)}"
    return tree


class TestAdmGolden:
    @pytest.fixture(scope="class")
    def pair(self, reference):
        import yaml
        from models.adm_blocks import DhariwalUNet

        with open(f"{REFERENCE}/configs/model/adm_edm_mcedm_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        hp_t = Dot.wrap(cfg["hparams"])
        hp_t.model.resolution = 32
        hp_t.model.attn_resolutions = [8]
        torch.manual_seed(0)
        tnet = DhariwalUNet(hp_t).eval()

        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.models import build_backbone

        hp_j = to_dotdict(cfg["hparams"])
        hp_j["model"]["resolution"] = 32
        hp_j["model"]["attn_resolutions"] = [8]
        jnet, _ = build_backbone({"name": "adm_edm_mcedm", "model": hp_j["model"],
                                  "data": hp_j["data"],
                                  "optimization": hp_j["optimization"]})
        params = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)),
                           jnp.ones((1,)), jnp.zeros((1, 32, 32, 2)))
        return tnet, jnet, port_adm(tnet.state_dict(), params)

    def test_forward_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        cond = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        sig = np.asarray([0.1, 1.7], np.float32)
        c_noise = np.log(sig) / 4

        with torch.no_grad():
            out_t = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         torch.from_numpy(c_noise),
                         cond=torch.from_numpy(cond.transpose(0, 3, 1, 2)))
        out_t = t2n(out_t).transpose(0, 2, 3, 1)

        out_j = np.asarray(jnet.apply(params, jnp.asarray(x),
                                      jnp.asarray(c_noise), jnp.asarray(cond)))
        delta = np.abs(out_t - out_j).max()
        scale = np.abs(out_t).max()
        assert delta <= 1e-3, f"ADM forward delta {delta} (scale {scale})"

    def test_cond_encoder_variant_parity(self, reference):
        """cat_cond=False routes conditioning through the two-conv GELU
        encoder + combine conv (adm_blocks.py:255-280, 345-363); dx through
        dx_enc. Ported-weight parity for that whole path."""
        import yaml
        from models.adm_blocks import DhariwalUNet

        with open(f"{REFERENCE}/configs/model/adm_edm_mcedm_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        for hp in (cfg["hparams"],):
            hp["model"].update(resolution=16, attn_resolutions=[8],
                               cat_cond=False, dx_cond=True, cat_dx=False)
        hp_t = Dot.wrap(cfg["hparams"])
        torch.manual_seed(1)
        tnet = DhariwalUNet(hp_t).eval()

        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.models import build_backbone

        hp_j = to_dotdict(cfg["hparams"])
        jnet, _ = build_backbone({"name": "adm_edm_mcedm",
                                  "model": hp_j["model"],
                                  "data": hp_j["data"],
                                  "optimization": hp_j["optimization"]})
        rng = np.random.default_rng(7)
        x = rng.normal(size=(2, 16, 16, 2)).astype(np.float32)
        cond = rng.normal(size=(2, 16, 16, 2)).astype(np.float32)
        dx = rng.normal(size=(2, 16, 16, 2)).astype(np.float32)
        c_noise = np.asarray([0.2, -0.3], np.float32)
        params = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(c_noise), jnp.asarray(cond),
                           dx=jnp.asarray(dx))
        params = port_adm(tnet.state_dict(), params)

        with torch.no_grad():
            out_t = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         torch.from_numpy(c_noise),
                         cond=torch.from_numpy(cond.transpose(0, 3, 1, 2)),
                         dx=torch.from_numpy(dx.transpose(0, 3, 1, 2)))
        out_t = t2n(out_t).transpose(0, 2, 3, 1)
        out_j = np.asarray(jnet.apply(params, jnp.asarray(x),
                                      jnp.asarray(c_noise), jnp.asarray(cond),
                                      dx=jnp.asarray(dx)))
        delta = np.abs(out_t - out_j).max()
        assert delta <= 1e-3, f"ADM cond-encoder variant delta {delta}"

    def test_cond_none_parity(self, pair):
        """cond=None path: zero-filled conditioning (adm_blocks.py:330-333)."""
        tnet, jnet, params = pair
        rng = np.random.default_rng(1)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        c_noise = np.asarray([0.0, -0.5], np.float32)
        with torch.no_grad():
            out_t = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         torch.from_numpy(c_noise))
        out_t = t2n(out_t).transpose(0, 2, 3, 1)
        out_j = np.asarray(jnet.apply(params, jnp.asarray(x),
                                      jnp.asarray(c_noise), None))
        assert np.abs(out_t - out_j).max() <= 1e-3


class TestEndToEndSamplingGolden:
    def test_mcedm_heun_sampling_parity(self, reference):
        """North-star metric 3 (BASELINE.md): the FULL mcedm inference path —
        EDM preconditioning + known-part-clamped Heun loop — must match the
        reference end-to-end under ported weights and matched initial noise
        (S_churn=0 so the init draw is the only randomness; the reference
        loop runs in float64, ours in float32 on-device)."""
        import yaml

        from models.mcedm import PlMcedm

        with open(f"{REFERENCE}/configs/model/adm_edm_mcedm_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        cfg["hparams"]["model"]["resolution"] = 32
        cfg["hparams"]["model"]["attn_resolutions"] = [8]
        hp_t = Dot.wrap(cfg["hparams"])
        torch.manual_seed(0)
        tmodel = PlMcedm(hp_t).eval()

        b, res = 2, 32
        rng = np.random.default_rng(8)
        gt = rng.normal(size=(b, res, res, 2)).astype(np.float32)
        mask = np.zeros((b, res, res, 2), np.float32)
        mask[..., 1] = 1.0  # u unobserved
        cond = (gt * (1 - mask)).astype(np.float32)

        sp = Dot.wrap(dict(type="edm", timesteps=8, sigma_min=0.002,
                           sigma_max=80, rho=7, S_churn=0.0, S_min=0,
                           S_max="inf", S_noise=1, w=0.0))
        hu_c = torch.from_numpy(gt.transpose(0, 3, 1, 2))
        cond_c = torch.from_numpy(cond.transpose(0, 3, 1, 2))
        mask_c = torch.from_numpy(mask.transpose(0, 3, 1, 2))
        tmodel.h_ch = tmodel.u_ch = 1
        torch.manual_seed(123)
        with torch.no_grad():
            xs_t = tmodel.sample_edm(hu_c, cond_c, mask_c, sp,
                                     return_last=True)
        out_t = t2n(xs_t[:, -1])
        # reproduce the initial draw (the only RNG that affects the output)
        torch.manual_seed(123)
        noise0 = t2n(torch.randn_like(hu_c)).transpose(0, 2, 3, 1)

        # --- ours, with the reference net's weights ported ----------------
        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.samplers import edm as edm_samplers
        from m_cedm_tpu.tasks import McedmTask

        hp_j = to_dotdict(cfg["hparams"])
        task = McedmTask({"name": "adm_edm_mcedm", "model": hp_j["model"],
                          "data": hp_j["data"],
                          "optimization": hp_j["optimization"],
                          "sampler": hp_j["sampler"]})
        params0 = task.model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, res, res, 2)), jnp.ones((1,)),
                                  jnp.zeros((1, res, res, 2)))
        params = port_adm(tmodel.model.state_dict(), params0)

        schedule = edm_samplers.make_edm_schedule(
            num_steps=8, sigma_min=0.002, sigma_max=80.0, rho=7.0,
            S_churn=0.0)
        denoise = task._make_denoise_fn(params, jnp.asarray(cond), 0.0)
        xs_j = edm_samplers.heun_sample_masked(
            denoise, jax.random.PRNGKey(0), jnp.asarray(cond),
            jnp.asarray(mask), schedule, return_last=True,
            init_noise=jnp.asarray(noise0))
        out_j = np.asarray(xs_j[:, -1])

        assert out_t.shape == out_j.shape
        mean_abs = np.abs(out_t - out_j).mean()
        mse_delta = abs(((out_t - gt) ** 2).mean() - ((out_j - gt) ** 2).mean())
        assert mean_abs <= 1e-3, f"end-to-end sampling mean-abs {mean_abs}"
        assert mse_delta <= 1e-3, f"recovery-MSE delta {mse_delta}"
        assert np.abs(out_t - out_j).max() <= 5e-3
        # the observed channel is clamped identically in both frameworks
        np.testing.assert_allclose(out_j[..., 0], gt[..., 0], atol=1e-5)


# ---------------------------------------------------------------------------
# DDPM U-Net ("Model")
# ---------------------------------------------------------------------------

def port_ddpm(state_dict, params):
    tree = _deep_dict(params)
    ported = set()
    for key, tval in state_dict.items():
        parts = key.split(".")
        p0 = parts[0]
        if p0 == "temb":
            path, sub = (f"temb_dense{parts[2]}",), None
        elif p0 in ("conv_in", "conv_out", "norm_out", "combine_enc"):
            path, sub = (p0,), None
        elif p0 == "logvar":
            set_leaf(tree, ("params", "logvar"), t2n(tval))
            ported.add(("params", "logvar"))
            continue
        elif p0 in ("cond_enc", "dx_enc"):
            path, sub = (p0,), f"TorchConv2d_{int(parts[1]) // 2}"
        elif p0 in ("down", "up"):
            lvl = parts[1]
            kind = parts[2]  # block | attn | downsample | upsample
            if kind in ("downsample", "upsample"):
                path, sub = (f"{p0}_{lvl}_{kind}",), "conv"
                parts = parts[:3] + parts[4:]  # drop '.conv'
            else:
                path, sub = (f"{p0}_{lvl}_{kind}_{parts[3]}",), parts[4]
        elif p0 == "mid":
            path, sub = (f"mid_{parts[1]}",), parts[2]
        else:
            raise AssertionError(f"unmapped reference key {key}")
        if sub == "norm":  # AttnBlock's GroupNorm is auto-named in flax
            sub = "GroupNorm_0"
        kind = parts[-1]
        val = tval
        is_norm = "norm" in (sub or p0).lower()
        if kind == "weight":
            if val.dim() == 4:
                arr, leaf = conv_w(val), "kernel"
            elif val.dim() == 2:
                arr, leaf = linear_w(val), "kernel"
            else:
                arr, leaf = t2n(val), ("scale" if is_norm else "kernel")
        else:
            arr, leaf = t2n(val), "bias"
        full = ("params",) + path + ((sub,) if sub else ()) + (leaf,)
        set_leaf(tree, full, arr)
        ported.add(full)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    all_paths = {tuple(p.key for p in path) for path, _ in flat}
    missing = all_paths - ported
    assert not missing, f"flax leaves not ported: {sorted(missing)}"
    return tree


class TestDdpmGolden:
    @pytest.fixture(scope="class")
    def pair(self, reference):
        import yaml
        from models.ddim_blocks import Model

        with open(f"{REFERENCE}/configs/model/ddim_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        hp_t = Dot.wrap(cfg["hparams"])
        hp_t.model.resolution = 32
        hp_t.model.attn_resolutions = [16]
        torch.manual_seed(0)
        tnet = Model(hp_t).eval()

        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.models import build_backbone

        hp_j = to_dotdict(cfg["hparams"])
        hp_j["model"]["resolution"] = 32
        hp_j["model"]["attn_resolutions"] = [16]
        jnet, _ = build_backbone(hp_j)
        params = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)),
                           jnp.ones((1,)))
        return tnet, jnet, port_ddpm(tnet.state_dict(), params)

    def test_forward_parity(self, pair):
        tnet, jnet, params = pair
        rng = np.random.default_rng(2)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        t = np.asarray([17.0, 401.0], np.float32)
        with torch.no_grad():
            out_t = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                         torch.from_numpy(t))
        out_t = t2n(out_t).transpose(0, 2, 3, 1)
        out_j = np.asarray(jnet.apply(params, jnp.asarray(x), jnp.asarray(t)))
        delta = np.abs(out_t - out_j).max()
        assert delta <= 1e-3, f"DDPM forward delta {delta}"


class TestCondDdimSamplingGolden:
    def test_cond_ddim_sampling_parity(self, reference):
        """Conditional DDIM sampling (eta=0, deterministic given the initial
        noise): reference PlCondDdim.sample vs our scan sampler under ported
        DDPM-net weights and the same injected x_T (ddim.py:1452-1530)."""
        import yaml

        from models.ddim import PlCondDdim

        with open(f"{REFERENCE}/configs/model/ddim_cond_h_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        cfg["hparams"]["model"]["resolution"] = 32
        cfg["hparams"]["model"]["attn_resolutions"] = [16]
        cfg["hparams"]["model"]["self_cond"] = False
        hp_t = Dot.wrap(cfg["hparams"])
        torch.manual_seed(0)
        tmodel = PlCondDdim(hp_t).eval()

        b, res = 2, 32
        rng = np.random.default_rng(9)
        h_cond = rng.normal(size=(b, res, res, 1)).astype(np.float32)
        u_noise = rng.normal(size=(b, res, res, 1)).astype(np.float32)
        sp = Dot.wrap(dict(type="ddim", timesteps=10, skip_type="uniform",
                           eta=0.0, w=0.0))
        with torch.no_grad():
            xs_t, _ = tmodel.sample(torch.from_numpy(h_cond),
                                    torch.from_numpy(u_noise), sp,
                                    return_last=True)
        out_t = t2n(xs_t[:, -1])

        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.samplers import ddim as ddim_samplers
        from m_cedm_tpu.tasks import CondDdimTask

        hp_j = to_dotdict(cfg["hparams"])
        task = CondDdimTask({"name": "ddim_cond_h", "model": hp_j["model"],
                             "data": hp_j["data"],
                             "diffusion": hp_j["diffusion"],
                             "optimization": hp_j["optimization"],
                             "sampler": hp_j["sampler"]})
        params0 = task.model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, res, res, 1)), jnp.ones((1,)),
                                  jnp.zeros((1, res, res, 1)))
        params = port_ddpm(tmodel.model.state_dict(), params0)

        schedule = ddim_samplers.make_ddim_schedule(
            task.alphas_cumprod, 10, "uniform", 0.0)
        eps = task._cond_eps_fn(params, jnp.asarray(h_cond), 0.0)
        xs_j = ddim_samplers.ddim_sample_cond(
            eps, jax.random.PRNGKey(0), (b, res, res, 1), schedule,
            self_condition=False, return_last=True,
            init_noise=jnp.asarray(u_noise))
        out_j = np.asarray(xs_j[:, -1])

        assert out_t.shape == out_j.shape, (out_t.shape, out_j.shape)
        # untrained-net DDIM trajectories are amplified by 1/sqrt(a_t) ~ 100
        # (|out| ~ 240 here), so parity is relative to the output scale
        delta = np.abs(out_t - out_j).max()
        scale = np.abs(out_t).max()
        assert delta <= 1e-3 * scale, (
            f"cond DDIM sampling rel delta {delta / scale} (abs {delta})")


# ---------------------------------------------------------------------------
# FNO
# ---------------------------------------------------------------------------

class TestFnoGolden:
    def test_spectral_conv(self, reference):
        from models.fno_2d import SpectralConv2d as TorchSpectral
        from m_cedm_tpu.models.fno import SpectralConv2d

        torch.manual_seed(0)
        tmod = TorchSpectral(3, 5, modes1=4, modes2=4)
        jmod = SpectralConv2d(5, 4, 4)
        x = np.random.default_rng(3).normal(size=(2, 16, 16, 3)).astype(np.float32)
        params = jmod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        tree = _deep_dict(params)
        for i, w in ((1, tmod.weights1), (2, tmod.weights2)):
            tree["params"][f"w{i}_real"] = jnp.asarray(t2n(w.real))
            tree["params"][f"w{i}_imag"] = jnp.asarray(t2n(w.imag))
        with torch.no_grad():
            out_t = tmod(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        out_t = t2n(out_t).transpose(0, 2, 3, 1)
        out_j = np.asarray(jmod.apply(tree, jnp.asarray(x)))
        assert np.abs(out_t - out_j).max() <= 1e-3

    def test_fno_state_2d(self, reference):
        from models.fno_state_2d import FnoState2d as TorchFnoState
        from m_cedm_tpu.models.fno import FnoConfig, FnoState2d

        hp = Dot.wrap(dict(modes_1=4, modes_2=4, width=16, num_layers=3,
                           time_history=16, time_future=0, padding_t=4,
                           padding_x=0, input_size=1, state_size=1,
                           inst_norm=False, loss="l1", lr=1e-3,
                           weight_decay=0.0, factor=0.5, step_size=50))
        torch.manual_seed(0)
        tnet = TorchFnoState(hp).eval()
        jnet = FnoState2d(FnoConfig(modes_1=4, modes_2=4, width=16,
                                    num_layers=3, time_history=16,
                                    padding_t=4, padding_x=0, input_size=1,
                                    state_size=1, inst_norm=False))
        x = np.random.default_rng(4).normal(size=(2, 16, 16, 1)).astype(np.float32)
        params = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x))
        tree = _deep_dict(params)

        sd = tnet.state_dict()
        for name in ("fc0", "fc1", "fc2"):
            tree["params"][name]["kernel"] = jnp.asarray(linear_w(sd[f"{name}.weight"]))
            tree["params"][name]["bias"] = jnp.asarray(t2n(sd[f"{name}.bias"]))
        for i in range(3):
            for j in (1, 2):
                w = sd[f"fourier_layers.{i}.weights{j}"]
                tree["params"][f"fourier_{i}"][f"w{j}_real"] = jnp.asarray(
                    t2n(w.real))
                tree["params"][f"fourier_{i}"][f"w{j}_imag"] = jnp.asarray(
                    t2n(w.imag))
            tree["params"][f"conv_{i}"]["kernel"] = jnp.asarray(
                conv_w(sd[f"conv_layers.{i}.weight"]))
            tree["params"][f"conv_{i}"]["bias"] = jnp.asarray(
                t2n(sd[f"conv_layers.{i}.bias"]))

        with torch.no_grad():
            out_t = tnet(torch.from_numpy(x))  # reference takes (B, X, T, C)
        out_t = t2n(out_t)
        out_j = np.asarray(jnet.apply(tree, jnp.asarray(x)))
        assert out_t.shape == out_j.shape
        assert np.abs(out_t - out_j).max() <= 1e-3


class TestDataGolden:
    """Data layer vs the reference's own HDF5Dataset on the same h5 file
    (datamodules/h5_dataset.py:14-188): normalization, flip_xy, theta/IC
    channels, coordinate modes, and down_factor interpolation."""

    @pytest.fixture(scope="class")
    def h5path(self, reference, tmp_path_factory):
        from m_cedm_tpu.data.synthetic import write_swe_dataset

        path = str(tmp_path_factory.mktemp("golden_h5") / "d.h5")
        write_swe_dataset(path, jax.random.PRNGKey(3), 4, 16, 16)
        return path

    def _pair(self, h5path, **kw):
        from datamodules.h5_dataset import HDF5Dataset as TorchDS

        from m_cedm_tpu.data.datamodule import HDF5Datamodule

        dm = HDF5Datamodule(train_path=h5path, val_path=h5path,
                            test_path=h5path, batch_size=1, **kw)
        tds = TorchDS(h5path,
                      return_abs_coords=kw.get("return_abs_coords", False),
                      return_grid=kw.get("return_grid", False),
                      input_mean=np.asarray(dm.input_mean),
                      input_std=np.asarray(dm.input_std),
                      target_mean=np.asarray(dm.target_mean),
                      target_std=np.asarray(dm.target_std),
                      norm_x=kw.get("norm_x", False),
                      norm_t=kw.get("norm_t", False),
                      norm_input=kw.get("norm_input", True),
                      norm_target=kw.get("norm_target", True),
                      flip_xy=kw.get("flip_xy", False),
                      use_theta=kw.get("use_theta", False),
                      use_tar_ic=kw.get("use_tar_ic", False),
                      down_factor=kw.get("down_factor", 1),
                      down_interp=kw.get("down_interp", True))
        return dm, tds

    def _compare(self, dm, tds, atol=1e-5):
        arrays = dm._prepare("test")
        for i in range(len(tds)):
            ref = [t2n(t) for t in tds[i]]
            inp, ca, cb, target = arrays.batch(np.asarray([i]))
            np.testing.assert_allclose(np.asarray(inp)[0], ref[0], atol=atol,
                                       rtol=1e-4)
            np.testing.assert_allclose(np.asarray(target)[0], ref[3],
                                       atol=atol, rtol=1e-4)
            for ours_c, ref_c in ((ca, ref[1]), (cb, ref[2])):
                np.testing.assert_allclose(np.squeeze(np.asarray(ours_c)),
                                           np.squeeze(ref_c), atol=atol,
                                           rtol=1e-4)

    def test_abs_coords_grid_normalized(self, h5path):
        dm, tds = self._pair(h5path, return_abs_coords=True, return_grid=True,
                             norm_x=True, norm_t=True)
        self._compare(dm, tds)

    def test_flip_xy_rel_coords(self, h5path):
        dm, tds = self._pair(h5path, flip_xy=True)
        self._compare(dm, tds)

    def test_theta_and_target_ic_channels(self, h5path):
        dm, tds = self._pair(h5path, use_theta=True, use_tar_ic=True,
                             return_abs_coords=True)
        self._compare(dm, tds)

    def test_down_factor_interp(self, h5path):
        dm, tds = self._pair(h5path, down_factor=2, down_interp=True,
                             return_abs_coords=True)
        self._compare(dm, tds, atol=1e-4)

    def test_down_factor_coarse(self, h5path):
        dm, tds = self._pair(h5path, down_factor=2, down_interp=False,
                             return_abs_coords=True)
        self._compare(dm, tds, atol=1e-4)


# ---------------------------------------------------------------------------
# OFormer encoder (Galerkin linear attention + RoPE)
# ---------------------------------------------------------------------------

class TestOformerGolden:
    def test_encoder_parity(self, reference):
        from models.oformer import IrregSTEncoder as TorchEnc
        from m_cedm_tpu.models.oformer import (IrregSTEncoder,
                                               OformerEncoderConfig)

        hp = Dot.wrap(dict(time_window=1, input_channels=3, in_emb_dim=32,
                           out_channels=32, max_node_type=2, heads=1, depth=4,
                           res=16, use_ln=True, emb_dropout=0.0,
                           relative_emb_dim=2))
        torch.manual_seed(0)
        tnet = TorchEnc(hp).eval()
        jnet = IrregSTEncoder(OformerEncoderConfig.from_hparams(hp))

        b, n = 2, 64
        rng = np.random.default_rng(5)
        x = rng.normal(size=(b, 1, n, 3)).astype(np.float32)
        node_type = np.zeros((b, n, 1), np.int32)
        node_type[:, 0] = 1
        node_type[:, -1] = 1
        pos = rng.uniform(0, 16, size=(b, n, 2)).astype(np.float32)

        params = jnet.init(jax.random.PRNGKey(0), jnp.asarray(x),
                           jnp.asarray(node_type), jnp.asarray(pos))
        tree = _deep_dict(params)
        sd = tnet.state_dict()
        p = tree["params"]
        p["emb0"]["kernel"] = jnp.asarray(t2n(sd["to_embedding.1.weight"])[:, :, 0, 0].T)
        p["emb1"]["kernel"] = jnp.asarray(t2n(sd["to_embedding.3.weight"])[:, :, 0, 0].T)
        p["node_embedding"]["embedding"] = jnp.asarray(t2n(sd["node_embedding.weight"]))
        p["combine_embedding"]["kernel"] = jnp.asarray(linear_w(sd["combine_embedding.weight"]))
        for d in range(4):
            st = p["s_transformer"]
            st[f"ln1_{d}"]["scale"] = jnp.asarray(t2n(sd[f"s_transformer.layers.{d}.0.weight"]))
            st[f"ln1_{d}"]["bias"] = jnp.asarray(t2n(sd[f"s_transformer.layers.{d}.0.bias"]))
            st[f"attn_{d}"]["to_qkv"]["kernel"] = jnp.asarray(
                linear_w(sd[f"s_transformer.layers.{d}.1.to_qkv.weight"]))
            st[f"ln2_{d}"]["scale"] = jnp.asarray(t2n(sd[f"s_transformer.layers.{d}.2.weight"]))
            st[f"ln2_{d}"]["bias"] = jnp.asarray(t2n(sd[f"s_transformer.layers.{d}.2.bias"]))
            st[f"ffn_{d}"]["Dense_0"]["kernel"] = jnp.asarray(
                linear_w(sd[f"s_transformer.layers.{d}.3.net.0.weight"]))
            st[f"ffn_{d}"]["Dense_0"]["bias"] = jnp.asarray(
                t2n(sd[f"s_transformer.layers.{d}.3.net.0.bias"]))
            st[f"ffn_{d}"]["Dense_1"]["kernel"] = jnp.asarray(
                linear_w(sd[f"s_transformer.layers.{d}.3.net.3.weight"]))
            st[f"ffn_{d}"]["Dense_1"]["bias"] = jnp.asarray(
                t2n(sd[f"s_transformer.layers.{d}.3.net.3.bias"]))
        p["ln"]["scale"] = jnp.asarray(t2n(sd["ln.weight"]))
        p["ln"]["bias"] = jnp.asarray(t2n(sd["ln.bias"]))
        p["out0"]["kernel"] = jnp.asarray(linear_w(sd["to_out.0.weight"]))
        p["out1"]["kernel"] = jnp.asarray(linear_w(sd["to_out.2.weight"]))

        with torch.no_grad():
            out_t = tnet(torch.from_numpy(x), torch.from_numpy(node_type).long(),
                         torch.from_numpy(pos))
        out_t = t2n(out_t)
        out_j = np.asarray(jnet.apply(tree, jnp.asarray(x),
                                      jnp.asarray(node_type), jnp.asarray(pos)))
        assert out_t.shape == out_j.shape
        delta = np.abs(out_t - out_j).max()
        assert delta <= 1e-3, f"OFormer encoder delta {delta}"

    def test_decoder_parity(self, reference):
        """IrregSTDecoder: GFFT coordinate queries, CrossFormer, mix layer,
        latent propagate rollout + decode (oformer.py:824-924)."""
        from models.oformer import IrregSTDecoder as TorchDec
        from m_cedm_tpu.models.oformer import (IrregSTDecoder,
                                               OformerDecoderConfig)

        lc = 32
        hp = Dot.wrap(dict(max_node_type=2, latent_channels=lc, out_channels=1,
                           res=16, scale=2.0, dropout=0.0, relative_emb_dim=2))
        torch.manual_seed(0)
        tnet = TorchDec(hp).eval()
        jnet = IrregSTDecoder(OformerDecoderConfig.from_hparams(hp))

        b, n, steps = 2, 64, 3
        rng = np.random.default_rng(6)
        z = rng.normal(size=(b, n, lc)).astype(np.float32)
        pos = rng.uniform(0, 16, size=(b, n, 2)).astype(np.float32)
        node_type = np.zeros((b, n, 1), np.int32)
        node_type[:, 0] = 1

        variables = jnet.init(jax.random.PRNGKey(0), jnp.asarray(z),
                              jnp.asarray(pos), jnp.asarray(node_type),
                              steps, jnp.asarray(pos))
        tree = _deep_dict(variables)
        sd = tnet.state_dict()
        p = tree["params"]
        tree["constants"]["fourier_features"]["B"] = jnp.asarray(
            t2n(sd["coordinate_projection.0._B"]))
        p["node_type_embedding"]["embedding"] = jnp.asarray(
            t2n(sd["node_type_embedding.weight"]))
        p["coord_proj0"]["kernel"] = jnp.asarray(linear_w(sd["coordinate_projection.1.weight"]))
        p["coord_proj1"]["kernel"] = jnp.asarray(linear_w(sd["coordinate_projection.3.weight"]))
        p["combine_layer"]["kernel"] = jnp.asarray(linear_w(sd["combine_layer.weight"]))
        ca = p["decoding_transformer"]["cross_attn"]
        ca["to_q"]["kernel"] = jnp.asarray(
            linear_w(sd["decoding_transformer.cross_attn_module.to_q.weight"]))
        ca["to_kv"]["kernel"] = jnp.asarray(
            linear_w(sd["decoding_transformer.cross_attn_module.to_kv.weight"]))
        ca["to_out"]["kernel"] = jnp.asarray(
            linear_w(sd["decoding_transformer.cross_attn_module.to_out.0.weight"]))
        ca["to_out"]["bias"] = jnp.asarray(
            t2n(sd["decoding_transformer.cross_attn_module.to_out.0.bias"]))
        ffn = p["decoding_transformer"]["ffn"]
        ffn["Dense_0"]["kernel"] = jnp.asarray(
            linear_w(sd["decoding_transformer.ffn.net.0.weight"]))
        ffn["Dense_0"]["bias"] = jnp.asarray(
            t2n(sd["decoding_transformer.ffn.net.0.bias"]))
        ffn["Dense_1"]["kernel"] = jnp.asarray(
            linear_w(sd["decoding_transformer.ffn.net.3.weight"]))
        ffn["Dense_1"]["bias"] = jnp.asarray(
            t2n(sd["decoding_transformer.ffn.net.3.bias"]))
        p["mix_layer"]["to_qkv"]["kernel"] = jnp.asarray(
            linear_w(sd["mix_layer.to_qkv.weight"]))
        p["expand_layer"]["kernel"] = jnp.asarray(linear_w(sd["expand_layer.weight"]))
        p["prop_norm"]["scale"] = jnp.asarray(t2n(sd["propagator.0.0.weight"]))
        p["prop_norm"]["bias"] = jnp.asarray(t2n(sd["propagator.0.0.bias"]))
        for i, idx in enumerate((0, 2, 4, 6)):
            p[f"prop_mlp{i}"]["kernel"] = jnp.asarray(
                linear_w(sd[f"propagator.0.1.{idx}.weight"]))
        p["out_norm"]["scale"] = jnp.asarray(t2n(sd["out_norm.weight"]))
        p["out_norm"]["bias"] = jnp.asarray(t2n(sd["out_norm.bias"]))
        for i, idx in enumerate((0, 2, 4)):
            p[f"to_out{i}"]["kernel"] = jnp.asarray(
                linear_w(sd[f"to_out.{idx}.weight"]))
        p["to_out2"]["bias"] = jnp.asarray(t2n(sd["to_out.4.bias"]))

        with torch.no_grad():
            out_t = tnet(torch.from_numpy(z), torch.from_numpy(pos),
                         torch.from_numpy(node_type).long(), steps,
                         torch.from_numpy(pos))
        out_t = t2n(out_t)
        out_j = np.asarray(jnet.apply(tree, jnp.asarray(z), jnp.asarray(pos),
                                      jnp.asarray(node_type), steps,
                                      jnp.asarray(pos)))
        assert out_t.shape == out_j.shape, (out_t.shape, out_j.shape)
        delta = np.abs(out_t - out_j).max()
        assert delta <= 1e-3, f"OFormer decoder delta {delta}"


# ---------------------------------------------------------------------------
# Joint-model (PlDdim) sampling paths: RePaint DDIM, joint-h DDIM, DDPM-as-EDM
# ---------------------------------------------------------------------------

class TestJointSamplingGolden:
    """Cross-framework parity for the three PlDdim samplers under ported
    DDPM-net weights and matched injected noise. With eta=0 / S_churn=0 /
    self_cond=False the single hu_noise (h_noise, u_noise) draw is the only
    randomness, so trajectories are deterministic given the injected noise."""

    B, RES, STEPS = 2, 32, 10

    @pytest.fixture(scope="class")
    def pair(self, reference):
        import yaml

        from models.ddim import PlDdim

        with open(f"{REFERENCE}/configs/model/ddim_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        cfg["hparams"]["model"].update(resolution=self.RES,
                                       attn_resolutions=[16],
                                       self_cond=False, ema=False)
        hp_t = Dot.wrap(cfg["hparams"])
        torch.manual_seed(0)
        tmodel = PlDdim(hp_t).eval()
        tmodel.h_ch = tmodel.u_ch = 1

        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.tasks import DdimTask

        hp_j = to_dotdict(cfg["hparams"])
        task = DdimTask({"name": "ddim", "model": hp_j["model"],
                         "data": hp_j["data"], "diffusion": hp_j["diffusion"],
                         "optimization": hp_j["optimization"],
                         "sampler": hp_j["sampler"]})
        params0 = task.model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, self.RES, self.RES, 2)),
                                  jnp.ones((1,)), None)
        params = port_ddpm(tmodel.model.state_dict(), params0)
        return tmodel, task, params

    def _fields(self, seed):
        rng = np.random.default_rng(seed)
        h = rng.normal(size=(self.B, self.RES, self.RES, 1)).astype(np.float32)
        u = rng.normal(size=(self.B, self.RES, self.RES, 1)).astype(np.float32)
        return h, u

    def _rel_assert(self, out_t, out_j, label):
        assert out_t.shape == out_j.shape, (out_t.shape, out_j.shape)
        delta = np.abs(out_t - out_j).max()
        scale = np.abs(out_t).max()
        assert delta <= 1e-3 * max(scale, 1.0), (
            f"{label} rel delta {delta / scale} (abs {delta}, scale {scale})")

    def test_repaint_ddim_parity(self, pair):
        """PlDdim.sample_with_repeat (ddim.py:808-913) vs ddim_sample_repaint:
        n_repeat harmonization, known-part renoising with abar(T-1) init."""
        from m_cedm_tpu.samplers import ddim as ddim_samplers

        tmodel, task, params = pair
        h, u = self._fields(11)
        sp = Dot.wrap(dict(type="ddim", timesteps=self.STEPS,
                           skip_type="uniform", eta=0.0, w=0.0, n_repeat=2,
                           n_time_h=16, n_time_u=8))
        torch.manual_seed(5)
        with torch.no_grad():
            xs_t, _ = tmodel.sample_with_repeat(
                torch.from_numpy(h), torch.from_numpy(u), sp, return_last=True)
        out_t = t2n(xs_t[:, -1])

        # reproduce the single randn_like draw: hu is an einops-permuted
        # (channels-last) view and torch's normal_ fill order depends on the
        # memory format, so replicate with randn_like on an identically
        # strided tensor
        hu_nchw = torch.from_numpy(
            np.concatenate([h, u], -1).transpose(0, 3, 1, 2))
        torch.manual_seed(5)
        noise = t2n(torch.randn_like(hu_nchw)).transpose(0, 2, 3, 1)

        schedule = ddim_samplers.make_ddim_schedule(
            task.alphas_cumprod, self.STEPS, "uniform", 0.0)
        eps = task._eps_fn(params, 0.0)
        hu = jnp.asarray(np.concatenate([h, u], axis=-1))
        mask = jnp.broadcast_to(task._time_mask(hu.shape, 16, 8), hu.shape)
        xs_j = ddim_samplers.ddim_sample_repaint(
            eps, jax.random.PRNGKey(0), hu, mask, schedule, n_repeat=2,
            return_last=True, init_noise=jnp.asarray(noise))
        self._rel_assert(out_t, np.asarray(xs_j[:, -1]), "RePaint DDIM")

    def test_joint_h_ddim_parity(self, pair):
        """PlDdim.sample (ddim.py:706-806): h rides its fixed noisy
        trajectory, u is denoised; u_noise is caller-provided."""
        from m_cedm_tpu.samplers import ddim as ddim_samplers

        tmodel, task, params = pair
        h, u_noise = self._fields(12)
        sp = Dot.wrap(dict(type="ddim", timesteps=self.STEPS,
                           skip_type="uniform", eta=0.0, w=0.0))
        torch.manual_seed(6)
        with torch.no_grad():
            xs_t, _ = tmodel.sample(torch.from_numpy(h[..., 0]),
                                    torch.from_numpy(u_noise[..., 0]), sp,
                                    return_last=True)
        out_t = t2n(xs_t[:, -1])

        # h_noise is randn_like on a permuted (B, 1, H, W) view; with a
        # single channel the physical (NHWC) and contiguous orders coincide
        torch.manual_seed(6)
        h_noise = t2n(torch.randn(self.B, 1, self.RES, self.RES)
                      ).transpose(0, 2, 3, 1)

        schedule = ddim_samplers.make_ddim_schedule(
            task.alphas_cumprod, self.STEPS, "uniform", 0.0)
        eps = task._eps_fn(params, 0.0)
        xs_j = ddim_samplers.ddim_sample_joint_h(
            eps, jax.random.PRNGKey(0), jnp.asarray(h), schedule, h_ch=1,
            return_last=True, h_noise=jnp.asarray(h_noise),
            u_noise=jnp.asarray(u_noise))
        self._rel_assert(out_t, np.asarray(xs_j[:, -1]), "joint-h DDIM")

    def test_ddpm_as_edm_parity(self, pair):
        """PlDdim.sample_edm (ddim.py:959-1051): the DDPM net driven by the
        Heun EDM loop via the round_sigma table, RePaint-clamped known part
        (f64 loop in the reference vs f32 on-device here)."""
        from m_cedm_tpu.samplers import edm as edm_samplers

        tmodel, task, params = pair
        h, u = self._fields(13)
        sp = Dot.wrap(dict(type="edm", timesteps=8, sigma_min=0.002,
                           sigma_max=80, rho=7, S_churn=0.0, S_min=0,
                           S_max="inf", S_noise=1, w=0.0, n_repeat=1,
                           n_time_h=16, n_time_u=8))
        tmodel.set_test_sampler_params(sp)
        torch.manual_seed(7)
        with torch.no_grad():
            xs_t = tmodel.sample_edm(torch.from_numpy(h), torch.from_numpy(u),
                                     sp, return_last=True)
        out_t = t2n(xs_t[:, -1])

        # randn_like on an identically (channels-last) strided tensor — see
        # test_repaint_ddim_parity for why a plain randn cannot replicate it
        hu_nchw = torch.from_numpy(
            np.concatenate([h, u], -1).transpose(0, 3, 1, 2))
        torch.manual_seed(7)
        noise = t2n(torch.randn_like(hu_nchw)).transpose(0, 2, 3, 1)

        schedule = edm_samplers.make_edm_schedule(
            num_steps=8, sigma_min=max(0.002, task.sigma_min),
            sigma_max=min(80.0, task.sigma_max), rho=7.0, S_churn=0.0,
            S_min=0.0, S_max=float("inf"), S_noise=1.0,
            sigma_table=task.edm_steps, alphas_cumprod=task.alphas_cumprod)
        denoise = task._ddpm_as_edm_denoise_fn(params, 0.0)
        hu = jnp.asarray(np.concatenate([h, u], axis=-1))
        mask = jnp.broadcast_to(task._time_mask(hu.shape, 16, 8), hu.shape)
        xs_j = edm_samplers.heun_sample_repaint(
            denoise, jax.random.PRNGKey(0), hu, mask, schedule, n_repeat=1,
            return_last=True, init_noise=jnp.asarray(noise))
        self._rel_assert(out_t, np.asarray(xs_j[:, -1]), "DDPM-as-EDM")


# ---------------------------------------------------------------------------
# Backward-pass parity: input gradients under ported weights
# ---------------------------------------------------------------------------

class TestBackwardGolden:
    """d(sum(net(x) * G))/dx in torch autograd vs jax.grad under ported
    weights: pins the whole backward pass (GroupNorm, fp32 attention,
    resample convs, SiLU) that the forward-only golden tests cannot see."""

    def test_adm_input_gradient_parity(self, reference):
        import yaml
        from models.adm_blocks import DhariwalUNet

        with open(f"{REFERENCE}/configs/model/adm_edm_mcedm_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        cfg["hparams"]["model"].update(resolution=32, attn_resolutions=[8])
        hp_t = Dot.wrap(cfg["hparams"])
        torch.manual_seed(0)
        tnet = DhariwalUNet(hp_t).eval()

        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.models import build_backbone

        hp_j = to_dotdict(cfg["hparams"])
        hp_j["model"].update(resolution=32, attn_resolutions=[8])
        jnet, _ = build_backbone({"name": "adm_edm_mcedm",
                                  "model": hp_j["model"], "data": hp_j["data"],
                                  "optimization": hp_j["optimization"]})
        params = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)),
                           jnp.ones((1,)), jnp.zeros((1, 32, 32, 2)))
        params = port_adm(tnet.state_dict(), params)

        rng = np.random.default_rng(3)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        cond = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        g = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        c_noise = np.asarray([0.3, -0.2], np.float32)

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
        out_t = tnet(xt, torch.from_numpy(c_noise),
                     cond=torch.from_numpy(cond.transpose(0, 3, 1, 2)))
        (out_t * torch.from_numpy(g.transpose(0, 3, 1, 2))).sum().backward()
        grad_t = t2n(xt.grad).transpose(0, 2, 3, 1)

        grad_j = np.asarray(jax.grad(
            lambda xx: jnp.sum(jnet.apply(params, xx, jnp.asarray(c_noise),
                                          jnp.asarray(cond)) * g)
        )(jnp.asarray(x)))
        delta = np.abs(grad_t - grad_j).max()
        scale = np.abs(grad_t).max()
        assert delta <= 1e-3 * max(scale, 1.0), (
            f"ADM input-grad rel delta {delta / scale} (abs {delta})")

    def test_ddpm_input_gradient_parity(self, reference):
        import yaml
        from models.ddim_blocks import Model

        with open(f"{REFERENCE}/configs/model/ddim_res32.yaml") as f:
            cfg = yaml.safe_load(f)
        cfg["hparams"]["model"].update(resolution=32, attn_resolutions=[16],
                                       self_cond=False)
        hp_t = Dot.wrap(cfg["hparams"])
        torch.manual_seed(0)
        tnet = Model(hp_t).eval()

        from m_cedm_tpu.config import to_dotdict
        from m_cedm_tpu.models import build_backbone

        hp_j = to_dotdict(cfg["hparams"])
        jnet, _ = build_backbone({"name": "ddim", "model": hp_j["model"],
                                  "data": hp_j["data"],
                                  "optimization": hp_j["optimization"]})
        params = jnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 2)),
                           jnp.ones((1,)), None)
        params = port_ddpm(tnet.state_dict(), params)

        rng = np.random.default_rng(4)
        x = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        g = rng.normal(size=(2, 32, 32, 2)).astype(np.float32)
        t_idx = np.asarray([17.0, 431.0], np.float32)

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
        out_t = tnet(xt, torch.from_numpy(t_idx))
        (out_t * torch.from_numpy(g.transpose(0, 3, 1, 2))).sum().backward()
        grad_t = t2n(xt.grad).transpose(0, 2, 3, 1)

        grad_j = np.asarray(jax.grad(
            lambda xx: jnp.sum(jnet.apply(params, xx, jnp.asarray(t_idx),
                                          None) * g)
        )(jnp.asarray(x)))
        delta = np.abs(grad_t - grad_j).max()
        scale = np.abs(grad_t).max()
        assert delta <= 1e-3 * max(scale, 1.0), (
            f"DDPM input-grad rel delta {delta / scale} (abs {delta})")
