"""Diffusion task family: training / evaluation / sampling logic.

One family of pure-function tasks replaces the reference's four
LightningModules:

  McedmTask    <- PlMcedm    (models/mcedm.py:16-639)   the paper's method:
                  mixed-conditional EDM with on-device random observation
                  masks, masked-region noise/loss, Heun sampling with
                  known-part clamping, per-task eval over mask dict
  DdimTask     <- PlDdim     (models/ddim.py:16-1051)   unconditional joint
                  DDPM: antithetic timesteps, self-conditioning, optional PDE
                  loss, DDIM / RePaint / DDPM-as-EDM Heun samplers
  CondDdimTask <- PlCondDdim (models/ddim.py:1054-1605) single-task
                  conditional DDPM with cond-channel assembly variants and
                  classifier-free cond dropout
  CondEdmTask  <- PlCondEdm  (models/ddim.py:1608-1773) + true EDM
                  preconditioning/training on the target variable

TPU-first design decisions (vs. the reference):
  * NHWC (B, T, X, C) end-to-end; no rearranges to channels-first.
  * All stochastic branches (`torch.rand(1)` gates for dx/cond/self-cond) are
    explicit PRNG-key draws + lax.cond / multiplicative masks, so the whole
    train step jits and is bitwise reproducible from one seed.
  * Observation masks are sampled per-batch-item *inside* the jitted train
    step (data/masks.py) instead of in CPU dataloader workers.
  * The n_samples test ensemble is a vmapped leading axis (shardable over
    devices) instead of a batch-repeat.
  * Samplers are lax.scan kernels (samplers/edm.py, samplers/ddim.py) —
    50-step Heun ensembles compile to one XLA program.
  * The EMA shadow is a pytree update fused into the train step.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.config import register
from m_cedm_tpu.data import masks as mask_lib
from m_cedm_tpu.models import build_backbone
from m_cedm_tpu.models.layers import disable_conv_fusion
from m_cedm_tpu.ops import losses
from m_cedm_tpu.ops.schedules import (
    alphas_cumprod_from_betas,
    edm_precond_coeffs,
    edm_loss_weight,
    edm_train_sigma,
    get_beta_schedule,
)
from m_cedm_tpu.physics.pde_loss import get_pde_loss_function
from m_cedm_tpu.samplers import ddim as ddim_samplers
from m_cedm_tpu.samplers import edm as edm_samplers
from m_cedm_tpu.tasks.base import (
    DataTransform,
    TrainState,
    chunked_ensemble,
    ema_update,
    make_optimizer,
    normalizers_from_stats,
    mae,
    scale_each_min_max,
)

P_MEAN, P_STD, SIGMA_DATA = -1.2, 1.2, 1.0
SIGMA_MIN, SIGMA_MAX = 0.002, 80.0

DEFAULT_EDM_SAMPLER = dict(
    name="edm", type="edm", timesteps=50, sigma_min=0.002, sigma_max=80,
    rho=7, S_churn=15.0, S_min=0, S_max="inf", S_noise=1, n_samples=1,
    n_repeat=2, n_time_h=128, n_time_u=0, return_last=True,
    select_by_pde=False, use_gt_pde_select=True, guide_dx=False, w=0.0,
    plot_scaled=False)

DEFAULT_DDIM_SAMPLER = dict(
    name="ddim", type="ddim", timesteps=50, skip_type="uniform", eta=0.0,
    n_samples=1, n_repeat=5, n_time_h=128, n_time_u=0, return_last=True,
    select_by_pde=False, use_gt_pde_select=True, guide_dx=False, w=0.0,
    plot_scaled=False)


def _sget(sparams, key, default=None):
    if sparams is None:
        return default
    if hasattr(sparams, "get"):
        return sparams.get(key, default)
    return getattr(sparams, key, default)


def cast_floating(tree, dtype):
    """Cast floating leaves of a pytree (params) to a compute dtype."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(dtype)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        tree)


class DiffusionTaskBase:
    """Shared machinery: backbone, transforms, optimizer, PDE loss, EMA."""

    default_cond_p = 0.0
    # sampling-based validation runs every 100 epochs (mcedm.py:284)
    val_every = 100

    def __init__(self, hparams, grad_clip: Optional[float] = 1.0):
        self.hparams = hparams
        m = hparams["model"]
        self.h_ch, self.u_ch = self._channel_split(hparams)
        self.cond_p = m.get("cond_p", self.default_cond_p)
        self.dx_cond = m.get("dx_cond", False)
        self.dx_norm = m.get("dx_norm", "l2")
        self.self_condition = m.get("self_cond", False)
        self.node_type = m.get("node_type", False)
        self.add_cond_mask = m.get("add_cond_mask", False)
        self.add_xt = m.get("add_xt", False)
        self.ema_enabled = m.get("ema", True)
        self.ema_rate = m.get("ema_rate", 0.999)
        # mixed precision: fp32 master params/optimizer/EMA, compute in
        # `dtype` (bfloat16 doubles MXU throughput on TPU; attention softmax
        # and normalization statistics stay fp32 — layers.py / flax defaults)
        dtype_name = m.get("dtype", "float32")
        self.compute_dtype = (jnp.bfloat16 if dtype_name in ("bfloat16", "bf16")
                              else None)

        self._adjust_cond_channels(hparams)
        self.model, self.model_cfg = build_backbone(hparams)

        self.transform = DataTransform(hparams["data"])
        self.opt_cfg = hparams["optimization"]
        self.tx = make_optimizer(self.opt_cfg, grad_clip)
        self.pde_loss_lambda = self.opt_cfg.get("pde_loss_lambda", 0.0)
        self.pde_loss_prop_t = self.opt_cfg.get("pde_loss_prop_t", False)
        self.use_gt_pde = self.opt_cfg.get("use_gt_pde", False)

        self.pde_loss, self.pde_loss_simulator = get_pde_loss_function(
            "swe", flip_xy=False)
        self.sparams = hparams.get("sampler") or self.default_sampler_params()
        self.test_sparams = self.sparams
        self._jit_cache: Dict[Any, Callable] = {}

    # --- reference API surface -------------------------------------------

    def set_pde_loss_function(self, system: str, flip_xy: bool):
        self.pde_loss, self.pde_loss_simulator = get_pde_loss_function(system, flip_xy)
        self._jit_cache.clear()

    def set_test_sampler_params(self, sparams):
        self.test_sparams = sparams
        self._jit_cache.clear()

    def default_sampler_params(self):
        return dict(DEFAULT_DDIM_SAMPLER)

    # --- construction helpers --------------------------------------------

    def _channel_split(self, hparams) -> Tuple[int, int]:
        ch = hparams["model"]["out_ch"] // 2
        return max(ch, 1), max(ch, 1)

    def _adjust_cond_channels(self, hparams):
        pass

    def init_state(self, rng, norm_stats=None) -> TrainState:
        res = self.model_cfg.resolution
        cfg = self.model_cfg
        x0 = jnp.zeros((1, res, res, cfg.in_channels), jnp.float32)
        cond0 = (jnp.zeros((1, res, res, cfg.cond_channels), jnp.float32)
                 if cfg.cond_channels > 0 else None)
        params = self.model.init(rng, x0, jnp.ones((1,), jnp.float32), cond0)
        if norm_stats is not None:
            n_in, n_tar = normalizers_from_stats(norm_stats, self.transform.normalization)
        else:
            from m_cedm_tpu.ops.normalizer import Normalizer
            n_in = Normalizer.identity(())
            n_tar = Normalizer.identity(())
        return TrainState(
            params=params,
            ema_params=params if self.ema_enabled else None,
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            normalizer_input=n_in,
            normalizer_target=n_tar,
        )

    def _sample_params(self, state: TrainState):
        params = state.ema_params if self.ema_enabled else state.params
        # pre-cast once so the cast lives outside the sampler scan body
        if self.compute_dtype is not None:
            params = cast_floating(params, self.compute_dtype)
        return params

    def net_apply(self, params, x, t, cond=None, x_self_cond=None, dx=None):
        """model.apply with activation casting to the compute dtype; output
        is always fp32 (losses, preconditioning and sampler math stay fp32)."""
        dt = self.compute_dtype
        if dt is not None:
            params = cast_floating(params, dt)  # no-op if pre-cast
            x = x.astype(dt)
            cond = None if cond is None else cond.astype(dt)
            x_self_cond = (None if x_self_cond is None
                           else x_self_cond.astype(dt))
            dx = None if dx is None else dx.astype(dt)
        out = self.model.apply(params, x, t, cond, x_self_cond=x_self_cond,
                               dx=dx)
        return out.astype(jnp.float32)

    def _finish_step(self, state, grads, loss_metrics):
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        import optax

        params = optax.apply_updates(state.params, updates)
        ema = (ema_update(state.ema_params, params, self.ema_rate)
               if self.ema_enabled else None)
        return state.replace(params=params, ema_params=ema,
                             opt_state=opt_state, step=state.step + 1), loss_metrics

    # --- physics helpers ---------------------------------------------------

    def _pde_matrix_joint(self, state, x_denoised, x_gt_unnorm=None,
                          clamp_loss=True):
        """PDE residual of a joint (h, u) normalized field (mcedm/ddim)."""
        h_ch, u_ch = self.h_ch, self.u_ch
        h_n = x_denoised[..., :h_ch]
        u_n = x_denoised[..., h_ch:h_ch + u_ch]
        h_un, u_un = self.transform.inverse(state, h_n, u_n)
        x_unnorm = jnp.concatenate([h_un, u_un], axis=-1)
        gt = x_unnorm if x_gt_unnorm is None else x_gt_unnorm
        return self.pde_loss(x_unnorm, gt, state.normalizer_input,
                             state.normalizer_target, clamp_loss=clamp_loss)

    def _normalize_dx(self, dx1):
        """Post-process the raw PDE gradient per dx_norm (mcedm.py:527-554):
        'prob' raw; 'gauss' clamp +-0.01 then standardize over (H, W);
        'min_max' clamp then rescale to [-1, 1]; 'clamp' +-5; default
        l2-normalize over (H, W). NaN gradients become zeros (the reference
        skips dx entirely on NaN; zeros are the channel-concat equivalent)."""
        b, hh, ww, c = dx1.shape
        mode = self.dx_norm
        if mode == "prob":
            dx = dx1
        elif mode == "gauss":
            d = jnp.clip(dx1, -0.01, 0.01).reshape(b, hh * ww, c)
            mean = jnp.mean(d, axis=1, keepdims=True)
            std = jnp.std(d, axis=1, keepdims=True, ddof=1)
            dx = ((d - mean) / (std + 1e-6)).reshape(b, hh, ww, c)
        elif mode == "min_max":
            d = jnp.clip(dx1, -0.01, 0.01).reshape(b, hh * ww, c)
            mn = jnp.min(d, axis=1, keepdims=True)
            mx = jnp.max(d, axis=1, keepdims=True)
            dx = (2 * (d - mn) / (mx - mn + 1e-6) - 1.0).reshape(b, hh, ww, c)
        elif mode == "clamp":
            dx = jnp.clip(dx1, -5.0, 5.0)
        else:  # l2
            d = dx1.reshape(b, hh * ww, c)
            norm = jnp.linalg.norm(d, axis=1, keepdims=True)
            dx = (d / jnp.maximum(norm, 1e-12)).reshape(b, hh, ww, c)
        return jnp.nan_to_num(dx)

    def get_dx_input(self, state, x_denoised):
        """PDE-gradient conditioning channels for the joint field
        (mcedm.py:519-557). Returns zeros-shaped dx when dx_cond is off."""
        if not self.dx_cond:
            return None
        guidance = self._pde_guidance_joint(state,
                                            calc_prob=(self.dx_norm == "prob"))
        return self._normalize_dx(guidance(x_denoised))

    def _pde_guidance_joint(self, state, calc_prob=True):
        """d/dx of the PDE (log-prob) residual for a joint normalized field."""

        def guidance(x_denoised):
            h_ch, u_ch = self.h_ch, self.u_ch
            h_n = x_denoised[..., :h_ch].astype(jnp.float32)
            u_n = x_denoised[..., h_ch:h_ch + u_ch].astype(jnp.float32)
            h_un, u_un = self.transform.inverse(state, h_n, u_n)
            x_unnorm = jnp.concatenate([h_un, u_un], axis=-1)
            d = self.pde_loss(x_unnorm, x_unnorm, state.normalizer_input,
                              state.normalizer_target, return_d=True,
                              calc_prob=calc_prob)
            return d

        return guidance


# ===========================================================================
# PlMcedm equivalent
# ===========================================================================

@register("models.mcedm.PlMcedm", "m_cedm_tpu.tasks.McedmTask")
def _build_mcedm(hparams, **kw):
    return McedmTask(hparams, **kw)


class McedmTask(DiffusionTaskBase):
    """Mixed-conditional EDM (the paper's method)."""

    default_cond_p = 1.0
    train_mask_kind = "var"

    def default_sampler_params(self):
        return dict(DEFAULT_EDM_SAMPLER)

    def _adjust_cond_channels(self, hparams):
        m = hparams["model"]
        if m.get("add_cond_mask", False):
            m["cond_channels"] = m["cond_channels"] + m["in_channels"]
        if m.get("add_xt", False):
            m["cond_channels"] = m["cond_channels"] + 2

    def set_train_mask_kind(self, kind: Optional[str]):
        if kind:
            self.train_mask_kind = kind
            self._jit_cache.clear()

    # --- conditioning -------------------------------------------------------

    def get_cond_in(self, x, mask, t_grid, x_grid, key):
        """Observed values (+ optional mask channels / x,t grids) as cond."""
        if self.add_cond_mask:
            cond_in = jnp.concatenate([x * (1 - mask), 1.0 - mask], axis=-1)
        else:
            cond_in = x * (1 - mask) + jax.random.normal(key, x.shape) * mask
        if self.add_xt:
            cond_in = jnp.concatenate([cond_in, t_grid, x_grid], axis=-1)
        return cond_in

    def model_precond(self, params, x_noise, sigma, cond=None, x_self_cond=None,
                      dx=None):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_skip, c_out, c_in, c_noise = edm_precond_coeffs(sigma, SIGMA_DATA)
        F_x = self.net_apply(params, c_in * x_noise, c_noise.reshape(-1),
                             cond, x_self_cond=x_self_cond, dx=dx)
        return c_skip * x_noise + c_out * F_x

    # --- training -----------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, rng):
        h_un, t_grid, x_grid, u_un = batch
        b, t_dim, x_dim = h_un.shape[0], h_un.shape[1], h_un.shape[2]
        k_mask, k_cond, k_noise, k_sigma, k_condp = jax.random.split(rng, 5)

        sampler = mask_lib.TRAIN_MASK_SAMPLERS[self.train_mask_kind]
        mask = jax.vmap(lambda k: sampler(k, t_dim, x_dim, self.h_ch, self.u_ch))(
            jax.random.split(k_mask, b))

        x = self.transform.forward(state, h_un, u_un)
        cond_in = self.get_cond_in(x, mask, t_grid, x_grid, k_cond)
        # classifier-free cond dropout: rand >= cond_p -> zero conditioning
        keep = (jax.random.uniform(k_condp) < self.cond_p).astype(x.dtype)
        cond_in = cond_in * keep

        noise = jax.random.normal(k_noise, x.shape)
        rnd_normal = jax.random.normal(k_sigma, (b, 1, 1, 1))
        sigma = edm_train_sigma(rnd_normal, P_MEAN, P_STD)
        weight = edm_loss_weight(sigma, SIGMA_DATA)
        x_noise = x + mask * noise * sigma

        dx = None
        if self.dx_cond:
            # dx conditioning switched off with probability 0.1 (mcedm.py:221)
            k_gate = jax.random.fold_in(rng, 101)
            dx_val = self.get_dx_input(state, x_noise)
            if self.hparams["model"].get("dx_detach", False):
                dx_val = jax.lax.stop_gradient(dx_val)
            gate = (jax.random.uniform(k_gate) > 0.1).astype(dx_val.dtype)
            dx = dx_val * gate

        def loss_fn(params):
            D_x = self.model_precond(params, x_noise, sigma, cond_in, dx=dx)
            return losses.noise_estimation_loss(D_x * mask, x * mask, weight)

        with disable_conv_fusion():
            loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return self._finish_step(state, grads, {"train_loss": loss})

    # --- sampling -----------------------------------------------------------

    def _make_denoise_fn(self, params, cond, w: float, state=None):
        def denoise(x, t_hat, key):
            del key
            dx = (self.get_dx_input(state, x)
                  if (self.dx_cond and state is not None) else None)
            sig = t_hat * jnp.ones((x.shape[0],))
            if w is None or abs(w) < 1e-3 or cond is None:
                return self.model_precond(params, x, sig, cond, dx=dx)
            d_c = self.model_precond(params, x, sig, cond, dx=dx)
            d_u = self.model_precond(params, x, sig, None)
            return (w + 1) * d_c - w * d_u

        return denoise

    def sample_edm(self, state, cond, mask, key, sparams=None, guide_dx=False,
                   return_last=True):
        """Heun EDM sampling with known-part clamping (mcedm.py:570-638)."""
        sp = sparams or self.test_sparams
        schedule = edm_samplers.make_edm_schedule(
            num_steps=_sget(sp, "timesteps", 50),
            sigma_min=max(_sget(sp, "sigma_min", 0.002), SIGMA_MIN),
            sigma_max=min(_sget(sp, "sigma_max", 80), SIGMA_MAX),
            rho=_sget(sp, "rho", 7.0),
            S_churn=_sget(sp, "S_churn", 0.0),
            S_min=_sget(sp, "S_min", 0.0),
            S_max=float(_sget(sp, "S_max", "inf")),
            S_noise=_sget(sp, "S_noise", 1.0))
        params = self._sample_params(state)
        denoise = self._make_denoise_fn(params, cond, _sget(sp, "w", 0.0),
                                        state=state)
        guidance = self._pde_guidance_joint(state) if guide_dx else None
        known = cond[..., : self.h_ch + self.u_ch]
        return edm_samplers.heun_sample_masked(
            denoise, key, known, mask, schedule, guidance_fn=guidance,
            return_last=return_last)

    # --- evaluation -----------------------------------------------------------

    def eval_step(self, state, batch, key, mask, split="val", n_samples=1,
                  mask_name="u", down_mask=None, mesh=None):
        """Sample-and-score one mask task; returns the reference metric dict.
        mesh: shard the n_samples ensemble over it (chunked_ensemble)."""
        fn = self._jit_cache.get(("eval", split, mask_name, n_samples, mesh))
        if fn is None:
            fn = jax.jit(functools.partial(
                self._eval_impl, split=split, n_samples=n_samples,
                mask_name=mask_name, mesh=mesh))
            self._jit_cache[("eval", split, mask_name, n_samples, mesh)] = fn
        return fn(state, batch, key, mask, down_mask)

    def _eval_impl(self, state, batch, key, mask, down_mask, *, split,
                   n_samples, mask_name, mesh=None):
        h_un, t_grid, x_grid, u_un = batch
        h_ch, u_ch = self.h_ch, self.u_ch
        sp = self.test_sparams
        guide_dx = bool(_sget(sp, "guide_dx", False))

        state_gt = self.transform.forward(state, h_un, u_un)
        mask_b = jnp.broadcast_to(mask, state_gt.shape)
        k_cond, k_sample = jax.random.split(key)
        cond_in = self.get_cond_in(state_gt, mask_b, t_grid, x_grid, k_cond)

        def draw(k):
            xs = self.sample_edm(state, cond_in, mask_b, k, sp,
                                 guide_dx=guide_dx, return_last=True)
            return xs[:, -1]

        samples = chunked_ensemble(draw, jax.random.split(k_sample, n_samples),
                                   mesh=mesh)
        hu_mean = jnp.mean(samples, axis=0)

        mask_loss = mask_b if down_mask is None else mask_b * down_mask
        loss_dim = None
        if split == "test":
            start = 0 if mask_name.startswith("h") else h_ch
            end = h_ch if mask_name.startswith("h") else h_ch + u_ch
            loss_dim = jnp.arange(start, end)

        loss_hu = losses.masked_loss(hu_mean, state_gt, mask_loss,
                                     loss_dim if split == "test" else None)
        h_last = hu_mean[..., :h_ch]
        u_last = hu_mean[..., h_ch:h_ch + u_ch]
        h_last_un, u_last_un = self.transform.inverse(state, h_last, u_last)
        hu_un = jnp.concatenate([h_last_un, u_last_un], axis=-1)
        gt_un = jnp.concatenate([h_un, u_un], axis=-1)
        loss_hu_un = losses.masked_loss(hu_un, gt_un, mask_loss,
                                        loss_dim if split == "test" else None)

        n_batch = h_un.shape[0]
        flat_samples = samples.reshape((-1,) + samples.shape[2:])
        pde_matrix = self._pde_matrix_joint(state, flat_samples, clamp_loss=False)
        pde_loss = jnp.sum(pde_matrix) / n_samples / n_batch
        pde_gt = jnp.sum(self._pde_matrix_joint(state, state_gt, clamp_loss=False)) / n_batch

        prefix = split
        metrics = {
            f"{prefix}_mae_{mask_name}": loss_hu,
            f"{prefix}_mae_{mask_name}_un": loss_hu_un,
            f"{prefix}_pde_loss_{mask_name}": pde_loss,
            f"{prefix}_pde_loss_gt": pde_gt,
        }
        return metrics, hu_mean


# ===========================================================================
# PlDdim equivalent (unconditional joint DDPM)
# ===========================================================================

@register("models.ddim.PlDdim", "m_cedm_tpu.tasks.DdimTask")
def _build_ddim(hparams, **kw):
    return DdimTask(hparams, **kw)


class DdimTask(DiffusionTaskBase):
    """Unconditional joint DDPM over (h, u) with the full sampler zoo."""

    default_cond_p = 0.0

    def __init__(self, hparams, grad_clip: Optional[float] = 1.0):
        d = hparams["diffusion"]
        self.betas = get_beta_schedule(
            d["beta_schedule"], beta_start=d["beta_start"], beta_end=d["beta_end"],
            num_diffusion_timesteps=d["num_diffusion_timesteps"])
        self.alphas_cumprod = alphas_cumprod_from_betas(self.betas)
        self.num_timesteps = len(self.betas)
        # DDPM-as-EDM sigma table (ddim.py:131-137), reversed to EDM order
        self.edm_steps = np.sqrt(
            (1.0 - self.alphas_cumprod) / self.alphas_cumprod)[::-1].copy()
        self.sigma_min = float(self.edm_steps[-1])
        self.sigma_max = float(self.edm_steps[0])
        super().__init__(hparams, grad_clip)

    def _adjust_cond_channels(self, hparams):
        m = hparams["model"]
        if m.get("node_type", False):
            m["cond_channels"] = m["cond_channels"] + 1

    # --- training ------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, rng):
        h_un, dxc, dtc, u_un = batch
        n = h_un.shape[0]
        k_t, k_noise, k_sc, k_scnet = jax.random.split(rng, 4)

        x = self.transform.forward(state, h_un, u_un)
        noise = jax.random.normal(k_noise, x.shape)

        # antithetic timestep sampling (ddim.py:276-278)
        t_half = jax.random.randint(k_t, (n // 2 + 1,), 0, self.num_timesteps)
        t = jnp.concatenate([t_half, self.num_timesteps - t_half - 1])[:n]

        abar = jnp.asarray(self.alphas_cumprod)[t].reshape(-1, 1, 1, 1)
        x_noise = x * jnp.sqrt(abar) + noise * jnp.sqrt(1.0 - abar)

        def net(params, x_in, t_in, x_self_cond=None):
            return self.net_apply(params, x_in, t_in.astype(jnp.float32),
                                  None, x_self_cond=x_self_cond)

        def loss_fn(params):
            x_self_cond = None
            if self.self_condition:
                def with_sc(_):
                    eps_hat = jax.lax.stop_gradient(net(params, x_noise, t))
                    x0 = (x_noise - eps_hat * jnp.sqrt(1 - abar)) / jnp.sqrt(abar)
                    return x0

                use_sc = jax.random.uniform(k_sc) < 0.5
                x_self_cond = jax.lax.cond(
                    use_sc, with_sc, lambda _: jnp.zeros_like(x_noise), None)
            output = net(params, x_noise, t, x_self_cond)
            loss = losses.noise_estimation_loss(output, noise)
            metrics = {"train_loss": loss}
            if self.pde_loss_lambda > 0.0:
                x0_t = (x_noise - output * jnp.sqrt(1 - abar)) / jnp.sqrt(abar)
                gt_un = (jnp.concatenate([h_un, u_un], axis=-1)
                         if self.use_gt_pde else None)
                m = self._pde_matrix_joint(state, x0_t, gt_un, clamp_loss=True)
                if self.pde_loss_prop_t:
                    m = m / (t.reshape(-1, 1, 1, 1).astype(m.dtype) + 1.0)
                pde = jnp.sum(m)
                metrics["train_pde_loss"] = pde
                loss = loss + self.pde_loss_lambda * pde
            return loss, metrics

        with disable_conv_fusion():
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
        return self._finish_step(state, grads, metrics)

    # --- samplers --------------------------------------------------------------

    def _eps_fn(self, params, w: float, cond=None, state=None):
        def eps(x, t, x_self_cond, key):
            del key
            dx = (self.get_dx_input(state, x)
                  if (self.dx_cond and state is not None) else None)
            t_b = jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32)
            if w is None or abs(w) < 1e-3:
                return self.net_apply(params, x, t_b, cond,
                                      x_self_cond=x_self_cond, dx=dx)
            e_c = self.net_apply(params, x, t_b, cond, x_self_cond=x_self_cond,
                                 dx=dx)
            e_u = self.net_apply(params, x, t_b, None, x_self_cond=x_self_cond)
            return (w + 1) * e_c - w * e_u

        return eps

    def _ddpm_as_edm_denoise_fn(self, params, w: float):
        """Drive the eps net as an EDM denoiser: c_skip=1, c_out=-sigma,
        c_in=1/sqrt(sigma^2+1), c_noise = T-1 - nearest-sigma-index
        (ddim.py:915-957)."""
        steps = jnp.asarray(self.edm_steps)

        def denoise(x, sigma, key):
            del key
            c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
            idx = jnp.argmin(jnp.abs(steps - sigma))
            c_noise = (self.num_timesteps - 1 - idx).astype(jnp.float32)
            t_b = jnp.full((x.shape[0],), c_noise)
            F_x = self.net_apply(params, c_in * x, t_b, None)
            return x - sigma * F_x

        return denoise

    def _time_mask(self, shape, n_time_h, n_time_u):
        """1 = known/observed for the first n_time rows per variable block
        (note: inverted convention vs the mcedm masks)."""
        b, t_dim, x_dim, c = shape
        mask = np.zeros(shape[1:], np.float32)
        mask[:n_time_h, :, :self.h_ch] = 1.0
        mask[:n_time_u, :, self.h_ch:self.h_ch + self.u_ch] = 1.0
        return jnp.asarray(mask)[None]

    def sample_edm(self, state, hu, key, sparams=None, guide_dx=False,
                   return_last=True):
        """Joint DDPM-as-EDM Heun sampling with RePaint harmonization
        (ddim.py:959-1051). hu: clean normalized (B, T, X, C)."""
        sp = sparams or self.test_sparams
        schedule = edm_samplers.make_edm_schedule(
            num_steps=_sget(sp, "timesteps", 50),
            sigma_min=max(_sget(sp, "sigma_min", 0.002), self.sigma_min),
            sigma_max=min(_sget(sp, "sigma_max", 80), self.sigma_max),
            rho=_sget(sp, "rho", 7.0), S_churn=_sget(sp, "S_churn", 0.0),
            S_min=_sget(sp, "S_min", 0.0), S_max=float(_sget(sp, "S_max", "inf")),
            S_noise=_sget(sp, "S_noise", 1.0),
            sigma_table=self.edm_steps, alphas_cumprod=self.alphas_cumprod)
        params = self._sample_params(state)
        denoise = self._ddpm_as_edm_denoise_fn(params, _sget(sp, "w", 0.0))
        guidance = self._pde_guidance_joint(state) if guide_dx else None
        mask = self._time_mask(hu.shape, _sget(sp, "n_time_h", 128),
                               _sget(sp, "n_time_u", 0))
        mask = jnp.broadcast_to(mask, hu.shape)
        return edm_samplers.heun_sample_repaint(
            denoise, key, hu, mask, schedule,
            n_repeat=_sget(sp, "n_repeat", 1), guidance_fn=guidance,
            return_last=return_last)

    def sample(self, state, h, key, sparams=None, guide_dx=False,
               return_last=True):
        """Joint-model DDIM where the h channel rides the known field's noisy
        trajectory and u is denoised (PlDdim.sample, ddim.py:706-806).
        h: clean normalized (B, T, X, h_ch)."""
        sp = sparams or self.test_sparams
        schedule = ddim_samplers.make_ddim_schedule(
            self.alphas_cumprod, _sget(sp, "timesteps", 50),
            _sget(sp, "skip_type", "uniform"), _sget(sp, "eta", 0.0))
        params = self._sample_params(state)
        eps = self._eps_fn(params, _sget(sp, "w", 0.0), state=state)
        guidance = self._pde_guidance_joint(state) if guide_dx else None
        return ddim_samplers.ddim_sample_joint_h(
            eps, key, h, schedule, h_ch=self.h_ch,
            self_condition=self.self_condition, guidance_fn=guidance,
            return_last=return_last)

    def sample_with_repeat(self, state, hu, key, sparams=None, guide_dx=False,
                           return_last=True):
        """RePaint DDIM sampling (ddim.py:808-913)."""
        sp = sparams or self.test_sparams
        schedule = ddim_samplers.make_ddim_schedule(
            self.alphas_cumprod, _sget(sp, "timesteps", 50),
            _sget(sp, "skip_type", "uniform"), _sget(sp, "eta", 0.0))
        params = self._sample_params(state)
        eps = self._eps_fn(params, _sget(sp, "w", 0.0), state=state)
        guidance = self._pde_guidance_joint(state) if guide_dx else None
        mask = self._time_mask(hu.shape, _sget(sp, "n_time_h", 128),
                               _sget(sp, "n_time_u", 0))
        mask = jnp.broadcast_to(mask, hu.shape)
        return ddim_samplers.ddim_sample_repaint(
            eps, key, hu, mask, schedule, n_repeat=_sget(sp, "n_repeat", 1),
            self_condition=self.self_condition, guidance_fn=guidance,
            return_last=return_last)

    # --- best-of-N selection & rollout oracle ------------------------------

    def _select_best_by_pde(self, state, samples, gt_unnorm, use_gt=True):
        """Pick, per batch element, the sample with the smallest PDE residual
        (reference get_best_by_pde_error, ddim.py:652-674): each sample is
        min-max rescaled to the ground truth's range, then scored by the
        residual against the gt (use_gt) or itself."""
        from m_cedm_tpu.tasks.base import scale_back_min_max

        gt_scaled, mn, mx = scale_each_min_max(gt_unnorm, return_min_max=True)

        def score(sample):
            s_scaled = scale_each_min_max(sample)
            s_gt = scale_back_min_max(s_scaled, mn, mx)
            target = gt_unnorm if use_gt else s_gt
            m = self.pde_loss(s_gt, target, state.normalizer_input,
                              state.normalizer_target, clamp_loss=False)
            return jnp.mean(m.reshape(m.shape[0], -1), axis=1)  # (B,)

        errs = jax.vmap(score)(samples)  # (S, B)
        idx = jnp.argmin(errs, axis=0)   # (B,)
        return jnp.take_along_axis(
            samples, idx[None, :, None, None, None], axis=0)[0]

    def unroll_metrics(self, state, samples, h_un, u_un, use_simulator=True):
        """Simulator-rollout oracle (reference print_unroll_metrics,
        ddim.py:1321-1376): unroll the physics from each prediction's initial
        slice and compare against the gt rollout.

        samples: (S, B, T, X, C) normalized predictions.
        """
        h_ch, u_ch = self.h_ch, self.u_ch
        oracle = self.pde_loss_simulator if use_simulator else self.pde_loss
        if not hasattr(oracle, "unroll_loss"):
            oracle = self.pde_loss

        def unroll_one(sample):
            h_n, u_n = sample[..., :h_ch], sample[..., h_ch:h_ch + u_ch]
            h_unn, u_unn = self.transform.inverse(state, h_n, u_n)
            pred_un = jnp.concatenate([h_unn, u_unn], axis=-1)
            err, rolled = oracle.unroll_loss(
                pred_un, pred_un, state.normalizer_input,
                state.normalizer_target, return_unroll=True)
            return err, rolled

        errs, rolled = [], []
        for s in range(samples.shape[0]):  # simulator oracle is host-side
            e, r = unroll_one(samples[s])
            errs.append(e)
            rolled.append(r)
        err_h = jnp.mean(jnp.stack([jnp.sum(e[..., :h_ch]) for e in errs]))
        err_u = jnp.mean(jnp.stack([jnp.sum(e[..., h_ch:]) for e in errs]))

        gt_un = jnp.concatenate([h_un, u_un], axis=-1)
        err_gt, rolled_gt = oracle.unroll_loss(
            gt_un, gt_un, state.normalizer_input, state.normalizer_target,
            return_unroll=True)
        rolled_all = jnp.stack(rolled)
        mae_h = jnp.mean(jnp.abs(rolled_all[..., :h_ch] - rolled_gt[..., :h_ch]))
        mae_u = jnp.mean(jnp.abs(rolled_all[..., h_ch:] - rolled_gt[..., h_ch:]))
        return {
            "test_pde_unroll_error": err_u,
            "test_pde_unroll_error_gt": jnp.sum(err_gt[..., h_ch:]),
            "test_pde_unrolled_mae_h": mae_h,
            "test_pde_unrolled_mae_u": mae_u,
        }

    # --- evaluation -------------------------------------------------------------

    def eval_step(self, state, batch, key, split="val", n_samples=1,
                  mesh=None):
        fn = self._jit_cache.get(("eval", split, n_samples, mesh))
        if fn is None:
            fn = jax.jit(functools.partial(self._eval_impl, split=split,
                                           n_samples=n_samples, mesh=mesh))
            self._jit_cache[("eval", split, n_samples, mesh)] = fn
        return fn(state, batch, key)

    def _eval_impl(self, state, batch, key, *, split, n_samples, mesh=None):
        h_un, dxc, dtc, u_un = batch
        h_ch, u_ch = self.h_ch, self.u_ch
        sp = self.test_sparams
        guide_dx = bool(_sget(sp, "guide_dx", False))
        sampler_type = _sget(sp, "type", "ddim")

        state_gt = self.transform.forward(state, h_un, u_un)
        h = state_gt[..., :h_ch]
        u = state_gt[..., h_ch:h_ch + u_ch]

        def draw(k):
            if sampler_type == "edm":
                xs = self.sample_edm(state, state_gt, k, sp, guide_dx=guide_dx)
            else:
                xs = self.sample_with_repeat(state, state_gt, k, sp,
                                             guide_dx=guide_dx)
            return xs[:, -1]

        samples = chunked_ensemble(draw, jax.random.split(key, n_samples),
                                   mesh=mesh)
        if split == "test" and _sget(sp, "select_by_pde", False):
            hu_mean = self._select_best_by_pde(
                state, samples, jnp.concatenate([h_un, u_un], axis=-1),
                use_gt=bool(_sget(sp, "use_gt_pde_select", True)))
        else:
            hu_mean = jnp.mean(samples, axis=0)

        h_last, u_last = hu_mean[..., :h_ch], hu_mean[..., h_ch:h_ch + u_ch]
        loss_h, loss_u = mae(h_last, h), mae(u_last, u)
        h_last_un, u_last_un = self.transform.inverse(state, h_last, u_last)
        loss_h_un, loss_u_un = mae(h_last_un, h_un), mae(u_last_un, u_un)

        gt_scaled = scale_each_min_max(state_gt)
        # scaled metrics use the ensemble mean of per-sample scalings
        xs_scaled = jax.vmap(scale_each_min_max)(samples)
        xs_scaled_mean = jnp.mean(xs_scaled, axis=0)
        loss_h_scaled = mae(xs_scaled_mean[..., :h_ch], gt_scaled[..., :h_ch])
        loss_u_scaled = mae(xs_scaled_mean[..., h_ch:h_ch + u_ch],
                            gt_scaled[..., h_ch:h_ch + u_ch])

        corr = losses.correlation(hu_mean, state_gt)
        corr_h = jnp.mean(corr[:h_ch])
        corr_u = jnp.mean(corr[h_ch:h_ch + u_ch])

        n_batch = h_un.shape[0]
        flat = samples.reshape((-1,) + samples.shape[2:])
        pde_loss = jnp.sum(self._pde_matrix_joint(state, flat, clamp_loss=False)
                           ) / n_samples / n_batch
        pde_gt = jnp.sum(self._pde_matrix_joint(state, state_gt, clamp_loss=False)
                         ) / n_batch

        # masked unnormalized loss over the recovered region only
        n_time_h = int(_sget(sp, "n_time_h", 128))
        n_time_u = int(_sget(sp, "n_time_u", 0))
        hu_un_pred = jnp.concatenate([h_last_un, u_last_un], axis=-1)
        gt_un = jnp.concatenate([h_un, u_un], axis=-1)
        eval_mask = np.ones(hu_un_pred.shape[1:], np.float32)
        if n_time_h > 0:
            eval_mask[:n_time_h, :, :h_ch] = 0.0
        if n_time_u > 0:
            eval_mask[:n_time_u, :, h_ch:h_ch + u_ch] = 0.0
        eval_mask_b = jnp.broadcast_to(jnp.asarray(eval_mask)[None], gt_un.shape)
        loss_hu_un = losses.masked_loss(hu_un_pred, gt_un, eval_mask_b)

        p = split
        metrics = {
            f"{p}_mae_h": loss_h, f"{p}_mae_u": loss_u,
            f"{p}_mae_h_un": loss_h_un, f"{p}_mae_u_un": loss_u_un,
            f"{p}_mae_h_scaled": loss_h_scaled, f"{p}_mae_u_scaled": loss_u_scaled,
            f"{p}_corr_h": corr_h, f"{p}_corr_u": corr_u,
            f"{p}_pde_loss": pde_loss,
        }
        if split == "test":
            metrics["test_mae_hu_un"] = loss_hu_un
            metrics["test_pde_loss_gt"] = pde_gt
            # known-region consistency oracles (ddim.py:459-480): when the
            # time mask is partial, the loss on the clamped known region
            # should be ~0 — wandb-key parity with the reference's test_step
            t_all = state_gt.shape[1]
            if 0 < n_time_h < t_all:
                metrics["test_h_known"] = mae(h_last[:, :n_time_h],
                                              h[:, :n_time_h])
                metrics["test_h_kn_scaled"] = mae(
                    xs_scaled_mean[:, :n_time_h, :, :h_ch],
                    gt_scaled[:, :n_time_h, :, :h_ch])
                metrics["test_h_unkn_scaled"] = mae(
                    xs_scaled_mean[:, n_time_h:, :, :h_ch],
                    gt_scaled[:, n_time_h:, :, :h_ch])
            if t_all > n_time_u > 0:
                metrics["test_u_known"] = mae(u_last[:, :n_time_u],
                                              u[:, :n_time_u])
                metrics["test_u_kn_scaled"] = mae(
                    xs_scaled_mean[:, :n_time_u, :, h_ch:h_ch + u_ch],
                    gt_scaled[:, :n_time_u, :, h_ch:h_ch + u_ch])
                metrics["test_u_unkn_scaled"] = mae(
                    xs_scaled_mean[:, n_time_u:, :, h_ch:h_ch + u_ch],
                    gt_scaled[:, n_time_u:, :, h_ch:h_ch + u_ch])
        return metrics, hu_mean


# ===========================================================================
# PlCondDdim equivalent (single-task conditional DDPM)
# ===========================================================================

@register("models.ddim.PlCondDdim", "m_cedm_tpu.tasks.CondDdimTask")
def _build_cond_ddim(hparams, **kw):
    return CondDdimTask(hparams, **kw)


class CondDdimTask(DdimTask):
    """Conditional DDPM: h observed -> denoise u."""

    default_cond_p = 0.8

    def _channel_split(self, hparams) -> Tuple[int, int]:
        return hparams["model"]["in_channels"], hparams["model"]["out_ch"]

    # --- conditioning ----------------------------------------------------------

    def get_cond_in(self, h, u, t_grid, x_grid):
        """Assemble the conditioning channels by configured width
        (ddim.py:1081-1116)."""
        cond_ch = self.model_cfg.cond_channels - (1 if self.node_type else 0)
        h_ch, u_ch = self.h_ch, self.u_ch
        if cond_ch == h_ch:
            cond_in = h
        elif cond_ch == h_ch + u_ch:
            n_times = u.shape[1]
            u_ic = jnp.repeat(u[:, 0:1], n_times, axis=1)
            cond_in = jnp.concatenate([h, u_ic], axis=-1)
        elif cond_ch == h_ch + 2:
            cond_in = jnp.concatenate([h, t_grid, x_grid], axis=-1)
        elif cond_ch == h_ch + u_ch + 2:
            n_times = u.shape[1]
            u_ic = jnp.repeat(u[:, 0:1], n_times, axis=1)
            cond_in = jnp.concatenate([h, u_ic, t_grid, x_grid], axis=-1)
        else:
            raise ValueError(
                f"cond_channels {cond_ch} incompatible with h_ch {h_ch}")
        if self.node_type:
            b, t_dim, x_dim = h.shape[0], h.shape[1], h.shape[2]
            nt = np.zeros((1, t_dim, x_dim, 1), np.float32)
            nt[:, 0] = 1.0
            nt[:, -1] = 1.0
            nt[:, :, 0] = 1.0
            nt[:, :, -1] = 1.0
            cond_in = jnp.concatenate(
                [cond_in, jnp.broadcast_to(jnp.asarray(nt), (b, t_dim, x_dim, 1))],
                axis=-1)
        return cond_in

    # --- training ----------------------------------------------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, rng):
        h_un, dxc, dtc, u_un = batch
        n = h_un.shape[0]
        k_t, k_noise, k_sc, k_condp = jax.random.split(rng, 4)

        x = self.transform.forward(state, h_un, u_un)
        h = x[..., :self.h_ch]
        u = x[..., self.h_ch:self.h_ch + self.u_ch]
        cond_in = self.get_cond_in(h, u, dxc, dtc)
        keep = (jax.random.uniform(k_condp) < self.cond_p).astype(x.dtype)
        cond_in = cond_in * keep

        noise = jax.random.normal(k_noise, u.shape)
        t_half = jax.random.randint(k_t, (n // 2 + 1,), 0, self.num_timesteps)
        t = jnp.concatenate([t_half, self.num_timesteps - t_half - 1])[:n]
        abar = jnp.asarray(self.alphas_cumprod)[t].reshape(-1, 1, 1, 1)
        u_noise = u * jnp.sqrt(abar) + noise * jnp.sqrt(1.0 - abar)

        def net(params, x_in, t_in, x_self_cond=None):
            return self.net_apply(params, x_in, t_in.astype(jnp.float32),
                                  cond_in, x_self_cond=x_self_cond)

        def loss_fn(params):
            x_self_cond = None
            if self.self_condition:
                def with_sc(_):
                    eps_hat = jax.lax.stop_gradient(net(params, u_noise, t))
                    return (u_noise - eps_hat * jnp.sqrt(1 - abar)) / jnp.sqrt(abar)

                use_sc = jax.random.uniform(k_sc) < 0.5
                x_self_cond = jax.lax.cond(
                    use_sc, with_sc, lambda _: jnp.zeros_like(u_noise), None)
            output = net(params, u_noise, t, x_self_cond)
            loss = losses.noise_estimation_loss(output, noise)
            metrics = {"train_loss": loss}
            if self.pde_loss_lambda > 0.0:
                x0_t = (u_noise - output * jnp.sqrt(1 - abar)) / jnp.sqrt(abar)
                gt_un = (jnp.concatenate([h_un, u_un], axis=-1)
                         if self.use_gt_pde else None)
                m = self._pde_matrix_cond(state, h, x0_t, gt_un, clamp_loss=True)
                if self.pde_loss_prop_t:
                    m = m / (t.reshape(-1, 1, 1, 1).astype(m.dtype) + 1.0)
                pde = jnp.sum(m)
                metrics["train_pde_loss"] = pde
                loss = loss + self.pde_loss_lambda * pde
            return loss, metrics

        with disable_conv_fusion():
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
        return self._finish_step(state, grads, metrics)

    # --- physics with conditioning as the known state ---------------------------

    def _pde_matrix_cond(self, state, h_norm, u_denoised, x_gt_unnorm=None,
                         clamp_loss=True):
        h = h_norm[..., :self.h_ch].astype(jnp.float32)
        h_un, u_un = self.transform.inverse(state, h, u_denoised.astype(jnp.float32))
        x_unnorm = jnp.concatenate([h_un, u_un], axis=-1)
        gt = x_unnorm if x_gt_unnorm is None else x_gt_unnorm
        m = self.pde_loss(x_unnorm, gt, state.normalizer_input,
                          state.normalizer_target, clamp_loss=clamp_loss)
        if m.ndim > 3:
            m = jnp.sum(m, axis=-1)
        return m

    def _pde_guidance_cond(self, state, h_norm, calc_prob=True):
        def guidance(u_denoised):
            h = h_norm[..., :self.h_ch].astype(jnp.float32)
            h_un, u_un = self.transform.inverse(state, h,
                                                u_denoised.astype(jnp.float32))
            x_unnorm = jnp.concatenate([h_un, u_un], axis=-1)
            d = self.pde_loss(x_unnorm, x_unnorm, state.normalizer_input,
                              state.normalizer_target, return_d=True,
                              calc_prob=calc_prob)
            # gradient w.r.t. the u block only
            d_u = d[..., self.h_ch:self.h_ch + self.u_ch]
            return d_u

        return guidance

    def get_dx_input_cond(self, state, h_norm, u_denoised):
        """dx conditioning channels for conditional tasks (ddim.py:601-635):
        raw PDE gradient only for dx_norm='prob', otherwise the residual
        gradient post-processed by `_normalize_dx` (l2/gauss/min_max/clamp)."""
        if not self.dx_cond:
            return None
        guidance = self._pde_guidance_cond(
            state, h_norm, calc_prob=(self.dx_norm == "prob"))
        return self._normalize_dx(guidance(u_denoised))

    # --- samplers ----------------------------------------------------------------

    def _cond_eps_fn(self, params, cond, w: float, state=None):
        def eps(x, t, x_self_cond, key):
            del key
            t_b = jnp.broadcast_to(t, (x.shape[0],)).astype(jnp.float32)
            # dx conditioning channels recomputed per step (ddim.py:1492)
            dx = (self.get_dx_input_cond(state, cond, x)
                  if (self.dx_cond and state is not None) else None)
            if w is None or abs(w) < 1e-3:
                return self.net_apply(params, x, t_b, cond,
                                      x_self_cond=x_self_cond, dx=dx)
            e_c = self.net_apply(params, x, t_b, cond, x_self_cond=x_self_cond,
                                 dx=dx)
            e_u = self.net_apply(params, x, t_b, None, x_self_cond=x_self_cond)
            return (w + 1) * e_c - w * e_u

        return eps

    def sample(self, state, cond_in, key, sparams=None, guide_dx=False,
               return_last=True):
        """Conditional DDIM sampling (ddim.py:1452-1530)."""
        sp = sparams or self.test_sparams
        schedule = ddim_samplers.make_ddim_schedule(
            self.alphas_cumprod, _sget(sp, "timesteps", 50),
            _sget(sp, "skip_type", "uniform"), _sget(sp, "eta", 0.0))
        params = self._sample_params(state)
        eps = self._cond_eps_fn(params, cond_in, _sget(sp, "w", 0.0),
                                state=state)
        guidance = (self._pde_guidance_cond(state, cond_in) if guide_dx else None)
        shape = cond_in.shape[:3] + (self.u_ch,)
        return ddim_samplers.ddim_sample_cond(
            eps, key, shape, schedule, self_condition=self.self_condition,
            guidance_fn=guidance, return_last=return_last)

    def _cond_denoise_fn(self, params, cond, w: float, state=None):
        """DDPM net driven as an EDM denoiser with conditioning; when the
        cond is channel-concatenated it is scaled by c_in (ddim.py:930-932)."""
        steps = jnp.asarray(self.edm_steps)
        cat_condition = self.model_cfg.cat_cond

        def denoise(x, sigma, key):
            del key
            c_in = 1.0 / jnp.sqrt(sigma ** 2 + 1.0)
            idx = jnp.argmin(jnp.abs(steps - sigma))
            c_noise = (self.num_timesteps - 1 - idx).astype(jnp.float32)
            t_b = jnp.full((x.shape[0],), c_noise)
            cond_in = cond * c_in if cat_condition else cond
            dx = (self.get_dx_input_cond(state, cond, x)
                  if (self.dx_cond and state is not None) else None)
            if w is None or abs(w) < 1e-3:
                F_x = self.net_apply(params, c_in * x, t_b, cond_in, dx=dx)
            else:
                F_c = self.net_apply(params, c_in * x, t_b, cond_in, dx=dx)
                F_u = self.net_apply(params, c_in * x, t_b, None)
                F_x = (w + 1) * F_c - w * F_u
            return x - sigma * F_x

        return denoise

    def sample_edm(self, state, cond_in, key, sparams=None, guide_dx=False,
                   return_last=True):
        """Conditional DDPM-as-EDM Heun sampling (ddim.py:1532-1601)."""
        sp = sparams or self.test_sparams
        schedule = edm_samplers.make_edm_schedule(
            num_steps=_sget(sp, "timesteps", 50),
            sigma_min=max(_sget(sp, "sigma_min", 0.002), self.sigma_min),
            sigma_max=min(_sget(sp, "sigma_max", 80), self.sigma_max),
            rho=_sget(sp, "rho", 7.0), S_churn=_sget(sp, "S_churn", 0.0),
            S_min=_sget(sp, "S_min", 0.0), S_max=float(_sget(sp, "S_max", "inf")),
            S_noise=_sget(sp, "S_noise", 1.0), sigma_table=self.edm_steps)
        params = self._sample_params(state)
        denoise = self._cond_denoise_fn(params, cond_in, _sget(sp, "w", 0.0),
                                        state=state)
        guidance = (self._pde_guidance_cond(state, cond_in) if guide_dx else None)
        shape = cond_in.shape[:3] + (self.u_ch,)
        return edm_samplers.heun_sample_cond(
            denoise, key, shape, schedule, guidance_fn=guidance,
            return_last=return_last, guidance_div_t=True)

    # --- evaluation ----------------------------------------------------------------

    def _eval_impl(self, state, batch, key, *, split, n_samples, mesh=None):
        h_un, dxc, dtc, u_un = batch
        h_ch, u_ch = self.h_ch, self.u_ch
        sp = self.test_sparams
        guide_dx = bool(_sget(sp, "guide_dx", False))
        sampler_type = _sget(sp, "type", "ddim")

        state_gt = self.transform.forward(state, h_un, u_un)
        h = state_gt[..., :h_ch]
        u = state_gt[..., h_ch:h_ch + u_ch]
        cond_in = self.get_cond_in(h, u, dxc, dtc)

        def draw(k):
            if sampler_type == "edm":
                xs = self.sample_edm(state, cond_in, k, sp, guide_dx=guide_dx)
            else:
                xs = self.sample(state, cond_in, k, sp, guide_dx=guide_dx)
            return xs[:, -1]

        samples = chunked_ensemble(draw, jax.random.split(key, n_samples),
                                   mesh=mesh)
        if split == "test" and _sget(sp, "select_by_pde", False):
            # score the joint [h | u_sample] field (ddim.py:1259-1273)
            h_rep = jnp.broadcast_to(h[None], (n_samples,) + h.shape)
            joint = jnp.concatenate([h_rep, samples], axis=-1)
            best = self._select_best_by_pde(
                state, joint, jnp.concatenate([h_un, u_un], axis=-1),
                use_gt=bool(_sget(sp, "use_gt_pde_select", True)))
            u_mean = best[..., h_ch:h_ch + u_ch]
        else:
            u_mean = jnp.mean(samples, axis=0)

        u_last = u_mean[..., :u_ch]
        loss_u = mae(u_last, u)
        u_last_un = self._inverse_u(state, u_last)
        loss_u_un = mae(u_last_un, u_un)

        gt_scaled = scale_each_min_max(state_gt)
        xs_scaled = jax.vmap(scale_each_min_max)(samples)
        xs_scaled_mean = jnp.mean(xs_scaled, axis=0)
        loss_u_scaled = mae(xs_scaled_mean, gt_scaled[..., h_ch:h_ch + u_ch])

        corr_u = jnp.mean(losses.correlation(u_mean, u))

        n_batch = h_un.shape[0]
        h_rep = jnp.broadcast_to(h[None], (n_samples,) + h.shape)
        flat_u = samples.reshape((-1,) + samples.shape[2:])
        flat_h = h_rep.reshape((-1,) + h.shape[1:])
        pde_loss = jnp.sum(self._pde_matrix_cond(state, flat_h, flat_u,
                                                 clamp_loss=False)) / n_samples / n_batch
        pde_gt = jnp.sum(self._pde_matrix_cond(state, h, u, clamp_loss=False)) / n_batch

        p = split
        metrics = {
            f"{p}_mae_u": loss_u, f"{p}_mae_u_un": loss_u_un,
            f"{p}_mae_u_scaled": loss_u_scaled, f"{p}_corr_u": corr_u,
            f"{p}_pde_loss": pde_loss,
        }
        if split == "test":
            metrics["test_pde_loss_gt"] = pde_gt
        return metrics, u_mean

    def _inverse_u(self, state, u):
        if self.transform.rescaled:
            u = (u + 1.0) / 2.0
        if self.transform.normalization == "min_max":
            u = jnp.clip(u, 0.0, 1.0)
        return state.normalizer_target(u, inverse=True)


# ===========================================================================
# PlCondEdm equivalent (single-task conditional EDM)
# ===========================================================================

@register("models.ddim.PlCondEdm", "m_cedm_tpu.tasks.CondEdmTask")
def _build_cond_edm(hparams, **kw):
    return CondEdmTask(hparams, **kw)


class CondEdmTask(CondDdimTask):
    """Conditional model trained with true EDM preconditioning; only the EDM
    sampler is supported (ddim.py:1647-1652)."""

    def default_sampler_params(self):
        return dict(DEFAULT_EDM_SAMPLER)

    def set_test_sampler_params(self, sparams):
        if _sget(sparams, "type") != "edm":
            sparams = dict(DEFAULT_EDM_SAMPLER, n_samples=5)
        super().set_test_sampler_params(sparams)

    def model_precond(self, params, x_noise, sigma, cond=None, x_self_cond=None,
                      dx=None):
        sigma = jnp.asarray(sigma, jnp.float32).reshape(-1, 1, 1, 1)
        c_skip, c_out, c_in, c_noise = edm_precond_coeffs(sigma, SIGMA_DATA)
        F_x = self.net_apply(params, c_in * x_noise, c_noise.reshape(-1),
                             cond, x_self_cond=x_self_cond, dx=dx)
        return c_skip * x_noise + c_out * F_x

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, rng):
        h_un, dxc, dtc, u_un = batch
        n = h_un.shape[0]
        k_sigma, k_noise, k_sc, k_condp = jax.random.split(rng, 4)

        x = self.transform.forward(state, h_un, u_un)
        h = x[..., :self.h_ch]
        u = x[..., self.h_ch:self.h_ch + self.u_ch]
        cond_in = self.get_cond_in(h, u, dxc, dtc)
        keep = (jax.random.uniform(k_condp) < self.cond_p).astype(x.dtype)
        cond_in = cond_in * keep

        noise = jax.random.normal(k_noise, u.shape)
        rnd_normal = jax.random.normal(k_sigma, (n, 1, 1, 1))
        sigma = edm_train_sigma(rnd_normal, P_MEAN, P_STD)
        weight = edm_loss_weight(sigma, SIGMA_DATA)
        u_noise = u + noise * sigma

        def loss_fn(params):
            x_self_cond = None
            if self.self_condition:
                def with_sc(_):
                    return jax.lax.stop_gradient(
                        self.model_precond(params, u_noise, sigma, cond_in))

                use_sc = jax.random.uniform(k_sc) < 0.5
                x_self_cond = jax.lax.cond(
                    use_sc, with_sc, lambda _: jnp.zeros_like(u_noise), None)
            D_x = self.model_precond(params, u_noise, sigma, cond_in,
                                     x_self_cond=x_self_cond)
            loss = losses.noise_estimation_loss(D_x, u, weight)
            metrics = {"train_loss": loss}
            if self.pde_loss_lambda > 0.0:
                gt_un = (jnp.concatenate([h_un, u_un], axis=-1)
                         if self.use_gt_pde else None)
                m = self._pde_matrix_cond(state, h, D_x, gt_un, clamp_loss=True)
                if self.pde_loss_prop_t:
                    m = m / (sigma + 1.0)
                pde = jnp.sum(m)
                metrics["train_pde_loss"] = pde
                loss = loss + self.pde_loss_lambda * pde
            return loss, metrics

        with disable_conv_fusion():
            (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params)
        return self._finish_step(state, grads, metrics)

    def _cond_denoise_fn(self, params, cond, w: float, state=None):
        """True EDM preconditioning (no c_in cond scaling, no sigma table).
        Accepts an optional self-conditioning input (ddim.py:1770-1773)."""

        def denoise(x, sigma, key, x_sc=None):
            del key
            sig_b = sigma * jnp.ones((x.shape[0],))
            dx = (self.get_dx_input_cond(state, cond, x)
                  if (self.dx_cond and state is not None) else None)
            if w is None or abs(w) < 1e-3:
                return self.model_precond(params, x, sig_b, cond,
                                          x_self_cond=x_sc, dx=dx)
            d_c = self.model_precond(params, x, sig_b, cond, x_self_cond=x_sc,
                                     dx=dx)
            d_u = self.model_precond(params, x, sig_b, None, x_self_cond=x_sc)
            return (w + 1) * d_c - w * d_u

        return denoise

    def sample_edm(self, state, cond_in, key, sparams=None, guide_dx=False,
                   return_last=True):
        sp = sparams or self.test_sparams
        schedule = edm_samplers.make_edm_schedule(
            num_steps=_sget(sp, "timesteps", 50),
            sigma_min=max(_sget(sp, "sigma_min", 0.002), SIGMA_MIN),
            sigma_max=min(_sget(sp, "sigma_max", 80), SIGMA_MAX),
            rho=_sget(sp, "rho", 7.0), S_churn=_sget(sp, "S_churn", 0.0),
            S_min=_sget(sp, "S_min", 0.0), S_max=float(_sget(sp, "S_max", "inf")),
            S_noise=_sget(sp, "S_noise", 1.0))
        params = self._sample_params(state)
        denoise = self._cond_denoise_fn(params, cond_in, _sget(sp, "w", 0.0),
                                        state=state)
        guidance = (self._pde_guidance_cond(state, cond_in) if guide_dx else None)
        shape = cond_in.shape[:3] + (self.u_ch,)
        return edm_samplers.heun_sample_cond(
            denoise, key, shape, schedule, guidance_fn=guidance,
            return_last=return_last, guidance_div_t=True,
            self_condition=self.self_condition)

    def sample(self, *args, **kwargs):
        raise NotImplementedError(
            "Only EDM sampler is supported for the model with EDM pre-conditioning")

    def sample_with_repeat(self, *args, **kwargs):
        raise NotImplementedError(
            "Only EDM sampler is supported for the model with EDM pre-conditioning")
