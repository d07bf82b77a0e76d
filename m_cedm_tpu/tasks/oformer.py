"""OFormer tasks.

Parity targets:
  OformerTask            <- PlOformer           (models/oformer.py:927-1186)
  OformerTimePredTask    <- PlOformerTimePred   (models/oformer.py:1189-1444)
  OformerStateTimePredTask <- PlOformerStateTimePred (models/oformer.py:1447-1652)

AdamW + OneCycleLR (div_factor=1e4, pct_start=0.3, final_div_factor=1e4,
cosine) is optax.cosine_onecycle_schedule. The curriculum on forward steps
(oformer.py:1055-1063) is decided host-side from the step counter; for the
grid datasets forward_steps == 1 so it is a no-op, matching the reference.
The Gaussian-Fourier 'constants' collection is carried in TrainState but
receives zero gradient (stop_gradient) and is excluded from weight decay.
"""
from __future__ import annotations

import functools
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from m_cedm_tpu.config import register
from m_cedm_tpu.models.oformer import (
    IrregSTDecoder,
    IrregSTEncoder,
    OformerDecoderConfig,
    OformerEncoderConfig,
)
from m_cedm_tpu.ops import losses
from m_cedm_tpu.physics.pde_loss import get_pde_loss_function
from m_cedm_tpu.tasks.base import TrainState, mae, normalizers_from_stats


class OformerModel(nn.Module):
    enc_cfg: OformerEncoderConfig
    dec_cfg: OformerDecoderConfig
    dtype: Optional[jnp.dtype] = None  # bf16 compute / fp32 master + stats

    @nn.compact
    def __call__(self, x, node_type_inp, node_type_prop, input_pos, prop_pos,
                 forward_steps: int, deterministic: bool = True):
        x = x.astype(self.dtype or x.dtype)
        z = IrregSTEncoder(self.enc_cfg, name="encoder", dtype=self.dtype)(
            x, node_type_inp, input_pos, deterministic)
        return IrregSTDecoder(self.dec_cfg, name="decoder", dtype=self.dtype)(
            z, prop_pos, node_type_prop, forward_steps, input_pos, deterministic)


def _wd_mask(variables):
    """Weight decay only for the trainable 'params' subtree."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: path[0].key == "params", variables)


@register("models.oformer.PlOformer", "m_cedm_tpu.tasks.OformerTask")
def _build_oformer(hparams, **kw):
    return OformerTask(hparams, **kw)


class OformerTask:
    """Space-time token reconstruction with the OFormer encoder/decoder."""

    def __init__(self, hparams, grad_clip: Optional[float] = 2.0,
                 steps_per_epoch: Optional[int] = None,
                 max_epochs: Optional[int] = None):
        self.hparams = hparams
        self.enc_cfg = OformerEncoderConfig.from_hparams(hparams["encoder"])
        self.dec_cfg = OformerDecoderConfig.from_hparams(hparams["decoder"])
        # mixed precision (run.py maps trainer.precision=bf16 onto
        # hparams['dtype'], mirroring the diffusion tasks): bf16 compute,
        # fp32 params/optimizer and fp32 norm statistics in the model
        dtype_name = hparams.get("dtype", "float32")
        self.compute_dtype = (jnp.bfloat16
                              if dtype_name in ("bfloat16", "bf16") else None)
        self.model = OformerModel(self.enc_cfg, self.dec_cfg,
                                  dtype=self.compute_dtype)
        self.time_history = hparams.get("time_history", 128)
        self.loss_kind = hparams.get("loss", "mse")
        self.lr = hparams["lr"]
        self.weight_decay = hparams.get("weight_decay", 1e-4)
        self.curriculum_steps = hparams.get("curriculum_steps", 0)
        self.curriculum_ratio = hparams.get("curriculum_ratio", 0.2)
        self.grad_clip = grad_clip
        self.norm_input = True
        self.norm_target = True
        self.down_factor = 1
        self.total_steps = None
        self.pde_loss, self.pde_loss_simulator = get_pde_loss_function("swe", False)
        self.configure_lr_schedule(steps_per_epoch, max_epochs)
        self._jit_cache = {}

    # -- wiring -------------------------------------------------------------

    def set_pde_loss_function(self, system: str, flip_xy: bool):
        Tn_mult = self.time_history / 128
        self.pde_loss, self.pde_loss_simulator = get_pde_loss_function(
            system, flip_xy, Tn_mult=Tn_mult)
        self._jit_cache = {}

    def configure_lr_schedule(self, steps_per_epoch: Optional[int],
                              max_epochs: Optional[int] = None):
        if steps_per_epoch and max_epochs:
            self.total_steps = steps_per_epoch * max_epochs
            # optax's onecycle yields NaN when the warmup segment rounds to
            # zero steps (int(0.3 * total) == 0, division by zero inside) —
            # degenerate tiny runs (smoke tests) fall back to a constant lr
            if int(0.3 * self.total_steps) >= 1:
                sched = optax.cosine_onecycle_schedule(
                    transition_steps=self.total_steps, peak_value=self.lr,
                    pct_start=0.3, div_factor=1e4, final_div_factor=1e4)
            else:
                sched = self.lr
        else:
            sched = self.lr
        tx = optax.adamw(sched, weight_decay=self.weight_decay, mask=_wd_mask)
        if self.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
        self.tx = tx
        self._jit_cache = {}

    def set_norm_flags(self, stats):
        self.norm_input = bool(stats.get("norm_input", True))
        self.norm_target = bool(stats.get("norm_target", True))

    def init_state(self, rng, norm_stats=None) -> TrainState:
        if norm_stats is not None:
            self.set_norm_flags(norm_stats)
            n_in, n_tar = self._build_normalizers(norm_stats)
        else:
            from m_cedm_tpu.ops.normalizer import Normalizer
            n_in, n_tar = Normalizer.identity(()), Normalizer.identity(())
        variables = self._init_variables(rng)
        return TrainState(params=variables, ema_params=None,
                          opt_state=self.tx.init(variables),
                          step=jnp.zeros((), jnp.int32),
                          normalizer_input=n_in, normalizer_target=n_tar)

    def _build_normalizers(self, stats):
        return normalizers_from_stats(stats, "gauss")

    def _init_variables(self, rng):
        n_tok = 64
        x = jnp.zeros((1, 1, n_tok, self.enc_cfg.input_channels))
        nt = jnp.zeros((1, n_tok, 1), jnp.int32)
        pos = jnp.zeros((1, n_tok, 2))
        return jax.jit(
            functools.partial(self.model.init, forward_steps=1)
        )(rng, x, nt, nt, pos, pos)

    # -- forward ------------------------------------------------------------

    def _criterion(self, pred, target):
        # MultiLoss: sum over channels, mean over tokens and batch
        m = jnp.sum(jnp.square(pred - target), axis=-1)
        return jnp.mean(m)

    def _pair_target(self, state, s):
        if self.norm_target:
            return s, state.normalizer_target(s, inverse=True)
        return state.normalizer_target(s), s

    def _curriculum_forward_steps(self, step: int, forward_steps: int) -> int:
        if self.curriculum_steps <= 0 or not self.total_steps:
            return forward_steps
        limit = int(self.curriculum_ratio * self.total_steps)
        if step >= limit:
            return forward_steps
        progress = (step * 2) / limit
        c = self.curriculum_steps + int(
            max(0.0, progress - 1.0) * ((forward_steps - self.curriculum_steps) / 2.0)) * 2
        return min(max(c, 1), forward_steps)

    # -- training -----------------------------------------------------------

    def train_step(self, state: TrainState, batch, rng):
        forward_steps = int(batch[1].shape[1])
        c_steps = self._curriculum_forward_steps(int(state.step), forward_steps)
        fn = self._jit_cache.get(("train", c_steps, batch[0].shape))
        if fn is None:
            fn = jax.jit(functools.partial(self._train_impl, c_steps=c_steps))
            self._jit_cache[("train", c_steps, batch[0].shape)] = fn
        return fn(state, batch, rng)

    def _unpack(self, batch):
        """(x, y, nt_inp, nt_prop, input_pos, prop_pos)."""
        x, y, node_type, pos, n_time = batch
        return x, y, node_type, node_type, pos, pos

    def _train_impl(self, state, batch, rng, *, c_steps):
        x, y, nt_inp, nt_prop, in_pos, pr_pos = self._unpack(batch)
        y = y[:, :c_steps]
        y_norm, _ = self._pair_target(state, y)

        def loss_fn(variables):
            pred = self.model.apply(variables, x, nt_inp, nt_prop, in_pos,
                                    pr_pos, c_steps, deterministic=False,
                                    rngs={"dropout": rng})
            return self._criterion(pred, y_norm)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), {"train_loss": loss}

    # -- evaluation ----------------------------------------------------------

    def eval_step(self, state, batch, rng=None, split="val"):
        key = ("eval", split, batch[0].shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            n_time = int(batch[-1][0])
            fn = jax.jit(functools.partial(self._eval_impl, split=split,
                                           n_time=n_time))
            self._jit_cache[key] = fn
        return fn(state, batch)

    def _eval_impl(self, state, batch, *, split, n_time):
        x, y, nt_inp, nt_prop, in_pos, pr_pos = self._unpack(batch)
        forward_steps = y.shape[1]
        y_norm, y_unnorm = self._pair_target(state, y)

        pred = self.model.apply(state.params, x, nt_inp, nt_prop, in_pos,
                                pr_pos, forward_steps)
        down = self.down_factor if split == "test" else 1
        loss = self._criterion(pred, y_norm)
        mae_loss = losses.downsampled_loss(pred, y_norm, down)
        pred_un = state.normalizer_target(pred, inverse=True)
        mae_un = losses.downsampled_loss(pred_un, y_unnorm, down)
        corr = jnp.mean(losses.correlation(pred, y_norm))
        scaled = losses.scaled_mae_loss(pred, y_norm)

        p = split
        metrics = {
            f"{p}_loss": loss, f"{p}_mae_u": mae_loss, f"{p}_mae_u_un": mae_un,
            f"{p}_corr": corr, f"{p}_mae_u_scaled": scaled,
        }
        pde = self._pde_metrics(state, x, pred, y_norm, n_time, split)
        metrics.update(pde)
        grid_pred = pred.reshape(pred.shape[0], n_time, -1, pred.shape[-1])
        return metrics, grid_pred

    def _pde_metrics(self, state, x, pred, y_norm, n_time, split):
        if pred.shape[1] != 1:
            return {}
        b = pred.shape[0]
        pred_g = pred.reshape(b, n_time, -1, pred.shape[-1])
        y_g = y_norm.reshape(b, n_time, -1, pred.shape[-1])
        x_g = x.reshape(b, n_time, -1, x.shape[-1])[..., :-2]  # drop t,x coords
        pde = self._pde(state, x_g, pred_g)
        pde_gt = self._pde(state, x_g, y_g)
        return {f"{split}_pde_loss": pde, f"{split}_pde_loss_gt": pde_gt}

    def _pde(self, state, cond, pred):
        cond_un = state.normalizer_input(cond, inverse=True)
        pred_un = state.normalizer_target(pred, inverse=True)
        x_un = jnp.concatenate([cond_un, pred_un], axis=-1)
        m = self.pde_loss(x_un, x_un, state.normalizer_input,
                          state.normalizer_target, clamp_loss=False)
        return jnp.sum(m) / cond.shape[0]

    @staticmethod
    def eval_target(batch):
        """Grid-shaped target for plotting callbacks: (B, T, X, C)."""
        y = np.asarray(batch[1])
        n_time = int(np.asarray(batch[-1])[0])
        return y.reshape(y.shape[0], n_time, -1, y.shape[-1])


@register("models.oformer.PlOformerTimePred", "m_cedm_tpu.tasks.OformerTimePredTask")
def _build_oformer_timepred(hparams, **kw):
    return OformerTimePredTask(hparams, **kw)


class OformerTimePredTask(OformerTask):
    """Future prediction: separate input/prop token sets; normalizers span
    the concatenated (u, s) channels (oformer.py:1232-1263)."""

    def set_pde_loss_function(self, system: str, flip_xy: bool):
        self.pde_loss, self.pde_loss_simulator = get_pde_loss_function(
            system, flip_xy)
        self._jit_cache = {}

    def _build_normalizers(self, stats):
        def vec(v):
            v = np.asarray(v, np.float32).reshape(-1)
            return v

        mean = np.concatenate([vec(stats["input_mean"]), vec(stats["target_mean"])])
        std = np.concatenate([vec(stats["input_std"]), vec(stats["target_std"])])
        from m_cedm_tpu.ops.normalizer import Normalizer

        # per-state normalizers used by the PDE residual scaling
        self.normalizer_state1 = Normalizer.gauss(
            np.float32(stats["input_mean"]), np.float32(stats["input_std"]))
        self.normalizer_state2 = Normalizer.gauss(
            np.float32(stats["target_mean"]), np.float32(stats["target_std"]))
        n = Normalizer.gauss(mean, std)
        return n, n

    def _unpack(self, batch):
        x, y, nt_inp, nt_prop, in_pos, pr_pos, n_time = batch
        return x, y, nt_inp, nt_prop, in_pos, pr_pos

    def _pde_metrics(self, state, x, pred, y_norm, n_time, split):
        # PDE residual of [history | prediction] concatenated over time,
        # scaled by the per-state normalizers (oformer.py:1430-1444)
        if pred.shape[1] != 1 or not hasattr(self, "normalizer_state1"):
            return {}
        b, c = pred.shape[0], pred.shape[-1]
        pred_g = pred.reshape(b, n_time, -1, c)
        y_g = y_norm.reshape(b, n_time, -1, c)
        x_in = x.reshape(b, -1, pred_g.shape[2], x.shape[-1])[..., :c]
        full_pred = jnp.concatenate([x_in, pred_g], axis=1)
        full_gt = jnp.concatenate([x_in, y_g], axis=1)
        pred_un = state.normalizer_target(full_pred, inverse=True)
        y_un = state.normalizer_target(full_gt, inverse=True)
        m = self.pde_loss(pred_un, pred_un, self.normalizer_state1,
                          self.normalizer_state2, clamp_loss=False)
        m_gt = self.pde_loss(y_un, y_un, self.normalizer_state1,
                             self.normalizer_state2, clamp_loss=False)
        return {f"{split}_pde_loss": jnp.sum(m) / b,
                f"{split}_pde_loss_gt": jnp.sum(m_gt) / b}

    def _pde(self, state, cond, pred):  # pragma: no cover - unused here
        raise NotImplementedError


@register("models.oformer.PlOformerStateTimePred",
          "m_cedm_tpu.tasks.OformerStateTimePredTask")
def _build_oformer_statetime(hparams, **kw):
    return OformerStateTimePredTask(hparams, **kw)


class OformerStateTimePredTask:
    """Two-stage OFormer (reconstruct states -> predict future), test-only."""

    def __init__(self, hparams, grad_clip=None, steps_per_epoch=None,
                 max_epochs=None):
        self.model_state = OformerTask(hparams["hparams_state"])
        self.model_time = OformerTimePredTask(hparams["hparams_time"])
        self.time_history = hparams.get("time_history", 64)
        self.down_factor = 1
        self.pde_loss, _ = get_pde_loss_function("swe", False)

    def set_pde_loss_function(self, system: str, flip_xy: bool):
        self.pde_loss, _ = get_pde_loss_function(system, flip_xy)
        self.model_state.set_pde_loss_function(system, flip_xy)
        self.model_time.set_pde_loss_function(system, flip_xy)

    def test_step(self, state_reconstr: TrainState, state_time: TrainState,
                  reconstr_batch, timepred_batch):
        """Stage 1: reconstruct the unobserved state on the history window;
        stage 2: predict the future from [observed, reconstructed]."""
        x, y, node_type, pos, n_time = reconstr_batch
        n_hist = self.time_history
        b = x.shape[0]
        # reconstruct over the history tokens
        x_tok = x.reshape(b, int(n_time[0]), -1, x.shape[-1])[:, :n_hist]
        ntok_x = x_tok.shape[1] * x_tok.shape[2]
        x_hist = x_tok.reshape(b, 1, ntok_x, x.shape[-1])
        nt = node_type.reshape(b, int(n_time[0]), -1, 1)[:, :n_hist].reshape(b, ntok_x, 1)
        ps = pos.reshape(b, int(n_time[0]), -1, 2)[:, :n_hist].reshape(b, ntok_x, 2)
        s_hat = self.model_state.model.apply(
            state_reconstr.params, x_hist, nt, nt, ps, ps, 1)

        # assemble the time-pred input: [u_hist, s_hat, coords]
        xt, yt, nt_inp, nt_prop, in_pos, pr_pos, n_time_t = timepred_batch
        u_ch = x.shape[-1] - 2  # drop t, x coordinate channels
        s_ch = s_hat.shape[-1]
        coords = x_hist[..., u_ch:]
        u_hist = x_hist[..., :u_ch]
        state_in = jnp.concatenate([u_hist, s_hat, coords], axis=-1)

        pred = self.model_time.model.apply(
            state_time.params, state_in, nt_inp, nt_prop, in_pos, pr_pos, 1)

        # stage-1 reconstruction error against the true target tokens on the
        # history window
        y_tok = y.reshape(b, int(n_time[0]), -1, y.shape[-1])[:, :n_hist]
        y_hist = y_tok.reshape(b, 1, ntok_x, y.shape[-1])
        s_hat_un = state_reconstr.normalizer_target(s_hat, inverse=True)
        y_hist_un = state_reconstr.normalizer_target(y_hist, inverse=True)

        y_norm, y_unnorm = self.model_time._pair_target(state_time, yt)
        pred_un = state_time.normalizer_target(pred, inverse=True)
        metrics = {
            "test_mae_un_rec": mae(s_hat_un, y_hist_un),
            "test_mae_un_pred": mae(pred_un, y_unnorm),
            "test_mae_un": mae(pred_un, y_unnorm),
        }
        return metrics, pred
