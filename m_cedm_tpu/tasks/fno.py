"""FNO supervised tasks.

Parity targets:
  FnoStateReconstrTask <- PlFnoStateReconstr2d (models/fno_state_2d.py:121-354)
                          supervised state reconstruction u(h)
  FnoTimePredTask      <- PlFnoTimePred2d      (models/fno_state_2d.py:357-599)
                          future-state prediction from the first half
  FnoStateTimePredTask <- PlFnoStateTimePred2d (models/fno_state_2d.py:602-782)
                          two-stage reconstruct-then-predict, test-only
  Fno2dTask            <- PlFno2d              (models/fno_2d.py:129-238)
                          autoregressive stepper w/ teacher forcing

All are pure-jitted train/eval over TrainState; Adam + StepLR(step_size
epochs, gamma=factor) is an optax schedule parameterized by steps_per_epoch.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from m_cedm_tpu.config import register
from m_cedm_tpu.models.fno import Fno2d, FnoConfig, FnoState2d
from m_cedm_tpu.ops import losses
from m_cedm_tpu.physics.pde_loss import get_pde_loss_function
from m_cedm_tpu.tasks.base import TrainState, mae, normalizers_from_stats


def _criterion(kind: str):
    if kind == "l1":
        return lambda p, t: jnp.mean(jnp.abs(p - t))
    if kind in ("l2", "mse"):
        return lambda p, t: jnp.mean(jnp.square(p - t))
    if kind == "smooth_l1":
        def f(p, t):
            d = jnp.abs(p - t)
            return jnp.mean(jnp.where(d < 1, 0.5 * jnp.square(p - t), d - 0.5))

        return f
    if kind == "lp":
        return lambda p, t: losses.lp_loss(p, t, p=2, reduction="sum")
    raise ValueError(kind)


class FnoTaskBase:
    """Shared: model, StepLR optimizer, normalizer plumbing, PDE loss."""

    def __init__(self, hparams, grad_clip: Optional[float] = None,
                 steps_per_epoch: Optional[int] = None):
        self.hparams = hparams
        self.cfg = FnoConfig.from_hparams(hparams)
        self.model = self._build_model()
        self.time_history = hparams.get("time_history", 128)
        self.criterion = _criterion(hparams.get("loss", "l1"))
        self.lr = hparams["lr"]
        self.weight_decay = hparams.get("weight_decay", 0.0)
        self.factor = hparams.get("factor", 0.3)
        self.step_size = hparams.get("step_size", 50)
        self.grad_clip = grad_clip
        self.norm_input = True
        self.norm_target = True
        self.down_factor = 1
        self.pde_loss, self.pde_loss_simulator = get_pde_loss_function("swe", False)
        self.configure_lr_schedule(steps_per_epoch)
        self._jit_cache = {}

    def _build_model(self):
        return FnoState2d(self.cfg)

    def configure_lr_schedule(self, steps_per_epoch: Optional[int]):
        """Adam + torch-StepLR(step_size epochs, gamma=factor) equivalence."""
        if steps_per_epoch:
            sched = lambda step: self.lr * self.factor ** (
                (step // steps_per_epoch) // self.step_size)
        else:
            sched = self.lr
        tx = optax.adam(sched)
        if self.weight_decay:
            tx = optax.chain(optax.add_decayed_weights(self.weight_decay), tx)
        if self.grad_clip:
            tx = optax.chain(optax.clip_by_global_norm(self.grad_clip), tx)
        self.tx = tx
        self._jit_cache = {}

    def set_pde_loss_function(self, system: str, flip_xy: bool):
        Tn_mult = getattr(self, "_tn_mult", 1.0)
        self.pde_loss, self.pde_loss_simulator = get_pde_loss_function(
            system, flip_xy, Tn_mult=Tn_mult)
        self._jit_cache = {}

    def set_norm_flags(self, stats):
        self.norm_input = bool(stats.get("norm_input", True))
        self.norm_target = bool(stats.get("norm_target", True))

    def init_state(self, rng, norm_stats=None) -> TrainState:
        if norm_stats is not None:
            self.set_norm_flags(norm_stats)
            n_in, n_tar = normalizers_from_stats(norm_stats, "gauss")
        else:
            from m_cedm_tpu.ops.normalizer import Normalizer
            n_in, n_tar = Normalizer.identity(()), Normalizer.identity(())
        params = self._init_params(rng)
        return TrainState(params=params, ema_params=None,
                          opt_state=self.tx.init(params),
                          step=jnp.zeros((), jnp.int32),
                          normalizer_input=n_in, normalizer_target=n_tar)

    def _init_params(self, rng):
        t = self.time_history
        x0 = jnp.zeros((1, 16, t, self.cfg.input_size), jnp.float32)
        return jax.jit(self.model.init)(rng, x0)

    def _apply_updates(self, state, grads, metrics):
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(params=params, opt_state=opt_state,
                             step=state.step + 1), metrics

    # --- normalization helpers (reference get_unnorm_* semantics) ----------

    def _pair_target(self, state, s):
        if self.norm_target:
            return s, state.normalizer_target(s, inverse=True)
        return state.normalizer_target(s), s

    def _pair_input(self, state, u):
        if self.norm_input:
            return u, state.normalizer_input(u, inverse=True)
        return state.normalizer_input(u), u

    def _coords(self, x, t):
        """(B,) spacings pass through; gridded coords -> model-side grids."""
        if x.ndim == 1 and t.ndim == 1:
            return x, t
        return None, None


@register("models.fno_state_2d.PlFnoStateReconstr2d",
          "m_cedm_tpu.tasks.FnoStateReconstrTask")
def _build_fno_reconstr(hparams, **kw):
    return FnoStateReconstrTask(hparams, **kw)


class FnoStateReconstrTask(FnoTaskBase):
    """Reconstruct the unobserved state s from the observed field u."""

    def set_pde_loss_function(self, system: str, flip_xy: bool):
        self._tn_mult = self.time_history / 128
        super().set_pde_loss_function(system, flip_xy)

    def _predict(self, params, u, x, t):
        t_hist = self.time_history
        u_hist = u[:, :t_hist]
        inp = jnp.transpose(u_hist, (0, 2, 1, 3))  # B,T,X,C -> B,X,T,C
        dx, dt = self._coords(x, t)
        return self.model.apply(params, inp, dx, dt)  # (B, T, X, C)

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, rng):
        u, x, t, s = batch
        s, s_unnorm = self._pair_target(state, s)
        t_hist = self.time_history
        s_gt = s[:, :t_hist]

        def loss_fn(params):
            pred = self._predict(params, u, x, t)
            return self.criterion(pred, s_gt), pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        pred_un = state.normalizer_target(pred, inverse=True)
        metrics = {
            "train_loss": loss,
            "train_mae_u": mae(pred, s_gt),
            "train_mae_u_un": mae(pred_un, s_unnorm[:, :t_hist]),
        }
        return self._apply_updates(state, grads, metrics)

    def eval_step(self, state, batch, rng=None, split="val"):
        key = ("eval", split, batch[0].shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(self._eval_impl, split=split))
            self._jit_cache[key] = fn
        return fn(state, batch)

    def _eval_impl(self, state, batch, *, split):
        u, x, t, s = batch
        s, s_unnorm = self._pair_target(state, s)
        t_hist = self.time_history
        s_gt = s[:, :t_hist]
        u_hist = u[:, :t_hist]
        pred = self._predict(state.params, u, x, t)

        down = self.down_factor if split == "test" else 1
        loss = self.criterion(pred, s_gt)
        mae_loss = losses.downsampled_loss(pred, s_gt, down)
        corr = jnp.mean(losses.correlation(pred, s_gt))
        pred_un = state.normalizer_target(pred, inverse=True)
        mae_un = losses.downsampled_loss(pred_un, s_unnorm[:, :t_hist], down)
        scaled = losses.scaled_mae_loss(pred, s_gt)

        pde = self._pde(state, u_hist, pred)
        pde_gt = self._pde(state, u_hist, s_gt)

        p = split
        metrics = {
            f"{p}_loss": loss, f"{p}_mae_u": mae_loss, f"{p}_mae_u_un": mae_un,
            f"{p}_corr": corr, f"{p}_mae_u_scaled": scaled,
            f"{p}_pde_loss": pde, f"{p}_pde_loss_gt": pde_gt,
        }
        return metrics, pred

    def _pde(self, state, cond, pred):
        cond_un = state.normalizer_input(cond, inverse=True)
        pred_un = state.normalizer_target(pred, inverse=True)
        x_un = jnp.concatenate([cond_un, pred_un], axis=-1)
        m = self.pde_loss(x_un, x_un, state.normalizer_input,
                          state.normalizer_target, clamp_loss=False)
        return jnp.sum(m) / cond.shape[0]


@register("models.fno_state_2d.PlFnoTimePred2d",
          "m_cedm_tpu.tasks.FnoTimePredTask")
def _build_fno_timepred(hparams, **kw):
    return FnoTimePredTask(hparams, **kw)


class FnoTimePredTask(FnoTaskBase):
    """Predict future (u, s) from the first time_history steps."""

    def _init_params(self, rng):
        x0 = jnp.zeros((1, 16, self.time_history, self.cfg.input_size), jnp.float32)
        return self.model.init(rng, x0)

    def _predict(self, params, state_field, x, t):
        t_hist = self.time_history
        inp = jnp.transpose(state_field[:, :t_hist], (0, 2, 1, 3))
        dx, dt = self._coords(x, t)
        return self.model.apply(params, inp, dx, dt)

    def _split_unnorm(self, state, pred, u_ch):
        u_pred = pred[..., :u_ch]
        s_pred = pred[..., u_ch:]
        u_un = state.normalizer_input(u_pred, inverse=True) if self.norm_input else u_pred
        s_un = state.normalizer_target(s_pred, inverse=True) if self.norm_target else s_pred
        return jnp.concatenate([u_un, s_un], axis=-1)

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, rng):
        u, x, t, s = batch
        u, u_unnorm = self._pair_input(state, u)
        s, s_unnorm = self._pair_target(state, s)
        field = jnp.concatenate([u, s], axis=-1)
        t_hist = self.time_history
        target = field[:, t_hist:]

        def loss_fn(params):
            pred = self._predict(params, field, x, t)
            return self.criterion(pred, target), pred

        (loss, pred), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        tgt_un = jnp.concatenate([u_unnorm, s_unnorm], axis=-1)[:, t_hist:]
        pred_un = self._split_unnorm(state, pred, u.shape[-1])
        metrics = {
            "train_loss": loss,
            "train_mae_u": mae(pred, target),
            "train_mae_u_un": mae(pred_un, tgt_un),
        }
        return self._apply_updates(state, grads, metrics)

    def eval_step(self, state, batch, rng=None, split="val"):
        key = ("eval", split, batch[0].shape)
        fn = self._jit_cache.get(key)
        if fn is None:
            fn = jax.jit(functools.partial(self._eval_impl, split=split))
            self._jit_cache[key] = fn
        return fn(state, batch)

    def _eval_impl(self, state, batch, *, split):
        u, x, t, s = batch
        u, u_unnorm = self._pair_input(state, u)
        s, s_unnorm = self._pair_target(state, s)
        field = jnp.concatenate([u, s], axis=-1)
        t_hist = self.time_history
        target = field[:, t_hist:]
        pred = self._predict(state.params, field, x, t)

        down = self.down_factor if split == "test" else 1
        loss = self.criterion(pred, target)
        mae_loss = losses.downsampled_loss(pred, target, down)
        corr = jnp.mean(losses.correlation(pred, target))
        full_un = jnp.concatenate([u_unnorm, s_unnorm], axis=-1)
        pred_un = self._split_unnorm(state, pred, u.shape[-1])
        mae_un = losses.downsampled_loss(pred_un, full_un[:, t_hist:], down)
        scaled = losses.scaled_mae_loss(pred, target)

        pred_full_un = jnp.concatenate([full_un[:, :t_hist], pred_un], axis=1)
        pde = self._pde_unnorm(state, pred_full_un)
        pde_gt = self._pde_unnorm(state, full_un)

        p = split
        metrics = {
            f"{p}_loss": loss, f"{p}_mae_u": mae_loss, f"{p}_mae_u_un": mae_un,
            f"{p}_corr": corr, f"{p}_mae_u_scaled": scaled,
            f"{p}_pde_loss": pde, f"{p}_pde_loss_gt": pde_gt,
        }
        return metrics, pred_full_un

    def _pde_unnorm(self, state, x_un):
        m = self.pde_loss(x_un, x_un, state.normalizer_input,
                          state.normalizer_target, clamp_loss=False)
        return jnp.sum(m) / x_un.shape[0]


@register("models.fno_state_2d.PlFnoStateTimePred2d",
          "m_cedm_tpu.tasks.FnoStateTimePredTask")
def _build_fno_statetime(hparams, **kw):
    return FnoStateTimePredTask(hparams, **kw)


class FnoStateTimePredTask:
    """Two-stage compose: reconstruct states, then predict the future.
    Test-only, built from two trained sub-tasks (reference: test_step only)."""

    def __init__(self, hparams, grad_clip=None, steps_per_epoch=None):
        self.model_state = FnoStateReconstrTask(hparams["hparams_state"])
        self.model_time = FnoTimePredTask(hparams["hparams_time"])
        self.time_history = hparams.get("time_history", 128)
        self.flip_xy = False
        self.norm_input = True
        self.norm_target = True
        self.down_factor = 1
        self.pde_loss, _ = get_pde_loss_function("swe", False)
        self._jit_cache = {}

    def set_pde_loss_function(self, system: str, flip_xy: bool):
        self.flip_xy = flip_xy
        self.pde_loss, _ = get_pde_loss_function(system, False)
        self._jit_cache = {}

    def test_step(self, state_reconstr: TrainState, state_time: TrainState,
                  batch):
        u, x, t, s = batch
        state = state_reconstr
        task_s, task_t = self.model_state, self.model_time
        u, u_unnorm = task_t._pair_input(state, u)
        s, s_unnorm = task_t._pair_target(state, s)
        t_hist = self.time_history

        s_hat = task_s._predict(state_reconstr.params, u, x, t)
        s_hat_un = state.normalizer_target(s_hat, inverse=True)
        down = self.down_factor
        mae_rec = losses.downsampled_loss(s_hat_un, s_unnorm[:, :t_hist], down)

        u_hist = u[:, :t_hist]
        if self.flip_xy:
            field = jnp.concatenate([s_hat, u_hist], axis=-1)
        else:
            field = jnp.concatenate([u_hist, s_hat], axis=-1)
        pred = task_t._predict(state_time.params, field, x, t)

        full_un = (jnp.concatenate([s_unnorm, u_unnorm], axis=-1) if self.flip_xy
                   else jnp.concatenate([u_unnorm, s_unnorm], axis=-1))
        target_un = full_un[:, t_hist:]
        u_ch = u.shape[-1]
        if self.flip_xy:
            s_pred_un = state.normalizer_target(pred[..., :s.shape[-1]], inverse=True)
            u_pred_un = state.normalizer_input(pred[..., s.shape[-1]:], inverse=True)
            pred_un = jnp.concatenate([s_pred_un, u_pred_un], axis=-1)
            hist_un = jnp.concatenate([s_hat_un, u_unnorm[:, :t_hist]], axis=-1)
            mask = jnp.ones_like(full_un).at[:, :t_hist, :, s.shape[-1]:].set(0.0)
        else:
            u_pred_un = state.normalizer_input(pred[..., :u_ch], inverse=True)
            s_pred_un = state.normalizer_target(pred[..., u_ch:], inverse=True)
            pred_un = jnp.concatenate([u_pred_un, s_pred_un], axis=-1)
            hist_un = jnp.concatenate([u_unnorm[:, :t_hist], s_hat_un], axis=-1)
            mask = jnp.ones_like(full_un).at[:, :t_hist, :, :u_ch].set(0.0)

        mae_pred = losses.downsampled_loss(pred_un, target_un, down)
        pred_full_un = jnp.concatenate([hist_un, pred_un], axis=1)

        norm_a = state.normalizer_target if self.flip_xy else state.normalizer_input
        norm_b = state.normalizer_input if self.flip_xy else state.normalizer_target
        pde = jnp.sum(self.pde_loss(pred_full_un, pred_full_un, norm_a, norm_b,
                                    clamp_loss=False)) / u.shape[0]
        pde_gt = jnp.sum(self.pde_loss(full_un, full_un, norm_a, norm_b,
                                       clamp_loss=False)) / u.shape[0]
        mae_un = losses.masked_loss(pred_full_un, full_un, mask)

        metrics = {
            "test_mae_un_rec": mae_rec, "test_mae_un_pred": mae_pred,
            "test_mae_un": mae_un, "test_pde_loss": pde,
            "test_pde_loss_gt": pde_gt,
        }
        return metrics, pred_full_un


@register("models.fno_2d.PlFno2d", "m_cedm_tpu.tasks.Fno2dTask")
def _build_fno2d(hparams, **kw):
    return Fno2dTask(hparams, **kw)


class Fno2dTask(FnoTaskBase):
    """Autoregressive FNO time stepper with teacher forcing."""

    def __init__(self, hparams, grad_clip=None, steps_per_epoch=None):
        super().__init__(hparams, grad_clip, steps_per_epoch)
        self.teacher_forcing = hparams.get("teacher_forcing", True)
        self.time_future = self.cfg.time_future

    def _build_model(self):
        return Fno2d(self.cfg)

    def _init_params(self, rng):
        t = self.cfg.time_history
        x0 = jnp.zeros((1, 16, 16, t), jnp.float32)
        z = jnp.zeros((1,), jnp.float32)
        return self.model.init(rng, x0, z, z, z)

    def _rollout(self, params, u, dx, dy, dt, teacher_forcing: bool):
        t_hist, t_fut = self.cfg.time_history, self.cfg.time_future
        u_hist = u[..., :t_hist]
        u_future = u[..., t_hist:]
        n_chunks = u_future.shape[-1] // t_fut
        preds = []
        inp = u_hist
        for i in range(n_chunks):
            y = self.model.apply(params, inp, dx, dy, dt)
            preds.append(y)
            if teacher_forcing:
                inp = u_future[..., i * t_fut:(i + 1) * t_fut]
            else:
                inp = y
        return jnp.concatenate(preds, axis=-1), u_future

    @functools.partial(jax.jit, static_argnums=0)
    def train_step(self, state: TrainState, batch, rng):
        u, dx, dy, dt = batch

        def loss_fn(params):
            pred, target = self._rollout(params, u, dx, dy, dt,
                                         self.teacher_forcing)
            return self.criterion(pred, target), (pred, target)

        (loss, (pred, target)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics = {"train_loss": loss, "train_mae_loss": mae(pred, target)}
        return self._apply_updates(state, grads, metrics)

    @functools.partial(jax.jit, static_argnums=0)
    def eval_step(self, state: TrainState, batch, rng=None, split="val"):
        u, dx, dy, dt = batch
        pred, target = self._rollout(state.params, u, dx, dy, dt, False)
        loss = self.criterion(pred, target)
        return {"val_loss": loss, "val_mae_loss": mae(pred, target)}, pred
