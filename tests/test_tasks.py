"""Diffusion task family: train/eval smoke + semantics tests at tiny res."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m_cedm_tpu.config import to_dotdict
from m_cedm_tpu.tasks import CondDdimTask, CondEdmTask, DdimTask, McedmTask

RES = 16
B = 4


def mcedm_hparams():
    return to_dotdict({
        "name": "adm_edm_mcedm",
        "model": {
            "in_channels": 2, "cond_channels": 2, "cat_cond": True, "out_ch": 2,
            "ch": 32, "ch_mult": [1, 1], "num_res_blocks": 1,
            "attn_resolutions": [8], "dropout": 0.0, "label_dim": 0,
            "augment_dim": 0, "label_dropout": 0, "ema_rate": 0.999,
            "ema": True, "resamp_with_conv": True, "resolution": RES,
            "self_cond": False, "cond_p": 1.0, "dx_cond": False,
            "cat_dx": False, "dx_norm": "l2", "dx_detach": False,
            "add_cond_mask": False, "add_xt": False,
        },
        "data": {"normalization": "gauss", "uniform_dequantization": False,
                 "gaussian_dequantization": False, "rescaled": False},
        "optimization": {"optimizer": "Adam", "lr": 2e-4, "weight_decay": 0.0,
                         "beta1": 0.9, "amsgrad": False, "eps": 1e-8,
                         "grad_clip": 1.0, "loss": "l2", "pde_loss_lambda": 0.0,
                         "pde_loss_prop_t": False, "use_gt_pde": False,
                         "factor": 0.3, "step_size": 50},
        "sampler": {"name": "edm", "type": "edm", "timesteps": 8,
                    "sigma_min": 0.002, "sigma_max": 80, "rho": 7,
                    "S_churn": 15.0, "S_min": 0, "S_max": "inf", "S_noise": 1,
                    "n_samples": 1, "n_repeat": 2, "n_time_h": RES,
                    "n_time_u": 0, "return_last": True, "select_by_pde": False,
                    "use_gt_pde_select": True, "guide_dx": False, "w": 0.0,
                    "plot_scaled": False},
    })


def ddim_hparams(name="ddim", in_ch=2, out_ch=2, cond_ch=0, cat_cond=False,
                 self_cond=False, sampler_type="edm"):
    hp = mcedm_hparams()
    hp["name"] = name
    hp["model"]["type"] = "simple"
    hp["model"]["var_type"] = "fixedsmall"
    hp["model"]["in_channels"] = in_ch
    hp["model"]["out_ch"] = out_ch
    hp["model"]["cond_channels"] = cond_ch
    hp["model"]["cat_cond"] = cat_cond
    hp["model"]["self_cond"] = self_cond
    hp["model"]["node_type"] = False
    hp["diffusion"] = {"beta_schedule": "linear", "beta_start": 1e-4,
                       "beta_end": 0.02, "num_diffusion_timesteps": 100}
    hp["sampler"]["type"] = sampler_type
    hp["sampler"]["skip_type"] = "uniform"
    hp["sampler"]["eta"] = 0.0
    return hp


def grid_batch(key):
    h = jax.random.normal(key, (B, RES, RES, 1)) + 1.5
    u = jax.random.normal(jax.random.fold_in(key, 1), (B, RES, RES, 1)) * 0.1
    t = jnp.linspace(0, 1, RES)
    x = jnp.linspace(0, 1, RES)
    t_grid = jnp.broadcast_to(t[None, :, None, None], (B, RES, RES, 1))
    x_grid = jnp.broadcast_to(x[None, None, :, None], (B, RES, RES, 1))
    return h, t_grid, x_grid, u


def rel_batch(key):
    h, _, _, u = grid_batch(key)
    dx = jnp.full((B,), 1.0 / RES)
    dt = jnp.full((B,), 1.0 / RES)
    return h, dx, dt, u


class TestMcedmTask:
    def setup_method(self):
        self.task = McedmTask(mcedm_hparams())
        self.task.set_pde_loss_function("swe_per", False)
        self.state = self.task.init_state(jax.random.PRNGKey(0))
        self.batch = grid_batch(jax.random.PRNGKey(1))

    def test_train_step_runs_and_loss_finite(self):
        state2, metrics = self.task.train_step(self.state, self.batch,
                                               jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["train_loss"]))
        assert int(state2.step) == 1

    def test_params_change_and_ema_lags(self):
        state2, _ = self.task.train_step(self.state, self.batch,
                                         jax.random.PRNGKey(2))
        p0 = jax.tree_util.tree_leaves(self.state.params)
        p1 = jax.tree_util.tree_leaves(state2.params)
        e1 = jax.tree_util.tree_leaves(state2.ema_params)
        changed = any(not np.allclose(a, b) for a, b in zip(p0, p1))
        assert changed
        # EMA moves 1000x slower than params
        for a, b, e in zip(p0, p1, e1):
            np.testing.assert_allclose(e, np.asarray(a) * 0.999 + np.asarray(b) * 0.001,
                                       rtol=1e-4, atol=1e-7)

    def test_eval_step_metric_names(self):
        mask = jnp.concatenate([jnp.zeros((RES, RES, 1)), jnp.ones((RES, RES, 1))],
                               axis=-1)
        metrics, pred = self.task.eval_step(self.state, self.batch,
                                            jax.random.PRNGKey(3), mask,
                                            split="test", n_samples=2,
                                            mask_name="u")
        assert set(metrics) == {"test_mae_u", "test_mae_u_un",
                                "test_pde_loss_u", "test_pde_loss_gt"}
        assert pred.shape == (B, RES, RES, 2)
        assert all(np.isfinite(float(v)) for v in metrics.values())

    def test_known_region_recovered_exactly(self):
        """Observed region must equal the gt (clamped), regardless of net."""
        mask = jnp.concatenate([jnp.zeros((RES, RES, 1)), jnp.ones((RES, RES, 1))],
                               axis=-1)
        metrics, pred = self.task.eval_step(self.state, self.batch,
                                            jax.random.PRNGKey(3), mask,
                                            split="val", n_samples=1,
                                            mask_name="u")
        h_un, _, _, u_un = self.batch
        gt = self.task.transform.forward(self.state, h_un, u_un)
        np.testing.assert_allclose(np.asarray(pred[..., 0]),
                                   np.asarray(gt[..., 0]), atol=1e-5)


class TestDdimTask:
    def setup_method(self):
        self.task = DdimTask(ddim_hparams(self_cond=True))
        self.task.set_pde_loss_function("swe_per", False)
        self.state = self.task.init_state(jax.random.PRNGKey(0))
        self.batch = rel_batch(jax.random.PRNGKey(1))

    def test_train_step(self):
        state2, metrics = self.task.train_step(self.state, self.batch,
                                               jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["train_loss"]))

    def test_eval_edm_metric_names(self):
        metrics, pred = self.task.eval_step(self.state, self.batch,
                                            jax.random.PRNGKey(3),
                                            split="test", n_samples=2)
        expected = {"test_mae_h", "test_mae_u", "test_mae_h_un", "test_mae_u_un",
                    "test_mae_h_scaled", "test_mae_u_scaled", "test_corr_h",
                    "test_corr_u", "test_pde_loss", "test_mae_hu_un",
                    "test_pde_loss_gt"}
        assert set(metrics) == expected

    def test_known_region_metric_family(self):
        """Partial time masks emit the reference's known-region oracles
        (ddim.py:459-480) and the clamped known region scores ~0."""
        self.task.set_test_sampler_params(
            dict(self.task.test_sparams, n_time_h=RES // 2,
                 n_time_u=RES // 4))
        metrics, _ = self.task.eval_step(self.state, self.batch,
                                         jax.random.PRNGKey(3),
                                         split="test", n_samples=2)
        for k in ("test_h_known", "test_h_kn_scaled", "test_h_unkn_scaled",
                  "test_u_known", "test_u_kn_scaled", "test_u_unkn_scaled"):
            assert k in metrics, k
        # repaint clamps the known region to the gt at the last step
        assert float(metrics["test_h_known"]) < 1e-4
        assert float(metrics["test_u_known"]) < 1e-4
        # full-time-mask evals must not emit the family (reference gating)
        self.task.set_test_sampler_params(
            dict(self.task.test_sparams, n_time_h=RES, n_time_u=0))
        metrics2, _ = self.task.eval_step(self.state, self.batch,
                                          jax.random.PRNGKey(3),
                                          split="test", n_samples=1)
        assert "test_h_known" not in metrics2
        assert "test_u_known" not in metrics2

    def test_eval_ddim_sampler(self):
        self.task.set_test_sampler_params(
            dict(self.task.test_sparams, type="ddim", skip_type="uniform",
                 eta=0.0, n_repeat=2))
        metrics, pred = self.task.eval_step(self.state, self.batch,
                                            jax.random.PRNGKey(3), split="val",
                                            n_samples=1)
        assert np.isfinite(float(metrics["val_mae_u"]))

    def test_pde_loss_training_term(self):
        hp = ddim_hparams()
        hp["optimization"]["pde_loss_lambda"] = 0.1
        task = DdimTask(hp)
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        _, metrics = task.train_step(state, self.batch, jax.random.PRNGKey(2))
        assert "train_pde_loss" in metrics


class TestCondDdimTask:
    def setup_method(self):
        self.task = CondDdimTask(ddim_hparams(
            name="ddim_cond_h", in_ch=1, out_ch=1, cond_ch=1, cat_cond=False,
            self_cond=True))
        self.task.set_pde_loss_function("swe_per", False)
        self.state = self.task.init_state(jax.random.PRNGKey(0))
        self.batch = rel_batch(jax.random.PRNGKey(1))

    def test_train_step(self):
        state2, metrics = self.task.train_step(self.state, self.batch,
                                               jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["train_loss"]))

    def test_eval_edm(self):
        metrics, pred = self.task.eval_step(self.state, self.batch,
                                            jax.random.PRNGKey(3), split="test",
                                            n_samples=2)
        expected = {"test_mae_u", "test_mae_u_un", "test_mae_u_scaled",
                    "test_corr_u", "test_pde_loss", "test_pde_loss_gt"}
        assert set(metrics) == expected
        assert pred.shape == (B, RES, RES, 1)

    def test_eval_ddim(self):
        self.task.set_test_sampler_params(
            dict(self.task.test_sparams, type="ddim", skip_type="uniform",
                 eta=0.0))
        metrics, _ = self.task.eval_step(self.state, self.batch,
                                         jax.random.PRNGKey(3), split="val",
                                         n_samples=1)
        assert np.isfinite(float(metrics["val_mae_u"]))

    def test_cond_in_variants(self):
        h = jnp.zeros((B, RES, RES, 1))
        u = jnp.zeros((B, RES, RES, 1))
        tg = jnp.zeros((B, RES, RES, 1))
        xg = jnp.zeros((B, RES, RES, 1))
        # cond_ch == h_ch -> cond is h
        assert self.task.get_cond_in(h, u, tg, xg).shape[-1] == 1
        # wider variants
        t2 = CondDdimTask(ddim_hparams(name="ddim_cond_h", in_ch=1, out_ch=1,
                                       cond_ch=2, cat_cond=False))
        assert t2.get_cond_in(h, u, tg, xg).shape[-1] == 2
        t3 = CondDdimTask(ddim_hparams(name="ddim_cond_h", in_ch=1, out_ch=1,
                                       cond_ch=3, cat_cond=False))
        assert t3.get_cond_in(h, u, tg, xg).shape[-1] == 3


class TestCondEdmTask:
    def setup_method(self):
        self.task = CondEdmTask(ddim_hparams(
            name="edm_cond_h", in_ch=1, out_ch=1, cond_ch=1, cat_cond=True))
        self.task.set_pde_loss_function("swe_per", False)
        self.state = self.task.init_state(jax.random.PRNGKey(0))
        self.batch = rel_batch(jax.random.PRNGKey(1))

    def test_train_step(self):
        state2, metrics = self.task.train_step(self.state, self.batch,
                                               jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["train_loss"]))

    def test_eval(self):
        metrics, _ = self.task.eval_step(self.state, self.batch,
                                         jax.random.PRNGKey(3), split="val",
                                         n_samples=1)
        assert np.isfinite(float(metrics["val_mae_u"]))

    def test_rejects_non_edm_sampler(self):
        self.task.set_test_sampler_params(dict(type="ddim"))
        # reference behavior: silently falls back to EDM defaults
        assert self.task.test_sparams["type"] == "edm"
        with pytest.raises(NotImplementedError):
            self.task.sample(None, None, None)


class TestTrainingConvergence:
    def test_mcedm_loss_decreases(self):
        """A few hundred steps on a fixed tiny batch must reduce the loss."""
        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        batch = grid_batch(jax.random.PRNGKey(1))
        probe_key = jax.random.PRNGKey(999)  # fixed sigma/noise/mask draw

        def probe_loss(s):
            # loss under identical randomness isolates the parameter change
            _, m = task.train_step(s, batch, probe_key)
            return float(m["train_loss"])

        before = probe_loss(state)
        for i in range(60):
            state, _ = task.train_step(state, batch, jax.random.PRNGKey(i))
        after = probe_loss(state)
        assert after < before


class TestSelectByPde:
    def test_best_of_n_selection(self):
        """select_by_pde must pick per-element the lowest-residual sample."""
        task = DdimTask(ddim_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        task.set_test_sampler_params(dict(task.test_sparams,
                                          select_by_pde=True,
                                          use_gt_pde_select=True))
        batch = rel_batch(jax.random.PRNGKey(1))
        metrics, pred = task.eval_step(state, batch, jax.random.PRNGKey(3),
                                       split="test", n_samples=3)
        assert np.isfinite(float(metrics["test_mae_u"]))
        assert pred.shape == (B, RES, RES, 2)

    def test_selection_helper_prefers_physical(self):
        """Given one physically-consistent candidate and one noise candidate,
        the selector must choose the physical one."""
        from m_cedm_tpu.physics import get_pde_loss_function
        task = DdimTask(ddim_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        # build a physical trajectory with the FV solver
        pde, _ = get_pde_loss_function("swe_per", False)
        ic_h = 1.0 + 0.1 * jax.random.uniform(jax.random.PRNGKey(4), (B, 1, RES, 1))
        ic = jnp.concatenate([ic_h, jnp.zeros_like(ic_h)], axis=-1)
        good = pde.unroll_from_init(ic, RES - 1)  # (B, RES, RES, 2)
        bad = good + jax.random.normal(jax.random.PRNGKey(5), good.shape) * 0.5
        samples = jnp.stack([bad, good])  # (S=2, B, ...)
        best = task._select_best_by_pde(state, samples, good, use_gt=True)
        np.testing.assert_allclose(np.asarray(best), np.asarray(good), atol=1e-5)


class TestUnrollMetrics:
    def test_unroll_oracle(self):
        task = DdimTask(ddim_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        h, _, _, u = rel_batch(jax.random.PRNGKey(1))
        h = jnp.abs(h) + 1.0  # physical heights
        gt = task.transform.forward(state, h, u)
        samples = jnp.broadcast_to(gt[None], (2,) + gt.shape)
        metrics = task.unroll_metrics(state, samples, h, u, use_simulator=False)
        expected = {"test_pde_unroll_error", "test_pde_unroll_error_gt",
                    "test_pde_unrolled_mae_h", "test_pde_unrolled_mae_u"}
        assert set(metrics) == expected
        # identical prediction and gt -> zero rollout MAE
        assert float(metrics["test_pde_unrolled_mae_u"]) < 1e-5


class TestCondEdmSelfCond:
    def test_self_cond_edm_sampling(self):
        hp = ddim_hparams(name="edm_cond_h", in_ch=1, out_ch=1, cond_ch=1,
                          cat_cond=True, self_cond=True)
        task = CondEdmTask(hp)
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        cond = jnp.zeros((B, RES, RES, 1))
        out = task.sample_edm(state, cond, jax.random.PRNGKey(1))
        assert out.shape == (B, 1, RES, RES, 1)
        assert np.all(np.isfinite(np.asarray(out)))


class TestDxConditioning:
    def _task(self, dx_norm="l2"):
        hp = mcedm_hparams()
        hp["model"]["dx_cond"] = True
        hp["model"]["cat_dx"] = True
        hp["model"]["dx_norm"] = dx_norm
        task = McedmTask(hp)
        task.set_pde_loss_function("swe_per", False)
        return task

    @pytest.mark.parametrize("dx_norm", ["l2", "gauss", "min_max", "clamp",
                                         "prob"])
    def test_dx_norm_variants(self, dx_norm):
        task = self._task(dx_norm)
        state = task.init_state(jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (2, RES, RES, 2))
        dx = task.get_dx_input(state, x)
        assert dx.shape == x.shape
        assert np.all(np.isfinite(np.asarray(dx)))
        if dx_norm == "l2":
            norms = np.linalg.norm(np.asarray(dx).reshape(2, -1, 2), axis=1)
            np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        if dx_norm == "clamp":
            assert np.abs(np.asarray(dx)).max() <= 5.0

    def test_train_and_sample_with_dx(self):
        task = self._task()
        state = task.init_state(jax.random.PRNGKey(0))
        batch = grid_batch(jax.random.PRNGKey(1))
        state2, metrics = task.train_step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["train_loss"]))
        mask = jnp.concatenate([jnp.zeros((B, RES, RES, 1)),
                                jnp.ones((B, RES, RES, 1))], axis=-1)
        cond = jnp.zeros((B, RES, RES, 2))
        out = task.sample_edm(state, cond, mask, jax.random.PRNGKey(3))
        assert np.all(np.isfinite(np.asarray(out)))

    def _cond_task(self, dx_norm="l2"):
        hp = ddim_hparams(name="ddim_cond_h", in_ch=1, out_ch=1, cond_ch=1)
        hp["model"]["dx_cond"] = True
        hp["model"]["cat_dx"] = True
        hp["model"]["dx_norm"] = dx_norm
        task = CondDdimTask(hp)
        task.set_pde_loss_function("swe_per", False)
        return task

    def test_cond_guidance_honors_calc_prob(self):
        """_pde_guidance_cond(calc_prob) must not hardcode the log-prob
        transform (ddim.py:601-635: dx conditioning with dx_norm != 'prob'
        uses the raw residual gradient)."""
        task = self._cond_task()
        state = task.init_state(jax.random.PRNGKey(0))
        h_un, _, _, u_un = grid_batch(jax.random.PRNGKey(1))
        hu = task.transform.forward(state, h_un, u_un)
        h, u = hu[..., :1], hu[..., 1:]
        g_raw = np.asarray(task._pde_guidance_cond(state, h, calc_prob=False)(u))
        g_prob = np.asarray(task._pde_guidance_cond(state, h, calc_prob=True)(u))
        assert np.all(np.isfinite(g_raw)) and np.all(np.isfinite(g_prob))
        assert not np.allclose(g_raw, g_prob), (
            "raw residual gradient and log-prob gradient should differ")

    def test_cond_dx_input_l2_and_sampling(self):
        """Conditional dx conditioning channels: dx_norm='l2' unit-norm, and
        both cond samplers run with dx channels wired in (ddim.py:1492,1571)."""
        task = self._cond_task("l2")
        state = task.init_state(jax.random.PRNGKey(0))
        h_un, _, _, u_un = grid_batch(jax.random.PRNGKey(1))
        hu = task.transform.forward(state, h_un, u_un)
        h, u = hu[..., :1], hu[..., 1:]
        dxin = np.asarray(task.get_dx_input_cond(state, h, u))
        assert dxin.shape == u.shape
        norms = np.linalg.norm(dxin.reshape(B, -1, 1), axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

        sp_ddim = dict(task.test_sparams, type="ddim", timesteps=4,
                       skip_type="uniform", eta=0.0)
        out = task.sample(state, h, jax.random.PRNGKey(2), sp_ddim)
        assert np.all(np.isfinite(np.asarray(out)))
        sp_edm = dict(task.test_sparams, type="edm", timesteps=4)
        out2 = task.sample_edm(state, h, jax.random.PRNGKey(3), sp_edm)
        assert np.all(np.isfinite(np.asarray(out2)))


class TestChunkedEnsemble:
    def test_matches_flat_vmap(self):
        from m_cedm_tpu.tasks.base import chunked_ensemble

        def draw(k):
            return jax.random.normal(k, (3, 4))

        keys = jax.random.split(jax.random.PRNGKey(0), 8)
        flat = jax.vmap(draw)(keys)
        chunked = chunked_ensemble(draw, keys, chunk=4)
        np.testing.assert_array_equal(np.asarray(flat), np.asarray(chunked))
        # non-divisible ensembles fall back to the flat vmap
        keys5 = jax.random.split(jax.random.PRNGKey(1), 5)
        np.testing.assert_array_equal(
            np.asarray(jax.vmap(draw)(keys5)),
            np.asarray(chunked_ensemble(draw, keys5, chunk=4)))

    def test_n_samples_100_eval(self):
        """The reference's headline eval path (run.py:52-54: n_samples=100 ->
        test_batch_size=1) must execute without building a 100-sampler XLA
        program: the ensemble runs as lax.map over vmap-chunks."""
        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        task.set_test_sampler_params(dict(task.test_sparams, timesteps=2,
                                          n_samples=100))
        state = task.init_state(jax.random.PRNGKey(0))
        h, tg, xg, u = grid_batch(jax.random.PRNGKey(1))
        batch = (h[:1], tg[:1], xg[:1], u[:1])  # test_batch_size=1
        mask = jnp.concatenate([jnp.zeros((RES, RES, 1)),
                                jnp.ones((RES, RES, 1))], axis=-1)
        metrics, pred = task.eval_step(state, batch, jax.random.PRNGKey(2),
                                       mask, split="test", n_samples=100,
                                       mask_name="u")
        assert pred.shape == (1, RES, RES, 2)
        assert np.all(np.isfinite(np.asarray(pred)))
        assert np.isfinite(float(metrics["test_mae_u"]))


class TestF64Parity:
    def test_f32_sampler_close_to_f64(self):
        """SURVEY hard part: the reference runs the Heun loop in float64; our
        f32 loop must track a numpy-float64 run of the same deterministic
        schedule (S_churn=0 so the only randomness is the shared x0)."""
        from m_cedm_tpu.samplers.edm import heun_sample_masked, make_edm_schedule

        target = np.asarray(
            jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 2)))
        mask = np.zeros((2, 8, 8, 2), np.float32)
        mask[..., 1] = 1.0
        sched = make_edm_schedule(18, 0.002, 80.0, S_churn=0.0)

        oracle = lambda x, t, key: jnp.broadcast_to(jnp.asarray(target), x.shape)
        o32 = np.asarray(heun_sample_masked(
            oracle, jax.random.PRNGKey(1), jnp.asarray(target),
            jnp.asarray(mask), sched))[:, -1]

        # reproduce the same x0 (same PRNG path as heun_sample_masked)
        k_init, _ = jax.random.split(jax.random.PRNGKey(1))
        noise = np.asarray(jax.random.normal(k_init, target.shape), np.float64)
        x = noise * np.float64(sched.t_cur[0])
        x = target * (1 - mask) + x * mask
        t_steps = np.concatenate([sched.t_cur.astype(np.float64),
                                  [0.0]])
        for i in range(len(t_steps) - 1):
            t_hat, t_next = t_steps[i], t_steps[i + 1]
            d_cur = (x - target) / t_hat
            x_next = x + (t_next - t_hat) * d_cur * mask
            if i < len(t_steps) - 2:
                d_prime = (x_next - target) / t_next
                x_next = x + (t_next - t_hat) * 0.5 * (d_cur + d_prime) * mask
            x = x_next
        assert np.abs(o32 - x).max() < 1e-3


class TestGuidedSampling:
    def test_mcedm_guide_dx(self):
        """PDE log-prob guidance inside the Heun scan (guide_dx=True)."""
        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        task.set_test_sampler_params(dict(task.test_sparams, guide_dx=True,
                                          timesteps=4))
        state = task.init_state(jax.random.PRNGKey(0))
        batch = grid_batch(jax.random.PRNGKey(1))
        mask = jnp.concatenate([jnp.zeros((RES, RES, 1)),
                                jnp.ones((RES, RES, 1))], axis=-1)
        metrics, pred = task.eval_step(state, batch, jax.random.PRNGKey(2),
                                       mask, split="val", n_samples=1,
                                       mask_name="u")
        assert np.all(np.isfinite(np.asarray(pred)))
        assert np.isfinite(float(metrics["val_mae_u"]))

    def test_ddim_guided_repaint(self):
        task = DdimTask(ddim_hparams(sampler_type="ddim"))
        task.set_pde_loss_function("swe_per", False)
        task.set_test_sparams = task.set_test_sampler_params
        task.set_test_sampler_params(dict(task.test_sparams, type="ddim",
                                          guide_dx=True, timesteps=4,
                                          skip_type="uniform", eta=0.0,
                                          n_repeat=2))
        state = task.init_state(jax.random.PRNGKey(0))
        batch = rel_batch(jax.random.PRNGKey(1))
        metrics, pred = task.eval_step(state, batch, jax.random.PRNGKey(2),
                                       split="val", n_samples=1)
        assert np.all(np.isfinite(np.asarray(pred)))

    def test_cfg_blend_w(self):
        """Classifier-free guidance blending (w != 0) runs both branches."""
        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        task.set_test_sampler_params(dict(task.test_sparams, w=0.5,
                                          timesteps=4))
        state = task.init_state(jax.random.PRNGKey(0))
        mask = jnp.concatenate([jnp.zeros((B, RES, RES, 1)),
                                jnp.ones((B, RES, RES, 1))], axis=-1)
        cond = jnp.zeros((B, RES, RES, 2))
        out = task.sample_edm(state, cond, mask, jax.random.PRNGKey(1))
        assert np.all(np.isfinite(np.asarray(out)))
