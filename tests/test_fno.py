"""FNO model + task tests, incl. a torch cross-check of the spectral conv."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from m_cedm_tpu.config import to_dotdict
from m_cedm_tpu.models.fno import FnoConfig, FnoState2d, SpectralConv2d
from m_cedm_tpu.tasks.fno import (
    Fno2dTask,
    FnoStateReconstrTask,
    FnoStateTimePredTask,
    FnoTimePredTask,
)

T, X = 16, 16
B = 2


class TestSpectralConv:
    def test_matches_torch(self):
        """Same weights -> identical outputs vs a direct torch transcription."""
        in_ch, out_ch, m1, m2 = 3, 5, 4, 4
        layer = SpectralConv2d(out_ch, m1, m2)
        x = np.random.RandomState(0).randn(B, T, X, in_ch).astype(np.float32)
        params = layer.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(layer.apply(params, jnp.asarray(x)))

        p = params["params"]
        w1 = torch.tensor(np.asarray(p["w1_real"]) + 1j * np.asarray(p["w1_imag"]))
        w2 = torch.tensor(np.asarray(p["w2_real"]) + 1j * np.asarray(p["w2_imag"]))
        xt = torch.tensor(x).permute(0, 3, 1, 2)  # NCHW
        x_ft = torch.fft.rfft2(xt)
        out_ft = torch.zeros(B, out_ch, T, X // 2 + 1, dtype=torch.cfloat)
        out_ft[:, :, :m1, :m2] = torch.einsum("bixy,ioxy->boxy",
                                              x_ft[:, :, :m1, :m2], w1)
        out_ft[:, :, -m1:, :m2] = torch.einsum("bixy,ioxy->boxy",
                                               x_ft[:, :, -m1:, :m2], w2)
        ref = torch.fft.irfft2(out_ft, s=(T, X)).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_output_shape(self):
        layer = SpectralConv2d(7, 3, 3)
        x = jnp.zeros((B, T, X, 4))
        params = layer.init(jax.random.PRNGKey(0), x)
        assert layer.apply(params, x).shape == (B, T, X, 7)

    def test_dft_matches_fft(self, monkeypatch):
        """The truncated-DFT matmul path (MCEDM_FNO_DFT, default on) must
        equal the rfft2 path — including at a non-square, non-power-of-two
        shape like FnoState2d's padded (X, T+pad) grid."""
        h, w, m1, m2 = 24, 22, 5, 6
        layer = SpectralConv2d(5, m1, m2)
        x = jnp.asarray(np.random.RandomState(1).randn(B, h, w, 3)
                        .astype(np.float32))
        params = layer.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("MCEDM_FNO_DFT", "1")
        got = np.asarray(layer.apply(params, x))
        monkeypatch.setenv("MCEDM_FNO_DFT", "0")
        ref = np.asarray(layer.apply(params, x))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def fno_hparams(**kw):
    base = dict(name="fno_state_reconstr_2d", modes_1=4, modes_2=4, width=16,
                num_layers=2, padding_t=4, padding_x=0, inst_norm=False,
                time_history=T, time_future=0, input_size=1, state_size=1,
                norm_shape=[], factor=0.3, step_size=50, loss="l1", lr=1e-3,
                weight_decay=0)
    base.update(kw)
    return to_dotdict(base)


def abs_batch():
    rs = np.random.RandomState(0)
    u = jnp.asarray(rs.randn(B, T, X, 1).astype(np.float32))
    s = jnp.asarray(rs.randn(B, T, X, 1).astype(np.float32))
    x = jnp.broadcast_to(jnp.linspace(0, 1, X)[None], (B, X))
    t = jnp.broadcast_to(jnp.linspace(0, 1, T)[None], (B, T))
    return u, x, t, s


class TestFnoState2d:
    def test_resolution_agnostic(self):
        """FNO must run at a different resolution with the same params."""
        cfg = FnoConfig(modes_1=4, modes_2=4, width=16, num_layers=2,
                        padding_t=4, input_size=1, state_size=1)
        model = FnoState2d(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        out = model.apply(params, jnp.zeros((1, 32, 32, 1)))
        assert out.shape == (1, 32, 32, 1)

    def test_inst_norm_variant(self):
        cfg = FnoConfig(modes_1=4, modes_2=4, width=16, num_layers=2,
                        inst_norm=True, input_size=1, state_size=1)
        model = FnoState2d(cfg)
        params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 1)))
        out = model.apply(params, jnp.ones((1, 16, 16, 1)))
        assert np.all(np.isfinite(np.asarray(out)))


class TestFnoStateReconstrTask:
    def setup_method(self):
        self.task = FnoStateReconstrTask(fno_hparams())
        self.task.set_pde_loss_function("swe_per", False)
        self.state = self.task.init_state(jax.random.PRNGKey(0))
        self.batch = abs_batch()

    def test_train_metrics(self):
        state2, metrics = self.task.train_step(self.state, self.batch,
                                               jax.random.PRNGKey(1))
        assert set(metrics) == {"train_loss", "train_mae_u", "train_mae_u_un"}
        assert np.isfinite(float(metrics["train_loss"]))

    def test_eval_metrics(self):
        metrics, pred = self.task.eval_step(self.state, self.batch, split="test")
        expected = {"test_loss", "test_mae_u", "test_mae_u_un", "test_corr",
                    "test_mae_u_scaled", "test_pde_loss", "test_pde_loss_gt"}
        assert set(metrics) == expected
        assert pred.shape == (B, T, X, 1)

    def test_loss_decreases(self):
        state = self.state
        before = float(self.task.train_step(state, self.batch,
                                            jax.random.PRNGKey(9))[1]["train_loss"])
        for i in range(40):
            state, m = self.task.train_step(state, self.batch,
                                            jax.random.PRNGKey(i))
        after = float(m["train_loss"])
        assert after < before

    def test_lr_schedule_steps(self):
        task = FnoStateReconstrTask(fno_hparams(), steps_per_epoch=2)
        # lr at epoch 0 vs epoch >= step_size
        sched_lr0 = task.lr * task.factor ** 0
        sched_lr50 = task.lr * task.factor ** 1
        assert sched_lr50 == pytest.approx(task.lr * 0.3)


class TestFnoTimePredTask:
    def setup_method(self):
        hp = fno_hparams(time_history=T // 2, input_size=2, state_size=2)
        self.task = FnoTimePredTask(hp)
        self.task.set_pde_loss_function("swe_per", False)
        self.state = self.task.init_state(jax.random.PRNGKey(0))
        self.batch = abs_batch()

    def test_train_and_eval(self):
        state2, metrics = self.task.train_step(self.state, self.batch,
                                               jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["train_loss"]))
        metrics, pred = self.task.eval_step(self.state, self.batch, split="val")
        assert "val_pde_loss" in metrics
        assert pred.shape == (B, T, X, 2)  # full reconstructed trajectory


class TestFnoStateTimePred:
    def test_two_stage_compose(self):
        hp = to_dotdict({
            "hparams_state": fno_hparams(),
            "hparams_time": fno_hparams(time_history=T // 2, input_size=2,
                                        state_size=2),
            "time_history": T // 2,
            "norm_shape": [],
        })
        task = FnoStateTimePredTask(hp)
        task.set_pde_loss_function("swe_per", False)
        # reconstr stage runs on half-length history in this composition
        task.model_state.time_history = T // 2
        s_rec = task.model_state.init_state(jax.random.PRNGKey(0))
        s_time = task.model_time.init_state(jax.random.PRNGKey(1))
        metrics, pred = task.test_step(s_rec, s_time, abs_batch())
        expected = {"test_mae_un_rec", "test_mae_un_pred", "test_mae_un",
                    "test_pde_loss", "test_pde_loss_gt"}
        assert set(metrics) == expected
        assert all(np.isfinite(float(v)) for v in metrics.values())


class TestFno2dTask:
    def test_rollout_teacher_forcing(self):
        # autoregressive feedback requires time_history == time_future
        # (the reference feeds predicted chunks back as the next history)
        hp = fno_hparams(name="fno_2d", time_history=4, time_future=4,
                        teacher_forcing=True)
        task = Fno2dTask(hp)
        state = task.init_state(jax.random.PRNGKey(0))
        u = jnp.asarray(np.random.RandomState(0).randn(B, 16, 16, 12).astype(np.float32))
        z = jnp.ones((B,), jnp.float32) * 0.1
        batch = (u, z, z, z)
        state2, metrics = task.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["train_loss"]))
        metrics, pred = task.eval_step(state, batch)
        assert pred.shape == (B, 16, 16, 8)  # 2 chunks of time_future=4
