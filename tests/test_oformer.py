"""OFormer model + task tests, incl. torch cross-checks of the linear
attention kernel and RoPE."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from m_cedm_tpu.config import to_dotdict
from m_cedm_tpu.data.h5_io import write_store
from m_cedm_tpu.data.oformer_data import (
    PlOformerSwpDatamodule,
    PlOformerSwpTimePredDatamodule,
)
from m_cedm_tpu.models.encoding import (
    apply_rotary_pos_emb_1d,
    rotary_freqs,
)
from m_cedm_tpu.models.oformer import (
    IrregSTDecoder,
    IrregSTEncoder,
    LinearAttention,
    OformerDecoderConfig,
    OformerEncoderConfig,
    instance_norm_tokens,
)
from m_cedm_tpu.tasks.oformer import OformerTask, OformerTimePredTask

T, X = 8, 8
NTOK = T * X
B = 2


class TestRotary:
    def test_freqs_match_torch(self):
        coords = np.random.RandomState(0).rand(2, 10).astype(np.float32)
        dim, min_freq, scale = 16, 1 / 64, 1.0
        inv = 1.0 / (10000 ** (np.arange(0, dim, 2) / dim))
        t = coords * (scale / min_freq)
        ref = np.concatenate([t[..., None] * inv, t[..., None] * inv], axis=-1)
        got = rotary_freqs(jnp.asarray(coords), dim, min_freq, scale)
        np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-5)

    def test_rope_preserves_norm(self):
        t = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 10, 16))
        freqs = rotary_freqs(jnp.linspace(0, 1, 10)[None].repeat(2, 0), 16)
        freqs = jnp.broadcast_to(freqs[:, None], (2, 4, 10, 16))
        out = apply_rotary_pos_emb_1d(t, freqs)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=-1),
                                   np.linalg.norm(np.asarray(t), axis=-1),
                                   rtol=1e-4)


class TestLinearAttention:
    def test_galerkin_kernel_matches_torch(self):
        """The attention math k^T v -> q (k^T v) / n with instance-normed k, v
        must agree with a torch transcription of what the reference ACTUALLY
        runs: norm_wrt_domain (oformer.py:243-247) feeds (b*h, n, d) straight
        into InstanceNorm1d, so torch normalizes each token over the head-dim
        axis (num_features is ignored for affine=False). Verified end-to-end
        by tests/test_golden.py::TestOformerGolden."""
        rs = np.random.RandomState(0)
        q = rs.randn(B, 2, 10, 8).astype(np.float32)
        k = rs.randn(B, 2, 10, 8).astype(np.float32)
        v = rs.randn(B, 2, 10, 8).astype(np.float32)

        kn = instance_norm_tokens(jnp.asarray(k))
        vn = instance_norm_tokens(jnp.asarray(v))
        got = jnp.einsum("bhnd,bhde->bhne", jnp.asarray(q),
                         jnp.einsum("bhnd,bhne->bhde", kn, vn)) / 10

        kt = torch.nn.functional.instance_norm(
            torch.tensor(k).reshape(B * 2, 10, 8)).reshape(B, 2, 10, 8)
        vt = torch.nn.functional.instance_norm(
            torch.tensor(v).reshape(B * 2, 10, 8)).reshape(B, 2, 10, 8)
        dots = torch.matmul(kt.transpose(-1, -2), vt)
        ref = torch.matmul(torch.tensor(q), dots) * (1.0 / 10)
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3,
                                   atol=1e-4)

    def test_forward_shapes(self):
        attn = LinearAttention(32, "galerkin", heads=2, dim_head=16,
                               relative_emb=True, scale=16.0,
                               relative_emb_dim=2, min_freq=1 / 8)
        x = jnp.zeros((B, NTOK, 32))
        pos = jnp.zeros((B, NTOK, 2))
        params = attn.init(jax.random.PRNGKey(0), x, pos)
        out = attn.apply(params, x, pos)
        assert out.shape == (B, NTOK, 32)

    def test_fourier_variant(self):
        attn = LinearAttention(32, "fourier", heads=2, dim_head=16,
                               relative_emb=True, scale=16.0,
                               relative_emb_dim=2, min_freq=1 / 8)
        x = jax.random.normal(jax.random.PRNGKey(1), (B, NTOK, 32))
        pos = jnp.zeros((B, NTOK, 2))
        params = attn.init(jax.random.PRNGKey(0), x, pos)
        out = attn.apply(params, x, pos)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_linear_attn_modes_agree(self, monkeypatch):
        """MCEDM_OFORMER_ATTN3 modes 0 / xla / 1 are value-equal — the 3D
        head-fold and denom-on-dots placement are pure lowering choices."""
        from m_cedm_tpu.models.oformer import _linear_attn

        key = jax.random.PRNGKey(7)
        for (b, h, nq, nk, d, e) in [(2, 4, 24, 16, 8, 12), (1, 1, 10, 10, 6, 6)]:
            q = jax.random.normal(key, (b, h, nq, d))
            k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, nk, d))
            v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, nk, e))
            for denom in (nk, jnp.arange(1, b + 1, dtype=jnp.float32
                                         ).reshape(b, 1, 1, 1)):
                outs = {}
                for mode in ("0", "xla", "1"):
                    monkeypatch.setenv("MCEDM_OFORMER_ATTN3", mode)
                    outs[mode] = _linear_attn(q, k, v, denom)
                for mode in ("xla", "1"):
                    np.testing.assert_allclose(
                        np.asarray(outs[mode]), np.asarray(outs["0"]),
                        rtol=1e-5, atol=1e-5)

    def test_linear_attn_pallas_kernels_interpret(self, monkeypatch):
        """Streaming-kernel primitives (fwd + custom VJP) vs jnp reference
        at a kernel-eligible shape, pallas in interpret mode on CPU."""
        from jax.experimental import pallas as pl

        from m_cedm_tpu.pallas import linear_attention as la

        monkeypatch.setenv("MCEDM_PALLAS", "1")

        key = jax.random.PRNGKey(0)
        bh, n, d, e = 2, la._TN, 128, 128
        k = jax.random.normal(key, (bh, n, d), jnp.float32)
        v = jax.random.normal(jax.random.fold_in(key, 1), (bh, n, e))
        q = jax.random.normal(jax.random.fold_in(key, 2), (bh, n, d))
        g = jax.random.normal(jax.random.fold_in(key, 3), (bh, n, e))
        assert la._use_kernel(k)

        orig = pl.pallas_call
        la.pl.pallas_call = lambda *a, **kw: orig(*a, **{**kw, "interpret": True})
        try:
            def f(fwd_pair):
                ad, kv = fwd_pair
                return lambda q_, k_, v_: jnp.sum(ad(q_, kv(k_, v_) / n) * g)

            pal = f((la.apply_dots, la.kv_dots))
            ref = f((la._apply_reference, la._kv_reference))
            np.testing.assert_allclose(float(pal(q, k, v)), float(ref(q, k, v)),
                                       rtol=1e-5)
            gp = jax.grad(pal, (0, 1, 2))(q, k, v)
            gr = jax.grad(ref, (0, 1, 2))(q, k, v)
            for a, b2 in zip(gp, gr):
                rel = float(jnp.max(jnp.abs(a - b2))
                            / (jnp.max(jnp.abs(b2)) + 1e-9))
                assert rel < 2e-5
        finally:
            la.pl.pallas_call = orig


def enc_cfg():
    return OformerEncoderConfig(input_channels=3, time_window=1, in_emb_dim=32,
                                out_channels=32, max_node_type=2, heads=1,
                                depth=4, res=X, use_ln=True,
                                relative_emb_dim=2)


def dec_cfg():
    return OformerDecoderConfig(max_node_type=2, latent_channels=32,
                                out_channels=1, res=X, scale=2.0, dropout=0.0,
                                relative_emb_dim=2)


class TestEncoderDecoder:
    def test_encoder_shapes(self):
        enc = IrregSTEncoder(enc_cfg())
        x = jnp.zeros((B, 1, NTOK, 3))
        nt = jnp.zeros((B, NTOK, 1), jnp.int32)
        pos = jnp.zeros((B, NTOK, 2))
        params = enc.init(jax.random.PRNGKey(0), x, nt, pos)
        z = enc.apply(params, x, nt, pos)
        assert z.shape == (B, NTOK, 32)

    def test_decoder_rollout(self):
        dec = IrregSTDecoder(dec_cfg())
        z = jnp.zeros((B, NTOK, 32))
        pos = jnp.zeros((B, NTOK, 2))
        nt = jnp.zeros((B, NTOK, 1), jnp.int32)
        params = dec.init(jax.random.PRNGKey(0), z, pos, nt, 3, pos)
        out = dec.apply(params, z, pos, nt, 3, pos)
        assert out.shape == (B, 3, NTOK, 1)
        # fourier feature matrix lives in the frozen collection
        assert "constants" in params

    def test_decoder_steps_differ(self):
        """Latent propagation must evolve: step outputs should differ."""
        dec = IrregSTDecoder(dec_cfg())
        z = jax.random.normal(jax.random.PRNGKey(1), (B, NTOK, 32))
        pos = jax.random.uniform(jax.random.PRNGKey(2), (B, NTOK, 2))
        nt = jnp.zeros((B, NTOK, 1), jnp.int32)
        params = dec.init(jax.random.PRNGKey(0), z, pos, nt, 2, pos)
        out = dec.apply(params, z, pos, nt, 2, pos)
        assert not np.allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]))


def oformer_hparams():
    return to_dotdict({
        "name": "oformer_t", "time_history": T,
        "encoder": {"input_channels": 3, "time_window": 1, "in_emb_dim": 32,
                    "out_channels": 32, "max_node_type": 2, "heads": 1,
                    "depth": 4, "res": X, "use_ln": True, "emb_dropout": 0.0,
                    "relative_emb_dim": 2},
        "decoder": {"max_node_type": 2, "latent_channels": 32,
                    "out_channels": 1, "res": X, "scale": 2, "dropout": 0.1,
                    "relative_emb_dim": 2},
        "norm_shape": [], "loss": "mse", "lr": 1e-3, "weight_decay": 1e-4,
        "curriculum_steps": 8, "curriculum_ratio": 0.2,
    })


def token_batch():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, 1, NTOK, 3).astype(np.float32))
    y = jnp.asarray(rs.randn(B, 1, NTOK, 1).astype(np.float32))
    nt = jnp.zeros((B, NTOK, 1), jnp.int32)
    tg, xg = np.meshgrid(np.linspace(0, 1, T), np.linspace(0, 1, X),
                         indexing="ij")
    pos = jnp.asarray(np.broadcast_to(
        np.stack([tg, xg], -1).reshape(-1, 2)[None], (B, NTOK, 2)).astype(np.float32))
    n_time = jnp.full((B,), T, jnp.int32)
    return x, y, nt, pos, n_time


class TestOformerTask:
    def setup_method(self):
        self.task = OformerTask(oformer_hparams(), steps_per_epoch=2,
                                max_epochs=4)
        self.task.set_pde_loss_function("swe_per", False)
        self.state = self.task.init_state(jax.random.PRNGKey(0))
        self.batch = token_batch()

    def test_train_step(self):
        state2, metrics = self.task.train_step(self.state, self.batch,
                                               jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["train_loss"]))
        assert int(state2.step) == 1

    def test_constants_frozen(self):
        state = self.state
        b0 = np.asarray(jax.tree_util.tree_leaves(state.params["constants"])[0])
        for i in range(3):
            state, _ = self.task.train_step(state, self.batch,
                                            jax.random.PRNGKey(i))
        b1 = np.asarray(jax.tree_util.tree_leaves(state.params["constants"])[0])
        np.testing.assert_array_equal(b0, b1)

    def test_eval_metrics(self):
        metrics, pred = self.task.eval_step(self.state, self.batch, split="val")
        expected = {"val_loss", "val_mae_u", "val_mae_u_un", "val_corr",
                    "val_mae_u_scaled", "val_pde_loss", "val_pde_loss_gt"}
        assert set(metrics) == expected
        assert pred.shape == (B, T, X, 1)

    def test_loss_decreases(self):
        state = self.state
        first = None
        for i in range(25):
            state, m = self.task.train_step(state, self.batch,
                                            jax.random.PRNGKey(7))
            if first is None:
                first = float(m["train_loss"])
        assert float(m["train_loss"]) < first


class TestOformerData:
    @pytest.fixture(scope="class")
    def h5_paths(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("odata")
        path = str(root / "train.h5")
        rs = np.random.RandomState(0)
        inp = rs.rand(6, T, X, 1).astype(np.float32)
        tar = rs.rand(6, T, X, 1).astype(np.float32)
        write_store(path, inp, tar, np.linspace(0, 1, X).astype(np.float32),
                    np.linspace(0, 0.1, T).astype(np.float32))
        return path

    def test_swp_datamodule(self, h5_paths):
        dm = PlOformerSwpDatamodule(train_path=h5_paths, val_path=h5_paths,
                                    test_path=h5_paths, batch_size=3,
                                    return_abs_coords=True, norm_x=True,
                                    norm_t=True, add_t=True, train_2d=True)
        x, y, nt, pos, n_time = next(dm.iter_split("train",
                                                   np.random.default_rng(0)))
        assert x.shape == (3, 1, NTOK, 3)  # state + t + x channels
        assert y.shape == (3, 1, NTOK, 1)
        assert nt.shape == (3, NTOK, 1)
        assert pos.shape == (3, NTOK, 2)
        assert int(n_time[0]) == T
        # boundary tokens marked
        grid_nt = nt[0].reshape(T, X)
        assert grid_nt[0].min() == 1 and grid_nt[1, 1] == 0

    def test_timepred_datamodule(self, h5_paths):
        dm = PlOformerSwpTimePredDatamodule(
            train_path=h5_paths, val_path=h5_paths, test_path=h5_paths,
            batch_size=3, return_abs_coords=True, norm_x=True, norm_t=True,
            add_t=True, n_history=T // 2)
        batch = next(dm.iter_split("train", np.random.default_rng(0)))
        x, y, nt_i, nt_p, pos_i, pos_p, n_time = batch
        assert x.shape == (3, 1, T // 2 * X, 4)  # u + s + t + x channels
        assert y.shape == (3, 1, T // 2 * X, 2)  # u + s
        assert int(n_time[0]) == T // 2


class TestOformerTimePredTask:
    def test_train_eval(self):
        hp = oformer_hparams()
        hp["encoder"]["input_channels"] = 4
        hp["decoder"]["out_channels"] = 2
        task = OformerTimePredTask(hp, steps_per_epoch=2, max_epochs=4)
        task.set_pde_loss_function("swe_per", False)
        stats = {"input_mean": 0.5, "input_std": 1.0, "target_mean": 0.0,
                 "target_std": 1.0, "norm_input": True, "norm_target": True,
                 "input_min": 0.0, "input_min_max": 1.0, "target_min": 0.0,
                 "target_min_max": 1.0}
        state = task.init_state(jax.random.PRNGKey(0), stats)
        rs = np.random.RandomState(0)
        half = T // 2 * X
        batch = (
            jnp.asarray(rs.randn(B, 1, half, 4).astype(np.float32)),
            jnp.asarray(rs.randn(B, 1, half, 2).astype(np.float32)),
            jnp.zeros((B, half, 1), jnp.int32),
            jnp.zeros((B, half, 1), jnp.int32),
            jnp.zeros((B, half, 2)),
            jnp.zeros((B, half, 2)),
            jnp.full((B,), T // 2, jnp.int32),
        )
        state2, metrics = task.train_step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["train_loss"]))
        metrics, pred = task.eval_step(state, batch, split="test")
        assert "test_pde_loss" in metrics


class TestOformerStateTimePred:
    def test_two_stage_compose(self):
        from m_cedm_tpu.tasks.oformer import OformerStateTimePredTask

        hp_state = oformer_hparams()
        hp_time = oformer_hparams()
        hp_time["encoder"]["input_channels"] = 4
        hp_time["decoder"]["out_channels"] = 2
        hp = to_dotdict({"hparams_state": hp_state, "hparams_time": hp_time,
                         "time_history": T // 2, "norm_shape": []})
        task = OformerStateTimePredTask(hp)
        task.set_pde_loss_function("swe_per", False)

        stats = {"input_mean": 0.5, "input_std": 1.0, "target_mean": 0.0,
                 "target_std": 1.0, "norm_input": True, "norm_target": True,
                 "input_min": 0.0, "input_min_max": 1.0, "target_min": 0.0,
                 "target_min_max": 1.0}
        s_rec = task.model_state.init_state(jax.random.PRNGKey(0), stats)
        s_time = task.model_time.init_state(jax.random.PRNGKey(1), stats)

        # reconstruction batch over the full grid
        rec = token_batch()
        # time-pred batch over the future half
        rs = np.random.RandomState(0)
        half = T // 2 * X
        timepred = (
            jnp.asarray(rs.randn(B, 1, half, 4).astype(np.float32)),
            jnp.asarray(rs.randn(B, 1, half, 2).astype(np.float32)),
            jnp.zeros((B, half, 1), jnp.int32),
            jnp.zeros((B, half, 1), jnp.int32),
            jnp.zeros((B, half, 2)),
            jnp.zeros((B, half, 2)),
            jnp.full((B,), T // 2, jnp.int32),
        )
        metrics, pred = task.test_step(s_rec, s_time, rec, timepred)
        assert set(metrics) == {"test_mae_un_rec", "test_mae_un_pred",
                                "test_mae_un"}
        assert all(np.isfinite(float(v)) for v in metrics.values())
