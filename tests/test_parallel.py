"""Multi-device (8 virtual CPU) sharding tests + Trainer loop tests."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m_cedm_tpu.config import to_dotdict
from m_cedm_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)
from m_cedm_tpu.tasks import FnoStateReconstrTask, McedmTask
from tests.test_tasks import grid_batch, mcedm_hparams

RES = 16
B = 8


class TestMesh:
    def test_eight_devices(self):
        assert len(jax.devices()) == 8

    def test_mesh_and_shardings(self):
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        x = np.ones((8, 4, 4), np.float32)
        placed = shard_batch((x,), mesh)[0]
        assert placed.sharding == batch_sharding(mesh)
        # non-divisible leading dims get replicated
        y = np.ones((3,), np.float32)
        placed_y = shard_batch((y,), mesh)[0]
        assert placed_y.sharding == replicated(mesh)

    def test_sharded_train_step_matches_single_device(self):
        """The flagship train step must produce identical losses and params
        whether the batch is sharded over 8 devices or run unsharded —
        data-parallelism is numerically transparent."""
        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        batch = tuple(np.asarray(a) for a in grid_batch(jax.random.PRNGKey(1)))
        # batch of 4 -> pad to 8 for the 8-device mesh
        batch = tuple(np.concatenate([a, a]) if a.ndim > 1 else a for a in batch)

        key = jax.random.PRNGKey(2)
        state_ref, metrics_ref = task.train_step(state, jax.device_put(batch), key)

        mesh = make_mesh()
        state_m = replicate(state, mesh)
        batch_m = shard_batch(batch, mesh)
        state_sh, metrics_sh = task.train_step(state_m, batch_m, key)

        np.testing.assert_allclose(float(metrics_ref["train_loss"]),
                                   float(metrics_sh["train_loss"]), rtol=1e-4)
        p_ref = jax.tree_util.tree_leaves(state_ref.params)
        p_sh = jax.tree_util.tree_leaves(state_sh.params)
        for a, b in zip(p_ref, p_sh):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)

    def test_sampling_sharded_over_batch(self):
        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        mesh = make_mesh()
        state_m = replicate(state, mesh)
        cond = np.zeros((8, RES, RES, 2), np.float32)
        mask = np.concatenate([np.zeros((8, RES, RES, 1)),
                               np.ones((8, RES, RES, 1))], axis=-1).astype(np.float32)
        cond_m, mask_m = shard_batch((cond, mask), mesh)
        out = task.sample_edm(state_m, cond_m, mask_m, jax.random.PRNGKey(1))
        assert out.shape == (8, 1, RES, RES, 2)
        assert np.all(np.isfinite(np.asarray(out)))

    def test_sampling_sharded_over_ensemble(self):
        """SURVEY §2.9 headroom: at test_batch_size=1 / large n_samples the
        n_samples ensemble is the parallel axis — shard the PRNG keys over
        the mesh and vmap; results must equal the single-device ensemble."""
        from m_cedm_tpu.parallel.mesh import shard_ensemble

        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        cond = jnp.zeros((1, RES, RES, 2))
        mask = jnp.concatenate([jnp.zeros((1, RES, RES, 1)),
                                jnp.ones((1, RES, RES, 1))], axis=-1)
        sp = dict(task.test_sparams, timesteps=4)

        def draw(k):
            return task.sample_edm(state, cond, mask, k, sp)[:, -1]

        keys = jax.random.split(jax.random.PRNGKey(7), 8)
        ref = jax.vmap(draw)(keys)

        mesh = make_mesh()
        state_m = replicate(state, mesh)

        def draw_m(k):
            return task.sample_edm(state_m, cond, mask, k, sp)[:, -1]

        keys_m = shard_ensemble(keys, mesh)
        assert keys_m.sharding == batch_sharding(mesh)
        out = jax.jit(jax.vmap(draw_m))(keys_m)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_eval_step_ensemble_sharded(self):
        """The PRODUCTION eval path (eval_step -> chunked_ensemble) shards
        the n_samples axis over the mesh when given one: identical metrics
        to the unsharded eval at batch 1 / ensemble 8 (the reference's
        n_samples=100 / test_batch_size=1 regime, run.py:52-54)."""
        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        state = task.init_state(jax.random.PRNGKey(0))
        batch = tuple(np.asarray(a)[:1] if np.asarray(a).ndim > 1
                      else np.asarray(a)
                      for a in grid_batch(jax.random.PRNGKey(1)))
        mask = jnp.concatenate([jnp.zeros((RES, RES, 1)),
                                jnp.ones((RES, RES, 1))], axis=-1)
        task.set_test_sampler_params(dict(task.test_sparams, timesteps=4))
        key = jax.random.PRNGKey(3)
        m_ref, pred_ref = task.eval_step(state, jax.device_put(batch), key,
                                         mask, split="val", n_samples=8)

        mesh = make_mesh()
        state_m = replicate(state, mesh)
        batch_m = shard_batch(batch, mesh)  # B=1 -> replicated
        m_sh, pred_sh = task.eval_step(state_m, batch_m, key, mask,
                                       split="val", n_samples=8, mesh=mesh)
        for k_ in m_ref:
            np.testing.assert_allclose(float(m_ref[k_]), float(m_sh[k_]),
                                       rtol=2e-4, err_msg=k_)
        np.testing.assert_allclose(np.asarray(pred_sh), np.asarray(pred_ref),
                                   rtol=1e-4, atol=1e-5)


class TestTrainerLoop:
    @pytest.fixture()
    def fno_setup(self, tmp_path):
        from m_cedm_tpu.data.datamodule import HDF5Datamodule
        from m_cedm_tpu.data.synthetic import write_swe_dataset

        train = str(tmp_path / "train.h5")
        test = str(tmp_path / "test.h5")
        write_swe_dataset(train, jax.random.PRNGKey(0), 8, RES, RES)
        write_swe_dataset(test, jax.random.PRNGKey(1), 4, RES, RES)
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=4, return_abs_coords=True,
                            norm_x=True, norm_t=True)
        hp = to_dotdict(dict(name="fno_state_reconstr_2d", modes_1=4, modes_2=4,
                             width=8, num_layers=2, padding_t=2, padding_x=0,
                             inst_norm=False, time_history=RES, time_future=0,
                             input_size=1, state_size=1, norm_shape=[],
                             factor=0.3, step_size=50, loss="l1", lr=1e-3,
                             weight_decay=0))
        task = FnoStateReconstrTask(hp)
        task.set_pde_loss_function("swe_per", False)
        return task, dm

    def test_fit_and_test(self, fno_setup, tmp_path):
        from m_cedm_tpu.train.loop import Trainer
        from m_cedm_tpu.train.metrics import MetricsLogger

        task, dm = fno_setup
        out = str(tmp_path / "run")
        trainer = Trainer(max_epochs=2, out_dir=out,
                          logger=MetricsLogger(out), use_mesh=True,
                          ckpt_monitor="val_mae_u")
        state = trainer.fit(task, dm)
        assert int(jax.device_get(state.step)) == 4  # 2 epochs x 2 batches
        metrics = trainer.test(task, dm)
        assert "test_mae_u" in metrics
        assert os.path.exists(os.path.join(out, "metrics.jsonl"))
        assert trainer.ckpt.latest_step() == 4

    def test_resume_from_checkpoint(self, fno_setup, tmp_path):
        from m_cedm_tpu.train.loop import Trainer
        from m_cedm_tpu.train.metrics import MetricsLogger

        task, dm = fno_setup
        out = str(tmp_path / "run1")
        t1 = Trainer(max_epochs=1, out_dir=out, logger=MetricsLogger(out))
        state1 = t1.fit(task, dm)

        out2 = str(tmp_path / "run2")
        t2 = Trainer(max_epochs=2, out_dir=out2, logger=MetricsLogger(out2))
        state2 = t2.fit(task, dm, ckpt_path=out)
        # resumed at epoch 1, trained one more epoch
        assert int(jax.device_get(state2.step)) == 4


class TestMcedmCheckpointRoundtrip:
    def test_full_state_roundtrip(self, tmp_path):
        """Checkpoint carries params + EMA + optimizer + normalizers + step
        (the reference's Lightning checkpoints carry the same:
        configs/callbacks + register_buffer normalizers)."""
        from m_cedm_tpu.tasks import McedmTask
        from m_cedm_tpu.train.checkpoint import CheckpointManager
        from tests.test_tasks import grid_batch, mcedm_hparams

        task = McedmTask(mcedm_hparams())
        task.set_pde_loss_function("swe_per", False)
        stats = {"input_mean": 1.5, "input_std": 0.9, "target_mean": 0.0,
                 "target_std": 0.11, "input_min": 0.0, "input_min_max": 1.0,
                 "target_min": 0.0, "target_min_max": 1.0}
        state = task.init_state(jax.random.PRNGKey(0), stats)
        batch = grid_batch(jax.random.PRNGKey(1))
        for i in range(2):
            state, _ = task.train_step(state, batch, jax.random.PRNGKey(i))

        mgr = CheckpointManager(str(tmp_path / "ckpt"))
        mgr.save(int(state.step), state)
        mgr.close()

        # restore into a fresh skeleton
        mgr2 = CheckpointManager(str(tmp_path / "ckpt"))
        fresh = task.init_state(jax.random.PRNGKey(42))
        restored = mgr2.restore(fresh)
        mgr2.close()
        assert int(restored.step) == 2
        np.testing.assert_allclose(
            float(restored.normalizer_input.subtract), 1.5)
        for a, b in zip(jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree_util.tree_leaves(state.ema_params),
                        jax.tree_util.tree_leaves(restored.ema_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # training continues from the restored state
        state3, m = task.train_step(restored, batch, jax.random.PRNGKey(9))
        assert np.isfinite(float(m["train_loss"]))


class TestProfiler:
    def test_step_timer_and_trace(self, tmp_path):
        from m_cedm_tpu.train.profiler import StepTimer, trace
        import jax.numpy as jnp

        timer = StepTimer()
        f = jax.jit(lambda k: jnp.sum(jax.random.normal(k, (64, 64))))
        dt = timer.time(lambda: f(jax.random.PRNGKey(0)), n=3)
        assert dt >= 0
        assert "mean_s" in timer.summary()

        out = str(tmp_path / "trace")
        with trace(out):
            float(f(jax.random.PRNGKey(1)))
        assert os.path.exists(out)


def test_two_process_dcn_train_step():
    """The multi-HOST path executed for real: two OS processes (4 virtual
    CPU devices each) coordinate via distributed_init() (gloo), run one
    pjit-sharded train step over a global 8-device 'data' mesh, and must
    converge to bit-identical replicated params (the DDP invariant —
    reference configs/trainer/trainer_ddim.yaml:8). Covers
    jax.distributed.initialize + cross-process grad all-reduce, which the
    single-process virtual-device tests cannot."""
    import re
    import socket
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "tools", "dryrun_2proc.py")
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                   JAX_NUM_PROCESSES="2", JAX_PROCESS_ID=str(pid),
                   JAX_PLATFORMS="cpu",
                   XLA_FLAGS="--xla_force_host_platform_device_count=4")
        procs.append(subprocess.Popen(
            [sys.executable, script], env=env, cwd=repo,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        assert p.returncode == 0, out[-2000:]
        outs.append(out)
    rows = [re.search(r"DRYRUN2PROC pid=\d loss=(\S+) csum=(\S+)", o)
            for o in outs]
    assert all(rows), outs
    assert rows[0].group(1) == rows[1].group(1)  # same loss
    assert rows[0].group(2) == rows[1].group(2)  # bit-identical params
