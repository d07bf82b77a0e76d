"""Data layer tests: h5 round-trip, datamodule semantics, mask samplers."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from m_cedm_tpu.data import masks as mask_lib
from m_cedm_tpu.data.datamodule import (
    HDF5Datamodule,
    HDF5MaskDatamodule,
    HDF5SparseMaskDatamodule,
    HDF5TimeMaskDatamodule,
)
from m_cedm_tpu.data.h5_io import read_store, write_store
from m_cedm_tpu.data.synthetic import write_swe_dataset

T, X = 16, 16


@pytest.fixture(scope="module")
def h5_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    train = str(root / "train.h5")
    test = str(root / "test.h5")
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    write_swe_dataset(train, k1, n_traj=8, xdim=X, n_time_steps=T)
    write_swe_dataset(test, k2, n_traj=4, xdim=X, n_time_steps=T)
    return train, test


class TestH5IO:
    def test_roundtrip(self, h5_paths):
        train, _ = h5_paths
        store = read_store(train)
        assert store.inputs.shape == (8, T, X, 1)
        assert store.targets.shape == (8, T, X, 1)
        assert store.x.shape == (8, X)
        assert store.t.shape == (8, T)
        for k in ("inp_mean", "inp_std", "tar_mean", "tar_std",
                  "inp_min", "inp_max", "tar_min", "tar_max"):
            assert k in store.attrs

    def test_physical_height_range(self, h5_paths):
        # initial heights are in [1, 2] by construction
        store = read_store(h5_paths[0])
        h0 = store.inputs[:, 0, :, 0]
        assert h0.min() >= 0.99 and h0.max() <= 2.01

    def test_extra_time_step_truncated(self, tmp_path):
        path = str(tmp_path / "extra.h5")
        inp = np.random.rand(2, 4, 8, 1).astype(np.float32)
        write_store(path, inp, inp, np.linspace(0, 1, 8, dtype=np.float32),
                    np.linspace(0, 1, 5, dtype=np.float32))  # T+1 time points
        store = read_store(path)
        assert store.t.shape == (2, 4)


class TestDatamodule:
    def test_norm_stats_and_flip(self, h5_paths):
        train, test = h5_paths
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=4)
        stats = dm.get_norm_stats()
        assert stats["input_mean"] == pytest.approx(read_store(train).attrs["inp_mean"])
        dm_flip = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                                 batch_size=4, flip_xy=True)
        stats_f = dm_flip.get_norm_stats()
        assert stats_f["input_mean"] == pytest.approx(float(stats["target_mean"]))
        assert stats_f["target_std"] == pytest.approx(float(stats["input_std"]))

    def test_batch_shapes_rel_coords(self, h5_paths):
        train, test = h5_paths
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=4)
        inp, dx, dt, tar = next(dm.iter_split("train", np.random.default_rng(0)))
        assert inp.shape == (4, T, X, 1)
        assert dx.shape == (4,) and dt.shape == (4,)
        assert tar.shape == (4, T, X, 1)

    def test_batch_shapes_grid(self, h5_paths):
        train, test = h5_paths
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=4, return_abs_coords=True, return_grid=True,
                            norm_x=True, norm_t=True, norm_input=False,
                            norm_target=False)
        inp, t_grid, x_grid, tar = next(dm.iter_split("train", np.random.default_rng(0)))
        assert t_grid.shape == (4, T, X, 1)
        assert x_grid.shape == (4, T, X, 1)
        # normalized coords span [0, 1]
        assert t_grid.min() == pytest.approx(0.0) and t_grid.max() == pytest.approx(1.0)
        # t varies along axis 1 only; x along axis 2 only
        assert np.allclose(t_grid[0, :, 0, 0], t_grid[0, :, -1, 0])
        assert np.allclose(x_grid[0, 0, :, 0], x_grid[0, -1, :, 0])

    def test_normalization_applied(self, h5_paths):
        train, test = h5_paths
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=8)
        inp, *_ = next(dm.iter_split("train"))
        # gauss-normalized input should be roughly zero-mean unit-ish std
        assert abs(inp.mean()) < 0.5
        dm2 = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                             batch_size=8, norm_input=False)
        inp2, *_ = next(dm2.iter_split("train"))
        assert inp2.mean() > 0.9  # raw water heights ~[1, 2]

    def test_use_theta_and_tar_ic(self, h5_paths):
        train, test = h5_paths
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=4, use_theta=True, use_tar_ic=True)
        inp, *_ , tar = next(dm.iter_split("train"))
        # 1 input channel + 1 const (init_u) + 1 target-IC channel
        assert inp.shape[-1] == 3

    def test_down_factor_interp(self, h5_paths):
        train, test = h5_paths
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=4, down_factor=2, down_interp=True)
        inp, *_ = next(dm.iter_split("test"))
        assert inp.shape == (4, T, X, 1)  # resolution preserved via interp
        dm2 = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                             batch_size=4, down_factor=2, down_interp=False)
        inp2, x2, t2, _ = next(dm2.iter_split("test"))
        assert inp2.shape == (4, T // 2, X // 2, 1)

    def test_test_batching_keeps_remainder(self, h5_paths):
        train, test = h5_paths
        dm = HDF5Datamodule(train_path=train, val_path=test, test_path=test,
                            batch_size=3)
        batches = list(dm.iter_split("test"))
        assert sum(b[0].shape[0] for b in batches) == 4


class TestTrainMasks:
    def test_var_mask_is_block(self):
        key = jax.random.PRNGKey(0)
        m = mask_lib.sample_train_mask_var(key, T, X, 1, 1)
        assert m.shape == (T, X, 2)
        # exactly one variable fully missing
        col = m[0, 0]
        assert sorted(col.tolist()) == [0.0, 1.0]
        assert bool(jnp.all(m == m[0, 0][None, None, :]))

    def test_var_mask_balance(self):
        keys = jax.random.split(jax.random.PRNGKey(1), 400)
        ms = jax.vmap(lambda k: mask_lib.sample_train_mask_var(k, 4, 4, 1, 1))(keys)
        frac_target_missing = float(jnp.mean(ms[:, 0, 0, 1]))
        assert 0.4 < frac_target_missing < 0.6

    def test_time_mask_distribution(self):
        keys = jax.random.split(jax.random.PRNGKey(2), 600)
        ms = jax.vmap(lambda k: mask_lib.sample_train_mask_time(k, T, X, 1, 1))(keys)
        # early rows: ~40% target missing, ~40% input missing, 20% both present
        tar_missing = float(jnp.mean(ms[:, 0, 0, 1]))
        inp_missing = float(jnp.mean(ms[:, 0, 0, 0]))
        assert 0.32 < tar_missing < 0.48
        assert 0.32 < inp_missing < 0.48
        # last row is masked more often than the first (time cutoff)
        assert float(jnp.mean(ms[:, -1])) > float(jnp.mean(ms[:, 0]))
        # cutoff never starts before T/2
        assert bool(jnp.all(ms[:, : T // 2 - 1] == ms[:, 0:1]))

    def test_sparse_mask_strides(self):
        keys = jax.random.split(jax.random.PRNGKey(3), 200)
        ms = jax.vmap(lambda k: mask_lib.sample_train_mask_sparse(k, T, X, 1, 1))(keys)
        assert ms.shape == (200, T, X, 2)
        # observed (0) entries only at stride-aligned positions when strided
        assert float(jnp.mean(ms)) > 0.3  # plenty of missing entries

    def test_samplers_jit_under_vmap(self):
        keys = jax.random.split(jax.random.PRNGKey(4), 8)
        f = jax.jit(jax.vmap(lambda k: mask_lib.sample_train_mask_time(k, T, X, 1, 1)))
        out = f(keys)
        assert out.shape == (8, T, X, 2)


class TestEvalMasks:
    def test_var_tasks(self):
        masks = mask_lib.eval_masks_var(T, X, 1, 1)
        assert set(masks) == {"u", "h"}
        assert masks["u"][..., 0].max() == 0.0  # input observed
        assert masks["u"][..., 1].min() == 1.0  # target missing

    def test_time_tasks(self):
        masks = mask_lib.eval_masks_time(T, X, 1, 1, add_time_masks=True)
        assert set(masks) == {"hu", "u", "h"}
        m = masks["hu"]
        assert m[: T // 2].max() == 0.0 and m[T // 2:].min() == 1.0

    def test_sparse_tasks(self):
        masks = mask_lib.eval_masks_sparse(T, X, 1, 1, add_res_masks=True)
        m = masks["u"]
        assert m[::4, ::4, 0].max() == 0.0  # every 4th point of input observed
        assert m[1::4, :, 0].min() == 1.0

    def test_stacking(self):
        names, stacked = mask_lib.stack_eval_masks(mask_lib.eval_masks_var(T, X))
        assert names == ("u", "h")
        assert stacked.shape == (2, T, X, 2)


class TestMaskDatamodules:
    def test_kinds_and_eval_masks(self, h5_paths):
        train, test = h5_paths
        dm = HDF5MaskDatamodule(train_path=train, val_path=test, test_path=test,
                                batch_size=4)
        assert dm.train_mask_kind == "var"
        assert set(dm.eval_masks()) == {"u", "h"}
        dm_t = HDF5TimeMaskDatamodule(train_path=train, val_path=test,
                                      test_path=test, batch_size=4,
                                      add_time_masks=True)
        assert dm_t.train_mask_kind == "time"
        assert set(dm_t.eval_masks()) == {"hu", "u", "h"}
        dm_s = HDF5SparseMaskDatamodule(train_path=train, val_path=test,
                                        test_path=test, batch_size=4,
                                        add_res_masks=True)
        assert dm_s.train_mask_kind == "sparse"
