"""Datamodules: host-resident trajectory stores with reference semantics.

Parity target: datamodules/pl_datamodule.py + datamodules/h5_dataset.py in the
reference. Differences by design (TPU-first):
  * The whole dataset (~100 MB) is materialized once into host numpy; batches
    are array slices — no worker processes, no per-item h5 reads.
  * Per-sample *training* masks are not produced here: the mask datamodules
    expose a `train_mask_kind` that the task module uses to sample masks
    on-device inside the jitted train step (data/masks.py).
  * Evaluation masks are a static stacked tensor + name tuple per datamodule.

Batch layout mirrors the reference item tuples:
  return_abs_coords & return_grid:  (inp, t_grid, x_grid, target)
  return_abs_coords:                (inp, x, t, target)
  neither:                          (inp, dx, dt, target)
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from m_cedm_tpu.config import DotDict, register
from m_cedm_tpu.data import masks as mask_lib
from m_cedm_tpu.data.h5_io import (
    TrajectoryStore,
    read_store,
    stats_from_attrs,
    stats_from_data,
)

EPS = 1e-6


def _bilinear_resize(arr: np.ndarray, out_t: int, out_x: int) -> np.ndarray:
    """Bilinear resize of (T, X, C) with half-pixel centers (torch
    align_corners=False semantics), no antialiasing."""
    import jax
    import jax.image

    with jax.default_device(jax.devices("cpu")[0]):
        out = jax.image.resize(arr, (out_t, out_x, arr.shape[-1]), method="bilinear",
                               antialias=False)
        return np.asarray(out)


def _linear_resize_1d(arr: np.ndarray, out_n: int) -> np.ndarray:
    import jax
    import jax.image

    with jax.default_device(jax.devices("cpu")[0]):
        return np.asarray(jax.image.resize(arr, (out_n,), method="linear",
                                           antialias=False))


@dataclasses.dataclass
class SplitArrays:
    """One split fully prepared per the dataset flags: (N, T, X, C) fields."""
    inp: np.ndarray
    target: np.ndarray
    coord_a: np.ndarray  # t_grid / x / dx depending on flags
    coord_b: np.ndarray  # x_grid / t / dt

    def __len__(self):
        return self.inp.shape[0]

    def batch(self, idx: np.ndarray):
        ca = self.coord_a[idx] if self.coord_a.shape[0] == self.inp.shape[0] else self.coord_a
        cb = self.coord_b[idx] if self.coord_b.shape[0] == self.inp.shape[0] else self.coord_b
        return self.inp[idx], ca, cb, self.target[idx]


class HDF5Datamodule:
    """Base datamodule over the reference h5 layout."""

    train_mask_kind: Optional[str] = None  # overridden by mask variants

    def __init__(
        self,
        name: str = "h5_datamodule",
        train_path: str = "data/train.h5",
        val_path: str = "data/val.h5",
        test_path: str = "data/test.h5",
        return_abs_coords: bool = False,
        return_grid: bool = False,
        norm_x: bool = False,
        norm_t: bool = False,
        norm_input: bool = True,
        norm_target: bool = True,
        flip_xy: bool = False,
        const_norm_stats: bool = True,
        use_theta: bool = False,
        use_tar_ic: bool = False,
        num_workers: int = 0,  # accepted for config parity; unused
        batch_size: int = 32,
        test_batch_size: Optional[int] = None,
        down_factor: int = 1,
        down_interp: bool = True,
        **_unused,
    ):
        self.name = name
        self.train_path = train_path
        self.val_path = val_path
        self.test_path = test_path
        self.return_abs_coords = return_abs_coords
        self.return_grid = return_grid
        self.norm_x = norm_x
        self.norm_t = norm_t
        self.norm_input = norm_input
        self.norm_target = norm_target
        self.flip_xy = flip_xy
        self.const_norm_stats = const_norm_stats
        self.use_theta = use_theta
        self.use_tar_ic = use_tar_ic
        self.batch_size = batch_size
        self.test_batch_size = test_batch_size if test_batch_size else batch_size
        self.down_factor = down_factor
        self.down_interp = down_interp

        self._splits: Dict[str, SplitArrays] = {}
        self._load_stats()

    # -- statistics --------------------------------------------------------

    def _load_stats(self):
        store = read_store(self.train_path)
        self._train_store = store
        if self.const_norm_stats and "inp_mean" in store.attrs:
            mean_std, min_max = stats_from_attrs(store.attrs)
        else:
            mean_std, min_max = stats_from_data(store.inputs, store.targets)
        input_mean, input_std, target_mean, target_std = [np.asarray(a, np.float32) for a in mean_std]
        input_min, input_max, target_min, target_max = [np.asarray(a, np.float32) for a in min_max]
        self.input_mean = input_mean
        self.input_std = input_std + EPS
        self.target_mean = target_mean
        self.target_std = target_std + EPS
        self.input_min = input_min
        self.input_min_max = input_max - input_min + EPS
        self.target_min = target_min
        self.target_min_max = target_max - target_min + EPS

    def get_norm_stats(self) -> DotDict:
        if self.flip_xy:
            return DotDict({
                "norm_target": self.norm_input,
                "target_mean": self.input_mean, "target_std": self.input_std,
                "target_min": self.input_min, "target_min_max": self.input_min_max,
                "norm_input": self.norm_target,
                "input_mean": self.target_mean, "input_std": self.target_std,
                "input_min": self.target_min, "input_min_max": self.target_min_max,
            })
        return DotDict({
            "norm_target": self.norm_target,
            "target_mean": self.target_mean, "target_std": self.target_std,
            "target_min": self.target_min, "target_min_max": self.target_min_max,
            "norm_input": self.norm_input,
            "input_mean": self.input_mean, "input_std": self.input_std,
            "input_min": self.input_min, "input_min_max": self.input_min_max,
        })

    # -- split preparation -------------------------------------------------

    def _prepare(self, split: str) -> SplitArrays:
        if split in self._splits:
            return self._splits[split]
        path = {"train": self.train_path, "val": self.val_path,
                "test": self.test_path}[split]
        store = self._train_store if path == self.train_path else read_store(path)
        down = self.down_factor if split != "train" else 1
        arrays = self._materialize(store, down)
        self._splits[split] = arrays
        return arrays

    def _materialize(self, store: TrajectoryStore, down_factor: int) -> SplitArrays:
        inp = store.inputs.copy()
        target = store.targets.copy()
        x = store.x.copy()
        t = store.t.copy()

        if self.norm_input:
            inp = (inp - self.input_mean) / self.input_std
        if self.norm_target:
            target = (target - self.target_mean) / self.target_std

        if self.flip_xy:
            inp, target = target, inp

        if self.use_theta:
            thetas = [np.broadcast_to(v[:, None, None, None],
                                      inp.shape[:3] + (1,)).astype(np.float32)
                      for v in store.consts.values()]
            inp = np.concatenate([inp] + thetas, axis=-1)

        if self.use_tar_ic:
            n_times = inp.shape[1]
            ic = np.repeat(target[:, 0:1], n_times, axis=1)
            inp = np.concatenate([inp, ic], axis=-1)

        if self.norm_x:
            xmn = x.min(axis=1, keepdims=True)
            xmx = x.max(axis=1, keepdims=True)
            x = (x - xmn) / (xmx - xmn)
        if self.norm_t:
            tmn = t.min(axis=1, keepdims=True)
            tmx = t.max(axis=1, keepdims=True)
            t = (t - tmn) / (tmx - tmn)

        if down_factor > 1:
            each = 2 ** (down_factor - 1)
            if self.down_interp:
                # downsample on a stride then bilinearly restore resolution
                T, X = inp.shape[1], inp.shape[2]
                inp = np.stack([_bilinear_resize(s[::each, ::each], T, X) for s in inp])
                target = np.stack([_bilinear_resize(s[::each, ::each], T, X) for s in target])
            else:
                T, X = inp.shape[1] // each, inp.shape[2] // each
                inp = np.stack([_bilinear_resize(s, T, X) for s in inp])
                target = np.stack([_bilinear_resize(s, T, X) for s in target])
                x = np.stack([_linear_resize_1d(r, X) for r in x])
                t = np.stack([_linear_resize_1d(r, T) for r in t])

        if self.return_abs_coords:
            if self.return_grid:
                t_grid = np.broadcast_to(t[:, :, None, None],
                                         t.shape + (x.shape[1], 1)).astype(np.float32)
                x_grid = np.broadcast_to(x[:, None, :, None],
                                         (x.shape[0], t.shape[1], x.shape[1], 1)).astype(np.float32)
                return SplitArrays(inp, target, np.ascontiguousarray(t_grid),
                                   np.ascontiguousarray(x_grid))
            return SplitArrays(inp, target, x, t)
        dx = np.diff(x, axis=1)[:, 0]
        dt = np.diff(t, axis=1)[:, 0]
        return SplitArrays(inp, target, dx, dt)

    # -- iteration ---------------------------------------------------------

    def num_batches(self, split: str) -> int:
        arrays = self._prepare(split)
        bs = self.batch_size if split == "train" else self.test_batch_size
        if split == "train":
            return len(arrays) // bs if len(arrays) >= bs else 1
        return (len(arrays) + bs - 1) // bs

    def iter_split(self, split: str, rng: Optional[np.random.Generator] = None,
                   drop_last: Optional[bool] = None) -> Iterator[Tuple]:
        arrays = self._prepare(split)
        n = len(arrays)
        bs = self.batch_size if split == "train" else self.test_batch_size
        idx = np.arange(n)
        if rng is not None:
            rng.shuffle(idx)
        if drop_last is None:
            drop_last = split == "train" and n >= bs
        stop = (n // bs) * bs if drop_last else n
        for start in range(0, stop, bs):
            yield arrays.batch(idx[start:start + bs])

    # -- shapes / eval masks ----------------------------------------------

    def field_shape(self, split: str = "train"):
        arrays = self._prepare(split)
        return arrays.inp.shape[1:], arrays.target.shape[1:]

    def channel_counts(self, split: str = "train"):
        (t_dim, x_dim, inp_ch), (_, _, tar_ch) = self.field_shape(split)
        return inp_ch, tar_ch

    def eval_masks(self, split: str = "test") -> Dict[str, np.ndarray]:
        raise NotImplementedError("base datamodule has no mask tasks")


@register("datamodules.pl_datamodule.HDF5Datamodule",
          "m_cedm_tpu.data.HDF5Datamodule")
def _build_h5(**kw):
    return HDF5Datamodule(**kw)


class HDF5MaskDatamodule(HDF5Datamodule):
    """50/50 variable-recovery masking (the mcedm flagship datamodule)."""
    train_mask_kind = "var"

    def eval_masks(self, split: str = "test") -> Dict[str, np.ndarray]:
        (t_dim, x_dim, inp_ch), (_, _, tar_ch) = self.field_shape(split)
        return mask_lib.eval_masks_var(t_dim, x_dim, inp_ch, tar_ch)


@register("datamodules.pl_datamodule.HDF5MaskDatamodule",
          "m_cedm_tpu.data.HDF5MaskDatamodule")
def _build_h5_mask(**kw):
    return HDF5MaskDatamodule(**kw)


class HDF5TimeMaskDatamodule(HDF5MaskDatamodule):
    """Mixed-conditional time masking (40/40/20 + time cutoffs)."""
    train_mask_kind = "time"

    def __init__(self, *args, add_time_masks: bool = False, **kw):
        super().__init__(*args, **kw)
        self.add_time_masks = add_time_masks

    def eval_masks(self, split: str = "test") -> Dict[str, np.ndarray]:
        (t_dim, x_dim, inp_ch), (_, _, tar_ch) = self.field_shape(split)
        return mask_lib.eval_masks_time(t_dim, x_dim, inp_ch, tar_ch,
                                        self.add_time_masks)


@register("datamodules.pl_datamodule.HDF5TimeMaskDatamodule",
          "m_cedm_tpu.data.HDF5TimeMaskDatamodule")
def _build_h5_time_mask(**kw):
    return HDF5TimeMaskDatamodule(**kw)


class HDF5SparseMaskDatamodule(HDF5MaskDatamodule):
    """Sparse-observation masking (random 2^k strides)."""
    train_mask_kind = "sparse"

    def __init__(self, *args, add_res_masks: bool = False, **kw):
        super().__init__(*args, **kw)
        self.add_res_masks = add_res_masks

    def eval_masks(self, split: str = "test") -> Dict[str, np.ndarray]:
        (t_dim, x_dim, inp_ch), (_, _, tar_ch) = self.field_shape(split)
        return mask_lib.eval_masks_sparse(t_dim, x_dim, inp_ch, tar_ch,
                                          self.add_res_masks)


@register("datamodules.pl_datamodule.HDF5SparseMaskDatamodule",
          "m_cedm_tpu.data.HDF5SparseMaskDatamodule")
def _build_h5_sparse_mask(**kw):
    return HDF5SparseMaskDatamodule(**kw)
