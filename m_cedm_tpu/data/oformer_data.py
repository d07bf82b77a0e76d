"""OFormer token datamodules: flatten (t, x) grids into coordinate clouds.

Parity targets:
  SwpDataset           <- datamodules/oformer_dataset.py:9-186
      tokens = flattened (t, x) grid, channels = [state, (t), x] coords,
      boundary node types, offset positions (t - t_min, x - x_min)
  SwpTimePredDataset   <- datamodules/oformer_dataset.py:188-361
      history/future split into separate input/prop token sets
  PlOformerSwpDatamodule / PlOformerSwpTimePredDatamodule
                       <- datamodules/pl_oformer_datamodule.py

Host-resident like the base datamodules: all token arrays are materialized
once; batches are slices.
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional, Tuple

import numpy as np

from m_cedm_tpu.config import register
from m_cedm_tpu.data.datamodule import HDF5Datamodule, _bilinear_resize


class PlOformerSwpDatamodule(HDF5Datamodule):
    """Tokenized space-time datamodule for the OFormer reconstruction task.

    Batch: (x, y, node_type, offset_pos, n_time) with
      x:          (B, 1, T*X, C_in [+t][+x])
      y:          (B, 1, T*X, C_out)
      node_type:  (B, T*X, 1) int32 (1 on grid boundary)
      offset_pos: (B, T*X, 2)  (t - t_min, x - x_min)
      n_time:     (B,) int32
    """

    def __init__(self, *args, add_t: bool = False, train_2d: bool = True, **kw):
        self.add_t = add_t or train_2d
        self.train_2d = train_2d
        super().__init__(*args, **kw)

    def _materialize(self, store, down_factor):
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

        x_norm = ((x - x.min(1, keepdims=True))
                  / (x.max(1, keepdims=True) - x.min(1, keepdims=True))
                  if self.norm_x else x)
        t_norm = ((t - t.min(1, keepdims=True))
                  / (t.max(1, keepdims=True) - t.min(1, keepdims=True))
                  if self.norm_t else t)

        n, T, X = inp.shape[0], inp.shape[1], inp.shape[2]
        t_grid = np.broadcast_to(t_norm[:, :, None, None], (n, T, X, 1))
        x_grid = np.broadcast_to(x_norm[:, None, :, None], (n, T, X, 1))
        if self.add_t:
            inp = np.concatenate([inp, t_grid], axis=-1)
        inp = np.concatenate([inp, x_grid], axis=-1)

        if down_factor > 1:
            each = 2 ** (down_factor - 1)
            inp = np.stack([_bilinear_resize(s[::each, ::each], T, X) for s in inp])
            target = np.stack([_bilinear_resize(s[::each, ::each], T, X)
                               for s in target])

        return self._tokenize(inp, target, x, t)

    def _tokenize(self, inp, target, x, t):
        n, T, X = inp.shape[0], inp.shape[1], inp.shape[2]
        tg, xg = np.meshgrid(t[0] - t[0].min(), x[0] - x[0].min(), indexing="ij")
        offset_pos = np.stack([tg, xg], axis=-1).reshape(-1, 2).astype(np.float32)

        node_type = np.zeros((T, X), np.int32)
        node_type[0] = 1
        node_type[-1] = 1
        node_type[:, 0] = 1
        node_type[:, -1] = 1
        node_type = node_type.reshape(-1, 1)

        return {
            "x": inp.reshape(n, 1, T * X, inp.shape[-1]).astype(np.float32),
            "y": target.reshape(n, 1, T * X, target.shape[-1]).astype(np.float32),
            "node_type": np.broadcast_to(node_type[None], (n,) + node_type.shape),
            "pos": np.broadcast_to(offset_pos[None], (n,) + offset_pos.shape),
            "n_time": np.full((n,), T, np.int32),
        }

    def iter_split(self, split, rng=None, drop_last=None):
        arrays = self._prepare(split)
        n = arrays["x"].shape[0]
        bs = self.batch_size if split == "train" else self.test_batch_size
        idx = np.arange(n)
        if rng is not None:
            rng.shuffle(idx)
        if drop_last is None:
            drop_last = split == "train" and n >= bs
        stop = (n // bs) * bs if drop_last else n
        for start in range(0, stop, bs):
            sel = idx[start:start + bs]
            yield tuple(arrays[k][sel] for k in
                        ("x", "y", "node_type", "pos", "n_time"))

    def num_batches(self, split):
        arrays = self._prepare(split)
        n = arrays["x"].shape[0]
        bs = self.batch_size if split == "train" else self.test_batch_size
        return n // bs if split == "train" and n >= bs else (n + bs - 1) // bs

    def field_shape(self, split="train"):
        arrays = self._prepare(split)
        T = int(arrays["n_time"][0])
        ntok = arrays["x"].shape[2]
        return ((T, ntok // T, arrays["x"].shape[-1]),
                (T, ntok // T, arrays["y"].shape[-1]))


@register("datamodules.pl_oformer_datamodule.PlOformerSwpDatamodule",
          "m_cedm_tpu.data.PlOformerSwpDatamodule")
def _build_oformer_dm(**kw):
    return PlOformerSwpDatamodule(**kw)


class PlOformerSwpTimePredDatamodule(PlOformerSwpDatamodule):
    """Future-prediction variant: history tokens condition, future tokens
    are the prediction targets (separate positions / node types).

    Batch: (x, y, node_type_inp, node_type_prop, input_pos, prop_pos, n_time).
    """

    def __init__(self, *args, n_history: int = 64, **kw):
        self.n_history = n_history
        super().__init__(*args, **kw)

    def _materialize(self, store, down_factor):
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

        x_norm = ((x - x.min(1, keepdims=True))
                  / (x.max(1, keepdims=True) - x.min(1, keepdims=True))
                  if self.norm_x else x)
        t_norm = ((t - t.min(1, keepdims=True))
                  / (t.max(1, keepdims=True) - t.min(1, keepdims=True))
                  if self.norm_t else t)

        n, T, X = inp.shape[0], inp.shape[1], inp.shape[2]
        inp_dim = inp.shape[-1]
        tar_dim = target.shape[-1]
        t_grid = np.broadcast_to(t_norm[:, :, None, None], (n, T, X, 1))
        x_grid = np.broadcast_to(x_norm[:, None, :, None], (n, T, X, 1))
        extra = [t_grid, x_grid] if self.add_t else [x_grid]
        full = np.concatenate([inp, target] + extra, axis=-1)

        nh = self.n_history
        state_in = full[:, :nh]
        state_out = full[:, nh:, :, :inp_dim + tar_dim]
        n_fut = T - nh

        tg, xg = np.meshgrid(t[0] - t[0].min(), x[0] - x[0].min(), indexing="ij")
        pos = np.stack([tg, xg], axis=-1).astype(np.float32)
        node_type = np.zeros((T, X), np.int32)
        node_type[0] = 1
        node_type[-1] = 1
        node_type[:, 0] = 1
        node_type[:, -1] = 1

        def flat(a, n_lead):
            return a.reshape(a.shape[0], 1, -1, a.shape[-1]) if a.ndim == 4 \
                else a.reshape(-1, a.shape[-1])

        return {
            "x": state_in.reshape(n, 1, nh * X, -1).astype(np.float32),
            "y": state_out.reshape(n, 1, n_fut * X, -1).astype(np.float32),
            "node_type_inp": np.broadcast_to(
                node_type[:nh].reshape(-1, 1)[None], (n, nh * X, 1)),
            "node_type_prop": np.broadcast_to(
                node_type[nh:].reshape(-1, 1)[None], (n, n_fut * X, 1)),
            "input_pos": np.broadcast_to(
                pos[:nh].reshape(-1, 2)[None], (n, nh * X, 2)),
            "prop_pos": np.broadcast_to(
                pos[nh:].reshape(-1, 2)[None], (n, n_fut * X, 2)),
            "n_time": np.full((n,), n_fut, np.int32),
        }

    def iter_split(self, split, rng=None, drop_last=None):
        arrays = self._prepare(split)
        n = arrays["x"].shape[0]
        bs = self.batch_size if split == "train" else self.test_batch_size
        idx = np.arange(n)
        if rng is not None:
            rng.shuffle(idx)
        if drop_last is None:
            drop_last = split == "train" and n >= bs
        stop = (n // bs) * bs if drop_last else n
        keys = ("x", "y", "node_type_inp", "node_type_prop", "input_pos",
                "prop_pos", "n_time")
        for start in range(0, stop, bs):
            sel = idx[start:start + bs]
            yield tuple(arrays[k][sel] for k in keys)


@register("datamodules.pl_oformer_datamodule.PlOformerSwpTimePredDatamodule",
          "m_cedm_tpu.data.PlOformerSwpTimePredDatamodule")
def _build_oformer_timepred_dm(**kw):
    return PlOformerSwpTimePredDatamodule(**kw)
