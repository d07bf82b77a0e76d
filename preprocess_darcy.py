#!/usr/bin/env python
"""Convert PDEBench 2D Darcy flow data into the framework's h5 layout.

Parity target: reference preprocess_darcy.py (change_format_h5py_darcy,
:228-264 — train idx 0..n_train, test idx 9000..9100; PDE-residual sanity
checks before writing).

    python preprocess_darcy.py --pdebench data/2D_DarcyFlow_beta1.0_Train.hdf5 \
        --out data/1D_darcy_128
"""
from __future__ import annotations

import argparse
import os

import h5py
import numpy as np


def darcy_residual(a, u, D=1.0):
    """Central-difference residual of -div(a grad u) (PDEBench dx = D/size)."""
    size = u.shape[1]
    u = u.reshape(u.shape[0], size, size)
    a = a.reshape(a.shape[0], size, size)
    dx = D / size
    ux = (u[:, 2:, 1:-1] - u[:, :-2, 1:-1]) / (2 * dx)
    uy = (u[:, 1:-1, 2:] - u[:, 1:-1, :-2]) / (2 * dx)
    a_in = a[:, 1:-1, 1:-1]
    aux, auy = a_in * ux, a_in * uy
    auxx = (aux[:, 2:, 1:-1] - aux[:, :-2, 1:-1]) / (2 * dx)
    auyy = (auy[:, 1:-1, 2:] - auy[:, 1:-1, :-2]) / (2 * dx)
    return -(auxx + auyy)


def residual_check(a, u, clip=False):
    """Mean |residual - 1| (the rhs is 1 for beta=1.0)."""
    loss = np.abs(darcy_residual(a, u) - 1.0)
    if clip:
        loss = np.clip(loss, 0, 1.0)
    return float(loss.mean())


def _stats(values):
    return {"mean": np.mean(values), "std": np.std(values),
            "min": np.min(values), "max": np.max(values)}


def _write_split(path, inp, target, inp_stats, tar_stats, x, t):
    with h5py.File(path, "w") as f:
        for i in range(inp.shape[0]):
            f.create_dataset(f"{i}/data/input", data=inp[i])
            f.create_dataset(f"{i}/data/target", data=target[i])
            f.create_dataset(f"{i}/grid/x", data=x)
            f.create_dataset(f"{i}/grid/t", data=t)
        for tag, stats in (("inp", inp_stats), ("tar", tar_stats)):
            for k, v in stats.items():
                f.attrs[f"{tag}_{k}"] = v


def change_format_h5py_darcy(pdebench_path, out_dir, n_train=1000,
                             save_file=True):
    with h5py.File(pdebench_path, "r") as f:
        const = np.asarray(f["nu"])[..., None]          # diffusion field a
        target = np.asarray(f["tensor"])[:, 0][..., None]  # solution u
        x = np.asarray(f["x-coordinate"])
        y = np.asarray(f["y-coordinate"])

    train_idx = np.arange(0, n_train)
    test_idx = np.arange(9000, min(9100, const.shape[0]))
    const_train, target_train = const[train_idx], target[train_idx]
    const_test, target_test = const[test_idx], target[test_idx]

    print("Train shape:", const_train.shape, target_train.shape)
    print("Test shape:", const_test.shape, target_test.shape)
    print(f"PDE loss train: {residual_check(const_train, target_train)}")
    print(f"PDE loss test: {residual_check(const_test, target_test)}")

    if save_file:
        os.makedirs(out_dir, exist_ok=True)
        inp_stats = _stats(const_train)
        tar_stats = _stats(target_train)
        postfix = "" if n_train == 1000 else f"_{n_train}"
        _write_split(os.path.join(out_dir, f"darcy_train{postfix}.h5"),
                     const_train, target_train, inp_stats, tar_stats, x, y)
        _write_split(os.path.join(out_dir, f"darcy_test{postfix}.h5"),
                     const_test, target_test, inp_stats, tar_stats, x, y)
    return const, target


def main():
    p = argparse.ArgumentParser(description="Convert PDEBench Darcy data")
    p.add_argument("--pdebench", default="data/2D_DarcyFlow_beta1.0_Train.hdf5")
    p.add_argument("--out", default="data/1D_darcy_128")
    p.add_argument("--n-train", type=int, default=1000)
    p.add_argument("--check-only", action="store_true")
    args = p.parse_args()
    change_format_h5py_darcy(args.pdebench, args.out, args.n_train,
                             save_file=not args.check_only)


if __name__ == "__main__":
    main()
