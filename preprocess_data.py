#!/usr/bin/env python
"""Preprocess SWE trajectory h5 files: truncate time steps + attach stats.

Parity target: reference preprocess_data.py (same CLI surface). The stats
pass is the sequential one-pass algorithm (:75-111): accumulate per-file
mean/min/max over samples, then a second pass for the std against the final
mean — identical numbers to loading everything at once (the reference ships
a `check_sequential_stats_calc` self-test; mirrored here in tests/).

    python preprocess_data.py --datafolder data/1D_swp_128 \
        --trainfile 1D_swp_128_train.h5 --testfile 1D_swp_128_test.h5 \
        --change_num_steps
"""
from __future__ import annotations

import argparse
import os

import h5py
import numpy as np


def _iter_samples(f):
    for key in f.keys():
        sample = f[key]
        yield (np.asarray(sample["data"]["input"]),
               np.asarray(sample["data"]["target"]))


def calc_stats(filepath):
    """Reference check: stats by loading the whole set at once."""
    with h5py.File(filepath, "r") as f:
        inps, tars = zip(*_iter_samples(f))

    def stats(values):
        arr = np.asarray(values, np.float64)
        flat = arr.reshape(-1, arr.shape[-1])
        return {"mean": flat.mean(0), "std": flat.std(0),
                "min": flat.min(0), "max": flat.max(0)}

    return stats(inps), stats(tars)


def calc_stats_sequential(filepath):
    """One-pass mean/min/max + second pass std (memory-bounded)."""
    with h5py.File(filepath, "r") as f:
        keys = list(f.keys())
        n = len(keys)
        inp_stats = tar_stats = None
        for inp, tar in _iter_samples(f):
            for stats, sample in ((0, inp), (1, tar)):
                flat = sample.reshape(-1, sample.shape[-1]).astype(np.float64)
                cur = {"mean": flat.mean(0), "min": flat.min(0),
                       "max": flat.max(0)}
                target = inp_stats if stats == 0 else tar_stats
                if target is None:
                    cur["std"] = np.zeros_like(cur["mean"])
                    if stats == 0:
                        inp_stats = cur
                    else:
                        tar_stats = cur
                else:
                    target["mean"] += cur["mean"]
                    target["min"] = np.minimum(target["min"], cur["min"])
                    target["max"] = np.maximum(target["max"], cur["max"])
        inp_stats["mean"] /= n
        tar_stats["mean"] /= n

    # second pass: variance against the final means
    inp_var = np.zeros_like(inp_stats["mean"])
    tar_var = np.zeros_like(tar_stats["mean"])
    with h5py.File(filepath, "r") as f:
        for inp, tar in _iter_samples(f):
            inp_var += ((inp.reshape(-1, inp.shape[-1]) - inp_stats["mean"]) ** 2).mean(0)
            tar_var += ((tar.reshape(-1, tar.shape[-1]) - tar_stats["mean"]) ** 2).mean(0)
    inp_stats["std"] = np.sqrt(inp_var / n)
    tar_stats["std"] = np.sqrt(tar_var / n)
    return inp_stats, tar_stats


def add_stats_to_file(filepath, inp_stats, tar_stats):
    with h5py.File(filepath, "r+") as f:
        for tag, stats in (("inp", inp_stats), ("tar", tar_stats)):
            for key, value in stats.items():
                f.attrs[f"{tag}_{key}"] = value


def load_stats_from_file(filepath):
    with h5py.File(filepath, "r") as f:
        return ({k: f.attrs[f"inp_{k}"] for k in ("mean", "std", "min", "max")},
                {k: f.attrs[f"tar_{k}"] for k in ("mean", "std", "min", "max")})


def adjust_num_steps(filepath, num_steps: int):
    """Truncate each trajectory to a square (t, x) field, dropping the extra
    simulator step (num_steps == -1 -> len - 1)."""
    with h5py.File(filepath, "r+") as f:
        for key in f.keys():
            sample = f[key]
            inp = np.asarray(sample["data"]["input"])
            tar = np.asarray(sample["data"]["target"])
            if len(inp) == inp.shape[1] and len(tar) == tar.shape[1]:
                continue  # already square
            n = num_steps if num_steps != -1 else len(inp) - 1
            if len(inp) < n:
                print(f"Number of steps too large for sample {key}: "
                      f"{len(inp)} < {n}")
                continue
            del sample["data"]
            sample.create_dataset("data/input", data=inp[:n])
            sample.create_dataset("data/target", data=tar[:n])


def process_data(datafolder, datafolder_test, trainfile, testfile, num_steps,
                 change_num_steps, test_only=False):
    train_path = os.path.join(datafolder, trainfile)
    if test_only:
        inp_stats, tar_stats = load_stats_from_file(train_path)
    else:
        if change_num_steps:
            adjust_num_steps(train_path, num_steps)
        inp_stats, tar_stats = calc_stats_sequential(train_path)
        add_stats_to_file(train_path, inp_stats, tar_stats)
    print("Input stats:", inp_stats)
    print("Target stats:", tar_stats)
    if testfile:
        test_path = os.path.join(datafolder_test, testfile)
        if change_num_steps:
            adjust_num_steps(test_path, num_steps)
        add_stats_to_file(test_path, inp_stats, tar_stats)


def main():
    parser = argparse.ArgumentParser(description="Preprocess dataset h5 files")
    parser.add_argument("--datafolder", type=str, default="data")
    parser.add_argument("--datafolder_test", type=str, default="")
    parser.add_argument("--trainfile", type=str, default="1d_swp_train.h5")
    parser.add_argument("--testfile", type=str, default="")
    parser.add_argument("--num_steps", type=int, default=-1)
    parser.add_argument("--change_num_steps", action="store_true")
    parser.add_argument("--test_only", action="store_true")
    args = parser.parse_args()
    datafolder_test = args.datafolder_test or args.datafolder
    process_data(args.datafolder, datafolder_test, args.trainfile,
                 args.testfile, args.num_steps, args.change_num_steps,
                 args.test_only)


if __name__ == "__main__":
    main()
