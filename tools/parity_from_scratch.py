#!/usr/bin/env python
"""Trained-from-scratch cross-framework parity (VERDICT r4 #5).

Trains the reference's own PlMcedm (torch CPU, PL stubbed — the image has
no pytorch_lightning) and this framework's McedmTask from scratch on the
SAME generated h5 dataset with matched hyperparameters, then compares the
masked-recovery validation metrics (reference models/mcedm.py:283-341
val_mae_{u,h}[_un], the run.py:102 objective family). This closes the last
parity axis: r1-r4 evidenced inference parity (ported-weight goldens) and
within-framework learning, but never compared *training outcomes*.

Both sides read identical h5 files through their own real data stacks
(reference datamodules/h5_dataset.py HDF5MaskDataset vs ours), with the
same stats-from-attrs normalization, the same 50/50 train mask protocol,
and the same model/optimizer/sampler hparams (ch=64, ch_mult [1,1,1],
Adam 2e-4, EMA 0.999, 50-step EDM sampling with S_churn=15).

Usage:
  python tools/parity_from_scratch.py gen  --data DIR [--res 32] [--n-train 256]
  python tools/parity_from_scratch.py ref  --data DIR --epochs 150 --seed 0
  python tools/parity_from_scratch.py jax  --data DIR --epochs 150 --seed 0
  python tools/parity_from_scratch.py report --data DIR

Each train run writes DIR/parity_{side}_seed{N}.json with the per-val-epoch
metric trajectory; `report` prints the comparison table.
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MCEDM_REFERENCE", "/root/reference")
sys.path.insert(0, REPO)

RES_DEFAULT = 32
BATCH = 32
VAL_EVERY = 25
TIMESTEPS = 50


def ds_paths(data, res):
    sub = f"1D_swp_{res}_per"
    return (os.path.join(data, sub, f"{sub}_train.h5"),
            os.path.join(data, sub, f"{sub}_test.h5"))


def cmd_gen(args):
    """Shared dataset: waveprop (CFL-adaptive Clawpack scheme — the r5
    default) SWE-periodic trajectories at the experiment resolution."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from m_cedm_tpu.data.synthetic import write_swe_dataset

    train, test = ds_paths(args.data, args.res)
    os.makedirs(os.path.dirname(train), exist_ok=True)
    key = jax.random.PRNGKey(args.gen_seed)
    k_tr, k_te = jax.random.split(key)
    write_swe_dataset(train, k_tr, args.n_train, args.res, args.res, 0.128)
    write_swe_dataset(test, k_te, args.n_test, args.res, args.res, 0.128,
                      seed_offset=1000)
    print(f"wrote {args.n_train}+{args.n_test} waveprop trajectories "
          f"at res {args.res} under {args.data}")


def _matched_hparams(res):
    """The reference's configs/model/adm_edm_mcedm_res32.yaml hparams with
    resolution pinned to the experiment res (both sides consume this)."""
    import yaml

    with open(os.path.join(REFERENCE,
                           "configs/model/adm_edm_mcedm_res32.yaml")) as f:
        cfg = yaml.safe_load(f)
    hp = cfg["hparams"]
    hp["model"]["resolution"] = res
    hp["model"]["attn_resolutions"] = [res]
    hp["sampler"]["timesteps"] = TIMESTEPS
    hp["sampler"]["n_time_h"] = res
    return hp


def _stats_from_attrs(train_path):
    import h5py

    with h5py.File(train_path, "r") as f:
        return {k: float(f.attrs[k]) for k in
                ("inp_mean", "inp_std", "tar_mean", "tar_std",
                 "inp_min", "inp_max", "tar_min", "tar_max")}


def _out_path(data, side, seed):
    return os.path.join(data, f"parity_{side}_seed{seed}.json")


def cmd_ref(args):
    """Train the reference's PlMcedm with its own training_step /
    validation_step / EMA hook / HDF5MaskDataset, driven by a manual loop
    (the image has no pytorch_lightning; the stub provides the hooks the
    module touches outside a Trainer — same approach as
    tools/bench_reference.py)."""
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from bench_reference import Dot, _install_pl_stub

    _install_pl_stub()
    import torch
    from torch.utils.data import DataLoader

    from datamodules.h5_dataset import HDF5MaskDataset
    from models.mcedm import PlMcedm

    train_path, test_path = ds_paths(args.data, args.res)
    st = _stats_from_attrs(train_path)
    hp = Dot.wrap(_matched_hparams(args.res))

    torch.manual_seed(args.seed)
    model = PlMcedm(hp)
    model.current_epoch = 0  # validation_step epoch gate (always validate)
    model.normalizer_input.set_stats(torch.tensor(st["inp_mean"]),
                                     torch.tensor(st["inp_std"]))
    model.normalizer_target.set_stats(torch.tensor(st["tar_mean"]),
                                      torch.tensor(st["tar_std"]))
    model.set_pde_loss_function("swe_per", False)
    n_params = sum(p.numel() for p in model.model.parameters())

    ds_kw = dict(return_abs_coords=True, return_grid=True,
                 input_mean=st["inp_mean"], input_std=st["inp_std"],
                 target_mean=st["tar_mean"], target_std=st["tar_std"],
                 norm_x=True, norm_t=True, norm_input=False,
                 norm_target=False)
    train_ds = HDF5MaskDataset(train_path, is_train=True, **ds_kw)
    val_ds = HDF5MaskDataset(test_path, is_train=False, **ds_kw)
    gen = torch.Generator().manual_seed(args.seed)
    train_dl = DataLoader(train_ds, batch_size=BATCH, shuffle=True,
                          generator=gen)
    val_dl = DataLoader(val_ds, batch_size=len(val_ds))

    opt = model.configure_optimizers()["optimizer"]
    hist, t0 = [], time.time()
    print(f"ref: {n_params/1e6:.2f} M params, {len(train_ds)} train traj, "
          f"{len(val_ds)} val traj, torch {torch.__version__} cpu",
          flush=True)

    def validate(epoch):
        model.eval()
        out = {"epoch": epoch, "wall_s": time.time() - t0}
        with torch.no_grad():
            for vb in val_dl:
                rd = model.validation_step(vb, 0)
                for name in ("u", "h"):
                    out[f"val_mae_{name}"] = float(rd[f"loss_{name}"])
                    out[f"val_mae_{name}_un"] = float(rd[f"loss_{name}_un"])
        model.train()
        hist.append(out)
        print(f"  [ref seed {args.seed}] epoch {epoch}: "
              + " ".join(f"{k}={v:.4f}" for k, v in out.items()
                         if k.startswith("val")), flush=True)

    for epoch in range(args.epochs):
        losses = []
        for i, batch in enumerate(train_dl):
            loss = model.training_step(batch, i)
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(
                model.model.parameters(), float(hp.optimization.grad_clip))
            opt.step()
            if model.ema_model is not None:
                model.ema_model.update(model.model)
            losses.append(float(loss))
        if epoch % 5 == 0:
            print(f"  [ref seed {args.seed}] epoch {epoch}: train_loss="
                  f"{sum(losses)/len(losses):.2f} ({time.time()-t0:.0f}s)",
                  flush=True)
        if (epoch + 1) % VAL_EVERY == 0 or epoch == args.epochs - 1:
            validate(epoch)

    _write(args, "ref", hist, n_params,
           dict(torch=torch.__version__, device="cpu"))


def cmd_jax(args):
    """Train this framework's McedmTask on the same h5 files through its
    real datamodule + Trainer (train/loop.py), metric-name parity with the
    reference (val_mae_{u,h}[_un])."""
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from m_cedm_tpu.config import to_dotdict
    from m_cedm_tpu.data import HDF5MaskDatamodule
    from m_cedm_tpu.tasks import McedmTask
    from m_cedm_tpu.train.loop import Trainer
    from m_cedm_tpu.train.metrics import MetricsLogger

    train_path, test_path = ds_paths(args.data, args.res)
    hp = to_dotdict(_matched_hparams(args.res))
    dm = HDF5MaskDatamodule(
        train_path=train_path, val_path=test_path, test_path=test_path,
        return_abs_coords=True, return_grid=True, norm_x=True, norm_t=True,
        norm_input=False, norm_target=False, const_norm_stats=True,
        batch_size=BATCH)

    task = McedmTask(hp)
    task.set_pde_loss_function("swe_per", False)
    n_params = None
    out_dir = os.path.join(args.data, f"jax_run_seed{args.seed}")
    logger = MetricsLogger(out_dir, run_name=f"parity_seed{args.seed}",
                           use_wandb=False)
    trainer = Trainer(max_epochs=args.epochs,
                      check_val_every_n_epoch=VAL_EVERY,
                      gradient_clip_val=float(hp.optimization.grad_clip),
                      callbacks=[], logger=logger, out_dir=out_dir,
                      seed=args.seed)
    t0 = time.time()
    trainer.fit(task, dm)
    wall = time.time() - t0

    # metric trajectory from the run's jsonl (the Trainer's own logging)
    hist = []
    with open(os.path.join(out_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if any(k.startswith("val_mae") for k in rec):
                rec.setdefault("wall_s", wall)
                hist.append(rec)
    _write(args, "jax", hist, n_params, dict(jax=jax.__version__,
                                             device=str(jax.devices()[0])))


def _write(args, side, hist, n_params, envinfo):
    out = {"side": side, "seed": args.seed, "epochs": args.epochs,
           "res": args.res, "batch": BATCH, "timesteps": TIMESTEPS,
           "params_m": None if n_params is None else n_params / 1e6,
           "env": envinfo, "history": hist}
    path = _out_path(args.data, side, args.seed)
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {path}")
    if hist:
        print("final:", {k: round(v, 4) for k, v in hist[-1].items()
                         if k.startswith("val")})


def cmd_report(args):
    rows = []
    for path in sorted(glob.glob(os.path.join(args.data, "parity_*.json"))):
        with open(path) as f:
            r = json.load(f)
        if not r["history"]:
            continue
        fin = r["history"][-1]
        rows.append((r["side"], r["seed"],
                     {k: fin.get(k) for k in ("val_mae_u", "val_mae_u_un",
                                              "val_mae_h", "val_mae_h_un")}))
    print(f"{'side':5} {'seed':4} {'val_mae_u':>10} {'val_mae_u_un':>13} "
          f"{'val_mae_h':>10} {'val_mae_h_un':>13}")
    for side, seed, m in rows:
        print(f"{side:5} {seed:4} {m['val_mae_u']:10.4f} "
              f"{m['val_mae_u_un']:13.5f} {m['val_mae_h']:10.4f} "
              f"{m['val_mae_h_un']:13.5f}")
    by_side = {}
    for side, _, m in rows:
        by_side.setdefault(side, []).append(m["val_mae_u"])
    if {"ref", "jax"} <= set(by_side):
        import statistics

        r = statistics.median(by_side["ref"])
        j = statistics.median(by_side["jax"])
        print(f"\nmedian val_mae_u: ref {r:.4f} vs jax {j:.4f} "
              f"(ratio {j/r:.3f})")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("cmd", choices=["gen", "ref", "jax", "report"])
    p.add_argument("--data", required=True)
    p.add_argument("--res", type=int, default=RES_DEFAULT)
    p.add_argument("--n-train", type=int, default=256)
    p.add_argument("--n-test", type=int, default=8)
    p.add_argument("--gen-seed", type=int, default=0)
    p.add_argument("--epochs", type=int, default=150)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cpu", action="store_true", default=True)
    args = p.parse_args()
    {"gen": cmd_gen, "ref": cmd_ref, "jax": cmd_jax,
     "report": cmd_report}[args.cmd](args)


if __name__ == "__main__":
    main()
