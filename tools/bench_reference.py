#!/usr/bin/env python
"""Measure the reference implementation's train-step latency and Heun EDM
sampling throughput at the flagship bench shape (B=16, res 128, ADM ch=64).

The image has torch (CPU) but neither pytorch_lightning nor hydra, so this
harness stubs a minimal `pytorch_lightning.LightningModule` and drives the
reference's OWN `PlMcedm` (/root/reference/models/mcedm.py) — its real
DhariwalUNet, its real training_step (masked EDM loss, mcedm.py:254-281,
plus optimizer_step EMA hook :163-168) and its real sample_edm Heun loop
(:570-638) — with hparams parsed from the reference's own
configs/model/adm_edm_mcedm_res32.yaml. No reference code is copied; it is
imported and executed in place.

Writes bench_reference.json at the repo root:
  {ref_train_step_ms, ref_samples_per_sec, ref_device, ...}
which bench.py folds into its JSON as the vs_reference anchor.
"""
import inspect
import json
import os
import statistics
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = os.environ.get("MCEDM_REFERENCE", "/root/reference")


def _install_pl_stub():
    """Minimal pytorch_lightning shim: LightningModule = nn.Module + the few
    hooks PlMcedm touches outside a Trainer (save_hyperparameters, log)."""
    import torch.nn as nn

    class LightningModule(nn.Module):
        def save_hyperparameters(self):
            frame = inspect.currentframe().f_back
            object.__setattr__(self, "_shim_hparams",
                               frame.f_locals.get("hparams"))

        @property
        def hparams(self):
            return self._shim_hparams

        def log(self, *args, **kwargs):
            pass

        def optimizer_step(self, *args, **kwargs):
            pass

    pl = types.ModuleType("pytorch_lightning")
    pl.LightningModule = LightningModule
    sys.modules["pytorch_lightning"] = pl


class Dot(dict):
    """Attribute-access dict that raises AttributeError on missing keys (so
    the reference's hasattr(...) probes work like they do under OmegaConf)."""

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError:
            raise AttributeError(k)

    __setattr__ = dict.__setitem__

    @classmethod
    def wrap(cls, obj):
        if isinstance(obj, dict):
            return cls({k: cls.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [cls.wrap(v) for v in obj]
        return obj


def load_reference_model(batch, res):
    import yaml

    sys.path.insert(0, REFERENCE)
    _install_pl_stub()
    import torch
    from models.mcedm import PlMcedm

    with open(os.path.join(REFERENCE,
                           "configs/model/adm_edm_mcedm_res32.yaml")) as f:
        cfg = yaml.safe_load(f)
    hp = Dot.wrap(cfg["hparams"])
    hp.model.resolution = res

    torch.manual_seed(0)
    model = PlMcedm(hp)
    # the datamodule would set these in setup("fit"); stats_shape is () here
    model.normalizer_input.set_stats(torch.tensor(1.0), torch.tensor(0.5))
    model.normalizer_target.set_stats(torch.tensor(0.0), torch.tensor(0.1))
    model.set_pde_loss_function("swe_per", False)
    return model


def make_batch(batch, res):
    import torch

    torch.manual_seed(1)
    h = torch.randn(batch, res, res, 1) + 1.5
    u = torch.randn(batch, res, res, 1) * 0.1
    grid = torch.linspace(0, 1, res).view(1, res, 1, 1).expand(batch, res, res, 1)
    # train mask: u unobserved (1 = missing), h observed — the 50/50 task
    mask = torch.cat([torch.zeros(batch, res, res, 1),
                      torch.ones(batch, res, res, 1)], dim=-1)
    return h, grid.clone(), grid.transpose(1, 2).clone(), u, mask


def bench_train(model, batch_t, max_reps=5, budget_s=240.0):
    import torch

    opt = model.configure_optimizers()["optimizer"]
    times = []
    for rep in range(max_reps + 1):  # first rep is warmup
        t0 = time.perf_counter()
        loss = model.training_step(batch_t, 0)
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.model.parameters(), 1.0)
        opt.step()
        if model.ema_model is not None:
            model.ema_model.update(model.model)
        dt = time.perf_counter() - t0
        print(f"  train rep {rep}: {dt*1e3:.1f} ms (loss {float(loss):.3f})",
              flush=True)
        if rep > 0:
            times.append(dt)
        if sum(times) > budget_s and len(times) >= 2:
            break
    return times


def bench_sample(model, batch_t, timesteps=50, max_reps=3, budget_s=600.0):
    import torch
    from einops import rearrange

    h, t_grid, x_grid, u, mask = batch_t
    b = h.shape[0]
    model.h_ch, model.u_ch = 1, 1
    x = model.data_transform(h, u)
    cond_in = model.get_cond_in(x, mask, t_grid, x_grid)
    cond_c = rearrange(cond_in, "b h w c -> b c h w")
    x_c = rearrange(x, "b h w c -> b c h w")
    mask_c = rearrange(mask, "b h w c -> b c h w")
    sp = Dot.wrap(dict(model.sparams))
    sp.timesteps = timesteps

    times = []
    with torch.no_grad():
        for rep in range(max_reps):
            t0 = time.perf_counter()
            xs = model.sample_edm(x_c, cond_c, mask_c, sp, return_last=True)
            dt = time.perf_counter() - t0
            assert torch.isfinite(xs).all()
            print(f"  sample rep {rep}: {dt:.1f} s "
                  f"({b / dt:.3f} samples/s)", flush=True)
            times.append(dt)
            if sum(times) > budget_s and len(times) >= 1:
                break
    return [b / t for t in times]


def main():
    import torch

    batch, res, steps = 16, 128, 50
    print(f"reference bench: B={batch}, res={res}, {steps} Heun steps, "
          f"torch {torch.__version__}, threads={torch.get_num_threads()}",
          flush=True)
    model = load_reference_model(batch, res)
    n_params = sum(p.numel() for p in model.model.parameters())
    print(f"  DhariwalUNet params: {n_params/1e6:.2f} M", flush=True)
    batch_t = make_batch(batch, res)

    train_times = bench_train(model, batch_t)
    sps = bench_sample(model, batch_t, timesteps=steps)

    out = {
        "ref_train_step_ms": statistics.median(train_times) * 1e3,
        "ref_train_step_ms_min": min(train_times) * 1e3,
        "ref_train_step_ms_max": max(train_times) * 1e3,
        "ref_train_reps": len(train_times),
        "ref_samples_per_sec": statistics.median(sps),
        "ref_samples_per_sec_min": min(sps),
        "ref_samples_per_sec_max": max(sps),
        "ref_sample_reps": len(sps),
        "ref_device": f"cpu x{torch.get_num_threads()} threads "
                      f"(torch {torch.__version__}; no GPU in image)",
        "ref_params_m": n_params / 1e6,
        "batch": batch, "resolution": res, "heun_steps": steps,
        "ref_impl": "reference PlMcedm driven directly (PL stubbed)",
    }
    path = os.path.join(REPO, "bench_reference.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
