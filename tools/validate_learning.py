"""End-to-end learning validation: does the mcedm flagship actually learn to
recover u from h on physically-consistent synthetic SWE data?"""
import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from m_cedm_tpu.config import to_dotdict
from m_cedm_tpu.tasks import McedmTask
from m_cedm_tpu.data.synthetic import generate_swe_periodic_batch
from m_cedm_tpu.ops import losses

RES = 32
hp = to_dotdict({
    "name": "adm_edm_mcedm",
    "model": {"in_channels": 2, "cond_channels": 2, "cat_cond": True,
              "out_ch": 2, "ch": 32, "ch_mult": [1, 1], "num_res_blocks": 1,
              "attn_resolutions": [16], "resolution": RES, "dropout": 0.0,
              "label_dim": 0, "augment_dim": 0, "label_dropout": 0,
              "ema_rate": 0.999, "ema": True, "resamp_with_conv": True,
              "self_cond": False, "cond_p": 1.0, "dx_cond": False,
              "cat_dx": False, "add_cond_mask": False, "add_xt": False},
    "data": {"normalization": "gauss", "uniform_dequantization": False,
             "gaussian_dequantization": False, "rescaled": False},
    "optimization": {"optimizer": "Adam", "lr": 3e-4, "weight_decay": 0.0,
                     "beta1": 0.9, "eps": 1e-8, "loss": "l2"},
    "sampler": {"name": "edm", "type": "edm", "timesteps": 18,
                "sigma_min": 0.002, "sigma_max": 80, "rho": 7, "S_churn": 15.0,
                "S_min": 0, "S_max": "inf", "S_noise": 1, "n_samples": 3,
                "n_repeat": 2, "n_time_h": RES, "n_time_u": 0,
                "return_last": True, "select_by_pde": False,
                "use_gt_pde_select": True, "guide_dx": False, "w": 0.0,
                "plot_scaled": False},
})

# data: 96 train + 8 test trajectories
trajs, x, t, *_ = generate_swe_periodic_batch(jax.random.PRNGKey(0), 104,
                                                RES, RES, 0.128)
trajs = np.asarray(trajs)
h_all, u_all = trajs[..., 0:1], trajs[..., 1:2]
h_tr, u_tr = h_all[:96], u_all[:96]
h_te, u_te = h_all[96:], u_all[96:]
grid = np.broadcast_to(np.linspace(0, 1, RES)[None, :, None, None],
                       (8, RES, RES, 1)).astype(np.float32)

stats = {"input_mean": h_tr.mean(), "input_std": h_tr.std() + 1e-6,
         "target_mean": u_tr.mean(), "target_std": u_tr.std() + 1e-6,
         "input_min": h_tr.min(), "input_min_max": np.ptp(h_tr) + 1e-6,
         "target_min": u_tr.min(), "target_min_max": np.ptp(u_tr) + 1e-6}

task = McedmTask(hp)
task.set_pde_loss_function("swe_per", False)
state = task.init_state(jax.random.PRNGKey(1), stats)

mask_u = np.concatenate([np.zeros((RES, RES, 1)), np.ones((RES, RES, 1))],
                        -1).astype(np.float32)

def eval_recovery(state, tag):
    batch = (jnp.asarray(h_te), jnp.asarray(grid),
             jnp.asarray(np.transpose(grid, (0, 2, 1, 3))), jnp.asarray(u_te))
    metrics, pred = task.eval_step(state, batch, jax.random.PRNGKey(99),
                                   jnp.asarray(mask_u), split="test",
                                   n_samples=3, mask_name="u")
    m = {k: float(v) for k, v in metrics.items()}
    print(f"[{tag}] recovery: mae_u={m['test_mae_u']:.4f} "
          f"mae_u_un={m['test_mae_u_un']:.5f} pde={m['test_pde_loss_u']:.1f} "
          f"pde_gt={m['test_pde_loss_gt']:.2f}", flush=True)
    return m

m0 = eval_recovery(state, "untrained")

rng = np.random.default_rng(0)
B = 8
n_epochs = 150
t0 = time.time()
for epoch in range(n_epochs):
    idx = rng.permutation(96)
    for s in range(0, 96, B):
        sel = idx[s:s + B]
        batch = (jnp.asarray(h_tr[sel]), jnp.asarray(grid),
                 jnp.asarray(np.transpose(grid, (0, 2, 1, 3))),
                 jnp.asarray(u_tr[sel]))
        state, metrics = task.train_step(state, batch,
                                         jax.random.PRNGKey(epoch * 100 + s))
    if epoch % 25 == 0:
        print(f"epoch {epoch}: train_loss={float(metrics['train_loss']):.1f} "
              f"({time.time()-t0:.0f}s)", flush=True)

m1 = eval_recovery(state, f"after {n_epochs} epochs")
impr = m0["test_mae_u"] / m1["test_mae_u"]
print(f"\nrecovery MAE improved {impr:.1f}x "
      f"({m0['test_mae_u']:.4f} -> {m1['test_mae_u']:.4f}); "
      f"pde residual {m0['test_pde_loss_u']:.0f} -> {m1['test_pde_loss_u']:.0f}")
assert impr > 2.0, "model failed to learn state recovery"
print("LEARNING VALIDATION PASSED")
