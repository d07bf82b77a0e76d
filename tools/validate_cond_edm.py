"""Learning validation #2: conditional EDM (edm_cond_h family) learns u|h."""
import os, time
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from m_cedm_tpu.config import to_dotdict
from m_cedm_tpu.tasks import CondEdmTask
from m_cedm_tpu.data.synthetic import generate_swe_periodic_batch

RES = 32
hp = to_dotdict({
    "name": "edm_cond_h",
    "model": {"type": "simple", "in_channels": 1, "cond_channels": 1,
              "cat_cond": True, "out_ch": 1, "ch": 32, "ch_mult": [1, 1],
              "num_res_blocks": 1, "attn_resolutions": [16], "dropout": 0.0,
              "var_type": "fixedsmall", "ema_rate": 0.999, "ema": True,
              "resamp_with_conv": True, "resolution": RES, "self_cond": False,
              "cond_p": 1.0, "node_type": False, "label_dim": 0,
              "augment_dim": 0, "label_dropout": 0},
    "data": {"normalization": "gauss", "uniform_dequantization": False,
             "gaussian_dequantization": False, "rescaled": False},
    "diffusion": {"beta_schedule": "linear", "beta_start": 1e-4,
                  "beta_end": 0.02, "num_diffusion_timesteps": 1000},
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
trajs, *_ = generate_swe_periodic_batch(jax.random.PRNGKey(0), 104, RES, RES, 0.128)
trajs = np.asarray(trajs)
h_tr, u_tr = trajs[:96, ..., 0:1], trajs[:96, ..., 1:2]
h_te, u_te = trajs[96:, ..., 0:1], trajs[96:, ..., 1:2]
stats = {"input_mean": h_tr.mean(), "input_std": h_tr.std() + 1e-6,
         "target_mean": u_tr.mean(), "target_std": u_tr.std() + 1e-6,
         "input_min": 0, "input_min_max": 1, "target_min": 0, "target_min_max": 1}
task = CondEdmTask(hp)
task.set_pde_loss_function("swe_per", False)
state = task.init_state(jax.random.PRNGKey(1), stats)
dxc = jnp.full((8,), 1.0 / RES)

def ev(state, tag):
    batch = (jnp.asarray(h_te), dxc, dxc, jnp.asarray(u_te))
    m, _ = task.eval_step(state, batch, jax.random.PRNGKey(99), split="test",
                          n_samples=3)
    m = {k: float(v) for k, v in m.items()}
    print(f"[{tag}] mae_u={m['test_mae_u']:.4f} corr_u={m['test_corr_u']:.3f} "
          f"pde={m['test_pde_loss']:.1f} pde_gt={m['test_pde_loss_gt']:.2f}",
          flush=True)
    return m

m0 = ev(state, "untrained")
rng = np.random.default_rng(0)
t0 = time.time()
for epoch in range(150):
    idx = rng.permutation(96)
    for s in range(0, 96, 8):
        sel = idx[s:s + 8]
        batch = (jnp.asarray(h_tr[sel]), dxc, dxc, jnp.asarray(u_tr[sel]))
        state, metrics = task.train_step(state, batch,
                                         jax.random.PRNGKey(epoch * 100 + s))
    if epoch % 50 == 0:
        print(f"epoch {epoch}: loss={float(metrics['train_loss']):.1f} "
              f"({time.time()-t0:.0f}s)", flush=True)
m1 = ev(state, "after 150 epochs")
impr = m0["test_mae_u"] / m1["test_mae_u"]
print(f"\ncond-EDM recovery improved {impr:.1f}x; corr "
      f"{m0['test_corr_u']:.3f} -> {m1['test_corr_u']:.3f}")
assert impr > 2.0
print("COND-EDM VALIDATION PASSED")
