from m_cedm_tpu.ops.schedules import (
    get_beta_schedule,
    karras_sigma_grid,
    edm_precond_coeffs,
    edm_train_sigma,
    edm_loss_weight,
    sinusoidal_timestep_embedding,
    fourier_positional_embedding,
)
from m_cedm_tpu.ops.normalizer import Normalizer
from m_cedm_tpu.ops import losses
