from m_cedm_tpu.physics.pde_loss import (
    SweFvLoss,
    DarcyLoss,
    get_pde_loss_function,
    flip_state,
)
