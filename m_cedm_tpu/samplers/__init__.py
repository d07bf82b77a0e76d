from m_cedm_tpu.samplers.edm import (
    EdmSchedule,
    make_edm_schedule,
    heun_sample_masked,
    heun_sample_cond,
    heun_sample_repaint,
)
from m_cedm_tpu.samplers.ddim import (
    DdimSchedule,
    make_ddim_schedule,
    ddim_sample_cond,
    ddim_sample_repaint,
    ddim_sample_joint_h,
)
