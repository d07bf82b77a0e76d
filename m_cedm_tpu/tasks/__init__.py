from m_cedm_tpu.tasks.diffusion import (
    McedmTask,
    DdimTask,
    CondDdimTask,
    CondEdmTask,
)
