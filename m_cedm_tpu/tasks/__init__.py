from m_cedm_tpu.tasks.diffusion import (
    McedmTask,
    DdimTask,
    CondDdimTask,
    CondEdmTask,
)
from m_cedm_tpu.tasks.fno import (
    Fno2dTask,
    FnoStateReconstrTask,
    FnoStateTimePredTask,
    FnoTimePredTask,
)
from m_cedm_tpu.tasks.oformer import (
    OformerTask,
    OformerTimePredTask,
    OformerStateTimePredTask,
)
