from m_cedm_tpu.pallas.fused_norm import (
    fused_group_norm_silu,
    group_norm_silu_reference,
    pallas_enabled,
)
