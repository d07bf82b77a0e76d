from m_cedm_tpu.parallel.mesh import (
    make_mesh,
    shard_batch,
    replicate,
    distributed_init,
)
