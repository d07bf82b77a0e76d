from m_cedm_tpu.data.datamodule import (
    HDF5Datamodule,
    HDF5MaskDatamodule,
    HDF5TimeMaskDatamodule,
    HDF5SparseMaskDatamodule,
)
from m_cedm_tpu.data import masks
from m_cedm_tpu.data.oformer_data import (
    PlOformerSwpDatamodule,
    PlOformerSwpTimePredDatamodule,
)
