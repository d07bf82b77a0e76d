from m_cedm_tpu.train.loop import Trainer
from m_cedm_tpu.train.metrics import MetricsLogger
from m_cedm_tpu.train import checkpoint
