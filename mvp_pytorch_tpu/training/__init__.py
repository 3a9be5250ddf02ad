from .optim import make_optimizer, warmup_constant, warmup_cosine, warmup_linear
from .trainer import Trainer, TrainState
from .checkpoint import (AsyncSaver, CheckpointManager, load_pretrained,
                         save_pretrained, LAST_CHECKPOINT, WEIGHTS_NAME)
from .metrics import MetricLogger, MetricsWriter, SmoothedValue

__all__ = [
    "make_optimizer", "warmup_constant", "warmup_cosine", "warmup_linear",
    "Trainer", "TrainState", "AsyncSaver", "CheckpointManager",
    "load_pretrained",
    "save_pretrained", "LAST_CHECKPOINT", "WEIGHTS_NAME",
    "MetricLogger", "MetricsWriter", "SmoothedValue",
]
