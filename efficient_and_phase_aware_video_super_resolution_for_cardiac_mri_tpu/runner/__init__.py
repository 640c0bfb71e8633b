from . import checkpoint, loggers, monitor, optim, predictors, streaming, trainers
from .monitor import Monitor
from .streaming import FRVSRStream

__all__ = [
    "checkpoint",
    "loggers",
    "monitor",
    "optim",
    "predictors",
    "streaming",
    "trainers",
    "Monitor",
    "FRVSRStream",
]
