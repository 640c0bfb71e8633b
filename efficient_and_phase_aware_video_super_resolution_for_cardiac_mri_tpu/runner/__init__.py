from . import checkpoint, loggers, monitor, optim, predictors, trainers
from .monitor import Monitor

__all__ = ["checkpoint", "loggers", "monitor", "optim", "predictors", "trainers", "Monitor"]
