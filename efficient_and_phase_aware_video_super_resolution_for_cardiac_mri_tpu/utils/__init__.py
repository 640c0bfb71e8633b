from . import nifti
from .seeding import SeedState, epoch_rng, item_rng, seed_everything
from .stats import DATASET_STATS, denormalize, get_stats

__all__ = [
    "nifti",
    "SeedState",
    "seed_everything",
    "epoch_rng",
    "item_rng",
    "DATASET_STATS",
    "denormalize",
    "get_stats",
]
