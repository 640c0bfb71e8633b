"""Dataset statistics and denormalization.

The reference bakes the per-dataset normalization constants into
``src/utils.py:13-16`` and duplicates every trainer/predictor/dataset per
dataset just to switch them (SURVEY.md §1).  Here they are data, not code:
one table, one ``denormalize`` usable from host numpy or inside jit.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

# Reference values: src/utils.py:13-16.
DATASET_STATS = {
    "acdc": {"mean": 54.089, "std": 48.084},
    "dsb15": {"mean": 51.193, "std": 52.671},
}


def get_stats(dataset: str) -> tuple[float, float]:
    if dataset not in DATASET_STATS:
        raise ValueError(
            f"The name of the dataset should be one of {sorted(DATASET_STATS)}. Got {dataset}."
        )
    s = DATASET_STATS[dataset]
    return s["mean"], s["std"]


def denormalize(imgs, dataset: str = "acdc", mean: float | None = None, std: float | None = None):
    """``(x * std + mean).round().clamp(0, 255)`` — reference ``src/utils.py:19``.

    Works on jnp arrays (inside jit) and numpy arrays alike.
    """
    if mean is None or std is None:
        mean, std = get_stats(dataset)
    xp = jnp if not isinstance(imgs, np.ndarray) else np
    return xp.clip(xp.round(imgs * std + mean), 0, 255)
