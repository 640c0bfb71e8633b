"""Helpers shared by the trainer and predictor engines.

One definition, two engines: a change to the denorm convention, the
train-kwarg probe, or the log layout must hit training metrics and test
metrics together — duplicated copies would silently diverge.
"""
from __future__ import annotations

import inspect

import jax.numpy as jnp
import numpy as np


def accepts_train_kwarg(net) -> bool:
    """Whether the flax module's ``__call__`` takes a ``train`` kwarg
    (BatchNorm nets like DUF/TOFlow need it threaded through the step)."""
    return (
        net is not None
        and "train" in inspect.signature(type(net).__call__).parameters
    )


def denorm_uint8(x, mean, std):
    """Reference denormalize (``src/utils/stats``): back to rounded,
    clipped [0, 255] intensity before metric computation."""
    return jnp.clip(jnp.round(x * std + mean), 0, 255)


def compact_lossless(x: np.ndarray) -> np.ndarray:
    """float32 → uint8/int16 ONLY when the round-trip back to float32 is
    bit-exact (``int_feed``): the cardiac HR trees store integer intensities
    in [0, 255] as float32 NIfTI (``tools/acdc_preprocess.py`` rounds to that
    range), so their device upload shrinks 4× losslessly.  Fractional,
    out-of-range, or non-finite data passes through unchanged — correctness
    never depends on the data actually being integral."""
    if not isinstance(x, np.ndarray) or x.dtype != np.float32 or x.size == 0:
        return x
    mn, mx = float(x.min()), float(x.max())
    if not (np.isfinite(mn) and np.isfinite(mx)):
        return x
    if 0.0 <= mn and mx <= 255.0:
        dt = np.uint8
    elif -32768.0 <= mn and mx <= 32767.0:
        dt = np.int16
    else:
        return x
    c = x.astype(dt)
    return c if np.array_equal(c.astype(np.float32), x) else x


def init_log(loss_fns, metric_fns) -> dict:
    """Zeroed epoch log: Loss + one entry per loss/metric, reference order."""
    log = {"Loss": 0.0}
    for fn in loss_fns:
        log[fn.name] = 0.0
    for fn in metric_fns:
        log[fn.name] = 0.0
    return log


def register_dataset_variants(registry, workload: str, suffix: str, cls) -> None:
    """Register the Acdc/Dsb15 twins of a workload engine under the
    reference's naming scheme (e.g. ``AcdcVSRTrainer`` / ``Dsb15VSRTrainer``)
    with the matching dataset stats baked in."""
    for prefix, stats in (("Acdc", "acdc"), ("Dsb15", "dsb15")):
        name = f"{prefix}{workload}{suffix}"
        registry.add(name, type(name, (cls,), {"dataset_stats": stats}))
