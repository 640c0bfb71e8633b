"""Helpers shared by the trainer and predictor engines.

One definition, two engines: a change to the denorm convention, the
train-kwarg probe, or the log layout must hit training metrics and test
metrics together — duplicated copies would silently diverge.
"""
from __future__ import annotations

import inspect

import jax.numpy as jnp


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
