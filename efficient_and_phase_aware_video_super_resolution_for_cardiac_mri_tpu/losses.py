"""Loss functions (pure JAX).

Covers the reference loss surface: torch builtins resolved by name
(``L1Loss``, ``MSELoss``, ``SmoothL1Loss`` — reference ``src/main.py:62-70``)
plus the custom losses in reference ``src/model/losses.py`` (Huber,
Charbonnier, Flow).  Each loss is a callable object whose class name is its
log key, matching the reference's ``loss_fn.__class__.__name__`` logging
convention (``base_trainer.py:196-222``).
"""
from __future__ import annotations

import jax.numpy as jnp

from .config import LOSSES


class Loss:
    """Base: a named, mean-reduced elementwise loss."""

    def __call__(self, output, target):
        raise NotImplementedError

    @property
    def name(self) -> str:
        return self.__class__.__name__


@LOSSES.register()
class L1Loss(Loss):
    def __call__(self, output, target):
        return jnp.mean(jnp.abs(output - target))


@LOSSES.register()
class MSELoss(Loss):
    def __call__(self, output, target):
        return jnp.mean(jnp.square(output - target))


@LOSSES.register()
class SmoothL1Loss(Loss):
    """torch.nn.SmoothL1Loss (beta=1)."""

    def __init__(self, beta: float = 1.0):
        self.beta = beta

    def __call__(self, output, target):
        diff = jnp.abs(output - target)
        return jnp.mean(
            jnp.where(diff < self.beta, 0.5 * diff * diff / self.beta, diff - 0.5 * self.beta)
        )


@LOSSES.register()
class HuberLoss(Loss):
    """Reference ``src/model/losses.py:5-20`` (DUF's loss)."""

    def __init__(self, delta: float):
        self.delta = delta

    def __call__(self, output, target):
        abs_error = jnp.abs(output - target)
        quadratic = jnp.minimum(abs_error, self.delta)
        linear = abs_error - quadratic
        return jnp.mean(0.5 * quadratic**2 + self.delta * linear)


@LOSSES.register()
class CharbonnierLoss(Loss):
    """Reference ``src/model/losses.py:23-34`` (EDVR's loss)."""

    def __init__(self, epsilon: float):
        self.epsilon = epsilon

    def __call__(self, output, target):
        return jnp.mean(jnp.sqrt(jnp.square(output - target) + self.epsilon))


@LOSSES.register()
class FlowLoss(MSELoss):
    """MSE under a distinct log key for FRVSR's flow branch
    (reference ``src/model/losses.py:37-44``)."""
