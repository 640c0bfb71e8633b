"""PyTorch-default parameter initializers for conv layers.

PyTorch's ``nn.Conv2d`` default is ``kaiming_uniform_(a=√5)`` on the weight
and ``U(-1/√fan_in, 1/√fan_in)`` on the bias, which both reduce to
``U(-1/√fan_in, 1/√fan_in)`` with ``fan_in = C_in · kh · kw``.  Training-time
distributional parity with the reference nets requires matching this (flax's
default lecun_normal has ~1.7× larger variance).
"""
from __future__ import annotations

import numpy as np
from jax import random
import jax.numpy as jnp


def _fan_in_from_kernel_shape(shape) -> int:
    # flax conv kernels are (kh, kw, ..., in, out): fan_in = prod(spatial) * in
    receptive = int(np.prod(shape[:-2]))
    return receptive * int(shape[-2])


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    bound = 1.0 / np.sqrt(_fan_in_from_kernel_shape(shape))
    return random.uniform(key, shape, dtype, -bound, bound)


def torch_conv_bias_init(fan_in: int):
    """Bias init needs fan_in of the layer (not derivable from the bias shape)."""
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, -bound, bound)

    return init
