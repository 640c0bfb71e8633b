"""EDSR (reference ``src/model/nets/edsr_net.py:8-67``).

head conv → N residual blocks (conv-ReLU-conv, ×res_scale) → body conv →
global skip → PixelShuffle tail → output conv.
"""
from __future__ import annotations

import math

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pixel_shuffle import pixel_shuffle
from .common import conv


class _ResBlock(nn.Module):
    num_features: int
    res_scale: float

    @nn.compact
    def __call__(self, x):
        r = conv(self.num_features, 3, self.num_features, name="conv1")(x)
        r = nn.relu(r)
        r = conv(self.num_features, 3, self.num_features, name="conv2")(r)
        return x + r * self.res_scale


class EDSRNet(nn.Module):
    in_channels: int
    out_channels: int
    num_resblocks: int
    num_features: int
    upscale_factor: int
    res_scale: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        F = self.num_features
        head = conv(F, 3, self.in_channels, name="head")(x)
        body = head
        for i in range(self.num_resblocks):
            body = _ResBlock(F, self.res_scale, name=f"resblock{i}")(body)
        body = conv(F, 3, F, name="body_conv")(body)
        body = body + head
        r = self.upscale_factor
        if (math.log2(r) % 1) == 0:
            for i in range(int(math.log2(r))):
                body = conv(4 * F, 3, F, name=f"up_conv{i+1}")(body)
                body = pixel_shuffle(body, 2)
        elif r == 3:
            body = conv(9 * F, 3, F, name="up_conv1")(body)
            body = pixel_shuffle(body, 3)
        else:
            raise NotImplementedError
        return conv(self.out_channels, 3, F, name="tail_conv")(body)
