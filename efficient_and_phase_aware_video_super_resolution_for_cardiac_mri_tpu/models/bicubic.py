"""Bicubic upsampling baseline (no learned parameters).

Reference ``src/model/nets/bicubic.py:8-18``:
``nn.Upsample(scale_factor, mode='bicubic', align_corners=True)``.
The predictor skips checkpoint loading for it (reference ``src/main.py:154``).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.resize import upsample_bicubic


class Bicubic(nn.Module):
    upscale_factor: int = 4

    @nn.compact
    def __call__(self, lr: jnp.ndarray) -> jnp.ndarray:
        # (B, H, W, C) or (B, T, H, W, C) — resize acts on the last 3 dims.
        return upsample_bicubic(lr, self.upscale_factor, align_corners=True)
