"""PixelShuffle / space-to-depth with torch channel-order semantics.

The upsamplers in every reference net use ``nn.PixelShuffle`` (e.g.
``refine_net.py:194-205``): output channel ``c`` at subpixel ``(i, j)`` reads
input channel ``c*r² + i*r + j``.  We operate channel-last, so the channel
axis is grouped as ``(c, i, j)`` — this exact ordering is what makes imported
PyTorch weights line up.
"""
from __future__ import annotations

import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H, W, C·r²) → (..., H·r, W·r, C), torch ``nn.PixelShuffle`` order."""
    *lead, H, W, C = x.shape
    if C % (r * r) != 0:
        raise ValueError(f"Channels {C} not divisible by r²={r*r}.")
    c = C // (r * r)
    x = x.reshape(*lead, H, W, c, r, r)
    # (..., H, W, c, i, j) → (..., H, i, W, j, c)
    ndim = x.ndim
    perm = tuple(range(ndim - 5)) + (ndim - 5, ndim - 2, ndim - 4, ndim - 1, ndim - 3)
    x = x.transpose(perm)
    return x.reshape(*lead, H * r, W * r, c)


def space_to_depth(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(..., H·r, W·r, C) → (..., H, W, C·r²), inverse of :func:`pixel_shuffle`."""
    *lead, H, W, C = x.shape
    if H % r or W % r:
        raise ValueError(f"Spatial dims ({H},{W}) not divisible by r={r}.")
    x = x.reshape(*lead, H // r, r, W // r, r, C)
    ndim = x.ndim
    # (..., h, i, w, j, c) → (..., h, w, c, i, j)
    perm = tuple(range(ndim - 5)) + (ndim - 5, ndim - 3, ndim - 1, ndim - 4, ndim - 2)
    x = x.transpose(perm)
    return x.reshape(*lead, H // r, W // r, C * r * r)
