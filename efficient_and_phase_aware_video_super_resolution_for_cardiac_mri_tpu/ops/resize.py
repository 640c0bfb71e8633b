"""Bicubic resize with exact torch / OpenCV kernel semantics.

JAX has no builtin matching either of the two bicubic variants the reference
depends on (SURVEY.md §7 "hard parts"):

* ``nn.Upsample(mode='bicubic', align_corners=True)`` — the Bicubic baseline
  net (reference ``src/model/nets/bicubic.py:8-18``).  TOFlow's pre-upscale
  uses the SAME kernel but ``align_corners=False``
  (``toflow_net.py:32-33``) — models/toflow_net.py passes it accordingly.
* ``cv2.resize(..., INTER_CUBIC)`` — the k-space degradation pipeline
  (reference ``src/acdc_preprocess.py:132``).

Both use the Keys cubic convolution kernel with A = -0.75 and differ only in
the source-coordinate mapping:
  align_corners=True:  src = dst * (in-1)/(out-1)
  half-pixel (cv2):    src = (dst + 0.5) * in/out - 0.5

TPU design: since shapes are static under jit, each 1-D resize is a dense
(out, in) matrix built on the host; the 2-D resize is two einsums — pure MXU
work, no gathers.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def _cubic_kernel(x: np.ndarray, A: float = -0.75) -> np.ndarray:
    x = np.abs(x)
    x2, x3 = x * x, x * x * x
    return np.where(
        x <= 1,
        (A + 2) * x3 - (A + 3) * x2 + 1,
        np.where(x < 2, A * x3 - 5 * A * x2 + 8 * A * x - 4 * A, 0.0),
    )


@functools.lru_cache(maxsize=256)
def resize_matrix(
    in_size: int, out_size: int, align_corners: bool = False, kind: str = "cubic"
) -> np.ndarray:
    """Dense (out_size, in_size) interpolation matrix (float32).

    ``kind``: 'cubic' (Keys A=-0.75, 4 taps) or 'linear' (triangle, 2 taps).
    Out-of-range taps are clamped to the border (both torch and cv2 replicate
    edges), implemented by accumulating clamped-index weights.
    """
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    dst = np.arange(out_size, dtype=np.float64)
    if align_corners:
        scale = (in_size - 1) / (out_size - 1) if out_size > 1 else 0.0
        src = dst * scale
    else:
        src = (dst + 0.5) * (in_size / out_size) - 0.5
    base = np.floor(src).astype(np.int64)
    frac = src - base
    mat = np.zeros((out_size, in_size), dtype=np.float64)
    if kind == "cubic":
        taps, kernel = range(-1, 3), _cubic_kernel
    elif kind == "linear":
        taps, kernel = range(0, 2), lambda x: np.maximum(0.0, 1.0 - np.abs(x))
    else:
        raise ValueError(f"Unknown resize kind {kind!r}.")
    for tap in taps:
        idx = np.clip(base + tap, 0, in_size - 1)
        w = kernel(tap - frac)
        np.add.at(mat, (np.arange(out_size), idx), w)
    return mat.astype(np.float32)


def _resize(x, out_hw, align_corners, kind):
    H, W = x.shape[-3], x.shape[-2]
    oh, ow = out_hw
    mh = jnp.asarray(resize_matrix(H, oh, align_corners, kind))
    mw = jnp.asarray(resize_matrix(W, ow, align_corners, kind))
    x = jnp.einsum("oh,...hwc->...owc", mh, x, precision="highest")
    x = jnp.einsum("pw,...hwc->...hpc", mw, x, precision="highest")
    return x


def resize_bicubic(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """Bicubic-resize the (H, W) axes of a (..., H, W, C) array."""
    return _resize(x, out_hw, align_corners, "cubic")


def resize_bilinear(
    x: jnp.ndarray, out_hw: tuple[int, int], align_corners: bool = False
) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear')`` over (..., H, W, C)."""
    return _resize(x, out_hw, align_corners, "linear")


def upsample_bicubic(x: jnp.ndarray, scale_factor: int, align_corners: bool = True) -> jnp.ndarray:
    """torch ``nn.Upsample(mode='bicubic')`` over (..., H, W, C)."""
    H, W = x.shape[-3], x.shape[-2]
    return resize_bicubic(x, (H * scale_factor, W * scale_factor), align_corners)


def upsample_bilinear(x: jnp.ndarray, scale_factor: int, align_corners: bool = False) -> jnp.ndarray:
    """torch ``F.interpolate(mode='bilinear')`` with an integer scale factor."""
    H, W = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (H * scale_factor, W * scale_factor), align_corners)


def resize_bicubic_np(x: np.ndarray, out_hw: tuple[int, int], align_corners: bool = False) -> np.ndarray:
    """Host (numpy) version for the offline preprocessing CLIs."""
    H, W = x.shape[0], x.shape[1]
    mh = resize_matrix(H, out_hw[0], align_corners)
    mw = resize_matrix(W, out_hw[1], align_corners)
    y = np.tensordot(mh, x, axes=(1, 0))  # (oh, W, ...)
    y = np.moveaxis(np.tensordot(mw, y, axes=(1, 1)), 0, 1)  # (oh, ow, ...)
    return y
