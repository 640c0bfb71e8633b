"""Evaluation metrics (pure JAX, jit-traceable).

Reimplements the reference metric definitions exactly
(``src/model/metrics.py``):

* PSNR: ``10*log10(max² / (MSE + 1e-10))``, per-sample over non-batch dims
  (``metrics.py:20-36``), computed on denormalized [0,255] images.
* SSIM: 11-tap "gaussian" window per dimension with the reference's
  idiosyncratic ``exp(-((x-m)/(2σ))²)`` profile (σ=1.5, ``metrics.py:70-77``),
  normalized, separable product kernel, depthwise *valid* convolution, then
  mean over the valid region (``metrics.py:86-113``).
* CardiacPSNR / CardiacSSIM: the same scores restricted to the per-patient
  motion bbox from ``coordinates.pkl`` (``metrics.py:116-165``).

TPU design note: the cardiac variants are formulated with *masks* instead of
crops.  Cropping to a per-patient bbox would change array shapes and force an
XLA recompile per patient; a mask is data.  For PSNR the masked MSE is exactly
the cropped MSE.  For SSIM, a valid-conv over a crop equals the full-image
valid-conv map restricted to windows fully inside the crop, so the masked mean
over ``ssim_map[h0:hn-10, w0:wn-10]`` is exactly the reference's value.

Internal layout is channel-last: (N, H, W, C) for 2D, (N, D, H, W, C) for 3D.
"""
from __future__ import annotations

import math
import pickle

import jax
import jax.numpy as jnp
import numpy as np

from .config import METRICS


def _reference_gaussian_kernel(dim: int, kernel_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    """The reference's separable window (``metrics.py:67-77``).

    Note the profile is ``exp(-((x - size//2) / (2σ))²)`` — *not* the standard
    gaussian ``exp(-(x-m)²/(2σ²))`` — replicated for bit-level parity.  The
    leading 1/(σ√2π) factor cancels under normalization but is kept anyway.
    """
    xs = np.arange(kernel_size, dtype=np.float32)
    mean = kernel_size // 2
    g1 = 1.0 / (sigma * math.sqrt(2 * math.pi)) * np.exp(-(((xs - mean) / (2 * sigma)) ** 2))
    kernel = g1
    for _ in range(dim - 1):
        kernel = np.multiply.outer(kernel, g1)
    kernel = kernel / kernel.sum()
    return kernel.astype(np.float32)


class Metric:
    """Base: a named metric callable, traceable under jit."""

    requires_name = False  # Cardiac metrics need the patient name (host side).

    def __call__(self, output, target):
        raise NotImplementedError

    @property
    def name(self) -> str:
        return self.__class__.__name__


@METRICS.register()
class PSNR(Metric):
    """Reference ``src/model/metrics.py:9-36``."""

    def __init__(self, size_average: bool = True, max_value: int = 255):
        self.size_average = size_average
        self.max_value = max_value

    def __call__(self, output, target, mask=None):
        sq = jnp.square(output - target)
        reduced = tuple(range(1, output.ndim))
        if mask is None:
            mse = jnp.mean(sq, axis=reduced)
        else:
            mask = jnp.broadcast_to(mask, output.shape)
            mse = jnp.sum(sq * mask, axis=reduced) / jnp.maximum(jnp.sum(mask, axis=reduced), 1.0)
        psnr = 10.0 * jnp.log10(self.max_value**2 / (mse + 1e-10))
        return jnp.mean(psnr) if self.size_average else psnr


@METRICS.register()
class SSIM(Metric):
    """Reference ``src/model/metrics.py:39-113`` (valid depthwise conv)."""

    def __init__(self, dim: int = 2, channels: int = 1, size_average: bool = True, value_range: int = 255):
        if dim not in (2, 3):
            raise ValueError(f"SSIM supports dim=2 or dim=3; got dim={dim}.")
        self.dim = dim
        self.channels = channels
        self.size_average = size_average
        self.value_range = value_range
        self.c1 = (0.01 * value_range) ** 2
        self.c2 = (0.03 * value_range) ** 2
        # Depthwise kernel laid out (spatial..., in=1, out=channels) — channel-last HWIO.
        k = _reference_gaussian_kernel(dim)
        self.kernel = jnp.asarray(k[..., None, None] * np.ones((1,) * dim + (1, channels), np.float32))

    def _filter(self, x):
        # x: (N, *spatial, C); depthwise valid conv.
        dn_spec = ("NHWC", "HWIO", "NHWC") if self.dim == 2 else ("NDHWC", "DHWIO", "NDHWC")
        # HIGHEST precision: metrics are a fidelity contract; the TPU default
        # (bf16 multiplies) would skew SSIM by ~1e-3.
        return jax.lax.conv_general_dilated(
            x,
            self.kernel,
            window_strides=(1,) * self.dim,
            padding="VALID",
            dimension_numbers=dn_spec,
            feature_group_count=self.channels,
            precision=jax.lax.Precision.HIGHEST,
        )

    def ssim_map(self, output, target):
        mu1 = self._filter(output)
        mu2 = self._filter(target)
        sigma1_sq = self._filter(output * output) - mu1 * mu1
        sigma2_sq = self._filter(target * target) - mu2 * mu2
        sigma12 = self._filter(output * target) - mu1 * mu2
        return ((2 * mu1 * mu2 + self.c1) * (2.0 * sigma12 + self.c2)) / (
            (mu1 * mu1 + mu2 * mu2 + self.c1) * (sigma1_sq + sigma2_sq + self.c2)
        )

    def __call__(self, output, target, mask=None):
        smap = self.ssim_map(output, target)
        if mask is not None:
            mask = jnp.broadcast_to(mask, smap.shape)
            reduced = tuple(range(1, smap.ndim))
            per_sample = jnp.sum(smap * mask, axis=reduced) / jnp.maximum(
                jnp.sum(mask, axis=reduced), 1.0
            )
            return jnp.mean(per_sample) if self.size_average else per_sample
        if self.size_average:
            return jnp.mean(smap)
        return jnp.mean(smap, axis=tuple(range(1, smap.ndim)))


class _CardiacMixin:
    """Shared bbox → mask machinery for the cardiac metrics."""

    requires_name = True
    #: shrink of the valid-conv output per spatial edge (0 for PSNR, 10 for SSIM)
    _valid_shrink = 0

    def __init__(self, coordinates_path: str):
        with open(coordinates_path, "rb") as f:
            self.coordinates = pickle.load(f)
        self._mask_cache: dict[tuple, np.ndarray] = {}

    def mask_for(self, name: str, spatial_shape: tuple[int, int]) -> np.ndarray:
        """(1, H', W', 1) float mask for the patient bbox (cached)."""
        h0, hn, w0, wn = self.coordinates[name]
        s = self._valid_shrink
        H, W = spatial_shape[0] - s, spatial_shape[1] - s
        key = (name, H, W)
        if key not in self._mask_cache:
            mask = np.zeros((1, H, W, 1), np.float32)
            mask[:, h0 : max(h0, hn - s), w0 : max(w0, wn - s), :] = 1.0
            self._mask_cache[key] = mask
        return self._mask_cache[key]


@METRICS.register()
class CardiacPSNR(_CardiacMixin, PSNR):
    """Reference ``src/model/metrics.py:116-139``."""

    _valid_shrink = 0

    def __init__(self, coordinates_path: str, **kwargs):
        PSNR.__init__(self, **kwargs)
        _CardiacMixin.__init__(self, coordinates_path)

    def __call__(self, output, target, name=None, mask=None):
        if mask is None:
            # (H, W) are the LAST spatial dims for any rank — the reference
            # crops output[..., h0:hn, w0:wn] (metrics.py:138), so 5D video
            # input must not read (T, H) from axes 1:3
            mask = jnp.asarray(self.mask_for(name, output.shape[-3:-1]))
        return PSNR.__call__(self, output, target, mask=mask)


@METRICS.register()
class CardiacSSIM(_CardiacMixin, SSIM):
    """Reference ``src/model/metrics.py:142-165``."""

    _valid_shrink = 10  # 11-tap valid conv shrinks each spatial dim by 10

    def __init__(self, coordinates_path: str, **kwargs):
        SSIM.__init__(self, **kwargs)
        _CardiacMixin.__init__(self, coordinates_path)

    def __call__(self, output, target, name=None, mask=None):
        if mask is None:
            mask = jnp.asarray(self.mask_for(name, output.shape[-3:-1]))
        return SSIM.__call__(self, output, target, mask=mask)
