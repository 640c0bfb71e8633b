"""Shared model building blocks (Flax linen, channel-last).

The conv/PReLU/upsample blocks every reference net composes
(``_InBlock``/``_OutBlock`` pattern at reference ``refine_net.py:188-205``,
``edsr_net.py:56-67``), built TPU-first:

* channel-last NHWC convs (native TPU layout, MXU-friendly)
* time folded into the batch axis for per-frame blocks
* PyTorch-default initialization for train-from-scratch parity
"""
from __future__ import annotations

import math
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.torch_init import torch_conv_bias_init, torch_conv_kernel_init


def conv(features: int, kernel_size: int | tuple = 3, in_features: int | None = None,
         strides: int = 1, padding: int | None = None, name: str | None = None,
         use_bias: bool = True, kernel_init=None) -> nn.Conv:
    """nn.Conv with torch-default init; ``padding`` defaults to k//2 (torch
    'same' for odd kernels) and may be overridden (strided projections)."""
    ks = (kernel_size, kernel_size) if isinstance(kernel_size, int) else tuple(kernel_size)
    if padding is None:
        pad = tuple((k // 2, k // 2) for k in ks)
    else:
        pad = tuple((padding, padding) for _ in ks)
    bias_init = nn.initializers.zeros
    if in_features is not None:
        fan_in = in_features * math.prod(ks)
        bias_init = torch_conv_bias_init(fan_in)
    return nn.Conv(
        features,
        ks,
        strides=(strides, strides) if isinstance(strides, int) else strides,
        padding=pad,
        kernel_init=kernel_init or torch_conv_kernel_init,
        bias_init=bias_init,
        use_bias=use_bias,
        name=name,
    )


class PReLU(nn.Module):
    """Single-parameter PReLU, init 0.2 (reference uses
    ``nn.PReLU(num_parameters=1, init=0.2)`` throughout)."""

    init: float = 0.2

    @nn.compact
    def __call__(self, x):
        alpha = self.param("weight", lambda k: jnp.full((1,), self.init, jnp.float32))
        return jnp.where(x >= 0, x, alpha * x)


def fold_time(x: jnp.ndarray) -> tuple[jnp.ndarray, tuple]:
    """(B, T, H, W, C) → (B·T, H, W, C); returns the unfold spec."""
    B, T = x.shape[:2]
    return x.reshape(B * T, *x.shape[2:]), (B, T)


def unfold_time(x: jnp.ndarray, spec: tuple) -> jnp.ndarray:
    B, T = spec
    return x.reshape(B, T, *x.shape[1:])


class InBlock(nn.Module):
    """conv3×3 + PReLU (reference ``refine_net.py:188-192``)."""

    features: int
    in_features: int | None = None

    @nn.compact
    def __call__(self, x):
        x = conv(self.features, 3, self.in_features, name="conv")(x)
        return PReLU(name="prelu")(x)


class UpsampleBlock(nn.Module):
    """conv(C→C·r²) + PixelShuffle stages for ×{2,3,4,8}
    (reference ``refine_net.py:194-205``, ``edsr_net.py:56-67``)."""

    features: int
    out_features: int
    upscale_factor: int
    final_conv: bool = True

    @nn.compact
    def __call__(self, x):
        r = self.upscale_factor
        if r in (2, 4, 8):
            n = int(math.log2(r))
            for i in range(n):
                x = conv(4 * self.features, 3, self.features, name=f"conv{i+1}")(x)
                x = pixel_shuffle(x, 2)
            if self.final_conv:
                x = conv(self.out_features, 3, self.features, name=f"conv{n+1}")(x)
        elif r == 3:
            x = conv(9 * self.features, 3, self.features, name="conv1")(x)
            x = pixel_shuffle(x, 3)
            if self.final_conv:
                x = conv(self.out_features, 3, self.features, name="conv2")(x)
        else:
            raise ValueError(f"The upscale factor should be 2, 3, 4 or 8. Got {r}.")
        return x


class ConvTransposeTorch(nn.Module):
    """Transposed conv with torch ``nn.ConvTranspose2d(k, s, p)`` semantics:
    out = (in-1)·s − 2p + k.  Used by the back-projection blocks (SRFB/DRF/
    RBPN deconvs) and FRVSR's upsampling tail.

    Implemented as the mathematically-equivalent input-dilated conv with a
    spatially-flipped kernel — one fused XLA conv, MXU-shaped.  The kernel
    param is stored (kh, kw, in, out) so torch weights import via
    ``transpose(2, 3, 0, 1)``.
    """

    features: int
    kernel_size: int
    strides: int
    padding: int
    output_padding: int = 0
    in_features: int | None = None
    use_bias: bool = True
    kernel_init: Any = None

    @nn.compact
    def __call__(self, x):
        k, s, p = self.kernel_size, self.strides, self.padding
        in_ch = x.shape[-1]
        # torch ConvTranspose default init uses fan_in = out_channels·k²
        bound = 1.0 / math.sqrt(self.features * k * k)
        default_init = lambda key, shape: jax.random.uniform(  # noqa: E731
            key, shape, jnp.float32, -bound, bound
        )
        init = self.kernel_init if self.kernel_init is not None else default_init
        kernel = self.param("kernel", init, (k, k, in_ch, self.features))
        op = self.output_padding
        y = jax.lax.conv_general_dilated(
            x,
            jnp.flip(kernel, axis=(0, 1)),
            window_strides=(1, 1),
            padding=[(k - 1 - p, k - 1 - p + op)] * 2,
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            fan_in = self.features * k * k
            bias = self.param("bias", torch_conv_bias_init(fan_in), (self.features,))
            y = y + bias
        return y


class TorchBatchNorm(nn.Module):
    """torch ``nn.BatchNorm{1,2,3}d`` with exact running-statistics semantics.

    flax's ``nn.BatchNorm`` updates the running variance with the BIASED batch
    variance; torch updates it with the UNBIASED one (Bessel factor n/(n−1),
    ``torch.nn.modules.batchnorm`` docs) while still normalizing with the
    biased variance in train mode.  The difference only surfaces in eval-mode
    outputs AFTER training steps (the running stats drift apart by ~1/n per
    step), which is why forward weight-import parity never caught it — the
    training-dynamics A/B (``tests/test_train_dynamics_parity.py``) does.
    Variable layout matches flax ``nn.BatchNorm`` (params: scale/bias,
    batch_stats: mean/var), so torch imports, checkpoints, and partition
    specs are unchanged.  Under GSPMD data parallelism the batch reduction
    is global (jit-level sharding, not pmap), as before.
    """

    use_running_average: bool
    momentum: float = 0.1  # torch convention: new = (1−m)·old + m·batch
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        if self.use_running_average:
            mean = ra_mean.value.astype(x.dtype)
            var = ra_var.value.astype(x.dtype)
        else:
            axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(x, axes)
            var = jnp.mean(jnp.square(x - mean), axes)  # biased: normalization
            if not self.is_initializing():
                n = x.size // features
                unbiased = var * (n / max(n - 1, 1))
                m = self.momentum
                ra_mean.value = (1 - m) * ra_mean.value + m * mean.astype(
                    ra_mean.value.dtype
                )
                ra_var.value = (1 - m) * ra_var.value + m * unbiased.astype(
                    ra_var.value.dtype
                )
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias


def batch_norm(train: bool, name: str | None = None) -> TorchBatchNorm:
    """torch ``nn.BatchNorm{2,3}d`` semantics: eps 1e-5, running-stat momentum
    0.1, affine, unbiased running-var update (see ``TorchBatchNorm``).  Stats
    live in the ``batch_stats`` collection."""
    return TorchBatchNorm(use_running_average=not train, name=name)


#: torch ``nn.init.xavier_uniform_`` (gain 1) for conv kernels
xavier_conv_init = nn.initializers.xavier_uniform()


def param_count(params) -> int:
    return sum(p.size for p in jax.tree.leaves(params))


def param_summary(params) -> str:
    """Trainable parameter count + fp32 memory, like the reference
    ``BaseNet.__repr__`` (``src/model/nets/base_net.py:11-13``)."""
    n = param_count(params)
    return f"Trainable parameters: {n:,} | fp32 size: {n * 4 / 2**20:.2f} MiB"


def sg(x):
    """Alias for stop_gradient over a pytree — marks torch.no_grad boundaries."""
    return jax.tree.map(jax.lax.stop_gradient, x)


Shape = Sequence[int]

#: back-projection (k, stride, pad) per upscale factor — the reference's
#: shared projection table (``srfbn.py`` / ``rbpn.py`` both hardcode it)
PROJ_PARAMS = {2: (6, 2, 2), 3: (7, 3, 2), 4: (8, 4, 2), 8: (12, 8, 2)}


def pad_to_multiple(x, mult, axes=(-3, -2)):
    """Pad spatial dims to a multiple with the array's min value (the
    reference nets' ``F.pad(value=x.min())`` + center-crop quirk, shared by
    TOFlow/SpyNet (x16), FNet (x8) and EDVR (x4)).  Returns
    ``(padded, crop_slices)`` — ``crop_slices`` is ``None`` when no padding
    was needed, else a tuple of slices AT INPUT SCALE (scale the H/W slices
    when cropping an upscaled output, as EDVR does)."""
    pads = [(0, 0)] * x.ndim
    crops = [slice(None)] * x.ndim
    needed = False
    for ax in axes:
        size = x.shape[ax]
        diff = (mult - size % mult) % mult
        if diff:
            needed = True
            lo, hi = diff // 2, diff - diff // 2
            pads[ax % x.ndim] = (lo, hi)
            crops[ax % x.ndim] = slice(lo, lo + size)
    if not needed:
        return x, None
    padded = jax.lax.pad(
        x,
        jnp.min(x).astype(x.dtype),
        [(lo, hi, 0) for lo, hi in pads],
    )
    return padded, tuple(crops)
