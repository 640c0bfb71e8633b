"""DUF: dynamic upsampling filters VSR (reference ``src/model/nets/duf_net.py``).

Per-frame head conv → 3D dense backbone (16/28/52-layer variants whose last
blocks shrink the temporal axis to 1) → a filter branch producing a
softmax-normalized k×k dynamic filter per output subpixel, applied to the
center frame via an im2col identity conv + matmul + PixelShuffle, plus a
residual branch.  Layout: (B, T, H, W, C) is natively NDHWC for the 3D convs.
"""
from __future__ import annotations

import numpy as np

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pixel_shuffle import pixel_shuffle
from .common import batch_norm, conv, fold_time, unfold_time
from .common import torch_conv_bias_init
from ..ops.torch_init import torch_conv_kernel_init

_BACKBONES = {
    "_DenseLayer16": (32, 3, 3, 256),  # G, n_keep, n_shrink, tail_in
    "_DenseLayer28": (16, 9, 3, 256),
    "_DenseLayer52": (16, 21, 3, 448),
}


def conv3d(features, kernel_size, in_features=None, padding=None, name=None):
    ks = (kernel_size,) * 3 if isinstance(kernel_size, int) else tuple(kernel_size)
    if padding is None:
        pad = tuple((k // 2, k // 2) for k in ks)
    else:
        pad = tuple((p, p) for p in padding)
    bias_init = nn.initializers.zeros
    if in_features is not None:
        bias_init = torch_conv_bias_init(in_features * int(np.prod(ks)))
    return nn.Conv(
        features, ks, padding=pad, kernel_init=torch_conv_kernel_init,
        bias_init=bias_init, name=name,
    )


class _DenseBlock(nn.Module):
    """BN-ReLU-conv1 + BN-ReLU-conv3 (reference ``duf_net.py:195-214``);
    ``shrink`` uses temporal-valid padding (0,1,1), dropping 2 frames."""

    out_features: int
    shrink: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        x = batch_norm(train, name="bn1")(x)
        x = nn.relu(x)
        x = conv3d(c, 1, c, name="conv1")(x)
        x = batch_norm(train, name="bn2")(x)
        x = nn.relu(x)
        pad = (0, 1, 1) if self.shrink else (1, 1, 1)
        return conv3d(self.out_features, 3, c, padding=pad, name="conv2")(x)


class _DenseBackbone(nn.Module):
    """Reference ``_DenseLayer{16,28,52}`` (``duf_net.py:102-192``)."""

    backbone: str

    @nn.compact
    def __call__(self, x, train: bool = False):
        G, n_keep, n_shrink, tail_in = _BACKBONES[self.backbone]
        concat = x
        for i in range(n_keep + n_shrink):
            shrink = i >= n_keep
            y = _DenseBlock(G, shrink, name=f"conv{i}")(concat, train)
            if shrink:
                concat = jnp.concatenate([concat[:, 1:-1], y], axis=-1)
            else:
                concat = jnp.concatenate([concat, y], axis=-1)
        x = batch_norm(train, name="tail_bn")(concat)
        x = nn.relu(x)
        return conv3d(256, (1, 3, 3), tail_in, padding=(0, 1, 1), name="tail_conv")(x)


class DUFNet(nn.Module):
    """Reference ``duf_net.py:9-99``.  Input (B, T, h, w, C) → (B, H, W, C)."""

    in_channels: int
    out_channels: int
    num_frames: int
    size_filter: int
    upscale_factor: int
    backbone: str

    def __post_init__(self):
        super().__post_init__()
        if self.backbone not in _BACKBONES:
            raise ValueError(f"Unknown backbone {self.backbone!r}.")

    @nn.compact
    def __call__(self, lr_imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        T = self.num_frames
        sf, r = self.size_filter, self.upscale_factor
        t_ref = T // 2 if T % 2 == 1 else T // 2 - 1
        target = lr_imgs[:, t_ref]  # (B, h, w, C)

        folded, spec = fold_time(lr_imgs)
        feats = unfold_time(conv(64, 3, self.in_channels, name="head")(folded), spec)
        feats = _DenseBackbone(self.backbone, name="denseLayer")(feats, train)  # (B, 1, h, w, 256)

        # filter generation network (softmax over the sf² taps)
        f = nn.relu(feats)
        f = conv3d(512, 1, 256, name="filter_conv1")(f)
        f = nn.relu(f)
        f = conv3d(sf * sf * r * r, 1, 512, name="filter_conv2")(f)
        B, _, h, w, _ = f.shape
        filters = f[:, 0].reshape(B, h, w, sf * sf, r * r)
        filters = nn.softmax(filters, axis=-2)

        # local expansion of the center frame: im2col via a CONSTANT identity
        # conv (reference ``duf_net.py:79-82`` — not a learnable parameter).
        # kernel[i, j, 0, o] = 1 iff o == i·sf + j, matching torch's tap order.
        import jax

        # built in the compute dtype: a f32 constant would crash the conv
        # under compute_dtype=bfloat16 (conv requires matching dtypes), and
        # a 0/1 identity is exact in any float dtype
        eye = jnp.asarray(
            np.eye(sf * sf, dtype=np.float32).reshape(sf, sf, 1, sf * sf),
            dtype=target.dtype,
        )
        outs = []
        for c in range(target.shape[-1]):
            xc = target[..., c : c + 1]
            patches = jax.lax.conv_general_dilated(
                xc, eye, (1, 1), [(sf // 2, sf // 2)] * 2,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            # (B, h, w, sf²) × (B, h, w, sf², r²) → (B, h, w, r²)
            y = jnp.einsum("bhwk,bhwkr->bhwr", patches, filters)
            outs.append(pixel_shuffle(y, r))
        duf_out = jnp.concatenate(outs, axis=-1)

        # residual generation network
        g = nn.relu(feats)
        g = conv3d(256, 1, 256, name="residual_conv1")(g)
        g = nn.relu(g)
        g = conv3d(self.in_channels * r * r, 1, 256, name="residual_conv2")(g)
        residual = pixel_shuffle(g[:, 0], r)
        return duf_out + residual
