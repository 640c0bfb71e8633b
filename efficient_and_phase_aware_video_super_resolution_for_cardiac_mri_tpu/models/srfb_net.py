"""SRFBN feedback SISR + its DRF variants (reference ``src/model/nets/srfb_net.py``,
``drf_sisr_net.py``, ``drf_net.py``).

The feedback block's mutable ``hidden_state`` becomes an explicit carry:
SISR variants unroll ``num_steps`` (static); the video variant (DRFNet) scans
the carry over the frame axis.
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import upsample_bilinear
from .common import PROJ_PARAMS as _PROJ, ConvTransposeTorch, PReLU, UpsampleBlock, conv, fold_time, unfold_time



class _LRFBlock(nn.Module):
    """LR feature extraction (reference ``srfb_net.py:53-59``)."""

    in_channels: int
    num_features: int

    @nn.compact
    def __call__(self, x):
        x = conv(4 * self.num_features, 3, self.in_channels, name="conv1")(x)
        x = PReLU(name="prelu1")(x)
        x = conv(self.num_features, 1, 4 * self.num_features, name="conv2")(x)
        return PReLU(name="prelu2")(x)


class _FBlock(nn.Module):
    """Feedback block: dense up/down projection groups
    (reference ``srfb_net.py:62-134``)."""

    num_features: int
    num_groups: int
    upscale_factor: int

    @nn.compact
    def __call__(self, features, hidden_state):
        F = self.num_features
        k, s, p = _PROJ[self.upscale_factor]
        x = jnp.concatenate([features, hidden_state], axis=-1)
        x = conv(F, 1, 2 * F, name="in_conv")(x)
        lr_features = PReLU(name="in_prelu")(x)

        lr_list, hr_list = [lr_features], []
        for i in range(self.num_groups):
            cat_lr = jnp.concatenate(lr_list, axis=-1)
            if i == 0:
                hr = ConvTransposeTorch(F, k, s, p, name=f"up{i}_deconv")(cat_lr)
                hr = PReLU(name=f"up{i}_prelu")(hr)
            else:
                h = conv(F, 1, F * (i + 1), name=f"up{i}_conv1")(cat_lr)
                h = PReLU(name=f"up{i}_prelu1")(h)
                hr = ConvTransposeTorch(F, k, s, p, name=f"up{i}_deconv2")(h)
                hr = PReLU(name=f"up{i}_prelu2")(hr)
            hr_list.append(hr)
            cat_hr = jnp.concatenate(hr_list, axis=-1)
            if i == 0:
                lo = conv(F, k, F, strides=s, padding=p, name=f"down{i}_conv")(cat_hr)
                lo = PReLU(name=f"down{i}_prelu")(lo)
            else:
                lo = conv(F, 1, F * (i + 1), name=f"down{i}_conv1")(cat_hr)
                lo = PReLU(name=f"down{i}_prelu1")(lo)
                lo = conv(F, k, F, strides=s, padding=p, name=f"down{i}_conv2")(lo)
                lo = PReLU(name=f"down{i}_prelu2")(lo)
            lr_list.append(lo)

        out = jnp.concatenate(lr_list[1:], axis=-1)
        out = conv(F, 1, F * self.num_groups, name="out_conv")(out)
        return PReLU(name="out_prelu")(out)


class _RBlock(nn.Module):
    """Reconstruction: deconv + conv (reference ``srfb_net.py:137-151``)."""

    num_features: int
    out_channels: int
    upscale_factor: int

    @nn.compact
    def __call__(self, x):
        k, s, p = _PROJ[self.upscale_factor]
        x = ConvTransposeTorch(self.num_features, k, s, p, name="deconv1")(x)
        x = PReLU(name="prelu1")(x)
        return conv(self.out_channels, 3, self.num_features, name="conv2")(x)


class SRFBNet(nn.Module):
    """Reference ``srfb_net.py:8-50``: returns a list of per-step outputs."""

    in_channels: int
    out_channels: int
    num_steps: int
    num_features: int
    num_groups: int
    upscale_factor: int

    def __post_init__(self):
        super().__post_init__()
        if self.upscale_factor not in (2, 3, 4, 8):
            raise ValueError(
                f"The upscale factor should be 2, 3, 4 or 8. Got {self.upscale_factor}."
            )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        lrf = _LRFBlock(self.in_channels, self.num_features, name="lrf_block")
        fb = _FBlock(self.num_features, self.num_groups, self.upscale_factor, name="f_block")
        rb = _RBlock(self.num_features, self.out_channels, self.upscale_factor, name="r_block")
        upscaled = upsample_bilinear(x, self.upscale_factor, align_corners=False)
        outputs, hidden = [], None
        for i in range(self.num_steps):
            features = lrf(x)
            hidden = features if i == 0 else hidden
            hidden = fb(features, hidden)
            outputs.append(upscaled + rb(hidden))
        return outputs


class DRFSISRNet(nn.Module):
    """DRF SISR variant (reference ``drf_sisr_net.py:8-148``): additive global
    residual in feature space + PixelShuffle out block."""

    in_channels: int
    out_channels: int
    num_steps: int
    num_features: int
    num_groups: int
    upscale_factor: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        outputs, hidden = [], None
        lrf = _LRFBlock(self.in_channels, self.num_features, name="in_block")
        fb = _FBlock(self.num_features, self.num_groups, self.upscale_factor, name="f_block")
        # identical structure + param names to the shared UpsampleBlock
        # (reference drf_sisr_net.py:136-147) — checkpoint layout unchanged
        out_block = UpsampleBlock(self.num_features, self.out_channels, self.upscale_factor, name="out_block")
        for i in range(self.num_steps):
            in_features = lrf(x)
            hidden = in_features if i == 0 else hidden
            hidden = fb(in_features, hidden)
            outputs.append(out_block(in_features + hidden))
        return outputs


class DRFNet(nn.Module):
    """DRFSISRNet unrolled over video frames: the feedback hidden state is
    carried across time (reference ``drf_net.py:8-147``, hidden reset at
    frame 0).  Input (B, T, H, W, C) → output (B, T, sH, sW, C)."""

    in_channels: int
    out_channels: int
    num_features: int
    num_groups: int
    upscale_factor: int
    #: TPU extension: rematerialize each frame step in the backward — the
    #: per-frame _FBlock/out-block residuals reduce to the feedback carry, so
    #: training memory stops scaling with the 30-frame sequences this net
    #: consumes.  See refine_net.ConvLSTM.remat.
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        lrf = _LRFBlock(self.in_channels, self.num_features, name="in_block")

        # per-frame LR features in one folded conv, then scan the feedback carry
        feats = unfold_time(lrf(fold_time(x)[0]), (x.shape[0], x.shape[1]))

        scan = nn.scan(
            nn.remat(_DRFStep, prevent_cse=False) if self.remat else _DRFStep,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(
            self.num_features,
            self.num_groups,
            self.out_channels,
            self.upscale_factor,
            name="steps",
        )
        carry = {
            "hidden": jnp.zeros_like(feats[:, 0]),
            "first": jnp.ones((), bool),
        }
        _, outputs = scan(carry, feats)
        return outputs


class _DRFStep(nn.Module):
    """One frame of DRFNet (feedback carry in, SR frame out).  Submodules are
    created here so nn.scan broadcasts their params over time."""

    num_features: int
    num_groups: int
    out_channels: int
    upscale_factor: int

    @nn.compact
    def __call__(self, carry, f):
        fb = _FBlock(self.num_features, self.num_groups, self.upscale_factor, name="f_block")
        out_block = UpsampleBlock(
            self.num_features, self.out_channels, self.upscale_factor, name="out_block"
        )
        hidden = jnp.where(carry["first"], f, carry["hidden"])
        hidden = fb(f, hidden)
        out = out_block(f + hidden)
        return {"hidden": hidden, "first": jnp.zeros((), bool)}, out
