"""FRVSR: frame-recurrent VSR (reference ``src/model/nets/frvsr_net.py``).

Per frame: FNet (6-scale conv encoder/decoder, tanh flow) estimates LR flow
from the previous LR frame; the flow is bilinearly upsampled (×r,
align_corners=True), the previous SR output is warped through the STN
(detached — replicated with stop_gradient), space-to-depth packed and fed
with the current LR frame into SRNet (10 resblocks + two ×2 transposed-conv
stages).  Also returns the warped LR frames for the flow loss.

TPU redesign: the frame recurrence is an ``nn.scan`` over the time axis with
carry (lr_last, sr_last) — one compiled step regardless of T.  All convs use
Xavier-uniform init (reference ``frvsr_net.py:35-38``).
"""
from __future__ import annotations

from functools import partial

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pixel_shuffle import space_to_depth
from ..ops.resize import upsample_bilinear
from ..ops.telemetry import exceedance_triple, merge_time_axis, sow_triple
from ..ops.warp import stn_warp
from .common import ConvTransposeTorch, conv, pad_to_multiple, xavier_conv_init

_xconv = partial(conv, kernel_init=xavier_conv_init)


class _ResBlock(nn.Module):
    features: int = 64

    @nn.compact
    def __call__(self, x):
        r = _xconv(self.features, 3, self.features, name="conv1")(x)
        r = nn.relu(r)
        r = _xconv(self.features, 3, self.features, name="conv2")(r)
        return x + r


class SRNet(nn.Module):
    """Reference ``frvsr_net.py:65-95``."""

    in_channels: int
    out_channels: int
    upscale_factor: int
    num_resblocks: int = 10

    @nn.compact
    def __call__(self, x):
        c_in = self.in_channels * (self.upscale_factor**2 + 1)
        x = _xconv(64, 3, c_in, name="head")(x)
        x = nn.relu(x)
        for i in range(self.num_resblocks):
            x = _ResBlock(64, name=f"resblock{i}")(x)
        for i in range(2):
            x = ConvTransposeTorch(
                64, 3, 2, 1, output_padding=1, kernel_init=xavier_conv_init,
                name=f"deconv{i+1}",
            )(x)
            x = nn.relu(x)
        return _xconv(self.out_channels, 3, 64, name="tail")(x)


class FNet(nn.Module):
    """6-scale flow estimator with tanh output (reference ``frvsr_net.py:110-166``).

    Operates on /8-padded inputs; the pad uses the batch min value like the
    reference's ``F.pad(value=x.min())``.
    """

    in_channels: int
    out_channels: int = 2

    @nn.compact
    def __call__(self, a, b):
        x = jnp.concatenate([a, b], axis=-1)
        x, crops = pad_to_multiple(x, 8, axes=(-3, -2))

        f, c_in = 32, self.in_channels * 2
        for i in range(3):
            x = _xconv(f, 3, c_in, name=f"conv{i+1}_1")(x)
            x = nn.leaky_relu(x, 0.2)
            x = _xconv(f, 3, f, name=f"conv{i+1}_2")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.max_pool(x, (2, 2), (2, 2))
            c_in, f = f, f * 2
        for i in range(3):
            x = _xconv(f, 3, c_in, name=f"conv{i+4}_1")(x)
            x = nn.leaky_relu(x, 0.2)
            x = _xconv(f, 3, f, name=f"conv{i+4}_2")(x)
            x = nn.leaky_relu(x, 0.2)
            x = upsample_bilinear(x, 2, align_corners=False)
            c_in, f = f, f // 2
        x = _xconv(32, 3, c_in, name="tail_conv1")(x)
        x = nn.leaky_relu(x, 0.2)
        x = _xconv(self.out_channels, 3, 32, name="tail_conv2")(x)
        x = jnp.tanh(x)
        if crops is not None:
            x = x[crops]
        return x


class FRVSRNet(nn.Module):
    """Reference ``frvsr_net.py:11-62``.  Input (B, T, h, w, C); returns
    (sr_seq, warped_lr_seq) or sr_seq alone when ``is_prediction``."""

    in_channels: int
    out_channels: int
    upscale_factor: int
    is_prediction: bool = False
    num_resblocks: int = 10
    #: TPU extension: bound |flow| to R px and use the gather-free windowed
    #: STN warp (measured ~16x faster per warp than the gather on chip;
    #: exact while true flows stay within R — ops/warp.py).  None = exact
    #: unbounded reference semantics.
    max_flow: int | None = None
    #: TPU extension: rematerialize each frame step in the backward — the
    #: stacked per-frame FNet/SRNet residuals reduce to the (lr, sr) carries
    #: (temp memory 0.28x at T=10, XLA memory analysis).  Same ops; grads
    #: match to ~7e-7 of each leaf's scale, T-independent (XLA re-optimizes
    #: the recomputed forward — scheduling ulps, tested).  See
    #: refine_net.ConvLSTM.
    remat: bool = False

    def __post_init__(self):
        super().__post_init__()
        # SRNet's tail hardcodes two x2 transposed-conv stages
        # (reference frvsr_net.py:84-88) — the reference is x4-only too.
        if self.upscale_factor != 4:
            raise ValueError(f"FRVSRNet supports upscale_factor=4 only. Got {self.upscale_factor}.")

    @nn.compact
    def __call__(self, lr_imgs: jnp.ndarray):
        B, T, h, w, C = lr_imgs.shape
        r = self.upscale_factor

        step_cls = (
            nn.remat(_FRVSRStep, prevent_cse=False) if self.remat else _FRVSRStep
        )
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
        )(self.in_channels, self.out_channels, r, self.num_resblocks,
          self.max_flow, name="steps")
        carry = (
            lr_imgs[:, 0],
            jnp.zeros((B, h * r, w * r, C), lr_imgs.dtype),
        )
        if self.max_flow is None:
            _, (sr_seq, warped_seq) = scan(carry, lr_imgs)
        else:
            # windowed-warp exceedance telemetry (ops/telemetry.py): the
            # per-step (3,) triples ride out of the scan as stacked outputs
            # (sow inside nn.scan would need collection plumbing; as plain
            # outputs they also survive nn.remat), are folded over time here,
            # and are sowed — a no-op (and XLA dead code) unless the caller
            # collects the "telemetry" variable collection
            _, (sr_seq, warped_seq, (tel_sr, tel_lr)) = scan(carry, lr_imgs)
            sow_triple(self, "sr_flow_window", merge_time_axis(tel_sr))
            sow_triple(self, "lr_flow_window", merge_time_axis(tel_lr))
        if self.is_prediction:
            return sr_seq
        return sr_seq, warped_seq


class _FRVSRStep(nn.Module):
    """One frame of FRVSR; carry = (lr_last, sr_last).  FNet/SRNet are created
    here so nn.scan broadcasts their params over the time axis."""

    in_channels: int
    out_channels: int
    upscale_factor: int
    num_resblocks: int
    max_flow: int | None = None

    @nn.compact
    def __call__(self, carry, x):
        r = self.upscale_factor
        fnet = FNet(self.in_channels, 2, name="fnet")
        srnet = SRNet(self.in_channels, self.out_channels, r, self.num_resblocks, name="srnet")
        lr_last, sr_last = carry
        lr_flow = fnet(lr_last, x)
        sr_flow = upsample_bilinear(lr_flow, r, align_corners=True)
        warped_sr = stn_warp(
            jax.lax.stop_gradient(sr_last), sr_flow[..., 0], sr_flow[..., 1],
            "border", max_flow=self.max_flow,
        )
        packed = space_to_depth(warped_sr, r)
        sr = srnet(jnp.concatenate([packed, x], axis=-1))
        warped_lr = stn_warp(lr_last, lr_flow[..., 0], lr_flow[..., 1], "border",
                             max_flow=self.max_flow)
        if self.max_flow is None:
            return (x, sr), (sr, warped_lr)
        # exceedance triples vs max_flow in PIXELS: the STN flow is
        # normalized, pixel displacement = u·W/2, v·H/2 of the warped image
        # (ops/warp.stn_warp's documented bound) — one triple per warp site,
        # stacked over time by nn.scan, folded + sowed by FRVSRNet
        h, w = x.shape[-3], x.shape[-2]
        tel_sr = exceedance_triple(
            self.max_flow,
            jnp.abs(sr_flow[..., 0]) * (w * r / 2.0),
            jnp.abs(sr_flow[..., 1]) * (h * r / 2.0),
        )
        tel_lr = exceedance_triple(
            self.max_flow,
            jnp.abs(lr_flow[..., 0]) * (w / 2.0),
            jnp.abs(lr_flow[..., 1]) * (h / 2.0),
        )
        return (x, sr), (sr, warped_lr, (tel_sr, tel_lr))
