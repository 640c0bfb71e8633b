"""TOFlow: task-oriented flow MISR (reference ``src/model/nets/toflow_net.py``).

Bicubic-upscale all frames, SpyNet 4-level pyramid flow from each neighbor to
the reference frame, bilinear warp, concat, 4-conv fusion + reference
residual.  Input (B, T, h, w, C) → output (B, H, W, C).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.resize import resize_bilinear, upsample_bicubic
from ..ops.telemetry import sow_exceedance
from ..ops.warp import flow_warp
from .common import batch_norm, conv, pad_to_multiple


def _sow_flow(module, name, bound, flow):
    """Windowed-warp exceedance telemetry (ops/telemetry.py): |flow| in
    pixels vs the ``max_flow`` exactness bound.  No-op (and dead code under
    jit) unless the caller collects the ``telemetry`` variable collection."""
    if bound is not None:
        sow_exceedance(
            module, name, bound, jnp.abs(flow[..., 0]), jnp.abs(flow[..., 1])
        )


class SpyNetBlock(nn.Module):
    """5 conv7×7 + BN + ReLU layers → 2-channel flow refinement
    (reference ``toflow_net.py:95-113``)."""

    in_channels: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        widths = [32, 64, 32, 16]
        c_in = self.in_channels
        for i, w in enumerate(widths):
            x = conv(w, 7, c_in, name=f"conv{i+1}")(x)
            x = batch_norm(train, name=f"bn{i+1}")(x)
            x = nn.relu(x)
            c_in = w
        return conv(2, 7, c_in, name="conv5")(x)


class SpyNet(nn.Module):
    """Coarse-to-fine pyramid flow (reference ``toflow_net.py:70-92``)."""

    in_channels: int
    max_flow: int | None = None  # gather-free windowed warps (ops/warp.py)

    @nn.compact
    def __call__(self, ref, nbr, train: bool = False):
        B, H, W, C = ref.shape
        refs, nbrs = [ref], [nbr]
        for _ in range(3):
            refs.insert(0, nn.avg_pool(refs[0], (2, 2), (2, 2)))
            nbrs.insert(0, nn.avg_pool(nbrs[0], (2, 2), (2, 2)))
        flow = jnp.zeros((B, H // 16, W // 16, 2), ref.dtype)
        for i in range(4):
            h, w = flow.shape[1] * 2, flow.shape[2] * 2
            flow_up = resize_bilinear(flow, (h, w), align_corners=True) * 2.0
            _sow_flow(self, "pyramid_flow_window", self.max_flow, flow_up)
            feats = jnp.concatenate(
                [refs[i], flow_warp(nbrs[i], flow_up, max_flow=self.max_flow), flow_up], axis=-1
            )
            flow = flow_up + SpyNetBlock(self.in_channels, name=f"block{i}")(feats, train)
        return flow


class TOFlowNet(nn.Module):
    """Reference ``toflow_net.py:8-67``."""

    in_channels: int
    out_channels: int
    num_frames: int
    upscale_factor: int
    #: TPU extension: bound |flow| to R px and use the gather-free windowed
    #: warp everywhere (measured ~16x faster than the gather per warp on
    #: chip; exact while true flows stay within R — ops/warp.py).  None =
    #: exact unbounded reference semantics.
    max_flow: int | None = None

    @nn.compact
    def __call__(self, lr_imgs: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        T = self.num_frames
        ref_idx = T // 2 if T % 2 == 1 else T // 2 - 1
        x = upsample_bicubic(lr_imgs, self.upscale_factor, align_corners=False)
        x, crops = pad_to_multiple(x, 16, axes=(-3, -2))
        x_ref = x[:, ref_idx]

        spy = SpyNet(2 * self.in_channels + 2, max_flow=self.max_flow, name="spy_net")
        if train:
            # reference-exact training path: per-neighbor SpyNet calls so the
            # BN batch statistics are computed per call, exactly like the
            # reference's Python loop (toflow_net.py:47-56)
            warped = []
            for i in range(T):
                if i == ref_idx:
                    warped.append(x_ref)
                else:
                    nbr = x[:, i]
                    flow = spy(x_ref, nbr, train)
                    _sow_flow(self, "flow_window", self.max_flow, flow)
                    warped.append(flow_warp(nbr, flow, max_flow=self.max_flow))
        else:
            # eval/serving: ONE batched SpyNet + warp pass over all T-1
            # neighbors — identical math (shared weights, independent items,
            # BN uses frozen running stats) but one (T-1)x-bigger batch for
            # the MXU instead of T-1 small dispatches
            nbr_idx = [i for i in range(T) if i != ref_idx]
            B = x.shape[0]
            nbrs = x[:, nbr_idx]  # (B, T-1, H, W, C)
            flat = nbrs.reshape((B * len(nbr_idx),) + nbrs.shape[2:])
            ref_rep = jnp.repeat(x_ref, len(nbr_idx), axis=0)
            flows = spy(ref_rep, flat, train)
            _sow_flow(self, "flow_window", self.max_flow, flows)
            warped_flat = flow_warp(flat, flows, max_flow=self.max_flow)
            warped_nbrs = warped_flat.reshape(nbrs.shape)
            warped = []
            k = 0
            for i in range(T):
                if i == ref_idx:
                    warped.append(x_ref)
                else:
                    warped.append(warped_nbrs[:, k])
                    k += 1
        # frame-major channel concat == the reference's view(B, T*C, H, W)
        fused = jnp.concatenate(warped, axis=-1)

        C = self.in_channels
        y = conv(64, 9, C * T, name="out_conv1")(fused)
        y = nn.relu(y)
        y = conv(64, 9, 64, name="out_conv2")(y)
        y = nn.relu(y)
        y = conv(64, 1, 64, name="out_conv3")(y)
        y = nn.relu(y)
        y = conv(self.out_channels, 1, 64, name="out_conv4")(y)
        out = y + x_ref
        if crops is not None:
            # crops were built for (B, T, H, W, C); out is (B, H, W, C)
            out = out[(crops[0], crops[2], crops[3], crops[4])]
        return out
