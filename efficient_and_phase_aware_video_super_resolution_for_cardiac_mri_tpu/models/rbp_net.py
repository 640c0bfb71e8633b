"""RBPN: recurrent back-projection MISR (reference ``src/model/nets/rbp_net.py``).

Per neighbor frame: a DBPN up/down back-projection trunk refines the reference
frame's features (h0) while a resblock chain projects the [ref ‖ neighbor]
pair (h1); error feedback ``h = h0 + res_feat2(h0 − h1)``; all per-neighbor
states concat into the output conv.  PReLU here uses torch's default
init 0.25 (unlike the 0.2 used elsewhere in the reference).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .common import PROJ_PARAMS as _PROJ, ConvTransposeTorch, PReLU, conv



class ConvBlock(nn.Module):
    """conv + optional PReLU (reference ``rbp_net.py:142-174``, norm unused)."""

    out_ch: int
    kernel: int = 3
    stride: int = 1
    pad: int = 1
    in_ch: int | None = None
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = conv(self.out_ch, self.kernel, self.in_ch, strides=self.stride,
                 padding=self.pad, name="conv")(x)
        if self.act:
            x = PReLU(init=0.25, name="act")(x)
        return x


class DeconvBlock(nn.Module):
    """transposed conv + PReLU (reference ``rbp_net.py:177-209``)."""

    out_ch: int
    kernel: int
    stride: int
    pad: int
    act: bool = True

    @nn.compact
    def __call__(self, x):
        x = ConvTransposeTorch(self.out_ch, self.kernel, self.stride, self.pad,
                               name="deconv")(x)
        if self.act:
            x = PReLU(init=0.25, name="act")(x)
        return x


class ResnetBlock(nn.Module):
    """conv-act-conv + skip, then act (reference ``rbp_net.py:212-257``,
    called with norm=None)."""

    features: int

    @nn.compact
    def __call__(self, x):
        act = PReLU(init=0.25, name="act")  # ONE PReLU used twice (ref :224-255)
        out = conv(self.features, 3, self.features, name="conv1")(x)
        out = act(out)
        out = conv(self.features, 3, self.features, name="conv2")(out)
        out = out + x
        return act(out)


class UpBlock(nn.Module):
    """DBPN up-projection (reference ``rbp_net.py:260-271``)."""

    features: int
    kernel: int
    stride: int
    pad: int

    @nn.compact
    def __call__(self, x):
        h0 = DeconvBlock(self.features, self.kernel, self.stride, self.pad, name="up_conv1")(x)
        l0 = ConvBlock(self.features, self.kernel, self.stride, self.pad, name="up_conv2")(h0)
        h1 = DeconvBlock(self.features, self.kernel, self.stride, self.pad, name="up_conv3")(l0 - x)
        return h1 + h0


class DownBlock(nn.Module):
    """DBPN down-projection (reference ``rbp_net.py:274-285``)."""

    features: int
    kernel: int
    stride: int
    pad: int

    @nn.compact
    def __call__(self, x):
        l0 = ConvBlock(self.features, self.kernel, self.stride, self.pad, name="down_conv1")(x)
        h0 = DeconvBlock(self.features, self.kernel, self.stride, self.pad, name="down_conv2")(l0)
        l1 = ConvBlock(self.features, self.kernel, self.stride, self.pad, name="down_conv3")(h0 - x)
        return l1 + l0


class _ResChain(nn.Module):
    """num_resblocks ResnetBlocks + a projection tail
    (reference ``rbp_net.py:34-50`` res_feat1/2/3)."""

    n_blocks: int
    tail_kind: str  # 'deconv' or 'conv'
    tail_out: int
    tail_k: int
    tail_s: int
    tail_p: int
    tail_in: int | None = None

    @nn.compact
    def __call__(self, z):
        width = z.shape[-1]
        for i in range(self.n_blocks):
            z = ResnetBlock(width, name=f"res{i}")(z)
        if self.tail_kind == "deconv":
            return DeconvBlock(self.tail_out, self.tail_k, self.tail_s, self.tail_p, name="tail")(z)
        return ConvBlock(
            self.tail_out, self.tail_k, self.tail_s, self.tail_p, in_ch=self.tail_in, name="tail"
        )(z)


class DBPNet(nn.Module):
    """3-stage DBPN trunk (reference ``rbp_net.py:94-139``)."""

    base_filter: int
    feat: int
    num_stages: int
    upscale_factor: int

    @nn.compact
    def __call__(self, x):
        k, s, p = _PROJ[self.upscale_factor]
        F = self.feat
        x = ConvBlock(F, 1, 1, 0, in_ch=self.base_filter, name="feat1")(x)
        h1 = UpBlock(F, k, s, p, name="up1")(x)
        h2 = UpBlock(F, k, s, p, name="up2")(DownBlock(F, k, s, p, name="down1")(h1))
        h3 = UpBlock(F, k, s, p, name="up3")(DownBlock(F, k, s, p, name="down2")(h2))
        out = jnp.concatenate([h3, h2, h1], axis=-1)
        return ConvBlock(F, 1, 1, 0, in_ch=self.num_stages * F, act=False, name="output")(out)


class RBPNet(nn.Module):
    """Reference ``rbp_net.py:8-91``.  Input (B, T, h, w, C) → (B, H, W, C)."""

    in_channels: int
    out_channels: int
    base_filter: int
    feat: int
    num_stages: int
    num_resblocks: int
    num_frames: int
    upscale_factor: int

    @nn.compact
    def __call__(self, lr_imgs: jnp.ndarray) -> jnp.ndarray:
        T = self.num_frames
        t = T // 2 if T % 2 == 1 else T // 2 - 1
        k, s, p = _PROJ[self.upscale_factor]
        BF, F = self.base_filter, self.feat

        x = lr_imgs[:, t]
        neighbors = [lr_imgs[:, j] for j in range(T) if j != t]

        feat0 = ConvBlock(BF, 3, 1, 1, in_ch=self.in_channels, name="feat0")
        feat1 = ConvBlock(BF, 3, 1, 1, in_ch=self.in_channels * 2, name="feat1")
        dbp_net = DBPNet(BF, F, self.num_stages, self.upscale_factor, name="dbp_net")

        n_res = self.num_resblocks
        res_feat1 = _ResChain(n_res, "deconv", F, k, s, p, name="res_feat1")
        res_feat2 = _ResChain(n_res, "conv", F, 3, 1, 1, tail_in=F, name="res_feat2")
        res_feat3 = _ResChain(n_res, "conv", BF, k, s, p, tail_in=F, name="res_feat3")

        feat_input = feat0(x)
        feat_frames = [feat1(jnp.concatenate([x, nbr], axis=-1)) for nbr in neighbors]

        Ht = []
        for j in range(len(neighbors)):
            h0 = dbp_net(feat_input)
            h1 = res_feat1(feat_frames[j])
            e = res_feat2(h0 - h1)
            h = h0 + e
            Ht.append(h)
            feat_input = res_feat3(h)

        out = jnp.concatenate(Ht, axis=-1)
        return ConvBlock(
            self.out_channels, 3, 1, 1, in_ch=(T - 1) * F, act=False, name="output"
        )(out)
