"""EDVR: PCD-aligned, TSA-fused MISR (reference ``src/model/nets/edvr_net/``).

The reference gates this net behind a compiled CUDA DCN extension
(``src/model/nets/__init__.py:9`` keeps the import commented out); here the
deformable conv is the pure-JAX ``ops.deform_conv`` (gathers + one MXU GEMM),
so EDVR is a first-class registry citizen.

Components (reference ``EDVR_arch.py``):
* feature pyramid (L1/L2/L3, strided convs)
* PCD alignment: per neighbor, cascading deformable conv across the pyramid
* TSA fusion: temporal attention (dot product with the reference embedding)
  + spatial attention pyramid
* reconstruction trunk + double PixelShuffle + bilinear base residual
* optional predeblur pyramid (``EDVR_arch.py:148-188``)
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.deform_conv import modulated_deform_conv2d
from ..ops.pixel_shuffle import pixel_shuffle
from ..ops.resize import resize_bilinear, upsample_bilinear
from .common import conv, fold_time, pad_to_multiple, unfold_time
from ..ops.torch_init import torch_conv_kernel_init


def _lrelu(x):
    return nn.leaky_relu(x, 0.1)


def _kaiming_scaled(scale: float):
    """kaiming_normal(fan_in) × scale (reference ``arch_util.py:7-24``)."""
    base = nn.initializers.variance_scaling(2.0, "fan_in", "normal")

    def init(key, shape, dtype=jnp.float32):
        return base(key, shape, dtype) * scale

    return init


class ResidualBlockNoBN(nn.Module):
    """conv-ReLU-conv + skip, 0.1-scaled kaiming init (``arch_util.py:34-52``)."""

    nf: int = 64

    @nn.compact
    def __call__(self, x):
        # no in_features: the reference's initialize_weights ZEROES residual
        # conv biases (arch_util.py:15-16), and conv() defaults bias to zeros
        # only when fan_in isn't supplied
        out = conv(self.nf, 3, kernel_init=_kaiming_scaled(0.1), name="conv1")(x)
        out = nn.relu(out)
        out = conv(self.nf, 3, kernel_init=_kaiming_scaled(0.1), name="conv2")(out)
        return x + out


class DCNPack(nn.Module):
    """ModulatedDeformConvPack with ``extra_offset_mask``
    (reference ``dcn/deform_conv.py:259-291``): offsets+mask come from a
    zero-initialized conv over separate offset features; mask is
    sigmoid-gated."""

    nf: int
    kernel_size: int = 3
    deformable_groups: int = 8
    max_offset: int | None = None  # gather-free windowed DCN when set

    @nn.compact
    def __call__(self, x, offset_features):
        k, dg = self.kernel_size, self.deformable_groups
        om = nn.Conv(
            dg * 3 * k * k,
            (k, k),
            padding=[(k // 2, k // 2)] * 2,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
            name="conv_offset_mask",
        )(offset_features)
        o1, o2, mask = jnp.split(om, 3, axis=-1)
        offset = jnp.concatenate([o1, o2], axis=-1)
        mask = jax.nn.sigmoid(mask)
        if self.max_offset is not None:
            # windowed-DCN exceedance telemetry (ops/telemetry.py): no-op /
            # dead code unless the caller collects the telemetry collection
            from ..ops.telemetry import sow_offset_exceedance

            sow_offset_exceedance(self, offset, dg, self.max_offset)
        weight = self.param(
            "weight", torch_conv_kernel_init, (k, k, x.shape[-1], self.nf)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.nf,))
        return modulated_deform_conv2d(
            x, offset, mask, weight, bias,
            stride=1, padding=k // 2, dilation=1, deformable_groups=dg,
            max_offset=self.max_offset,
        )


class PCDAlign(nn.Module):
    """Pyramid cascading deformable alignment (reference ``EDVR_arch.py:191-251``)."""

    nf: int = 64
    groups: int = 8
    max_offset: int | None = None

    @nn.compact
    def __call__(self, nbr_fea_l, ref_fea_l):
        nf = self.nf
        # L3
        off = jnp.concatenate([nbr_fea_l[2], ref_fea_l[2]], axis=-1)
        off = _lrelu(conv(nf, 3, nf * 2, name="L3_offset_conv1")(off))
        L3_offset = _lrelu(conv(nf, 3, nf, name="L3_offset_conv2")(off))
        L3_fea = _lrelu(
            DCNPack(nf, 3, self.groups, self.max_offset, name="L3_dcnpack")(nbr_fea_l[2], L3_offset)
        )
        # L2
        off = jnp.concatenate([nbr_fea_l[1], ref_fea_l[1]], axis=-1)
        off = _lrelu(conv(nf, 3, nf * 2, name="L2_offset_conv1")(off))
        L3_offset_up = upsample_bilinear(L3_offset, 2, align_corners=False)
        off = _lrelu(
            conv(nf, 3, nf * 2, name="L2_offset_conv2")(
                jnp.concatenate([off, L3_offset_up * 2], axis=-1)
            )
        )
        L2_offset = _lrelu(conv(nf, 3, nf, name="L2_offset_conv3")(off))
        L2_fea = DCNPack(nf, 3, self.groups, self.max_offset, name="L2_dcnpack")(nbr_fea_l[1], L2_offset)
        L3_fea_up = upsample_bilinear(L3_fea, 2, align_corners=False)
        L2_fea = _lrelu(
            conv(nf, 3, nf * 2, name="L2_fea_conv")(
                jnp.concatenate([L2_fea, L3_fea_up], axis=-1)
            )
        )
        # L1
        off = jnp.concatenate([nbr_fea_l[0], ref_fea_l[0]], axis=-1)
        off = _lrelu(conv(nf, 3, nf * 2, name="L1_offset_conv1")(off))
        L2_offset_up = upsample_bilinear(L2_offset, 2, align_corners=False)
        off = _lrelu(
            conv(nf, 3, nf * 2, name="L1_offset_conv2")(
                jnp.concatenate([off, L2_offset_up * 2], axis=-1)
            )
        )
        L1_offset = _lrelu(conv(nf, 3, nf, name="L1_offset_conv3")(off))
        L1_fea = DCNPack(nf, 3, self.groups, self.max_offset, name="L1_dcnpack")(nbr_fea_l[0], L1_offset)
        L2_fea_up = upsample_bilinear(L2_fea, 2, align_corners=False)
        L1_fea = conv(nf, 3, nf * 2, name="L1_fea_conv")(
            jnp.concatenate([L1_fea, L2_fea_up], axis=-1)
        )
        # Cascading
        off = jnp.concatenate([L1_fea, ref_fea_l[0]], axis=-1)
        off = _lrelu(conv(nf, 3, nf * 2, name="cas_offset_conv1")(off))
        off = _lrelu(conv(nf, 3, nf, name="cas_offset_conv2")(off))
        return _lrelu(DCNPack(nf, 3, self.groups, self.max_offset, name="cas_dcnpack")(L1_fea, off))


class TSAFusion(nn.Module):
    """Temporal + spatial attention fusion (reference ``EDVR_arch.py:254-321``)."""

    nf: int = 64
    nframes: int = 5
    center: int = 2

    @nn.compact
    def __call__(self, aligned_fea):
        # aligned_fea: (B, N, H, W, C)
        B, N, H, W, C = aligned_fea.shape
        nf = self.nf
        emb_ref = conv(nf, 3, nf, name="tAtt_2")(aligned_fea[:, self.center])
        folded, spec = fold_time(aligned_fea)
        emb = unfold_time(conv(nf, 3, nf, name="tAtt_1")(folded), spec)

        cor = jnp.sum(emb * emb_ref[:, None], axis=-1)  # (B, N, H, W)
        cor_prob = jax.nn.sigmoid(cor)[..., None]  # (B, N, H, W, 1)
        weighted = aligned_fea * cor_prob
        # frame-major channel merge == torch's view(B, N*C, H, W)
        merged = weighted.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * C)

        fea = _lrelu(conv(nf, 1, N * nf, name="fea_fusion")(merged))

        att = _lrelu(conv(nf, 1, N * nf, name="sAtt_1")(merged))
        att_max = nn.max_pool(att, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        att_avg = _torch_avg_pool_3x3s2p1(att)
        att = _lrelu(
            conv(nf, 1, nf * 2, name="sAtt_2")(jnp.concatenate([att_max, att_avg], axis=-1))
        )
        att_L = _lrelu(conv(nf, 1, nf, name="sAtt_L1")(att))
        attL_max = nn.max_pool(att_L, (3, 3), (2, 2), padding=[(1, 1), (1, 1)])
        attL_avg = _torch_avg_pool_3x3s2p1(att_L)
        att_L = _lrelu(
            conv(nf, 3, nf * 2, name="sAtt_L2")(jnp.concatenate([attL_max, attL_avg], axis=-1))
        )
        att_L = _lrelu(conv(nf, 3, nf, name="sAtt_L3")(att_L))
        att_L = resize_bilinear(att_L, (att_L.shape[1] * 2, att_L.shape[2] * 2), align_corners=False)

        att = _lrelu(conv(nf, 3, nf, name="sAtt_3")(att))
        att = att + att_L
        att = _lrelu(conv(nf, 1, nf, name="sAtt_4")(att))
        att = resize_bilinear(att, (H, W), align_corners=False)
        att = conv(nf, 3, nf, name="sAtt_5")(att)
        att_add = conv(nf, 1, nf, name="sAtt_add_2")(
            _lrelu(conv(nf, 1, nf, name="sAtt_add_1")(att))
        )
        att = jax.nn.sigmoid(att)
        return fea * att * 2 + att_add


def _torch_avg_pool_3x3s2p1(x):
    """torch AvgPool2d(3, 2, 1) divides by the FULL window (count_include_pad)."""
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, 3, 3, 1), (1, 2, 2, 1), [(0, 0), (1, 1), (1, 1), (0, 0)]
    )
    return summed / 9.0


class PredeblurPyramid(nn.Module):
    """Reference ``EDVR_arch.py:148-188``."""

    in_channels: int
    nf: int = 128
    HR_in: bool = False

    @nn.compact
    def __call__(self, x):
        nf = self.nf
        if self.HR_in:
            f = _lrelu(conv(nf, 3, self.in_channels, name="conv_first_1")(x))
            f = _lrelu(conv(nf, 3, nf, strides=2, name="conv_first_2")(f))
            L1 = _lrelu(conv(nf, 3, nf, strides=2, name="conv_first_3")(f))
        else:
            L1 = _lrelu(conv(nf, 3, self.in_channels, name="conv_first")(x))
        L2 = _lrelu(conv(nf, 3, nf, strides=2, name="deblur_L2_conv")(L1))
        L3 = _lrelu(conv(nf, 3, nf, strides=2, name="deblur_L3_conv")(L2))
        L3 = upsample_bilinear(ResidualBlockNoBN(nf, name="RB_L3_1")(L3), 2, align_corners=False)
        L2 = ResidualBlockNoBN(nf, name="RB_L2_1")(L2) + L3
        L2 = upsample_bilinear(ResidualBlockNoBN(nf, name="RB_L2_2")(L2), 2, align_corners=False)
        L1 = ResidualBlockNoBN(nf, name="RB_L1_2")(ResidualBlockNoBN(nf, name="RB_L1_1")(L1)) + L2
        out = ResidualBlockNoBN(nf, name="RB_L1_3")(L1)
        out = ResidualBlockNoBN(nf, name="RB_L1_4")(out)
        return ResidualBlockNoBN(nf, name="RB_L1_5")(out)


class EDVRNet(nn.Module):
    """Reference ``EDVR_arch.py:13-145``.  Input (B, N, h, w, C) → (B, H, W, C)."""

    in_channels: int
    out_channels: int
    nf: int = 64
    nframes: int = 5
    groups: int = 8
    front_RBs: int = 5
    back_RBs: int = 10
    center: int | None = None
    predeblur: bool = False
    HR_in: bool = False
    w_TSA: bool = True
    # TPU extension: static sampling window for the gather-free DCN path
    # (ops/deform_conv.deform_conv2d_windowed) — ~10x faster; exact for
    # |learned offset| <= dcn_max_offset.  None = exact gather semantics.
    dcn_max_offset: int | None = None

    @nn.compact
    def __call__(self, lr_imgs: jnp.ndarray) -> jnp.ndarray:
        nf = self.nf
        center = self.nframes // 2 if self.center is None else self.center
        x = lr_imgs
        x, crops = pad_to_multiple(x, 4, axes=(-3, -2))
        B, N, H, W, C = x.shape
        x_center = x[:, center]

        folded, spec = fold_time(x)
        if self.predeblur:
            L1 = PredeblurPyramid(self.in_channels, nf, self.HR_in, name="pre_deblur")(folded)
            L1 = conv(nf, 1, nf, name="conv_1x1")(L1)
            if self.HR_in:
                H, W = H // 4, W // 4
        elif self.HR_in:
            L1 = _lrelu(conv(nf, 3, self.in_channels, name="conv_first_1")(folded))
            L1 = _lrelu(conv(nf, 3, nf, strides=2, name="conv_first_2")(L1))
            L1 = _lrelu(conv(nf, 3, nf, strides=2, name="conv_first_3")(L1))
            H, W = H // 4, W // 4
        else:
            L1 = _lrelu(conv(nf, 3, self.in_channels, name="conv_first")(folded))
        for i in range(self.front_RBs):
            L1 = ResidualBlockNoBN(nf, name=f"feature_extraction{i}")(L1)
        L2 = _lrelu(conv(nf, 3, nf, strides=2, name="fea_L2_conv1")(L1))
        L2 = _lrelu(conv(nf, 3, nf, name="fea_L2_conv2")(L2))
        L3 = _lrelu(conv(nf, 3, nf, strides=2, name="fea_L3_conv1")(L2))
        L3 = _lrelu(conv(nf, 3, nf, name="fea_L3_conv2")(L3))

        L1 = unfold_time(L1, spec)
        L2 = unfold_time(L2, spec)
        L3 = unfold_time(L3, spec)

        pcd = PCDAlign(nf, self.groups, self.dcn_max_offset, name="pcd_align")
        ref_fea_l = [L1[:, center], L2[:, center], L3[:, center]]
        # Deliberately a PER-NEIGHBOR loop (measured, round 3): folding the N
        # neighbors into the batch axis — valid math, shared weights, no
        # batch stats — made windowed serving ~15% SLOWER, the gather path
        # 1.5x slower (bigger gathers), and the batch-16 training backward
        # OOM (the windowed DCN temps at batch 8x5 blow HBM); the sequential
        # loop keeps peak activation memory at 1/N and the per-PCD batch is
        # already MXU-adequate at nf=128 (PERF_NOTES 'Batched PCD').
        aligned = jnp.stack(
            [pcd([L1[:, i], L2[:, i], L3[:, i]], ref_fea_l) for i in range(N)], axis=1
        )  # (B, N, H, W, nf)

        if self.w_TSA:
            fea = TSAFusion(nf, self.nframes, center, name="tsa_fusion")(aligned)
        else:
            merged = aligned.transpose(0, 2, 3, 1, 4).reshape(B, H, W, N * nf)
            fea = conv(nf, 1, N * nf, name="tsa_fusion")(merged)

        out = fea
        for i in range(self.back_RBs):
            out = ResidualBlockNoBN(nf, name=f"recon_trunk{i}")(out)
        out = _lrelu(pixel_shuffle(conv(nf * 4, 3, nf, name="upconv1")(out), 2))
        out = _lrelu(pixel_shuffle(conv(64 * 4, 3, nf, name="upconv2")(out), 2))
        out = _lrelu(conv(64, 3, 64, name="HRconv")(out))
        out = conv(self.out_channels, 3, 64, name="conv_last")(out)

        base = x_center if self.HR_in else upsample_bilinear(x_center, 4, align_corners=False)
        out = out + base
        if crops is not None:
            hs, ws = crops[-3], crops[-2]
            out = out[:, hs.start * 4 : hs.stop * 4, ws.start * 4 : ws.stop * 4]
        return out
