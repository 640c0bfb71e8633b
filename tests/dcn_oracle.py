"""Independent brute-force oracles for the deformable convolution.

Direct ports of the reference CUDA kernel semantics
(``/root/reference/src/model/nets/edvr_net/dcn/src/deform_conv_cuda_kernel.cu``):

* ``dmcn_im2col_bilinear`` (:467-496): bilinear interpolation with per-corner
  bounds checks (corners outside the image contribute zero)
* ``(modulated_)deformable_im2col`` (:190-276, :570-631): sampling point
  ``(ho·stride − pad + i·dilation + off_y, ...)``, outer inclusion test
  ``h_im > −1 ∧ h_im < H``, offset channel layout ``g·2k² + 2·tap`` (y)
  / ``+1`` (x), mask layout ``g·k² + tap``
* host-side grouped im2col→GEMM composition
  (``deform_conv_cuda.cpp:151-258,486-564``)

Two tiers:

* :func:`modulated_deform_conv_naive` — scalar Python loops over every output
  element, numpy, forward only.  THE oracle: shares no code or vectorization
  strategy with the package implementation.
* :func:`modulated_deform_conv_torch` — vectorized differentiable torch port
  (cross-checked against the naive oracle) used for gradient comparisons and
  to stub the reference's CUDA ``dcn`` extension so the full reference EDVR
  runs on CPU (see :func:`make_dcn_stub_module`).
"""
from __future__ import annotations

import math
import sys
import types

import numpy as np


def _bilinear_naive(im: np.ndarray, h: float, w: float) -> float:
    """``dmcn_im2col_bilinear`` (.cu:467-496). im: (H, W)."""
    H, W = im.shape
    h_low = math.floor(h)
    w_low = math.floor(w)
    h_high = h_low + 1
    w_high = w_low + 1
    lh = h - h_low
    lw = w - w_low
    hh, hw = 1 - lh, 1 - lw
    v1 = im[h_low, w_low] if (h_low >= 0 and w_low >= 0) else 0.0
    v2 = im[h_low, w_high] if (h_low >= 0 and w_high <= W - 1) else 0.0
    v3 = im[h_high, w_low] if (h_high <= H - 1 and w_low >= 0) else 0.0
    v4 = im[h_high, w_high] if (h_high <= H - 1 and w_high <= W - 1) else 0.0
    return hh * hw * v1 + hh * lw * v2 + lh * hw * v3 + lh * lw * v4


def modulated_deform_conv_naive(
    x: np.ndarray,
    offset: np.ndarray,
    mask: np.ndarray | None,
    weight: np.ndarray,
    bias: np.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
) -> np.ndarray:
    """NCHW brute-force (modulated) deformable conv.

    x: (B, Cin, H, W); offset: (B, dg·2k², Ho, Wo); mask: (B, dg·k², Ho, Wo)
    or None (DCNv1); weight: (Cout, Cin//groups, kh, kw).
    """
    B, Cin, H, W = x.shape
    Cout, _, kh, kw = weight.shape
    K = kh * kw
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1
    cpdg = Cin // deformable_groups

    col = np.zeros((B, Cin * K, Ho, Wo), dtype=np.float64)
    for b in range(B):
        for c in range(Cin):
            g = c // cpdg
            for i in range(kh):
                for j in range(kw):
                    tap = i * kw + j
                    for ho in range(Ho):
                        for wo in range(Wo):
                            off_h = offset[b, g * 2 * K + 2 * tap, ho, wo]
                            off_w = offset[b, g * 2 * K + 2 * tap + 1, ho, wo]
                            m = 1.0 if mask is None else mask[b, g * K + tap, ho, wo]
                            h_im = ho * stride - padding + i * dilation + off_h
                            w_im = wo * stride - padding + j * dilation + off_w
                            val = 0.0
                            if h_im > -1 and w_im > -1 and h_im < H and w_im < W:
                                val = _bilinear_naive(x[b, c], h_im, w_im)
                            col[b, c * K + tap, ho, wo] = val * m

    out = np.zeros((B, Cout, Ho, Wo), dtype=np.float64)
    cpg, opg = Cin // groups, Cout // groups
    w_g = weight.reshape(groups, opg, cpg * K).astype(np.float64)
    col_g = col.reshape(B, groups, cpg * K, Ho * Wo)
    for b in range(B):
        for g in range(groups):
            out[b, g * opg : (g + 1) * opg] = (w_g[g] @ col_g[b, g]).reshape(opg, Ho, Wo)
    if bias is not None:
        out += np.asarray(bias, np.float64).reshape(1, -1, 1, 1)
    return out


def modulated_deform_conv_torch(
    x,
    offset,
    mask,
    weight,
    bias=None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    groups: int = 1,
    deformable_groups: int = 1,
):
    """Vectorized, differentiable torch port of the same CUDA semantics.

    Same layouts as :func:`modulated_deform_conv_naive` (NCHW tensors).
    """
    import torch

    B, Cin, H, W = x.shape
    Cout, _, kh, kw = weight.shape
    K = kh * kw
    dg = deformable_groups
    Cg = Cin // dg
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    off = offset.view(B, dg, 2 * K, Ho, Wo)
    msk = None if mask is None else mask.view(B, dg, K, Ho, Wo)
    x_g = x.view(B, dg, Cg, H, W)
    base_h = (torch.arange(Ho, dtype=x.dtype) * stride - padding).view(1, 1, Ho, 1)
    base_w = (torch.arange(Wo, dtype=x.dtype) * stride - padding).view(1, 1, 1, Wo)
    b_idx = torch.arange(B).view(B, 1, 1, 1)
    g_idx = torch.arange(dg).view(1, dg, 1, 1)

    def corner(hi, wi, cond):
        hc = hi.clamp(0, H - 1).long()
        wc = wi.clamp(0, W - 1).long()
        vals = x_g[b_idx, g_idx, :, hc, wc]  # (B, dg, Ho, Wo, Cg)
        return vals * cond.to(x.dtype).unsqueeze(-1)

    cols = []
    for i in range(kh):
        for j in range(kw):
            tap = i * kw + j
            h_im = base_h + i * dilation + off[:, :, 2 * tap]
            w_im = base_w + j * dilation + off[:, :, 2 * tap + 1]
            h_low = torch.floor(h_im)
            w_low = torch.floor(w_im)
            lh = (h_im - h_low).unsqueeze(-1)
            lw = (w_im - w_low).unsqueeze(-1)
            v1 = corner(h_low, w_low, (h_low >= 0) & (w_low >= 0))
            v2 = corner(h_low, w_low + 1, (h_low >= 0) & (w_low + 1 <= W - 1))
            v3 = corner(h_low + 1, w_low, (h_low + 1 <= H - 1) & (w_low >= 0))
            v4 = corner(h_low + 1, w_low + 1, (h_low + 1 <= H - 1) & (w_low + 1 <= W - 1))
            val = (
                (1 - lh) * (1 - lw) * v1
                + (1 - lh) * lw * v2
                + lh * (1 - lw) * v3
                + lh * lw * v4
            )
            inside = (h_im > -1) & (w_im > -1) & (h_im < H) & (w_im < W)
            val = val * inside.to(x.dtype).unsqueeze(-1)
            if msk is not None:
                val = val * msk[:, :, tap].unsqueeze(-1)
            cols.append(val)
    # (B, dg, Ho, Wo, Cg, K) → channel order c·K + tap, c = g·Cg + cg
    col = torch.stack(cols, dim=-1)
    col = col.permute(0, 1, 4, 5, 2, 3).reshape(B, Cin * K, Ho * Wo)

    cpg, opg = Cin // groups, Cout // groups
    w_g = weight.reshape(groups, opg, cpg * K)
    col_g = col.view(B, groups, cpg * K, Ho * Wo)
    out = torch.einsum("gok,bgkp->bgop", w_g, col_g).reshape(B, Cout, Ho, Wo)
    if bias is not None:
        out = out + bias.view(1, -1, 1, 1)
    return out


def make_dcn_stub_module(modname: str = "src.model.nets.edvr_net.dcn") -> types.ModuleType:
    """A CPU stand-in for the reference's compiled ``dcn`` extension package.

    Provides ``ModulatedDeformConvPack`` with the reference's interface
    (``dcn/deform_conv.py:259-291``: zero-init offset/mask conv, chunk-3 →
    cat(o1,o2)+sigmoid(mask), ``extra_offset_mask`` list input) on top of
    :func:`modulated_deform_conv_torch`, so ``EDVR_arch.py`` imports and runs.
    """
    import torch
    import torch.nn as nn

    class ModulatedDeformConvPack(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, deformable_groups=1,
                     bias=True, extra_offset_mask=False):
            super().__init__()
            self.stride, self.padding, self.dilation = stride, padding, dilation
            self.groups, self.deformable_groups = groups, deformable_groups
            self.extra_offset_mask = extra_offset_mask
            k = kernel_size
            self.weight = nn.Parameter(
                torch.empty(out_channels, in_channels // groups, k, k)
            )
            stdv = 1.0 / math.sqrt(in_channels * k * k)
            self.weight.data.uniform_(-stdv, stdv)
            self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None
            self.conv_offset_mask = nn.Conv2d(
                in_channels, deformable_groups * 3 * k * k, kernel_size=k,
                stride=stride, padding=padding, bias=True,
            )
            self.conv_offset_mask.weight.data.zero_()
            self.conv_offset_mask.bias.data.zero_()

        def forward(self, x):
            if self.extra_offset_mask:
                out = self.conv_offset_mask(x[1])
                x = x[0]
            else:
                out = self.conv_offset_mask(x)
            o1, o2, mask = torch.chunk(out, 3, dim=1)
            offset = torch.cat((o1, o2), dim=1)
            mask = torch.sigmoid(mask)
            return modulated_deform_conv_torch(
                x, offset, mask, self.weight, self.bias, self.stride,
                self.padding, self.dilation, self.groups, self.deformable_groups,
            )

    mod = types.ModuleType(modname)
    mod.ModulatedDeformConvPack = ModulatedDeformConvPack
    return mod


def install_dcn_stub():
    """Register the stub under the reference's import path (idempotent)."""
    name = "src.model.nets.edvr_net.dcn"
    if name not in sys.modules or not hasattr(sys.modules[name], "ModulatedDeformConvPack"):
        sys.modules[name] = make_dcn_stub_module(name)
    return sys.modules[name]
