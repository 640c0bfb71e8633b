"""Deformable convolution v1/v2 (pure JAX, channel-last).

The reference implements these as a hand-written CUDA extension
(``src/model/nets/edvr_net/dcn/src/deform_conv_cuda_kernel.cu:190-276``):
im2col with bilinear sampling at offset locations → batched GEMM.  On TPU the
same algorithm is expressed as k² vectorized bilinear gathers (XLA gathers)
followed by ONE MXU-shaped contraction; autograd comes free from JAX, so the
reference's hand-written backward kernels (col2im, col2im_coord) have no
counterpart here (SURVEY.md §2.4).

Semantics replicated from the CUDA kernel:
* sampling point for output (i, j), kernel tap (kh, kw), deformable group g:
    y = i·stride − pad + kh·dilation + offset_y[b, i, j, g, tap]
    x = j·stride − pad + kw·dilation + offset_x[...]
* offset channel layout (within each deformable group): (y, x) interleaved
  per tap — channel ``g·2k² + 2·tap`` is y, ``+1`` is x
  (``deform_conv_cuda_kernel.cu:205-211``)
* mask channel layout: ``g·k² + tap``
* out-of-bounds bilinear taps contribute zero (zero padding)
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _bilinear_group_sample(x_g: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """x_g: (B, H, W, G, Cg); py/px: (B, Ho, Wo, G) → (B, Ho, Wo, G, Cg).

    Zero-padding bilinear sampling (matches ``dmcn_im2col_bilinear`` +
    the outer bounds check in the CUDA kernel).
    """
    B, H, W, G, Cg = x_g.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None]
    wx = (px - x0)[..., None]

    b_idx = jnp.arange(B)[:, None, None, None]
    g_idx = jnp.arange(G)[None, None, None, :]

    def tap(yi, xi):
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        vals = x_g[b_idx, yc, xc, g_idx]  # (B, Ho, Wo, G, Cg)
        inside = ((yi >= 0) & (yi <= H - 1) & (xi >= 0) & (xi <= W - 1)).astype(x_g.dtype)
        return vals * inside[..., None]

    v00 = tap(y0, x0)
    v01 = tap(y0, x0 + 1)
    v10 = tap(y0 + 1, x0)
    v11 = tap(y0 + 1, x0 + 1)
    return (
        v00 * (1 - wy) * (1 - wx)
        + v01 * (1 - wy) * wx
        + v10 * wy * (1 - wx)
        + v11 * wy * wx
    )


def deform_conv2d(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
    deformable_groups: int = 1,
) -> jnp.ndarray:
    """(Modulated) deformable conv.

    x:      (B, H, W, Cin)
    offset: (B, Ho, Wo, 2·dg·k²) — CUDA channel layout (see module docstring)
    mask:   (B, Ho, Wo, dg·k²) or None (plain DCNv1)
    weight: (kh, kw, Cin, Cout)
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    dg = deformable_groups
    if Cin % dg:
        raise ValueError(f"Cin={Cin} not divisible by deformable_groups={dg}.")
    Cg = Cin // dg
    Ho = (H + 2 * padding - (dilation * (kh - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (kw - 1) + 1)) // stride + 1

    x_g = x.reshape(B, H, W, dg, Cg)
    # offsets per group/tap: (B, Ho, Wo, dg, 2k²)
    off = offset.reshape(B, Ho, Wo, dg, 2 * K)
    msk = None if mask is None else mask.reshape(B, Ho, Wo, dg, K)

    base_y = jnp.arange(Ho, dtype=x.dtype)[:, None] * stride - padding  # (Ho, 1)
    base_x = jnp.arange(Wo, dtype=x.dtype)[None, :] * stride - padding  # (1, Wo)

    cols = []
    for tap_idx in range(K):
        i, j = divmod(tap_idx, kw)
        py = base_y[None, :, :, None] + i * dilation + off[..., 2 * tap_idx]
        px = base_x[None, :, :, None] + j * dilation + off[..., 2 * tap_idx + 1]
        sampled = _bilinear_group_sample(x_g, py, px)  # (B, Ho, Wo, dg, Cg)
        if msk is not None:
            sampled = sampled * msk[..., tap_idx][..., None]
        cols.append(sampled)
    # (B, Ho, Wo, K, dg, Cg) → contraction with weight (K, dg, Cg, Cout)
    col = jnp.stack(cols, axis=3)
    w = weight.reshape(K, dg, Cg, Cout)
    out = jnp.einsum("bijkgc,kgco->bijo", col, w)
    if bias is not None:
        out = out + bias
    return out


def modulated_deform_conv2d(x, offset, mask, weight, bias=None, **kwargs):
    """DCNv2 (reference ``deform_conv.py:116-119``)."""
    return deform_conv2d(x, offset, weight, mask=mask, bias=bias, **kwargs)
