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

from .warp import _corner_weights


def _bilinear_group_sample(x_g: jnp.ndarray, py: jnp.ndarray, px: jnp.ndarray) -> jnp.ndarray:
    """x_g: (B, H, W, G, Cg); py/px: (B, Ho, Wo, G) → (B, Ho, Wo, G, Cg).

    Zero-padding bilinear sampling (matches ``dmcn_im2col_bilinear`` +
    the outer bounds check in the CUDA kernel).
    """
    B, H, W, G, Cg = x_g.shape
    y0 = jnp.floor(py)
    x0 = jnp.floor(px)
    wy = (py - y0)[..., None].astype(x_g.dtype)
    wx = (px - x0)[..., None].astype(x_g.dtype)

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
    max_offset: int | None = None,
) -> jnp.ndarray:
    """(Modulated) deformable conv.

    x:      (B, H, W, Cin)
    offset: (B, Ho, Wo, 2·dg·k²) — CUDA channel layout (see module docstring)
    mask:   (B, Ho, Wo, dg·k²) or None (plain DCNv1)
    weight: (kh, kw, Cin, Cout)
    max_offset: when set (and stride=dilation=1), dispatch to the gather-free
        shift-and-weight path (:func:`deform_conv2d_windowed`) — ~10x faster
        on TPU, exact for |offset| ≤ max_offset, linearly attenuating to zero
        by |offset| = max_offset+1.
    """
    if max_offset is not None and stride == 1 and dilation == 1:
        return deform_conv2d_windowed(
            x, offset, weight, mask=mask, bias=bias, padding=padding,
            deformable_groups=deformable_groups, max_offset=max_offset,
        )
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
    off = offset.reshape(B, Ho, Wo, dg, 2 * K).astype(jnp.float32)
    msk = None if mask is None else mask.reshape(B, Ho, Wo, dg, K)

    # coordinate math in f32: bf16 cannot represent pixel indices above 256
    base_y = jnp.arange(Ho, dtype=jnp.float32)[:, None] * stride - padding  # (Ho, 1)
    base_x = jnp.arange(Wo, dtype=jnp.float32)[None, :] * stride - padding  # (1, Wo)

    cols = []
    for tap_idx in range(K):
        i, j = divmod(tap_idx, kw)
        py = base_y[None, :, :, None] + i * dilation + off[..., 2 * tap_idx]
        px = base_x[None, :, :, None] + j * dilation + off[..., 2 * tap_idx + 1]
        sampled = _bilinear_group_sample(x_g, py, px)  # (B, Ho, Wo, dg, Cg)
        # the CUDA kernel's OUTER bounds check (h_im > -1 && ... < H,
        # .cu:617-624 and the coordinate-weight early-out :503-507): as a
        # non-differentiable mask it also zeroes the offset GRADIENT at
        # out-of-image sampling positions — without it, autodiff leaks a
        # spurious boundary gradient through the zero-weight corner at the
        # knife-edge py == -1 (hit exactly when offsets are integers,
        # e.g. the zero-init state)
        inside = ((py > -1) & (px > -1) & (py < H) & (px < W)).astype(x.dtype)
        sampled = sampled * inside[..., None]
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


def deform_conv2d_windowed(
    x: jnp.ndarray,
    offset: jnp.ndarray,
    weight: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    bias: jnp.ndarray | None = None,
    padding: int = 0,
    deformable_groups: int = 1,
    max_offset: int = 2,
) -> jnp.ndarray:
    """Gather-free deformable conv: bilinear sampling as shift-and-weight.

    XLA's dynamic gather runs ~20x slower than a dense conv of the same
    shapes on TPU (PERF_NOTES.md round 2), so this path re-expresses the
    sampling TPU-natively: for every integer displacement ``d`` in the static
    window [−R, R], the input is statically shifted (pad+slice — pure data
    movement) and multiplied by the floor-indicator bilinear weight map

        w_t(d) = (1−frac)·[d == ⌊off⌋] + frac·[d == ⌊off⌋+1],  frac = off − ⌊off⌋

    (per axis; the product of the y and x maps).  This is the SAME corner
    selection and the SAME derivative as the CUDA bilinear (gradients flow
    only through ``frac`` — the forward difference, including at integer
    offsets where a tent `relu(1−|off−d|)` would tie-split).  The result
    equals the gathered sample EXACTLY whenever |offset| ≤ max_offset;
    beyond, contributions attenuate linearly (the missing corner drops) and
    vanish at |offset| ≥ max_offset+1 — the one documented divergence from
    the unbounded CUDA semantics, acceptable where offsets are known-small
    (e.g. EDVR's zero-init learned offsets).

    stride=1, dilation=1 only (EDVR's configuration).  Layouts identical to
    :func:`deform_conv2d`.
    """
    B, H, W, Cin = x.shape
    kh, kw, _, Cout = weight.shape
    K = kh * kw
    dg = deformable_groups
    Cg = Cin // dg
    R = int(max_offset)
    Ho, Wo = H + 2 * padding - (kh - 1), W + 2 * padding - (kw - 1)

    # coordinate math in f32 regardless of compute dtype: bf16 cannot
    # represent integer pixel positions above 256
    coord = jnp.float32
    off = offset.reshape(B, Ho, Wo, dg, 2 * K).astype(coord)
    msk = None if mask is None else mask.reshape(B, Ho, Wo, dg, K)
    x_g = x.reshape(B, H, W, dg, Cg)

    base_y = jnp.arange(Ho, dtype=coord)[:, None] - padding
    base_x = jnp.arange(Wo, dtype=coord)[None, :] - padding

    # pad ONCE by the maximum displacement; every shifted view is then a
    # static slice.  Shift range: sy = i + dy ∈ [-R, kh-1+R] in output
    # coordinates, i.e. [-R-padding, ...] in input coordinates — padding+R
    # on each side covers it exactly.  (Re-padding inside the K·(2R+1)² loop
    # emitted hundreds of pad ops per layer and leaned on XLA CSE.)
    pad_amt = padding + R
    x_pad = jnp.pad(
        x_g, ((0, 0), (pad_amt, pad_amt), (pad_amt, pad_amt), (0, 0), (0, 0))
    )
    _shift_cache: dict = {}

    def shifted(sy: int, sx: int) -> jnp.ndarray:
        """x_g sampled at (out_pixel + (sy, sx)) with zeros outside: a static
        slice of the once-padded input, no gather; memoized — (sy, sx) pairs
        recur across taps.  Returns (B, Ho, Wo, dg, Cg)."""
        if (sy, sx) not in _shift_cache:
            y0, x0 = sy + R, sx + R
            _shift_cache[(sy, sx)] = x_pad[:, y0 : y0 + Ho, x0 : x0 + Wo]
        return _shift_cache[(sy, sx)]

    corner_weights = _corner_weights

    cols = []
    for tap in range(K):
        i, j = divmod(tap, kw)
        oy = off[..., 2 * tap]
        ox = off[..., 2 * tap + 1]
        py = base_y[None, :, :, None] + i + oy  # absolute sample row
        px = base_x[None, :, :, None] + j + ox
        inside = ((py > -1) & (px > -1) & (py < H) & (px < W)).astype(x.dtype)
        acc = None
        for dy in range(-R, R + 1):
            wy = corner_weights(oy, dy)
            for dx in range(-R, R + 1):
                wgt = wy * corner_weights(ox, dx)
                # zero out corners outside the image (the CUDA bilinear's
                # per-corner bounds checks): corner position = base+tap+d
                cy = base_y[None, :, :, None] + i + dy
                cx = base_x[None, :, :, None] + j + dx
                ok = (cy >= 0) & (cy <= H - 1) & (cx >= 0) & (cx <= W - 1)
                term = shifted(i + dy, j + dx) * (wgt * ok).astype(x.dtype)[..., None]
                acc = term if acc is None else acc + term
        acc = acc * inside[..., None]
        if msk is not None:
            acc = acc * msk[..., tap][..., None]
        cols.append(acc)
    col = jnp.stack(cols, axis=3)  # (B, Ho, Wo, K, dg, Cg)
    w = weight.reshape(K, dg, Cg, Cout)
    out = jnp.einsum("bijkgc,kgco->bijo", col, w)
    if bias is not None:
        out = out + bias
    return out


# --------------------------------------------------------------------------
# Module wrappers mirroring the reference's four exported classes
# (``dcn/deform_conv.py``: DeformConv, DeformConvPack, ModulatedDeformConv,
# ModulatedDeformConvPack).  The Pack variants generate offsets (+ sigmoid
# mask) from a zero-initialized conv; weights use the reference's
# uniform(±1/√(Cin·k²)) init.


def _make_modules():
    import flax.linen as nn
    import jax

    from .telemetry import sow_offset_exceedance
    from .torch_init import torch_conv_kernel_init

    def _sow(mdl, offset):
        # windowed-DCN exceedance telemetry: no-op (and dead code under jit)
        # unless the caller collects the "telemetry" variable collection
        if mdl.max_offset is not None:
            sow_offset_exceedance(mdl, offset, mdl.deformable_groups, mdl.max_offset)

    class DeformConv(nn.Module):
        """DCNv1 with externally-supplied offsets (reference ``:151-198``)."""

        features: int
        kernel_size: int = 3
        stride: int = 1
        padding: int = 0
        dilation: int = 1
        deformable_groups: int = 1
        use_bias: bool = False  # reference DeformConv has no bias
        max_offset: int | None = None  # windowed fast path when set

        @nn.compact
        def __call__(self, x, offset):
            k = self.kernel_size
            weight = self.param(
                "weight", torch_conv_kernel_init, (k, k, x.shape[-1], self.features)
            )
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias
                else None
            )
            _sow(self, offset)
            return deform_conv2d(
                x, offset, weight, bias=bias, stride=self.stride, padding=self.padding,
                dilation=self.dilation, deformable_groups=self.deformable_groups,
                max_offset=self.max_offset,
            )

    class ModulatedDeformConv(DeformConv):
        """DCNv2 with external offsets + mask (reference ``:221-257``)."""

        use_bias: bool = True

        @nn.compact
        def __call__(self, x, offset, mask):
            k = self.kernel_size
            weight = self.param(
                "weight", torch_conv_kernel_init, (k, k, x.shape[-1], self.features)
            )
            bias = (
                self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias
                else None
            )
            _sow(self, offset)
            return modulated_deform_conv2d(
                x, offset, mask, weight, bias, stride=self.stride, padding=self.padding,
                dilation=self.dilation, deformable_groups=self.deformable_groups,
                max_offset=self.max_offset,
            )

    class DeformConvPack(DeformConv):
        """DCNv1 generating its own offsets (zero-init conv, reference ``:200-218``)."""

        @nn.compact
        def __call__(self, x):
            k, dg = self.kernel_size, self.deformable_groups
            offset = nn.Conv(
                dg * 2 * k * k, (k, k), strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                name="conv_offset",
            )(x)
            weight = self.param(
                "weight", torch_conv_kernel_init, (k, k, x.shape[-1], self.features)
            )
            _sow(self, offset)
            return deform_conv2d(
                x, offset, weight, stride=self.stride, padding=self.padding,
                dilation=self.dilation, deformable_groups=dg,
                max_offset=self.max_offset,
            )

    class ModulatedDeformConvPack(nn.Module):
        """DCNv2 generating offsets+mask; ``extra_offset_mask`` takes separate
        offset features (EDVR's mode, reference ``:259-291``)."""

        features: int
        kernel_size: int = 3
        stride: int = 1
        padding: int = 0
        dilation: int = 1
        deformable_groups: int = 1
        extra_offset_mask: bool = False
        max_offset: int | None = None  # windowed fast path when set

        @nn.compact
        def __call__(self, x, offset_features=None):
            k, dg = self.kernel_size, self.deformable_groups
            src = offset_features if self.extra_offset_mask else x
            om = nn.Conv(
                dg * 3 * k * k, (k, k), strides=(self.stride, self.stride),
                padding=[(self.padding, self.padding)] * 2,
                kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
                name="conv_offset_mask",
            )(src)
            o1, o2, mask = jnp.split(om, 3, axis=-1)
            offset = jnp.concatenate([o1, o2], axis=-1)
            mask = jax.nn.sigmoid(mask)
            _sow(self, offset)
            weight = self.param(
                "weight", torch_conv_kernel_init, (k, k, x.shape[-1], self.features)
            )
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            return modulated_deform_conv2d(
                x, offset, mask, weight, bias, stride=self.stride, padding=self.padding,
                dilation=self.dilation, deformable_groups=dg,
                max_offset=self.max_offset,
            )

    return DeformConv, ModulatedDeformConv, DeformConvPack, ModulatedDeformConvPack


DeformConv, ModulatedDeformConv, DeformConvPack, ModulatedDeformConvPack = _make_modules()
