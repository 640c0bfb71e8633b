"""Flow warping: torch ``grid_sample`` semantics in pure JAX (channel-last).

Two callers in the model zoo, each with its own (quirky) coordinate chain,
replicated exactly:

* ``flow_warp`` — TOFlow / EDVR style (reference ``toflow_net.py:116-138``):
  pixel grid + flow, normalized by (size-1) (align_corners=True convention),
  then sampled with torch's DEFAULT ``align_corners=False`` unnormalization.
  Zeros padding.
* ``stn_warp`` — FRVSR's STN (reference ``frvsr_net.py:196-240``): a
  ``linspace(-1, 1)`` mesh plus the RAW flow values (the net's tanh output is
  treated as a normalized displacement), sampled align_corners=False with
  border padding.

Implementation: gather the 4 bilinear neighbors with clipped indices and
mask out-of-bounds taps for zeros padding.  Gathers are not MXU work, but
warping is a tiny fraction of these nets' FLOPs.
"""
from __future__ import annotations

import jax.numpy as jnp


def grid_sample(
    x: jnp.ndarray,
    grid: jnp.ndarray,
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jnp.ndarray:
    """x: (B, H, W, C); grid: (B, Ho, Wo, 2) normalized (x, y) in [-1, 1].

    Coordinate math runs in f32 regardless of compute dtype: bf16 cannot
    represent integer pixel positions above 256 (nor distinguish adjacent
    normalized mesh values at these sizes), which would silently corrupt
    warps of x4-upscaled frames under ``compute_dtype: bfloat16`` — same
    rule as ops/deform_conv.py.  Only the final blend returns to x.dtype.
    """
    B, H, W, C = x.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        sx = (gx + 1.0) * (W - 1) / 2.0
        sy = (gy + 1.0) * (H - 1) / 2.0
    else:
        sx = ((gx + 1.0) * W - 1.0) / 2.0
        sy = ((gy + 1.0) * H - 1.0) / 2.0

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    wx = sx - x0
    wy = sy - y0

    batch_idx = jnp.arange(B)[:, None, None]

    def gather(yi, xi):
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        vals = x[batch_idx, yc, xc].astype(jnp.float32)  # (B, Ho, Wo, C)
        if padding_mode == "zeros":
            inside = (
                (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
            ).astype(jnp.float32)[..., None]
            vals = vals * inside
        return vals

    v00 = gather(y0, x0)
    v01 = gather(y0, x0 + 1)
    v10 = gather(y0 + 1, x0)
    v11 = gather(y0 + 1, x0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    out = (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )
    return out.astype(x.dtype)


def flow_warp(x: jnp.ndarray, flow: jnp.ndarray, padding_mode: str = "zeros") -> jnp.ndarray:
    """TOFlow-style warp: x (B, H, W, C), flow (B, H, W, 2) in pixels."""
    B, H, W, _ = x.shape
    # f32 pixel coordinates (bf16 arange is wrong past 256 — see grid_sample)
    grid_x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
    grid_y = jnp.arange(H, dtype=jnp.float32)[None, :, None]
    vx = grid_x + flow[..., 0].astype(jnp.float32)
    vy = grid_y + flow[..., 1].astype(jnp.float32)
    # (size-1) normalization, then align_corners=False sampling — the
    # reference's exact (mismatched) chain, toflow_net.py:133-137
    gx = 2.0 * vx / max(W - 1, 1) - 1.0
    gy = 2.0 * vy / max(H - 1, 1) - 1.0
    return grid_sample(x, jnp.stack([gx, gy], axis=-1), padding_mode, align_corners=False)


def stn_warp(
    x: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, padding_mode: str = "border"
) -> jnp.ndarray:
    """FRVSR STN warp: x (B, H, W, C); u, v (B, H, W) normalized-ish flow added
    to a linspace(-1, 1) mesh (reference ``frvsr_net.py:209-226``)."""
    B, H, W, _ = x.shape
    # f32 mesh: bf16 collapses adjacent linspace values at these sizes
    mesh_x = jnp.linspace(-1.0, 1.0, W, dtype=jnp.float32)[None, None, :]
    mesh_y = jnp.linspace(-1.0, 1.0, H, dtype=jnp.float32)[None, :, None]
    gx = mesh_x + u.astype(jnp.float32)
    gy = mesh_y + v.astype(jnp.float32)
    return grid_sample(x, jnp.stack([gx, gy], axis=-1), padding_mode, align_corners=False)
