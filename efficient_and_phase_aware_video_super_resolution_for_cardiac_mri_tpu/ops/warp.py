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
mask out-of-bounds taps for zeros padding.

Measured on-chip (perf_probe --probes warp, round 3): the bilinear GATHER
runs ~16x slower than a dense 3x3 conv over the same tensor — the same
XLA/TPU dynamic-gather bound the DCN hit (PERF_NOTES 'Deformable conv').
Both warps therefore also ship the gather-free windowed shift-and-weight
path (``max_flow=R``): the sample is a sum over a static displacement window
of statically-shifted maps (pad+slice) times closed-form corner weights —
EXACT whenever the pixel flow magnitude is <= R on both axes (the window is
widened internally, typically to R+1, to absorb each caller's coordinate-
chain rescale/shift; out-of-window samples contribute zero), opt-in per net
(``TOFlowNet(max_flow=...)``, ``FRVSRNet(max_flow=...)``) to preserve
unbounded reference semantics by default.
"""
from __future__ import annotations

import numpy as np

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


def _ceil_div(num: int, den: int) -> int:
    return -(-num // den)


def _corner_weights(o: jnp.ndarray, d: int) -> jnp.ndarray:
    """(1−frac)·[d==floor(o)] + frac·[d==floor(o)+1]: nonzero exactly at the
    two bilinear corners; gradients flow through frac only — the bilinear
    derivative (same construction as ops/deform_conv.py)."""
    fl = jnp.floor(o)
    frac = o - fl
    return jnp.where(d == fl, 1.0 - frac, 0.0) + jnp.where(d == fl + 1, frac, 0.0)


def windowed_sample(
    x: jnp.ndarray,
    off_y: jnp.ndarray,
    off_x: jnp.ndarray,
    max_flow: int,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Gather-free bilinear sample at (pixel + offset) displacements.

    x (B, H, W, C); off_y/off_x (B, H, W) pixel displacements from the output
    pixel.  Sum over the static window d ∈ [−R, R]² of statically-shifted
    maps (one pad + slices — pure shifts, no gather) times the closed-form
    corner weights.  EQUALS the gather bilinear whenever |off| <= R on both
    axes (the corner floor(o)+1 exceeds R only with zero weight).  Documented
    divergence for |off| > R, mirroring ``deform_conv2d_windowed``'s
    contract: 'zeros' mode drops the sample to zero; 'border' mode CLAMPS
    the displacement to the window (a saturated warp — never a hole), which
    also equals the gather exactly when the clamped position lands outside
    the image (both read the border pixel).
    """
    B, H, W, C = x.shape
    R = int(max_flow)
    oy = off_y.astype(jnp.float32)
    ox = off_x.astype(jnp.float32)
    if padding_mode == "border":
        oy = jnp.clip(oy, -R, R)
        ox = jnp.clip(ox, -R, R)
    # 'zeros': zero padding makes out-of-image corners contribute 0, exactly
    # like the gather path's per-corner masks; 'border': edge padding equals
    # the clamped read for shifts within R
    mode = "edge" if padding_mode == "border" else "constant"
    xp = jnp.pad(x, ((0, 0), (R, R), (R, R), (0, 0)), mode=mode)
    acc = None
    for dy in range(-R, R + 1):
        wy = _corner_weights(oy, dy)
        row = xp[:, R + dy : R + dy + H]
        for dx in range(-R, R + 1):
            wgt = (wy * _corner_weights(ox, dx)).astype(x.dtype)[..., None]
            term = row[:, :, R + dx : R + dx + W] * wgt
            acc = term if acc is None else acc + term
    return acc


def flow_warp(
    x: jnp.ndarray,
    flow: jnp.ndarray,
    padding_mode: str = "zeros",
    max_flow: int | None = None,
) -> jnp.ndarray:
    """TOFlow-style warp: x (B, H, W, C), flow (B, H, W, 2) in pixels.

    ``max_flow=R`` switches to the windowed gather-free path, exact while
    |flow| <= R px on both axes.  The reference's quirky (size−1)-normalize /
    align_corners=False-sample chain scales the flow by size/(size−1) and
    shifts it by a position-dependent up-to-half pixel — reproduced in both
    paths; the window is widened internally (typically to R+1) so that quirk
    chain cannot push an in-bound flow out of the window.
    """
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
    if max_flow is not None:
        # unnormalize with the align_corners=False rule, as grid_sample would
        sx = ((gx + 1.0) * W - 1.0) / 2.0
        sy = ((gy + 1.0) * H - 1.0) / 2.0
        # the mismatched chain above makes the EFFECTIVE sampling displacement
        # flow·size/(size−1) + pos/(size−1) − 0.5, which exceeds |flow| by up
        # to flow/(size−1) + 0.5 px near the right/bottom edge — widen the
        # static window (exact integer ceil; typically max_flow + 1) so
        # 'exact while |flow| <= max_flow' holds at EVERY pixel, not just
        # where the position shift is favorable
        win = max(
            _ceil_div(2 * max_flow * W + W - 1, 2 * W - 2) if W > 1 else max_flow,
            _ceil_div(2 * max_flow * H + H - 1, 2 * H - 2) if H > 1 else max_flow,
        )
        return windowed_sample(x, sy - grid_y, sx - grid_x, win, padding_mode)
    return grid_sample(x, jnp.stack([gx, gy], axis=-1), padding_mode, align_corners=False)


def stn_warp(
    x: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    padding_mode: str = "border",
    max_flow: int | None = None,
) -> jnp.ndarray:
    """FRVSR STN warp: x (B, H, W, C); u, v (B, H, W) normalized-ish flow added
    to a linspace(-1, 1) mesh (reference ``frvsr_net.py:209-226``).

    ``max_flow=R`` switches to the windowed gather-free path, exact while
    the pixel flow (normalized flow · size/2) stays within R: the window is
    widened internally by one to absorb the linspace-vs-align_corners mesh
    offset (a position-dependent shift in (−0.5, +0.5])."""
    B, H, W, _ = x.shape
    # f32 mesh: bf16 collapses adjacent linspace values at these sizes.
    # Host-built f64 linspace cast to f32 matches the reference's rounding
    # bit-for-bit (np.linspace f64 mesh → torch.tensor(dtype=float32),
    # frvsr_net.py:211-212); jnp.linspace's native-f32 evaluation is 1 ulp
    # off, which the recurrent warp amplifies over training steps
    # (tests/test_train_dynamics_parity.py FRVSR drift measurements).
    mesh_x = jnp.asarray(np.linspace(-1.0, 1.0, W), jnp.float32)[None, None, :]
    mesh_y = jnp.asarray(np.linspace(-1.0, 1.0, H), jnp.float32)[None, :, None]
    gx = mesh_x + u.astype(jnp.float32)
    gy = mesh_y + v.astype(jnp.float32)
    if max_flow is not None:
        sx = ((gx + 1.0) * W - 1.0) / 2.0
        sy = ((gy + 1.0) * H - 1.0) / 2.0
        grid_x = jnp.arange(W, dtype=jnp.float32)[None, None, :]
        grid_y = jnp.arange(H, dtype=jnp.float32)[None, :, None]
        # effective displacement = pixel flow + pos/(size−1) − 0.5: the mesh
        # offset adds up to ±0.5 px, so widen the window by one for the
        # user bound (|pixel flow| <= max_flow) to be the exact one
        return windowed_sample(x, sy - grid_y, sx - grid_x, max_flow + 1, padding_mode)
    return grid_sample(x, jnp.stack([gx, gy], axis=-1), padding_mode, align_corners=False)
