"""Fixed-shape tiled spatial inference (serving; no reference counterpart).

Motivation (TPU/XLA): every jitted program is compiled per argument shape.
Heterogeneous patient frame sizes (DSB15 external eval especially) therefore
cost one multi-minute flagship compile EACH, and very large frames can
exceed one chip's HBM.  ``t_bucket`` solves this for the time axis; this
module solves it for the spatial axes: the network forward runs on
fixed-size overlapping windows, so ANY (H, W) serves through ONE compiled
executable with HBM bounded by the tile size — and the per-tile executable
composes with the persistent AOT cache (``utils/aot.py``: one signature to
store).

Exactness contract (the reason this is a *windowing plan*, not naive
chunking): every network in the zoo is fully convolutional in space —
convs, pools, PixelShuffle, dynamic local filters, windowed/gathered warps
with bounded displacement — so the SR value at an output pixel depends only
on input pixels within the net's spatial receptive field.  Windows are
CLAMPED to lie inside the image (never padded, except images smaller than
the tile), and each window only *owns* output pixels at least ``overlap``
input-pixels away from its window edges — unless that edge is the true
image edge, where the window sees exactly what the untiled net sees.
Hence: **overlap >= the net's receptive-field radius  =>  tiled == untiled**
(to reduction-order ulps; asserted in tests/test_tiling.py on EDSR and toy
conv nets).  For recurrent nets (RefineNet/FRVSR/DRF) the spatial receptive
field grows with sequence length — with warm-up margins U=6 and 3 conv
layers per direction the radius is ~tens of pixels, so tiling is
*approximate* at practical overlaps; the deviation is border-localized and
measured in the tests.  Pick ``overlap`` per family accordingly (see
docs/TPU_EXTENSIONS.md).

One more exactness caveat: ops whose coordinate mapping depends on the
TOTAL frame size are not translation-covariant, so no overlap makes them
exact under tiling.  In this zoo that is the ``align_corners=True`` resize
convention (scale = (size-1)/(size*r-1)): the Bicubic net and TOFlow's
bicubic pre-upscale.  Measured deviation is ~0.01 dB at toy shapes
(tests); the half-pixel (cv2) convention and everything made of convs are
translation-covariant and unaffected.

Plan construction (``plan_1d``): n = ceil((size - 2*overlap) / core) windows
(core = tile - 2*overlap) with starts evenly spaced over [0, size - tile];
consecutive starts differ by at most ``core`` (proof sketch: the real
spacing (size - tile)/(n-1) <= core by the choice of n, and linspace
rounding preserves that bound), so the ownership boundary
b_i = start_{i+1} + overlap always lies in the valid band
[start_{i+1} + overlap, start_i + tile - overlap] — every owned pixel has
the full halo on both sides except at the image edges.
"""
from __future__ import annotations

import math

import numpy as np

__all__ = ["plan_1d", "tiled_apply"]


def plan_1d(size: int, tile: int, overlap: int) -> list[tuple[int, int, int]]:
    """Window plan for one axis: a list of ``(start, abs_lo, abs_hi)`` where
    ``[abs_lo, abs_hi)`` is the span of output positions (in input-pixel
    coordinates) owned by the window ``[start, start + tile)``.

    Spans partition ``[0, size)``; each is >= ``overlap`` away from its
    window's edges except where the window edge is the image edge.
    Requires ``size >= tile`` (callers pad smaller images — see
    ``tiled_apply``) and ``tile > 2 * overlap``.
    """
    size, tile, overlap = int(size), int(tile), int(overlap)
    core = tile - 2 * overlap
    if core <= 0:
        raise ValueError(
            f"tile ({tile}) must exceed 2*overlap ({2 * overlap})"
        )
    if overlap < 0:
        raise ValueError(f"overlap must be >= 0, got {overlap}")
    if size < tile:
        raise ValueError(f"size ({size}) smaller than tile ({tile})")
    if size == tile:
        return [(0, 0, size)]
    n = max(2, math.ceil((size - 2 * overlap) / core))
    starts = np.round(np.linspace(0, size - tile, n)).astype(int)
    starts = sorted(set(int(s) for s in starts))  # drop rounding duplicates
    bounds = []
    lo = 0
    for i, start in enumerate(starts):
        if i + 1 < len(starts):
            hi = starts[i + 1] + overlap
            # the invariant the exactness proof rests on — never trust it
            # silently (linspace rounding bounds are easy to get wrong), and
            # never strip it (`python -O` removes asserts)
            if (lo < start + overlap and start != 0) or hi > start + tile - overlap:
                raise RuntimeError(
                    f"plan_1d internal error: window {i} at {start} owns "
                    f"[{lo}, {hi}) without a full {overlap}-px halo "
                    f"(size={size}, tile={tile})"
                )
        else:
            hi = size
        bounds.append((start, lo, hi))
        lo = hi
    return bounds


def _is_spatial(arr: np.ndarray) -> bool:
    """Image/video batch arrays: (B, H, W, C) or (B, T, H, W, C) — the
    channels-last contract shared with ``parallel.mesh.shard_batch``.
    Rank-<4 arrays (positional codes (B, T, 1), scalars) pass through whole.
    """
    return arr.ndim >= 4


def _pad_to_tile(arr: np.ndarray, tile_hw) -> np.ndarray:
    """Edge-extend (bottom/right) images smaller than the tile — the one
    case windows cannot clamp into.  Approximate within a receptive field
    of the padded border (same tradeoff as ``pad_h``); callers crop the
    output back to the true size."""
    th, tw = tile_hw
    pads = [(0, 0)] * arr.ndim
    pads[arr.ndim - 3] = (0, max(0, th - arr.shape[-3]))
    pads[arr.ndim - 2] = (0, max(0, tw - arr.shape[-2]))
    if not any(p[1] for p in pads):
        return arr
    return np.pad(arr, pads, mode="edge")


def _device_crop(win, f_h: int, s_h: int, f_w: int, s_w: int):
    """``win[..., f_h:f_h+s_h, f_w:f_w+s_w, :]`` without a host round-trip.

    jax arrays: ``lax.dynamic_slice`` with static SIZES and dynamic starts —
    XLA caches one executable per (input shape/dtype, sizes) and takes the
    starts as runtime scalars, so every window of a serving plan (and every
    plan sharing the box size) reuses a single tiny slice program instead of
    compiling one slice per static offset.  numpy arrays (un-jitted
    ``tile_fn``): a plain host view.
    """
    nd = win.ndim
    try:
        import jax

        is_jax = isinstance(win, jax.Array)
    except ImportError:
        is_jax = False
    if not is_jax:
        ix = [slice(None)] * nd
        ix[nd - 3] = slice(f_h, f_h + s_h)
        ix[nd - 2] = slice(f_w, f_w + s_w)
        return win[tuple(ix)]
    starts = [np.int32(0)] * nd
    starts[nd - 3], starts[nd - 2] = np.int32(f_h), np.int32(f_w)
    sizes = list(win.shape)
    sizes[nd - 3], sizes[nd - 2] = s_h, s_w
    return jax.lax.dynamic_slice(win, starts, sizes)


def tiled_apply(
    tile_fn, inputs, tile_hw, overlap: int, seam_stats: bool = False,
    probe_fn=None,
):
    """Run ``tile_fn`` (device fn: full-batch network forward returning ONE
    HR array) over fixed-shape spatial windows of ``inputs`` and stitch the
    owned output cores back together on the host.

    - ``inputs``: the model's positional args (host arrays).  Args with
      ndim >= 4 are windowed on axes (-3, -2) — all such args must share
      one (H, W); lower-rank args pass through unchanged.
    - ``tile_hw``: (th, tw) window size in INPUT pixels; every call to
      ``tile_fn`` sees exactly this spatial shape, so a jitted ``tile_fn``
      compiles once for any input size.
    - ``overlap``: halo width in input pixels (see module docstring for the
      exactness condition).
    - ``seam_stats``: also MEASURE the tiling approximation on this run.
      Adjacent windows' fully-valid bands only *touch* at the ownership
      boundary (plan spacing == core), so no pixel is predicted validly
      twice by the plan itself; instead, up to two extra PROBE windows per
      axis are dispatched, each centered on a (middle-most) ownership
      boundary, and the probe's valid core — rows/cols >= ``overlap`` from
      its own edges, which straddle the seam — is compared against the
      stitched output.  Zero when ``overlap`` >= the receptive-field radius
      (both predictions are exact there); nonzero disagreement is the per-run
      seam-error measurement the offline "<0.5 dB border-localized"
      characterization can't give.  Probes reuse the one compiled tile
      executable (same window shape) and pipeline with the main windows;
      returns ``(out, {"n_probes", "rms", "max_abs"})`` in ``tile_fn``-output
      units, or stats=None when the plan has a single window (no seams).
    - ``probe_fn``: the function to run the PROBE windows through (defaults
      to ``tile_fn``).  Callers whose ``tile_fn`` accumulates per-window
      side state (e.g. the predictors' exceedance-telemetry fold) pass a
      variant without the accumulation here, so probe windows — which
      re-cover regions the main plan already predicted — don't double-count
      their samples into per-item statistics.

    The upscale factor is inferred per axis from the first window's output
    (must divide exactly).  All windows are dispatched before the first
    fetch, so device execution pipelines across windows.  Returns the
    assembled host array.
    """
    th, tw = int(tile_hw[0]), int(tile_hw[1])
    arrays = [np.asarray(a) for a in inputs]
    spatial = [i for i, a in enumerate(arrays) if _is_spatial(a)]
    if not spatial:
        raise ValueError("tiled_apply: no image-like (ndim>=4) input to tile")
    h, w = arrays[spatial[0]].shape[-3:-1]
    for i in spatial[1:]:
        if arrays[i].shape[-3:-1] != (h, w):
            raise ValueError(
                "tiled_apply: all image-like inputs must share one (H, W); "
                f"got {arrays[i].shape[-3:-1]} vs {(h, w)}"
            )
    true_hw = (h, w)
    if h < th or w < tw:
        arrays = [
            _pad_to_tile(a, (th, tw)) if i in spatial else a
            for i, a in enumerate(arrays)
        ]
        h, w = arrays[spatial[0]].shape[-3:-1]

    plan_h = plan_1d(h, th, overlap)
    plan_w = plan_1d(w, tw, overlap)
    plan = [(ph, pw) for ph in plan_h for pw in plan_w]

    def _window_args(hs: int, ws: int):
        return [
            a[..., hs:hs + th, ws:ws + tw, :] if i in spatial else a
            for i, a in enumerate(arrays)
        ]

    outs = []
    for (hs, _, _), (ws, _, _) in plan:
        outs.append(tile_fn(*_window_args(hs, ws)))  # dispatch only; fetch below

    # seam probes: one extra window per sampled ownership boundary, centered
    # on it (clamped inside the image), at the middle-most cross-axis window
    # position.  Dispatched here so they pipeline with the main windows.
    probe_plan: list[tuple[int, int]] = []
    if seam_stats:
        h_starts = [p[0] for p in plan_h]
        w_starts = [p[0] for p in plan_w]

        def _mid(items, cap=2):
            # the `cap` middle-most entries (the deepest-interior seams)
            order = sorted(
                range(len(items)), key=lambda i: abs(i - (len(items) - 1) / 2)
            )
            return [items[i] for i in sorted(order[:cap])]

        hs_mid = h_starts[len(h_starts) // 2]
        ws_mid = w_starts[len(w_starts) // 2]
        for b in _mid([s + overlap for s in h_starts[1:]]):
            probe_plan.append((int(np.clip(b - th // 2, 0, h - th)), ws_mid))
        for b in _mid([s + overlap for s in w_starts[1:]]):
            probe_plan.append((hs_mid, int(np.clip(b - tw // 2, 0, w - tw))))
        probe_plan = sorted(set(probe_plan))
    _probe = probe_fn if probe_fn is not None else tile_fn
    probe_outs = [_probe(*_window_args(phs, pws)) for phs, pws in probe_plan]

    first = outs[0]  # shape/dtype are known without a device fetch
    oth, otw = first.shape[-3], first.shape[-2]
    if oth % th or otw % tw:
        raise ValueError(
            f"tiled_apply: window output spatial {oth}x{otw} is not an "
            f"integer multiple of the tile {th}x{tw}"
        )
    rh, rw = oth // th, otw // tw

    # crop each probe to its valid core on device before fetching (same
    # halo-discard bandwidth argument as the main windows below)
    probe_outs = [
        _device_crop(
            po,
            overlap * rh,
            (th - 2 * overlap) * rh,
            overlap * rw,
            (tw - 2 * overlap) * rw,
        )
        for po in probe_outs
    ]
    # Crop every window to (a fixed-size box around) its owned core ON DEVICE
    # before fetching: the stitch never reads the halo pixels, and on
    # remote/tunneled backends the device->host copy of the duplicated halos
    # dominates the tiled path (measured 2.56x the frame's bytes at
    # tile 64 / frame 80).  A dynamic-start static-SIZE slice keeps it to one
    # tiny slice executable per box size (starts are runtime args to XLA);
    # the box is the per-axis max owned span, clamped inside the window, and
    # the exact core is cut from the fetched box on the host.
    crop = _device_crop if len(plan) > 1 else None
    if crop is not None:
        s_h = max(p[2] - p[1] for p in plan_h)
        s_w = max(p[2] - p[1] for p in plan_w)
        boxes, cropped = [], []
        for ((hs, h_lo, h_hi), (ws, w_lo, w_hi)), win in zip(plan, outs):
            f_h = min(h_lo - hs, th - s_h)
            f_w = min(w_lo - ws, tw - s_w)
            cropped.append(crop(win, f_h * rh, s_h * rh, f_w * rw, s_w * rw))
            boxes.append(((h_lo - hs - f_h) * rh, (w_lo - ws - f_w) * rw))
        outs = cropped
    out_shape = first.shape[:-3] + (h * rh, w * rw, first.shape[-1])
    out = np.empty(out_shape, first.dtype)
    for k, (((hs, h_lo, h_hi), (ws, w_lo, w_hi)), win) in enumerate(zip(plan, outs)):
        win = np.asarray(win)
        oy, ox = boxes[k] if crop is not None else ((h_lo - hs) * rh, (w_lo - ws) * rw)
        out[..., h_lo * rh:h_hi * rh, w_lo * rw:w_hi * rw, :] = win[
            ...,
            oy:oy + (h_hi - h_lo) * rh,
            ox:ox + (w_hi - w_lo) * rw,
            :,
        ]
    seam = None
    if probe_plan:
        # probe valid core vs the stitched output over the SAME positions
        # (all owned, hence valid in the exact regime; the probe straddles
        # the seam the stitch committed to).  Host compare — the probes were
        # device-cropped above, so the extra fetch is the small cores only.
        # float32 before subtracting: outputs may be uint8 (serve denorm).
        sq, n, mx = 0.0, 0, 0.0
        for (phs, pws), po in zip(probe_plan, probe_outs):
            pa = np.asarray(po).astype(np.float32)
            region = out[
                ...,
                (phs + overlap) * rh:(phs + th - overlap) * rh,
                (pws + overlap) * rw:(pws + tw - overlap) * rw,
                :,
            ].astype(np.float32)
            d = pa - region
            sq += float(np.sum(d * d))
            n += d.size
            mx = max(mx, float(np.max(np.abs(d))))
        seam = {
            "n_probes": len(probe_plan),
            "rms": float(np.sqrt(sq / max(n, 1))),
            "max_abs": mx,
        }
    if true_hw != (h, w):
        out = out[..., : true_hw[0] * rh, : true_hw[1] * rw, :]
    if seam_stats:
        return out, seam
    return out
