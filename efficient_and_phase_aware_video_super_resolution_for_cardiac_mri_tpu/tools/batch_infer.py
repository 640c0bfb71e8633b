"""Mesh-batched full-volume inference (BASELINE config #5: "full-volume
multi-patient ACDC inference batched across a v5e-8 data-parallel mesh").

Groups whole-sequence items by shape (T, H, W), pads each group to a multiple
of the mesh size, and runs the flagship forward with the batch axis sharded
over the ``data`` mesh — every chip processes different patients in the same
jitted call.  Writes per-frame PSNR/SSIM rows and reports frames/sec.

Usage:
    python -m <pkg>.tools.batch_infer CKPT DATA_DIR POS_CODE.pkl OUT.csv \
        [--factor 4] [--split test] [--num-devices N] [--net-kwargs JSON]
"""
from __future__ import annotations

import argparse
import csv
import functools
import json
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

from .. import data as _data  # noqa: F401  (registry)
from ..config import DATASETS
from ..metrics import PSNR, SSIM
from ..models import RefineNet
from ..parallel import make_mesh, pad_height_to_multiple, replicate_tree, shard_batch
from ..runner.checkpoint import load_net_variables
from ..utils.dispatch import DoubleBuffer
from ..utils.stats import denormalize

NET_KWARGS = dict(
    in_channels=1,
    out_channels=1,
    num_features=[64, 64, 64],
    upscale_factor=4,
    num_stages=3,
    update_memory=True,
    num_updated_frames=6,
    refine_window_size=5,
    positional_encoding=True,
)


def group_by_shape(dataset):
    """{shape key: [indices]} so each group batches into one jitted call.

    Stores INDICES only and keys groups by the LR NIfTI HEADER shape (348
    bytes streamed, nothing decoded): the item shape is a deterministic
    function of the header shape for a fixed dataset config, so header
    equality ⇒ item-shape equality.  The old version decoded every item up
    front, holding the whole split's float32 sequences in memory at once."""
    from ..utils import nifti

    groups = defaultdict(list)
    for idx in range(len(dataset)):
        lr_path = dataset.data[idx][0]
        # tag each key with its key space: header-shape tuples (H, W, C, T)
        # and decoded item-shape tuples (T, h, w, 1) must never collide in
        # one group (stacked shapes would differ and np.stack would crash)
        try:
            key = ("header", *nifti.read_header(lr_path)["shape"])
        except Exception:
            key = ("item", *dataset[idx]["lr_imgs"].shape)  # decode fallback
        groups[key].append(idx)
    return groups


def main(argv=None):
    parser = argparse.ArgumentParser(description="Mesh-batched inference.")
    parser.add_argument("checkpoint", type=Path)
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("pos_code_path", type=Path)
    parser.add_argument("out_csv", type=Path)
    parser.add_argument("--factor", type=int, default=4)
    parser.add_argument("--split", default="test")
    parser.add_argument("--num-devices", type=int, default=None)
    parser.add_argument(
        "--spatial-parallel", type=int, default=1,
        help="shard each volume's height axis over this many devices (GSPMD "
        "halo exchange) — scales per-patient latency; data-parallel width "
        "becomes num_devices / spatial_parallel",
    )
    parser.add_argument("--net-kwargs", type=json.loads, default=None)
    parser.add_argument(
        "--pad-h", action="store_true",
        help="edge-extend LR heights to the next multiple of spatial_parallel "
        "so indivisible volumes still shard (SR output cropped back; same "
        "border tradeoff as the predictor's parallel.pad_h)",
    )
    parser.add_argument(
        "--aot-cache", default=None, metavar="DIR",
        help="persist compiled executables to DIR (utils/aot.py) so a serving "
        "restart skips the multi-minute flagship compile",
    )
    parser.add_argument(
        "--tile", type=int, default=None, metavar="T",
        help="run the net forward on fixed TxT LR windows (ops/tiling.py): "
        "every (H, W) in the split then shares ONE net executable (no "
        "per-shape-group flagship recompiles) with HBM bounded by the tile; "
        "requires --tile-overlap; excludes --spatial-parallel/--pad-h",
    )
    parser.add_argument(
        "--tile-overlap", type=int, default=None, metavar="N",
        help="halo width in LR pixels (>= the net's receptive-field radius "
        "for exactness — docs/TPU_EXTENSIONS.md)",
    )
    args = parser.parse_args(argv)
    if args.tile is not None:
        if args.tile_overlap is None:
            parser.error("--tile requires --tile-overlap")
        if args.tile_overlap < 0 or args.tile <= 2 * args.tile_overlap:
            parser.error(f"--tile ({args.tile}) must exceed 2*--tile-overlap "
                         f"({2 * args.tile_overlap}) and the overlap must be "
                         ">= 0")
        if args.spatial_parallel > 1 or args.pad_h:
            parser.error("--tile excludes --spatial-parallel/--pad-h "
                         "(pick one spatial strategy)")

    import jax

    net_kwargs = args.net_kwargs or dict(NET_KWARGS, upscale_factor=args.factor)
    U = net_kwargs["num_updated_frames"]
    mesh = make_mesh(args.num_devices, spatial_parallel=args.spatial_parallel)
    n_dev = mesh.shape["data"]

    dataset = DATASETS.get("AcdcVSRRefineNetDataset")(
        data_dir=args.data_dir,
        type=args.split,
        downscale_factor=args.factor,
        transforms=[
            {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
            {"name": "ToTensor"},
        ],
        pos_code_path=str(args.pos_code_path),
        num_frames=7,
        num_updated_frames=U,
    )

    model = RefineNet(**net_kwargs)
    variables = load_net_variables(args.checkpoint, "RefineNet")
    variables = replicate_tree(mesh, jax.tree.map(np.asarray, variables))

    psnr, ssim = PSNR(size_average=False), SSIM(size_average=False)

    # The whole per-chunk pipeline lives ON DEVICE and returns only two
    # (B·T,) score vectors: fetching the SR volume to score it on host would
    # move factor²·T·H·W floats per chunk (tens of MB) through a ~33 ms/trip
    # link and then run the metrics op-by-op per frame (bench.py's measured
    # latency-vs-pipelined lesson, PERF_NOTES).  true_hr_h is static: one
    # trace per shape GROUP, which the grouping already guarantees.
    def _score_tail(out, hr):
        """denorm + per-frame PSNR/SSIM — the one scoring protocol, shared
        by the whole-frame step and the --tile path's per-shape scorer."""
        out_d = denormalize(out, "acdc")
        hr_d = denormalize(hr, "acdc")
        flat = lambda x: x.reshape((-1,) + x.shape[2:])  # (B,T,H,W,C)->(B·T,...)
        return psnr(flat(out_d), flat(hr_d)), ssim(flat(out_d), flat(hr_d))

    @functools.partial(jax.jit, static_argnums=(4,))
    def forward_scores(v, lr, pos, hr, true_hr_h):
        out = model.apply(v, lr, pos)[-1]
        out = out[..., :true_hr_h, :, :]  # crop pad_h rows (no-op unpadded)
        return _score_tail(out, hr)

    if args.aot_cache:
        from ..utils import aot

        forward_scores = aot.cached_dispatch(
            forward_scores, args.aot_cache, "batch_infer", static_argnums=(4,)
        )

    # --tile: the NET forward runs on fixed-shape windows (one executable for
    # every shape group; the batch axis still shards over the data mesh via
    # shard_batch inside the per-window fn).  The SR volume is assembled on
    # host — inherent to cross-window stitching — so scores run in a second,
    # per-shape jitted fn; those graphs are seconds to compile vs the
    # multi-minute flagship forward the tile makes shape-invariant.
    if args.tile is not None:
        from ..ops.tiling import tiled_apply

        @jax.jit
        def tile_fwd(v, lr, pos):
            return model.apply(v, lr, pos)[-1]

        score_only = jax.jit(_score_tail)

        if args.aot_cache:
            from ..utils import aot

            tile_fwd = aot.cached_dispatch(
                tile_fwd, args.aot_cache, "batch_infer_tile"
            )

        def tiled_scores(variables, lr, pos, hr):
            def window(lr_w, pos_w):
                b = shard_batch(mesh, {"lr": lr_w, "pos": pos_w})
                return tile_fwd(variables, b["lr"], b["pos"])

            out = tiled_apply(
                window, (lr, pos), (args.tile, args.tile), args.tile_overlap
            )
            b = shard_batch(mesh, {"sr_imgs": out, "hr_imgs": hr})
            return score_only(b["sr_imgs"], b["hr_imgs"])

    rows = [["name", "frame", "PSNR", "SSIM"]]
    frames = 0

    def emit(pending):
        """Fetch one dispatched chunk's scores (blocks) and append rows."""
        nonlocal frames
        (psnr_v, ssim_v), chunk, T = pending
        psnr_v, ssim_v = np.asarray(psnr_v), np.asarray(ssim_v)
        for b, idx in enumerate(chunk):
            name = dataset.data[idx][0].parts[-1].split(".")[0]
            for t in range(T):
                rows.append(
                    [f"{name}_frame{t+1:0>2d}", t,
                     float(psnr_v[b * T + t]), float(ssim_v[b * T + t])]
                )
            frames += T

    # Double-buffered dispatch: prep + dispatch chunk k+1 before fetching
    # chunk k's scores, so host decode/stack overlaps device compute.
    pipe = DoubleBuffer(emit)
    t0 = time.perf_counter()
    for shape, indices in sorted(group_by_shape(dataset).items()):
        for start in range(0, len(indices), n_dev):
            chunk = indices[start : start + n_dev]
            items = [dataset[i] for i in chunk]  # one device-chunk in memory
            pad = n_dev - len(items)
            lr = np.stack([it["lr_imgs"] for it in items] + [items[-1]["lr_imgs"]] * pad)
            pos = np.stack([it["pos_code"] for it in items] + [items[-1]["pos_code"]] * pad)
            hr = np.stack([it["hr_imgs"] for it in items] + [items[-1]["hr_imgs"]] * pad)
            true_hr_h = hr.shape[-3]
            if args.tile is not None:
                scores = tiled_scores(variables, lr, pos, hr)
            else:
                if args.pad_h and args.spatial_parallel > 1:
                    lr = pad_height_to_multiple(lr, args.spatial_parallel)
                batch = shard_batch(mesh, {"lr": lr, "pos": pos, "hr": hr})
                scores = forward_scores(
                    variables, batch["lr"], batch["pos"], batch["hr"], true_hr_h
                )
            pipe.push((scores, chunk, hr.shape[1]))
    pipe.drain()
    elapsed = max(time.perf_counter() - t0, 1e-9)

    args.out_csv.parent.mkdir(parents=True, exist_ok=True)
    with open(args.out_csv, "w", newline="") as f:
        csv.writer(f).writerows(rows)
    summary = {
        "devices": n_dev,
        "sequences": len(dataset),
        "frames": frames,
        "frames_per_sec": frames / elapsed,
        "mean_psnr": float(np.mean([float(r[2]) for r in rows[1:]])) if len(rows) > 1 else None,
    }
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    main()
