"""Same-process pipelined-vs-eager predictor A/B (the eval-loop measurement).

The predictors double-buffer their eval loop (``utils/dispatch.DoubleBuffer``:
dispatch item k+1 before fetching item k) so the ~33 ms tunnel fetch overlaps
compute; ``EVSR_EAGER_EVAL=1`` restores the fetch-then-dispatch baseline.
This tool times both modes in ONE process — run-to-run variance through the
tunnel is ±20%, so cross-process comparisons lie — on the flagship RefineNet
at eval shapes over a synthetic ACDC tree (tests/fixtures.py; resolvable
because this is a developer tool of this repo, like parity_check).

    python -m <pkg>.tools.pred_pipeline_ab                  # real TPU
    python -m <pkg>.tools.pred_pipeline_ab --device cpu \
        --frames 8 --hr 48 --feats 8 --margins 2            # CPU smoke
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np


def _fixtures():
    tests_dir = Path(__file__).resolve().parents[2] / "tests"
    if str(tests_dir) not in sys.path:
        sys.path.insert(0, str(tests_dir))
    import fixtures

    return fixtures


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--device", default="cuda:0")
    parser.add_argument("--frames", type=int, default=30)
    parser.add_argument("--hr", type=int, default=256)
    parser.add_argument("--feats", type=int, default=64)
    parser.add_argument("--margins", type=int, default=6)
    parser.add_argument("--rounds", type=int, default=2)
    args = parser.parse_args(argv)

    from ..config import DATASETS
    from ..data.loader import Dataloader
    from ..main import resolve_device
    from .. import losses as L
    from .. import metrics as ME
    from .. import models
    from ..runner.predictors import PREDICTORS

    resolve_device(args.device)

    root = Path(tempfile.mkdtemp(prefix="pred_ab_"))
    tree = _fixtures().make_acdc_tree(
        root / "data", frames=args.frames, hr_size=(args.hr, args.hr),
        patients_per_split=2, slices=2,
    )
    ds = DATASETS.get("AcdcVSRRefineNetDataset")(
        data_dir=str(tree["videos_dir"]), type="test", downscale_factor=4,
        pos_code_path=str(tree["pos_code_path"]),
        transforms=[
            {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
            {"name": "ToTensor"},
        ],
        num_updated_frames=args.margins,
    )
    net = models.RefineNet(
        in_channels=1, out_channels=1, num_features=[args.feats] * 3,
        upscale_factor=4, num_stages=3, update_memory=True,
        num_updated_frames=args.margins, refine_window_size=5,
        positional_encoding=True,
    )
    loader = Dataloader(ds, batch_size=1, shuffle=False, num_workers=0)

    # ONE predictor serves both modes: predict() reads EVSR_EAGER_EVAL at
    # call time, so the eval graph compiles once (a compile is 5-10 min
    # through the tunnel — per-mode predictors would pay it 2x rounds times)
    pred = PREDICTORS.get("AcdcVSRRefineNetPredictor")(
        device=args.device, net=net,
        loss_fns=[L.LOSSES.get("L1Loss")()], loss_weights=[1.0],
        metric_fns=[ME.METRICS.get("PSNR")()],
        saved_dir=str(root / "out"),
        exported=False, test_dataloader=loader,
    )
    batch = {
        k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
        for k, v in ds[0].items()
    }
    pred.init_params_like(batch)

    def run(eager: bool) -> float:
        os.environ["EVSR_EAGER_EVAL"] = "1" if eager else ""
        t0 = time.perf_counter()
        pred.predict()
        return time.perf_counter() - t0

    prev_mode = os.environ.get("EVSR_EAGER_EVAL")
    try:
        run(False)  # warm: compile + first dispatch
        # interleave modes to cancel tunnel drift within the process
        times = {"pipe": [], "eager": []}
        for _ in range(args.rounds):
            times["pipe"].append(run(False))
            times["eager"].append(run(True))
    finally:  # never leak the mode into the calling process's later evals
        if prev_mode is None:
            os.environ.pop("EVSR_EAGER_EVAL", None)
        else:
            os.environ["EVSR_EAGER_EVAL"] = prev_mode
    pipe, eager = float(np.median(times["pipe"])), float(np.median(times["eager"]))
    n_frames = len(ds) * args.frames
    result = {
        "pipelined_sec": round(pipe, 3),
        "eager_sec": round(eager, 3),
        "pipelined_fps": round(n_frames / pipe, 1),
        "eager_fps": round(n_frames / eager, 1),
        "pipeline_speedup": round(eager / pipe, 3),
        "items": len(ds),
        "frames_per_item": args.frames,
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
