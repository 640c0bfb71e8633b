"""Train-from-scratch convergence on the TPU: flagship vs Bicubic (runbook).

The on-chip, full-size twin of ``tests/test_convergence.py`` and the
synthetic stand-in for the environment-blocked real-ACDC convergence run
(``/root/reference/README.md:33-55``): generate a learnable beating-heart
phantom tree through the REAL offline pipeline (``gen_synthetic_data``),
train the VERBATIM reference flagship train YAML
(``/root/reference/configs/train/refine_net/exp1_x4.yaml`` — batch 16,
32x32 RandomCropPatch, Adam 1e-4, stage-discounted loss; only paths +
``num_epochs`` substituted, the documented duration-only override) on its
train split, then evaluate BOTH the trained flagship (its verbatim test
YAML) and the Bicubic baseline config on the held-out test split.

Prints ONE JSON line: {"train_wall_sec", "epochs", "monitor_best",
"train_losses", "valid_losses", "flagship", "bicubic", "delta_psnr_db"}.

Usage (repo root, real chip attached)::

    python -m efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools.convergence_tpu \
        [--epochs 40] [--size 144] [--workdir DIR]

Results are recorded in docs/FIDELITY.md ("Convergence on the synthetic
phantom").
"""
from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[2]
REF = Path("/root/reference/configs")


def _patch_paths(cfg, tree, out_dir, loaded_path=None):
    """Substitute only path-valued fields (the verbatim_train_tpu contract)."""
    cfg.main.saved_dir = str(out_dir)
    cfg.dataset.kwargs.data_dir = str(
        tree["imgs_dir"] if "imgs" in cfg.dataset.kwargs.data_dir else tree["videos_dir"]
    )
    if "pos_code_path" in cfg.dataset.kwargs:
        cfg.dataset.kwargs.pos_code_path = str(tree["pos_code_path"])
    for metric in cfg.get("metrics", []):
        if "coordinates_path" in metric.get("kwargs", {}):
            metric.kwargs.coordinates_path = str(tree["coordinates_path"])
    # predictors carry their own saved_dir kwarg (the reference test schema)
    if "predictor" in cfg and "saved_dir" in cfg.predictor.get("kwargs", {}):
        cfg.predictor.kwargs.saved_dir = str(out_dir)
    if loaded_path is not None:
        cfg.main.loaded_path = str(loaded_path)
    return cfg


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--size", type=int, default=144,
                    help="HR size (multiple of 12, >=132 so the verbatim "
                         "32x32 LR crop fits at x4)")
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--device", default=None,
                    help="override trainer/predictor device (e.g. cpu)")
    args = ap.parse_args(argv)

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
        load_config,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
        test_from_config,
        train_from_config,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        gen_synthetic_data,
    )

    work = Path(args.workdir or tempfile.mkdtemp(prefix="evsr_convergence_"))
    tree = gen_synthetic_data.main(
        work / "phantom", patients_train=4, patients_test=2,
        size=args.size, slices=2, frames=16, factors=(4,), seed=0,
    )

    cfg = load_config(REF / "train/refine_net/exp1_x4.yaml")
    cfg = _patch_paths(cfg, tree, work / "train")
    cfg.trainer.kwargs.num_epochs = args.epochs
    if args.device:
        cfg.trainer.kwargs.device = args.device
    t0 = time.perf_counter()
    trainer = train_from_config(cfg)
    train_wall = time.perf_counter() - t0
    best = trainer.monitor.checkpoints_dir / "model_best.pth"
    hist = getattr(trainer, "history", None) or {}
    losses = lambda split: [
        round(e["Loss"], 6) for e in hist.get(split, ()) if "Loss" in e
    ]

    logs = {}
    for name, yaml_path, loaded in (
        ("bicubic", REPO / "configs/test/bicubic/exp1_x4.yaml", None),
        ("flagship", REF / "test/refine_net/exp1_x4.yaml", best),
    ):
        tcfg = load_config(yaml_path)
        tcfg = _patch_paths(tcfg, tree, work / f"test_{name}", loaded_path=loaded)
        if args.device:
            tcfg.predictor.kwargs.device = args.device
        t0 = time.perf_counter()
        log = dict(test_from_config(tcfg).log)
        log["wall_sec"] = round(time.perf_counter() - t0, 1)
        logs[name] = {k: round(v, 4) for k, v in log.items()}

    print(json.dumps({
        "train_wall_sec": round(train_wall, 1),
        "epochs": args.epochs,
        "size": args.size,
        "monitor_best": float(trainer.monitor.best),
        "train_losses": losses("train"),
        "valid_losses": losses("valid"),
        "flagship": logs["flagship"],
        "bicubic": logs["bicubic"],
        "delta_psnr_db": round(logs["flagship"]["PSNR"] - logs["bicubic"]["PSNR"], 3),
    }))


if __name__ == "__main__":
    main()
