"""Train-from-scratch convergence on the TPU: any family vs Bicubic (runbook).

The on-chip, full-size twin of ``tests/test_convergence.py`` and the
synthetic stand-in for the environment-blocked real-ACDC convergence run
(``/root/reference/README.md:33-55``): generate a learnable beating-heart
phantom tree through the REAL offline pipeline (``gen_synthetic_data``),
train a VERBATIM reference train YAML
(``/root/reference/configs/train/<family>/exp1_x4.yaml`` — native batch,
augments, optimizer, losses; only paths + ``num_epochs`` substituted, the
documented duration-only override; ``--grad-accum`` for the graphs that
exceed the chip's HBM / remote-compile helper, same as the verbatim sweep),
then evaluate BOTH the trained net (its verbatim test YAML) and the Bicubic
baseline config on the held-out test split.  PSNR protocols are comparable
across SISR/MISR/VSR: each averages the per-frame PSNR over all frames of
the test patients.

Prints ONE JSON line: {"train_yaml", "train_wall_sec", "epochs",
"monitor_best", "train_losses", "valid_losses", "trained", "bicubic",
"delta_psnr_db"}.

Usage (repo root, real chip attached)::

    python -m efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools.convergence_tpu \
        [refine_net/exp1_x4] [--epochs 40] [--size 144] [--workdir DIR] \
        [--grad-accum N]

A shared ``--workdir`` reuses its phantom tree across family runs (the
generation is deterministic), so a sweep is::

    for f in refine_net edsr_net duf_net toflow_net frvsr_net rbp_net edvr_net srfb_net; do
        python -m ....tools.convergence_tpu $f/exp1_x4 --workdir /tmp/conv >> CONVERGENCE.jsonl
    done

Results are recorded in docs/FIDELITY.md ("Convergence on the synthetic
phantom").
"""
from __future__ import annotations

import argparse
import json
import tempfile
import time
from pathlib import Path

from ._verbatim import patch_paths_only as _patch_paths

REPO = Path(__file__).resolve().parents[2]
REF = Path("/root/reference/configs")


def _phantom_tree(work: Path, size: int) -> dict:
    """Generate (or reuse — deterministic) the phantom tree under ``work``."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        gen_synthetic_data,
    )

    root = work / "phantom"
    pre, crop = root / "preprocessed", root / "cropped"
    if (pre / "position_code.pkl").exists():
        return {
            "raw_dir": root / "raw",
            "videos_dir": pre / "videos",
            "imgs_dir": pre / "imgs",
            "coordinates_path": crop / "coordinates.pkl",
            "pos_code_path": pre / "position_code.pkl",
        }
    return gen_synthetic_data.main(
        root, patients_train=4, patients_test=2,
        size=size, slices=2, frames=16, factors=(4,), seed=0,
    )


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("train_yaml", nargs="?", default="refine_net/exp1_x4",
                    help="reference train YAML rel path, e.g. edsr_net/exp1_x4")
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--size", type=int, default=144,
                    help="HR size (multiple of 12, >=132 so the verbatim "
                         "32x32 LR crop fits at x4)")
    ap.add_argument("--workdir", default=None,
                    help="shared across runs: the phantom tree is reused")
    ap.add_argument("--grad-accum", type=int, default=0,
                    help="grad_accum_steps (0 = native batch) — the documented "
                         "execution-only substitution for rbp/edvr x4")
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

    work = Path(args.workdir or tempfile.mkdtemp(prefix="evsr_convergence_"))
    tree = _phantom_tree(work, args.size)
    family = args.train_yaml.replace("/", "_")

    cfg = load_config(REF / f"train/{args.train_yaml}.yaml")
    cfg = _patch_paths(cfg, tree, work / f"train_{family}")
    cfg.trainer.kwargs.num_epochs = args.epochs
    if args.grad_accum:
        cfg.trainer.kwargs.grad_accum_steps = args.grad_accum
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
        ("trained", REF / f"test/{args.train_yaml}.yaml", best),
    ):
        tcfg = load_config(yaml_path)
        tcfg = _patch_paths(tcfg, tree, work / f"test_{family}_{name}", loaded_path=loaded)
        if name == "trained":
            # Evaluate the net we TRAINED: overlay the train YAML's net
            # kwargs, KEEPING test-only keys.  duf's test YAML names
            # `_DenseLayer52` (the reference's released checkpoint) while
            # its train YAML ships `_DenseLayer16`
            # (/root/reference/configs/{train,test}/duf_net/exp1_x4.yaml),
            # so a from-scratch convergence eval must load the trained
            # shape; frvsr's test YAML adds `is_prediction: True` (SR-only
            # forward), which must survive the overlay.
            tcfg.net.name = cfg.net.name
            for k, v in cfg.net.get("kwargs", {}).items():
                tcfg.net.kwargs[k] = v
        if args.device:
            tcfg.predictor.kwargs.device = args.device
        t0 = time.perf_counter()
        log = dict(test_from_config(tcfg).log)
        log["wall_sec"] = round(time.perf_counter() - t0, 1)
        logs[name] = {k: round(v, 4) for k, v in log.items()}

    print(json.dumps({
        "train_yaml": args.train_yaml,
        "train_wall_sec": round(train_wall, 1),
        "epochs": args.epochs,
        "size": args.size,
        "grad_accum_steps": args.grad_accum or None,
        "monitor_best": float(trainer.monitor.best),
        "train_losses": losses("train"),
        "valid_losses": losses("valid"),
        "trained": logs["trained"],
        "bicubic": logs["bicubic"],
        "delta_psnr_db": round(logs["trained"]["PSNR"] - logs["bicubic"]["PSNR"], 3),
    }))


if __name__ == "__main__":
    main()
