"""Run ONE reference train YAML verbatim on the attached TPU chip.

This is the committed runbook behind docs/FIDELITY.md "Verbatim train YAMLs
on TPU": it executes `/root/reference/configs/train/<yaml_rel>.yaml` with the
reference's bytes — component names, kwargs, optimizer, batch size, augments,
monitor, logger — substituting only

* machine paths (data_dir / pos_code_path / coordinates_path / saved_dir),
  pointed at a one-batch synthetic ACDC tree (1 patient x 1 slice x 16
  frames, HR = 32*factor so the verbatim 32x32 RandomCropPatch fits ->
  exactly one verbatim batch step per epoch),
* ``num_epochs`` -> ``--epochs`` (default 2) — the run's duration, not its
  semantics,
* optionally ``grad_accum_steps`` (``--grad-accum``) — exact microbatch
  accumulation (per-item-mean losses => the averaged gradient IS the
  full-batch gradient), for graphs that exceed the chip's HBM or the
  remote-compile helper (the rbp_net/edvr_net x4 cases, FIDELITY.md).

Usage (from the repo root, real chip attached)::

    python -m efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools.verbatim_train_tpu \
        duf_net/exp2_x3

Prints ONE JSON line: {"yaml", "wall_sec", "monitor_best", "train_losses",
"valid_losses", "checkpoints", "grad_accum_steps", "epochs"}.

Sweep mode — the runbook that produced ``VERBATIM_TRAIN_r05.jsonl``::

    python -m ....tools.verbatim_train_tpu --all --out VERBATIM_TRAIN.jsonl

runs EVERY reference train YAML (``configs/train/**`` minus the placeholder
``example_config``) in a fresh subprocess each (one run's device state can't
leak into the next), appends one JSON line per YAML to ``--out``, skips
YAMLs already present there (resumable), and on failure retries once with
``--grad-accum 2`` — the documented execution-only substitution for graphs
that exceed the chip's HBM or the remote-compile helper (rbp/edvr x4 and
rbp x3 in practice).

The gated CPU twin is
``tests/test_reference_configs_run.py::test_reference_train_yaml_runs_verbatim``
(same substitutions; hours per family on the 1-core XLA:CPU box).
Reference contract: /root/reference/configs/train/**.yaml +
/root/reference/src/main.py:24-43 (train path).
"""
from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

from ._verbatim import patch_paths_only as _patch_paths_only

REPO = Path(__file__).resolve().parents[2]


def run_one(yaml_rel: str, epochs: int, grad_accum: int, workdir: str | None) -> dict:
    # the synthetic-tree builder lives with the tests (single source of truth
    # for the ACDC on-disk contract); this is a runbook script, so reuse it
    sys.path.insert(0, str(REPO / "tests"))
    from fixtures import make_acdc_tree

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
        load_config,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
        train_from_config,
    )

    factor = int(yaml_rel.rsplit("_x", 1)[1])
    work = Path(workdir or tempfile.mkdtemp(prefix="evsr_verbatim_"))
    work.mkdir(parents=True, exist_ok=True)
    tree = make_acdc_tree(
        work / "acdc", frames=16, hr_size=(32 * factor, 32 * factor),
        patients_per_split=1, slices=1, factors=(factor,),
    )
    cfg = load_config(f"/root/reference/configs/train/{yaml_rel}.yaml")
    cfg = _patch_paths_only(cfg, tree, work / "out")
    cfg.trainer.kwargs.num_epochs = epochs  # documented duration-only override
    if grad_accum:
        cfg.trainer.kwargs.grad_accum_steps = grad_accum  # documented execution-only

    t0 = time.perf_counter()
    trainer = train_from_config(cfg)
    wall = time.perf_counter() - t0

    import numpy as np

    best = float(trainer.monitor.best)
    assert np.isfinite(best), f"{yaml_rel}: monitor best not finite"
    ckpts = sorted(p.name for p in (work / "out" / "checkpoints").glob("*.pth"))
    assert ckpts, f"{yaml_rel}: monitor must have checkpointed"
    hist = getattr(trainer, "history", None) or {}
    losses = lambda split: [
        round(e["Loss"], 6) for e in hist.get(split, ()) if "Loss" in e
    ]
    return {
        "yaml": yaml_rel,
        "wall_sec": round(wall, 1),
        "monitor_best": best,
        "train_losses": losses("train"),
        "valid_losses": losses("valid"),
        "checkpoints": ckpts,
        "grad_accum_steps": grad_accum or None,
        "epochs": epochs,
    }


def reference_train_yamls() -> list[str]:
    """Every runnable reference train YAML, family/exp order."""
    root = Path("/root/reference/configs/train")
    return sorted(
        f"{p.parent.name}/{p.stem}"
        for p in root.glob("*/*.yaml")
    )


def run_all(out_path: str, epochs: int, timeout_sec: int) -> int:
    """Sweep every reference train YAML in fresh subprocesses, appending one
    JSON evidence line per YAML to ``out_path``; resumable (YAMLs already in
    the file are skipped); native batch first, one ``--grad-accum 2`` retry.
    Returns the number of failures."""
    import subprocess
    import sys

    out = Path(out_path)
    done = set()
    if out.exists():
        for line in out.read_text().splitlines():
            try:
                done.add(json.loads(line)["yaml"])
            except Exception:
                pass
    failures = 0
    for yaml_rel in reference_train_yamls():
        if yaml_rel in done:
            print(f"skip {yaml_rel} (already in {out})", file=sys.stderr)
            continue
        for extra in ([], ["--grad-accum", "2"]):
            cmd = [
                sys.executable, "-m",
                "efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu"
                ".tools.verbatim_train_tpu",
                yaml_rel, "--epochs", str(epochs), *extra,
            ]
            try:
                proc = subprocess.run(
                    cmd, capture_output=True, text=True, timeout=timeout_sec
                )
            except subprocess.TimeoutExpired:
                print(f"TIMEOUT {yaml_rel} {extra}", file=sys.stderr)
                continue
            if proc.returncode == 0 and proc.stdout.strip():
                with out.open("a") as f:
                    f.write(proc.stdout.strip().splitlines()[-1] + "\n")
                print(f"ok {yaml_rel} {extra or '(native batch)'}", file=sys.stderr)
                break
            print(
                f"fail {yaml_rel} {extra}: {proc.stderr.strip().splitlines()[-1:] }",
                file=sys.stderr,
            )
        else:
            failures += 1
    return failures


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("yaml_rel", nargs="?", help="e.g. duf_net/exp2_x3")
    ap.add_argument("--all", action="store_true",
                    help="sweep every reference train YAML (fresh subprocess "
                         "each, resumable via --out, grad-accum-2 retry)")
    ap.add_argument("--out", default="VERBATIM_TRAIN.jsonl",
                    help="evidence file for --all (one JSON line per YAML)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--grad-accum", type=int, default=0,
                    help="grad_accum_steps (0 = native batch)")
    ap.add_argument("--timeout", type=int, default=5400,
                    help="per-run subprocess timeout for --all (seconds)")
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args(argv)
    if args.all:
        raise SystemExit(run_all(args.out, args.epochs, args.timeout))
    if not args.yaml_rel:
        ap.error("yaml_rel is required unless --all is given")
    print(json.dumps(run_one(args.yaml_rel, args.epochs, args.grad_accum, args.workdir)))


if __name__ == "__main__":
    main()
