"""Synthetic ACDC-style preprocessed data trees for tests.

Builds the directory layout produced by the reference's offline preprocessing
(``src/acdc_preprocess.py:52-85``): per-slice ``2d+1d`` sequence NIfTIs and
per-frame ``2d`` image NIfTIs under HR / LR/X{f} trees, plus
``position_code.pkl`` and ``coordinates.pkl``.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import nifti


def make_acdc_tree(
    root: Path,
    patients_per_split: int = 2,
    slices: int = 2,
    frames: int = 12,
    hr_size: tuple[int, int] = (48, 48),
    factors: tuple[int, ...] = (4,),
    splits: tuple[str, ...] = ("train", "valid", "test"),
    seed: int = 0,
    frames_per_patient: list[int] | None = None,
) -> dict:
    """Create videos/ + imgs/ trees; returns metadata dict.

    ``frames_per_patient`` (cycled per patient within each split) makes
    patients differ in cycle length like real ACDC — the variable-T case the
    predictors' t_bucket option exists for."""
    rng = np.random.default_rng(seed)
    root = Path(root)
    H, W = hr_size
    pos_codes, coords = {}, {}
    pid = 0
    for split in splits:
        for p_idx in range(patients_per_split):
            pid += 1
            patient = f"patient{pid:03d}"
            # do NOT rebind the ``frames`` parameter: the returned metadata
            # would reflect whichever patient was generated last
            n_frames = (
                frames_per_patient[p_idx % len(frames_per_patient)]
                if frames_per_patient
                else frames
            )
            # smooth-ish random video in [0, 255]
            base = rng.uniform(40, 200, size=(H, W, 1, 1)).astype(np.float32)
            wave = 40 * np.sin(np.linspace(0, 2 * np.pi, n_frames, endpoint=False)).astype(np.float32)
            for s in range(1, slices + 1):
                hr = np.clip(
                    base
                    + wave[None, None, None, :]
                    + rng.normal(0, 10, size=(H, W, 1, n_frames)).astype(np.float32),
                    0,
                    255,
                ).round()
                name = f"{patient}_2d+1d_sequence{s:0>2d}.nii.gz"
                nifti.save(hr, root / "videos" / split / "HR" / patient / name)
                for f in factors:
                    lr = hr[::f, ::f]  # cheap stand-in degradation for tests
                    nifti.save(lr, root / "videos" / split / "LR" / f"X{f}" / patient / name)
                for t in range(n_frames):
                    img_name = f"{patient}_2d_slice{s:0>2d}_frame{t+1:0>2d}.nii.gz"
                    nifti.save(hr[..., t], root / "imgs" / split / "HR" / patient / img_name)
                    for f in factors:
                        nifti.save(
                            hr[::f, ::f, :, t],
                            root / "imgs" / split / "LR" / f"X{f}" / patient / img_name,
                        )
            # cosine phase code, rolled like gen_positional_encoding.py:35-38
            end = max(2, int(n_frames * 0.4))
            y1 = np.cos(np.linspace(0, np.pi, end, endpoint=False))
            y2 = np.cos(np.linspace(np.pi, 2 * np.pi, n_frames - end, endpoint=False))
            pos_codes[patient] = np.concatenate([y1, y2]).astype(np.float32)
            coords[patient] = (H // 4, 3 * H // 4, W // 4, 3 * W // 4)

    with open(root / "position_code.pkl", "wb") as f:
        pickle.dump(pos_codes, f)
    with open(root / "coordinates.pkl", "wb") as f:
        pickle.dump(coords, f)
    return {
        "videos_dir": root / "videos",
        "imgs_dir": root / "imgs",
        "pos_code_path": root / "position_code.pkl",
        "coordinates_path": root / "coordinates.pkl",
        "frames": frames,
        "hr_size": hr_size,
        "patients": sorted(pos_codes),
    }
