"""Cardiac-phase positional encoding CLI (reference ``src/gen_positional_encoding.py``).

Per patient: estimates the cardiac phase by Otsu-mask diff between frame 0 and
frames in [0.25T, 0.6T); end-systole = argmax diff; builds a cosine phase
code — cos(0→π) over systole then cos(π→2π) over diastole, rolled to start —
and writes ``position_code.pkl`` {patient: (T,) float array}.

Usage: python -m <pkg>.tools.gen_positional_encoding DATA_DIR COORDS_PKL OUT_DIR
"""
from __future__ import annotations

import argparse
import logging
import pickle
from pathlib import Path

import numpy as np

from ..utils import nifti

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(message)s", level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)


def phase_code(data: np.ndarray, bbox: tuple[int, int, int, int]) -> np.ndarray:
    """(H, W, 1, T) HR sequence + heart bbox → (T,) cosine phase code
    (reference ``:24-38``)."""
    import cv2

    h0, hn, w0, wn = bbox
    T = data.shape[-1]
    smoothed1 = cv2.GaussianBlur(data[h0:hn, w0:wn, 0, 0].astype(np.uint8), (5, 5), 0)
    _, mask1 = cv2.threshold(smoothed1, 0, 1, cv2.THRESH_BINARY + cv2.THRESH_OTSU)

    diffs = []
    for i in range(int(np.floor(T * 0.25)), int(np.ceil(T * 0.6))):
        smoothed2 = cv2.GaussianBlur(data[h0:hn, w0:wn, 0, i].astype(np.uint8), (5, 5), 0)
        _, mask2 = cv2.threshold(smoothed2, 0, 1, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
        diffs.append(int(np.sum(np.abs(mask1 - mask2))))
    start, end = 0, int(np.argmax(diffs)) + int(np.floor(T * 0.25))

    y1 = np.cos(np.linspace(0, np.pi, end - start, endpoint=False))
    y2 = np.cos(np.linspace(np.pi, 2 * np.pi, T - y1.shape[0], endpoint=False))
    code = np.concatenate((y1, y2))
    return np.concatenate((code[-start:], code[:-start])) if start else code


def main(data_dir: Path, coordinate_path: Path, output_dir: Path):
    patient_dirs = sorted(data_dir.glob("**/HR/*"))
    with open(coordinate_path, "rb") as f:
        coordinates = pickle.load(f)
    pos_codes = {}
    for patient_dir in patient_dirs:
        patient_name = patient_dir.parts[-1]
        logging.info(f"Process {patient_name}.")
        data_paths = sorted(patient_dir.glob("**/*2d+1d*.nii.gz"))
        data = np.asarray(nifti.load(data_paths[0]).get_data(), np.float32)
        pos_codes[patient_name] = phase_code(data, coordinates[patient_name])
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / "position_code.pkl", "wb") as f:
        pickle.dump(pos_codes, f)


def _parse_args():
    parser = argparse.ArgumentParser(description="Positional encoding generation.")
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("coordinate_path", type=Path)
    parser.add_argument("output_dir", type=Path)
    return parser.parse_args()


if __name__ == "__main__":
    args = _parse_args()
    main(args.data_dir, args.coordinate_path, args.output_dir)
