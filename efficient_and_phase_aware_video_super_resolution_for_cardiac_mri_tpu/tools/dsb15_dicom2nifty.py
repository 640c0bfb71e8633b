"""DSB15 DICOM → NIfTI CLI (reference ``src/dsb15_dicom2nifty.py``).

Walks the train/validate/test patient dirs, finds ``*/sax*`` series and shells
out to ``dcm2niix`` per series ('validate' is mapped to 'valid').  The
``dcm2niix`` binary is an external dependency exactly as in the reference
(pinned in its env.yml).

Usage: python -m <pkg>.tools.dsb15_dicom2nifty DATA_DIR OUTPUT_DIR
"""
from __future__ import annotations

import argparse
import logging
import shutil
import subprocess
from pathlib import Path

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(message)s", level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)


def main(data_dir: Path, output_dir: Path):
    if shutil.which("dcm2niix") is None:
        raise RuntimeError(
            "dcm2niix not found on PATH — install it to convert DSB15 DICOMs "
            "(same external dependency as the reference)."
        )
    for split in ["train", "validate", "test"]:
        split_dir = data_dir / split
        if not split_dir.is_dir():
            continue
        out_split = "valid" if split == "validate" else split
        for patient_dir in sorted(split_dir.iterdir()):
            if not patient_dir.is_dir():
                continue
            logging.info(f"Process {patient_dir.name}.")
            for series_dir in sorted(patient_dir.glob("*/sax*")):
                out_dir = output_dir / out_split / patient_dir.name / series_dir.name
                out_dir.mkdir(parents=True, exist_ok=True)
                # the reference's exact dcm2niix contract (text notes, no
                # single-file mode, merge 2D slices, BIDS sidecar without
                # anonymization, gzip, name by series description —
                # src/dsb15_dicom2nifty.py:32)
                subprocess.run(
                    [
                        "dcm2niix", "-o", str(out_dir), "-t", "y", "-s", "n",
                        "-m", "y", "-b", "y", "-ba", "n", "-z", "y",
                        "-f", "%d", str(series_dir),
                    ],
                    check=False,
                    capture_output=True,
                )


def _parse_args():
    parser = argparse.ArgumentParser(description="DSB15 DICOM to NIfTI conversion.")
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("output_dir", type=Path)
    return parser.parse_args()


if __name__ == "__main__":
    args = _parse_args()
    main(args.data_dir, args.output_dir)
