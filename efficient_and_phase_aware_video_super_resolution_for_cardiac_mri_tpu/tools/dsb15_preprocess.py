"""DSB15 offline preprocessing CLI (reference ``src/dsb15_preprocess.py``).

Same normalize / crop-to-/12 / k-space-degrade / save pipeline as ACDC but
iterates sax-series NIfTIs per patient and skips malformed series
(``data.shape[2] != 1 or ndim != 4 or T < 30`` — reference ``:28-29``).

Usage: python -m <pkg>.tools.dsb15_preprocess DATA_DIR OUTPUT_DIR
"""
from __future__ import annotations

import argparse
import logging
from pathlib import Path

import numpy as np

from ..utils import nifti
from .acdc_preprocess import crop_multiple, normalize_int16
from ..ops.kspace import Downscale

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(message)s", level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)


def main(data_dir: Path, output_dir: Path, factors=(2, 3, 4)):
    for type_ in ["train", "valid", "test"]:
        split_dir = data_dir / type_
        if not split_dir.is_dir():
            continue
        logging.info(f"Process the {type_} data.")
        sum_, square_sum, num = 0.0, 0.0, 0
        for patient_dir in sorted(p for p in split_dir.iterdir() if p.is_dir()):
            patient_name = patient_dir.name
            logging.info(f"Process {patient_name}.")
            # reference :23-24: one-level '*/*.nii.gz' glob (not recursive),
            # and sequences are numbered by POSITION among all globbed series
            # (j+1, reference :72-74) — skipped malformed ones keep their
            # slot, so trees stay filename-interchangeable with the reference
            for j, series_path in enumerate(sorted(patient_dir.glob("*/*.nii.gz"))):
                data = np.asarray(nifti.load(series_path).get_data())
                # skip malformed series (reference :28-29)
                if data.ndim != 4 or data.shape[2] != 1 or data.shape[-1] < 30:
                    continue
                seq_idx = j + 1
                data = normalize_int16(data)
                h0, hn, w0, wn = crop_multiple(data.shape[0], data.shape[1])
                cropped = data[h0:hn, w0:wn]
                sum_ += float(cropped.sum())
                square_sum += float((cropped**2).sum())
                num += int(np.prod(cropped.shape))

                for i, factor in enumerate(factors):
                    downscale = Downscale(factor)
                    hr_video = cropped[:, :, 0:1]  # (H, W, 1, T)
                    lr_frames = downscale(*[hr_video[..., t] for t in range(hr_video.shape[-1])])
                    lr_video = np.stack(lr_frames, axis=-1).astype(np.float32)
                    name = f"{patient_name}_2d+1d_sequence{seq_idx:0>2d}.nii.gz"
                    if i == 0:
                        nifti.save(hr_video, output_dir / "videos" / type_ / "HR" / patient_name / name)
                    nifti.save(
                        lr_video,
                        output_dir / "videos" / type_ / "LR" / f"X{factor}" / patient_name / name,
                    )
                    for t in range(hr_video.shape[-1]):
                        img_name = f"{patient_name}_2d_slice{seq_idx:0>2d}_frame{t+1:0>2d}.nii.gz"
                        if i == 0:
                            nifti.save(
                                hr_video[..., t],
                                output_dir / "imgs" / type_ / "HR" / patient_name / img_name,
                            )
                        nifti.save(
                            lr_video[..., t],
                            output_dir / "imgs" / type_ / "LR" / f"X{factor}" / patient_name / img_name,
                        )
        if num:
            mean = sum_ / num
            std = float(np.sqrt(square_sum / num - mean**2))
            logging.info(
                f"The mean and the standard deviation of the {type_} data is "
                f"{mean:.4f} and {std:.4f}."
            )


def _parse_args():
    parser = argparse.ArgumentParser(description="The DSB15 data preprocessing.")
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("output_dir", type=Path)
    return parser.parse_args()


if __name__ == "__main__":
    args = _parse_args()
    main(args.data_dir, args.output_dir)
