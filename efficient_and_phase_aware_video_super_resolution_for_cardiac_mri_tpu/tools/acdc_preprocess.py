"""ACDC offline preprocessing CLI (reference ``src/acdc_preprocess.py``).

Splits ``training/**/*4d.nii.gz`` 80/20 into train/valid with
``random.seed('vsr')``; per patient: int16 outlier clip at the 99.5% CDF +
min-max to [0, 255], center-crop to a multiple of 12, k-space degradation to
LR X{2,3,4}, and per-slice "2d+1d" sequence NIfTIs + per-frame "2d" image
NIfTIs under the imgs/ and videos/ trees.

Usage: python -m <pkg>.tools.acdc_preprocess DATA_DIR OUTPUT_DIR
"""
from __future__ import annotations

import argparse
import logging
import random
from pathlib import Path

import numpy as np

from ..ops.kspace import Downscale
from ..utils import nifti

logging.basicConfig(
    format="%(asctime)s | %(levelname)s | %(message)s", level=logging.INFO,
    datefmt="%Y-%m-%d %H:%M:%S",
)


def normalize_int16(data: np.ndarray) -> np.ndarray:
    """99.5%-CDF outlier clip + min-max to [0,255] (reference ``:34-39``)."""
    if data.dtype == np.int16:
        hist, _ = np.histogram(data.ravel(), bins=range(int(data.max()) + 1), density=True)
        cdf = np.cumsum(hist)
        idx = int(np.abs(cdf - 0.995).argmin())
        data = np.minimum(data, idx)
        data = ((data - data.min()) / (data.max() - data.min()) * 255.0).round()
    return data.astype(np.float32)


def crop_multiple(h: int, w: int, r: int = 12) -> tuple[int, int, int, int]:
    """Center-crop bounds making H, W divisible by r (reference ``:43-45``)."""
    h0, hn = (h % r) // 2, h - ((h % r) - (h % r) // 2)
    w0, wn = (w % r) // 2, w - ((w % r) - (w % r) // 2)
    return h0, hn, w0, wn


def process_patient(data: np.ndarray, patient_name: str, type_: str, output_dir: Path,
                    factors=(2, 3, 4)) -> tuple[float, float, int]:
    """Write the HR/LR imgs+videos trees for one (H, W, D, T) volume.

    Returns (sum, square_sum, count) for the dataset stats accumulation.
    """
    data = normalize_int16(data)
    h0, hn, w0, wn = crop_multiple(data.shape[0], data.shape[1])
    cropped = data[h0:hn, w0:wn]
    s, sq, n = float(cropped.sum()), float((cropped**2).sum()), int(np.prod(cropped.shape))

    for i, factor in enumerate(factors):
        downscale = Downscale(factor)
        hr_imgs_dir = output_dir / "imgs" / type_ / "HR" / patient_name
        hr_videos_dir = output_dir / "videos" / type_ / "HR" / patient_name
        lr_imgs_dir = output_dir / "imgs" / type_ / "LR" / f"X{factor}" / patient_name
        lr_videos_dir = output_dir / "videos" / type_ / "LR" / f"X{factor}" / patient_name
        for sl in range(cropped.shape[2]):
            hr_video = cropped[:, :, sl : sl + 1]  # (H, W, C=1, T)
            lr_frames = downscale(*[hr_video[..., t] for t in range(hr_video.shape[-1])])
            lr_video = np.stack(lr_frames, axis=-1).astype(np.float32)
            name = f"{patient_name}_2d+1d_sequence{sl+1:0>2d}.nii.gz"
            if i == 0:
                nifti.save(hr_video, hr_videos_dir / name)
            nifti.save(lr_video, lr_videos_dir / name)
            for t in range(cropped.shape[-1]):
                img_name = f"{patient_name}_2d_slice{sl+1:0>2d}_frame{t+1:0>2d}.nii.gz"
                if i == 0:
                    nifti.save(hr_video[..., t], hr_imgs_dir / img_name)
                nifti.save(lr_video[..., t], lr_imgs_dir / img_name)
    return s, sq, n


def main(data_dir: Path, output_dir: Path, factors=(2, 3, 4)):
    paths = sorted((data_dir / "training").glob("**/*4d.nii.gz"))
    random.seed("vsr")  # the reference's split seed (:15)
    random.shuffle(paths)
    train_paths = sorted(paths[: int(len(paths) * 0.8)])
    valid_paths = sorted(set(paths) - set(train_paths))
    test_paths = sorted((data_dir / "testing").glob("**/*4d.nii.gz"))

    for type_, split in zip(["train", "valid", "test"], [train_paths, valid_paths, test_paths]):
        logging.info(f"Process the {type_} data.")
        sum_, square_sum, num = 0.0, 0.0, 0
        for path in split:
            patient_name = path.parts[-2]
            logging.info(f"Process {patient_name}.")
            data = nifti.load(path).get_data()  # (H, W, D, T)
            s, sq, n = process_patient(data, patient_name, type_, output_dir, factors)
            sum_, square_sum, num = sum_ + s, square_sum + sq, num + n
        if num:
            mean = sum_ / num
            std = float(np.sqrt(square_sum / num - mean**2))
            logging.info(
                f"The mean and the standard deviation of the {type_} data is "
                f"{mean:.4f} and {std:.4f}."
            )


def _parse_args():
    parser = argparse.ArgumentParser(description="The data preprocessing.")
    parser.add_argument("data_dir", type=Path)
    parser.add_argument("output_dir", type=Path)
    return parser.parse_args()


if __name__ == "__main__":
    args = _parse_args()
    main(args.data_dir, args.output_dir)
