"""TensorBoard loggers (reference ``src/callbacks/loggers/*``).

Writes per-key train/valid scalar pairs and HR|SR image panels of the last
batch, via tensorboardX.  The reference's 8 per-dataset logger copies collapse
to 4 workload loggers registered under both Acdc*/Dsb15* names.  The
``dummy_input`` / ``net`` kwargs are accepted for config compatibility and
ignored (graph plotting is disabled in the reference too,
``base_logger.py:13-18``).
"""
from __future__ import annotations

import numpy as np

from ..config import LOGGERS


def _normalize_each(img: np.ndarray) -> np.ndarray:
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)


def make_grid(imgs: np.ndarray, pad: int = 2, pad_value: float = 1.0) -> np.ndarray:
    """Stack (B, H, W, C) images vertically (nrow=1), each min-max normalized,
    with padding — the torchvision ``make_grid(nrow=1, normalize=True,
    scale_each=True, pad_value=1)`` call of the reference loggers."""
    imgs = np.asarray(imgs, np.float32)
    B, H, W, C = imgs.shape
    grid = np.full((B * (H + pad) + pad, W + 2 * pad, C), pad_value, np.float32)
    for b in range(B):
        top = pad + b * (H + pad)
        grid[top : top + H, pad : pad + W] = _normalize_each(imgs[b])
    return grid


class BaseLogger:
    """Reference ``src/callbacks/loggers/base_logger.py:5-59``."""

    def __init__(self, log_dir, net=None, dummy_input=None):
        from tensorboardX import SummaryWriter

        self.writer = SummaryWriter(str(log_dir))

    def write(self, epoch, train_log, train_batch, train_outputs, valid_log, valid_batch, valid_outputs):
        self._add_scalars(epoch, train_log, valid_log)
        # an epoch can legitimately yield no batches (e.g. fewer items than
        # the batch size with drop_last) — skip the image panels, not the run
        if train_batch is None or valid_batch is None or train_outputs is None or valid_outputs is None:
            return
        self._add_images(epoch, train_batch, train_outputs, valid_batch, valid_outputs)

    def close(self):
        self.writer.close()

    def _add_scalars(self, epoch, train_log, valid_log):
        for key in train_log:
            self.writer.add_scalars(
                key, {"train": float(train_log[key]), "valid": float(valid_log[key])}, epoch
            )

    def _add_images(self, epoch, train_batch, train_outputs, valid_batch, valid_outputs):
        raise NotImplementedError

    def _panel(self, hr: np.ndarray, sr: np.ndarray) -> np.ndarray:
        """HR|SR side-by-side panel, (C, H, W) for add_image."""
        grid = np.concatenate([make_grid(hr), make_grid(np.asarray(sr))], axis=1)
        return np.clip(grid, 0, 1).transpose(2, 0, 1)


class FrameLogger(BaseLogger):
    """HR vs SR of the last displayed batch — one class for the reference's
    three byte-identical single-frame loggers (``acdc_sisr_logger.py``,
    ``acdc_sisr_srfb_logger.py:23-26``, ``acdc_misr_logger.py``): by the time
    the panel is built, the trainer's display hook has already selected the
    frame/step to show, so SISR/SRFB/MISR differ only in name."""

    def _add_images(self, epoch, train_batch, train_outputs, valid_batch, valid_outputs):
        self.writer.add_image("train", self._panel(train_batch["hr_img"], train_outputs))
        self.writer.add_image("valid", self._panel(valid_batch["hr_img"], valid_outputs))


SISRLogger = SISRSRFBLogger = MISRLogger = FrameLogger


class VSRLogger(BaseLogger):
    """Last frame of the sequence outputs (reference ``acdc_vsr_logger.py:22-30``;
    sequences here are (B, T, H, W, C) arrays, so [-1] on time is [:, -1])."""

    def _add_images(self, epoch, train_batch, train_outputs, valid_batch, valid_outputs):
        self.writer.add_image(
            "train", self._panel(train_batch["hr_imgs"][:, -1], np.asarray(train_outputs)[:, -1])
        )
        self.writer.add_image(
            "valid", self._panel(valid_batch["hr_imgs"][:, -1], np.asarray(valid_outputs)[:, -1])
        )


for _name, _cls in [
    ("SISRLogger", SISRLogger),
    ("SISRSRFBLogger", SISRSRFBLogger),
    ("MISRLogger", MISRLogger),
    ("VSRLogger", VSRLogger),
]:
    LOGGERS.add(f"Acdc{_name}", _cls)
    LOGGERS.add(f"Dsb15{_name}", _cls)
