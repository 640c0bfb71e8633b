"""Datasets for the ACDC / DSB15 cardiac cine-MRI SR workloads.

The reference ships byte-identical ACDC/DSB15 twins of every dataset
(SURVEY.md §1); here each workload is implemented once and registered under
both names.  Items are dicts of channel-last numpy arrays with time stacked
as a leading axis — (T, H, W, C) — the idiomatic layout for ``lax.scan``
(the reference returns python lists of (C, H, W) tensors instead).

Workloads (reference files cited per class):

* SISR  — single LR image → single HR image       (``acdc_sisr_dataset.py``)
* MISR  — window of LR frames → center HR frame   (``acdc_misr_dataset.py``)
* VSR   — window/sequence of LR → same-length HR  (``acdc_vsr_dataset.py``)
* VSRRefineNet — VSR plus phase codes, ×3 circular tiling and
  ``num_updated_frames`` warm-up margins (``acdc_vsr_refinenet_dataset.py``)

The ``Dsb15VSRRefineNetDataset`` the reference's external-eval configs name
but never define (SURVEY.md §5 quirk 5) exists here.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ..config import DATASETS
from ..utils import nifti
from .transforms import Normalize, compose


class _VolumeCache:
    """Process-wide LRU of decoded NIfTI volumes.

    The reference re-reads and re-gunzips the same sequence file for every
    window cut from it (``acdc_vsr_refinenet_dataset.py:54-55``) — the
    documented input-pipeline bottleneck (SURVEY.md §7).  Decoded float32
    volumes are small (~1 MB), so a few hundred fit comfortably in host RAM.
    """

    def __init__(self, capacity: int = 512):
        import threading
        from collections import OrderedDict

        self.capacity = capacity
        self._cache = OrderedDict()
        # loader threads share this cache; OrderedDict reordering/eviction is
        # not atomic, so guard it (decode itself runs outside the lock)
        self._lock = threading.Lock()

    def get(self, path: Path) -> np.ndarray:
        key = str(path)
        with self._lock:
            if key in self._cache:
                self._cache.move_to_end(key)
                return self._cache[key]
        data = _read_volume(path)
        with self._lock:
            self._cache[key] = data
            if len(self._cache) > self.capacity:
                self._cache.popitem(last=False)
        return data


def _read_volume(path) -> np.ndarray:
    """Cache-miss path: the native GIL-free decoder when built, else python."""
    import os

    if os.environ.get("EVSR_NO_NATIVE_IO") != "1":
        from ..utils import native_io

        if native_io.available():
            return native_io.load_volume(path)
    return np.asarray(nifti.load(path).get_data())


_VOLUMES = _VolumeCache()
_PICKLES: dict[str, dict] = {}
_PICKLES_LOCK = __import__("threading").Lock()


def _load_pickle(path) -> dict:
    key = str(path)
    with _PICKLES_LOCK:
        if key not in _PICKLES:
            with open(key, "rb") as f:
                _PICKLES[key] = pickle.load(f)
        return _PICKLES[key]


def _frames(vol: np.ndarray) -> list[np.ndarray]:
    """(H, W, C, T) volume → list of T (H, W, C) frames."""
    return [vol[..., t] for t in range(vol.shape[-1])]


def _window(start: int, end: int, vol: np.ndarray) -> np.ndarray:
    """Slice frames [start, end) with circular wrap (reference
    ``acdc_misr_dataset.py:59-68``).

    Branch order matters for parity: when ``start < 0`` the reference takes
    ``vol[:end]`` with NO modulo — numpy clamps ``end > T`` to T — so a
    window longer than the sequence yields start-wrap + the whole sequence,
    not a doubly-wrapped (shorter) window.  Only the ``end > T``-with-
    nonnegative-start branch reduces ``end`` mod T."""
    T = vol.shape[-1]
    if start < 0:
        return np.concatenate((vol[..., start:], vol[..., :end]), axis=-1)
    if end > T:
        return np.concatenate((vol[..., start:], vol[..., : end % T]), axis=-1)
    return vol[..., start:end]


class BaseDataset:
    """Reference ``src/data/datasets/base_dataset.py:5-14``."""

    def __init__(self, data_dir, type):
        self.data_dir = Path(data_dir)
        if type not in ("train", "valid", "test"):
            raise ValueError(f"The type should be 'train', 'valid' or 'test'. Got {type}.")
        self.type = type

    def __len__(self):
        raise NotImplementedError

    def __getitem__(self, index):
        raise NotImplementedError


class _SRDatasetBase(BaseDataset):
    """Shared path-indexing for paired LR/HR trees."""

    glob_pattern = "**/*2d+1d*.nii.gz"

    def __init__(self, data_dir, type, downscale_factor, transforms, augments=None, **kwargs):
        super().__init__(data_dir, type)
        if downscale_factor not in (2, 3, 4):
            raise ValueError(f"The downscale factor should be 2, 3, 4. Got {downscale_factor}.")
        self.downscale_factor = downscale_factor
        self.transforms = compose(transforms)
        self.augments = compose(augments) if augments else None

    def _paired_paths(self):
        lr_paths = sorted(
            (self.data_dir / self.type / "LR" / f"X{self.downscale_factor}").glob(self.glob_pattern)
        )
        hr_paths = sorted((self.data_dir / self.type / "HR").glob(self.glob_pattern))
        return list(zip(lr_paths, hr_paths))

    def _bounds(self, t):
        """[start, end) window around frame ``t`` for the windowed datasets
        (MISR/VSR — requires ``num_frames``/``temporal_order`` attributes);
        reference ``acdc_misr_dataset.py:52-58``."""
        n = self.num_frames
        if self.temporal_order == "last":
            return t - n + 1, t + 1
        return t - (n - 1) // 2, t + ((n - 1) - (n - 1) // 2) + 1

    def deferrable_normalize(self):
        """(means, stds) of the pipeline's explicit-stats ``Normalize``, or
        ``None`` — image-level-stats normalization (``means: null``) depends
        on each item and cannot move to the device."""
        for t in self.transforms.transforms:
            if isinstance(t, Normalize) and t.means is not None:
                return list(t.means), list(t.stds)
        return None

    def defer_normalize(self):
        """Pop the explicit-stats ``Normalize`` off the HOST pipeline and
        return its (means, stds), so an engine can apply the identical
        per-channel ``(x - mean) / (std + 1e-10)`` on DEVICE instead
        (trainer ``int_feed``).  Items then leave ``__getitem__`` in the
        source intensity scale (integer-valued float32 for the cardiac
        trees), which the feed can compact losslessly for transfer."""
        for i, t in enumerate(self.transforms.transforms):
            if isinstance(t, Normalize) and t.means is not None:
                self.transforms.transforms.pop(i)
                return list(t.means), list(t.stds)
        return None

    def _apply(self, imgs: list[np.ndarray], rng: np.random.Generator | None) -> list[np.ndarray]:
        """Augment (train only) then transform a tuple of images."""
        rng = rng if rng is not None else np.random.default_rng()
        if self.type == "train" and self.augments is not None:
            imgs = self.augments(*imgs, rng=rng)
            if isinstance(imgs, np.ndarray):
                imgs = [imgs]
        out = self.transforms(*imgs, rng=rng)
        if isinstance(out, np.ndarray):
            out = [out]
        return list(out)


class SISRDataset(_SRDatasetBase):
    """Single-image SR over per-frame 2D NIfTIs (reference ``acdc_sisr_dataset.py``)."""

    glob_pattern = "**/*2d*.nii.gz"

    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.data = self._paired_paths()

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index, rng=None):
        lr_path, hr_path = self.data[index]
        lr_img = _VOLUMES.get(lr_path)  # (H, W, C)
        hr_img = _VOLUMES.get(hr_path)
        lr_img, hr_img = self._apply([lr_img, hr_img], rng)
        return {"lr_img": lr_img, "hr_img": hr_img, "index": index}


class MISRDataset(_SRDatasetBase):
    """Multi-image SR: window of frames → center/ref HR frame
    (reference ``acdc_misr_dataset.py``)."""

    def __init__(self, *args, num_frames=5, temporal_order="middle", **kwargs):
        super().__init__(*args, **kwargs)
        if temporal_order not in ("last", "middle"):
            raise ValueError(f"temporal_order must be 'last' or 'middle'; got {temporal_order}.")
        self.num_frames = num_frames
        self.temporal_order = temporal_order
        self.data = []
        for lr_path, hr_path in self._paired_paths():
            T = nifti.read_header(lr_path)["shape"][-1]
            self.data.extend((lr_path, hr_path, t) for t in range(T))

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index, rng=None):
        lr_path, hr_path, t = self.data[index]
        start, end = self._bounds(t)
        lr = _window(start, end, _VOLUMES.get(lr_path))
        hr = _window(start, end, _VOLUMES.get(hr_path))
        imgs = self._apply(_frames(lr) + _frames(hr), rng)
        half = len(imgs) // 2
        lr_imgs, hr_imgs = imgs[:half], imgs[half:]
        ref = self.num_frames // 2 if self.num_frames % 2 == 1 else self.num_frames // 2 - 1
        return {"lr_imgs": np.stack(lr_imgs), "hr_img": hr_imgs[ref], "index": index}


class VSRDataset(_SRDatasetBase):
    """Video SR: train = per-(sequence, t) windows; valid/test = whole
    sequences (reference ``acdc_vsr_dataset.py``)."""

    def __init__(self, *args, num_frames=5, temporal_order="last", **kwargs):
        super().__init__(*args, **kwargs)
        if temporal_order not in ("last", "middle"):
            raise ValueError(f"temporal_order must be 'last' or 'middle'; got {temporal_order}.")
        self.num_frames = num_frames
        self.temporal_order = temporal_order
        pairs = self._paired_paths()
        if self.type == "train":
            self.data = []
            for lr_path, hr_path in pairs:
                T = nifti.read_header(lr_path)["shape"][-1]
                self.data.extend((lr_path, hr_path, t) for t in range(T))
        else:
            self.data = pairs

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index, rng=None):
        if self.type == "train":
            lr_path, hr_path, t = self.data[index]
            start, end = self._bounds(t)
            lr = _window(start, end, _VOLUMES.get(lr_path))
            hr = _window(start, end, _VOLUMES.get(hr_path))
        else:
            lr_path, hr_path = self.data[index]
            lr, hr = _VOLUMES.get(lr_path), _VOLUMES.get(hr_path)
        imgs = self._apply(_frames(lr) + _frames(hr), rng)
        half = len(imgs) // 2
        return {
            "lr_imgs": np.stack(imgs[:half]),
            "hr_imgs": np.stack(imgs[half:]),
            "index": index,
        }


class VSRRefineNetDataset(_SRDatasetBase):
    """RefineNet VSR: phase codes + ×3 circular tiling + warm-up margins
    (reference ``acdc_vsr_refinenet_dataset.py``).

    Train: LR window ``[t-num_frames+1-U, t+1+U)`` on the tiled sequence, HR
    window ``[t-num_frames+1, t+1)``; pos_code follows LR.  Valid/test: LR =
    one full cycle + U margin each side, HR = one full cycle.
    """

    def __init__(self, *args, pos_code_path, num_frames=5, num_updated_frames=0, **kwargs):
        super().__init__(*args, **kwargs)
        self.num_frames = num_frames
        self.num_updated_frames = num_updated_frames
        self.pos_code_path = pos_code_path
        pairs = self._paired_paths()
        if self.type == "train":
            self.data = []
            for lr_path, hr_path in pairs:
                T = nifti.read_header(lr_path)["shape"][-1]
                self.data.extend((lr_path, hr_path, t) for t in range(T))
        else:
            self.data = pairs

    def __len__(self):
        return len(self.data)

    def __getitem__(self, index, rng=None):
        if self.type == "train":
            lr_path, hr_path, t = self.data[index]
        else:
            lr_path, hr_path = self.data[index]
            t = None
        lr_vol, hr_vol = _VOLUMES.get(lr_path), _VOLUMES.get(hr_path)

        imgs = self._apply(_frames(lr_vol) + _frames(hr_vol), rng)
        half = len(imgs) // 2
        lr_imgs, hr_imgs = imgs[:half], imgs[half:]

        # Phase code: per-patient (T,) array, normalization exempt
        # (reference :66-71).  The pickle is cached, fixing quirk 7.
        pos_codes = _load_pickle(self.pos_code_path)
        patient = lr_path.parts[-1].split(".")[0].split("_")[0]
        pos_code = np.asarray(pos_codes[patient], np.float32)

        # ×3 circular tiling (reference :74-76).
        lr_imgs, hr_imgs = lr_imgs * 3, hr_imgs * 3
        pos_code = np.tile(pos_code, 3)[:, None]  # (3T, 1)
        T = len(lr_imgs) // 3
        U = self.num_updated_frames

        if self.type == "train":
            tt = t + T
            start, end = tt - self.num_frames + 1, tt + 1
            lr_sel = lr_imgs[start - U : end + U]
            hr_sel = hr_imgs[start:end]
            pos_sel = pos_code[start - U : end + U]
        else:
            lr_sel = lr_imgs[T - U : 2 * T + U]
            hr_sel = hr_imgs[:T]
            pos_sel = pos_code[T - U : 2 * T + U]

        return {
            "lr_imgs": np.stack(lr_sel),
            "hr_imgs": np.stack(hr_sel),
            "pos_code": pos_sel.astype(np.float32),
            "index": index,
        }


# Register the ACDC/DSB15 twins — one implementation, two names each
# (collapses the reference's byte-identical class copies, SURVEY.md §1).
for _workload, _cls in [
    ("SISRDataset", SISRDataset),
    ("MISRDataset", MISRDataset),
    ("VSRDataset", VSRDataset),
    ("VSRRefineNetDataset", VSRRefineNetDataset),
]:
    DATASETS.add(f"Acdc{_workload}", _cls)
    DATASETS.add(f"Dsb15{_workload}", _cls)
