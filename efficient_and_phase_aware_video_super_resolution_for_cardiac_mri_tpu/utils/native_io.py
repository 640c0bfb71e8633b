"""ctypes bindings for the native host-I/O core (``native/evsr_native.cpp``).

The C++ library does GIL-free threaded NIfTI decode (gzip inflate + header
parse + float32 conversion).  It is built on first use with g++ (cached as
``native/libevsr_native.so``); every entry point falls back to the pure-python
``utils.nifti`` reader when the toolchain or library is unavailable, so the
framework never hard-depends on it.
"""
from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path

import numpy as np

from . import nifti

logger = logging.getLogger(__name__)

_NATIVE_DIR = Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "libevsr_native.so"
_lib = None
_tried = False


def _build() -> bool:
    src = _NATIVE_DIR / "evsr_native.cpp"
    if not src.exists():
        return False
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return _LIB_PATH.exists()
    except Exception as e:  # toolchain missing, compile error, ...
        logger.debug(f"native build failed: {e}")
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
    except OSError as e:
        logger.debug(f"native load failed: {e}")
        return None
    lib.evsr_decode_nifti_file.restype = ctypes.c_int
    lib.evsr_decode_nifti_file.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.evsr_nifti_dims.restype = ctypes.c_int
    lib.evsr_nifti_dims.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
    lib.evsr_decode_batch.restype = ctypes.c_int
    lib.evsr_decode_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def read_shape(path) -> tuple[int, ...] | None:
    """Volume shape from the 348-byte header only.

    Uses the python streaming reader: ``gzip.open`` inflates just the header
    bytes, where the native ``evsr_nifti_dims`` gunzips the WHOLE file to
    read 348 bytes — calling it before every decode doubled inflate cost on
    gzipped trees."""
    try:
        return tuple(nifti.read_header(path)["shape"])
    except Exception:
        return None


def load_volume(path) -> np.ndarray:
    """float32 volume in the same (Fortran-order) layout as ``nifti.load``;
    falls back to the python reader on any failure."""
    lib = _load()
    if lib is None:
        return np.asarray(nifti.load(path).get_data(), np.float32)
    shape = read_shape(path)
    if shape is None:
        return np.asarray(nifti.load(path).get_data(), np.float32)
    count = int(np.prod(shape))
    out = np.empty(count, np.float32)
    dims = (ctypes.c_int64 * 8)()
    rc = lib.evsr_decode_nifti_file(
        str(path).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        count,
        dims,
    )
    if rc < 0:
        return np.asarray(nifti.load(path).get_data(), np.float32)
    return out.reshape(shape, order="F")


def load_volumes(paths, threads: int = 8) -> list[np.ndarray]:
    """Decode many volumes concurrently (GIL-free std::thread pool)."""
    lib = _load()
    if lib is None:
        return [load_volume(p) for p in paths]
    shapes = [read_shape(p) for p in paths]
    if any(s is None for s in shapes):
        return [load_volume(p) for p in paths]
    buffers = [np.empty(int(np.prod(s)), np.float32) for s in shapes]
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    c_outs = (ctypes.POINTER(ctypes.c_float) * n)(
        *[b.ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for b in buffers]
    )
    c_caps = (ctypes.c_int64 * n)(*[b.size for b in buffers])
    c_dims = (ctypes.c_int64 * (8 * n))()
    rc = lib.evsr_decode_batch(c_paths, n, c_outs, c_caps, c_dims, threads)
    if rc < 0:
        return [load_volume(p) for p in paths]
    return [b.reshape(s, order="F") for b, s in zip(buffers, shapes)]
