"""Native C++ NIfTI decoder: byte-parity with the python reader."""
import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
    native_io,
    nifti,
)

pytestmark = pytest.mark.skipif(
    not native_io.available(), reason="native toolchain unavailable"
)


@pytest.mark.parametrize("dtype", [np.float32, np.int16, np.uint8, np.float64])
@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
def test_native_matches_python_reader(tmp_path, dtype, suffix):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 250, (17, 13, 1, 9)).astype(dtype)
    else:
        data = rng.standard_normal((17, 13, 1, 9)).astype(dtype)
    path = tmp_path / f"vol{suffix}"
    nifti.save(data, path)
    got = native_io.load_volume(path)
    want = np.asarray(nifti.load(path).get_data(), np.float32)
    assert got.dtype == np.float32
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_native_shape_query(tmp_path):
    data = np.zeros((6, 5, 1, 30), np.float32)
    path = tmp_path / "seq.nii.gz"
    nifti.save(data, path)
    assert native_io.read_shape(path) == (6, 5, 1, 30)


def test_native_batch_decode(tmp_path):
    rng = np.random.default_rng(1)
    paths, wants = [], []
    for i in range(12):
        data = rng.uniform(0, 255, (10 + i, 8, 1, 5)).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        nifti.save(data, p)
        paths.append(p)
        wants.append(data)
    got = native_io.load_volumes(paths, threads=4)
    for g, w in zip(got, wants):
        np.testing.assert_allclose(g, w, rtol=1e-6)


def test_fallback_on_missing_file(tmp_path):
    with pytest.raises(Exception):
        native_io.load_volume(tmp_path / "nope.nii.gz")


def test_native_decode_rejects_truncated_payload(tmp_path):
    """A truncated/corrupt NIfTI must fail with a clean negative code (and
    python fallback), never an out-of-bounds read of the file buffer."""
    import ctypes
    import gzip

    import numpy as np

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        native_io,
        nifti,
    )

    lib = native_io._load()
    if lib is None:
        import pytest

        pytest.skip("native library unavailable")
    vol = np.arange(4 * 5 * 2 * 3, dtype=np.float32).reshape(4, 5, 2, 3)
    p = tmp_path / "ok.nii.gz"
    nifti.save(vol, p)
    raw = gzip.decompress(p.read_bytes())
    trunc = tmp_path / "trunc.nii.gz"
    trunc.write_bytes(gzip.compress(raw[: 352 + 8]))  # header + 2 voxels
    out = np.empty(vol.size, np.float32)
    dims = (ctypes.c_int64 * 8)()
    rc = lib.evsr_decode_nifti_file(
        str(trunc).encode(),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        vol.size,
        dims,
    )
    assert rc == -6
