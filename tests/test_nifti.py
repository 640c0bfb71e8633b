import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import nifti


@pytest.mark.parametrize("suffix", [".nii", ".nii.gz"])
@pytest.mark.parametrize(
    "dtype,shape",
    [
        (np.float32, (13, 11, 1, 7)),  # the (H, W, C, T) sequence layout
        (np.int16, (32, 30, 10, 28)),  # raw ACDC 4D layout
        (np.uint8, (8, 8)),
        (np.float64, (5, 4, 3)),
    ],
)
def test_roundtrip(tmp_path, suffix, dtype, shape):
    rng = np.random.default_rng(0)
    if np.issubdtype(dtype, np.integer):
        data = rng.integers(0, 255, size=shape).astype(dtype)
    else:
        data = rng.standard_normal(shape).astype(dtype)
    path = tmp_path / f"vol{suffix}"
    nifti.save(data, path)
    img = nifti.load(path)
    assert img.data.dtype == dtype
    assert img.data.shape == shape
    np.testing.assert_array_equal(img.data, data)


def test_header_only_shape(tmp_path):
    data = np.zeros((6, 5, 1, 30), np.float32)
    path = tmp_path / "seq.nii.gz"
    nifti.save(data, path)
    hdr = nifti.read_header(path)
    assert hdr["shape"] == (6, 5, 1, 30)


def test_fortran_order_matches_nibabel_convention(tmp_path):
    # First axis is fastest on disk: write a ramp and check strides by hand.
    data = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    path = tmp_path / "ramp.nii"
    nifti.save(data, path)
    raw = path.read_bytes()
    voxels = np.frombuffer(raw[352:], dtype=np.float32)
    np.testing.assert_array_equal(voxels, data.ravel(order="F"))


def test_affine_roundtrip(tmp_path):
    data = np.zeros((4, 4), np.float32)
    affine = np.diag([2.0, 3.0, 4.0, 1.0]).astype(np.float32)
    path = tmp_path / "aff.nii.gz"
    nifti.save(nifti.NiftiImage(data, affine), path)
    img = nifti.load(path)
    np.testing.assert_allclose(img.affine[:3, :], affine[:3, :])


def test_deterministic_gzip_bytes(tmp_path):
    data = np.ones((8, 8, 1, 3), np.float32)
    p1, p2 = tmp_path / "a.nii.gz", tmp_path / "b.nii.gz"
    nifti.save(data, p1)
    nifti.save(data, p2)
    assert p1.read_bytes() == p2.read_bytes()
