"""Offline preprocessing pipeline tests: k-space degradation parity with the
reference formula, full ACDC preprocess round-trip on synthetic raw data,
cardiac cropping bbox, and phase-code generation."""
import pickle

import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.kspace import (
    Downscale,
    img_to_kspace,
    kspace_to_img,
    truncate_kspace,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
    acdc_preprocess,
    cardiac_cropping,
    gen_positional_encoding,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import nifti


def _reference_downscale_numpy(img, factor):
    """The reference Downscale math (acdc_preprocess.py:111-180) with the
    cv2.resize swapped for our matrix bicubic (parity shown in test_ops)."""
    import cv2
    from numpy.fft import fftn, fftshift, ifftn, ifftshift

    kspace = fftshift(fftn(ifftshift(img), norm="ortho"))
    rect = np.zeros_like(kspace)
    kx, ky = kspace.shape[0] // 2, kspace.shape[1] // 2
    lx, ly = kspace.shape[0] // factor, kspace.shape[1] // factor
    rect[kx - lx // 2 : kx + (lx - lx // 2), ky - ly // 2 : ky + (ly - ly // 2)] = 1
    low = fftshift(ifftn(ifftshift(rect * kspace), norm="ortho"))
    low = np.around(np.abs(low)).astype(np.float32)
    h, w, _ = low.shape
    out = cv2.resize(low, (w // factor, h // factor), interpolation=cv2.INTER_CUBIC)[..., None]
    return np.clip(out.round(), 0, 255)


@pytest.mark.parametrize("factor", [2, 3, 4])
def test_kspace_downscale_matches_reference_math(factor):
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (48, 36, 1)).astype(np.float32).round()
    (got,) = Downscale(factor)(img)
    want = _reference_downscale_numpy(img, factor)
    # identical FFT path; resize differs from cv2 by <2e-2 before rounding,
    # so allow a ±1 quantization disagreement on a tiny fraction of pixels
    assert got.shape == want.shape == (48 // factor, 36 // factor, 1)
    close = np.abs(got - want) <= 1.0
    assert close.mean() > 0.999
    assert np.abs(got - want).max() <= 1.0


def test_kspace_truncation_is_low_pass():
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 255, (24, 24, 1)).astype(np.float32)
    k = img_to_kspace(img)
    kt = truncate_kspace(k, 2)
    assert (np.abs(kt) > 0).sum() < (np.abs(k) > 0).sum()
    out = kspace_to_img(kt)
    assert out.shape == img.shape


def test_normalize_int16_clips_and_scales():
    rng = np.random.default_rng(2)
    data = rng.integers(0, 1000, (20, 20, 2, 4)).astype(np.int16)
    data[0, 0, 0, 0] = 30000  # outlier
    out = acdc_preprocess.normalize_int16(data)
    assert out.dtype == np.float32
    assert out.min() >= 0 and out.max() <= 255


def test_crop_multiple_of_12():
    h0, hn, w0, wn = acdc_preprocess.crop_multiple(100, 75)
    assert (hn - h0) % 12 == 0 and (wn - w0) % 12 == 0


def test_acdc_preprocess_end_to_end(tmp_path):
    """Raw ACDC-like tree → full preprocessed tree (videos + imgs, HR + LR)."""
    raw = tmp_path / "raw"
    rng = np.random.default_rng(3)
    for split, patients in [("training", ["patient001", "patient002"]), ("testing", ["patient101"])]:
        for p in patients:
            vol = rng.integers(0, 800, (30, 28, 2, 4)).astype(np.int16)
            nifti.save(vol, raw / split / p / f"{p}_4d.nii.gz")
    out = tmp_path / "preprocessed"
    acdc_preprocess.main(raw, out, factors=(4,))

    hr_vids = sorted(out.glob("videos/*/HR/*/*.nii.gz"))
    lr_vids = sorted(out.glob("videos/*/LR/X4/*/*.nii.gz"))
    assert len(hr_vids) == 3 * 2  # patients x slices
    assert len(lr_vids) == 3 * 2
    hr = nifti.load(hr_vids[0]).get_data()
    lr = nifti.load(lr_vids[0]).get_data()
    assert hr.shape[0] % 12 == 0 and hr.shape[1] % 12 == 0
    assert lr.shape[0] == hr.shape[0] // 4 and lr.shape[1] == hr.shape[1] // 4
    assert hr.shape[-1] == lr.shape[-1] == 4  # frames preserved
    imgs = sorted(out.glob("imgs/*/HR/*/*.nii.gz"))
    assert len(imgs) == 3 * 2 * 4  # patients x slices x frames
    # 80/20 split: 2 training patients → 1 train + 1 valid
    assert len(list(out.glob("videos/train/HR/*"))) == 1
    assert len(list(out.glob("videos/valid/HR/*"))) == 1
    assert len(list(out.glob("videos/test/HR/*"))) == 1


def test_cardiac_cropping_and_phase_code(tmp_path):
    """bbox finds the moving region; phase code is a length-T cosine."""
    rng = np.random.default_rng(4)
    H = W = 48
    T = 12
    vol = np.full((H, W, 1, T), 20.0, np.float32)
    # a moving bright blob in the center region
    for t in range(T):
        c = 20 + int(6 * np.sin(2 * np.pi * t / T))
        vol[c - 6 : c + 6, 18:30, 0, t] = 220.0
    vol += rng.normal(0, 2, vol.shape).astype(np.float32)
    vol = np.clip(vol, 0, 255)

    data_dir = tmp_path / "videos" / "test"
    nifti.save(vol, data_dir / "HR" / "patient001" / "patient001_2d+1d_sequence01.nii.gz")

    crop_out = tmp_path / "cropped"
    cardiac_cropping.main(tmp_path / "videos", crop_out)
    with open(crop_out / "coordinates.pkl", "rb") as f:
        coords = pickle.load(f)
    h0, hn, w0, wn = coords["patient001"]
    assert 0 <= h0 < hn <= H and 0 <= w0 < wn <= W
    # the bbox should cover the blob's travel range
    assert h0 < 20 and hn > 26
    assert list(crop_out.glob("patient001/*.gif"))

    pe_out = tmp_path / "pe"
    gen_positional_encoding.main(tmp_path / "videos", crop_out / "coordinates.pkl", pe_out)
    with open(pe_out / "position_code.pkl", "rb") as f:
        codes = pickle.load(f)
    code = codes["patient001"]
    assert code.shape == (T,)
    assert np.abs(code).max() <= 1.0 + 1e-6
    assert code[0] == pytest.approx(1.0)  # cos(0) at the cycle start


def test_dsb15_preprocess_numbering_matches_reference(tmp_path):
    """Sequences are numbered by POSITION among all globbed series — a
    skipped malformed series keeps its slot (reference dsb15_preprocess.py
    j+1, :23-74), so trees stay filename-interchangeable; glob is one-level
    '*/*.nii.gz' like the reference, not recursive."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        dsb15_preprocess,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        nifti,
    )

    rng = np.random.default_rng(0)
    patient = tmp_path / "raw" / "train" / "patient001"
    # series 'a' is malformed (T=5 < 30): skipped but keeps slot 1
    bad = rng.integers(0, 255, (24, 24, 1, 5)).astype(np.int16)
    nifti.save(bad, patient / "a" / "sax_bad.nii.gz")
    good = rng.integers(0, 255, (24, 24, 1, 30)).astype(np.int16)
    nifti.save(good, patient / "b" / "sax_good.nii.gz")
    # nested two levels deep: the reference's one-level glob must NOT pick
    # this up
    nifti.save(good, patient / "b" / "nested" / "sax_extra.nii.gz")

    out = tmp_path / "preprocessed"
    dsb15_preprocess.main(tmp_path / "raw", out, factors=(4,))

    hr = sorted(p.name for p in (out / "videos" / "train" / "HR" / "patient001").glob("*"))
    assert hr == ["patient001_2d+1d_sequence02.nii.gz"]
    saved = nifti.load(
        out / "videos" / "train" / "HR" / "patient001" / hr[0]
    ).get_data()
    assert saved.shape[-1] == 30
