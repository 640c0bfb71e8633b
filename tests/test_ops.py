import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.pixel_shuffle import (
    pixel_shuffle,
    space_to_depth,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.resize import (
    resize_bicubic,
    resize_bicubic_np,
    upsample_bicubic,
)


def test_pixel_shuffle_matches_torch():
    import torch

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 3, 5)).astype(np.float32)  # NCHW, C=8=2*2²
    want = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()  # (2, 2, 6, 10)
    got = np.asarray(pixel_shuffle(x.transpose(0, 2, 3, 1), 2)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_pixel_shuffle_r3_matches_torch():
    import torch

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 18, 4, 4)).astype(np.float32)
    want = torch.pixel_shuffle(torch.from_numpy(x), 3).numpy()
    got = np.asarray(pixel_shuffle(x.transpose(0, 2, 3, 1), 3)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_space_to_depth_inverts_pixel_shuffle():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 4, 6, 8)).astype(np.float32)  # NHWC
    y = space_to_depth(pixel_shuffle(x, 2), 2)
    np.testing.assert_allclose(y, x, atol=1e-6)


def test_upsample_bicubic_matches_torch_align_corners():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(3)
    x = rng.uniform(0, 255, (2, 1, 9, 7)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), scale_factor=4, mode="bicubic", align_corners=True
    ).numpy()
    got = np.asarray(upsample_bicubic(x.transpose(0, 2, 3, 1), 4, align_corners=True))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-4)


def test_upsample_bicubic_matches_torch_half_pixel():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(4)
    x = rng.uniform(0, 255, (1, 1, 12, 10)).astype(np.float32)
    want = F.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="bicubic", align_corners=False
    ).numpy()
    got = np.asarray(upsample_bicubic(x.transpose(0, 2, 3, 1), 2, align_corners=False))
    np.testing.assert_allclose(got.transpose(0, 3, 1, 2), want, atol=1e-3, rtol=1e-4)


def test_downscale_matches_cv2_inter_cubic():
    import cv2

    rng = np.random.default_rng(5)
    img = rng.uniform(0, 255, (48, 44)).astype(np.float32)
    want = cv2.resize(img, (11, 12), interpolation=cv2.INTER_CUBIC)
    got = resize_bicubic_np(img, (12, 11))
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=1e-4)


def test_resize_bicubic_jax_equals_np():
    rng = np.random.default_rng(6)
    x = rng.uniform(0, 1, (5, 16, 14, 2)).astype(np.float32)
    got = np.asarray(resize_bicubic(x, (8, 7)))
    for b in range(5):
        want = resize_bicubic_np(x[b], (8, 7))
        np.testing.assert_allclose(got[b], want, atol=1e-5)


def test_perf_probe_smoke():
    """The perf decomposition tool runs end-to-end on CPU with tiny shapes
    (guards the probe graphs against model/API drift)."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        perf_probe,
    )

    results = perf_probe.main(
        ["--probes",
         "null,conv_chain,conv_batched,lstm,refine,refine2d,refine_pad,dcn,out,out_split",
         "--t", "6", "--hw", "8", "--iters", "1"]
    )
    assert set(results) == {"null", "conv_chain", "conv_batched", "lstm",
                            "refine", "refine2d", "refine_pad", "dcn", "out",
                            "out_split"}
    for name, row in results.items():
        if name == "out_split":  # nested per-piece decomposition rows
            assert all(piece["sec"] > 0 for k, piece in row.items()
                       if k != "compile_plus_run_sec")
        else:
            assert row["sec"] > 0, name
