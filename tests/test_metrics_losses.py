import math
import pickle

import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
    losses as L,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
    metrics as M,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
    denormalize,
)


def _fake_images(shape=(2, 24, 20, 1), seed=0, scale=255.0):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, scale, size=shape).astype(np.float32)
    b = np.clip(a + rng.normal(0, 8, size=shape), 0, scale).astype(np.float32)
    return a, b


def test_psnr_formula():
    a, b = _fake_images()
    got = float(M.PSNR()(a, b))
    mse = np.mean((a - b) ** 2, axis=(1, 2, 3))
    want = np.mean(10 * np.log10(255.0**2 / (mse + 1e-10)))
    assert got == pytest.approx(want, rel=1e-5)


def test_psnr_per_sample():
    a, b = _fake_images()
    got = np.asarray(M.PSNR(size_average=False)(a, b))
    assert got.shape == (2,)


def test_psnr_identical_is_capped_by_eps():
    a = np.ones((1, 8, 8, 1), np.float32)
    got = float(M.PSNR()(a, a))
    assert got == pytest.approx(10 * math.log10(255.0**2 / 1e-10), rel=1e-5)


def _torch_reference_ssim(a_nchw, b_nchw):
    """The reference SSIM formula (metrics.py:51-113) written directly in torch."""
    import torch
    import torch.nn.functional as F

    size, sigma = 11, 1.5
    xs = torch.arange(size, dtype=torch.float32)
    g = 1 / (sigma * math.sqrt(2 * math.pi)) * torch.exp(-(((xs - size // 2) / (2 * sigma)) ** 2))
    kernel = g[:, None] * g[None, :]
    kernel = (kernel / kernel.sum()).view(1, 1, size, size)
    a = torch.from_numpy(a_nchw)
    b = torch.from_numpy(b_nchw)
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = F.conv2d(a, kernel), F.conv2d(b, kernel)
    s1 = F.conv2d(a * a, kernel) - mu1**2
    s2 = F.conv2d(b * b, kernel) - mu2**2
    s12 = F.conv2d(a * b, kernel) - mu1 * mu2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    return smap


def test_ssim_matches_reference_formula():
    a, b = _fake_images(shape=(2, 32, 28, 1))
    want = float(_torch_reference_ssim(a.transpose(0, 3, 1, 2), b.transpose(0, 3, 1, 2)).mean())
    got = float(M.SSIM()(a, b))
    assert got == pytest.approx(want, abs=2e-5)


def test_ssim_map_shape_valid_conv():
    a, b = _fake_images(shape=(1, 32, 28, 1))
    smap = M.SSIM().ssim_map(a, b)
    assert smap.shape == (1, 22, 18, 1)


def test_cardiac_psnr_masked_equals_cropped(tmp_path):
    a, b = _fake_images(shape=(1, 40, 36, 1))
    bbox = (7, 29, 5, 31)
    coords_path = tmp_path / "coordinates.pkl"
    with open(coords_path, "wb") as f:
        pickle.dump({"patient001": bbox}, f)
    cardiac = M.CardiacPSNR(str(coords_path))
    got = float(cardiac(a, b, "patient001"))
    h0, hn, w0, wn = bbox
    want = float(M.PSNR()(a[:, h0:hn, w0:wn], b[:, h0:hn, w0:wn]))
    assert got == pytest.approx(want, rel=1e-5)


def test_cardiac_ssim_masked_equals_cropped(tmp_path):
    a, b = _fake_images(shape=(1, 48, 44, 1))
    bbox = (6, 38, 4, 40)
    coords_path = tmp_path / "coordinates.pkl"
    with open(coords_path, "wb") as f:
        pickle.dump({"p": bbox}, f)
    cardiac = M.CardiacSSIM(str(coords_path))
    got = float(cardiac(a, b, "p"))
    h0, hn, w0, wn = bbox
    want = float(M.SSIM()(a[:, h0:hn, w0:wn], b[:, h0:hn, w0:wn]))
    assert got == pytest.approx(want, abs=2e-5)


def test_losses_formulas():
    a, b = _fake_images(shape=(2, 8, 8, 1), scale=1.0)
    assert float(L.L1Loss()(a, b)) == pytest.approx(np.mean(np.abs(a - b)), rel=1e-6)
    assert float(L.MSELoss()(a, b)) == pytest.approx(np.mean((a - b) ** 2), rel=1e-6)
    assert float(L.FlowLoss()(a, b)) == pytest.approx(np.mean((a - b) ** 2), rel=1e-6)
    eps = 1e-6
    assert float(L.CharbonnierLoss(eps)(a, b)) == pytest.approx(
        np.mean(np.sqrt((a - b) ** 2 + eps)), rel=1e-6
    )
    delta = 0.01
    abs_err = np.abs(a - b)
    quad = np.minimum(abs_err, delta)
    want = np.mean(0.5 * quad**2 + delta * (abs_err - quad))
    assert float(L.HuberLoss(delta)(a, b)) == pytest.approx(want, rel=1e-6)


def test_loss_names_are_log_keys():
    assert L.L1Loss().name == "L1Loss"
    assert L.FlowLoss().name == "FlowLoss"


def test_torch_builtin_losses_match_torch():
    """Every registered two-arg torch builtin reproduces torch.nn exactly
    (the reference resolves any `dir(torch.nn)` name containing 'Loss',
    reference src/main.py:63-67)."""
    import torch

    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 5, 6)).astype(np.float32)  # logits / raw
    t01 = rng.uniform(0.05, 0.95, size=x.shape).astype(np.float32)
    tx, tt = torch.from_numpy(x), torch.from_numpy(t01)
    sig = 1.0 / (1.0 + np.exp(-x))

    cases = [
        (L.BCELoss(), torch.nn.BCELoss(), sig, t01),
        (L.BCEWithLogitsLoss(), torch.nn.BCEWithLogitsLoss(), x, t01),
        (L.SoftMarginLoss(), torch.nn.SoftMarginLoss(), x,
         np.where(t01 > 0.5, 1.0, -1.0).astype(np.float32)),
        (L.HingeEmbeddingLoss(), torch.nn.HingeEmbeddingLoss(), np.abs(x),
         np.where(t01 > 0.5, 1, -1).astype(np.float32)),
        (L.PoissonNLLLoss(), torch.nn.PoissonNLLLoss(), x,
         rng.poisson(2.0, size=x.shape).astype(np.float32)),
        (L.PoissonNLLLoss(log_input=False, full=True),
         torch.nn.PoissonNLLLoss(log_input=False, full=True), np.abs(x) + 0.1,
         rng.poisson(2.0, size=x.shape).astype(np.float32)),
        (L.KLDivLoss(), torch.nn.KLDivLoss(),
         np.log(t01 / t01.sum(axis=1, keepdims=True)),
         t01 / t01.sum(axis=1, keepdims=True)),
    ]
    for ours, theirs, o, t in cases:
        want = float(theirs(torch.from_numpy(np.asarray(o)), torch.from_numpy(np.asarray(t))))
        got = float(ours(o, t))
        assert got == pytest.approx(want, rel=1e-5, abs=1e-6), ours.name

    # CrossEntropy / NLL: class-index and probability targets
    idx = rng.integers(0, 5, size=(4, 6))
    want = float(torch.nn.CrossEntropyLoss()(tx, torch.from_numpy(idx)))
    assert float(L.CrossEntropyLoss()(x, idx)) == pytest.approx(want, rel=1e-5)
    probs = t01 / t01.sum(axis=1, keepdims=True)
    want = float(torch.nn.CrossEntropyLoss()(tx, torch.from_numpy(probs)))
    assert float(L.CrossEntropyLoss()(x, probs)) == pytest.approx(want, rel=1e-5)
    logp = torch.log_softmax(tx, dim=1)
    want = float(torch.nn.NLLLoss()(logp, torch.from_numpy(idx)))
    assert float(L.NLLLoss()(np.asarray(logp), idx)) == pytest.approx(want, rel=1e-5)

    # reduction='sum' path + our registry resolves all of them by name
    want = float(torch.nn.BCEWithLogitsLoss(reduction="sum")(tx, tt))
    assert float(L.BCEWithLogitsLoss(reduction="sum")(x, t01)) == pytest.approx(want, rel=1e-5)
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import LOSSES

    for name in ["BCELoss", "BCEWithLogitsLoss", "KLDivLoss", "NLLLoss",
                 "CrossEntropyLoss", "PoissonNLLLoss", "SoftMarginLoss",
                 "HingeEmbeddingLoss"]:
        assert LOSSES.get(name) is not None


def test_denormalize():
    x = np.array([[-1.2, 0.0, 5.0]], np.float32)
    got = np.asarray(denormalize(x, "acdc"))
    want = np.clip(np.round(x * 48.084 + 54.089), 0, 255)
    np.testing.assert_allclose(got, want)
    with pytest.raises(ValueError):
        denormalize(x, "bogus")


def test_ssim_3d_matches_torch_formula():
    import math

    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(11)
    a = rng.uniform(0, 255, (1, 13, 14, 15, 1)).astype(np.float32)  # (N, D, H, W, C)
    b = np.clip(a + rng.normal(0, 10, a.shape), 0, 255).astype(np.float32)

    size, sigma = 11, 1.5
    xs = torch.arange(size, dtype=torch.float32)
    g = 1 / (sigma * math.sqrt(2 * math.pi)) * torch.exp(-(((xs - size // 2) / (2 * sigma)) ** 2))
    k3 = g[:, None, None] * g[None, :, None] * g[None, None, :]
    k3 = (k3 / k3.sum()).view(1, 1, size, size, size)
    at = torch.from_numpy(a.transpose(0, 4, 1, 2, 3))
    bt = torch.from_numpy(b.transpose(0, 4, 1, 2, 3))
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    mu1, mu2 = F.conv3d(at, k3), F.conv3d(bt, k3)
    s1 = F.conv3d(at * at, k3) - mu1**2
    s2 = F.conv3d(bt * bt, k3) - mu2**2
    s12 = F.conv3d(at * bt, k3) - mu1 * mu2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / ((mu1**2 + mu2**2 + c1) * (s1 + s2 + c2))
    want = float(smap.mean())
    got = float(M.SSIM(dim=3)(a, b))
    assert got == pytest.approx(want, abs=5e-5)


def test_psnr_masked_none_vs_full_mask_equal():
    a, b = _fake_images(shape=(2, 16, 16, 1))
    full = np.ones((1, 16, 16, 1), np.float32)
    assert float(M.PSNR()(a, b)) == pytest.approx(float(M.PSNR()(a, b, mask=full)), rel=1e-6)
