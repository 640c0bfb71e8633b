"""Numerical parity of every zoo net against the dynamically-loaded PyTorch
reference: random reference weights are imported into the flax models and
outputs compared on identical inputs."""
import numpy as np
import pytest

import jax

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import models as M
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils.torch_import import (
    variables_from_torch_state_dict,
)
from reference_loader import load_reference_module, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def _load(modname):
    load_reference_module("src/model/nets/base_net.py", "src.model.nets.base_net")
    return load_reference_module(f"src/model/nets/{modname}.py", f"src.model.nets.{modname}")


def _np(t):
    return t.detach().numpy()


def _nhwc(t):  # torch (B, C, H, W) → (B, H, W, C)
    return _np(t).transpose(0, 2, 3, 1)


def _to_torch_frames(lr):  # (B, T, H, W, C) → list of (B, C, H, W)
    import torch

    return [torch.from_numpy(lr[:, t].transpose(0, 3, 1, 2)).contiguous() for t in range(lr.shape[1])]


def _check(got, want, atol=2e-4, rtol=1e-3):
    np.testing.assert_allclose(np.asarray(got), want, atol=atol, rtol=rtol)


def test_edsr_parity():
    import torch

    ref_mod = _load("edsr_net")
    torch.manual_seed(0)
    ref = ref_mod.EDSRNet(1, 1, num_resblocks=3, num_features=8, upscale_factor=4)
    ref.eval()
    variables = variables_from_torch_state_dict("EDSRNet", ref.state_dict())
    model = M.EDSRNet(1, 1, num_resblocks=3, num_features=8, upscale_factor=4)
    x = np.random.default_rng(0).standard_normal((2, 12, 10, 1)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    _check(model.apply(variables, x), want)


def test_srfb_parity():
    import torch

    ref_mod = _load("srfb_net")
    torch.manual_seed(1)
    ref = ref_mod.SRFBNet(1, 1, num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    ref.eval()
    variables = variables_from_torch_state_dict("SRFBNet", ref.state_dict())
    model = M.SRFBNet(1, 1, num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    x = np.random.default_rng(1).standard_normal((1, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        wants = [_nhwc(o) for o in ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    gots = model.apply(variables, x)
    assert len(gots) == len(wants)
    for g, w in zip(gots, wants):
        _check(g, w)


def test_drf_sisr_parity():
    import torch

    ref_mod = _load("drf_sisr_net")
    torch.manual_seed(2)
    ref = ref_mod.DRFSISRNet(1, 1, num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    ref.eval()
    variables = variables_from_torch_state_dict("DRFSISRNet", ref.state_dict())
    model = M.DRFSISRNet(1, 1, num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    x = np.random.default_rng(2).standard_normal((1, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        wants = [_nhwc(o) for o in ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))]
    gots = model.apply(variables, x)
    for g, w in zip(gots, wants):
        _check(g, w)


def test_drf_net_parity():
    import torch

    ref_mod = _load("drf_net")
    torch.manual_seed(3)
    ref = ref_mod.DRFNet(1, 1, num_features=8, num_groups=2, upscale_factor=4)
    ref.eval()
    variables = variables_from_torch_state_dict("DRFNet", ref.state_dict())
    model = M.DRFNet(1, 1, num_features=8, num_groups=2, upscale_factor=4)
    lr = np.random.default_rng(3).standard_normal((1, 4, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        wants = [_nhwc(o) for o in ref(_to_torch_frames(lr))]
    got = np.asarray(model.apply(variables, lr))
    for t, w in enumerate(wants):
        _check(got[:, t], w)


def test_toflow_parity():
    import torch

    ref_mod = _load("toflow_net")
    torch.manual_seed(4)
    ref = ref_mod.TOFlowNet(1, 1, num_frames=3, upscale_factor=4)
    ref.eval()
    variables = variables_from_torch_state_dict("TOFlowNet", ref.state_dict())
    assert "batch_stats" in variables
    model = M.TOFlowNet(1, 1, num_frames=3, upscale_factor=4)
    lr = np.random.default_rng(4).uniform(-1, 1, (1, 3, 12, 12, 1)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(_to_torch_frames(lr)))
    got = model.apply(variables, lr, train=False)
    _check(got, want, atol=5e-4)


def test_frvsr_parity():
    import torch

    ref_mod = _load("frvsr_net")
    torch.manual_seed(5)
    ref = ref_mod.FRVSRNet(1, 1, upscale_factor=4, num_resblocks=2)
    ref.eval()
    variables = variables_from_torch_state_dict("FRVSRNet", ref.state_dict())
    model = M.FRVSRNet(1, 1, upscale_factor=4, num_resblocks=2)
    lr = np.random.default_rng(5).uniform(-1, 1, (1, 3, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        sr_w, lr_w = ref(_to_torch_frames(lr))
    sr_g, lrw_g = model.apply(variables, lr)
    for t in range(3):
        _check(np.asarray(sr_g)[:, t], _nhwc(sr_w[t]), atol=5e-4)
        _check(np.asarray(lrw_g)[:, t], _nhwc(lr_w[t]), atol=5e-4)

    # FNet's pad-to-/8 path (reference frvsr_net.py:81-87): non-multiple H/W
    lr = np.random.default_rng(6).uniform(-1, 1, (1, 2, 10, 9, 1)).astype(np.float32)
    with torch.no_grad():
        sr_w, lr_w = ref(_to_torch_frames(lr))
    sr_g, lrw_g = model.apply(variables, lr)
    for t in range(2):
        _check(np.asarray(sr_g)[:, t], _nhwc(sr_w[t]), atol=5e-4)
        _check(np.asarray(lrw_g)[:, t], _nhwc(lr_w[t]), atol=5e-4)


def test_rbp_parity():
    import torch

    ref_mod = _load("rbp_net")
    torch.manual_seed(6)
    kw = dict(base_filter=8, feat=8, num_stages=3, num_resblocks=2, num_frames=3, upscale_factor=4)
    ref = ref_mod.RBPNet(1, 1, **kw)
    ref.eval()
    variables = variables_from_torch_state_dict("RBPNet", ref.state_dict())
    model = M.RBPNet(1, 1, **kw)
    lr = np.random.default_rng(6).uniform(-1, 1, (1, 3, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(_to_torch_frames(lr)))  # note: ref mutates the list
    got = model.apply(variables, lr)
    _check(got, want, atol=5e-4)


def test_duf_parity():
    import torch

    ref_mod = _load("duf_net")
    torch.manual_seed(7)
    kw = dict(num_frames=7, size_filter=5, upscale_factor=4, backbone="_DenseLayer16")
    ref = ref_mod.DUFNet(1, 1, **kw)
    ref.eval()
    variables = variables_from_torch_state_dict("DUFNet", ref.state_dict())
    assert "batch_stats" in variables
    model = M.DUFNet(1, 1, **kw)
    lr = np.random.default_rng(7).uniform(-1, 1, (1, 7, 8, 8, 1)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(_to_torch_frames(lr)))
    got = model.apply(variables, lr, train=False)
    _check(got, want, atol=5e-4)


def test_grid_sample_parity_against_torch():
    import torch
    import torch.nn.functional as F

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.warp import (
        grid_sample,
    )

    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 9, 7, 3)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, (2, 5, 6, 2)).astype(np.float32)
    for pad in ["zeros", "border"]:
        want = F.grid_sample(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            torch.from_numpy(grid),
            mode="bilinear",
            padding_mode=pad,
            align_corners=False,
        ).numpy()
        got = np.asarray(grid_sample(x, grid, padding_mode=pad)).transpose(0, 3, 1, 2)
        np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# EDVR: full-net parity against the reference EDVR_arch running on CPU with
# the CUDA dcn extension replaced by the independent torch oracle
# (tests/dcn_oracle.py — itself verified against a scalar-loop port of
# deform_conv_cuda_kernel.cu in test_deform_conv.py).

def _edvr_pair(seed, **kwargs):
    import torch

    from reference_loader import load_reference_edvr

    ref_mod = load_reference_edvr()
    torch.manual_seed(seed)
    defaults = dict(in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
                    front_RBs=2, back_RBs=2)
    defaults.update(kwargs)
    ref = ref_mod.EDVRNet(**defaults)
    # the Pack conv_offset_mask is zero-init (reference deform_conv.py:270-272);
    # randomize it so the deformable sampling path is actually exercised
    with torch.no_grad():
        for name, p in ref.named_parameters():
            if "conv_offset_mask" in name:
                p.normal_(0.0, 0.08)
    ref.eval()
    variables = variables_from_torch_state_dict("EDVRNet", ref.state_dict())
    model = M.EDVRNet(**defaults)
    return ref, model, variables


@pytest.mark.parametrize(
    "kwargs,hw",
    [
        ({}, (12, 12)),
        ({"predeblur": True}, (12, 12)),
        ({"w_TSA": False}, (12, 12)),
        ({}, (10, 9)),  # pad-to-/4 path (EDVR_arch.py:72-80)
    ],
    ids=["default", "predeblur", "no_tsa", "pad_path"],
)
def test_edvr_full_net_parity(kwargs, hw):
    import torch

    ref, model, variables = _edvr_pair(seed=3, **kwargs)
    lr = np.random.default_rng(3).standard_normal((2, 5, *hw, 1)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(_to_torch_frames(lr)))
    got = model.apply(variables, lr)
    _check(got, want, atol=5e-4, rtol=1e-3)


def test_edvr_tsa_fusion_piecewise_parity():
    """TSA fusion in isolation (EDVR_arch.py:254-321) on random aligned
    features — catches errors the full-net residual base could mask."""
    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models.edvr_net import (
        TSAFusion,
    )
    from reference_loader import load_reference_edvr

    ref_mod = load_reference_edvr()
    torch.manual_seed(4)
    ref = ref_mod.TSA_Fusion(nf=8, nframes=5, center=2).eval()
    sd = {f"tsa_fusion.{k}": v for k, v in ref.state_dict().items()}
    variables = variables_from_torch_state_dict("EDVRNet", sd)
    variables = {"params": variables["params"]["tsa_fusion"]}
    aligned = np.random.default_rng(4).standard_normal((2, 5, 12, 12, 8)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(torch.from_numpy(aligned.transpose(0, 1, 4, 2, 3)).contiguous()))
    got = TSAFusion(nf=8, nframes=5, center=2).apply(variables, aligned)
    _check(got, want, atol=2e-4, rtol=1e-3)


def test_edvr_predeblur_piecewise_parity():
    """Predeblur pyramid in isolation (EDVR_arch.py:148-188)."""
    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models.edvr_net import (
        PredeblurPyramid,
    )
    from reference_loader import load_reference_edvr

    ref_mod = load_reference_edvr()
    torch.manual_seed(5)
    ref = ref_mod.Predeblur_ResNet_Pyramid(in_channels=1, nf=8).eval()
    sd = {f"pre_deblur.{k}": v for k, v in ref.state_dict().items()}
    variables = variables_from_torch_state_dict("EDVRNet", sd)
    variables = {"params": variables["params"]["pre_deblur"]}
    x = np.random.default_rng(5).standard_normal((3, 12, 12, 1)).astype(np.float32)
    with torch.no_grad():
        want = _nhwc(ref(torch.from_numpy(x.transpose(0, 3, 1, 2))))
    got = PredeblurPyramid(in_channels=1, nf=8).apply(variables, x)
    _check(got, want, atol=2e-4, rtol=1e-3)
