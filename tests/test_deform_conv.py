"""Deformable conv correctness (property tests — the reference's CUDA
extension cannot run here, so semantics are verified against identities)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
    EDVRNet,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.deform_conv import (
    deform_conv2d,
)

B, H, W, Cin, Cout, K = 2, 10, 9, 4, 6, 3


def _data(seed=0, dg=1):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((B, H, W, Cin)).astype(np.float32)
    w = rng.standard_normal((K, K, Cin, Cout)).astype(np.float32)
    offset = np.zeros((B, H, W, 2 * dg * K * K), np.float32)
    mask = np.ones((B, H, W, dg * K * K), np.float32)
    return x, w, offset, mask


def _regular_conv(x, w, padding=1):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), [(padding, padding)] * 2, dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def test_zero_offset_unit_mask_equals_regular_conv():
    x, w, offset, mask = _data()
    got = deform_conv2d(x, offset, w, mask=mask, padding=1)
    want = _regular_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_zero_offset_multiple_deformable_groups():
    x, w, offset, mask = _data(dg=2)
    got = deform_conv2d(x, offset, w, mask=mask, padding=1, deformable_groups=2)
    want = _regular_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)


def test_integer_offset_equals_shifted_conv():
    """Offset (+1, 0) on every tap == conv over the input shifted up by 1."""
    x, w, offset, mask = _data(seed=1)
    offset = offset.copy()
    offset[..., 0::2] = 1.0  # all y offsets +1
    got = deform_conv2d(x, offset, w, mask=mask, padding=1)
    x_shift = np.concatenate([x[:, 1:], np.zeros_like(x[:, :1])], axis=1)
    want = _regular_conv(x_shift, w)
    # interior only: at row 0 the shifted input's zero-padding hides x[0]
    # that the deformable sampler still sees
    np.testing.assert_allclose(
        np.asarray(got)[:, 1:], np.asarray(want)[:, 1:], atol=1e-4, rtol=1e-4
    )


def test_mask_scales_linearly():
    x, w, offset, mask = _data(seed=2)
    full = deform_conv2d(x, offset, w, mask=mask, padding=1)
    half = deform_conv2d(x, offset, w, mask=0.5 * mask, padding=1)
    np.testing.assert_allclose(np.asarray(half), 0.5 * np.asarray(full), atol=1e-5)


def test_fractional_offset_interpolates():
    x, w, offset, mask = _data(seed=3)
    offset_half = offset.copy()
    offset_half[..., 0::2] = 0.5
    offset_one = offset.copy()
    offset_one[..., 0::2] = 1.0
    y0 = np.asarray(deform_conv2d(x, offset, w, mask=mask, padding=1))
    y1 = np.asarray(deform_conv2d(x, offset_one, w, mask=mask, padding=1))
    yh = np.asarray(deform_conv2d(x, offset_half, w, mask=mask, padding=1))
    # bilinear in y: interior values are exactly the average
    np.testing.assert_allclose(yh[:, 2:-2], (y0[:, 2:-2] + y1[:, 2:-2]) / 2, atol=1e-4, rtol=1e-3)


def test_deform_conv_differentiable():
    x, w, offset, mask = _data(seed=4)
    offset = offset + 0.1

    def loss(w_, off_):
        return jnp.sum(deform_conv2d(x, off_, w_, mask=mask, padding=1) ** 2)

    gw, goff = jax.grad(loss, argnums=(0, 1))(jnp.asarray(w), jnp.asarray(offset))
    assert np.all(np.isfinite(gw)) and np.all(np.isfinite(goff))
    assert np.any(np.asarray(goff) != 0)  # gradients flow to offsets (the point of DCN)


def test_edvr_shapes():
    model = EDVRNet(1, 1, nf=8, nframes=3, groups=2, front_RBs=1, back_RBs=1)
    lr = np.random.default_rng(5).standard_normal((1, 3, 12, 12, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), lr)
    out = model.apply(variables, lr)
    assert out.shape == (1, 48, 48, 1)


def test_edvr_pad_path():
    model = EDVRNet(1, 1, nf=8, nframes=3, groups=2, front_RBs=1, back_RBs=1)
    lr = np.random.default_rng(6).standard_normal((1, 3, 10, 11, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), lr)
    out = model.apply(variables, lr)
    assert out.shape == (1, 40, 44, 1)


def test_edvr_init_dcn_is_half_identity_conv():
    """conv_offset_mask is zero-initialized → offsets 0, mask sigmoid(0)=0.5,
    so at init the DCN equals 0.5 x a regular conv (reference init_offset,
    deform_conv.py:270-272)."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models.edvr_net import (
        DCNPack,
    )

    rng = np.random.default_rng(7)
    x = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    feats = rng.standard_normal((1, 8, 8, 8)).astype(np.float32)
    m = DCNPack(nf=8, deformable_groups=2)
    variables = m.init(jax.random.PRNGKey(1), x, feats)
    got = m.apply(variables, x, feats)
    w = variables["params"]["weight"]
    b = variables["params"]["bias"]
    want = 0.5 * np.asarray(_regular_conv(x, w)) + np.asarray(b)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4, rtol=1e-4)


def test_dcn_module_wrappers():
    """All four reference wrapper classes exist and behave at init:
    Pack variants have zero-init offset convs → DCNv1 Pack == plain conv,
    DCNv2 Pack == 0.5·conv + bias."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.deform_conv import (
        DeformConv,
        DeformConvPack,
        ModulatedDeformConv,
        ModulatedDeformConvPack,
    )

    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)

    m = DeformConvPack(features=6, kernel_size=3, padding=1, deformable_groups=2)
    v = m.init(jax.random.PRNGKey(0), x)
    got = m.apply(v, x)
    want = _regular_conv(x, v["params"]["weight"])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4, rtol=1e-4)

    m2 = ModulatedDeformConvPack(features=6, kernel_size=3, padding=1, deformable_groups=2)
    v2 = m2.init(jax.random.PRNGKey(1), x)
    got2 = m2.apply(v2, x)
    want2 = 0.5 * np.asarray(_regular_conv(x, v2["params"]["weight"])) + np.asarray(
        v2["params"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(got2), want2, atol=1e-4, rtol=1e-4)

    # external-offset variants accept explicit offsets/mask
    offset = np.zeros((1, 8, 8, 2 * 2 * 9), np.float32)
    mask = np.ones((1, 8, 8, 2 * 9), np.float32)
    m3 = DeformConv(features=6, kernel_size=3, padding=1, deformable_groups=2)
    v3 = m3.init(jax.random.PRNGKey(2), x, offset)
    np.testing.assert_allclose(
        np.asarray(m3.apply(v3, x, offset)),
        np.asarray(_regular_conv(x, v3["params"]["weight"])),
        atol=1e-4, rtol=1e-4,
    )
    m4 = ModulatedDeformConv(features=6, kernel_size=3, padding=1, deformable_groups=2)
    v4 = m4.init(jax.random.PRNGKey(3), x, offset, mask)
    out4 = m4.apply(v4, x, offset, mask)
    assert out4.shape == (1, 8, 8, 6)


# ---------------------------------------------------------------------------
# Independent numeric oracle: brute-force port of the CUDA loop semantics
# (deform_conv_cuda_kernel.cu:190-276,570-631) — see tests/dcn_oracle.py.

from dcn_oracle import modulated_deform_conv_naive, modulated_deform_conv_torch


def _oracle_case(seed, Ho_in=6, Wo_in=5, cin=4, cout=6, k=3, dg=1, with_mask=True):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((2, Ho_in, Wo_in, cin)).astype(np.float32)
    # offsets in ±2.5 exercise interior, boundary and out-of-image taps
    return dict(
        x=x,
        weight=rng.standard_normal((k, k, cin, cout)).astype(np.float32),
        bias=rng.standard_normal((cout,)).astype(np.float32),
        rng=rng,
        dg=dg,
        k=k,
        with_mask=with_mask,
    )


def _offsets_for(case, Ho, Wo, scale=2.5):
    rng, dg, k = case["rng"], case["dg"], case["k"]
    B = case["x"].shape[0]
    offset = (rng.uniform(-scale, scale, (B, Ho, Wo, 2 * dg * k * k))).astype(np.float32)
    mask = (
        rng.uniform(0.0, 1.0, (B, Ho, Wo, dg * k * k)).astype(np.float32)
        if case["with_mask"]
        else None
    )
    return offset, mask


@pytest.mark.parametrize(
    "stride,padding,dilation,dg,with_mask",
    [
        (1, 1, 1, 1, True),
        (1, 1, 1, 2, True),
        (2, 1, 1, 1, True),
        (1, 0, 1, 1, True),
        (1, 2, 2, 2, True),
        (1, 1, 1, 2, False),  # DCNv1 (no mask)
        (2, 2, 2, 1, True),
    ],
)
def test_forward_matches_bruteforce_cuda_port(stride, padding, dilation, dg, with_mask):
    case = _oracle_case(seed=stride * 100 + padding * 10 + dilation + dg, dg=dg,
                        with_mask=with_mask)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    B, H, W, Cin = x.shape
    k = case["k"]
    Ho = (H + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    Wo = (W + 2 * padding - (dilation * (k - 1) + 1)) // stride + 1
    offset, mask = _offsets_for(case, Ho, Wo)

    got = deform_conv2d(
        x, offset, weight, mask=mask, bias=bias,
        stride=stride, padding=padding, dilation=dilation, deformable_groups=dg,
    )
    want = modulated_deform_conv_naive(
        x.transpose(0, 3, 1, 2),
        offset.transpose(0, 3, 1, 2),
        None if mask is None else mask.transpose(0, 3, 1, 2),
        weight.transpose(3, 2, 0, 1),
        bias,
        stride=stride, padding=padding, dilation=dilation, deformable_groups=dg,
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)


def test_torch_port_matches_naive_oracle():
    import torch

    case = _oracle_case(seed=7, dg=2)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    offset, mask = _offsets_for(case, x.shape[1], x.shape[2])
    want = modulated_deform_conv_naive(
        x.transpose(0, 3, 1, 2), offset.transpose(0, 3, 1, 2),
        mask.transpose(0, 3, 1, 2), weight.transpose(3, 2, 0, 1), bias,
        stride=1, padding=1, dilation=1, deformable_groups=2,
    )
    got = modulated_deform_conv_torch(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(offset.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask.transpose(0, 3, 1, 2)),
        torch.from_numpy(weight.transpose(3, 2, 0, 1)),
        torch.from_numpy(bias),
        stride=1, padding=1, dilation=1, deformable_groups=2,
    )
    np.testing.assert_allclose(got.numpy(), want, atol=3e-5, rtol=1e-4)


def test_gradients_match_torch_oracle():
    """Grads w.r.t. x/offset/mask/weight/bias: jax autodiff of the XLA
    implementation vs torch autograd of the independent oracle port."""
    import torch

    case = _oracle_case(seed=11, dg=2)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    offset, mask = _offsets_for(case, x.shape[1], x.shape[2])
    cot = np.random.default_rng(12).standard_normal(
        (x.shape[0], x.shape[1], x.shape[2], weight.shape[-1])
    ).astype(np.float32)

    def loss_jax(x_, off_, msk_, w_, b_):
        out = deform_conv2d(x_, off_, w_, mask=msk_, bias=b_, stride=1, padding=1,
                            dilation=1, deformable_groups=2)
        return jnp.sum(out * cot)

    jg = jax.grad(loss_jax, argnums=(0, 1, 2, 3, 4))(x, offset, mask, weight, bias)

    tx = torch.from_numpy(x.transpose(0, 3, 1, 2)).requires_grad_(True)
    toff = torch.from_numpy(offset.transpose(0, 3, 1, 2)).requires_grad_(True)
    tmsk = torch.from_numpy(mask.transpose(0, 3, 1, 2)).requires_grad_(True)
    tw = torch.from_numpy(weight.transpose(3, 2, 0, 1)).requires_grad_(True)
    tb = torch.from_numpy(bias).requires_grad_(True)
    out = modulated_deform_conv_torch(tx, toff, tmsk, tw, tb, stride=1, padding=1,
                                      dilation=1, deformable_groups=2)
    (out * torch.from_numpy(cot.transpose(0, 3, 1, 2))).sum().backward()

    np.testing.assert_allclose(np.asarray(jg[0]), tx.grad.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jg[1]), toff.grad.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jg[2]), tmsk.grad.numpy().transpose(0, 2, 3, 1),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jg[3]), tw.grad.numpy().transpose(2, 3, 1, 0),
                               atol=1e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(jg[4]), tb.grad.numpy(), atol=1e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# Windowed (gather-free, shift-and-weight) fast path — 9.5x the gather path
# on TPU (PERF_NOTES round 2); exact for |offset| <= max_offset.

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.deform_conv import (
    deform_conv2d_windowed,
)


@pytest.mark.parametrize("padding,dg,with_mask", [(1, 2, True), (0, 1, True), (2, 2, False)])
def test_windowed_matches_bruteforce_in_window(padding, dg, with_mask):
    """Against the independent scalar-loop CUDA port, offsets within the
    window: identical to the reference semantics."""
    case = _oracle_case(seed=padding * 10 + dg, dg=dg, with_mask=with_mask)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    B, H, W, _ = x.shape
    k = case["k"]
    Ho, Wo = H + 2 * padding - (k - 1), W + 2 * padding - (k - 1)
    offset, mask = _offsets_for(case, Ho, Wo, scale=1.9)  # inside R=2

    got = deform_conv2d_windowed(
        x, offset, weight, mask=mask, bias=bias,
        padding=padding, deformable_groups=dg, max_offset=2,
    )
    want = modulated_deform_conv_naive(
        x.transpose(0, 3, 1, 2), offset.transpose(0, 3, 1, 2),
        None if mask is None else mask.transpose(0, 3, 1, 2),
        weight.transpose(3, 2, 0, 1), bias,
        stride=1, padding=padding, dilation=1, deformable_groups=dg,
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-5, rtol=1e-4)


def test_windowed_truncates_out_of_window_samples():
    """Samples farther than max_offset contribute ZERO (the documented
    divergence from the unbounded gather semantics)."""
    case = _oracle_case(seed=99, dg=1)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    offset = np.full((2, x.shape[1], x.shape[2], 2 * K * K), 5.0, np.float32)
    mask = np.ones((2, x.shape[1], x.shape[2], K * K), np.float32)
    out = deform_conv2d_windowed(
        x, offset, weight, mask=mask, bias=bias,
        padding=1, deformable_groups=1, max_offset=2,
    )
    # every sample truncated -> output is exactly the bias
    np.testing.assert_allclose(
        np.asarray(out), np.broadcast_to(bias, out.shape), atol=1e-6
    )


def test_windowed_gradients_match_gather_path():
    case = _oracle_case(seed=21, dg=2)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    offset, mask = _offsets_for(case, x.shape[1], x.shape[2], scale=1.5)

    def loss(fn):
        def inner(x_, off_, msk_, w_, b_):
            out = fn(x_, off_, w_, mask=msk_, bias=b_, padding=1, deformable_groups=2)
            return jnp.sum(out ** 2)
        return jax.grad(inner, argnums=(0, 1, 2, 3, 4))(x, offset, mask, weight, bias)

    g_gather = loss(deform_conv2d)
    g_windowed = loss(
        lambda *a, **kw: deform_conv2d_windowed(*a, max_offset=2, **kw)
    )
    for a, b in zip(g_gather, g_windowed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_edvr_windowed_dcn_matches_gather():
    """EDVRNet with dcn_max_offset set reproduces the exact-gather net when
    the learned offsets are small (they are zero-init in the reference)."""
    kwargs = dict(in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
                  front_RBs=1, back_RBs=1)
    lr = np.random.default_rng(8).standard_normal((1, 5, 12, 12, 1)).astype(np.float32)
    exact = EDVRNet(**kwargs)
    variables = exact.init(jax.random.PRNGKey(0), lr)
    fast = EDVRNet(**kwargs, dcn_max_offset=3)
    a = exact.apply(variables, lr)
    b = fast.apply(variables, lr)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_windowed_gradients_match_at_integer_offsets():
    """The CUDA bilinear's derivative at integer offsets is the forward
    difference (frac = 0 exactly, e.g. EDVR's zero-init offsets at step 1);
    the floor-indicator weights reproduce it — a tent relu(1-|off-d|) would
    tie-split across jnp.maximum and diverge here."""
    case = _oracle_case(seed=31, dg=2)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    B, H, W, _ = x.shape
    offset = np.zeros((B, H, W, 2 * 2 * 9), np.float32)  # exactly integer
    mask = np.random.default_rng(32).uniform(0, 1, (B, H, W, 2 * 9)).astype(np.float32)

    def loss(fn):
        def inner(x_, off_, w_):
            out = fn(x_, off_, w_, mask=mask, bias=bias, padding=1, deformable_groups=2)
            return jnp.sum(out ** 2)
        return jax.grad(inner, argnums=(0, 1))(x, offset, weight)

    g_gather = loss(deform_conv2d)
    g_windowed = loss(lambda *a, **kw: deform_conv2d_windowed(*a, max_offset=2, **kw))
    for a, b in zip(g_gather, g_windowed):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4, rtol=1e-3)


def test_windowed_attenuation_is_symmetric_beyond_window():
    """Beyond the window the missing corner drops: contributions attenuate
    LINEARLY and symmetrically in the offset sign, vanishing at R+1."""
    case = _oracle_case(seed=41, dg=1)
    x, weight, bias = case["x"], case["weight"], case["bias"]
    B, H, W, _ = x.shape

    def out_for(off_val):
        offset = np.full((B, H, W, 2 * K * K), off_val, np.float32)
        return np.asarray(deform_conv2d_windowed(
            x, offset, weight, bias=bias, padding=1, deformable_groups=1, max_offset=2,
        )) - bias

    plus, minus = out_for(2.5), out_for(-2.5)
    # both attenuated relative to an in-window sample, by the same factor
    assert np.abs(plus).sum() > 0 and np.abs(minus).sum() > 0
    ratio = np.abs(plus).sum() / np.abs(out_for(2.0) - 0).sum()
    ratio_neg = np.abs(minus).sum() / np.abs(out_for(-2.0) - 0).sum()
    assert ratio < 0.8 and ratio_neg < 0.8  # attenuated
    np.testing.assert_allclose(out_for(3.0), 0.0, atol=1e-5)  # vanished at R+1
    np.testing.assert_allclose(out_for(-3.0), 0.0, atol=1e-5)


def test_edvr_windowed_training_grads_match_gather():
    """Training through EDVR with the windowed DCN: gradients (incl. the
    conv_offset_mask params feeding the deformable sampling) match the
    exact-gather net at the zero-init offset state."""
    kwargs = dict(in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
                  front_RBs=1, back_RBs=1)
    rng = np.random.default_rng(9)
    lr = rng.standard_normal((1, 5, 8, 8, 1)).astype(np.float32)
    hr = rng.standard_normal((1, 32, 32, 1)).astype(np.float32)
    exact = EDVRNet(**kwargs)
    variables = exact.init(jax.random.PRNGKey(0), lr)
    fast = EDVRNet(**kwargs, dcn_max_offset=3)

    def loss(model):
        return jax.grad(
            lambda p: jnp.mean(jnp.abs(model.apply({"params": p}, lr) - hr))
        )(variables["params"])

    g_exact, g_fast = loss(exact), loss(fast)
    flat_e = jax.tree.leaves(g_exact)
    flat_f = jax.tree.leaves(g_fast)
    for a, b in zip(flat_e, flat_f):
        assert np.all(np.isfinite(np.asarray(b)))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-3)
