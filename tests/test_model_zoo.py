"""Shape/smoke + gradient-flow tests for every net in the zoo."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import models as M

B, H, W, R = 2, 16, 16, 4


def _lr(shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _init_and_run(model, *inputs, train_kwarg=False):
    kwargs = {"train": False} if train_kwarg else {}
    variables = model.init(jax.random.PRNGKey(0), *inputs, **kwargs)
    out = model.apply(variables, *inputs, **kwargs)
    return variables, out


def test_bicubic_shapes():
    model = M.Bicubic(upscale_factor=4)
    _, out = _init_and_run(model, _lr((B, H, W, 1)))
    assert out.shape == (B, H * 4, W * 4, 1)


def test_edsr_shapes():
    model = M.EDSRNet(1, 1, num_resblocks=2, num_features=8, upscale_factor=4)
    variables, out = _init_and_run(model, _lr((B, H, W, 1)))
    assert out.shape == (B, H * 4, W * 4, 1)


@pytest.mark.parametrize("r", [2, 3, 4])
def test_edsr_factors(r):
    model = M.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=r)
    _, out = _init_and_run(model, _lr((1, 8, 8, 1)))
    assert out.shape == (1, 8 * r, 8 * r, 1)


def test_srfb_shapes():
    model = M.SRFBNet(1, 1, num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    _, outs = _init_and_run(model, _lr((B, H, W, 1)))
    assert len(outs) == 2
    assert outs[-1].shape == (B, H * 4, W * 4, 1)


def test_drf_sisr_shapes():
    model = M.DRFSISRNet(1, 1, num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    _, outs = _init_and_run(model, _lr((B, H, W, 1)))
    assert len(outs) == 2
    assert outs[-1].shape == (B, H * 4, W * 4, 1)


def test_drf_net_shapes():
    model = M.DRFNet(1, 1, num_features=8, num_groups=2, upscale_factor=4)
    _, out = _init_and_run(model, _lr((B, 5, H, W, 1)))
    assert out.shape == (B, 5, H * 4, W * 4, 1)


def test_drf_net_scan_matches_unrolled_semantics():
    """Frame 0 of DRFNet must equal DRFSISRNet's first step (hidden reset)."""
    video = M.DRFNet(1, 1, num_features=8, num_groups=2, upscale_factor=4)
    x = _lr((1, 3, H, W, 1))
    variables, out = _init_and_run(video, x)
    sisr = M.DRFSISRNet(1, 1, num_steps=1, num_features=8, num_groups=2, upscale_factor=4)
    # graft video params into the sisr tree (names: in_block / steps.f_block / steps.out_block)
    p = variables["params"]
    sisr_params = {
        "params": {
            "in_block": p["in_block"],
            "f_block": p["steps"]["f_block"],
            "out_block": p["steps"]["out_block"],
        }
    }
    out0 = sisr.apply(sisr_params, x[:, 0])[-1]
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out0), atol=1e-5)


def test_duf_shapes():
    model = M.DUFNet(1, 1, num_frames=7, size_filter=5, upscale_factor=4, backbone="_DenseLayer16")
    variables, out = _init_and_run(model, _lr((1, 7, H, W, 1)), train_kwarg=True)
    assert out.shape == (1, H * 4, W * 4, 1)
    assert "batch_stats" in variables


def test_duf_train_mode_updates_stats():
    model = M.DUFNet(1, 1, num_frames=7, size_filter=5, upscale_factor=4, backbone="_DenseLayer16")
    x = _lr((1, 7, H, W, 1))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    out, mutated = model.apply(variables, x, train=True, mutable=["batch_stats"])
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_toflow_shapes():
    model = M.TOFlowNet(1, 1, num_frames=3, upscale_factor=4)
    _, out = _init_and_run(model, _lr((1, 3, 12, 12, 1)), train_kwarg=True)
    assert out.shape == (1, 48, 48, 1)


def test_frvsr_shapes_and_branches():
    model = M.FRVSRNet(1, 1, upscale_factor=4, num_resblocks=2)
    _, out = _init_and_run(model, _lr((1, 3, H, W, 1)))
    sr, warped = out
    assert sr.shape == (1, 3, H * 4, W * 4, 1)
    assert warped.shape == (1, 3, H, W, 1)


def test_frvsr_sr_gradient_blocked_through_warp():
    """The previous SR frame is detached before warping (ref frvsr_net.py:49)."""
    model = M.FRVSRNet(1, 1, upscale_factor=4, num_resblocks=1)
    x = _lr((1, 2, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(v):
        sr, _ = model.apply(v, x)
        return jnp.sum(sr)

    g = jax.grad(loss)(variables)
    assert all(np.all(np.isfinite(leaf)) for leaf in jax.tree.leaves(g))


def test_rbp_shapes():
    model = M.RBPNet(
        1, 1, base_filter=8, feat=8, num_stages=3, num_resblocks=2, num_frames=3, upscale_factor=4
    )
    _, out = _init_and_run(model, _lr((1, 3, H, W, 1)))
    assert out.shape == (1, H * 4, W * 4, 1)


def test_refine_net_registered_and_all_names():
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import NETS

    for name in [
        "Bicubic", "EDSRNet", "SRFBNet", "DRFSISRNet", "DUFNet",
        "RBPNet", "TOFlowNet", "DRFNet", "FRVSRNet", "RefineNet",
    ]:
        assert name in NETS


def test_gradients_flow_everywhere_edsr():
    model = M.EDSRNet(1, 1, num_resblocks=2, num_features=8, upscale_factor=2)
    x = _lr((1, 8, 8, 1))
    variables = model.init(jax.random.PRNGKey(0), x)

    def loss(v):
        return jnp.mean(jnp.square(model.apply(v, x)))

    g = jax.grad(loss)(variables)
    for leaf in jax.tree.leaves(g):
        assert np.any(np.asarray(leaf) != 0)


def test_duf_forward_under_bf16():
    """The constant im2col identity kernel must follow the compute dtype
    (a f32 constant crashes the conv when inputs are cast to bf16)."""
    import jax
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        DUFNet,
    )

    model = DUFNet(1, 1, num_frames=7, size_filter=5, upscale_factor=4,
                   backbone="_DenseLayer16")
    x = jnp.zeros((1, 7, 8, 8, 1), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x)
    v16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), v)
    out = model.apply(v16, x.astype(jnp.bfloat16))
    assert out.shape == (1, 32, 32, 1)
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_torch_batch_norm_matches_torch_exactly():
    """flax ``nn.BatchNorm`` updates running_var with the BIASED batch
    variance; torch uses the UNBIASED one (Bessel n/(n-1)) while normalizing
    with the biased one in train mode.  ``TorchBatchNorm`` must match torch on
    all three observables: train-mode outputs, the running stats after several
    momentum updates, and eval-mode outputs from the drifted stats (the axis
    where the flax module diverges).  Pins DUF/TOFlow BN dynamics
    (reference ``duf_net.py:41-44``, ``toflow_net.py:25-33``)."""
    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models.common import (
        TorchBatchNorm,
    )

    rng = np.random.default_rng(0)
    C = 5
    tbn = torch.nn.BatchNorm2d(C)
    with torch.no_grad():
        tbn.weight.copy_(torch.from_numpy(rng.standard_normal(C).astype(np.float32)))
        tbn.bias.copy_(torch.from_numpy(rng.standard_normal(C).astype(np.float32)))
    mod = TorchBatchNorm(use_running_average=False)
    x0 = rng.standard_normal((3, C, 8, 8)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x0.transpose(0, 2, 3, 1)))
    params = dict(variables["params"])
    params["scale"] = jnp.asarray(tbn.weight.detach().numpy())
    params["bias"] = jnp.asarray(tbn.bias.detach().numpy())
    stats = variables["batch_stats"]

    tbn.train()
    for step in range(4):
        x = rng.standard_normal((3, C, 8, 8)).astype(np.float32) * (step + 1) + step
        with torch.no_grad():
            want = tbn(torch.from_numpy(x)).numpy()
        got, mutated = mod.apply(
            {"params": params, "batch_stats": stats},
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            mutable=["batch_stats"],
        )
        stats = mutated["batch_stats"]
        np.testing.assert_allclose(
            np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-6
        )
    np.testing.assert_allclose(
        np.asarray(stats["mean"]), tbn.running_mean.numpy(), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(stats["var"]), tbn.running_var.numpy(), atol=5e-6
    )
    # the tolerance genuinely distinguishes unbiased from biased updates:
    # a flax-style biased update shifts var by ~var/n per step, far above atol
    n = 3 * 8 * 8
    assert (np.asarray(stats["var"]).max() / n) > 100 * 5e-6

    tbn.eval()
    x = rng.standard_normal((2, C, 8, 8)).astype(np.float32)
    with torch.no_grad():
        want = tbn(torch.from_numpy(x)).numpy()
    got = TorchBatchNorm(use_running_average=True).apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=5e-6)


def test_edvr_residual_block_bias_init_is_zero():
    """Reference arch_util.initialize_weights zeroes residual conv biases
    (arch_util.py:15-16); fresh EDVR RBs must match for from-scratch
    training parity."""
    import jax
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models.edvr_net import (
        ResidualBlockNoBN,
    )

    rb = ResidualBlockNoBN(nf=8)
    v = rb.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, 8)))
    for name in ("conv1", "conv2"):
        bias = np.asarray(v["params"][name]["bias"])
        np.testing.assert_array_equal(bias, 0.0)
        kernel = np.asarray(v["params"][name]["kernel"])
        assert kernel.std() > 0  # weights stay kaiming-scaled, not zeroed


class TestScanStepRemat:
    """remat: true on the recurrent nets — per-SCAN-STEP rematerialization.

    Contract: gradients are BIT-identical to the plain net (same ops, only
    the backward's residual-saving policy changes), and XLA's compiled temp
    memory genuinely shrinks (the reverted top-level ``jax.checkpoint``
    trainer knob saved nothing — PERF_NOTES.md "Remat").
    """

    def _refine(self, remat):
        return M.RefineNet(in_channels=1, out_channels=1, num_features=[8, 8],
                           upscale_factor=4, num_stages=2, remat=remat)

    def _frvsr(self, remat):
        return M.FRVSRNet(in_channels=1, out_channels=1, upscale_factor=4,
                          remat=remat)

    def _drf(self, remat):
        return M.DRFNet(in_channels=1, out_channels=1, num_features=8,
                        num_groups=2, upscale_factor=4, remat=remat)

    def test_refine_net_grads_bit_identical(self):
        lr = jnp.asarray(_lr((1, 6, 12, 12, 1), seed=3))
        pos = jnp.asarray(_lr((1, 6, 12, 12, 2), seed=4))
        params = self._refine(False).init(jax.random.PRNGKey(1), lr, pos)

        def loss(net):
            return lambda p: sum(jnp.sum(o ** 2) for o in net.apply(p, lr, pos))

        g0 = jax.grad(loss(self._refine(False)))(params)
        g1 = jax.grad(loss(self._refine(True)))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_frvsr_grads_match(self):
        """Same ops, but XLA re-optimizes the rematerialized forward, so
        FRVSR grads differ by float scheduling noise: measured ~7e-7 of
        each leaf's gradient scale, INDEPENDENT of clip length T (2..8) —
        i.e. a few ulps, not recurrent amplification."""
        lr = jnp.asarray(_lr((1, 6, 12, 12, 1), seed=5))
        params = self._frvsr(False).init(jax.random.PRNGKey(2), lr)

        def loss(net):
            def f(p):
                sr, lrw = net.apply(p, lr)
                return jnp.sum(sr ** 2) + jnp.sum(lrw ** 2)
            return f

        g0 = jax.grad(loss(self._frvsr(False)))(params)
        g1 = jax.grad(loss(self._frvsr(True)))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
            scale = np.max(np.abs(a)) or 1.0
            assert np.max(np.abs(a - b)) <= 1e-5 * scale

    def test_drf_grads_bit_identical(self):
        lr = jnp.asarray(_lr((1, 8, 12, 12, 1), seed=7))
        params = self._drf(False).init(jax.random.PRNGKey(0), lr)

        def loss(net):
            return lambda p: jnp.sum(net.apply(p, lr) ** 2)

        g0 = jax.grad(loss(self._drf(False)))(params)
        g1 = jax.grad(loss(self._drf(True)))(params)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    @pytest.mark.parametrize("family", ["refine", "frvsr", "drf"])
    def test_backward_temp_memory_shrinks(self, family):
        """XLA memory analysis of the compiled backward: per-step remat must
        cut temp bytes (measured 0.68x RefineNet / 0.28x FRVSR at T=10;
        0.13x DRFNet at T=20)."""
        T = 10

        def compiled_temp(remat):
            if family == "drf":
                net = self._drf(remat)
                lr = jnp.zeros((1, 20, 16, 16, 1), jnp.float32)
                params = net.init(jax.random.PRNGKey(0), lr)

                def loss(p):
                    return jnp.sum(net.apply(p, lr) ** 2)

                args = (params,)
            elif family == "refine":
                net = self._refine(remat)
                lr = jnp.zeros((2, T, 24, 24, 1), jnp.float32)
                pos = jnp.zeros((2, T, 24, 24, 2), jnp.float32)
                params = net.init(jax.random.PRNGKey(0), lr, pos)

                def loss(p):
                    return sum(jnp.sum(o ** 2) for o in net.apply(p, lr, pos))

                args = (params,)
            else:
                net = self._frvsr(remat)
                lr = jnp.zeros((1, T, 16, 16, 1), jnp.float32)
                params = net.init(jax.random.PRNGKey(0), lr)

                def loss(p):
                    sr, lrw = net.apply(p, lr)
                    return jnp.sum(sr ** 2) + jnp.sum(lrw ** 2)

                args = (params,)
            g = jax.jit(jax.grad(loss)).lower(*args).compile()
            return g.memory_analysis().temp_size_in_bytes

        plain, remat = compiled_temp(False), compiled_temp(True)
        assert remat < 0.85 * plain, (plain, remat)
