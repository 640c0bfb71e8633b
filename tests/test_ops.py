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
         "null,conv_chain,conv_batched,lstm,refine,refine2d,refine_pad,dcn,out,out_split,warp",
         "--t", "6", "--hw", "8", "--iters", "1"]
    )
    assert set(results) == {"null", "conv_chain", "conv_batched", "lstm",
                            "refine", "refine2d", "refine_pad", "dcn", "out",
                            "out_split", "warp"}
    for name, row in results.items():
        if name == "out_split":  # nested per-piece decomposition rows
            assert all(piece["sec"] > 0 for k, piece in row.items()
                       if k != "compile_plus_run_sec")
        else:
            assert row["sec"] > 0, name


def test_windowed_warp_matches_gather():
    """max_flow=R windowed warps == the gather path (forward AND gradients)
    whenever |flow| <= R, including integer flows, zero flows, image borders
    and both padding modes; out-of-window samples contribute zero (the
    documented divergence)."""
    import jax
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.warp import (
        flow_warp,
        stn_warp,
    )

    rng = np.random.default_rng(0)
    B, H, W = 2, 9, 11
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    R = 2
    # fractional, integer, zero, and EXACTLY-at-the-bound flows.  |flow| == R
    # is the documented contract and the hard case: the quirky chain rescales
    # the flow by size/(size-1) and adds a position-dependent up-to-+0.5 px
    # shift, so the effective displacement EXCEEDS R near the right/bottom
    # edge — the internally widened window must still cover it (this case
    # silently lost a bilinear corner before the widening)
    flows = [
        rng.uniform(-R + 0.5, R - 0.5, (B, H, W, 2)).astype(np.float32),
        np.round(rng.uniform(-R + 1, R - 1, (B, H, W, 2))).astype(np.float32),
        np.zeros((B, H, W, 2), np.float32),
        np.full((B, H, W, 2), float(R), np.float32),
        np.full((B, H, W, 2), -float(R), np.float32),
        rng.uniform(-R, R, (B, H, W, 2)).astype(np.float32),
    ]
    for flow in flows:
        flow = jnp.asarray(flow)
        want = flow_warp(x, flow)
        got = flow_warp(x, flow, max_flow=R)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

        def loss_gather(x, f):
            return jnp.sum(jnp.sin(flow_warp(x, f)) * 0.3)

        def loss_win(x, f):
            return jnp.sum(jnp.sin(flow_warp(x, f, max_flow=R)) * 0.3)

        gx_w, gf_w = jax.grad(loss_gather, argnums=(0, 1))(x, flow)
        gx_g, gf_g = jax.grad(loss_win, argnums=(0, 1))(x, flow)
        np.testing.assert_allclose(np.asarray(gx_g), np.asarray(gx_w), atol=1e-5)
        np.testing.assert_allclose(np.asarray(gf_g), np.asarray(gf_w), atol=1e-5)

    # stn (border padding): small normalized flows AND pixel flows at
    # exactly the bound (|u|·W/2 == R — the mesh offset adds ±0.5 px on top,
    # covered by the internal window widening)
    for u, v in [
        (rng.uniform(-0.05, 0.05, (B, H, W)), rng.uniform(-0.05, 0.05, (B, H, W))),
        (np.full((B, H, W), 2.0 * R / W), np.full((B, H, W), -2.0 * R / H)),
    ]:
        u = jnp.asarray(u.astype(np.float32))
        v = jnp.asarray(v.astype(np.float32))
        want = stn_warp(x, u, v, "border")
        got = stn_warp(x, u, v, "border", max_flow=R)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)

    # out-of-window flow: 'zeros' mode drops the sample to zero...
    big = jnp.asarray(np.full((B, H, W, 2), R + 3, np.float32))
    got_big = flow_warp(x, big, max_flow=R)
    np.testing.assert_allclose(np.asarray(got_big), 0.0, atol=1e-6)
    # ...while 'border' mode saturates: the displacement clamps to the
    # window — a shifted read of real pixels, never a hole
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.warp import (
        windowed_sample,
    )

    off_big = jnp.full((B, H, W), R + 3.7, jnp.float32)
    off_r = jnp.full((B, H, W), float(R), jnp.float32)
    got_sat = windowed_sample(x, off_big, off_big, R, "border")
    want_sat = windowed_sample(x, off_r, off_r, R, "border")
    np.testing.assert_allclose(np.asarray(got_sat), np.asarray(want_sat), atol=1e-6)
    assert float(jnp.max(jnp.abs(got_sat))) > 0.1  # real pixels, not zeros


def test_windowed_warp_nets_match_exact():
    """TOFlowNet/FRVSRNet with max_flow set == exact nets while the learned
    flows stay in-window — checked at init AND after a few training steps on
    the EXACT net (so the flow branches emit genuinely nonzero flows)."""
    import jax
    import jax.numpy as jnp
    import optax

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        models as M,
    )

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 3, 16, 16, 1)), jnp.float32)

    def trained_variables(model, variables, target_of):
        """5 Adam steps on the exact net; returns updated variables."""
        variables = dict(variables)
        params, rest = variables.pop("params"), variables
        tx = optax.adam(1e-3)
        opt = tx.init(params)
        t = jnp.asarray(rng.standard_normal(target_of), jnp.float32)

        @jax.jit
        def step(p, s):
            def loss(p):
                out = model.apply({"params": p, **rest}, x)
                out = out if not isinstance(out, (tuple, list)) else out[0]
                return jnp.mean(jnp.abs(out - t))

            val, g = jax.value_and_grad(loss)(p)
            u, s = tx.update(g, s, p)
            return optax.apply_updates(p, u), s

        for _ in range(5):
            params, opt = step(params, opt)
        return {"params": params, **rest}

    kwargs = dict(in_channels=1, out_channels=1, num_frames=3, upscale_factor=4)
    exact = M.TOFlowNet(**kwargs)
    windowed = M.TOFlowNet(**kwargs, max_flow=4)
    v = jax.jit(exact.init)(jax.random.PRNGKey(0), x)
    for variables in (v, trained_variables(exact, v, (1, 64, 64, 1))):
        np.testing.assert_allclose(
            np.asarray(windowed.apply(variables, x)),
            np.asarray(exact.apply(variables, x)), atol=1e-4,
        )

    fr_kwargs = dict(in_channels=1, out_channels=1, upscale_factor=4,
                     num_resblocks=1, is_prediction=True)
    exact = M.FRVSRNet(**fr_kwargs)
    windowed = M.FRVSRNet(**fr_kwargs, max_flow=4)
    v = jax.jit(exact.init)(jax.random.PRNGKey(1), x)
    for variables in (v, trained_variables(exact, v, (1, 3, 64, 64, 1))):
        np.testing.assert_allclose(
            np.asarray(windowed.apply(variables, x)),
            np.asarray(exact.apply(variables, x)), atol=1e-4,
        )


def test_flow_warp_bf16_coordinates_are_exact():
    """Coordinate math must run in f32 even under bf16 compute: bf16 cannot
    represent pixel indices above 256, which made zero-flow warps of
    x4-upscaled frames return values off by hundreds of gray levels."""
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.warp import (
        flow_warp,
        stn_warp,
    )

    W = 320
    ramp = np.broadcast_to(
        np.arange(W, dtype=np.float32)[None, None, :, None], (1, 8, W, 1)
    )
    x16 = jnp.asarray(ramp, jnp.bfloat16)
    x32 = x16.astype(jnp.float32)  # identical VALUES, f32 carrier
    # the reference's quirky normalize/unnormalize chain is not an identity,
    # so compare bf16-carried against f32-carried warps of the SAME values:
    # only the coordinate arithmetic may differ, and it must not (pre-fix the
    # bf16 coordinates were off by whole pixels past 256 — error up to 240)
    out16 = flow_warp(x16, jnp.zeros((1, 8, W, 2), jnp.bfloat16))
    out32 = flow_warp(x32, jnp.zeros((1, 8, W, 2), jnp.float32))
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16, np.float32), np.asarray(out32), atol=1.01
    )
    s16 = stn_warp(
        x16, jnp.zeros((1, 8, W), jnp.bfloat16), jnp.zeros((1, 8, W), jnp.bfloat16)
    )
    s32 = stn_warp(x32, jnp.zeros((1, 8, W), jnp.float32), jnp.zeros((1, 8, W), jnp.float32))
    np.testing.assert_allclose(np.asarray(s16, np.float32), np.asarray(s32), atol=1.01)


def test_perf_probe_remat_train_smoke():
    """remat_train probe graph guards (tiny shapes override the protocol)."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        perf_probe,
    )
    import jax.numpy as jnp

    row = perf_probe.probe_remat_train(
        0, 0, jnp.float32, 1, batch=2, patch=8, tc=3, margins=1, feats=(6, 6)
    )
    assert row["plain_steps_per_sec"] > 0 and row["remat_steps_per_sec"] > 0
    assert row["remat_slowdown"] > 0
    # the memory claim the knob exists for
    assert row["remat_temp_mb"] < row["plain_temp_mb"]


def test_pred_pipeline_ab_smoke():
    """The pipelined-vs-eager predictor A/B tool runs end-to-end on CPU and
    reports both modes (guards the tool against predictor/dataset drift)."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        pred_pipeline_ab,
    )

    row = pred_pipeline_ab.main(
        ["--device", "cpu", "--frames", "8", "--hr", "48",
         "--feats", "6", "--margins", "2", "--rounds", "1"]
    )
    assert row["pipelined_sec"] > 0 and row["eager_sec"] > 0
    assert row["items"] == 4  # 2 patients x 2 slices in the test split


def test_pred_pipeline_ab_restores_env(monkeypatch):
    """The A/B tool must not leak EVSR_EAGER_EVAL into the calling process
    (later predictor runs would silently use the eager path)."""
    import os

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        pred_pipeline_ab,
    )

    monkeypatch.delenv("EVSR_EAGER_EVAL", raising=False)
    pred_pipeline_ab.main(
        ["--device", "cpu", "--frames", "6", "--hr", "48",
         "--feats", "6", "--margins", "1", "--rounds", "1"]
    )
    assert "EVSR_EAGER_EVAL" not in os.environ
