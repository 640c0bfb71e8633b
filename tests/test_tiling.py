"""Fixed-shape tiled spatial inference (``ops/tiling.py``).

The contract under test: window plans partition the output with full halos
(except at true image edges), so for a fully convolutional net with
receptive-field radius <= overlap the tiled forward equals the untiled one;
and every window has the SAME shape, so a jitted tile function compiles
exactly once across arbitrary input sizes.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from fixtures import make_acdc_tree

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.tiling import (
    plan_1d,
    tiled_apply,
)


@pytest.mark.parametrize("size", [24, 25, 31, 32, 40, 57, 63, 64, 100, 241])
@pytest.mark.parametrize("tile,overlap", [(24, 4), (24, 8), (32, 8), (24, 11)])
def test_plan_1d_partitions_with_full_halos(size, tile, overlap):
    if size < tile:
        with pytest.raises(ValueError):
            plan_1d(size, tile, overlap)
        return
    plan = plan_1d(size, tile, overlap)
    lo_prev = 0
    for start, lo, hi in plan:
        assert 0 <= start <= size - tile  # clamped window
        assert lo == lo_prev and hi > lo  # spans partition [0, size)
        # full halo on each side of the owned span unless the window edge
        # IS the image edge (where the untiled net sees the same border)
        assert lo - start >= overlap or start == 0
        assert (start + tile) - hi >= overlap or start + tile == size
        lo_prev = hi
    assert lo_prev == size


def test_plan_1d_rejects_degenerate_tiles():
    with pytest.raises(ValueError):
        plan_1d(64, 16, 8)  # core would be 0
    with pytest.raises(ValueError):
        plan_1d(64, 16, -1)


def _conv_net(radius: int, upscale: int):
    """A toy strictly-convolutional SR net with KNOWN receptive-field radius:
    ``radius`` 3x3 valid-padding-free (SAME) convs + depth-to-space."""
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x):
            for _ in range(radius):
                x = nn.Conv(8, (3, 3), padding="SAME")(x)
                x = nn.relu(x)
            x = nn.Conv(upscale * upscale, (3, 3), padding="SAME")(x)
            b, h, w, c = x.shape
            x = x.reshape(b, h, w, upscale, upscale, 1)
            x = x.transpose(0, 1, 3, 2, 4, 5)
            return x.reshape(b, h * upscale, w * upscale, 1)

    return Net()


@pytest.mark.parametrize("hw", [(40, 56), (37, 53), (24, 24)])
def test_tiled_apply_exact_when_overlap_covers_rf(hw):
    # RF radius = one pixel per SAME 3x3 conv (the final HR-space reshape
    # adds none): 6 convs -> radius 6 <= overlap 8 => exact.
    net = _conv_net(radius=5, upscale=2)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, *hw, 1)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    fwd = jax.jit(lambda a: net.apply(params, a))
    want = np.asarray(fwd(jnp.asarray(x)))
    got = tiled_apply(fwd, (x,), (24, 24), overlap=8)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_tiled_apply_one_executable_across_sizes():
    net = _conv_net(radius=2, upscale=2)
    x0 = np.random.default_rng(1).standard_normal((1, 40, 40, 1)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x0[:, :24, :24]))
    shapes = set()

    @jax.jit
    def fwd(a):
        return net.apply(params, a)

    def spy(a):
        shapes.add(tuple(a.shape))
        return fwd(a)

    for hw in [(40, 40), (57, 33), (24, 31), (100, 64)]:
        x = np.random.default_rng(2).standard_normal((1, *hw, 1)).astype(np.float32)
        out = tiled_apply(spy, (x,), (24, 24), overlap=4)
        assert out.shape == (1, hw[0] * 2, hw[1] * 2, 1)
    assert shapes == {(1, 24, 24, 1)}  # every window identical ->
    assert fwd._cache_size() == 1      # ONE compiled executable for all sizes


def test_tiled_apply_video_rank5_and_passthrough_args():
    """(B, T, H, W, C) inputs window on (-3, -2); rank-3 aux args (positional
    codes) pass through whole — the RefineNet-style signature."""
    from flax import linen as nn

    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, pos):
            b, t, h, w, c = x.shape
            y = nn.Conv(4, (3, 3), padding="SAME")(x.reshape(b * t, h, w, c))
            y = nn.Conv(1, (3, 3), padding="SAME")(y).reshape(b, t, h, w, 1)
            return y + pos[:, :, None, None, :]

    net = Net()
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 3, 30, 41, 1)).astype(np.float32)
    pos = rng.standard_normal((1, 3, 1)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(pos))
    fwd = jax.jit(lambda a, p: net.apply(params, a, p))
    want = np.asarray(fwd(jnp.asarray(x), jnp.asarray(pos)))
    got = tiled_apply(fwd, (x, pos), (16, 16), overlap=3)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-5)


def test_tiled_apply_pads_images_smaller_than_tile():
    """Sub-tile images edge-pad up to one window and crop back — shape is
    preserved and interior values (>= RF from the padded border) are exact."""
    net = _conv_net(radius=2, upscale=2)
    x = np.random.default_rng(4).standard_normal((1, 20, 14, 1)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x))
    fwd = jax.jit(lambda a: net.apply(params, a))
    want = np.asarray(fwd(jnp.asarray(x)))
    got = tiled_apply(fwd, (x,), (24, 24), overlap=4)
    assert got.shape == want.shape
    # interior: the padded border perturbs only within RF (3 convs) of the
    # bottom/right edges, in HR coordinates
    np.testing.assert_allclose(
        got[:, : (20 - 3) * 2, : (14 - 3) * 2], want[:, : (20 - 3) * 2, : (14 - 3) * 2],
        atol=2e-5, rtol=1e-5,
    )


def test_tiled_apply_rejects_mismatched_spatial_inputs():
    fwd = lambda a, b: a  # noqa: E731 — never reached
    x = np.zeros((1, 32, 32, 1), np.float32)
    y = np.zeros((1, 32, 30, 1), np.float32)
    with pytest.raises(ValueError, match="share one"):
        tiled_apply(fwd, (x, y), (24, 24), overlap=4)


def test_tiled_apply_zoo_edsr_exact():
    """A real zoo net: EDSR (head conv + 2 resblocks + tail) has LR-space
    receptive-field radius ~7; overlap 10 makes the tiled forward equal the
    untiled one to reduction-order ulps."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        EDSRNet,
    )

    net = EDSRNet(
        in_channels=1, out_channels=1, num_resblocks=2, num_features=8,
        upscale_factor=4, res_scale=1.0,
    )
    x = np.random.default_rng(5).standard_normal((1, 45, 38, 1)).astype(np.float32)
    params = net.init(jax.random.PRNGKey(0), jnp.asarray(x[:, :32, :32]))
    fwd = jax.jit(lambda a: net.apply(params, a))
    want = np.asarray(fwd(jnp.asarray(x)))
    got = tiled_apply(fwd, (x,), (32, 32), overlap=10)
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-5)


# --------------------------------------------------------------- predictors

def _predictor(kind, tree, net, saved_dir, ds_kwargs=None, **pred_kwargs):
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        losses as L,
        metrics as ME,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.datasets import (
        DATASETS,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.loader import (
        Dataloader,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
        PREDICTORS,
    )

    norm = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    if kind == "sisr":
        ds = DATASETS.get("AcdcSISRDataset")(
            data_dir=str(tree["imgs_dir"]), type="test", downscale_factor=4,
            transforms=norm,
        )
        name = "AcdcSISRPredictor"
    else:
        ds = DATASETS.get("AcdcVSRRefineNetDataset")(
            data_dir=str(tree["videos_dir"]), type="test", downscale_factor=4,
            pos_code_path=str(tree["pos_code_path"]), transforms=norm,
            num_updated_frames=2, **(ds_kwargs or {}),
        )
        name = "AcdcVSRRefineNetPredictor"
    loader = Dataloader(ds, batch_size=1, shuffle=False, num_workers=0)
    pred = PREDICTORS.get(name)(
        device="cpu", net=net, test_dataloader=loader,
        loss_fns=[L.LOSSES.get("L1Loss")()], loss_weights=[1.0],
        metric_fns=[ME.METRICS.get("PSNR")(), ME.METRICS.get("SSIM")()],
        saved_dir=str(saved_dir), exported=True, **pred_kwargs,
    )
    batch = {
        k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
        for k, v in ds[0].items()
    }
    pred.init_params_like(batch)
    return pred


def test_predictor_tile_exact_for_conv_net(tmp_path):
    """SISR/EDSR end-to-end: receptive-field radius ~6 (1 resblock), overlap
    6 => the tiled predictor's scores equal the untiled ones."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        EDSRNet,
    )

    tree = make_acdc_tree(
        tmp_path / "acdc", hr_size=(96, 96), frames=3,
        patients_per_split=1, slices=1,
    )
    net = EDSRNet(
        in_channels=1, out_channels=1, num_resblocks=1, num_features=6,
        upscale_factor=4, res_scale=1.0,
    )
    exact = _predictor("sisr", tree, net, tmp_path / "exact")
    log_exact = exact.predict()

    tiled = _predictor(
        "sisr", tree, net, tmp_path / "tiled", tile=16, tile_overlap=6
    )
    tiled.params = exact.params  # identical weights
    log_tiled = tiled.predict()

    assert abs(log_tiled["PSNR"] - log_exact["PSNR"]) < 1e-3, (log_tiled, log_exact)
    assert abs(log_tiled["Loss"] - log_exact["Loss"]) < 1e-6
    rows = lambda d: sum(1 for _ in open(d / "results.csv"))  # noqa: E731
    assert rows(tmp_path / "tiled") == rows(tmp_path / "exact")


def test_predictor_tile_close_for_recurrent_net(tmp_path):
    """VSRRefineNet (recurrent — spatial RF grows with T, so tiling is
    approximate): scores stay close and the export protocol is unchanged."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        RefineNet,
    )

    tree = make_acdc_tree(
        tmp_path / "acdc", hr_size=(96, 96), frames=6,
        patients_per_split=1, slices=1,
    )
    net = RefineNet(
        in_channels=1, out_channels=1, num_features=[6, 6], upscale_factor=4,
        num_stages=2, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    exact = _predictor("vsr", tree, net, tmp_path / "exact")
    log_exact = exact.predict()

    tiled = _predictor(
        "vsr", tree, net, tmp_path / "tiled", tile=16, tile_overlap=5
    )
    tiled.params = exact.params
    log_tiled = tiled.predict()

    assert np.isfinite(log_tiled["Loss"])
    assert abs(log_tiled["PSNR"] - log_exact["PSNR"]) < 0.5, (log_tiled, log_exact)
    rows = lambda d: sum(1 for _ in open(d / "results.csv"))  # noqa: E731
    assert rows(tmp_path / "tiled") == rows(tmp_path / "exact")


def test_predictor_tile_validation():
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
        SISRPredictor,
    )

    with pytest.raises(ValueError, match="tile_overlap"):
        SISRPredictor(tile=24)
    with pytest.raises(ValueError, match="exceed"):
        SISRPredictor(tile=16, tile_overlap=8)
    with pytest.raises(ValueError, match="pad_h"):
        SISRPredictor(tile=24, tile_overlap=4, pad_h=True)
    with pytest.raises(ValueError, match="single-device"):
        SISRPredictor(tile=24, tile_overlap=4, mesh=object())


def test_predictor_tile_one_executable_across_patient_shapes(tmp_path):
    """The motivating case: patients with DIFFERENT (H, W) (DSB15-style) all
    serve through ONE compiled net executable.  Scores are CLOSE but not
    exact: the Bicubic net's align_corners=True mapping scales coordinates
    by (size-1)/(size*r-1) — a function of the TOTAL frame size — so it is
    not translation-covariant and tiling is inherently approximate for
    global-resize nets (documented in ops/tiling.py)."""
    from pathlib import Path

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        losses as L,
        metrics as ME,
        models,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.loader import (
        Dataloader,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
        VSRPredictor,
    )

    rng = np.random.default_rng(7)
    shapes = [(16, 16), (16, 24), (24, 16)]
    items = []
    for i, (h, w) in enumerate(shapes):
        lr = rng.uniform(-1, 1, (4, h, w, 1)).astype(np.float32)
        hr = rng.uniform(-1, 1, (4, h * 4, w * 4, 1)).astype(np.float32)
        items.append({"lr_imgs": lr, "hr_imgs": hr, "index": i})

    class _Ds:
        def __init__(self):
            self.data = [
                (Path(f"patient{i:03d}_2d_sequence01.nii.gz"), None)
                for i in range(len(items))
            ]

        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            return items[i]

    def make_pred(**kw):
        pred = VSRPredictor(
            device="cpu",
            test_dataloader=Dataloader(_Ds(), batch_size=1, shuffle=False),
            net=models.Bicubic(upscale_factor=4),
            loss_fns=[L.LOSSES.get("L1Loss")()],
            metric_fns=[ME.METRICS.get("PSNR")()],
            **kw,
        )
        batch = {k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
                 for k, v in items[0].items()}
        pred.init_params_like(batch)
        return pred

    log_exact = make_pred().predict()
    tiled = make_pred(tile=12, tile_overlap=3)
    log_tiled = tiled.predict()
    assert log_tiled["PSNR"] == pytest.approx(log_exact["PSNR"], abs=0.05)
    assert log_tiled["Loss"] == pytest.approx(log_exact["Loss"], rel=0.01)
    assert tiled._tile_fwd._cache_size() == 1, (
        "three patient shapes must share one compiled net executable"
    )


def test_perf_probe_tile_serving_smoke():
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        perf_probe,
    )

    row = perf_probe.probe_tile_serving(
        6, 16, jnp.float32, 1, tile=12, overlap=3, sizes=(12, 16),
        feats=(6, 6), stages=1, margins=2,
    )
    assert row["hw16"]["tiled_ms_per_clip"] > 0
    assert row["hw16"]["whole_ms_per_clip"] > 0
    assert row["tiled_compile_sec"] > 0


def test_predictor_tile_composes_with_t_bucket_and_exports(tmp_path):
    """Kitchen-sink composition: variable-length patients bucketed on T
    (t_bucket) AND tiled on (H, W) in one predictor, with CSV/GIF/PNG and
    NIfTI exports — the pads interact (bucket pads frames, tiling windows
    every padded frame) and both slice back before scoring/export."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        RefineNet,
    )

    tree = make_acdc_tree(
        tmp_path / "acdc", hr_size=(96, 96), patients_per_split=2, slices=1,
        frames_per_patient=[6, 7],
    )
    net = RefineNet(
        in_channels=1, out_channels=1, num_features=[6, 6], upscale_factor=4,
        num_stages=1, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    plain = _predictor("vsr", tree, net, tmp_path / "plain")
    log_plain = plain.predict()

    combo = _predictor(
        "vsr", tree, net, tmp_path / "combo",
        tile=16, tile_overlap=5, t_bucket=4, export_nifti=True,
    )
    combo.params = plain.params
    log_combo = combo.predict()

    assert np.isfinite(log_combo["Loss"])
    assert abs(log_combo["PSNR"] - log_plain["PSNR"]) < 0.5
    rows = lambda d: sum(1 for _ in open(d / "results.csv"))  # noqa: E731
    assert rows(tmp_path / "combo") == rows(tmp_path / "plain")
    assert list((tmp_path / "combo" / "nifti").rglob("*.nii.gz"))


def test_predictor_tile_misr_workload_exact(tmp_path):
    """MISR through the predictor tile path: rank-5 window input, rank-4
    center-frame output (the DUF/TOFlow/EDVR shape contract), exact for a
    toy net whose RF the overlap covers."""
    from pathlib import Path

    from flax import linen as nn

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        losses as L,
        metrics as ME,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.loader import (
        Dataloader,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
        MISRPredictor,
    )

    class ToyMISR(nn.Module):
        """(B, T, h, w, C) window -> (B, 2h, 2w, 1): 2 convs (RF radius 2)."""

        @nn.compact
        def __call__(self, x):
            b, t, h, w, c = x.shape
            y = x.transpose(0, 2, 3, 1, 4).reshape(b, h, w, t * c)
            y = nn.relu(nn.Conv(8, (3, 3), padding="SAME")(y))
            y = nn.Conv(4, (3, 3), padding="SAME")(y)
            y = y.reshape(b, h, w, 2, 2, 1).transpose(0, 1, 3, 2, 4, 5)
            return y.reshape(b, h * 2, w * 2, 1)

    rng = np.random.default_rng(8)
    items = [
        {"lr_imgs": rng.uniform(-1, 1, (5, 20, 28, 1)).astype(np.float32),
         "hr_img": rng.uniform(-1, 1, (40, 56, 1)).astype(np.float32),
         "index": i}
        for i in range(2)
    ]

    class _Ds:
        def __init__(self):
            self.data = [
                (Path(f"patient{i:03d}_2d_slice01.nii.gz"), None, 0)
                for i in range(len(items))
            ]

        def __len__(self):
            return len(items)

        def __getitem__(self, i):
            return items[i]

    def make_pred(**kw):
        pred = MISRPredictor(
            device="cpu",
            test_dataloader=Dataloader(_Ds(), batch_size=1, shuffle=False),
            net=ToyMISR(),
            loss_fns=[L.LOSSES.get("L1Loss")()],
            metric_fns=[ME.METRICS.get("PSNR")()],
            **kw,
        )
        batch = {k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
                 for k, v in items[0].items()}
        pred.init_params_like(batch)
        return pred

    exact = make_pred()
    log_exact = exact.predict()
    tiled = make_pred(tile=12, tile_overlap=3)
    tiled.params = exact.params
    log_tiled = tiled.predict()
    assert log_tiled["PSNR"] == pytest.approx(log_exact["PSNR"], abs=1e-4)
    assert log_tiled["Loss"] == pytest.approx(log_exact["Loss"], abs=1e-6)


def test_device_crop_matches_host_slice_for_jax_and_numpy():
    """The pre-fetch owned-core crop (one dynamic-start slice executable)
    must cut exactly the box the stitch expects, for jax AND numpy window
    outputs, including the clamped edge-window case (f = tile - max_span)."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.tiling import (
        _device_crop,
    )

    rng = np.random.default_rng(0)
    win_np = rng.standard_normal((2, 3, 24, 24, 1)).astype(np.float32)
    win_jx = jnp.asarray(win_np)
    for f_h, s_h, f_w, s_w in [(0, 10, 5, 8), (14, 10, 16, 8), (0, 24, 0, 24)]:
        want = win_np[:, :, f_h:f_h + s_h, f_w:f_w + s_w, :]
        np.testing.assert_array_equal(
            np.asarray(_device_crop(win_jx, f_h, s_h, f_w, s_w)), want
        )
        np.testing.assert_array_equal(
            _device_crop(win_np, f_h, s_h, f_w, s_w), want
        )


def test_tiled_apply_uneven_owned_spans_stitch_exactly():
    """Sizes whose plans produce UNEQUAL owned spans (edge vs interior
    windows) exercise the fixed-size fetch box + host offset logic: the
    assembled output must still equal the whole-frame forward bit-for-bit
    for an identity-like tile_fn."""
    x = np.random.default_rng(1).standard_normal((1, 80, 80, 1)).astype(np.float32)

    def fwd(a):
        return jnp.asarray(a) * 2.0  # rf radius 0: tiled must be EXACT

    got = tiled_apply(fwd, (x,), (64, 64), overlap=8)
    np.testing.assert_array_equal(got, x * 2.0)
