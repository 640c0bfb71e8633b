"""Exceedance telemetry for the windowed-approximation knobs.

``max_flow`` / ``dcn_max_offset`` trade the reference's exact-anywhere
sampling (``deform_conv_cuda_kernel.cu:83-188``, ``toflow_net.py:116-138``)
for a bounded window that is exact only while the true displacements stay
inside it.  These tests pin the runtime guarantee that replaces the a-priori
cardiac-motion argument: every windowed call site publishes out-of-window
fractions through the ``telemetry`` variable collection, the predictors
aggregate them per item, and a synthetic net whose flows exceed the window
MUST trip the warning (the failure is otherwise silent score degradation).
"""
import logging
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
    losses as L,
    metrics as ME,
    models as M,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.loader import (
    Dataloader,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops import (
    telemetry,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
    FRVSRPredictor,
    VSRPredictor,
)


def test_exceedance_triple_counts_and_max():
    oy = jnp.asarray([[0.5, -3.0], [1.0, 0.0]])
    ox = jnp.asarray([[0.0, 0.0], [-2.5, 0.25]])
    n_out, n_tot, mx = np.asarray(telemetry.exceedance_triple(2.0, jnp.abs(oy), jnp.abs(ox)))
    assert n_tot == 4
    assert n_out == 2  # |−3| and |−2.5| exceed; max-of-components per sample
    assert mx == pytest.approx(3.0)


def test_merge_triples_and_summaries():
    a = jnp.asarray([1.0, 10.0, 3.0])
    b = jnp.asarray([0.0, 30.0, 5.0])
    merged = np.asarray(telemetry.merge_triples(a, b))
    assert merged.tolist() == [1.0, 40.0, 5.0]
    s1 = telemetry.summarize({"site": a})
    s2 = telemetry.summarize({"site": b})
    acc = telemetry.merge_summaries({}, s1)
    acc = telemetry.merge_summaries(acc, s2)
    assert acc["site"]["n"] == 40.0
    assert acc["site"]["frac_out"] == pytest.approx(1.0 / 40.0)
    assert acc["site"]["max_abs"] == pytest.approx(5.0)


def _frvsr_items(n=2, t=3, hw=16, seed=0):
    rng = np.random.default_rng(seed)
    items = []
    for i in range(n):
        items.append(
            {
                "lr_imgs": rng.uniform(-1, 1, (t, hw, hw, 1)).astype(np.float32),
                "hr_imgs": rng.uniform(-1, 1, (t, hw * 4, hw * 4, 1)).astype(np.float32),
                "index": i,
            }
        )
    return items


class _Ds:
    def __init__(self, items):
        self.items = items
        self.data = [
            (Path(f"patient{i:03d}_2d_sequence01.nii.gz"), None)
            for i in range(len(items))
        ]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _make_frvsr_predictor(items, saturate_flow: bool, **kw):
    """FRVSR predictor on random init; with ``saturate_flow`` the FNet tail
    bias is pushed so tanh saturates to ~1 — the STN pixel flow becomes
    W/2 (resp. W·r/2) everywhere, far outside ``max_flow`` — a synthetic
    out-of-window regime reached through the REAL net forward."""
    net = M.FRVSRNet(
        in_channels=1, out_channels=1, upscale_factor=4, num_resblocks=1, max_flow=2
    )
    pred = FRVSRPredictor(
        device="cpu",
        test_dataloader=Dataloader(_Ds(items), batch_size=1, shuffle=False),
        net=net,
        loss_fns=[L.LOSSES.get("L1Loss")()],
        metric_fns=[ME.METRICS.get("PSNR")()],
        **kw,
    )
    batch = {k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
             for k, v in items[0].items()}
    pred.init_params_like(batch)
    if saturate_flow:
        params = jax.tree.map(lambda x: x, pred.params)  # shallow rebuild
        bias = params["steps"]["fnet"]["tail_conv2"]["bias"]
        params["steps"]["fnet"]["tail_conv2"]["bias"] = jnp.full_like(bias, 50.0)
        pred.params = params
    return pred


def test_out_of_window_flows_trip_the_warning(caplog):
    items = _frvsr_items()
    pred = _make_frvsr_predictor(items, saturate_flow=True)
    with caplog.at_level(logging.WARNING):
        pred.predict()
    warnings = [r for r in caplog.records if "windowed-approximation exceedance" in r.message]
    assert warnings, "saturated flows (32 px vs max_flow=2) must warn"
    assert any("max_flow" in r.getMessage() for r in warnings)  # remedy named
    summary = pred.telemetry_summary
    assert summary["sr_flow_window"]["frac_out"] > 0.9
    assert summary["sr_flow_window"]["max_abs"] == pytest.approx(32.0, rel=0.05)
    assert summary["lr_flow_window"]["frac_out"] > 0.9


def test_in_window_flows_do_not_warn(caplog):
    items = _frvsr_items()
    pred = _make_frvsr_predictor(items, saturate_flow=False)
    with caplog.at_level(logging.WARNING):
        pred.predict()
    assert not [r for r in caplog.records if "exceedance" in r.message]
    # telemetry still collected and published (the runtime guarantee)
    assert pred.telemetry_summary["sr_flow_window"]["frac_out"] == 0.0
    assert pred.telemetry_summary["sr_flow_window"]["n"] > 0


def test_telemetry_opt_out():
    items = _frvsr_items(n=1)
    pred = _make_frvsr_predictor(items, saturate_flow=True, telemetry=False)
    pred.predict()
    assert pred.telemetry_summary == {}


def test_warn_frac_threshold_suppresses_small_fractions(caplog):
    """telemetry_warn_frac raises the warning bar without hiding the stats."""
    items = _frvsr_items()
    pred = _make_frvsr_predictor(items, saturate_flow=False, telemetry_warn_frac=0.5)
    with caplog.at_level(logging.WARNING):
        pred.predict()
    assert not [r for r in caplog.records if "exceedance" in r.message]
    assert pred.telemetry_summary  # stats still published


def test_net_without_windowed_knobs_has_empty_summary():
    rng = np.random.default_rng(3)
    items = [
        {
            "lr_imgs": rng.uniform(-1, 1, (3, 16, 16, 1)).astype(np.float32),
            "hr_imgs": rng.uniform(-1, 1, (3, 64, 64, 1)).astype(np.float32),
            "index": 0,
        }
    ]
    pred = VSRPredictor(
        device="cpu",
        test_dataloader=Dataloader(_Ds(items), batch_size=1, shuffle=False),
        net=M.Bicubic(upscale_factor=4),
        loss_fns=[L.LOSSES.get("L1Loss")()],
        metric_fns=[ME.METRICS.get("PSNR")()],
    )
    batch = {k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
             for k, v in items[0].items()}
    pred.init_params_like(batch)
    log = pred.predict()
    assert np.isfinite(log["Loss"])
    assert pred.telemetry_summary == {}


def test_tiled_path_aggregates_window_telemetry(caplog):
    """The tile path folds per-window triples; saturated flows must still
    trip the warning through ``tiled_apply``."""
    items = _frvsr_items(n=1, hw=24)
    pred = _make_frvsr_predictor(
        items, saturate_flow=True, tile=16, tile_overlap=4
    )
    with caplog.at_level(logging.WARNING):
        pred.predict()
    assert [r for r in caplog.records if "windowed-approximation exceedance" in r.message]
    # tile width 16 → saturated pixel flow = 16·4/2 = 32 at the HR warp
    assert pred.telemetry_summary["sr_flow_window"]["frac_out"] > 0.9


def test_dcn_offset_exceedance_through_edvr():
    """EDVR's windowed DCN publishes per-DCNPack offset telemetry; pushing
    the (zero-init) conv_offset_mask bias makes every offset 10 px and the
    sites report it."""
    rng = np.random.default_rng(5)
    net = M.EDVRNet(
        in_channels=1, out_channels=1, nf=8, nframes=3, groups=2,
        front_RBs=1, back_RBs=1, dcn_max_offset=2,
    )
    x = jnp.asarray(rng.standard_normal((1, 3, 16, 16, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)
    _, tel = net.apply(variables, x, mutable=["telemetry"])
    summary = telemetry.summarize(tel["telemetry"])
    sites = [k for k in summary if k.endswith("dcn_offset_window")]
    assert len(sites) == 4  # L1/L2/L3/cascade DCNPacks
    assert all(summary[s]["frac_out"] == 0.0 for s in sites)  # zero-init offsets

    params = jax.tree.map(lambda v: v, variables["params"])
    for pack in ("L1_dcnpack", "L2_dcnpack", "L3_dcnpack", "cas_dcnpack"):
        b = params["pcd_align"][pack]["conv_offset_mask"]["bias"]
        params["pcd_align"][pack]["conv_offset_mask"]["bias"] = jnp.full_like(b, 10.0)
    _, tel2 = net.apply({"params": params}, x, mutable=["telemetry"])
    summary2 = telemetry.summarize(tel2["telemetry"])
    for s in sites:
        assert summary2[s]["frac_out"] == pytest.approx(1.0)
        assert summary2[s]["max_abs"] == pytest.approx(10.0, rel=1e-5)
    assert telemetry.check(summary2, warn_frac=0.0) == sorted(sites)


def test_training_path_unaffected_by_telemetry_sows():
    """Trainers apply without the telemetry collection — the sows must be
    no-ops there (grads and outputs identical to a telemetry-free trace)."""
    rng = np.random.default_rng(9)
    net = M.FRVSRNet(
        in_channels=1, out_channels=1, upscale_factor=4, num_resblocks=1, max_flow=2
    )
    x = jnp.asarray(rng.standard_normal((1, 3, 8, 8, 1)), jnp.float32)
    hr = jnp.asarray(rng.standard_normal((1, 3, 32, 32, 1)), jnp.float32)
    variables = net.init(jax.random.PRNGKey(0), x)

    def loss(p):
        sr, _ = net.apply({"params": p}, x)
        return jnp.mean(jnp.abs(sr - hr))

    val, grads = jax.jit(jax.value_and_grad(loss))(variables["params"])
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in jax.tree.leaves(grads))


def _make_frvsr_trainer(saturate_flow: bool, **kw):
    """FRVSR trainer (``max_flow=2``) on random init; ``saturate_flow``
    pushes the FNet tail bias so tanh saturates and every pixel flow lands
    far outside the window — the synthetic out-of-window regime reached
    through the REAL net forward, this time through ``BaseTrainer``'s
    validation epoch (the train step itself stays telemetry-free)."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
        TRAINERS,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
        Optimizer,
    )

    rng = np.random.default_rng(11)
    items = [
        {
            "lr_imgs": rng.standard_normal((3, 8, 8, 1)).astype(np.float32),
            "hr_imgs": rng.standard_normal((3, 32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(2)
    ]
    net = M.FRVSRNet(
        in_channels=1, out_channels=1, upscale_factor=4, num_resblocks=1, max_flow=2
    )
    loader = Dataloader(_Ds(items), batch_size=2, shuffle=False)
    trainer = TRAINERS.get("AcdcFRVSRTrainer")(
        train_dataloader=loader,
        valid_dataloader=loader,
        net=net,
        loss_fns=[L.LOSSES.get("L1Loss")()],
        metric_fns=[ME.METRICS.get("PSNR")()],
        optimizer=Optimizer("Adam", lr=1e-7),
        num_epochs=1,
        **kw,
    )
    batch = {
        "lr_imgs": np.stack([it["lr_imgs"] for it in items]),
        "hr_imgs": np.stack([it["hr_imgs"] for it in items]),
        "index": np.asarray([0, 1]),
    }
    trainer.init_params(batch)
    if saturate_flow:
        params = jax.tree.map(lambda x: x, trainer.params)
        bias = params["steps"]["fnet"]["tail_conv2"]["bias"]
        params["steps"]["fnet"]["tail_conv2"]["bias"] = jnp.full_like(bias, 50.0)
        trainer.params = params
    return trainer


def test_trainer_valid_epoch_telemetry_warns(caplog):
    """Training WITH a windowed knob is the one regime where an
    out-of-window displacement silently changes the LEARNED model (the
    reference trains with exact-anywhere sampling,
    ``deform_conv_cuda_kernel.cu:83-188``) — so every validation epoch
    collects the exceedance telemetry and saturated flows must warn through
    the full ``BaseTrainer.train()`` lifecycle."""
    trainer = _make_frvsr_trainer(saturate_flow=True)
    with caplog.at_level(logging.WARNING):
        trainer.train()
    warnings = [
        r for r in caplog.records if "windowed-approximation exceedance" in r.message
    ]
    assert warnings, "saturated flows (32/8 px vs max_flow=2) must warn"
    assert any("valid epoch 1" in r.getMessage() for r in warnings)
    assert any("max_flow" in r.getMessage() for r in warnings)  # remedy named
    assert len(trainer.telemetry_history) == 1  # one summary per valid epoch
    s = trainer.telemetry_history[0]
    assert s["sr_flow_window"]["frac_out"] > 0.9
    assert trainer.telemetry_summary["lr_flow_window"]["frac_out"] > 0.9


def test_trainer_valid_epoch_telemetry_in_window_no_warn(caplog):
    trainer = _make_frvsr_trainer(saturate_flow=False)
    with caplog.at_level(logging.WARNING):
        trainer.train()
    assert not [r for r in caplog.records if "exceedance" in r.message]
    # still collected + published per epoch (the runtime guarantee)
    assert trainer.telemetry_history
    assert trainer.telemetry_history[0]["sr_flow_window"]["frac_out"] == 0.0
    assert trainer.telemetry_history[0]["sr_flow_window"]["n"] > 0


def test_trainer_telemetry_opt_out():
    trainer = _make_frvsr_trainer(saturate_flow=True, telemetry=False)
    trainer.train()
    assert trainer.telemetry_summary == {}
    assert trainer.telemetry_history == []


def test_trainer_dcn_offset_telemetry_through_valid_epoch(caplog):
    """The EDVR training showcase (``configs/train/edvr_net/exp1_x4_tpu.yaml``)
    trains with ``dcn_max_offset`` — its valid epochs must surface saturated
    DCN offsets.  Valid-epoch only: the tiny windowed-DCN TRAIN graph
    compiles pathologically on XLA:CPU (CLAUDE.md), and the train step is
    telemetry-free by design anyway."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
        TRAINERS,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
        Optimizer,
    )

    rng = np.random.default_rng(13)
    items = [
        {
            "lr_imgs": rng.standard_normal((3, 16, 16, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((64, 64, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(2)
    ]
    net = M.EDVRNet(
        in_channels=1, out_channels=1, nf=8, nframes=3, groups=2,
        front_RBs=1, back_RBs=1, dcn_max_offset=2,
    )
    loader = Dataloader(_Ds(items), batch_size=2, shuffle=False)
    trainer = TRAINERS.get("AcdcMISRTrainer")(
        train_dataloader=loader,
        valid_dataloader=loader,
        net=net,
        loss_fns=[L.LOSSES.get("L1Loss")()],
        metric_fns=[ME.METRICS.get("PSNR")()],
        optimizer=Optimizer("Adam", lr=1e-7),
        num_epochs=1,
    )
    batch = {
        "lr_imgs": np.stack([it["lr_imgs"] for it in items]),
        "hr_img": np.stack([it["hr_img"] for it in items]),
        "index": np.asarray([0, 1]),
    }
    trainer.init_params(batch)
    params = jax.tree.map(lambda v: v, trainer.params)
    for pack in ("L1_dcnpack", "L2_dcnpack", "L3_dcnpack", "cas_dcnpack"):
        b = params["pcd_align"][pack]["conv_offset_mask"]["bias"]
        params["pcd_align"][pack]["conv_offset_mask"]["bias"] = jnp.full_like(b, 10.0)
    trainer.params = params
    with caplog.at_level(logging.WARNING):
        log, _, _ = trainer._run_epoch("validation")
    assert np.isfinite(log["Loss"])
    warned = [
        r for r in caplog.records if "windowed-approximation exceedance" in r.message
    ]
    assert warned and any("dcn_max_offset" in r.getMessage() for r in warned)
    sites = [k for k in trainer.telemetry_summary if k.endswith("dcn_offset_window")]
    assert len(sites) == 4
    assert all(trainer.telemetry_summary[s]["frac_out"] == pytest.approx(1.0) for s in sites)


def test_serve_daemon_reports_telemetry(tmp_path, caplog):
    """tools/serve.py surfaces per-volume exceedance telemetry: a saturated-
    flow FRVSR checkpoint served on raw LR volumes must warn and print the
    run-aggregate summary line."""
    import yaml

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        checkpoint as ckpt_io,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        serve,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        nifti,
    )

    rng = np.random.default_rng(0)
    in_dir, out_dir = tmp_path / "lr", tmp_path / "sr"
    nifti.save(
        rng.uniform(0, 255, (16, 16, 1, 3)).astype(np.float32),
        in_dir / "patient001_2d+1d_sequence.nii.gz",
    )
    net_kw = dict(in_channels=1, out_channels=1, upscale_factor=4,
                  num_resblocks=1, max_flow=2)
    net = M.FRVSRNet(**net_kw)
    params = net.init(
        jax.random.PRNGKey(0), np.zeros((1, 3, 16, 16, 1), np.float32)
    )["params"]
    params["steps"]["fnet"]["tail_conv2"]["bias"] = jnp.full_like(
        params["steps"]["fnet"]["tail_conv2"]["bias"], 50.0
    )
    ckpt = tmp_path / "model.pth"
    ckpt_io.save_checkpoint(ckpt, params=params)
    cfg = tmp_path / "net.yaml"
    cfg.write_text(yaml.safe_dump({
        "net": {"name": "FRVSRNet", "kwargs": net_kw},
        "main": {"loaded_path": str(ckpt)},
    }))

    with caplog.at_level(logging.INFO):
        count = serve.main([
            str(cfg), "--in", str(in_dir), "--out", str(out_dir), "--device", "cpu",
        ])
    assert count == 1
    assert [r for r in caplog.records
            if "windowed-approximation exceedance" in r.message]
    agg = [r for r in caplog.records if "Windowed-op telemetry" in r.message]
    assert agg and "sr_flow_window" in agg[0].getMessage()
    # per-volume line carries the stats
    per_vol = [r for r in caplog.records if "fps)" in r.getMessage()]
    assert per_vol and "frac_out" in per_vol[0].getMessage()


def test_tiled_seam_stats_zero_when_overlap_covers_receptive_field():
    """ops/tiling.tiled_apply(seam_stats=True): adjacent windows agree
    exactly on their shared overlap when the overlap >= the receptive-field
    radius (a 3x3 conv: radius 1), and the measured seam must say so."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.tiling import (
        tiled_apply,
    )

    rng = np.random.default_rng(11)
    k = jnp.asarray(rng.standard_normal((3, 3, 1, 1)), jnp.float32)
    x = rng.standard_normal((1, 40, 40, 1)).astype(np.float32)

    def conv_fn(a):
        return jax.lax.conv_general_dilated(
            jnp.asarray(a), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    out, seam = tiled_apply(conv_fn, [x], (16, 16), 4, seam_stats=True)
    whole = np.asarray(conv_fn(x))
    np.testing.assert_allclose(out, whole, rtol=1e-5, atol=1e-6)
    assert seam is not None and seam["n_probes"] > 0
    assert seam["rms"] < 1e-6 and seam["max_abs"] < 1e-5


def test_tiled_seam_stats_detect_insufficient_overlap():
    """A 9x9 conv (radius 4) tiled with overlap 1: the stitch is approximate
    and the per-run seam measurement must report a nonzero disagreement."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.tiling import (
        tiled_apply,
    )

    rng = np.random.default_rng(13)
    k = jnp.asarray(rng.standard_normal((9, 9, 1, 1)), jnp.float32)
    x = rng.standard_normal((1, 40, 40, 1)).astype(np.float32)

    def conv_fn(a):
        return jax.lax.conv_general_dilated(
            jnp.asarray(a), k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    _, seam = tiled_apply(conv_fn, [x], (16, 16), 1, seam_stats=True)
    assert seam["rms"] > 0.01, "insufficient overlap must show up in the seam stats"


def test_tiled_predictor_reports_seam_summary(caplog):
    items = _frvsr_items(n=1, hw=24)
    pred = _make_frvsr_predictor(items, saturate_flow=False, tile=16, tile_overlap=4)
    with caplog.at_level(logging.INFO):
        pred.predict()
    assert pred.seam_summary.get("items") == 1
    assert np.isfinite(pred.seam_summary["max_rms"])
    assert [r for r in caplog.records if "tile seam" in r.getMessage()]

def test_tiled_seam_probes_do_not_double_count_telemetry():
    """Seam-probe windows re-cover regions the main plan already predicted,
    so their telemetry is discarded (``tiled_apply(probe_fn=...)``): the
    per-item sample count must be identical with and without seam probing
    (a probe-polluted count would bias frac_out toward the seam regions)."""
    items = _frvsr_items(n=1, hw=24)
    counts = {}
    for seam in (True, False):
        pred = _make_frvsr_predictor(
            items, saturate_flow=True, tile=16, tile_overlap=4, seam_stats=seam
        )
        pred.predict()
        counts[seam] = {
            site: s["n"] for site, s in pred.telemetry_summary.items()
        }
    assert counts[True] and counts[True] == counts[False]


def test_seam_stats_first_probes_one_item_per_shape(caplog):
    """Default policy "first": one seam measurement per distinct input
    (H, W) per run — the probes cost extra tile forwards, so they must not
    ride along on every item (nor on the telemetry knob, which is free for
    knob-less nets)."""
    items = _frvsr_items(n=3, hw=24)
    pred = _make_frvsr_predictor(items, saturate_flow=False, tile=16, tile_overlap=4)
    assert pred.seam_stats == "first"
    with caplog.at_level(logging.INFO):
        pred.predict()
    assert pred.seam_summary.get("items") == 1  # 3 same-shape items, 1 probe


def test_seam_stats_off():
    items = _frvsr_items(n=1, hw=24)
    pred = _make_frvsr_predictor(
        items, saturate_flow=False, tile=16, tile_overlap=4, seam_stats=False
    )
    pred.predict()
    assert pred.seam_summary == {}


@pytest.mark.slow
def test_perf_probe_telemetry_cost_smoke():
    """The on-chip cost A/B (PERF_NOTES "Exceedance-telemetry cost") runs:
    the telemetry-on arm must expose >=1 sow site and both arms must agree
    on the protocol (TOFlow arm only — the EDVR arm's zoo-size CPU compile
    is minutes-scale and its telemetry path is covered by the EDVR
    predictor tests)."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        perf_probe,
    )

    row = perf_probe.probe_telemetry_cost(
        7, 16, jnp.float32, 1, n_pipeline=1, nets=("toflow",)
    )
    tf = row["toflow_max_flow4"]
    assert tf["n_sites"] >= 1
    assert tf["on_ms"] > 0 and tf["off_ms"] > 0
    assert np.isfinite(row["max_overhead_frac"])
