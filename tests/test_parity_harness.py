"""The parity_check CLI satisfies the ≤0.05 dB contract on synthetic data with
a genuine torch checkpoint of the reference RefineNet."""
import numpy as np
import pytest

from fixtures import make_acdc_tree
from reference_loader import load_reference_refine_net, reference_available

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted"
)


def test_parity_check_cli(tmp_path):
    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        parity_check,
    )

    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(32, 32), patients_per_split=1)

    net_kwargs = dict(
        in_channels=1, out_channels=1, num_features=[6, 6], upscale_factor=4,
        num_stages=2, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    torch.manual_seed(0)
    rn = load_reference_refine_net()
    ref = rn.RefineNet(**net_kwargs)
    ckpt = tmp_path / "model.pth"
    torch.save({"net": ref.state_dict()}, ckpt)

    import json

    summary = parity_check.main(
        [
            str(ckpt),
            str(tree["videos_dir"]),
            str(tree["pos_code_path"]),
            "--max-items", "2",
            "--net-kwargs", json.dumps(net_kwargs),
        ]
    )
    assert summary["items"] == 2
    assert summary["contract_0p05db"] is True
    assert summary["max_abs_psnr_delta_db"] < 0.01


@pytest.mark.parametrize(
    "net_name,net_kwargs",
    [
        ("EDSRNet", dict(in_channels=1, out_channels=1, num_resblocks=2,
                         num_features=8, upscale_factor=4)),
        ("DUFNet", dict(in_channels=1, out_channels=1, num_frames=7, size_filter=5,
                        upscale_factor=4, backbone="_DenseLayer16")),
        ("EDVRNet", dict(in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
                         front_RBs=1, back_RBs=1)),
        ("DRFNet", dict(in_channels=1, out_channels=1, num_features=8,
                        num_groups=2, upscale_factor=4)),
    ],
)
def test_parity_check_cli_other_nets(tmp_path, net_name, net_kwargs):
    """parity_check generalizes beyond RefineNet: any registered net name
    routes through its key map, dataset workload and output protocol."""
    import json

    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        parity_check,
    )

    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(32, 32), patients_per_split=1)

    torch.manual_seed(1)
    ref = parity_check.load_reference_model(
        parity_check.Path("/root/reference"), net_name, net_kwargs
    )
    if net_name == "EDVRNet":
        with torch.no_grad():
            for name, p in ref.named_parameters():
                if "conv_offset_mask" in name:
                    p.normal_(0.0, 0.08)
    ckpt = tmp_path / "model.pth"
    torch.save({"net": ref.state_dict()}, ckpt)

    data_dir = tree["imgs_dir"] if net_name == "EDSRNet" else tree["videos_dir"]
    summary = parity_check.main(
        [
            str(ckpt), str(data_dir),
            "--net", net_name,
            "--max-items", "2",
            "--net-kwargs", json.dumps(net_kwargs),
        ]
    )
    assert summary["net"] == net_name
    assert summary["items"] == 2
    assert summary["contract_0p05db"] is True, summary


def test_parity_check_windowed_variants(tmp_path):
    """TPU-extension kwargs (max_flow / dcn_max_offset) apply to OUR net only
    — parity_check strips them for the reference constructor, so the CLI
    empirically validates the windowed bound against the exact reference on
    the given data (flows are in-window here, so the contract holds)."""
    import json

    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        parity_check,
    )

    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(32, 32), patients_per_split=1)
    net_kwargs = dict(in_channels=1, out_channels=1, num_frames=3, upscale_factor=4)
    torch.manual_seed(3)
    ref = parity_check.load_reference_model(
        parity_check.Path("/root/reference"), "TOFlowNet", net_kwargs
    )
    ckpt = tmp_path / "model.pth"
    torch.save({"net": ref.state_dict()}, ckpt)

    summary = parity_check.main(
        [
            str(ckpt), str(tree["videos_dir"]),
            "--net", "TOFlowNet",
            "--max-items", "2",
            "--net-kwargs", json.dumps({**net_kwargs, "max_flow": 4}),
        ]
    )
    assert summary["net"] == "TOFlowNet"
    assert summary["contract_0p05db"] is True, summary


def test_batch_infer_on_mesh(tmp_path):
    """Mesh-batched inference over the 8 fake devices produces the same
    per-sequence scores as single-item evaluation."""
    import json

    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        batch_infer,
    )

    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(32, 32),
                          patients_per_split=2, slices=2)

    net_kwargs = dict(
        in_channels=1, out_channels=1, num_features=[6, 6], upscale_factor=4,
        num_stages=1, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    torch.manual_seed(1)
    rn = load_reference_refine_net()
    ref = rn.RefineNet(**net_kwargs)
    ckpt = tmp_path / "model.pth"
    torch.save({"net": ref.state_dict()}, ckpt)

    # --aot-cache: scores must be identical with the cache active, whether
    # the store succeeds or utils/aot.py's validation refuses it (any
    # compilation-cache-restored executable in-process can poison XLA:CPU's
    # serializer — the store/hit contract itself is asserted in clean
    # subprocesses by test_aot_cache_across_processes)
    aot_dir = tmp_path / "aot"
    base_args = [
        str(ckpt), str(tree["videos_dir"]), str(tree["pos_code_path"]),
        str(tmp_path / "results_aot.csv"), "--num-devices", "8",
        "--net-kwargs", json.dumps(net_kwargs), "--aot-cache", str(aot_dir),
    ]
    summary_aot = batch_infer.main(base_args)
    mtimes = {f.name: f.stat().st_mtime_ns for f in aot_dir.glob("*.jaxexe")}
    summary_aot2 = batch_infer.main(base_args)
    assert summary_aot2["mean_psnr"] == pytest.approx(summary_aot["mean_psnr"], rel=1e-6)
    assert {f.name: f.stat().st_mtime_ns for f in aot_dir.glob("*.jaxexe")} == mtimes, (
        "second run must not add/rewrite entries"
    )

    out_csv = tmp_path / "results.csv"
    summary = batch_infer.main(
        [
            str(ckpt), str(tree["videos_dir"]), str(tree["pos_code_path"]), str(out_csv),
            "--num-devices", "8",
            "--net-kwargs", json.dumps(net_kwargs),
        ]
    )
    assert summary["devices"] == 8
    assert summary["sequences"] == 4  # 2 patients x 2 slices in test split
    assert summary["frames"] == 4 * 8
    assert out_csv.exists()
    assert np.isfinite(summary["mean_psnr"])
    assert summary_aot["mean_psnr"] == pytest.approx(summary["mean_psnr"], rel=1e-6)

    # dp x sp serving: 4-wide data axis + height sharded over 2 devices
    # (GSPMD halo) must reproduce the pure-dp scores exactly
    summary_sp = batch_infer.main(
        [
            str(ckpt), str(tree["videos_dir"]), str(tree["pos_code_path"]),
            str(tmp_path / "results_sp.csv"),
            "--num-devices", "8", "--spatial-parallel", "2",
            "--net-kwargs", json.dumps(net_kwargs),
        ]
    )
    assert summary_sp["devices"] == 4  # data-parallel width
    assert summary_sp["mean_psnr"] == pytest.approx(summary["mean_psnr"], rel=1e-5)



def test_batch_infer_pad_h_shards_indivisible_heights(tmp_path):
    """--pad-h: LR heights indivisible by spatial_parallel (9 rows over 2)
    are edge-extended before sharding and the SR output cropped back; scores
    stay close to the unsharded run (border-row tradeoff only)."""
    import json

    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        batch_infer,
    )

    # HR 36 -> LR 9: odd height, indivisible by spatial_parallel=2
    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(36, 36),
                          patients_per_split=1, slices=2)
    net_kwargs = dict(
        in_channels=1, out_channels=1, num_features=[6, 6], upscale_factor=4,
        num_stages=1, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    torch.manual_seed(2)
    rn = load_reference_refine_net()
    ref = rn.RefineNet(**net_kwargs)
    ckpt = tmp_path / "model.pth"
    torch.save({"net": ref.state_dict()}, ckpt)

    base = batch_infer.main(
        [str(ckpt), str(tree["videos_dir"]), str(tree["pos_code_path"]),
         str(tmp_path / "base.csv"), "--num-devices", "8",
         "--net-kwargs", json.dumps(net_kwargs)]
    )
    padded = batch_infer.main(
        [str(ckpt), str(tree["videos_dir"]), str(tree["pos_code_path"]),
         str(tmp_path / "padded.csv"), "--num-devices", "8",
         "--spatial-parallel", "2", "--pad-h",
         "--net-kwargs", json.dumps(net_kwargs)]
    )
    assert padded["devices"] == 4
    assert padded["frames"] == base["frames"]
    assert padded["mean_psnr"] == pytest.approx(base["mean_psnr"], abs=0.2)


def test_batch_infer_tiled_serving(tmp_path):
    """--tile runs the net on fixed LR windows: scores stay close to the
    untiled run (RefineNet is recurrent, so tiling is approximate — border-
    localized; ops/tiling.py docstring) with identical row protocol."""
    import json

    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
        batch_infer,
    )

    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(64, 64),
                          patients_per_split=1, slices=2)
    net_kwargs = dict(
        in_channels=1, out_channels=1, num_features=[6, 6], upscale_factor=4,
        num_stages=1, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    torch.manual_seed(3)
    rn = load_reference_refine_net()
    ref = rn.RefineNet(**net_kwargs)
    ckpt = tmp_path / "model.pth"
    torch.save({"net": ref.state_dict()}, ckpt)

    base = batch_infer.main(
        [str(ckpt), str(tree["videos_dir"]), str(tree["pos_code_path"]),
         str(tmp_path / "base.csv"), "--num-devices", "8",
         "--net-kwargs", json.dumps(net_kwargs)]
    )
    tiled = batch_infer.main(
        [str(ckpt), str(tree["videos_dir"]), str(tree["pos_code_path"]),
         str(tmp_path / "tiled.csv"), "--num-devices", "8",
         "--tile", "12", "--tile-overlap", "4",
         "--net-kwargs", json.dumps(net_kwargs)]
    )
    assert tiled["frames"] == base["frames"]
    assert tiled["mean_psnr"] == pytest.approx(base["mean_psnr"], abs=0.5)
    with open(tmp_path / "tiled.csv") as f_t, open(tmp_path / "base.csv") as f_b:
        assert sum(1 for _ in f_t) == sum(1 for _ in f_b)
