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
