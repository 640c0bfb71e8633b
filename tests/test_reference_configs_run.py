"""The reference's OWN config files run here VERBATIM (BASELINE contract:
"run the existing configs/train|test/refine_net/*.yaml unchanged").

Only machine-specific PATH values are substituted (data_dir, pickle paths,
saved_dir, loaded_path — every user must point these at their own data); all
component names, kwargs and hyperparameters are the reference's bytes.
"""
import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
    load_config,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
    test_from_config as run_test_config,
)
from fixtures import make_acdc_tree
from reference_loader import reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference repo not mounted"),
]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_acdc_tree(
        tmp_path_factory.mktemp("acdc"), frames=10, hr_size=(48, 48), patients_per_split=1
    )


def _patch_paths_only(cfg, tree, out_dir, loaded_path=None):
    """Substitute only the path-valued fields; everything else untouched."""
    cfg.main.saved_dir = str(out_dir)
    if "loaded_path" in cfg.main:
        assert loaded_path is not None
        cfg.main.loaded_path = str(loaded_path)
    cfg.dataset.kwargs.data_dir = str(
        tree["imgs_dir"] if "imgs" in cfg.dataset.kwargs.data_dir else tree["videos_dir"]
    )
    if "pos_code_path" in cfg.dataset.kwargs:
        cfg.dataset.kwargs.pos_code_path = str(tree["pos_code_path"])
    for metric in cfg.get("metrics", []):
        if "coordinates_path" in metric.get("kwargs", {}):
            metric.kwargs.coordinates_path = str(tree["coordinates_path"])
    if "saved_dir" in cfg.predictor.get("kwargs", {}):
        cfg.predictor.kwargs.saved_dir = str(out_dir)
    return cfg


def test_reference_bicubic_yaml_runs_verbatim(tree, tmp_path):
    cfg = load_config("/root/reference/configs/test/bicubic/exp1_x4.yaml")
    cfg = _patch_paths_only(cfg, tree, tmp_path / "out")
    predictor = run_test_config(cfg)
    assert np.isfinite(predictor.log["Loss"])
    assert predictor.log["PSNR"] > 10
    assert "CardiacPSNR" in predictor.log


def test_reference_refinenet_yaml_runs_verbatim_with_genuine_pth(tree, tmp_path):
    """The flagship test config — full-size net (features [64,64,64], 3
    stages) — evaluated from a GENUINE torch .pth of the reference RefineNet
    (weights imported transparently by the checkpoint loader)."""
    import torch

    from reference_loader import load_reference_refine_net

    cfg = load_config("/root/reference/configs/test/refine_net/exp1_x4.yaml")

    torch.manual_seed(0)
    rn = load_reference_refine_net()
    ref = rn.RefineNet(**{k: v for k, v in cfg.net.kwargs.items()})
    ckpt = tmp_path / "model_best.pth"
    torch.save({"net": ref.state_dict()}, ckpt)

    cfg = _patch_paths_only(cfg, tree, tmp_path / "out", loaded_path=ckpt)
    predictor = run_test_config(cfg)
    assert np.isfinite(predictor.log["Loss"])
    assert predictor.log["PSNR"] > 0
    assert (tmp_path / "out" / "results.csv").exists()  # exported: true in the yaml
