"""Train-from-scratch SR quality: the framework's training BEATS Bicubic.

The convergence rung of docs/FIDELITY.md: on a learnable synthetic phantom
(``tools/gen_synthetic_data.py`` — contracting-heart cine volumes pushed
through the REAL offline pipeline: acdc_preprocess k-space degradation →
cardiac_cropping motion bbox → gen_positional_encoding end-systole code),
a net trained from scratch through the production ``train_from_config``
must outperform the Bicubic baseline on the held-out TEST split through the
production ``test_from_config`` — i.e. the trainer doesn't merely reduce
its own loss (test_end_to_end.test_training_converges), it learns actual
super-resolution.  The reference's corresponding protocol is its real-ACDC
train→test flow (``/root/reference/README.md:33-55``), environment-blocked
here by the dataset downloads; the on-chip full-size flagship twin of this
test is recorded in docs/FIDELITY.md ("Convergence on the synthetic
phantom").
"""
from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import Cfg
# aliased: pytest would otherwise collect the imported test_from_config
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
    test_from_config as run_test_config,
    train_from_config,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
    gen_synthetic_data,
)

# phantom train-split stats (acdc_preprocess logs them at generation time);
# shared by every config below so all PSNRs live in the same display space
MEAN, STD = 79.0, 60.0


@pytest.fixture(scope="module")
def phantom(tmp_path_factory):
    """2 training patients (→ 1 train + 1 valid by the 80/20 'vsr' split) +
    1 held-out test patient, X4 only, through the full real pipeline."""
    return gen_synthetic_data.main(
        tmp_path_factory.mktemp("phantom"),
        patients_train=2, patients_test=1, size=96, slices=1, frames=12,
        factors=(4,), seed=0,
    )


def _dataset_cfg(phantom, augments=None):
    d = {
        "name": "AcdcSISRDataset",
        "kwargs": {
            "data_dir": str(phantom["imgs_dir"]),
            "downscale_factor": 4,
            "transforms": [
                {"name": "Normalize", "kwargs": {"means": [MEAN], "stds": [STD]}},
                {"name": "ToTensor"},
            ],
        },
    }
    if augments is not None:
        d["kwargs"]["augments"] = augments
    return d


def _train_cfg(phantom, saved_dir, epochs):
    return Cfg(
        {
            "main": {"random_seed": "vsr", "saved_dir": str(saved_dir)},
            "dataset": _dataset_cfg(
                phantom,
                augments=[
                    {"name": "RandomHorizontalFlip"},
                    {"name": "RandomVerticalFlip"},
                    {"name": "RandomCropPatch", "kwargs": {"size": [12, 12], "ratio": 4}},
                ],
            ),
            "dataloader": {
                "name": "Dataloader",
                "kwargs": {"train_batch_size": 8, "valid_batch_size": 1,
                           "shuffle": True, "num_workers": 0},
            },
            "net": {
                "name": "EDSRNet",
                "kwargs": {"in_channels": 1, "out_channels": 1, "num_resblocks": 2,
                           "num_features": 16, "upscale_factor": 4, "res_scale": 0.1},
            },
            "losses": [{"name": "L1Loss", "weight": 1.0}],
            "metrics": [{"name": "PSNR"}],
            "optimizer": {"name": "Adam", "kwargs": {"lr": 0.001, "weight_decay": 0}},
            "logger": {"name": "AcdcSISRLogger", "kwargs": {"dummy_input": [8, 1, 12, 12]}},
            "monitor": {"name": "Monitor",
                        "kwargs": {"mode": "max", "target": "PSNR",
                                   "saved_freq": 10, "early_stop": 0}},
            "trainer": {"name": "AcdcSISRTrainer",
                        "kwargs": {"device": "cpu", "num_epochs": epochs}},
        }
    )


def _test_cfg(phantom, saved_dir, net, loaded_path=None):
    cfg = {
        "main": {"saved_dir": str(saved_dir)},
        "dataset": _dataset_cfg(phantom),
        "dataloader": {"name": "Dataloader",
                       "kwargs": {"batch_size": 1, "shuffle": False, "num_workers": 0}},
        "net": net,
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [
            {"name": "PSNR"},
            {"name": "SSIM"},
            {"name": "CardiacPSNR",
             "kwargs": {"coordinates_path": str(phantom["coordinates_path"])}},
        ],
        "predictor": {"name": "AcdcSISRPredictor",
                      "kwargs": {"device": "cpu", "saved_dir": str(saved_dir),
                                 "exported": False}},
    }
    if loaded_path is not None:
        cfg["main"]["loaded_path"] = str(loaded_path)
    return Cfg(cfg)


def test_phantom_pipeline_recovers_ground_truth(phantom):
    """The REAL tools recover the phantom's known physiology: the Otsu
    end-systole search lands on the generator's true end-systole (0.4·T →
    frame 5 of 12, where the cosine code bottoms at -1), and the motion
    bbox covers the beating heart (the image-center region the generator
    places it in)."""
    import pickle

    with open(phantom["pos_code_path"], "rb") as f:
        pos_codes = pickle.load(f)
    with open(phantom["coordinates_path"], "rb") as f:
        coords = pickle.load(f)
    assert pos_codes and coords
    for patient, code in pos_codes.items():
        assert code.shape == (12,)
        es = int(code.argmin())
        assert abs(es - round(0.4 * 12)) <= 1, (patient, code)
        h0, hn, w0, wn = coords[patient]
        # heart center ≈ torso center ± 6% of 96 px: bbox must contain it
        assert h0 < 48 + 8 and hn > 48 - 8 and w0 < 48 + 8 and wn > 48 - 8, coords[patient]


def test_trained_sr_beats_bicubic(phantom, tmp_path_factory):
    out = tmp_path_factory.mktemp("convergence")
    trainer = train_from_config(_train_cfg(phantom, out / "train", epochs=25))
    best = trainer.monitor.checkpoints_dir / "model_best.pth"
    assert best.exists()

    bicubic = run_test_config(
        _test_cfg(phantom, out / "bicubic",
                  {"name": "Bicubic", "kwargs": {"upscale_factor": 4}})
    ).log
    trained = run_test_config(
        _test_cfg(phantom, out / "edsr",
                  {"name": "EDSRNet",
                   "kwargs": {"in_channels": 1, "out_channels": 1, "num_resblocks": 2,
                              "num_features": 16, "upscale_factor": 4, "res_scale": 0.1}},
                  loaded_path=best)
    ).log

    # the phantom is learnable but not trivial: bicubic sits in a sane range
    # (measured on this seed: bicubic 26.60 dB / 0.782 SSIM / 24.22 cardiac)
    assert 20.0 < bicubic["PSNR"] < 45.0, bicubic
    # the trained net must beat bicubic on NEVER-SEEN data with real margin
    # (measured: 28.42 dB = +1.82, SSIM 0.845 = +0.064, cardiac +0.24 — the
    # tiny 2-block net gains least over the moving heart crop, hence the
    # strict-but-unmargined cardiac assert)
    assert trained["PSNR"] > bicubic["PSNR"] + 0.5, (trained, bicubic)
    assert trained["SSIM"] > bicubic["SSIM"] + 0.02, (trained, bicubic)
    assert trained["CardiacPSNR"] > bicubic["CardiacPSNR"], (trained, bicubic)
