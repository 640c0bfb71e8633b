"""End-to-end: train + test through YAML configs with the reference schema.

The minimum end-to-end slice (SURVEY.md §7): RefineNet train for 2 epochs on
the synthetic fixture tree, checkpoints written by the monitor policy, then
the test path evaluates the best checkpoint with Cardiac metrics and exports
CSV/GIF/PNG.
"""
import csv

import jax
import numpy as np
import pytest
import yaml
from pathlib import Path

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import Cfg
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
    test_from_config as run_test_config,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
    train_from_config,
)
from fixtures import make_acdc_tree

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_acdc_tree(tmp_path_factory.mktemp("acdc"), frames=10, hr_size=(48, 48))


def _train_cfg(tree, saved_dir) -> Cfg:
    return Cfg(
        {
            "main": {"random_seed": "vsr", "saved_dir": str(saved_dir)},
            "dataset": {
                "name": "AcdcVSRRefineNetDataset",
                "kwargs": {
                    "data_dir": str(tree["videos_dir"]),
                    "downscale_factor": 4,
                    "pos_code_path": str(tree["pos_code_path"]),
                    "transforms": [
                        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                        {"name": "ToTensor"},
                    ],
                    "augments": [
                        {"name": "RandomHorizontalFlip"},
                        {"name": "RandomVerticalFlip"},
                        {"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 4}},
                    ],
                    "num_frames": 5,
                    "num_updated_frames": 3,
                },
            },
            "dataloader": {
                "name": "Dataloader",
                "kwargs": {
                    "train_batch_size": 4,
                    "valid_batch_size": 1,
                    "shuffle": True,
                    "num_workers": 2,
                    "drop_last": True,
                },
            },
            "net": {
                "name": "RefineNet",
                "kwargs": {
                    "in_channels": 1,
                    "out_channels": 1,
                    "num_features": [6, 6],
                    "upscale_factor": 4,
                    "num_stages": 2,
                    "update_memory": True,
                    "num_updated_frames": 3,
                    "refine_window_size": 5,
                    "positional_encoding": True,
                },
            },
            "losses": [{"name": "L1Loss", "weight": 1.0}],
            "metrics": [{"name": "PSNR"}, {"name": "SSIM"}],
            "optimizer": {"name": "Adam", "kwargs": {"lr": 0.001, "weight_decay": 0}},
            "logger": {"name": "AcdcVSRLogger", "kwargs": {"dummy_input": [4, 1, 8, 8]}},
            "monitor": {
                "name": "Monitor",
                "kwargs": {"mode": "min", "target": "Loss", "saved_freq": 2, "early_stop": 0},
            },
            "trainer": {
                "name": "AcdcVSRRefineNetTrainer",
                "kwargs": {"device": "cuda:0", "num_epochs": 2},
            },
        }
    )


def _test_cfg(tree, train_dir, saved_dir) -> Cfg:
    return Cfg(
        {
            "main": {
                "saved_dir": str(saved_dir),
                "loaded_path": str(train_dir / "checkpoints" / "model_best.pth"),
            },
            "dataset": {
                "name": "AcdcVSRRefineNetDataset",
                "kwargs": {
                    "data_dir": str(tree["videos_dir"]),
                    "downscale_factor": 4,
                    "pos_code_path": str(tree["pos_code_path"]),
                    "transforms": [
                        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                        {"name": "ToTensor"},
                    ],
                    "num_frames": 5,
                    "num_updated_frames": 3,
                },
            },
            "dataloader": {
                "name": "Dataloader",
                "kwargs": {"batch_size": 1, "shuffle": False, "num_workers": 2},
            },
            "net": {
                "name": "RefineNet",
                "kwargs": {
                    "in_channels": 1,
                    "out_channels": 1,
                    "num_features": [6, 6],
                    "upscale_factor": 4,
                    "num_stages": 2,
                    "update_memory": True,
                    "num_updated_frames": 3,
                    "refine_window_size": 5,
                    "positional_encoding": True,
                },
            },
            "losses": [{"name": "L1Loss", "weight": 1.0}],
            "metrics": [
                {"name": "PSNR"},
                {"name": "SSIM"},
                {"name": "CardiacPSNR", "kwargs": {"coordinates_path": str(tree["coordinates_path"])}},
                {"name": "CardiacSSIM", "kwargs": {"coordinates_path": str(tree["coordinates_path"])}},
            ],
            "predictor": {
                "name": "AcdcVSRRefineNetPredictor",
                "kwargs": {"device": "cuda:0", "saved_dir": str(saved_dir), "exported": True,
                           "export_nifti": True},
            },
        }
    )


@pytest.fixture(scope="module")
def trained(tree, tmp_path_factory):
    saved_dir = tmp_path_factory.mktemp("train")
    cfg = _train_cfg(tree, saved_dir)
    trainer = train_from_config(cfg)
    return trainer, saved_dir


def test_training_runs_and_checkpoints(trained):
    trainer, saved_dir = trained
    assert (saved_dir / "config.yaml").exists()
    assert (saved_dir / "checkpoints" / "model_2.pth").exists()  # saved_freq=2
    assert (saved_dir / "checkpoints" / "model_best.pth").exists()
    assert trainer.epoch == 3  # ran 2 epochs
    assert trainer.throughput["train_steps_per_sec"] > 0
    assert trainer.throughput["frames_per_sec"] > 0


def test_training_loss_is_finite_and_decreasing_signal(trained):
    trainer, _ = trained
    assert np.isfinite(trainer.monitor.best)


def test_resume_from_checkpoint(tree, trained, tmp_path_factory):
    _, train_dir = trained
    saved_dir = tmp_path_factory.mktemp("resume")
    cfg = _train_cfg(tree, saved_dir)
    cfg.main.loaded_path = str(train_dir / "checkpoints" / "model_2.pth")
    cfg.trainer.kwargs.num_epochs = 3
    trainer = train_from_config(cfg)
    assert trainer.epoch == 4  # resumed at 3, ran 1 more


def test_yaml_roundtrip_config(tree, trained, tmp_path):
    # the config as loaded from an actual YAML file on disk
    _, train_dir = trained
    cfg = _test_cfg(tree, train_dir, tmp_path / "test_out")
    path = tmp_path / "cfg.yaml"
    with open(path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)
    cfg2 = Cfg.from_yaml(filename=path)
    assert cfg2.to_dict() == cfg.to_dict()


def test_predict_exports(tree, trained, tmp_path_factory):
    _, train_dir = trained
    out_dir = tmp_path_factory.mktemp("test_out")
    cfg = _test_cfg(tree, train_dir, out_dir)
    predictor = run_test_config(cfg)

    assert predictor.log is not None
    assert np.isfinite(predictor.log["Loss"])
    assert 0 <= predictor.log["SSIM"] <= 1
    assert predictor.log["PSNR"] > 0
    # exports: csv with per-frame rows, gif per sequence, png per frame
    csv_path = out_dir / "results.csv"
    assert csv_path.exists()
    with open(csv_path) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["name", "PSNR", "SSIM", "CardiacPSNR", "CardiacSSIM", "L1Loss"]
    n_items = len(predictor.test_dataloader.dataset)
    assert len(rows) == 1 + n_items * 10  # frames per sequence
    gifs = list((out_dir / "videos").rglob("*.gif"))
    pngs = list((out_dir / "imgs").rglob("*.png"))
    assert len(gifs) == n_items
    assert len(pngs) == n_items * 10
    # export_nifti: one (H, W, 1, T) volume per sequence in the source
    # layout, values identical to the PNG/GIF display protocol
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        nifti,
    )

    niis = sorted((out_dir / "nifti").rglob("*.nii.gz"))
    assert len(niis) == n_items
    vol = nifti.load(niis[0]).get_data()
    assert vol.shape == (48, 48, 1, 10) and vol.dtype == np.float32
    import imageio.v2 as imageio

    patient = niis[0].parent.name
    png = imageio.imread(
        out_dir / "imgs" / patient
        / f"{niis[0].name.split('.')[0].split('_')[-1].replace('sequence', 'slice')}_frame01.png"
    )
    np.testing.assert_array_equal(vol[..., 0, 0].astype(np.uint8), png)


def test_predict_pipelined_equals_eager(tree, trained, tmp_path_factory, monkeypatch):
    """The double-buffered predictor loop (dispatch k+1 before fetching k)
    must be invisible: logs and the full export tree match the eager
    fetch-each-item-first protocol (EVSR_EAGER_EVAL=1) exactly, including
    the cross-item GIF assembly order."""
    _, train_dir = trained
    out_eager = tmp_path_factory.mktemp("eager_out")
    monkeypatch.setenv("EVSR_EAGER_EVAL", "1")
    pred_eager = run_test_config(_test_cfg(tree, train_dir, out_eager))
    out_pipe = tmp_path_factory.mktemp("pipe_out")
    monkeypatch.delenv("EVSR_EAGER_EVAL")
    pred_pipe = run_test_config(_test_cfg(tree, train_dir, out_pipe))

    assert pred_pipe.log == pred_eager.log
    assert (out_pipe / "results.csv").read_bytes() == (out_eager / "results.csv").read_bytes()
    rel = lambda root: sorted(p.relative_to(root) for p in root.rglob("*") if p.is_file())
    files_e, files_p = rel(out_eager), rel(out_pipe)
    assert files_p == files_e
    for f in files_p:
        if f.suffix in (".gif", ".png", ".gz"):
            assert (out_pipe / f).read_bytes() == (out_eager / f).read_bytes(), f


def test_bicubic_predictor_no_checkpoint(tree, tmp_path_factory):
    out_dir = tmp_path_factory.mktemp("bicubic_out")
    cfg = Cfg(
        {
            "main": {"saved_dir": str(out_dir)},
            "dataset": {
                "name": "AcdcSISRDataset",
                "kwargs": {
                    "data_dir": str(tree["imgs_dir"]),
                    "downscale_factor": 4,
                    "transforms": [
                        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                        {"name": "ToTensor"},
                    ],
                },
            },
            "dataloader": {
                "name": "Dataloader",
                "kwargs": {"batch_size": 1, "shuffle": False, "num_workers": 0},
            },
            "net": {"name": "Bicubic", "kwargs": {"upscale_factor": 4}},
            "losses": [{"name": "L1Loss", "weight": 1.0}],
            "metrics": [{"name": "PSNR"}, {"name": "SSIM"}],
            "predictor": {
                "name": "AcdcSISRPredictor",
                "kwargs": {"device": "cpu", "saved_dir": str(out_dir), "exported": False},
            },
        }
    )
    predictor = run_test_config(cfg)
    assert predictor.log["PSNR"] > 10  # bicubic on smooth synthetic data


def test_predict_with_t_bucketing(tree, trained, tmp_path_factory):
    """t_bucket pads sequences to bucket multiples (one XLA executable per
    bucket); scores stay close to exact since pad frames are real wrapped
    cycle frames and are sliced off before scoring."""
    _, train_dir = trained
    exact_dir = tmp_path_factory.mktemp("t_exact")
    cfg = _test_cfg(tree, train_dir, exact_dir)
    exact = run_test_config(cfg).log

    bucket_dir = tmp_path_factory.mktemp("t_bucket")
    cfg = _test_cfg(tree, train_dir, bucket_dir)
    cfg.predictor.kwargs.update(t_bucket=8, saved_dir=str(bucket_dir))
    cfg.main.saved_dir = str(bucket_dir)
    bucketed = run_test_config(cfg).log

    assert np.isfinite(bucketed["Loss"])
    # the recurrence sees 6 extra wrapped frames (10 → 16); outputs for the
    # true frames shift slightly but the protocol (scored frames, export row
    # count) is unchanged
    assert abs(bucketed["PSNR"] - exact["PSNR"]) < 0.5
    with open(bucket_dir / "results.csv") as f:
        rows_bucketed = sum(1 for _ in f)
    with open(exact_dir / "results.csv") as f:
        rows_exact = sum(1 for _ in f)
    assert rows_bucketed == rows_exact


def test_predict_bf16_compute_dtype(tree, trained, tmp_path_factory):
    """compute_dtype: bfloat16 runs the forward in bf16 (params/opt state and
    metrics stay f32); scores must track the f32 run closely (round-1 probe:
    <0.2 gray levels output delta)."""
    _, train_dir = trained
    f32_dir = tmp_path_factory.mktemp("dtype_f32")
    exact = run_test_config(_test_cfg(tree, train_dir, f32_dir)).log

    bf16_dir = tmp_path_factory.mktemp("dtype_bf16")
    cfg = _test_cfg(tree, train_dir, bf16_dir)
    cfg.predictor.kwargs.update(compute_dtype="bfloat16", saved_dir=str(bf16_dir))
    cfg.main.saved_dir = str(bf16_dir)
    log = run_test_config(cfg).log
    assert abs(log["PSNR"] - exact["PSNR"]) < 0.5, (log["PSNR"], exact["PSNR"])
    assert abs(log["SSIM"] - exact["SSIM"]) < 0.05


def test_train_bf16_compute_dtype(tree, tmp_path_factory):
    import jax.numpy as jnp

    saved_dir = tmp_path_factory.mktemp("train_bf16")
    cfg = _train_cfg(tree, saved_dir)
    cfg.trainer.kwargs.update(compute_dtype="bfloat16", num_epochs=1)
    trainer = train_from_config(cfg)
    assert np.isfinite(trainer.monitor.best)
    # master params and optimizer state remain f32
    leaves = jax.tree.leaves(trainer.params)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_training_converges(tree, tmp_path_factory):
    """The optimization actually learns: 12 epochs of the tiny flagship gain
    >2 dB validation PSNR over the 1-epoch model (empirically ~+4 dB by
    epoch 14 on the synthetic tree)."""
    def best_psnr(epochs, out):
        cfg = _train_cfg(tree, out)
        cfg.trainer.kwargs.update(device="cpu", num_epochs=epochs)
        cfg.monitor.kwargs.update(target="PSNR", mode="max")
        return train_from_config(cfg).monitor.best

    one = best_psnr(1, tmp_path_factory.mktemp("conv1"))
    twelve = best_psnr(12, tmp_path_factory.mktemp("conv12"))
    assert twelve > one + 2.0, (one, twelve)


def test_sigterm_preemption_checkpoints_and_resumes(tree, tmp_path_factory):
    """Preemption safety: SIGTERM mid-training checkpoints at the epoch
    boundary and exits cleanly; loaded_path: auto resumes from it."""
    import os
    import signal
    import subprocess
    import sys
    import textwrap
    import time

    out = tmp_path_factory.mktemp("preempt")
    cfg = _train_cfg(tree, out / "train")
    cfg.trainer.kwargs.update(device="cpu", num_epochs=500)
    cfg.dataloader.kwargs.update(num_workers=0)
    cfg_path = out / "train.yaml"
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg.to_dict(), f)

    script = textwrap.dedent(f"""
        import sys; sys.path.insert(0, {str(Path.cwd())!r})
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import load_config
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import train_from_config
        train_from_config(load_config({str(cfg_path)!r}))
        print("TRAIN_EXITED_CLEANLY", flush=True)
    """)
    # stdout goes to a FILE, not a PIPE: an undrained 64KB pipe would fill
    # with epoch logging and block the child mid-write, so SIGTERM would land
    # in a wedged process and the asserts would fail spuriously
    log_path = out / "child.log"
    with open(log_path, "w") as log_f:
        proc = subprocess.Popen(
            [sys.executable, "-c", script], stdout=log_f,
            stderr=subprocess.STDOUT, text=True,
        )
        # let a couple of epochs complete, then preempt
        deadline = time.time() + 240
        ckpt_dir = out / "train" / "checkpoints"
        while time.time() < deadline and not (ckpt_dir / "model_best.pth").exists():
            time.sleep(1)
            assert proc.poll() is None, log_path.read_text()[-1500:]
        try:
            assert (ckpt_dir / "model_best.pth").exists(), (
                f"no checkpoint within 240s:\n{log_path.read_text()[-1500:]}"
            )
            os.kill(proc.pid, signal.SIGTERM)
            proc.communicate(timeout=240)
        finally:
            if proc.poll() is None:
                proc.kill()
                proc.communicate(timeout=60)
    stdout = log_path.read_text()
    assert proc.returncode == 0, stdout[-1500:]
    assert "TRAIN_EXITED_CLEANLY" in stdout
    assert (ckpt_dir / "model_preempted.pth").exists(), stdout[-1000:]

    # auto-resume picks the newest checkpoint — the preempted one, which may
    # be ahead of any periodic model_N save — and continues
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.checkpoint import (
        find_latest_checkpoint,
    )

    assert find_latest_checkpoint(ckpt_dir).name == "model_preempted.pth"
    cfg.main.loaded_path = "auto"
    cfg.trainer.kwargs.num_epochs = 3
    trainer = train_from_config(cfg)
    assert np.isfinite(trainer.monitor.best)


def test_t_bucketing_on_variable_length_patients(tmp_path_factory):
    """The actual motivation for t_bucket: patients with DIFFERENT cycle
    lengths share one XLA executable per bucket instead of one per distinct
    T, with per-frame rows still matching each patient's true length."""
    import csv as _csv

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        predictors as P,
    )

    vtree = make_acdc_tree(
        tmp_path_factory.mktemp("acdc_var"), hr_size=(48, 48),
        frames_per_patient=[9, 11], patients_per_split=2,
    )
    train_dir = tmp_path_factory.mktemp("var_train")
    cfg = _train_cfg(vtree, train_dir)
    cfg.trainer.kwargs.update(num_epochs=1)
    cfg.dataset.kwargs.update(num_frames=3, num_updated_frames=2)
    cfg.net.kwargs.update(num_stages=1, num_updated_frames=2)
    train_from_config(cfg)

    out_dir = tmp_path_factory.mktemp("var_test")
    cfg = _test_cfg(vtree, train_dir, out_dir)
    cfg.net.kwargs.update(num_stages=1, num_updated_frames=2)
    cfg.dataset.kwargs.update(num_frames=3, num_updated_frames=2)
    cfg.predictor.kwargs.update(t_bucket=12, saved_dir=str(out_dir))

    compiled_shapes = []
    orig = P.BasePredictor._build_step

    def counting_build(self):
        orig(self)
        inner = self._step

        def step(params, state, batch, masks, out_h):
            compiled_shapes.append(batch["lr_imgs"].shape)
            return inner(params, state, batch, masks, out_h)

        self._step = step

    P.BasePredictor._build_step = counting_build
    try:
        predictor = run_test_config(cfg)
    finally:
        P.BasePredictor._build_step = orig

    assert np.isfinite(predictor.log["Loss"])
    # both patient lengths (9 and 11) bucket to 12 -> ONE padded shape
    assert len(set(compiled_shapes)) == 1, set(compiled_shapes)
    # per-frame CSV rows match each patient's TRUE length (9+11 per slice x2)
    with open(out_dir / "results.csv") as f:
        rows = list(_csv.reader(f))
    assert len(rows) - 1 == (9 + 11) * 2


def test_sisr_export_nifti_assembles_frames(tree, tmp_path_factory):
    """SISR items are single frames; export_nifti must assemble them per
    (patient, slice) in dispatch order into one (H, W, 1, T) volume — the
    same cross-item grouping the GIF assembly uses."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        nifti as nifti_io,
    )

    out_dir = tmp_path_factory.mktemp("sisr_nifti")
    cfg = Cfg(
        {
            "main": {"saved_dir": str(out_dir)},
            "dataset": {
                "name": "AcdcSISRDataset",
                "kwargs": {
                    "data_dir": str(tree["imgs_dir"]),
                    "downscale_factor": 4,
                    "transforms": [
                        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
                        {"name": "ToTensor"},
                    ],
                },
            },
            "dataloader": {
                "name": "Dataloader",
                "kwargs": {"batch_size": 1, "shuffle": False, "num_workers": 0},
            },
            "net": {"name": "Bicubic", "kwargs": {"upscale_factor": 4}},
            "losses": [{"name": "L1Loss", "weight": 1.0}],
            "metrics": [{"name": "PSNR"}],
            "predictor": {
                "name": "AcdcSISRPredictor",
                "kwargs": {"device": "cpu", "saved_dir": str(out_dir),
                           "exported": True, "export_nifti": True},
            },
        }
    )
    predictor = run_test_config(cfg)
    n_frames = len(predictor.test_dataloader.dataset)
    niis = sorted((out_dir / "nifti").rglob("*.nii.gz"))
    vols = [nifti_io.load(p).get_data() for p in niis]
    assert sum(v.shape[-1] for v in vols) == n_frames
    assert all(v.shape[:3] == (48, 48, 1) for v in vols)
    # every slice got exactly one volume, matching its GIF's frame count
    gifs = sorted((out_dir / "videos").rglob("*.gif"))
    assert len(niis) == len(gifs)
