"""EVERY shipped YAML's components must construct with its kwargs as written.

``test_config_zoo_e2e`` drives one (shrunk) config per family through the
real train/test paths; this test closes the rest of the surface: all ~78
YAMLs under ``configs/`` are loaded verbatim and every named component —
net, losses, metrics (Cardiac ones included, via a fixture coordinates.pkl
placed at the configs' relative paths), optimizer, lr scheduler, logger,
monitor, dataset (+ one real item fetched), dataloader — is constructed with
the EXACT kwargs the YAML ships.  Catches kwargs drift between the config
generator and the component signatures that the per-family e2e (which
overrides kwargs to shrink nets) cannot see.
"""
from pathlib import Path

import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
    Cfg,
    DATALOADERS,
    DATASETS,
    LOGGERS,
    LOSSES,
    METRICS,
    MONITORS,
    NETS,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
    _import_components,
)
from fixtures import make_acdc_tree

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parents[1]
CONFIGS = sorted((REPO / "configs").rglob("*.yaml"))


@pytest.fixture(scope="module")
def zoo_cwd(tmp_path_factory):
    """A cwd where the zoo's relative ./data/... paths resolve to the
    synthetic fixture tree (both acdc_* and dsb15_* roots)."""
    root = tmp_path_factory.mktemp("zoo_cwd")
    # 14 frames: >= the largest num_frames (7) + DUF margins.  HR 132 is
    # divisible by every factor (so the stored LR x factor == HR exactly,
    # which the pairing transforms assert) and every LR (66/44/33) admits the
    # train configs' 32x32 RandomCropPatch.
    tree = make_acdc_tree(root / "fixture", frames=14, hr_size=(132, 132),
                          factors=(2, 3, 4))
    for prep, crop in (("acdc_preprocessed", "acdc_cropped"),
                       ("dsb15_preprocessed", "dsb15_cropped")):
        d = root / "data" / prep
        d.mkdir(parents=True)
        (d / "videos").symlink_to(tree["videos_dir"])
        (d / "imgs").symlink_to(tree["imgs_dir"])
        (d / "position_code.pkl").symlink_to(tree["pos_code_path"])
        c = root / "data" / crop
        c.mkdir(parents=True)
        (c / "coordinates.pkl").symlink_to(tree["coordinates_path"])
    return root


def test_zoo_is_present():
    assert len(CONFIGS) >= 78, [str(p) for p in CONFIGS]


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[str(p.relative_to(REPO / "configs")) for p in CONFIGS]
)
def test_every_zoo_config_constructs(path, zoo_cwd, monkeypatch):
    _import_components()
    monkeypatch.chdir(zoo_cwd)
    cfg = Cfg.from_yaml(path)

    net = NETS.build(cfg.net)
    for c in cfg.get("losses", []):
        LOSSES.build(c)
    for c in cfg.get("metrics", []):
        METRICS.build(c)

    is_test = "predictor" in cfg
    ds_type = "test" if is_test else "train"
    ds = DATASETS.build(cfg.dataset, type=ds_type)
    assert len(ds) > 0
    item = ds[0]
    assert any(hasattr(v, "shape") for v in item.values())

    dl_kwargs = dict(cfg.dataloader.get("kwargs") or {})
    dl_kwargs.pop("train_batch_size", None)
    dl_kwargs.pop("valid_batch_size", None)
    dl_kwargs.pop("test_batch_size", None)
    dl_kwargs.pop("batch_size", None)
    dl_kwargs["shuffle"] = False
    dl_cls = DATALOADERS.get(cfg.dataloader.name)
    dl_cls(ds, batch_size=1, collate_fn=getattr(type(ds), "collate_fn", None),
           **dl_kwargs)

    if is_test:
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
            PREDICTORS,
        )

        PREDICTORS.get(cfg.predictor.name)  # class resolves
    else:
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
            build_lr_scheduler,
            build_optimizer,
        )
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.trainers import (
            TRAINERS,
        )

        build_optimizer(cfg.optimizer)
        if "lr_scheduler" in cfg:
            build_lr_scheduler(cfg.lr_scheduler, base_lr=cfg.optimizer.kwargs.lr)
        logger_kwargs = dict(cfg.logger.get("kwargs") or {})
        LOGGERS.get(cfg.logger.name)(
            log_dir=zoo_cwd / "log", net=net, **logger_kwargs
        )
        MONITORS.build(cfg.monitor, checkpoints_dir=zoo_cwd / "ckpt")
        TRAINERS.get(cfg.trainer.name)  # class resolves
