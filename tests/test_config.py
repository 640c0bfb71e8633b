import textwrap

import pytest

import efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu as evsr
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
    Cfg,
    Registry,
)

REFERENCE_TRAIN_YAML = textwrap.dedent(
    """
    main:
        random_seed: 'vsr'
        saved_dir: './models/acdc_vsr/refine_net/exp1_x4/train'

    dataset:
        name: 'AcdcVSRRefineNetDataset'
        kwargs:
            data_dir: '/data/acdc_preprocessed/videos'
            downscale_factor: 4
            transforms:
                - name: 'Normalize'
                  kwargs:
                      means: [54.089]
                      stds: [48.084]
                - name: 'ToTensor'
            num_frames: 7

    losses:
        - name: 'L1Loss'
          weight: 1.0

    net:
        name: 'RefineNet'
        kwargs:
            num_features: [64, 64, 64]
    """
)


def test_cfg_dot_access_matches_reference_schema():
    cfg = Cfg.from_yaml(yaml_string=REFERENCE_TRAIN_YAML)
    assert cfg.main.random_seed == "vsr"
    assert cfg.dataset.name == "AcdcVSRRefineNetDataset"
    assert cfg.dataset.kwargs.downscale_factor == 4
    assert cfg.dataset.kwargs.transforms[0].kwargs.means == [54.089]
    assert cfg.losses[0].weight == 1.0
    assert cfg.net.kwargs.num_features == [64, 64, 64]
    assert cfg.get("lr_scheduler") is None


def test_cfg_update_and_roundtrip():
    cfg = Cfg.from_yaml(yaml_string=REFERENCE_TRAIN_YAML)
    cfg.dataset.kwargs.update(data_dir="/tmp/x", type="train")
    assert cfg.dataset.kwargs.type == "train"
    dumped = cfg.to_yaml()
    cfg2 = Cfg.from_yaml(yaml_string=dumped)
    assert cfg2.to_dict() == cfg.to_dict()


def test_cfg_nested_assignment_wraps():
    cfg = Cfg()
    cfg.a = {"b": {"c": 1}}
    assert cfg.a.b.c == 1
    cfg["d"] = [{"e": 2}]
    assert cfg.d[0].e == 2


def test_registry_build():
    reg = Registry("thing")

    @reg.register()
    class Foo:
        def __init__(self, x, y=0):
            self.x, self.y = x, y

    obj = reg.build(Cfg({"name": "Foo", "kwargs": {"x": 1, "y": 2}}))
    assert (obj.x, obj.y) == (1, 2)
    obj = reg.build(Cfg({"name": "Foo"}), 5)
    assert obj.x == 5
    with pytest.raises(KeyError):
        reg.build(Cfg({"name": "Bar"}))


def test_package_importable():
    assert evsr.__version__


def _zoo_files(root):
    from pathlib import Path

    return sorted(p for p in Path(root).rglob("*.yaml") if "example" not in p.name)


@pytest.mark.parametrize(
    "root", ["/root/repo/configs", "/root/reference/configs"], ids=["ours", "reference"]
)
def test_config_zoo_resolves(root):
    """Every YAML in the zoo (ours AND the reference's, loaded verbatim) must
    name only components that exist in the registries — the config surface
    contract (reference configs are the compatibility target, SURVEY §2.1)."""
    from pathlib import Path

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        config as C,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
        _import_components,
    )

    _import_components()
    files = _zoo_files(root)
    assert len(files) >= 50 if "repo" in root else len(files) >= 55
    for path in files:
        cfg = C.load_config(path)
        assert cfg.dataset.name in C.DATASETS, (path, cfg.dataset.name)
        assert cfg.net.name in C.NETS, (path, cfg.net.name)
        for loss in cfg.losses:
            assert loss["name"] in C.LOSSES, (path, loss["name"])
        for metric in cfg.get("metrics", []):
            assert metric["name"] in C.METRICS, (path, metric["name"])
        if "trainer" in cfg:
            assert cfg.trainer.name in C.TRAINERS, (path, cfg.trainer.name)
            assert cfg.optimizer.name in C.OPTIMIZERS, (path, cfg.optimizer.name)
            assert cfg.logger.name in C.LOGGERS, (path, cfg.logger.name)
            assert cfg.monitor.name in C.MONITORS, (path, cfg.monitor.name)
        else:
            assert cfg.predictor.name in C.PREDICTORS, (path, cfg.predictor.name)
        for t in cfg.dataset.kwargs.get("transforms", []):
            assert t["name"] in C.TRANSFORMS, (path, t["name"])
        for t in cfg.dataset.kwargs.get("augments", []):
            assert t["name"] in C.TRANSFORMS, (path, t["name"])


def test_registry_unknown_name_lists_available():
    """A typo'd component name in YAML fails with the available names listed
    (the verify-skill probe contract)."""
    import pytest

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        main as _main,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
        NETS,
    )

    _main._import_components()
    with pytest.raises(KeyError, match="Unknown net.*Available.*RefineNet"):
        NETS.get("RefineNett")
