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
