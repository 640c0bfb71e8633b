"""The generated config zoo must RUN, not just resolve: for one family per
workload, load the generated YAML, shrink the net/epochs, point it at the
synthetic tree, and drive the real train + test paths."""
import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import Cfg
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
    test_from_config as run_test_config,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
    train_from_config,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
    gen_configs,
)
from fixtures import make_acdc_tree

pytestmark = pytest.mark.slow

FRAMES = 10

# family → (tiny net overrides, dataset overrides)
CASES = {
    "edsr_net": ({"num_resblocks": 1, "num_features": 8}, {}),
    "srfb_net": ({"num_steps": 2, "num_features": 8, "num_groups": 2}, {}),
    "duf_net": ({}, {}),  # backbone fixed; frames must stay 7
    "edvr_net": (
        {"nf": 8, "nframes": 5, "groups": 2, "front_RBs": 1, "back_RBs": 1},
        {"num_frames": 5},
    ),
    "toflow_net": ({"num_frames": 3}, {"num_frames": 3}),
    "rbp_net": (
        {"base_filter": 8, "feat": 8, "num_resblocks": 1, "num_frames": 3},
        {"num_frames": 3},
    ),
    "drf_net": ({"num_features": 8, "num_groups": 2}, {"num_frames": 3}),
    "frvsr_net": ({"num_resblocks": 1}, {"num_frames": 3}),
    "refine_net": (
        {"num_features": [6, 6], "num_stages": 2, "num_updated_frames": 2},
        {"num_frames": 3, "num_updated_frames": 2},
    ),
}


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_acdc_tree(tmp_path_factory.mktemp("acdc"), frames=FRAMES, hr_size=(48, 48))


def _patch(cfg: Cfg, tree, out_dir, family, kind) -> Cfg:
    net_over, ds_over = CASES[family]
    cfg = Cfg(cfg.to_dict())
    is_imgs = "imgs" in cfg.dataset.kwargs.data_dir
    cfg.dataset.kwargs.data_dir = str(tree["imgs_dir"] if is_imgs else tree["videos_dir"])
    if "pos_code_path" in cfg.dataset.kwargs:
        cfg.dataset.kwargs.pos_code_path = str(tree["pos_code_path"])
    cfg.dataset.kwargs.update(ds_over)
    cfg.net.kwargs.update(net_over)
    cfg.main.saved_dir = str(out_dir / kind)
    if kind == "train":
        cfg.trainer.kwargs.update(device="cpu", num_epochs=1)
        cfg.dataloader.kwargs.update(train_batch_size=2, num_workers=0, drop_last=True)
        if "augments" in cfg.dataset.kwargs:
            for aug in cfg.dataset.kwargs.augments:
                if aug["name"] == "RandomCropPatch":
                    aug.kwargs.size = [8, 8]
        cfg.monitor.kwargs.saved_freq = 1
    else:
        cfg.predictor.kwargs.update(device="cpu", exported=False,
                                    saved_dir=str(out_dir / kind))
        cfg.dataloader.kwargs.update(num_workers=0)
        cfg.main.loaded_path = str(out_dir / "train" / "checkpoints" / "model_best.pth")
        for m in list(cfg.metrics):
            if "Cardiac" in m["name"]:
                m.kwargs.coordinates_path = str(tree["coordinates_path"])
    return cfg


@pytest.mark.parametrize("family", sorted(CASES))
def test_generated_config_trains_and_tests(tmp_path_factory, tree, family):
    out_dir = tmp_path_factory.mktemp(family)
    factor = 4
    train_cfg = gen_configs.train_config(family, factor, "UNUSED", "UNUSED")
    test_cfg = gen_configs.test_config(family, factor, "UNUSED", "UNUSED")

    trainer = train_from_config(_patch(Cfg(train_cfg), tree, out_dir, family, "train"))
    assert np.isfinite(trainer.monitor.best)

    predictor = run_test_config(_patch(Cfg(test_cfg), tree, out_dir, family, "test"))
    assert np.isfinite(predictor.log["Loss"])
    assert predictor.log["PSNR"] > 0


@pytest.mark.parametrize("family", ["edsr_net", "duf_net"])
def test_generated_dsb15_external_eval(tmp_path_factory, tree, family):
    """DSB15 external-eval configs: train on ACDC, evaluate via the generated
    exp1_x4_dsb15 config (Dsb15* dataset + ACDC predictor/denorm stats), as the
    reference does in configs/test/<family>/exp1_x4_dsb15.yaml."""
    out_dir = tmp_path_factory.mktemp(f"{family}_dsb15")
    factor = 4
    train_cfg = gen_configs.train_config(family, factor, "UNUSED", "UNUSED")
    trainer = train_from_config(_patch(Cfg(train_cfg), tree, out_dir, family, "train"))
    assert np.isfinite(trainer.monitor.best)

    test_cfg = gen_configs.test_config(family, factor, "UNUSED", "UNUSED",
                                       dataset_prefix="Dsb15", suffix="_dsb15")
    assert test_cfg["dataset"]["name"].startswith("Dsb15")
    assert test_cfg["predictor"]["name"].startswith("Acdc")  # ACDC denorm stats
    predictor = run_test_config(_patch(Cfg(test_cfg), tree, out_dir, family, "test"))
    assert np.isfinite(predictor.log["Loss"])
    assert predictor.log["PSNR"] > 0


def test_generated_dsb15_bicubic_config(tmp_path_factory, tree):
    out_dir = tmp_path_factory.mktemp("bicubic_dsb15")
    cfg = Cfg(gen_configs.bicubic_test_config(4, "UNUSED", "UNUSED",
                                              dataset_prefix="Dsb15", suffix="_dsb15"))
    assert cfg.dataset.name == "Dsb15SISRDataset"
    cfg.dataset.kwargs.data_dir = str(tree["imgs_dir"])
    cfg.main.saved_dir = str(out_dir)
    cfg.predictor.kwargs.update(device="cpu", exported=False, saved_dir=str(out_dir))
    cfg.dataloader.kwargs.update(num_workers=0)
    for m in list(cfg.metrics):
        if "Cardiac" in m["name"]:
            m.kwargs.coordinates_path = str(tree["coordinates_path"])
    predictor = run_test_config(cfg)
    assert predictor.log["PSNR"] > 10


def test_generated_bicubic_config(tmp_path_factory, tree):
    out_dir = tmp_path_factory.mktemp("bicubic")
    cfg = Cfg(gen_configs.bicubic_test_config(4, "UNUSED", "UNUSED"))
    cfg.dataset.kwargs.data_dir = str(tree["imgs_dir"])
    cfg.main.saved_dir = str(out_dir)
    cfg.predictor.kwargs.update(device="cpu", exported=False, saved_dir=str(out_dir))
    cfg.dataloader.kwargs.update(num_workers=0)
    for m in list(cfg.metrics):
        if "Cardiac" in m["name"]:
            m.kwargs.coordinates_path = str(tree["coordinates_path"])
    predictor = run_test_config(cfg)
    assert predictor.log["PSNR"] > 10


def test_generated_tpu_extras_configs(tmp_path_factory, tree):
    """The TPU-extension showcase configs (exp1_x4_tpu): training with
    compute_dtype=bfloat16 over the 8-fake-device data mesh, eval with bf16 +
    T-bucketing — all through the real config path."""
    import yaml as _yaml

    out_dir = tmp_path_factory.mktemp("tpu_extras")
    train_cfg = gen_configs.train_config("refine_net", 4, "UNUSED", "UNUSED")
    train_cfg["trainer"]["kwargs"]["compute_dtype"] = "bfloat16"
    train_cfg["parallel"] = {"num_devices": 8}
    cfg = _patch(Cfg(train_cfg), tree, out_dir, "refine_net", "train")
    cfg.dataloader.kwargs.train_batch_size = 8  # divisible over the mesh
    trainer = train_from_config(cfg)
    assert np.isfinite(trainer.monitor.best)
    assert trainer.mesh is not None and trainer.mesh.devices.size == 8

    test_cfg = gen_configs.test_config("refine_net", 4, "UNUSED", "UNUSED", suffix="_tpu")
    test_cfg["predictor"]["kwargs"].update(compute_dtype="bfloat16", t_bucket=8)
    predictor = run_test_config(_patch(Cfg(test_cfg), tree, out_dir, "refine_net", "test"))
    assert np.isfinite(predictor.log["Loss"])
    assert predictor.log["PSNR"] > 0

    # the committed YAMLs carry the same knobs
    with open("configs/train/refine_net/exp1_x4_tpu.yaml") as f:
        committed = _yaml.safe_load(f)
    assert committed["trainer"]["kwargs"]["compute_dtype"] == "bfloat16"
    assert committed["parallel"] == {"num_devices": 8}
    with open("configs/test/refine_net/exp1_x4_tpu.yaml") as f:
        committed = _yaml.safe_load(f)
    assert committed["predictor"]["kwargs"]["t_bucket"] == 8


@pytest.mark.parametrize("family", ["toflow_net", "frvsr_net"])
def test_generated_warp_tpu_serving_configs(tmp_path_factory, tree, family):
    """The TOFlow/FRVSR TPU serving showcases (exp1_x4_tpu): gather-free
    windowed warps (max_flow=4) + bf16, evaluated through the real config
    path on a checkpoint saved with exact (unbounded) warp semantics.
    (Fresh-init checkpoint — the plain-config TRAINING path for these
    families is already covered by test_generated_config_trains_and_tests.)"""
    import jax
    import jax.numpy as jnp
    import yaml as _yaml

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        models as M,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        checkpoint as ckpt_io,
    )

    out_dir = tmp_path_factory.mktemp(f"{family}_warp_tpu")
    test_cfg = gen_configs.test_config(family, 4, "UNUSED", "UNUSED", suffix="_tpu")
    test_cfg["net"]["kwargs"]["max_flow"] = 4
    test_cfg["predictor"]["kwargs"]["compute_dtype"] = "bfloat16"
    cfg = _patch(Cfg(test_cfg), tree, out_dir, family, "test")

    # fresh-init checkpoint under the exact net (same params tree as windowed)
    exact_kwargs = dict(cfg.net.kwargs.to_dict())
    exact_kwargs.pop("max_flow")
    net = getattr(M, cfg.net.name)(**exact_kwargs)
    T = cfg.dataset.kwargs.get("num_frames", 3)
    variables = jax.jit(net.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, T, 8, 8, 1), jnp.float32)
    )
    ckpt_dir = out_dir / "train" / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    variables = dict(variables)
    ckpt_io.save_checkpoint(
        ckpt_dir / "model_best.pth",
        params=variables.pop("params"),
        model_state=variables,  # TOFlow's SpyNet carries batch_stats
    )

    predictor = run_test_config(cfg)
    assert np.isfinite(predictor.log["Loss"])
    assert predictor.log["PSNR"] > 0
    assert predictor.net.max_flow == 4

    with open(f"configs/test/{family}/exp1_x4_tpu.yaml") as f:
        committed = _yaml.safe_load(f)
    assert committed["net"]["kwargs"]["max_flow"] == 4
    assert committed["predictor"]["kwargs"]["compute_dtype"] == "bfloat16"


def test_generated_edvr_tpu_train_config(tmp_path_factory, tree):
    """The EDVR TPU training showcase (exp1_x4_tpu): 2x gradient accumulation
    through the real config path (the knob that keeps the batch-16 backward
    under compiler graph limits).  The tiny CPU run keeps the gather DCN —
    the windowed TRAIN graph compiles pathologically slowly on the CPU
    backend (>25 min for even the tiny net) while its grads are already
    parity-tested in test_deform_conv; the committed YAML (asserted below)
    carries both knobs for the real chip."""
    import yaml as _yaml

    out_dir = tmp_path_factory.mktemp("edvr_train_tpu")
    train_cfg = gen_configs.train_config("edvr_net", 4, "UNUSED", "UNUSED")
    train_cfg["trainer"]["kwargs"]["grad_accum_steps"] = 2
    trainer = train_from_config(_patch(Cfg(train_cfg), tree, out_dir, "edvr_net", "train"))
    assert np.isfinite(trainer.monitor.best)
    assert trainer.grad_accum_steps == 2

    with open("configs/train/edvr_net/exp1_x4_tpu.yaml") as f:
        committed = _yaml.safe_load(f)
    assert committed["trainer"]["kwargs"]["grad_accum_steps"] == 2
    assert committed["net"]["kwargs"]["dcn_max_offset"] == 2


def test_generated_edvr_tpu_serving_config(tmp_path_factory, tree):
    """The EDVR TPU serving showcase (exp1_x4_tpu): the gather-free windowed
    DCN (dcn_max_offset) + bf16, evaluated through the real config path on a
    checkpoint trained with exact (unbounded) DCN semantics."""
    import yaml as _yaml

    out_dir = tmp_path_factory.mktemp("edvr_tpu")
    train_cfg = gen_configs.train_config("edvr_net", 4, "UNUSED", "UNUSED")
    trainer = train_from_config(_patch(Cfg(train_cfg), tree, out_dir, "edvr_net", "train"))
    assert np.isfinite(trainer.monitor.best)

    test_cfg = gen_configs.test_config("edvr_net", 4, "UNUSED", "UNUSED", suffix="_tpu")
    test_cfg["net"]["kwargs"]["dcn_max_offset"] = 2
    test_cfg["predictor"]["kwargs"]["compute_dtype"] = "bfloat16"
    cfg = _patch(Cfg(test_cfg), tree, out_dir, "edvr_net", "test")
    predictor = run_test_config(cfg)
    assert np.isfinite(predictor.log["Loss"])
    assert predictor.log["PSNR"] > 0
    assert predictor.net.dcn_max_offset == 2

    with open("configs/test/edvr_net/exp1_x4_tpu.yaml") as f:
        committed = _yaml.safe_load(f)
    assert committed["net"]["kwargs"]["dcn_max_offset"] == 2
    assert committed["predictor"]["kwargs"]["compute_dtype"] == "bfloat16"
