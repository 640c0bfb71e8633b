"""Lossless integer-dtype device feed (trainer ``int_feed``).

The knob moves the datasets' explicit-stats Normalize on device and compacts
integer-valued float32 batches to uint8/int16 for the H2D transfer — built
for tunneled/remote-host chips where the per-step batch upload, not compute,
bounds the train rate (PERF_NOTES.md "E2E training ... H2D-upload-bound").
These tests pin (a) the lossless-compaction guard, (b) the host-pipeline
deferral, and (c) that training with the knob matches host-side
normalization (same data, same init, same optimizer) to float32 tolerance.
"""
import logging

import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
    DATASETS,
    TRAINERS,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data import (
    Dataloader,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import losses as L
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import metrics as M
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import models as nets
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
    common,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
    Optimizer,
)
from fixtures import make_acdc_tree

NORM = [
    {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
    {"name": "ToTensor"},
]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    # fixture HR/LR volumes are .round()ed to [0, 255] — integer-valued
    # float32 on disk, exactly like the real preprocessed ACDC trees
    return make_acdc_tree(tmp_path_factory.mktemp("acdc"), frames=8, hr_size=(32, 32))


# ------------------------------------------------------------------ compaction
def test_compact_lossless_guard():
    f = np.float32
    # integer-valued in [0, 255] -> uint8
    x = np.array([0, 1, 254, 255], f)
    c = common.compact_lossless(x)
    assert c.dtype == np.uint8
    np.testing.assert_array_equal(c.astype(f), x)
    # negative / >255 integers -> int16
    c = common.compact_lossless(np.array([-7, 300], f))
    assert c.dtype == np.int16
    # fractional values pass through untouched (lossless or nothing)
    x = np.array([1.5, 2.0], f)
    assert common.compact_lossless(x) is x
    # out of int16 range -> unchanged
    x = np.array([70000.0], f)
    assert common.compact_lossless(x) is x
    # non-finite -> unchanged
    x = np.array([np.nan, 1.0], f)
    assert common.compact_lossless(x) is x
    # non-f32 input (already compact, or f64) -> unchanged
    x = np.array([1, 2], np.uint8)
    assert common.compact_lossless(x) is x


# -------------------------------------------------------------------- deferral
def test_defer_normalize_pops_host_transform(tree):
    ds = DATASETS.get("AcdcSISRDataset")(
        data_dir=tree["imgs_dir"], type="train", downscale_factor=4, transforms=NORM
    )
    assert ds.deferrable_normalize() == ([54.089], [48.084])
    before = ds[0]["hr_img"]  # normalized by the host pipeline
    stats = ds.defer_normalize()
    assert stats == ([54.089], [48.084])
    assert ds.deferrable_normalize() is None  # popped
    after = ds[0]["hr_img"]  # now raw source intensities
    assert after.min() >= 0 and after.max() <= 255
    np.testing.assert_array_equal(after, np.round(after))  # integer-valued
    # applying the deferred op reproduces the host pipeline (same f32 math)
    np.testing.assert_allclose(
        (after - np.float32(54.089)) / np.float32(48.084 + 1e-10), before, rtol=1e-6
    )


def test_image_level_normalize_cannot_defer(tree):
    ds = DATASETS.get("AcdcSISRDataset")(
        data_dir=tree["imgs_dir"],
        type="train",
        downscale_factor=4,
        transforms=[{"name": "Normalize"}, {"name": "ToTensor"}],
    )
    assert ds.deferrable_normalize() is None
    assert ds.defer_normalize() is None  # pipeline left intact
    assert any(type(t).__name__ == "Normalize" for t in ds.transforms.transforms)


# ------------------------------------------------------------------- trainer AB
def _sisr_trainer(tree, int_feed: bool, **kw):
    net = nets.EDSRNet(1, 1, num_resblocks=2, num_features=8, upscale_factor=4)
    loaders = []
    for split in ("train", "valid"):
        ds = DATASETS.get("AcdcSISRDataset")(
            data_dir=tree["imgs_dir"], type=split, downscale_factor=4, transforms=NORM
        )
        loaders.append(Dataloader(ds, batch_size=4, shuffle=False))
    return TRAINERS.get("AcdcSISRTrainer")(
        train_dataloader=loaders[0],
        valid_dataloader=loaders[1],
        net=net,
        loss_fns=[L.L1Loss()],
        metric_fns=[M.PSNR()],
        optimizer=Optimizer("Adam", lr=1e-3),
        num_epochs=2,
        int_feed=int_feed,
        **kw,
    )


def test_int_feed_trainer_matches_host_normalize(tree):
    """Same data, same init seed, same optimizer: the int_feed run's per-epoch
    losses/metrics must match the host-normalized run.  Tolerance covers the
    documented XLA:CPU f32-division rounding (CLAUDE.md): the deferred divide
    runs on device instead of in numpy."""
    ref = _sisr_trainer(tree, int_feed=False)
    alt = _sisr_trainer(tree, int_feed=True)
    assert alt._feed_norm is not None  # engaged

    # the compacted feed actually ships uint8 over the wire
    batch = next(iter(alt.train_dataloader))
    compact = alt._compact_feed(batch)
    assert compact["hr_img"].dtype == np.uint8
    assert compact["lr_img"].dtype == np.uint8  # fixture LR is decimated HR
    assert batch["hr_img"].dtype == np.float32  # host copy untouched

    for mode in ("training", "validation", "training"):
        log_ref, _, _ = ref._run_epoch(mode)
        log_alt, _, _ = alt._run_epoch(mode)
        assert log_ref.keys() == log_alt.keys()
        for key in log_ref:
            np.testing.assert_allclose(
                log_alt[key], log_ref[key], rtol=5e-5, atol=1e-6, err_msg=f"{mode}:{key}"
            )


# --------------------------------------------------------------- bf16 LR wire
@pytest.fixture(scope="module")
def frac_tree(tmp_path_factory):
    """Tree whose LR images are FRACTIONAL float32 (like the real k-space-
    degraded LR trees) — they fail the lossless integer guard and exercise
    the bf16 wire fallback."""
    from pathlib import Path

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        nifti,
    )

    tree = make_acdc_tree(tmp_path_factory.mktemp("acdc_frac"), frames=8, hr_size=(32, 32))
    for split_dir in Path(tree["imgs_dir"]).iterdir():
        for f in (split_dir / "LR").rglob("*.nii.gz"):
            img = nifti.load(f)
            nifti.save(np.asarray(img.data, np.float32) * np.float32(0.7317), f)
    return tree


def test_bf16_lr_wire_under_bf16_compute(frac_tree):
    """compute_dtype=bfloat16 + int_feed: fractional LR ships bf16 on the
    wire (the forward casts it to bf16 anyway), integer HR still uint8, and
    the loss trajectory stays within the bf16 input-rounding envelope of the
    f32-wire run (<= 1 bf16 ulp per input value, rounded before the on-device
    normalize instead of after the compute cast)."""
    import jax.numpy as jnp

    ref = _sisr_trainer(frac_tree, int_feed=False, compute_dtype="bfloat16")
    alt = _sisr_trainer(frac_tree, int_feed=True, compute_dtype="bfloat16")
    assert alt._feed_norm is not None

    batch = next(iter(alt.train_dataloader))
    compact = alt._compact_feed(batch)
    assert compact["lr_img"].dtype == jnp.bfloat16  # fractional input -> bf16 wire
    assert compact["hr_img"].dtype == np.uint8  # target NEVER bf16-compressed
    assert compact["lr_img"].nbytes * 2 == batch["lr_img"].nbytes  # half the bytes

    for mode in ("training", "validation"):
        log_ref, _, _ = ref._run_epoch(mode)
        log_alt, _, _ = alt._run_epoch(mode)
        for key in log_ref:
            np.testing.assert_allclose(
                log_alt[key], log_ref[key], rtol=2e-2, atol=2e-2,
                err_msg=f"{mode}:{key}",
            )


def test_f32_compute_never_ships_bf16(frac_tree):
    """Without the bf16 compute knob the wire stays full precision — the
    compression is gated on cast-at-compute making it unobservable."""
    alt = _sisr_trainer(frac_tree, int_feed=True)
    batch = next(iter(alt.train_dataloader))
    compact = alt._compact_feed(batch)
    assert compact["lr_img"].dtype == np.float32


def test_int_feed_disabled_without_deferrable_normalize(caplog):
    """Datasets without an explicit-stats Normalize (or without the deferral
    protocol at all) downgrade to the plain f32 feed with a warning."""

    class _Items:
        def __init__(self):
            rng = np.random.default_rng(0)
            self.items = [
                {
                    "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
                    "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
                    "index": i,
                }
                for i in range(4)
            ]

        def __len__(self):
            return len(self.items)

        def __getitem__(self, i, rng=None):
            return self.items[i]

    ds = _Items()
    loader = Dataloader(ds, batch_size=2, shuffle=False)
    vloader = Dataloader(ds, batch_size=2, shuffle=False)
    net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
    with caplog.at_level(logging.WARNING):
        trainer = TRAINERS.get("AcdcSISRTrainer")(
            train_dataloader=loader,
            valid_dataloader=vloader,
            net=net,
            loss_fns=[L.L1Loss()],
            metric_fns=[],
            optimizer=Optimizer("Adam", lr=1e-3),
            num_epochs=1,
            int_feed=True,
        )
    assert trainer.int_feed is False and trainer._feed_norm is None
    assert any("int_feed disabled" in r.message for r in caplog.records)
    log, _, _ = trainer._run_epoch("training")  # still trains
    assert np.isfinite(log["Loss"])
