import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
    DATASETS,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data import (
    Dataloader,
    transforms as T,
)
from fixtures import make_acdc_tree

FRAMES = 12
NORM = [{"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}}, {"name": "ToTensor"}]


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    return make_acdc_tree(tmp_path_factory.mktemp("acdc"), frames=FRAMES)


# ---------------------------------------------------------------- transforms
def test_normalize_and_tags():
    img = np.full((4, 4, 1), 100.0, np.float32)
    out = T.Normalize(means=[54.089], stds=[48.084])(img, img, normalize_tags=[True, False])
    np.testing.assert_allclose(out[0], (100 - 54.089) / (48.084 + 1e-10), rtol=1e-6)
    np.testing.assert_allclose(out[1], 100.0)


def test_normalize_image_level():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 255, (8, 8, 1)).astype(np.float32)
    (out,) = T.Normalize()(img)
    assert abs(out.mean()) < 1e-5 and abs(out.std() - 1) < 1e-4


def test_random_crop_patch_pairs_lr_hr():
    rng = np.random.default_rng(3)
    lr = np.arange(16 * 16).reshape(16, 16, 1).astype(np.float32)
    hr = np.kron(lr[..., 0], np.ones((4, 4)))[..., None].astype(np.float32)
    out = T.RandomCropPatch(size=[8, 8], ratio=4)(lr, lr, hr, hr, rng=rng)
    lr_c, hr_c = out[0], out[2]
    assert lr_c.shape == (8, 8, 1) and hr_c.shape == (32, 32, 1)
    np.testing.assert_array_equal(np.kron(lr_c[..., 0], np.ones((4, 4))), hr_c[..., 0])


def test_flips_consistent_across_tuple():
    rng_state = np.random.default_rng(1)
    a = np.arange(12).reshape(3, 4, 1).astype(np.float32)
    out = T.RandomHorizontalFlip(prob=1.0)(a, a.copy(), rng=rng_state)
    np.testing.assert_array_equal(out[0], out[1])
    np.testing.assert_array_equal(out[0], np.flip(a, 1))


def test_elastic_deformation_runs_and_preserves_shape():
    rng = np.random.default_rng(5)
    img = np.random.default_rng(0).uniform(0, 1, (24, 24, 1)).astype(np.float32)
    out = T.RandomElasticDeformation(prob=1.0, sigma=3)(img, img, rng=rng)
    assert out[0].shape == img.shape
    assert not np.allclose(out[0], img)  # actually deformed
    np.testing.assert_array_equal(out[0], out[1])  # same field for the tuple


def test_elastic_deformation_field_distribution():
    """Quantifies the deformation class the reference's SimpleITK B-spline
    produces (transforms.py:230-318): per-pixel displacement is a smooth,
    near-zero-mean field whose marginal spread tracks sigma, with a
    low-frequency (control-grid-limited) spatial gradient.  SimpleITK is
    absent here, so the assertions pin OUR field to those properties instead
    of asserting 'same class' without evidence."""
    sigma, n_ctrl, shape = 15.0, 4, (32, 32)
    tf = T.RandomElasticDeformation(prob=1.0, sigma=sigma, num_ctrl_points=n_ctrl)
    rng = np.random.default_rng(0)
    fields = []
    for _ in range(64):
        fy, fx = tf._dense_field(rng, shape)
        fields.append(np.stack([fy, fx]))
    f = np.stack(fields)  # (64, 2, 32, 32)

    # marginal spread tracks sigma (cubic upsampling of a N(0, sigma^2) grid
    # keeps control-point variance and smooths between, so std is near but
    # below sigma)
    assert 0.5 * sigma < f.std() < 1.1 * sigma, f.std()
    # near-zero mean displacement over draws
    assert abs(f.mean()) < 0.2 * sigma, f.mean()
    # smooth: the dense field's per-pixel gradient is bounded by the control
    # grid spacing — a 4-point grid over 32 px cannot oscillate faster than
    # ~sigma per (32/4) px; allow 3x for cubic overshoot
    grad = np.abs(np.diff(f, axis=2)).mean()
    assert grad < 3 * sigma * n_ctrl / shape[0], grad
    # magnitude histogram: most displacement magnitudes within 3 sigma
    mag = np.hypot(f[:, 0], f[:, 1])
    assert np.quantile(mag, 0.99) < 3.5 * sigma

    # z is frozen unless do_z_deformation.  Volumes are (H, W, D) — depth
    # LAST (nibabel layout; RandomCropPatch crops axes 0/1 scaled, axis 2
    # unscaled), and the reference's params[0:len//3]=0 zeroes ITK dim 0 =
    # the numpy LAST axis, so the D field is the zeroed one.
    fh, fw, fd = T.RandomElasticDeformation(prob=1.0, sigma=sigma)._dense_field(
        np.random.default_rng(1), (16, 16, 5)
    )
    assert np.all(fd == 0) and fh.any() and fw.any()
    fh, fw, fd = T.RandomElasticDeformation(
        prob=1.0, sigma=sigma, do_z_deformation=True
    )._dense_field(np.random.default_rng(1), (16, 16, 5))
    assert fd.any()


def test_elastic_deformation_mixed_shapes_consistent():
    """LR and HR in one tuple keep their OWN shapes and receive the SAME
    relative deformation (displacements scale with the grid).  The
    reference's SimpleITK path preserves shapes too, but its transform
    support covers only imgs[0]'s physical extent, leaving most of the HR
    image undeformed and misaligned from its LR — geometric consistency is
    the semantically required behavior for SR pairs."""
    rng = np.random.default_rng(7)
    lr = np.random.default_rng(1).uniform(0, 1, (16, 16, 1)).astype(np.float32)
    hr = np.kron(lr[..., 0], np.ones((4, 4)))[..., None].astype(np.float32)
    out_lr, out_hr = T.RandomElasticDeformation(prob=1.0, sigma=2)(lr, hr, rng=rng)
    assert out_lr.shape == lr.shape and out_hr.shape == hr.shape
    assert not np.allclose(out_hr, hr)
    # consistency: the deformed HR, block-averaged to LR scale, tracks the
    # deformed LR far better than the undeformed LR does
    hr_down = out_hr[..., 0].reshape(16, 4, 16, 4).mean(axis=(1, 3))
    err_deformed = np.abs(hr_down - out_lr[..., 0]).mean()
    err_undeformed = np.abs(hr_down - lr[..., 0]).mean()
    assert err_deformed < 0.5 * err_undeformed, (err_deformed, err_undeformed)


def test_compose_from_config():
    tf = T.compose(NORM)
    img = np.full((4, 4, 1), 54.089, np.float32)
    out = tf(img)
    assert out.dtype == np.float32
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


# ------------------------------------------------------------------ datasets
def test_sisr_dataset(tree):
    ds = DATASETS.get("AcdcSISRDataset")(
        data_dir=tree["imgs_dir"], type="train", downscale_factor=4, transforms=NORM
    )
    assert len(ds) == 2 * 2 * FRAMES  # patients × slices × frames
    item = ds[0]
    assert item["lr_img"].shape == (12, 12, 1)
    assert item["hr_img"].shape == (48, 48, 1)


def test_misr_dataset_window(tree):
    ds = DATASETS.get("AcdcMISRDataset")(
        data_dir=tree["videos_dir"],
        type="train",
        downscale_factor=4,
        transforms=NORM,
        num_frames=5,
        temporal_order="middle",
    )
    item = ds[0]  # t=0 → circular wrap at the front
    assert item["lr_imgs"].shape == (5, 12, 12, 1)
    assert item["hr_img"].shape == (48, 48, 1)


def test_vsr_dataset_train_and_valid(tree):
    cls = DATASETS.get("AcdcVSRDataset")
    ds = cls(data_dir=tree["videos_dir"], type="train", downscale_factor=4, transforms=NORM, num_frames=5)
    item = ds[3]
    assert item["lr_imgs"].shape == (5, 12, 12, 1)
    assert item["hr_imgs"].shape == (5, 48, 48, 1)
    ds_valid = cls(data_dir=tree["videos_dir"], type="valid", downscale_factor=4, transforms=NORM)
    item = ds_valid[0]
    assert item["lr_imgs"].shape == (FRAMES, 12, 12, 1)
    assert item["hr_imgs"].shape == (FRAMES, 48, 48, 1)


def test_vsr_refinenet_dataset_train_shapes(tree):
    ds = DATASETS.get("AcdcVSRRefineNetDataset")(
        data_dir=tree["videos_dir"],
        type="train",
        downscale_factor=4,
        transforms=NORM,
        pos_code_path=str(tree["pos_code_path"]),
        num_frames=7,
        num_updated_frames=6,
    )
    item = ds[0]
    assert item["lr_imgs"].shape == (7 + 12, 12, 12, 1)
    assert item["hr_imgs"].shape == (7, 48, 48, 1)
    assert item["pos_code"].shape == (19, 1)


def test_vsr_refinenet_dataset_test_margins(tree):
    ds = DATASETS.get("AcdcVSRRefineNetDataset")(
        data_dir=tree["videos_dir"],
        type="test",
        downscale_factor=4,
        transforms=NORM,
        pos_code_path=str(tree["pos_code_path"]),
        num_frames=7,
        num_updated_frames=6,
    )
    item = ds[0]
    assert item["lr_imgs"].shape == (FRAMES + 12, 12, 12, 1)
    assert item["hr_imgs"].shape == (FRAMES, 48, 48, 1)
    assert item["pos_code"].shape == (FRAMES + 12, 1)
    # warm-up margins wrap circularly: frame at position 0 equals frame T-U of the cycle
    lr = item["lr_imgs"]
    np.testing.assert_allclose(lr[0], lr[FRAMES])


def test_dsb15_refinenet_dataset_exists(tree):
    # the reference names this class in configs but never defines it (quirk 5)
    ds = DATASETS.get("Dsb15VSRRefineNetDataset")(
        data_dir=tree["videos_dir"],
        type="test",
        downscale_factor=4,
        transforms=NORM,
        pos_code_path=str(tree["pos_code_path"]),
        num_frames=7,
        num_updated_frames=6,
    )
    assert len(ds) > 0


def test_pos_code_not_normalized(tree):
    ds = DATASETS.get("AcdcVSRRefineNetDataset")(
        data_dir=tree["videos_dir"],
        type="test",
        downscale_factor=4,
        transforms=NORM,
        pos_code_path=str(tree["pos_code_path"]),
        num_frames=7,
        num_updated_frames=6,
    )
    item = ds[0]
    assert np.abs(item["pos_code"]).max() <= 1.0 + 1e-6  # raw cosine, not normalized


# ------------------------------------------------------------------- loader
def test_loader_batches_and_determinism(tree):
    ds = DATASETS.get("AcdcVSRRefineNetDataset")(
        data_dir=tree["videos_dir"],
        type="train",
        downscale_factor=4,
        transforms=NORM,
        augments=[
            {"name": "RandomHorizontalFlip"},
            {"name": "RandomVerticalFlip"},
            {"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 4}},
        ],
        pos_code_path=str(tree["pos_code_path"]),
        num_frames=7,
        num_updated_frames=6,
    )
    loader = Dataloader(ds, batch_size=4, shuffle=True, num_workers=2, drop_last=True)
    loader.set_epoch(123)
    batches1 = [b["lr_imgs"].copy() for b in loader]
    assert batches1[0].shape == (4, 19, 8, 8, 1)
    loader.set_epoch(123)
    batches2 = [b["lr_imgs"].copy() for b in loader]
    for a, b in zip(batches1, batches2):
        np.testing.assert_array_equal(a, b)
    loader.set_epoch(124)
    batches3 = [b["lr_imgs"].copy() for b in loader]
    assert any(not np.array_equal(a, b) for a, b in zip(batches1, batches3))


def test_loader_len_and_sequential(tree):
    ds = DATASETS.get("AcdcSISRDataset")(
        data_dir=tree["imgs_dir"], type="valid", downscale_factor=4, transforms=NORM
    )
    loader = Dataloader(ds, batch_size=1, shuffle=False, num_workers=0)
    assert len(loader) == len(ds)
    batch = next(iter(loader))
    assert batch["lr_img"].shape == (1, 12, 12, 1)
    assert batch["index"][0] == 0


def test_misr_window_wraps_at_sequence_end(tree):
    ds = DATASETS.get("AcdcMISRDataset")(
        data_dir=tree["videos_dir"],
        type="train",
        downscale_factor=4,
        transforms=NORM,
        num_frames=5,
        temporal_order="middle",
    )
    # last frame of the first sequence: window wraps to the front
    item = ds[FRAMES - 1]
    assert item["lr_imgs"].shape == (5, 12, 12, 1)
    # wrap correctness: t=T-1 middle window is [T-3, T-2, T-1, 0, 1]
    direct = ds[0]["lr_imgs"]  # t=0 window is [T-2, T-1, 0, 1, 2]
    np.testing.assert_allclose(item["lr_imgs"][3], direct[2])  # frame 0 in both
    # front wrap: t=1 middle window is [T-1, 0, 1, 2, 3]
    first = ds[1]["lr_imgs"]
    np.testing.assert_allclose(first[0], direct[1])  # frame T-1 in both
    np.testing.assert_allclose(first[1], direct[2])  # frame 0 in both


def test_vsr_temporal_order_last(tree):
    ds = DATASETS.get("AcdcVSRDataset")(
        data_dir=tree["videos_dir"],
        type="train",
        downscale_factor=4,
        transforms=NORM,
        num_frames=3,
        temporal_order="last",
    )
    # t=2 window (last order) = frames [0, 1, 2], in THAT order — check the
    # actual frames against the whole-sequence item, not just the shape
    item = ds[2]
    assert item["lr_imgs"].shape == (3, 12, 12, 1)
    whole = DATASETS.get("AcdcVSRDataset")(
        data_dir=tree["videos_dir"], type="train", downscale_factor=4,
        transforms=NORM, num_frames=FRAMES, temporal_order="last",
    )[FRAMES - 1]["lr_imgs"]  # t=T-1 'last' window = the full sequence 0..T-1
    np.testing.assert_allclose(item["lr_imgs"], whole[:3])


def test_volume_cache_thread_safety(tree):
    """Hammer the shared cache from many threads (regression for the
    unlocked OrderedDict)."""
    from concurrent.futures import ThreadPoolExecutor

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.datasets import (
        _VolumeCache,
    )

    cache = _VolumeCache(capacity=3)
    paths = sorted((tree["videos_dir"] / "train").rglob("*.nii.gz"))
    assert len(paths) >= 4

    def worker(i):
        for j in range(50):
            cache.get(paths[(i + j) % len(paths)])
        return True

    with ThreadPoolExecutor(max_workers=8) as pool:
        assert all(pool.map(worker, range(8)))


def test_window_matches_reference_slicing_semantics():
    """_window replicates the reference's exact branch semantics
    (acdc_misr_dataset.py:59-68), including the degenerate T < num_frames
    case: with start<0 the reference takes vol[:end] with NO modulo (numpy
    clamps end>T to T), so the window is start-wrap + whole sequence — not a
    doubly-wrapped shorter one."""
    import numpy as np

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.datasets import (
        _window,
    )

    def expected_indices(start, end, T):
        """Independent index-level spec of the reference's concatenate
        slicing (acdc_misr_dataset.py:59-68), derived from numpy slice
        semantics — NOT a copy of its array code: start<0 wraps start from
        the end and CLAMPS end to T (vol[:end] with end>T is the whole
        volume); only the nonnegative-start overrun branch reduces end
        mod T."""
        if start < 0:
            # numpy clamps both ends: vol[start:] with |start| > T is the
            # whole volume, vol[:end] with end > T likewise
            return list(range(max(0, T + start), T)) + list(range(min(end, T)))
        if end > T:
            return list(range(start, T)) + list(range(end % T))
        return list(range(start, end))

    def reference(start, end, vol):
        return vol[..., expected_indices(start, end, vol.shape[-1])]

    vol = np.arange(2 * 3 * 7).reshape(2, 3, 7)
    for T in (3, 5, 7):
        v = vol[..., :T]
        for n in (3, 5):
            for t in range(T):
                for start, end in [(t - n + 1, t + 1),
                                   (t - (n - 1) // 2, t + ((n - 1) - (n - 1) // 2) + 1)]:
                    np.testing.assert_array_equal(
                        _window(start, end, v), reference(start, end, v),
                        err_msg=f"T={T} n={n} t={t} [{start},{end})",
                    )


def test_random_crop_same_window_all_images():
    """RandomCrop (reference transforms.py:171-227): one random window
    applied identically to every input; errors on dim mismatch."""
    rng = np.random.default_rng(3)
    a = rng.standard_normal((16, 12, 1)).astype(np.float32)
    b = rng.standard_normal((16, 12, 1)).astype(np.float32)
    out_a, out_b = T.RandomCrop(size=[8, 6])(a, b, rng=np.random.default_rng(9))
    assert out_a.shape == out_b.shape == (8, 6, 1)
    # the same window: wherever out_a came from in a, out_b matches b there
    found = False
    for i in range(16 - 8 + 1):
        for j in range(12 - 6 + 1):
            if np.array_equal(a[i:i + 8, j:j + 6], out_a):
                np.testing.assert_array_equal(b[i:i + 8, j:j + 6], out_b)
                found = True
    assert found

    with pytest.raises(ValueError, match="dimensions of the cropped size"):
        T.RandomCrop(size=[8])(a, rng=np.random.default_rng(0))
