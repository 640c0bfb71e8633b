"""The headless serving CLI (``tools/serve.py``): raw LR NIfTI in → SR NIfTI
out, with generated phase codes, circular warm-up margins, idempotent
restart-safe writes, and the shape-bounding knobs.

The contract under test: serving a volume equals running the net by hand on
the dataset-style input construction (one cycle + U wrapped margin frames,
normalize → forward → final stage → denorm), and a second invocation writes
nothing (done outputs are skipped).
"""
import pickle

import numpy as np
import pytest
import yaml

import jax

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
    RefineNet,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
    checkpoint as ckpt_io,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.tools import (
    serve,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
    nifti,
)

NET_KW = dict(
    in_channels=1, out_channels=1, num_features=[6, 6], upscale_factor=2,
    num_stages=2, update_memory=True, num_updated_frames=2,
    refine_window_size=5, positional_encoding=True,
)
MEAN, STD = 54.089, 48.084


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    root = tmp_path_factory.mktemp("serve")
    in_dir, out_dir = root / "lr", root / "sr"
    rng = np.random.default_rng(0)
    vols = {
        "patient001_2d+1d_sequence.nii.gz": rng.uniform(
            0, 255, (12, 12, 1, 8)).astype(np.float32),
        "deep/patient002_2d+1d_sequence.nii.gz": rng.uniform(
            0, 255, (16, 16, 2, 6)).astype(np.float32),
    }
    for rel, vol in vols.items():
        nifti.save(vol, in_dir / rel)

    net = RefineNet(**NET_KW)
    t = 8 + 2 * NET_KW["num_updated_frames"]
    params = net.init(
        jax.random.PRNGKey(0),
        np.zeros((1, t, 12, 12, 1), np.float32),
        np.zeros((1, t, 1), np.float32),
    )["params"]
    ckpt = root / "model_best.pth"
    ckpt_io.save_checkpoint(ckpt, params=params)

    cfg = root / "net.yaml"
    cfg.write_text(yaml.safe_dump({
        "net": {"name": "RefineNet", "kwargs": NET_KW},
        "main": {"loaded_path": str(ckpt)},
    }))
    argv = [str(cfg), "--in", str(in_dir), "--out", str(out_dir),
            "--device", "cpu"]
    count = serve.main(argv)
    return {"root": root, "in": in_dir, "out": out_dir, "vols": vols,
            "params": params, "net": net, "argv": argv, "count": count}


def test_serves_every_volume_in_source_layout(served):
    assert served["count"] == 2
    for rel, vol in served["vols"].items():
        out = nifti.load(served["out"] / rel).data
        H, W, S, T = vol.shape
        assert out.shape == (H * 2, W * 2, S, T)
        assert out.dtype == np.float32
        assert 0 <= out.min() and out.max() <= 255
        assert np.all(out == np.round(out))  # denorm_uint8 convention


def test_served_equals_manual_forward(served):
    """patient001: serve == normalize → wrap U margins → net → final stage
    → denorm, built by hand (the dataset-eval input construction)."""
    vol = served["vols"]["patient001_2d+1d_sequence.nii.gz"]
    raw = vol[:, :, 0:1, :]
    frames = np.transpose(raw, (3, 0, 1, 2))  # (T, H, W, 1)
    core = (frames - MEAN) / STD
    U = NET_KW["num_updated_frames"]
    lr = np.concatenate([core[-U:], core, core[:U]], axis=0)[None]
    code = serve.generate_phase_code(raw)
    pos = np.concatenate([code[-U:], code, code[:U]])[None, :, None]
    out = served["net"].apply(
        {"params": served["params"]}, lr, pos.astype(np.float32))[-1]
    want = np.clip(np.round(np.asarray(out) * STD + MEAN), 0, 255)[0]
    got = nifti.load(served["out"] / "patient001_2d+1d_sequence.nii.gz").data
    np.testing.assert_allclose(
        np.transpose(got[:, :, 0, :], (2, 0, 1))[..., None], want, atol=1e-3
    )


def test_second_run_is_idempotent(served):
    before = sorted(p for p in served["out"].rglob("*") if p.is_file())
    mtimes = [p.stat().st_mtime_ns for p in before]
    assert serve.main(served["argv"]) == 0  # nothing left to serve
    after = sorted(p for p in served["out"].rglob("*") if p.is_file())
    assert after == before
    assert [p.stat().st_mtime_ns for p in after] == mtimes


def test_pos_code_pickle_is_used(served):
    """An explicit --pos-code pickle overrides generation: a shifted code
    changes the phase-aware net's output."""
    root = served["root"]
    code = serve.generate_phase_code(
        served["vols"]["patient001_2d+1d_sequence.nii.gz"][:, :, 0:1, :]
    )
    pkl = root / "position_code.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"patient001": np.roll(code, 3), "patient002": code[:6]}, f)
    out2 = root / "sr_pos"
    argv = list(served["argv"])
    argv[argv.index("--out") + 1] = str(out2)
    assert serve.main(argv + ["--pos-code", str(pkl)]) == 2
    a = nifti.load(served["out"] / "patient001_2d+1d_sequence.nii.gz").data
    b = nifti.load(out2 / "patient001_2d+1d_sequence.nii.gz").data
    assert not np.array_equal(a, b)


def test_t_bucket_and_tile_knobs_run(served):
    """Shape-bounding knobs: outputs keep the true (H*r, W*r, S, T) layout;
    tiled serving reuses ONE net executable across the heterogeneous frame
    sizes (the contract the knob exists for)."""
    root = served["root"]
    out3 = root / "sr_knobs"
    argv = list(served["argv"])
    argv[argv.index("--out") + 1] = str(out3)
    assert serve.main(argv + ["--t-bucket", "4", "--tile", "8",
                              "--tile-overlap", "2"]) == 2
    for rel, vol in served["vols"].items():
        H, W, S, T = vol.shape
        assert nifti.load(out3 / rel).data.shape == (H * 2, W * 2, S, T)


def test_bad_volume_does_not_kill_the_daemon(served, tmp_path):
    in_dir, out_dir = tmp_path / "lr", tmp_path / "sr"
    in_dir.mkdir()
    (in_dir / "broken.nii.gz").write_bytes(b"not a nifti")
    good = served["vols"]["patient001_2d+1d_sequence.nii.gz"]
    nifti.save(good, in_dir / "patient003_2d+1d_sequence.nii.gz")
    argv = list(served["argv"])
    argv[argv.index("--in") + 1] = str(in_dir)
    argv[argv.index("--out") + 1] = str(out_dir)
    assert serve.main(argv) == 1  # the good one
    assert (out_dir / "patient003_2d+1d_sequence.nii.gz").exists()
    assert not (out_dir / "broken.nii.gz").exists()


def test_out_dtype_uint8_is_exact(served):
    """--out-dtype uint8 writes identical VALUES 4x smaller (denorm outputs
    are exact [0,255] integers)."""
    root = served["root"]
    out4 = root / "sr_u8"
    argv = list(served["argv"])
    argv[argv.index("--out") + 1] = str(out4)
    assert serve.main(argv + ["--out-dtype", "uint8"]) == 2
    rel = "patient001_2d+1d_sequence.nii.gz"
    a = nifti.load(served["out"] / rel).data
    b = nifti.load(out4 / rel).data
    assert b.dtype == np.uint8
    np.testing.assert_array_equal(a, b.astype(np.float32))
    assert (out4 / rel).stat().st_size < (served["out"] / rel).stat().st_size


def test_frame_workload_edsr(served):
    """SISR nets serve per-frame: served output == batched EDSR forward."""
    root = served["root"]
    kw = dict(in_channels=1, out_channels=1, num_resblocks=2,
              num_features=6, upscale_factor=2)
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        EDSRNet,
    )
    net = EDSRNet(**kw)
    params = net.init(jax.random.PRNGKey(1),
                      np.zeros((1, 12, 12, 1), np.float32))["params"]
    ckpt = root / "edsr.pth"
    ckpt_io.save_checkpoint(ckpt, params=params)
    cfg = root / "edsr.yaml"
    cfg.write_text(yaml.safe_dump({
        "net": {"name": "EDSRNet", "kwargs": kw},
        "main": {"loaded_path": str(ckpt)},
    }))
    out = root / "sr_edsr"
    assert serve.main([str(cfg), "--in", str(served["in"]), "--out", str(out),
                       "--device", "cpu"]) == 2
    vol = served["vols"]["patient001_2d+1d_sequence.nii.gz"]
    frames = np.transpose(vol[:, :, 0:1, :], (3, 0, 1, 2))
    want = net.apply({"params": params}, (frames - MEAN) / STD)
    want = np.clip(np.round(np.asarray(want) * STD + MEAN), 0, 255)
    got = nifti.load(out / "patient001_2d+1d_sequence.nii.gz").data
    np.testing.assert_allclose(
        np.transpose(got[:, :, 0, :], (2, 0, 1))[..., None], want, atol=1e-3
    )


def test_window_workload_duf(served):
    """MISR nets serve per-center-frame circular windows: served output ==
    the net applied to each dataset-convention window (train=False with the
    checkpointed batch_stats)."""
    root = served["root"]
    kw = dict(in_channels=1, out_channels=1, num_frames=7, size_filter=5,
              upscale_factor=2, backbone="_DenseLayer16")
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        DUFNet,
    )
    net = DUFNet(**kw)
    variables = net.init(jax.random.PRNGKey(2),
                         np.zeros((1, 7, 12, 12, 1), np.float32), train=False)
    ckpt = root / "duf.pth"
    ckpt_io.save_checkpoint(
        ckpt, params=variables["params"],
        model_state={"batch_stats": variables["batch_stats"]},
    )
    cfg = root / "duf.yaml"
    cfg.write_text(yaml.safe_dump({
        "net": {"name": "DUFNet", "kwargs": kw},
        "main": {"loaded_path": str(ckpt)},
    }))
    out = root / "sr_duf"
    assert serve.main([str(cfg), "--in", str(served["in"]), "--out", str(out),
                       "--device", "cpu"]) == 2
    vol = served["vols"]["patient001_2d+1d_sequence.nii.gz"]
    T = vol.shape[-1]
    frames = (np.transpose(vol[:, :, 0:1, :], (3, 0, 1, 2)) - MEAN) / STD
    # dataset-convention circular 'middle' windows (num_frames 7)
    wins = np.stack([frames[(np.arange(t - 3, t + 4)) % T] for t in range(T)])
    want = net.apply(variables, wins, train=False)
    want = np.clip(np.round(np.asarray(want) * STD + MEAN), 0, 255)
    got = nifti.load(out / "patient001_2d+1d_sequence.nii.gz").data
    np.testing.assert_allclose(
        np.transpose(got[:, :, 0, :], (2, 0, 1))[..., None], want, atol=1e-3
    )


def test_clip_shorter_than_margins_serves_full_length(served):
    """A cycle SHORTER than num_updated_frames must still serve T frames:
    the front warm-up margin wraps modularly (a plain core[T-U:] silently
    under-filled it and truncated the output)."""
    root = served["root"]
    in5, out5 = root / "lr_short", root / "sr_short"
    vol = np.random.default_rng(3).uniform(0, 255, (12, 12, 1, 5)).astype(np.float32)
    nifti.save(vol, in5 / "patient009_2d+1d_sequence.nii.gz")
    argv = list(served["argv"])
    argv[argv.index("--in") + 1] = str(in5)
    argv[argv.index("--out") + 1] = str(out5)
    # U=2 < 5 here; also exercise U > T via a 1-frame clip
    nifti.save(vol[..., :1], in5 / "patient010_2d+1d_sequence.nii.gz")
    assert serve.main(argv) == 2
    assert nifti.load(out5 / "patient009_2d+1d_sequence.nii.gz").data.shape == (24, 24, 1, 5)
    assert nifti.load(out5 / "patient010_2d+1d_sequence.nii.gz").data.shape == (24, 24, 1, 1)
