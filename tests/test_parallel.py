"""Data-parallel SPMD tests on the fake 8-device CPU mesh (SURVEY.md §4c)."""
import os
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
    RefineNet,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel import (
    DATA_AXIS,
    batch_sharding,
    make_mesh,
    replicate_tree,
    shard_batch,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")

CFG = dict(
    in_channels=1,
    out_channels=1,
    num_features=[4, 4],
    num_stages=1,
    upscale_factor=4,
    update_memory=True,
    num_updated_frames=2,
    refine_window_size=5,
    positional_encoding=True,
)
B, T, H, W = 8, 7, 8, 8  # T = 3 core + 2x2 warm-up


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "lr_imgs": rng.standard_normal((B, T, H, W, 1)).astype(np.float32),
        "pos_code": rng.uniform(-1, 1, (B, T, 1)).astype(np.float32),
        "hr_imgs": rng.standard_normal((B, 3, H * 4, W * 4, 1)).astype(np.float32),
    }


def test_mesh_creation():
    mesh = make_mesh(8)
    assert mesh.shape[DATA_AXIS] == 8
    mesh2 = make_mesh(8, model_parallel=2)
    assert mesh2.shape == {"data": 4, "model": 2}


def test_shard_batch_places_on_all_devices():
    mesh = make_mesh(8)
    batch = shard_batch(mesh, _batch())
    assert len(batch["lr_imgs"].devices()) == 8
    assert batch["lr_imgs"].sharding.spec == P(DATA_AXIS)


def _loss_fn(model):
    def loss(params, batch):
        outs = model.apply({"params": params}, batch["lr_imgs"], batch["pos_code"])
        return sum(jnp.mean(jnp.abs(o - batch["hr_imgs"])) for o in outs)

    return loss


def test_data_parallel_train_step_matches_single_device():
    """One jitted step over the 8-device mesh == the same step on one device
    (GSPMD inserts the psum; numerics must agree)."""
    model = RefineNet(**CFG)
    batch = _batch()
    params = model.init(jax.random.PRNGKey(0), batch["lr_imgs"], batch["pos_code"])["params"]
    tx = optax.adam(1e-3)
    loss = _loss_fn(model)

    def step(p, s, b):
        val, grads = jax.value_and_grad(loss)(p, b)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, val

    # single device
    p1, s1, v1 = jax.jit(step)(params, tx.init(params), jax.tree.map(jnp.asarray, batch))

    # 8-device mesh
    mesh = make_mesh(8)
    p_sharded = replicate_tree(mesh, params)
    s_sharded = replicate_tree(mesh, tx.init(params))
    b_sharded = shard_batch(mesh, batch)
    p8, s8, v8 = jax.jit(step)(p_sharded, s_sharded, b_sharded)

    assert float(v8) == pytest.approx(float(v1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


def test_eval_sharded_by_sequence():
    """Full-volume multi-patient inference batched across the mesh
    (the BASELINE.json v5e-8 config, on fake devices)."""
    model = RefineNet(**CFG)
    batch = _batch(1)
    params = model.init(jax.random.PRNGKey(0), batch["lr_imgs"], batch["pos_code"])["params"]
    mesh = make_mesh(8)

    @jax.jit
    def forward(p, lr, pos):
        return model.apply({"params": p}, lr, pos)[-1]

    out1 = forward(params, batch["lr_imgs"], batch["pos_code"])
    sharded = shard_batch(mesh, batch)
    out8 = forward(replicate_tree(mesh, params), sharded["lr_imgs"], sharded["pos_code"])
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1), atol=1e-5)


def test_trainer_with_mesh_through_config(tmp_path):
    """The parallel: config section drives a sharded trainer end-to-end."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_acdc_tree

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import Cfg
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
        train_from_config,
    )

    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(32, 32))
    cfg = Cfg(
        {
            "main": {"random_seed": "vsr", "saved_dir": str(tmp_path / "train")},
            "parallel": {"num_devices": 8},
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
                        {"name": "RandomCropPatch", "kwargs": {"size": [8, 8], "ratio": 4}}
                    ],
                    "num_frames": 3,
                    "num_updated_frames": 2,
                },
            },
            "dataloader": {
                "name": "Dataloader",
                "kwargs": {"train_batch_size": 8, "valid_batch_size": 1,
                           "shuffle": True, "num_workers": 0, "drop_last": True},
            },
            "net": {
                "name": "RefineNet",
                "kwargs": {
                    "in_channels": 1, "out_channels": 1, "num_features": [4, 4],
                    "upscale_factor": 4, "num_stages": 1, "update_memory": True,
                    "num_updated_frames": 2, "refine_window_size": 5,
                    "positional_encoding": True,
                },
            },
            "losses": [{"name": "L1Loss", "weight": 1.0}],
            "metrics": [{"name": "PSNR"}],
            "optimizer": {"name": "Adam", "kwargs": {"lr": 0.001}},
            "logger": {"name": "AcdcVSRLogger", "kwargs": {"dummy_input": [8, 1, 8, 8]}},
            "monitor": {"name": "Monitor", "kwargs": {
                "mode": "min", "target": "Loss", "saved_freq": 1, "early_stop": 0}},
            "trainer": {"name": "AcdcVSRRefineNetTrainer",
                        "kwargs": {"device": "cpu", "num_epochs": 1}},
        }
    )
    trainer = train_from_config(cfg)
    assert trainer.mesh is not None and trainer.mesh.shape["data"] == 8
    # params ended replicated across all 8 devices
    leaf = jax.tree.leaves(trainer.params)[0]
    assert len(leaf.devices()) == 8


@pytest.mark.slow
def test_two_process_distributed_cpu_matches_single_process(tmp_path):
    """Multi-host plan (SURVEY §2.8): two coordinated processes with 4 virtual
    CPU devices each run the same global 8-device data-parallel train step as
    one process owning all 8 devices — losses must agree (tests/_two_process_worker.py)."""
    import re
    import socket
    import subprocess
    import sys

    worker = str(Path(__file__).parent / "_two_process_worker.py")

    def run(args, timeout=240):
        return subprocess.run(
            [sys.executable, worker, *args],
            capture_output=True, text=True, timeout=timeout,
            env={k: v for k, v in os.environ.items() if not k.startswith("XLA_FLAGS")},
        )

    def losses(proc):
        m = re.search(r"LOSS ([\d.]+) ([\d.]+)", proc.stdout)
        assert m, f"no LOSS line:\nstdout={proc.stdout[-500:]}\nstderr={proc.stderr[-1500:]}"
        return float(m[1]), float(m[2])

    single = run(["--single"])
    assert single.returncode == 0, single.stderr[-1500:]
    want = losses(single)

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [
        subprocess.Popen(
            [sys.executable, worker, "--pid", str(i), "--port", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=240) for p in procs]
    if any(p.returncode for p in procs):
        stderr = "\n".join(e for _, e in outs)
        # only a runtime that forbids multi-process coordination is a valid
        # skip; anything else is a real failure
        forbidden = "must be called before any JAX calls" in stderr or (
            "UNAVAILABLE" in stderr and "coordination" in stderr.lower()
        )
        assert forbidden, f"two-process run failed:\n{stderr[-2000:]}"
        pytest.skip(f"runtime forbids jax.distributed on CPU: {stderr[-300:]}")
    for i, (out, err) in enumerate(outs):
        m = re.search(r"LOSS ([\d.]+) ([\d.]+)", out)
        assert m, f"pid {i}: no LOSS line\n{err[-1500:]}"
        got = (float(m[1]), float(m[2]))
        np.testing.assert_allclose(got, want, rtol=2e-6)
