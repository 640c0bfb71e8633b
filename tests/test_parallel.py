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
    MODEL_AXIS,
    SPATIAL_AXIS,
    gather_for_compute,
    make_mesh,
    partition_tree,
    replicate_tree,
    shard_batch,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 fake devices")


def _worker_env():
    """Env for the multi-process worker subprocesses: strip conftest's
    XLA_FLAGS (the workers set their own jax_num_cpu_devices) AND its
    persistent-compile-cache vars — with the shared cache, coordinated
    processes get asymmetric cache hits, so one executes (and registers its
    Gloo sub-communicators) while a peer is still compiling, and the
    30 s GetKeyValue rendezvous deadline expires (measured: the 4-process
    run fails with "Gloo context initialization failed: DEADLINE_EXCEEDED"
    with the cache, passes in <90 s without it)."""
    drop = ("XLA_FLAGS", "JAX_COMPILATION_CACHE_DIR", "JAX_PERSISTENT_CACHE")
    return {k: v for k, v in os.environ.items() if not k.startswith(drop)}


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
    spec = batch["lr_imgs"].sharding.spec
    assert spec[0] == DATA_AXIS and all(s is None for s in spec[1:])


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


def test_data_parallel_bn_stats_match_single_device():
    """TorchBatchNorm under GSPMD data parallelism reduces over the GLOBAL
    batch (jit-level sharding): train-mode loss, gradients, and the updated
    running stats on the 8-device mesh must equal the single-device step —
    torch single-process full-batch semantics, NOT DDP-style per-replica
    stats.  Exercises DUF's BN through a real value_and_grad step."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        DUFNet,
    )

    model = DUFNet(
        1, 1, num_frames=7, size_filter=5, upscale_factor=4,
        backbone="_DenseLayer16",
    )
    rng = np.random.default_rng(3)
    lr = rng.standard_normal((B, 7, H, W, 1)).astype(np.float32)
    hr = rng.standard_normal((B, H * 4, W * 4, 1)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(lr), train=False)
    params, stats = variables["params"], variables["batch_stats"]

    def loss_fn(p, s, x, y):
        out, mut = model.apply(
            {"params": p, "batch_stats": s}, x, train=True, mutable=["batch_stats"]
        )
        return jnp.mean((out - y) ** 2), mut["batch_stats"]

    step = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))

    (v1, st1), g1 = step(params, stats, jnp.asarray(lr), jnp.asarray(hr))

    mesh = make_mesh(8)
    p8 = replicate_tree(mesh, params)
    s8 = replicate_tree(mesh, stats)
    b8 = shard_batch(mesh, {"lr_imgs": lr, "hr_img": hr})
    (v8, st8), g8 = step(p8, s8, b8["lr_imgs"], b8["hr_img"])

    assert float(v8) == pytest.approx(float(v1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(st1), jax.tree.leaves(st8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    # grads: psum-vs-single-device f32 reduction order leaves a few
    # near-zero elements ~1e-5 apart (5/25600 measured); stats match at 1e-5
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-4)


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


def test_mesh_multi_axis_shapes():
    assert make_mesh(8, spatial_parallel=4).shape == {"data": 2, "spatial": 4}
    assert make_mesh(8, model_parallel=2).shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(8, model_parallel=3)
    # sp x tp combined is rejected: XLA miscompiles partially-replicated
    # spatially-sharded convs (parallel/mesh.py docstring)
    with pytest.raises(ValueError, match="cannot be combined"):
        make_mesh(8, model_parallel=2, spatial_parallel=2)


def test_spatial_sharded_forward_matches_replicated():
    """Height-axis (spatial) sharding: GSPMD's automatic halo exchange keeps
    the conv/scan/pixel-shuffle forward bit-compatible with one device."""
    model = RefineNet(**CFG)
    batch = _batch(2)
    params = model.init(jax.random.PRNGKey(0), batch["lr_imgs"], batch["pos_code"])["params"]

    @jax.jit
    def forward(p, lr, pos):
        return model.apply({"params": p}, lr, pos)[-1]

    out1 = forward(params, batch["lr_imgs"], batch["pos_code"])
    mesh = make_mesh(8, spatial_parallel=4)
    sharded = shard_batch(mesh, batch)
    assert sharded["lr_imgs"].sharding.spec == P(DATA_AXIS, None, SPATIAL_AXIS, None, None)
    assert SPATIAL_AXIS not in jax.tree.leaves(  # rank 3: no H axis to shard
        tuple(sharded["pos_code"].sharding.spec)
    )
    out8 = forward(replicate_tree(mesh, params), sharded["lr_imgs"], sharded["pos_code"])
    np.testing.assert_allclose(np.asarray(out8), np.asarray(out1), atol=1e-5)


@pytest.mark.parametrize(
    "mesh_kwargs",
    [dict(spatial_parallel=2), dict(model_parallel=2)],
    ids=["dp_sp", "dp_tp"],
)
def test_multi_axis_train_step_matches_single_device(mesh_kwargs):
    """Full train step over each supported 2-axis mesh: batch over ``data``
    plus either image height over ``spatial`` (GSPMD halo exchange) or conv
    kernels STORED sharded on out-features over ``model`` and gathered at
    compute (ZeRO-3) — numerics must match one device."""
    model = RefineNet(**CFG)
    batch = _batch(3)
    params = model.init(jax.random.PRNGKey(0), batch["lr_imgs"], batch["pos_code"])["params"]
    # SGD, not Adam: the update stays linear in the gradient, so cross-device
    # reduction-order noise (~1e-8) is not amplified by g/(sqrt(g^2)+eps)
    tx = optax.sgd(1e-2)
    mesh = make_mesh(8, **mesh_kwargs)

    def loss(p, b, m):
        p = gather_for_compute(m, p)
        outs = model.apply({"params": p}, b["lr_imgs"], b["pos_code"])
        return sum(jnp.mean(jnp.abs(o - b["hr_imgs"])) for o in outs)

    def make_step(m):
        def step(p, s, b):
            val, grads = jax.value_and_grad(loss)(p, b, m)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, val

        return step

    p1, _, v1 = jax.jit(make_step(None))(
        params, tx.init(params), jax.tree.map(jnp.asarray, batch)
    )

    p_sh = partition_tree(mesh, params)
    if "model_parallel" in mesh_kwargs:
        kernel_specs = [
            l.sharding.spec for l in jax.tree.leaves(p_sh) if getattr(l, "ndim", 0) >= 2
        ]
        # kernels with mp-divisible out-features shard; odd widths (the PE
        # window conv's 9-channel output) legitimately replicate
        assert sum(len(s) > 0 and s[-1] == MODEL_AXIS for s in kernel_specs) >= 4
    s_sh = partition_tree(mesh, tx.init(params))
    b_sh = shard_batch(mesh, batch)
    if "spatial_parallel" in mesh_kwargs:
        assert b_sh["lr_imgs"].sharding.spec[2] == SPATIAL_AXIS
    p8, _, v8 = jax.jit(make_step(mesh))(p_sh, s_sh, b_sh)
    if "model_parallel" in mesh_kwargs:
        # updated params keep their at-rest model-axis sharding
        sharded_after = [
            l.sharding.spec
            for l in jax.tree.leaves(p8)
            if getattr(l, "ndim", 0) >= 2 and l.shape[-1] % 2 == 0
        ]
        assert all(len(s) > 0 and s[-1] == MODEL_AXIS for s in sharded_after)

    assert float(v8) == pytest.approx(float(v1), rel=1e-5)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize(
    "parallel_section,trainer_extra",
    [
        ({"num_devices": 8}, {}),
        ({"num_devices": 8, "model_parallel": 2}, {}),
        # grad accumulation over a ZeRO-3 mesh: sharded gradients accumulate
        # in the scan carry (zeros_like preserves the param shardings)
        ({"num_devices": 8, "model_parallel": 2}, {"grad_accum_steps": 2}),
    ],
    ids=["dp", "dp_tp", "dp_tp_accum"],
)
def test_trainer_with_mesh_through_config(tmp_path, parallel_section, trainer_extra):
    """The parallel: config section drives a sharded trainer end-to-end —
    pure data parallel, and ZeRO-3 (model_parallel: conv kernels + optimizer
    state stored sharded on out-features, checkpoint round-trip included)."""
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
            "parallel": parallel_section,
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
                        "kwargs": {"device": "cpu", "num_epochs": 1,
                                   **trainer_extra}},
        }
    )
    trainer = train_from_config(cfg)
    assert trainer.mesh is not None
    if trainer_extra:
        assert trainer.grad_accum_steps == 2
    leaf = jax.tree.leaves(trainer.params)[0]
    assert len(leaf.devices()) == 8  # every device holds (a shard of) params
    if "model_parallel" in parallel_section:
        assert trainer.mesh.shape == {"data": 4, "model": 2}
        kernel_specs = [
            l.sharding.spec
            for l in jax.tree.leaves(trainer.params)
            if getattr(l, "ndim", 0) >= 2 and l.shape[-1] % 2 == 0
        ]
        assert kernel_specs and all(s[-1] == MODEL_AXIS for s in kernel_specs)
        # checkpoint round-trip: save gathers to host numpy, load re-partitions
        ckpt = tmp_path / "train" / "checkpoints" / "model_1.pth"
        before = [np.asarray(l) for l in jax.tree.leaves(trainer.params)]
        trainer.load(ckpt)
        for b, l in zip(before, jax.tree.leaves(trainer.params)):
            np.testing.assert_array_equal(b, np.asarray(l))
        assert all(
            s[-1] == MODEL_AXIS
            for s in (
                l.sharding.spec
                for l in jax.tree.leaves(trainer.params)
                if getattr(l, "ndim", 0) >= 2 and l.shape[-1] % 2 == 0
            )
        )
    else:
        assert trainer.mesh.shape["data"] == 8


def _worker_losses(out: str, err: str, who: str):
    import re

    m = re.search(r"LOSS ([\d.]+) ([\d.]+)", out)
    assert m, f"{who}: no LOSS line\nstdout={out[-500:]}\nstderr={err[-1500:]}"
    return float(m[1]), float(m[2])


def _run_single_worker(args):
    """Ground-truth run: one process owning all 8 virtual devices."""
    import subprocess
    import sys

    worker = str(Path(__file__).parent / "_two_process_worker.py")
    proc = subprocess.run(
        [sys.executable, worker, *args],
        capture_output=True, text=True, timeout=240, env=_worker_env(),
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    return proc


def _run_coordinated_workers(per_proc_args, n_procs: int, who: str):
    """Launch ``n_procs`` coordinated worker subprocesses on a fresh
    coordinator port and return their (stdout, stderr) pairs.  The ONE copy
    of the scaffolding all multi-process tests share: the bind/close/launch
    port probe is a TOCTOU race, retried once if another process steals the
    port in the gap; a runtime that forbids jax.distributed on CPU skips the
    test; any other failure asserts."""
    import socket
    import subprocess
    import sys

    worker = str(Path(__file__).parent / "_two_process_worker.py")
    env = _worker_env()

    def launch():
        s = socket.socket()
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
        s.close()
        procs = [
            subprocess.Popen(
                [sys.executable, worker, "--pid", str(i), "--port", str(port),
                 *per_proc_args],
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                env=env,
            )
            for i in range(n_procs)
        ]
        try:
            return procs, [p.communicate(timeout=240) for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                if p.poll() is None:
                    p.kill()
                    p.communicate(timeout=60)
            raise

    procs, outs = launch()
    stderr = "\n".join(e for _, e in outs)
    if any(p.returncode for p in procs) and (
        "address already in use" in stderr.lower() or "failed to bind" in stderr.lower()
    ):
        procs, outs = launch()  # port was stolen between probe and bind
        stderr = "\n".join(e for _, e in outs)
    if any(p.returncode for p in procs):
        # only a runtime that forbids multi-process coordination is a valid
        # skip; anything else is a real failure
        forbidden = "must be called before any JAX calls" in stderr or (
            "UNAVAILABLE" in stderr and "coordination" in stderr.lower()
        )
        assert forbidden, f"{who} run failed:\n{stderr[-2000:]}"
        pytest.skip(f"runtime forbids jax.distributed on CPU: {stderr[-300:]}")
    return outs


@pytest.mark.slow
def test_two_process_distributed_cpu_matches_single_process(tmp_path):
    """Multi-host plan (SURVEY §2.8): two coordinated processes with 4 virtual
    CPU devices each run the same global 8-device data-parallel train step as
    one process owning all 8 devices — losses must agree (tests/_two_process_worker.py)."""
    single = _run_single_worker(["--single"])
    want = _worker_losses(single.stdout, single.stderr, "single")

    ckpt_dir = tmp_path / "shared_ckpts"
    ckpt_dir.mkdir()
    outs = _run_coordinated_workers(["--ckpt-dir", str(ckpt_dir)], 2, "two-process")
    for i, (out, err) in enumerate(outs):
        got = _worker_losses(out, err, f"pid {i}")
        np.testing.assert_allclose(got, want, rtol=2e-6)
        # multihost checkpoint contract: ZeRO-3-sharded save over shared
        # storage (lead-only sidecar, coordinated orbax_async) reloaded and
        # verified by both processes
        assert "CKPT_OK" in out, f"pid {i}: no CKPT_OK\n{err[-1500:]}"


@pytest.mark.slow
def test_four_process_dp_sp_mesh_matches_single_process():
    """4 coordinated processes x 2 local CPU devices run a (data=4, spatial=2)
    mesh — the data axis SPANS processes while each process's two local
    devices hold the spatial columns, a layout the two-process pair cannot
    exercise — and the train-step losses must match one process owning all 8
    devices (tests/_two_process_worker.py --num-procs 4 --spatial 2)."""
    single = _run_single_worker(["--single", "--spatial", "2"])
    want = _worker_losses(single.stdout, single.stderr, "single")

    outs = _run_coordinated_workers(
        ["--num-procs", "4", "--spatial", "2"], 4, "four-process"
    )
    for i, (out, err) in enumerate(outs):
        np.testing.assert_allclose(_worker_losses(out, err, f"pid {i}"), want, rtol=2e-6)


@pytest.mark.slow
def test_two_process_trainer_epoch_matches_single_process(tmp_path):
    """The REAL trainer epoch engine — loader, shard_batch's device_put onto
    a process-spanning mesh, jitted donated step, device-side log
    accumulation — run by two coordinated processes must log the same losses
    as one process owning all 8 devices (_two_process_worker.py --trainer).
    --logdir additionally drives the multi-host TensorBoard path: the display
    outputs are NOT fully addressable per process, so _write_logs must gather
    collectively and write from the lead only."""
    single = _run_single_worker(["--single", "--trainer"])
    want = _worker_losses(single.stdout, single.stderr, "single")

    logdir = tmp_path / "tb"
    outs = _run_coordinated_workers(
        ["--trainer", "--logdir", str(logdir)], 2, "two-process trainer"
    )
    for i, (out, err) in enumerate(outs):
        np.testing.assert_allclose(_worker_losses(out, err, f"pid {i}"), want, rtol=2e-6)
        assert "TB_OK" in out, f"pid {i}: no TB_OK\n{err[-1500:]}"
    assert list(logdir.glob("events*")), "lead process wrote no TB events"


@pytest.mark.slow
def test_predictor_spatial_mesh_matches_meshless(tmp_path):
    """Config-driven prediction over a dp x sp mesh == the meshless run.

    Batch-1 serving saturates one chip (PERF_NOTES.md batch sweep), so
    single-patient latency scaling comes from sharding the frame height over
    ``spatial`` — GSPMD halos keep the metrics identical to one device."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_acdc_tree

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import Cfg
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
        test_from_config,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        checkpoint as ckpt_io,
    )

    tree = make_acdc_tree(tmp_path / "acdc", frames=8, hr_size=(32, 32))
    net_kwargs = dict(
        in_channels=1, out_channels=1, num_features=[4, 4], upscale_factor=4,
        num_stages=1, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    model = RefineNet(**net_kwargs)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 7, 8, 8, 1)),
        jnp.zeros((1, 7, 1)),
    )["params"]
    ckpt_path = tmp_path / "model.pth"
    ckpt_io.save_checkpoint(ckpt_path, params=params)

    def run(saved_dir, parallel):
        cfg = Cfg(
            {
                "main": {"saved_dir": str(saved_dir), "loaded_path": str(ckpt_path)},
                **({"parallel": parallel} if parallel else {}),
                "dataset": {
                    "name": "AcdcVSRRefineNetDataset",
                    "kwargs": {
                        "data_dir": str(tree["videos_dir"]),
                        "downscale_factor": 4,
                        "pos_code_path": str(tree["pos_code_path"]),
                        "transforms": [
                            {"name": "Normalize",
                             "kwargs": {"means": [54.089], "stds": [48.084]}},
                            {"name": "ToTensor"},
                        ],
                        "num_frames": 5,
                        "num_updated_frames": 2,
                    },
                },
                "dataloader": {
                    "name": "Dataloader",
                    "kwargs": {"batch_size": 1, "shuffle": False, "num_workers": 0},
                },
                "net": {"name": "RefineNet", "kwargs": net_kwargs},
                "losses": [{"name": "L1Loss", "weight": 1.0}],
                "metrics": [{"name": "PSNR"}, {"name": "SSIM"}],
                "predictor": {
                    "name": "AcdcVSRRefineNetPredictor",
                    "kwargs": {"device": "cpu", "saved_dir": str(saved_dir),
                               "exported": False},
                },
            }
        )
        return test_from_config(cfg)

    base = run(tmp_path / "meshless", None)
    sp = run(tmp_path / "spatial", {"num_devices": 8, "spatial_parallel": 4})
    assert sp.mesh is not None and sp.mesh.shape[SPATIAL_AXIS] == 4
    for key in ("PSNR", "SSIM", "Loss"):
        assert float(sp.log[key]) == pytest.approx(float(base.log[key]), rel=1e-5), key


def test_predictor_pad_h_shards_indivisible_heights(tmp_path):
    """parallel: {pad_h: true} — an LR height that does NOT divide
    spatial_parallel (11 rows over sp=4) is edge-extended before the jitted
    step instead of silently replicating (the _warn_once downgrade), and
    outputs/targets are cropped back so losses/metrics see only real rows.

    Tolerance: edge-extension replaces the meshless zero-padding at the
    bottom conv border, so rows within a receptive field of the border
    legitimately differ; scores must still agree closely."""
    import sys

    sys.path.insert(0, "tests")
    from fixtures import make_acdc_tree

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import Cfg
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.main import (
        test_from_config,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel import (
        mesh as mesh_mod,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        checkpoint as ckpt_io,
    )

    # LR height 44/4 = 11: indivisible by spatial_parallel=4; 10 frames so
    # the t_bucket=4 below actually pads the cycle (10 -> 12) — covering the
    # t_bucket + pad_h interplay (bucket first, pad second, both cropped)
    tree = make_acdc_tree(tmp_path / "acdc", frames=10, hr_size=(44, 44))
    net_kwargs = dict(
        in_channels=1, out_channels=1, num_features=[4, 4], upscale_factor=4,
        num_stages=1, update_memory=True, num_updated_frames=2,
        refine_window_size=5, positional_encoding=True,
    )
    model = RefineNet(**net_kwargs)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 7, 8, 8, 1)), jnp.zeros((1, 7, 1))
    )["params"]
    ckpt_path = tmp_path / "model.pth"
    ckpt_io.save_checkpoint(ckpt_path, params=params)

    def run(saved_dir, parallel):
        cfg = Cfg(
            {
                "main": {"saved_dir": str(saved_dir), "loaded_path": str(ckpt_path)},
                **({"parallel": parallel} if parallel else {}),
                "dataset": {
                    "name": "AcdcVSRRefineNetDataset",
                    "kwargs": {
                        "data_dir": str(tree["videos_dir"]),
                        "downscale_factor": 4,
                        "pos_code_path": str(tree["pos_code_path"]),
                        "transforms": [
                            {"name": "Normalize",
                             "kwargs": {"means": [54.089], "stds": [48.084]}},
                            {"name": "ToTensor"},
                        ],
                        "num_frames": 5,
                        "num_updated_frames": 2,
                    },
                },
                "dataloader": {
                    "name": "Dataloader",
                    "kwargs": {"batch_size": 1, "shuffle": False, "num_workers": 0},
                },
                "net": {"name": "RefineNet", "kwargs": net_kwargs},
                "losses": [{"name": "L1Loss", "weight": 1.0}],
                # Cardiac metrics included: their bbox masks are built from
                # the TRUE target shape and must line up with the in-step
                # cropped outputs
                "metrics": [
                    {"name": "PSNR"},
                    {"name": "SSIM"},
                    {"name": "CardiacPSNR",
                     "kwargs": {"coordinates_path": str(tree["coordinates_path"])}},
                ],
                "predictor": {
                    "name": "AcdcVSRRefineNetPredictor",
                    "kwargs": {"device": "cpu", "saved_dir": str(saved_dir),
                               "exported": False, "t_bucket": 4},
                },
            }
        )
        return test_from_config(cfg)

    base = run(tmp_path / "meshless", None)
    mesh_mod._WARNED.clear()
    sp = run(
        tmp_path / "padded",
        {"num_devices": 8, "spatial_parallel": 4, "pad_h": True},
    )
    assert sp.pad_h and sp.mesh.shape[SPATIAL_AXIS] == 4
    # padded LR heights shard — the replicate-downgrade warning never fires
    assert not any(k[0] == "spatial" for k in mesh_mod._WARNED), mesh_mod._WARNED
    assert abs(float(sp.log["PSNR"]) - float(base.log["PSNR"])) < 0.2
    assert abs(float(sp.log["CardiacPSNR"]) - float(base.log["CardiacPSNR"])) < 0.2
    assert abs(float(sp.log["SSIM"]) - float(base.log["SSIM"])) < 0.01
    assert float(sp.log["Loss"]) == pytest.approx(float(base.log["Loss"]), rel=0.05)


def test_make_mesh_rejects_oversubscription():
    """Asking for more devices than exist fails with a clear message, not a
    cryptic numpy reshape error (the single-chip-runs-a-pod-config case)."""
    with pytest.raises(ValueError, match="only .* visible"):
        make_mesh(len(jax.devices()) + 1)


def test_multiprocess_cpu_disables_persistent_compile_cache(monkeypatch):
    """The Gloo-deadlock guard lives at the production entry point: a
    multi-process CPU runtime turns the persistent compile cache off
    (asymmetric cache hits blow the 30 s rendezvous deadline — see
    _disable_persistent_cache_for_gloo), while single-process and
    non-CPU runs keep it."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel import (
        distributed,
    )

    original = jax.config.jax_compilation_cache_dir
    assert original, "conftest should have pinned a persistent cache dir"
    try:
        # single-process: untouched
        monkeypatch.setattr(jax, "process_count", lambda: 1)
        assert distributed._multiprocess_active() is False
        assert jax.config.jax_compilation_cache_dir == original

        # multi-process on a non-CPU backend: untouched
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert distributed._multiprocess_active() is True
        assert jax.config.jax_compilation_cache_dir == original

        # multi-process on CPU: cache disabled
        monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
        assert distributed._multiprocess_active() is True
        assert not jax.config.jax_compilation_cache_dir
    finally:
        jax.config.update("jax_compilation_cache_dir", original)


def test_multi_host_require_without_signal_raises(monkeypatch):
    """An explicit multi_host: true with nothing to coordinate against must
    hard-fail — a silent single-host fallback would make EVERY worker think
    it is process 0 and race the real lead's writes to the shared saved_dir."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel import (
        distributed,
    )

    for var in distributed._CLUSTER_ENV_VARS:
        monkeypatch.delenv(var, raising=False)
    with pytest.raises(ValueError, match="multi_host"):
        distributed.initialize(require=True)
    # without the explicit request, no signal still means a graceful False
    assert distributed.initialize() is False


@pytest.mark.parametrize(
    "mesh_kwargs",
    [{"spatial_parallel": 2}, {"model_parallel": 2}],
    ids=["dp_sp", "dp_tp"],
)
def test_remat_net_composes_with_meshes(mesh_kwargs):
    """Per-scan-step remat (net kwarg) under GSPMD: the rematerialized
    backward must reproduce the plain net's sharded train step on every
    supported 2-axis topology — remat changes the residual-saving policy,
    never the collectives or the math."""
    plain = RefineNet(**CFG)
    remat = RefineNet(**CFG, remat=True)
    batch = _batch(11)
    params = plain.init(jax.random.PRNGKey(0), batch["lr_imgs"], batch["pos_code"])["params"]
    tx = optax.sgd(1e-2)
    mesh = make_mesh(8, **mesh_kwargs)

    def make_step(model):
        def loss(p, b):
            p = gather_for_compute(mesh, p)
            outs = model.apply({"params": p}, b["lr_imgs"], b["pos_code"])
            return sum(jnp.mean(jnp.abs(o - b["hr_imgs"])) for o in outs)

        def step(p, s, b):
            val, grads = jax.value_and_grad(loss)(p, b)
            updates, s = tx.update(grads, s, p)
            return optax.apply_updates(p, updates), s, val

        return jax.jit(step)

    p_sh = partition_tree(mesh, params)
    s_sh = partition_tree(mesh, tx.init(params))
    b_sh = shard_batch(mesh, batch)
    p0, _, v0 = make_step(plain)(p_sh, s_sh, b_sh)
    p1, _, v1 = make_step(remat)(p_sh, s_sh, b_sh)

    assert float(v1) == pytest.approx(float(v0), rel=1e-6)
    for a, b in zip(jax.tree.leaves(p0), jax.tree.leaves(p1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6, rtol=1e-6)
