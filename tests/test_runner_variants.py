"""Runner-level tests for the non-RefineNet workloads: batch-stats (DUF),
FlowLoss routing (FRVSR), SRFB multi-step loss, and the TensorBoard loggers."""
import numpy as np
import pytest

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
    LOGGERS,
    TRAINERS,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data import (
    Dataloader,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import losses as L
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import metrics as M
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import models as nets
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.monitor import (
    Monitor,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
    Optimizer,
)


class _ArrayDataset:
    """Minimal in-memory dataset for runner tests."""

    def __init__(self, items):
        self.items = items
        self.data = [(None, None)] * len(items)

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i, rng=None):
        return self.items[i]


def _make_trainer(name, net, items, metric=True, num_epochs=1, **kwargs):
    ds = _ArrayDataset(items)
    loader = Dataloader(ds, batch_size=2, shuffle=False)
    vloader = Dataloader(ds, batch_size=2, shuffle=False)
    cls = TRAINERS.get(name)
    return cls(
        train_dataloader=loader,
        valid_dataloader=vloader,
        net=net,
        loss_fns=kwargs.pop("loss_fns", [L.L1Loss()]),
        loss_weights=kwargs.pop("loss_weights", None),
        metric_fns=[M.PSNR()] if metric else [],
        optimizer=Optimizer("Adam", lr=1e-3),
        num_epochs=num_epochs,
        **kwargs,
    )


def _misr_items(n=4, T=7, hw=8, r=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "lr_imgs": rng.standard_normal((T, hw, hw, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((hw * r, hw * r, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(n)
    ]


def _vsr_items(n=4, T=4, hw=8, r=4, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "lr_imgs": rng.standard_normal((T, hw, hw, 1)).astype(np.float32),
            "hr_imgs": rng.standard_normal((T, hw * r, hw * r, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(n)
    ]


def test_duf_trainer_updates_batch_stats():
    """The mutable batch_stats collection must thread through the jitted
    train step and change across steps."""
    import jax

    net = nets.DUFNet(1, 1, num_frames=7, size_filter=5, upscale_factor=4,
                      backbone="_DenseLayer16")
    trainer = _make_trainer("AcdcMISRTrainer", net, _misr_items(), loss_fns=[L.HuberLoss(0.01)])
    log, _, _ = trainer._run_epoch("training")
    assert np.isfinite(log["Loss"])
    assert trainer.model_state and "batch_stats" in trainer.model_state
    stats0 = [np.asarray(x) for x in jax.tree.leaves(trainer.model_state["batch_stats"])]
    log2, _, _ = trainer._run_epoch("training")
    stats1 = [np.asarray(x) for x in jax.tree.leaves(trainer.model_state["batch_stats"])]
    assert any(not np.allclose(a, b) for a, b in zip(stats0, stats1))
    # eval uses running averages without mutating them
    trainer._run_epoch("validation")
    stats2 = [np.asarray(x) for x in jax.tree.leaves(trainer.model_state["batch_stats"])]
    for a, b in zip(stats1, stats2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_frvsr_trainer_flow_loss_routing():
    net = nets.FRVSRNet(1, 1, upscale_factor=4, num_resblocks=1)
    trainer = _make_trainer(
        "AcdcFRVSRTrainer",
        net,
        _vsr_items(),
        loss_fns=[L.FlowLoss(), L.MSELoss()],
        loss_weights=[1.0, 1.0],
    )
    log, _, outputs = trainer._run_epoch("training")
    assert np.isfinite(log["Loss"])
    assert log["FlowLoss"] != log["MSELoss"]  # distinct branches actually used
    assert np.asarray(outputs).shape[-3:] == (32, 32, 1)  # SR branch displayed


def test_srfb_trainer_multi_step_loss():
    net = nets.SRFBNet(1, 1, num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    rng = np.random.default_rng(1)
    items = [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(4)
    ]
    trainer = _make_trainer("AcdcSISRSRFBTrainer", net, items)
    log, _, outputs = trainer._run_epoch("training")
    assert np.isfinite(log["Loss"])
    assert np.asarray(outputs).shape == (2, 32, 32, 1)  # last step displayed


def test_loggers_write_scalars_and_images(tmp_path):
    logger = LOGGERS.get("AcdcVSRLogger")(log_dir=tmp_path / "log", dummy_input=[2, 1, 8, 8])
    rng = np.random.default_rng(0)
    batch = {"hr_imgs": rng.uniform(0, 1, (2, 3, 16, 16, 1)).astype(np.float32)}
    outputs = rng.uniform(0, 1, (2, 3, 16, 16, 1)).astype(np.float32)
    log = {"Loss": 1.0, "PSNR": 20.0}
    logger.write(1, log, batch, outputs, log, batch, outputs)
    logger.close()
    assert list((tmp_path / "log").glob("events*"))


def test_monitor_early_stop(tmp_path):
    m = Monitor(checkpoints_dir=tmp_path / "ckpts", mode="min", target="Loss",
                saved_freq=100, early_stop=2)
    assert m.is_best({"Loss": 1.0}) is not None
    assert m.is_best({"Loss": 2.0}) is None
    assert not m.is_early_stopped()
    assert m.is_best({"Loss": 3.0}) is None
    assert m.is_early_stopped()


def test_lr_scheduler_applies_to_opt_state():
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
        StepLR,
    )

    net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
    rng = np.random.default_rng(2)
    items = [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(2)
    ]
    sched = StepLR(base_lr=1e-3, step_size=1, gamma=0.1)
    trainer = _make_trainer("AcdcSISRTrainer", net, items, num_epochs=2, lr_scheduler=sched)
    trainer.train()
    assert float(trainer.opt_state.hyperparams["learning_rate"]) == pytest.approx(1e-5, rel=1e-3)


def test_orbax_checkpoint_backend(tmp_path):
    """Orbax backend round-trips the full trainer state (arrays via
    StandardCheckpointer, run state via sidecar)."""
    import jax
    import numpy as np

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        checkpoint as ckpt_io,
    )

    net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
    rng = np.random.default_rng(3)
    items = [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(2)
    ]
    trainer = _make_trainer("AcdcSISRTrainer", net, items, checkpoint_backend="orbax")
    trainer._run_epoch("training")
    path = tmp_path / "model_best.pth"
    trainer.save(path)
    assert path.is_dir() and (path / "meta.pkl").exists()

    trainer2 = _make_trainer("AcdcSISRTrainer", net, items, checkpoint_backend="orbax")
    trainer2.load(path)
    for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(trainer2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert trainer2.epoch == trainer.epoch + 1  # resume semantics
    # resumed training must actually STEP: orbax degrades the optax
    # namedtuple state to dicts, which load() coerces back (set_lr and
    # tx.update need .hyperparams/.inner_state attributes)
    assert hasattr(trainer2.opt_state, "hyperparams")
    log, _, _ = trainer2._run_epoch("training")
    assert np.isfinite(log["Loss"])

    # predictors load net-only from the same directory checkpoint
    variables = ckpt_io.load_net_variables(path)
    assert "params" in variables


def test_orbax_async_checkpoint_backend(tmp_path):
    """orbax_async stages arrays and returns; the commit barrier
    (wait_for_async_saves, called by load/overwrite/train-exit) makes the
    write durable.  Round-trip + same-path overwrite must both be safe."""
    import jax
    import numpy as np

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        checkpoint as ckpt_io,
    )

    net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
    rng = np.random.default_rng(4)
    items = [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(2)
    ]
    trainer = _make_trainer("AcdcSISRTrainer", net, items, checkpoint_backend="orbax_async")
    trainer._run_epoch("training")
    path = tmp_path / "model_best.pth"
    trainer.save(path)
    # overwrite the SAME path while the first save may still be in flight:
    # _save_orbax fences before replacing the directory
    trainer.save(path)
    ckpt_io.wait_for_async_saves()
    assert path.is_dir() and (path / "meta.pkl").exists()

    trainer2 = _make_trainer("AcdcSISRTrainer", net, items, checkpoint_backend="orbax_async")
    trainer2.load(path)
    for a, b in zip(jax.tree.leaves(trainer.params), jax.tree.leaves(trainer2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert trainer2.epoch == trainer.epoch + 1
    log, _, _ = trainer2._run_epoch("training")  # resumed state must step
    assert np.isfinite(log["Loss"])


def test_optimizer_grad_clip_and_nonfinite_skip():
    import jax.numpy as jnp
    import optax

    opt = Optimizer("Adam", lr=1.0, grad_clip_norm=0.001, skip_nonfinite=3)
    params = {"w": jnp.ones((4,))}
    state = opt.init(params)
    # huge gradient gets clipped: update magnitude bounded
    updates, state = opt.update({"w": jnp.full((4,), 1e6)}, state, params)
    new = optax.apply_updates(params, updates)
    assert np.all(np.isfinite(np.asarray(new["w"])))
    # non-finite gradient: update is skipped entirely
    updates, state = opt.update({"w": jnp.full((4,), np.nan)}, state, params)
    skipped = optax.apply_updates(params, updates)
    np.testing.assert_array_equal(np.asarray(skipped["w"]), np.asarray(params["w"]))
    # below the limit: check passes and reports the skipped total
    assert opt.check_nonfinite(state) == 1
    # a finite step resets the consecutive count
    updates, state = opt.update({"w": jnp.ones((4,))}, state, params)
    assert opt.check_nonfinite(state) == 1
    # N consecutive bad steps: the update is STILL skipped (optax's
    # give-up-and-apply is disabled) and check_nonfinite raises
    for _ in range(3):
        updates, state = opt.update({"w": jnp.full((4,), np.nan)}, state, params)
        still = optax.apply_updates(params, updates)
        np.testing.assert_array_equal(np.asarray(still["w"]), np.asarray(params["w"]))
    with pytest.raises(RuntimeError, match="3 consecutive non-finite"):
        opt.check_nonfinite(state)
    # lr still adjustable through the wrapper chain
    Optimizer.set_lr(state, 0.5)


def test_find_latest_checkpoint(tmp_path):
    import pickle

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.checkpoint import (
        find_latest_checkpoint,
    )

    def write(name, epoch):
        with open(tmp_path / name, "wb") as f:
            pickle.dump({"epoch": epoch}, f)

    assert find_latest_checkpoint(tmp_path) is None
    write("model_best.pth", 7)
    assert find_latest_checkpoint(tmp_path).name == "model_best.pth"
    # numeric-epoch ordering, NOT mtime or lexicographic: model_100 wins even
    # written first and despite "model_9" > "model_100" as strings
    write("model_100.pth", 100)
    write("model_9.pth", 9)
    assert find_latest_checkpoint(tmp_path).name == "model_100.pth"
    # a preemption checkpoint older than the newest periodic save (stale
    # leftover from an earlier run) must NOT win ...
    write("model_preempted.pth", 42)
    assert find_latest_checkpoint(tmp_path).name == "model_100.pth"
    # ... but one at an equal-or-later epoch must (written after model_N)
    write("model_preempted.pth", 100)
    assert find_latest_checkpoint(tmp_path).name == "model_preempted.pth"
    write("model_preempted.pth", 103)
    assert find_latest_checkpoint(tmp_path).name == "model_preempted.pth"


def test_find_latest_skips_half_written_orbax_dir(tmp_path):
    """A crash between the async meta sidecar and the orbax array commit
    leaves meta.pkl without an arrays tree; auto-resume must skip it and
    load_checkpoint must fail with a clear message."""
    import pickle

    import pytest as _pytest

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.checkpoint import (
        find_latest_checkpoint,
        load_checkpoint,
    )

    with open(tmp_path / "model_2.pth", "wb") as f:
        pickle.dump({"epoch": 2}, f)
    half = tmp_path / "model_4.pth"
    half.mkdir()
    with open(half / "meta.pkl", "wb") as f:
        pickle.dump({"epoch": 4}, f)
    # the half-written dir is newer-numbered but uncommitted
    assert find_latest_checkpoint(tmp_path).name == "model_2.pth"
    with _pytest.raises(FileNotFoundError, match="half-written"):
        load_checkpoint(half)
    # once the arrays tree is committed (atomic rename) it becomes eligible
    (half / "arrays").mkdir()
    assert find_latest_checkpoint(tmp_path).name == "model_4.pth"


def test_profiling_trace_and_throughput(tmp_path, monkeypatch):
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils.profiling import (
        Throughput,
        trace,
    )

    # no-op without the env var
    with trace("x"):
        pass
    # with the env var it must produce a trace dir (jax.profiler on CPU)
    monkeypatch.setenv("EVSR_PROFILE_DIR", str(tmp_path))
    import jax.numpy as jnp

    with trace("region"):
        float(jnp.sum(jnp.ones((8, 8))))
    assert (tmp_path / "region").exists()

    t = Throughput()
    t.update(steps=2, frames=60)
    s = t.stats()
    assert s["steps"] == 2 and s["frames"] == 60 and s["frames_per_sec"] > 0


def test_refinenet_trainer_loss_discount_matches_reference_formula():
    """Training loss = sum over 3*num_stages branches of
    0.5^(num_stages - branch//3 - 1) * mean-per-frame loss
    (reference acdc_vsr_refinenet_trainer.py:86-94); eval = last branch only."""
    import jax.numpy as jnp

    trainer_cls = TRAINERS.get("AcdcVSRRefineNetTrainer")
    trainer = trainer_cls(loss_fns=[L.L1Loss()], optimizer=None)

    rng = np.random.default_rng(0)
    num_stages = 3
    outputs = [jnp.asarray(rng.standard_normal((2, 4, 8, 8, 1)), jnp.float32)
               for _ in range(3 * num_stages)]
    targets = jnp.asarray(rng.standard_normal((2, 4, 8, 8, 1)), jnp.float32)
    batch = {"hr_imgs": targets}

    (got,) = trainer._compute_losses(outputs, batch, training=True)
    want = sum(
        (0.5 ** (num_stages - i // 3 - 1)) * float(np.mean(np.abs(np.asarray(o) - np.asarray(targets))))
        for i, o in enumerate(outputs)
    )
    assert float(got) == pytest.approx(want, rel=1e-5)

    (got_eval,) = trainer._compute_losses(outputs, batch, training=False)
    want_eval = float(np.mean(np.abs(np.asarray(outputs[-1]) - np.asarray(targets))))
    assert float(got_eval) == pytest.approx(want_eval, rel=1e-5)


def test_log_weighting_uses_configured_batch_size():
    """Quirk 8 replicated: the log weight is the CONFIGURED batch size
    (and x T for VSR), regardless of actual last-batch size."""
    net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
    rng = np.random.default_rng(4)
    items = [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(3)  # batch_size 2, drop_last False → last batch has 1
    ]
    trainer = _make_trainer("AcdcSISRTrainer", net, items)
    assert trainer._log_weight({"anything": None}, "training") == 2

    vsr_cls = TRAINERS.get("AcdcVSRRefineNetTrainer")
    vsr = vsr_cls(
        train_dataloader=trainer.train_dataloader,
        valid_dataloader=trainer.valid_dataloader,
        loss_fns=[L.L1Loss()],
        optimizer=None,
    )
    batch = {"lr_imgs": np.zeros((2, 19, 8, 8, 1), np.float32)}
    assert vsr._log_weight(batch, "training") == 2 * 19  # B x T(incl. warm-up)


def test_grad_accum_matches_plain_step():
    """grad_accum_steps=N: N microbatch gradients averaged inside one jitted
    step == the full-batch gradient exactly (per-item-mean losses), so the
    loss trajectory and final params must match the plain step.  This is the
    knob that gets the EDVR batch-16 backward under compiler graph limits
    (PERF_NOTES.md)."""
    import jax

    def run(accum):
        net = nets.EDSRNet(
            in_channels=1, out_channels=1, num_resblocks=2, num_features=8,
            upscale_factor=4,
        )
        items = [
            {
                "lr_img": np.random.default_rng(i).standard_normal((8, 8, 1)).astype(np.float32),
                "hr_img": np.random.default_rng(100 + i).standard_normal((32, 32, 1)).astype(np.float32),
                "index": i,
            }
            for i in range(4)
        ]
        trainer = _make_trainer(
            "AcdcSISRTrainer", net, items, num_epochs=2, grad_accum_steps=accum
        )
        logs = []
        for _ in range(2):
            log, _, outputs = trainer._run_epoch("training")
            logs.append(log)
        return logs, trainer.params, np.asarray(outputs)

    logs1, params1, out1 = run(1)
    logs2, params2, out2 = run(2)
    for l1, l2 in zip(logs1, logs2):
        assert l2["Loss"] == pytest.approx(l1["Loss"], rel=1e-5)
        assert l2["PSNR"] == pytest.approx(l1["PSNR"], rel=1e-4)  # microbatch-mean PSNR
    for a, b in zip(jax.tree.leaves(params1), jax.tree.leaves(params2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
    # display outputs are reassembled to the FULL batch (logger pairs them
    # with the full host batch)
    assert out2.shape == out1.shape
    np.testing.assert_allclose(out2, out1, atol=1e-4, rtol=1e-4)


def test_grad_accum_rejects_indivisible_batch():
    net = nets.EDSRNet(in_channels=1, out_channels=1, num_resblocks=1,
                       num_features=4, upscale_factor=4)
    items = [
        {"lr_img": np.zeros((8, 8, 1), np.float32),
         "hr_img": np.zeros((32, 32, 1), np.float32), "index": i}
        for i in range(3)
    ]
    trainer = _make_trainer("AcdcSISRTrainer", net, items, grad_accum_steps=3)
    with pytest.raises(ValueError, match="grad_accum_steps=3 must divide"):
        trainer._run_epoch("training")  # batch_size 2, accum 3


def _run_aot_worker(mode, cache_dir):
    """Fresh-process AOT scenario (tests/_aot_worker.py): the store path is
    process-state-dependent upstream (any compilation-cache-restored
    executable in-process can poison XLA:CPU's serializer, which store-time
    validation correctly refuses), so store/hit contracts are asserted in
    clean subprocesses — the honest serving scenario."""
    import json
    import os
    import subprocess
    import sys
    from pathlib import Path

    drop = ("JAX_COMPILATION_CACHE_DIR", "JAX_PERSISTENT_CACHE")
    env = {k: v for k, v in os.environ.items() if not k.startswith(drop)}
    proc = subprocess.run(
        [sys.executable, str(Path(__file__).parent / "_aot_worker.py"),
         mode, str(cache_dir)],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-1500:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["trainer", "predictor"])
def test_aot_cache_across_processes(mode, tmp_path):
    """The serving/resume contract end-to-end: process 1 compiles, validates
    and stores executables; process 2 runs on pure cache hits (no new or
    rewritten entries, >=1 logged hit) with identical results."""
    cache_dir = tmp_path / "aot"
    first = _run_aot_worker(mode, cache_dir)
    assert first["entries"], "first process must store validated executables"
    assert first["hits"] == 0
    mtimes = {f.name: f.stat().st_mtime_ns for f in cache_dir.glob("*.jaxexe")}
    second = _run_aot_worker(mode, cache_dir)
    assert second["hits"] >= 1, "second process must reload from the cache"
    assert second["entries"] == first["entries"]
    assert {f.name: f.stat().st_mtime_ns for f in cache_dir.glob("*.jaxexe")} == mtimes
    assert second["checksum"] == pytest.approx(first["checksum"], rel=1e-6)


def test_predictor_aot_executable_cache(tmp_path):
    """aot_cache: the first predict() compiles and serializes executables to
    disk; a fresh predictor instance reuses them byte-for-byte (no rewrite,
    identical scores); a corrupt entry degrades to a recompile, never an
    error (utils/aot.py contract)."""
    from pathlib import Path

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
        VSRPredictor,
    )

    items = _vsr_items(n=3)
    cache_dir = tmp_path / "aot"

    def make_pred():
        ds = _ArrayDataset(items)
        ds.data = [
            (Path(f"patient{i:03d}_2d_sequence01.nii.gz"), None)
            for i in range(len(items))
        ]
        loader = Dataloader(ds, batch_size=1, shuffle=False)
        pred = VSRPredictor(
            device="cpu",
            test_dataloader=loader,
            net=nets.Bicubic(upscale_factor=4),
            loss_fns=[L.L1Loss()],
            metric_fns=[M.PSNR()],
            aot_cache=str(cache_dir),
        )
        first = items[0]
        batch = {
            k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
            for k, v in first.items()
        }
        pred.init_params_like(batch)
        return pred

    log1 = make_pred().predict()
    entries = sorted(cache_dir.glob("*.jaxexe"))
    if not entries:  # store refused by validation: in-process poisoning
        pytest.skip("AOT store refused by validation (compilation-cache "
                    "poisoning in-suite) — covered by "
                    "test_aot_cache_across_processes")
    mtimes = {f.name: f.stat().st_mtime_ns for f in entries}

    log2 = make_pred().predict()
    assert log2 == log1
    entries2 = sorted(cache_dir.glob("*.jaxexe"))
    assert {f.name: f.stat().st_mtime_ns for f in entries2} == mtimes, (
        "second run must be pure cache hits (no new/rewritten entries)"
    )

    for f in entries2:
        f.write_bytes(b"not an executable")
    log3 = make_pred().predict()
    assert log3["PSNR"] == pytest.approx(log1["PSNR"], rel=1e-6)


def test_predictor_aot_cache_on_mesh(tmp_path):
    """AOT-cached executables record their device assignment: a mesh-sharded
    executable (8-device GSPMD) reloads onto the same device set and scores
    match the meshless run."""
    from pathlib import Path

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel import (
        make_mesh,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
        VSRPredictor,
    )

    items = _vsr_items(n=3)
    cache_dir = tmp_path / "aot"

    def make_pred(mesh):
        ds = _ArrayDataset(items)
        ds.data = [
            (Path(f"patient{i:03d}_2d_sequence01.nii.gz"), None)
            for i in range(len(items))
        ]
        loader = Dataloader(ds, batch_size=1, shuffle=False)
        pred = VSRPredictor(
            device="cpu", test_dataloader=loader, net=nets.Bicubic(upscale_factor=4),
            loss_fns=[L.L1Loss()], metric_fns=[M.PSNR()], mesh=mesh,
            aot_cache=str(cache_dir),
        )
        first = items[0]
        batch = {
            k: (np.asarray(v)[None] if hasattr(v, "ndim") else [v])
            for k, v in first.items()
        }
        pred.init_params_like(batch)
        return pred

    mesh = make_mesh(8)
    log1 = make_pred(mesh).predict()
    entries = sorted(cache_dir.glob("*.jaxexe"))
    if not entries:  # store refused by validation: in-process poisoning —
        # skip BEFORE the mtime assertions, which would pass vacuously on {}
        pytest.skip("AOT store refused by validation (compilation-cache "
                    "poisoning in-suite) — store/hit covered by "
                    "test_aot_cache_across_processes")
    mtimes = {f.name: f.stat().st_mtime_ns for f in entries}
    log2 = make_pred(mesh).predict()  # reload path
    assert log2 == log1
    assert {f.name: f.stat().st_mtime_ns for f in sorted(cache_dir.glob("*.jaxexe"))} == mtimes, (
        "mesh entries must not be added/rewritten on the second run"
    )
    # meshless reference numerics must hold with or without the cache
    log_plain = make_pred(None).predict()
    assert log_plain["PSNR"] == pytest.approx(log1["PSNR"], rel=1e-5)


def test_double_buffer_order_and_eager():
    """DoubleBuffer finishes every pushed item exactly once, in push order,
    one push behind (immediately when eager); drain flushes the tail."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils.dispatch import (
        DoubleBuffer,
    )

    done = []
    pipe = DoubleBuffer(done.append)
    for i in range(4):
        pipe.push(i)
        assert done == list(range(i))  # always one behind
    pipe.drain()
    assert done == [0, 1, 2, 3]
    pipe.drain()  # idempotent
    assert done == [0, 1, 2, 3]

    done_eager = []
    pipe = DoubleBuffer(done_eager.append, eager=True)
    for i in range(3):
        pipe.push(i)
        assert done_eager == list(range(i + 1))  # immediate
    pipe.drain()
    assert done_eager == [0, 1, 2]


def test_cached_dispatch_distinguishes_tree_structures(tmp_path):
    """Two argument trees with identical leaf signatures but different
    structures (None moves between slots) must map to different executables —
    the in-memory key includes the pytree structure, not just leaf shapes."""
    import jax
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils.aot import (
        cached_dispatch,
    )

    @jax.jit
    def f(t):
        return (0.0 if t["a"] is None else jnp.sum(t["a"])) + (
            0.0 if t["b"] is None else 2.0 * jnp.sum(t["b"])
        )

    call = cached_dispatch(f, str(tmp_path / "aot"), "tree")
    x = jnp.ones((3,), jnp.float32)
    assert float(call({"a": x, "b": None})) == pytest.approx(3.0)
    # same leaf signature, different structure: must NOT reuse the first
    # executable (tree-mismatch crash) — it recompiles under its own key
    assert float(call({"a": None, "b": x})) == pytest.approx(6.0)
    assert float(call({"a": x, "b": None})) == pytest.approx(3.0)  # still cached


def test_aot_disk_hit_validates_by_running(tmp_path):
    """A cache entry that deserializes cleanly but cannot EXECUTE for this
    program (here: a different program's executable under our key) must
    degrade to a recompile at load — never crash the caller's first step."""
    import shutil

    import jax
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        aot,
    )

    cache = tmp_path / "aot"
    f1 = jax.jit(lambda x: x + 1.0)
    f2 = jax.jit(lambda x, y: x @ y)  # different arity/shapes → cannot run as f1
    x = jnp.ones((4,), jnp.float32)
    m = jnp.ones((2, 2), jnp.float32)
    aot.compile_cached(f1, (x,), cache, tag="a")
    aot.compile_cached(f2, (m, m), cache, tag="b")
    e1 = sorted(cache.glob("a-*.jaxexe"))
    e2 = sorted(cache.glob("b-*.jaxexe"))
    if not (e1 and e2):
        pytest.skip("AOT store refused by validation in-suite — covered by "
                    "test_aot_cache_across_processes")
    # plant f2's executable under f1's key: unpickles + deserializes fine,
    # but executing it with f1's args fails — the hit path must catch that
    shutil.copy(e2[0], e1[0])
    compiled = aot.compile_cached(f1, (x,), cache, tag="a")
    out = np.asarray(compiled(x))
    np.testing.assert_allclose(out, np.full((4,), 2.0, np.float32))


def test_cached_dispatch_bypassed_multiprocess(tmp_path, monkeypatch):
    """Multi-process runs must bypass the AOT executable cache entirely:
    per-process hit asymmetry would desynchronize collective execution
    counts (utils/aot.py cached_dispatch docstring).  The wrapper must
    still compute correctly and write NO cache entries."""
    import jax
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import (
        aot,
    )

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    cache = tmp_path / "aot"
    f = jax.jit(lambda x, n: x * n, static_argnums=(1,))
    call = aot.cached_dispatch(f, str(cache), "mp", static_argnums=(1,))
    x = jnp.ones((3,), jnp.float32)
    np.testing.assert_allclose(np.asarray(call(x, 3)), 3.0)
    assert not list(cache.glob("*.jaxexe"))  # nothing stored


def test_vsr_t_bucketing_wrap_math():
    """t_bucket pads the cycle circularly: core frames wrap mod T, the
    trailing warm-up margin is rebuilt to follow the extended core."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.predictors import (
        VSRPredictor,
    )

    pred = VSRPredictor(device="cpu", loss_fns=[], metric_fns=[], t_bucket=4)
    rng = np.random.default_rng(0)
    T, U = 5, 2
    hr = rng.standard_normal((1, T, 8, 8, 1)).astype(np.float32)
    lr = rng.standard_normal((1, T + 2 * U, 2, 2, 1)).astype(np.float32)
    pos = rng.standard_normal((1, T + 2 * U, 1)).astype(np.float32)
    batch = {"hr_imgs": hr, "lr_imgs": lr, "pos_code": pos, "index": np.array([0])}

    new, true_T = pred._bucket_batch(batch)
    assert true_T == T
    Tb = 8
    idx = np.arange(Tb) % T
    np.testing.assert_array_equal(new["hr_imgs"], hr[:, idx])
    core = lr[:, U : U + T]
    want_lr = np.concatenate([lr[:, :U], core[:, idx], core[:, [3, 4]]], axis=1)
    np.testing.assert_array_equal(new["lr_imgs"], want_lr)
    pcore = pos[:, U : U + T]
    want_pos = np.concatenate([pos[:, :U], pcore[:, idx], pcore[:, [3, 4]]], axis=1)
    np.testing.assert_array_equal(new["pos_code"], want_pos)

    # already a multiple → no-op
    pred2 = VSRPredictor(device="cpu", loss_fns=[], metric_fns=[], t_bucket=5)
    same, none_T = pred2._bucket_batch(batch)
    assert none_T is None and same is batch

    # off by default → no-op
    pred3 = VSRPredictor(device="cpu", loss_fns=[], metric_fns=[])
    same, none_T = pred3._bucket_batch(batch)
    assert none_T is None


def test_logger_skips_image_panels_for_empty_epoch(tmp_path):
    """An epoch can produce no batches (items < batch size with drop_last);
    the logger must write scalars and skip the panels, not crash."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.loggers import (
        VSRLogger,
    )

    logger = VSRLogger(tmp_path)
    logger.write(1, {"Loss": 1.0}, None, None, {"Loss": 2.0}, None, None)
    logger.close()


def test_reduce_lr_on_plateau_matches_torch():
    """The plateau scheduler follows torch semantics exactly — rel/abs
    threshold modes and cooldown — checked against torch's own
    ReduceLROnPlateau on the same loss trace."""
    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
        ReduceLROnPlateau,
    )

    losses = [10.0, 9.999, 9.999, 9.999, 9.0, 9.0, 9.0, 9.0, 8.0, 8.0, 8.0, 8.5, 9.5,
              7.0, 7.0, 7.0, 7.0, 7.0]
    for kwargs in (
        dict(factor=0.5, patience=2),                         # torch-default rel
        dict(factor=0.5, patience=2, threshold_mode="abs"),
        dict(factor=0.5, patience=1, cooldown=3),
        dict(factor=0.1, patience=0, threshold=0.05),
    ):
        ours = ReduceLROnPlateau(base_lr=1e-3, **kwargs)
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        theirs = torch.optim.lr_scheduler.ReduceLROnPlateau(opt, mode="min", **kwargs)
        for i, loss in enumerate(losses):
            got = ours.step(loss)
            theirs.step(loss)
            want = opt.param_groups[0]["lr"]
            assert got == pytest.approx(want, rel=1e-12), (kwargs, i, got, want)


def test_checkpoint_backend_switch_same_path(tmp_path):
    """Resuming the same saved_dir with a different checkpoint_backend must
    overwrite the other format in place: pickle writes a FILE, orbax a
    DIRECTORY, and model_best.pth keeps its name either way."""
    import jax.numpy as jnp

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
        checkpoint as ckpt_io,
    )

    params = {"w": jnp.arange(4.0)}
    path = tmp_path / "model_best.pth"
    for backend, epoch in (("pickle", 1), ("orbax", 2), ("pickle", 3), ("orbax_async", 4), ("pickle", 5)):
        ckpt_io.save_checkpoint(path, params=params, epoch=epoch, backend=backend)
        ckpt_io.wait_for_async_saves()
        restored = ckpt_io.load_checkpoint(path)
        assert restored["epoch"] == epoch
        np.testing.assert_array_equal(np.asarray(restored["net"]["w"]), np.arange(4.0))


def test_backend_fingerprint_keys_on_host_cpu():
    """XLA:CPU AOT blobs embed the compile host's ISA features; a blob moved
    to a different machine can warn or SIGILL at load.  On the cpu platform
    the fingerprint must therefore include a stable host-CPU hash (and the
    hash itself must be deterministic within one host)."""
    import json

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils import aot

    h1, h2 = aot.host_cpu_fingerprint(), aot.host_cpu_fingerprint()
    assert h1 == h2 and len(h1) == 12

    fp = json.loads(aot.backend_fingerprint())
    assert fp["platform"] == "cpu"  # conftest pins the cpu backend
    assert fp["host_cpu"] == h1


def test_epoch_schedulers_match_torch():
    """MultiStepLR / ExponentialLR / CosineAnnealingLR trace torch's own
    schedulers epoch-by-epoch (StepLR and ReduceLROnPlateau are covered
    above; this closes the remaining registered epoch schedulers)."""
    import torch

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
        CosineAnnealingLR,
        ExponentialLR,
        MultiStepLR,
    )

    cases = [
        (MultiStepLR(base_lr=1e-3, milestones=[3, 7, 8], gamma=0.5),
         lambda opt: torch.optim.lr_scheduler.MultiStepLR(
             opt, milestones=[3, 7, 8], gamma=0.5)),
        (ExponentialLR(base_lr=1e-3, gamma=0.9),
         lambda opt: torch.optim.lr_scheduler.ExponentialLR(opt, gamma=0.9)),
        (CosineAnnealingLR(base_lr=1e-3, T_max=10),
         lambda opt: torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=10)),
        (CosineAnnealingLR(base_lr=1e-3, T_max=10, eta_min=1e-5),
         lambda opt: torch.optim.lr_scheduler.CosineAnnealingLR(
             opt, T_max=10, eta_min=1e-5)),
    ]
    for ours, make_theirs in cases:
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1e-3)
        theirs = make_theirs(opt)
        for epoch in range(12):
            got = ours.step()
            opt.step()
            theirs.step()
            want = opt.param_groups[0]["lr"]
            assert got == pytest.approx(want, rel=1e-9), (type(ours).__name__, epoch)


def test_preempt_after_epochs_resumes_trajectory(tmp_path):
    """Epoch-budgeted self-preemption (``preempt_after_epochs``, the
    deterministic twin of the SIGTERM handler): after N epochs this run the
    trainer takes the same preemption path (``model_preempted.pth`` + clean
    exit), and a resume from that checkpoint continues the uninterrupted
    run's loss trajectory exactly (params, optimizer, RNG seeds restored).
    The driver's ``dryrun_multichip`` drives the same flow through
    ``train_from_config`` over sharded meshes."""
    rng = np.random.default_rng(7)
    items = [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(4)
    ]

    def make(saved_dir, **kw):
        net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
        return _make_trainer(
            "AcdcSISRTrainer", net, items, num_epochs=3,
            monitor=Monitor(checkpoints_dir=saved_dir / "checkpoints",
                            mode="min", target="Loss", saved_freq=100),
            **kw,
        )

    # run A: 3 uninterrupted epochs
    a = make(tmp_path / "a")
    a.train()
    losses_a = [h["Loss"] for h in a.history["train"]]
    assert len(losses_a) == 3
    assert not (tmp_path / "a" / "checkpoints" / "model_preempted.pth").exists()

    # run B: same config, self-preempted after epoch 1
    b = make(tmp_path / "b", preempt_after_epochs=1)
    b.train()
    assert len(b.history["train"]) == 1
    ckpt = tmp_path / "b" / "checkpoints" / "model_preempted.pth"
    assert ckpt.exists()
    assert b.history["train"][0]["Loss"] == pytest.approx(losses_a[0], rel=1e-6)

    # resume: epochs 2-3 must continue run A's trajectory
    b2 = make(tmp_path / "b2")
    b2.load(ckpt)
    b2.train()
    losses_r = [h["Loss"] for h in b2.history["train"]]
    assert len(losses_r) == 2
    np.testing.assert_allclose(losses_r, losses_a[1:], rtol=1e-6)

    # budget >= remaining epochs: finishes normally, no preemption artifact
    c = make(tmp_path / "c", preempt_after_epochs=3)
    c.train()
    assert len(c.history["train"]) == 3
    assert not (tmp_path / "c" / "checkpoints" / "model_preempted.pth").exists()


def test_preempt_after_seconds(tmp_path):
    """Wall-clock-budgeted self-preemption: any positive budget smaller than
    one epoch's wall time preempts at the first epoch boundary (the check
    runs after each epoch); a generous budget finishes the run."""
    rng = np.random.default_rng(8)
    items = [
        {
            "lr_img": rng.standard_normal((8, 8, 1)).astype(np.float32),
            "hr_img": rng.standard_normal((32, 32, 1)).astype(np.float32),
            "index": i,
        }
        for i in range(2)
    ]

    def make(saved_dir, **kw):
        net = nets.EDSRNet(1, 1, num_resblocks=1, num_features=4, upscale_factor=4)
        return _make_trainer(
            "AcdcSISRTrainer", net, items, num_epochs=3,
            monitor=Monitor(checkpoints_dir=saved_dir / "checkpoints",
                            mode="min", target="Loss", saved_freq=100),
            **kw,
        )

    t = make(tmp_path / "tight", preempt_after_seconds=1e-6)
    t.train()
    assert len(t.history["train"]) == 1
    assert (tmp_path / "tight" / "checkpoints" / "model_preempted.pth").exists()

    g = make(tmp_path / "generous", preempt_after_seconds=3600.0)
    g.train()
    assert len(g.history["train"]) == 3
    assert not (tmp_path / "generous" / "checkpoints" / "model_preempted.pth").exists()
