"""Worker for the multi-process distributed CPU tests (multi-host plan,
SURVEY.md §2.8).

Runs ONE train step of a tiny RefineNet over an 8-device mesh and prints
``LOSS <value>``:

* ``--single``: one process owning all 8 (virtual CPU) devices — the ground
  truth numbers.
* ``--pid N --port P [--num-procs K] [--spatial S]``: one of K coordinated
  processes, 8/K local CPU devices each, global arrays assembled with
  ``jax.make_array_from_process_local_data``.  ``--spatial`` adds a
  ``spatial`` mesh axis (dp x sp), so with K=4 / S=2 each process owns one
  data-mesh row whose two spatial columns are its two local devices — the
  process-SPANNING axis layout a two-process pair cannot exercise.

The losses must agree exactly: the global SPMD program is identical; only
process ownership of the shards differs.
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

GLOBAL_BATCH = 8
CFG = dict(
    in_channels=1, out_channels=1, num_features=[4, 4], upscale_factor=2,
    num_stages=1, update_memory=True, num_updated_frames=2,
    refine_window_size=3, positional_encoding=True,
)
CORE_T, U, HW = 3, 2, 6


def _global_inputs():
    import numpy as np

    rng = np.random.default_rng(0)
    T = CORE_T + 2 * U
    lr = rng.standard_normal((GLOBAL_BATCH, T, HW, HW, 1)).astype(np.float32)
    pos = rng.uniform(-1, 1, (GLOBAL_BATCH, T, 1)).astype(np.float32)
    hr = rng.standard_normal((GLOBAL_BATCH, CORE_T, HW * 2, HW * 2, 1)).astype(np.float32)
    return lr, pos, hr


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--single", action="store_true")
    parser.add_argument("--pid", type=int, default=0)
    parser.add_argument("--port", type=int, default=0)
    parser.add_argument("--num-procs", type=int, default=2)
    parser.add_argument("--spatial", type=int, default=1)
    parser.add_argument("--ckpt-dir", default=None)
    parser.add_argument(
        "--logdir", default=None,
        help="with --trainer: wire a TensorBoard logger and exercise the "
        "multi-host _write_logs path (collective gather of the sharded "
        "display outputs + lead-only SummaryWriter write)",
    )
    parser.add_argument(
        "--trainer", action="store_true",
        help="drive the REAL BaseTrainer epoch engine (loader -> "
        "shard_batch device_put with a process-spanning mesh -> jitted "
        "donated step -> device-side log accumulation) instead of a raw step",
    )
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8 if args.single else 8 // args.num_procs)

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel import (
        distributed,
    )

    if not args.single:
        ok = distributed.initialize(f"localhost:{args.port}", args.num_procs, args.pid)
        assert ok, "jax.distributed.initialize did not produce a multi-process runtime"
        assert jax.process_count() == args.num_procs
        assert len(jax.devices()) == 8  # global view spans all processes

    if args.trainer:
        _run_trainer_epoch(args)
        return

    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        RefineNet,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel.mesh import (
        make_mesh,
        video_spec,
    )

    mesh = make_mesh(spatial_parallel=args.spatial)
    repl = NamedSharding(mesh, P())

    def array_sharding(a):
        # batch over ``data``; height of rank>=4 video arrays additionally
        # over ``spatial`` when the mesh has that axis (HW here divides sp)
        return NamedSharding(mesh, video_spec(mesh, a.ndim))

    lr, pos, hr = _global_inputs()
    if args.single:
        lr_g, pos_g, hr_g = (jax.device_put(a, array_sharding(a)) for a in (lr, pos, hr))
    else:
        local, off = distributed.process_local_batch_slice(GLOBAL_BATCH)

        def globalize(a):
            # each process owns whole data-mesh rows (its local devices fill
            # the spatial columns), so its local block is its batch rows at
            # FULL height — contiguous, exactly what make_array_from_
            # process_local_data expects
            return jax.make_array_from_process_local_data(
                array_sharding(a), a[off : off + local], a.shape
            )

        lr_g, pos_g, hr_g = globalize(lr), globalize(pos), globalize(hr)

    model = RefineNet(**CFG)
    variables = model.init(jax.random.PRNGKey(0), lr[:1], pos[:1])
    if args.single:
        params = jax.device_put(variables["params"], repl)
    else:
        params = jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(repl, np.asarray(a), a.shape),
            variables["params"],
        )
    tx = optax.adam(1e-3)
    opt_state = (
        jax.device_put(tx.init(variables["params"]), repl)
        if args.single
        else jax.tree.map(
            lambda a: jax.make_array_from_process_local_data(
                repl, np.asarray(a), np.shape(a)
            ),
            tx.init(variables["params"]),
        )
    )

    def loss_fn(p, lr_in, pos_in, hr_in):
        outs = model.apply({"params": p}, lr_in, pos_in)
        return sum(jnp.mean(jnp.abs(o - hr_in)) for o in outs)

    @jax.jit
    def train_step(p, s, lr_in, pos_in, hr_in):
        loss, grads = jax.value_and_grad(loss_fn)(p, lr_in, pos_in, hr_in)
        updates, s = tx.update(grads, s, p)
        return optax.apply_updates(p, updates), s, loss

    params, opt_state, loss = train_step(params, opt_state, lr_g, pos_g, hr_g)
    _, _, loss2 = train_step(params, opt_state, lr_g, pos_g, hr_g)
    print(f"LOSS {float(loss):.8f} {float(loss2):.8f}", flush=True)

    if not args.single and args.ckpt_dir:
        # Multihost checkpoint contract: ZeRO-3-sharded params (model axis
        # spans the two processes, so leaves are NOT fully addressable) saved
        # with the async orbax backend to shared storage — lead-only sidecar
        # + rmtree, pre-save barrier, replicate-gather in _to_numpy — then
        # reloaded by BOTH processes and compared bit-exactly.
        from jax.experimental import multihost_utils

        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel.mesh import (
            partition_tree,
        )
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner import (
            checkpoint as ckpt_io,
        )

        tp_mesh = make_mesh(8, model_parallel=2)
        p_sh = partition_tree(tp_mesh, variables["params"])
        assert any(
            not leaf.is_fully_addressable for leaf in jax.tree.leaves(p_sh)
        ), "expected model-sharded leaves spanning both processes"
        path = Path(args.ckpt_dir) / "model_1.pth"
        ckpt_io.save_checkpoint(path, params=p_sh, epoch=1, backend="orbax_async")
        ckpt_io.wait_for_async_saves()
        multihost_utils.sync_global_devices("evsr_test_ckpt_committed")
        loaded = ckpt_io.load_checkpoint(path)
        for want, got in zip(
            jax.tree.leaves(variables["params"]), jax.tree.leaves(loaded["net"])
        ):
            np.testing.assert_array_equal(np.asarray(want), np.asarray(got))
        assert loaded["epoch"] == 1
        print("CKPT_OK", flush=True)


def _run_trainer_epoch(args):
    """One REAL trainer epoch over the global mesh; prints ``LOSS <train>
    <valid>``.  Every process runs the identical loader (same seed, shuffle
    off), so shard_batch's device_put onto the process-spanning mesh sees the
    same global batch everywhere — jax's multiprocess global-sharding
    semantics distribute the shards."""
    import jax
    import numpy as np

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
        losses as L,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.loader import (
        Dataloader,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.models import (
        RefineNet,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.parallel.mesh import (
        make_mesh,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
        Optimizer,
    )
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.trainers import (
        VSRRefineNetTrainer,
    )

    lr, pos, hr = _global_inputs()
    T = CORE_T + 2 * U

    class _Ds:
        def __len__(self):
            return GLOBAL_BATCH

        def __getitem__(self, i):
            return {
                "lr_imgs": lr[i],
                "pos_code": pos[i],
                "hr_imgs": hr[i],
                "index": i,
            }

    loader = Dataloader(_Ds(), batch_size=GLOBAL_BATCH, shuffle=False)
    trainer = VSRRefineNetTrainer(
        device="cpu",
        train_dataloader=loader,
        valid_dataloader=loader,
        net=RefineNet(**CFG),
        loss_fns=[L.L1Loss()],
        optimizer=Optimizer("Adam", lr=1e-3),
        num_epochs=1,
        mesh=make_mesh(spatial_parallel=args.spatial),
        seed_state=None,
    )
    if args.logdir:
        from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.config import (
            LOGGERS,
        )

        # every process constructs the logger (as main.py does); only the
        # lead writes inside _write_logs
        trainer.logger = LOGGERS.get("AcdcVSRLogger")(log_dir=args.logdir)

    train_log, train_batch, train_outputs = trainer._run_epoch("training")
    valid_log, valid_batch, valid_outputs = trainer._run_epoch("validation")
    if trainer.logger is not None:
        # the display outputs are sharded over the process-spanning data
        # axis (NOT fully addressable here) — the regression this guards:
        # a bare np.asarray in the logger path would raise
        assert not train_outputs.is_fully_addressable
        trainer._write_logs(
            train_log, train_batch, train_outputs,
            valid_log, valid_batch, valid_outputs,
        )
        trainer.logger.close()
        print("TB_OK", flush=True)
    print(f"LOSS {train_log['Loss']:.8f} {valid_log['Loss']:.8f}", flush=True)


if __name__ == "__main__":
    main()
