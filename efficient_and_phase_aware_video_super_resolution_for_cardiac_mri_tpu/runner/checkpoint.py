"""Checkpoint save/restore.

Single-file checkpoints carrying {net params, optimizer state, lr-scheduler
state, monitor state, epoch, RNG state} — the reference's ``torch.save`` dict
contract (``base_trainer.py:224-252``) realized as numpy pytree pickles.
Files keep the reference's ``model_{epoch}.pth`` / ``model_best.pth`` names so
the shipped test configs' ``loaded_path`` entries work unchanged.

``load_net_params`` additionally accepts genuine PyTorch ``.pth`` checkpoints
(converted through ``utils.torch_import``), so nets trained with the
reference can be evaluated on TPU directly.
"""
from __future__ import annotations

import pickle
from pathlib import Path

import jax
import numpy as np


def _to_numpy(tree):
    def to_host(x):
        if not getattr(x, "is_fully_addressable", True) and not getattr(
            x, "is_fully_replicated", False
        ):
            # multihost + model-sharded params: this process holds only its
            # shards, so np.asarray would raise.  Reshard to replicated (one
            # all-gather) via a jitted identity, then fetch.
            from jax.sharding import NamedSharding, PartitionSpec

            repl = NamedSharding(x.sharding.mesh, PartitionSpec())
            x = jax.jit(lambda a: a, out_shardings=repl)(x)
        return np.asarray(x)

    return jax.tree.map(to_host, tree)


def save_checkpoint(path, *, params, model_state=None, opt_state=None,
                    lr_scheduler_state=None, monitor_state=None, epoch=None,
                    seed_state=None, backend: str = "pickle") -> None:
    payload = {
        "format": "evsr_tpu.v1",
        "net": _to_numpy(params),
        "model_state": _to_numpy(model_state) if model_state else None,
        "optimizer": _to_numpy(opt_state) if opt_state is not None else None,
        "lr_scheduler": lr_scheduler_state,
        "monitor": monitor_state,
        "epoch": epoch,
        "seed_state": seed_state,
    }
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if backend == "orbax":
        _save_orbax(path, payload)
        return
    if backend == "orbax_async":
        _save_orbax(path, payload, asynchronous=True)
        return
    if jax.process_count() > 1 and jax.process_index() != 0:
        # pickle backend on shared storage: one writer, or the processes
        # corrupt the file racing each other (orbax backends coordinate)
        return
    if path.is_dir():
        # same path previously written by an orbax backend (resume with a
        # different checkpoint_backend): os.replace(file, dir) would raise
        import shutil

        wait_for_async_saves()
        shutil.rmtree(path)
    # write-then-rename so a crash mid-dump never leaves a truncated file
    # that auto-resume would pick as the newest checkpoint (the atomic-rename
    # commit the orbax path gets from its arrays tree)
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
    import os

    os.replace(tmp, path)


_async_checkpointer = None


def _get_async_checkpointer():
    """Process-wide AsyncCheckpointer (orbax serializes arrays to host then
    writes on a background thread — the device never waits on disk; on
    multihost, orbax coordinates the barrier across processes)."""
    global _async_checkpointer
    if _async_checkpointer is None:
        import orbax.checkpoint as ocp

        _async_checkpointer = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_checkpointer


def wait_for_async_saves() -> None:
    """Block until every in-flight async checkpoint write has committed.

    No-op when no async save was issued — callers (trainer exit, process
    teardown, pre-overwrite) can call it unconditionally."""
    if _async_checkpointer is not None:
        _async_checkpointer.wait_until_finished()


def _save_orbax(path: Path, payload: dict, asynchronous: bool = False) -> None:
    """Orbax backend: array pytrees via StandardCheckpointer (async-capable,
    multihost-aware), non-array run state as a pickled sidecar.

    ``asynchronous=True`` returns as soon as the arrays are staged on host;
    the disk write happens on orbax's background thread (the train loop keeps
    stepping).  ``wait_for_async_saves`` is the commit barrier."""
    import shutil

    import orbax.checkpoint as ocp

    path = Path(path)
    is_lead = jax.process_index() == 0
    if path.exists():
        # an in-flight async write to this same path must finish before the
        # directory is replaced out from under it
        wait_for_async_saves()
        if is_lead:
            if path.is_dir():
                shutil.rmtree(path, ignore_errors=True)
            else:
                # same path previously written by the pickle backend (resume
                # with a different checkpoint_backend): a FILE here would make
                # the mkdir below raise FileExistsError
                path.unlink(missing_ok=True)
    if jax.process_count() > 1:
        # the lead's rmtree must land before any process writes arrays, and
        # every host must enter the (coordinated) orbax save together
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("evsr_ckpt_dir_ready")
    arrays = {
        "net": payload["net"],
        "optimizer": payload["optimizer"],
        "model_state": payload["model_state"] or {},
    }
    # the tiny meta sidecar is written up front (lead process only on
    # multihost); a checkpoint counts as COMMITTED only once the ``arrays``
    # tree has been atomically renamed into place — find_latest_checkpoint /
    # load_checkpoint require BOTH, so a crash mid async write leaves a
    # half-checkpoint that resume skips rather than a corrupt 'newest'
    if is_lead:
        path.mkdir(parents=True, exist_ok=True)
        meta = {k: payload[k] for k in ("format", "lr_scheduler", "monitor", "epoch", "seed_state")}
        with open(path / "meta.pkl", "wb") as f:
            pickle.dump(meta, f)
    if asynchronous:
        _get_async_checkpointer().save(path.resolve() / "arrays", args=ocp.args.StandardSave(arrays))
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.resolve() / "arrays", arrays)


def _load_orbax(path: Path) -> dict:
    import orbax.checkpoint as ocp

    wait_for_async_saves()  # commit barrier: the arrays may still be writing
    with open(path / "meta.pkl", "rb") as f:
        payload = pickle.load(f)
    with ocp.StandardCheckpointer() as ckptr:
        arrays = ckptr.restore(path.resolve() / "arrays")
    payload.update(
        net=arrays["net"],
        optimizer=arrays["optimizer"],
        model_state=arrays["model_state"] or None,
    )
    return payload


def coerce_like(target, restored):
    """Rebuild ``restored`` with ``target``'s container types.

    Orbax's ``StandardCheckpointer.restore`` without a target degrades optax
    namedtuple states to plain dicts and tuples to lists, so a resumed
    trainer would crash on ``opt_state.hyperparams`` at its first step.
    Values come from ``restored``; structure (namedtuple/tuple/dict classes)
    from ``target``.  A no-op when the types already match (pickle backend).
    """
    if restored is None and target is not None:
        # orbax stores leafless containers (EmptyState, empty dicts/tuples)
        # as None; the freshly-built target IS that empty structure
        return target
    if isinstance(target, dict):
        return {k: coerce_like(v, restored[k]) for k, v in target.items()}
    if hasattr(target, "_fields"):  # namedtuple (optax states)
        if isinstance(restored, dict):
            vals = [restored[f] for f in target._fields]
        else:
            vals = list(restored)
        return type(target)(
            *(coerce_like(getattr(target, f), v) for f, v in zip(target._fields, vals))
        )
    if isinstance(target, (list, tuple)):
        if isinstance(restored, dict):  # tuples sometimes restore as {'0': ...}
            restored = [restored[str(i)] for i in range(len(target))]
        return type(target)(coerce_like(t, r) for t, r in zip(target, restored))
    return restored


def _is_torch_zipfile(path: Path) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK"  # torch>=1.6 zip serialization


def load_checkpoint(path) -> dict:
    path = Path(path)
    if path.is_dir() and (path / "meta.pkl").exists():
        if not (path / "arrays").exists():
            # async save died between the meta sidecar and the atomic array
            # commit; surface it clearly instead of a deep orbax error
            raise FileNotFoundError(
                f"{path} is a half-written orbax checkpoint (meta.pkl present "
                "but the arrays tree never committed); use an older checkpoint "
                "— 'loaded_path: auto' skips these automatically."
            )
        return _load_orbax(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def load_net_variables(path, model_name: str | None = None) -> dict:
    """Load net variables ({'params': ..., maybe 'batch_stats': ...}) from
    either our checkpoint or a genuine PyTorch reference ``.pth``."""
    path = Path(path)
    if path.is_file() and _is_torch_zipfile(path):
        from ..utils.torch_import import load_torch_checkpoint, variables_from_torch_state_dict

        if model_name is None:
            raise ValueError("model_name is required to import a torch checkpoint.")
        state = load_torch_checkpoint(path)
        return variables_from_torch_state_dict(model_name, state)
    ckpt = load_checkpoint(path)
    variables = {"params": ckpt["net"]}
    if ckpt.get("model_state"):
        variables.update(ckpt["model_state"])
    return variables


def load_net_params(path, model_name: str | None = None) -> dict:
    return load_net_variables(path, model_name)["params"]


def _is_committed(p: Path) -> bool:
    """A directory checkpoint (orbax) is committed only once BOTH the meta
    sidecar and the atomically-renamed ``arrays`` tree exist — with
    ``orbax_async`` the meta is written up front and the array commit
    happens on the background thread, so a crash in between leaves a
    half-checkpoint that resume must skip."""
    if p.is_dir():
        return (p / "meta.pkl").exists() and (p / "arrays").exists()
    return p.is_file()


def _peek_epoch(p: Path):
    """Stored epoch of a checkpoint, reading as little as possible (meta.pkl
    for orbax dirs; the pickle header requires a full load — resume-time
    only).  None if unreadable."""
    try:
        if p.is_dir():
            with open(p / "meta.pkl", "rb") as f:
                return pickle.load(f).get("epoch")
        with open(p, "rb") as f:
            return pickle.load(f).get("epoch")
    except Exception:
        return None


def find_latest_checkpoint(checkpoints_dir) -> Path | None:
    """Newest checkpoint for auto-resume (``loaded_path: 'auto'``): the
    highest-epoch ``model_{N}.pth``, unless the SIGTERM
    ``model_preempted.pth`` records an equal-or-later epoch (it is written
    after any periodic save and can be up to saved_freq−1 epochs ahead;
    epoch numbers — not mtimes — order checkpoints, so copied/restored
    trees and coarse filesystem timestamps cannot demote the true newest).
    Half-written orbax directories (meta without committed arrays) are
    skipped.  Falls back to ``model_best.pth``."""
    d = Path(checkpoints_dir)
    if not d.is_dir():
        return None
    numbered = []
    for p in d.glob("model_*.pth"):
        stem = p.name[len("model_"):-len(".pth")]
        if stem.isdigit() and _is_committed(p):
            numbered.append((int(stem), p))
    newest_epoch, newest = max(numbered) if numbered else (None, None)
    preempted = d / "model_preempted.pth"
    if _is_committed(preempted):
        pre_epoch = _peek_epoch(preempted)
        if newest is None or (pre_epoch is not None and pre_epoch >= newest_epoch):
            return preempted
    if newest is not None:
        return newest
    best = d / "model_best.pth"
    return best if _is_committed(best) else None
