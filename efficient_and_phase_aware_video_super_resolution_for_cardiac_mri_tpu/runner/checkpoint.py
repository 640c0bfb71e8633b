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
    return jax.tree.map(lambda x: np.asarray(x), tree)


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
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


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
    if path.exists():
        # an in-flight async write to this same path must finish before the
        # directory is replaced out from under it
        wait_for_async_saves()
        shutil.rmtree(path, ignore_errors=True)
    arrays = {
        "net": payload["net"],
        "optimizer": payload["optimizer"],
        "model_state": payload["model_state"] or {},
    }
    # the tiny meta sidecar is written synchronously FIRST: load_checkpoint
    # keys on meta.pkl, and an async-save reader races only the array commit
    # (which wait_for_async_saves fences), never the directory marker
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


def _is_torch_zipfile(path: Path) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK"  # torch>=1.6 zip serialization


def load_checkpoint(path) -> dict:
    path = Path(path)
    if path.is_dir() and (path / "meta.pkl").exists():
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


def find_latest_checkpoint(checkpoints_dir) -> Path | None:
    """Newest checkpoint for auto-resume (``loaded_path: 'auto'``): the most
    recently written of the periodic ``model_{N}.pth`` saves and the SIGTERM
    ``model_preempted.pth`` (which can be up to saved_freq−1 epochs newer
    than any numbered save — epochs are written in order, so mtime ranks
    them); falls back to ``model_best.pth``."""
    d = Path(checkpoints_dir)
    if not d.is_dir():
        return None
    candidates = []
    for p in d.glob("model_*.pth"):
        stem = p.name[len("model_"):-len(".pth")]
        if stem.isdigit() or stem == "preempted":
            candidates.append((p.stat().st_mtime, p))
    if candidates:
        return max(candidates)[1]
    best = d / "model_best.pth"
    return best if best.exists() else None
