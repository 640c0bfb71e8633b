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
    with open(path, "wb") as f:
        pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)


def _save_orbax(path: Path, payload: dict) -> None:
    """Orbax backend: array pytrees via StandardCheckpointer (async-capable,
    multihost-aware), non-array run state as a pickled sidecar."""
    import shutil

    import orbax.checkpoint as ocp

    path = Path(path)
    if path.exists():
        shutil.rmtree(path, ignore_errors=True)
    arrays = {
        "net": payload["net"],
        "optimizer": payload["optimizer"],
        "model_state": payload["model_state"] or {},
    }
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path.resolve() / "arrays", arrays)
    meta = {k: payload[k] for k in ("format", "lr_scheduler", "monitor", "epoch", "seed_state")}
    with open(path / "meta.pkl", "wb") as f:
        pickle.dump(meta, f)


def _load_orbax(path: Path) -> dict:
    import orbax.checkpoint as ocp

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
    """Newest checkpoint for auto-resume (``loaded_path: 'auto'``): prefers
    the highest-epoch ``model_{N}.pth``, falls back to ``model_best.pth``."""
    d = Path(checkpoints_dir)
    if not d.is_dir():
        return None
    numbered = []
    for p in d.glob("model_*.pth"):
        stem = p.name[len("model_"):-len(".pth")]
        if stem.isdigit():
            numbered.append((int(stem), p))
    if numbered:
        return max(numbered)[1]
    best = d / "model_best.pth"
    return best if best.exists() else None
