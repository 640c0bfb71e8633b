"""Import PyTorch reference checkpoints into flax parameter pytrees.

The parity contract (BASELINE.md: PSNR within 0.05 dB of the reference)
requires loading reference ``.pth`` weights into the TPU models.  Weights are
converted purely by layout:

* conv weight  OIHW → HWIO (transpose 2,3,1,0)
* PReLU weight (1,)  → unchanged
* linear weight (out,in) → (in,out)

Each model family registers a key-mapping from torch ``state_dict`` paths to
flax param paths.  Unmapped torch keys that are *known dead* (e.g. the
RefineNet refine-block PReLU that the reference registers but never calls —
SURVEY.md §5 quirk 3) are skipped explicitly.
"""
from __future__ import annotations

import re
from typing import Callable, Mapping

import numpy as np


def _conv_w(t) -> np.ndarray:
    return np.asarray(t).transpose(2, 3, 1, 0)


def _as_np(t) -> np.ndarray:
    return np.asarray(t)


def _set(tree: dict, path: tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def state_dict_to_numpy(state_dict: Mapping) -> dict[str, np.ndarray]:
    """Detach a torch state_dict to plain numpy (torch optional elsewhere)."""
    out = {}
    for k, v in state_dict.items():
        out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
    return out


def refine_net_key_map(torch_key: str) -> tuple[tuple[str, ...], Callable] | None:
    """torch state_dict key → (flax path, converter) for RefineNet.

    Reference module tree: ``refine_net.py:36-59`` (in_block, forward/backward
    _ConvLSTM with cell_list, _RefineBlock body, _OutBlock).
    Returns None for keys to skip (the dead refine-block PReLU).
    """
    k = torch_key
    m = re.fullmatch(r"in_block\.conv\.(weight|bias)", k)
    if m:
        return ("in_block", "conv", "kernel" if m[1] == "weight" else "bias"), (
            _conv_w if m[1] == "weight" else _as_np
        )
    if k == "in_block.prelu.weight":
        return ("in_block", "prelu", "weight"), _as_np
    m = re.fullmatch(r"(forward|backward)_lstm_block\.cell_list\.(\d+)\.conv\.(weight|bias)", k)
    if m:
        return (
            f"{m[1]}_lstm_block",
            "cells",
            f"cell{m[2]}",
            "kernel" if m[3] == "weight" else "bias",
        ), (_conv_w if m[3] == "weight" else _as_np)
    m = re.fullmatch(r"refine_block\.body\.(conv\d)\.(weight|bias)", k)
    if m:
        return ("refine_block", m[1], "kernel" if m[2] == "weight" else "bias"), (
            _conv_w if m[2] == "weight" else _as_np
        )
    if k == "refine_block.prelu.weight":
        return None  # registered but never used in forward (quirk 3)
    m = re.fullmatch(r"out_block\.(conv\d)\.(weight|bias)", k)
    if m:
        return ("out_block", m[1], "kernel" if m[2] == "weight" else "bias"), (
            _conv_w if m[2] == "weight" else _as_np
        )
    raise KeyError(f"Unmapped RefineNet torch key: {k}")


MODEL_KEY_MAPS = {
    "RefineNet": refine_net_key_map,
}


def params_from_torch_state_dict(model_name: str, state_dict: Mapping) -> dict:
    """Build the flax ``params`` tree for ``model_name`` from a torch state_dict."""
    key_map = MODEL_KEY_MAPS.get(model_name)
    if key_map is None:
        raise KeyError(f"No torch key map registered for model {model_name!r}.")
    arrays = state_dict_to_numpy(state_dict)
    params: dict = {}
    for k, v in arrays.items():
        mapped = key_map(k)
        if mapped is None:
            continue
        path, convert = mapped
        _set(params, path, convert(v))
    return params


def load_torch_checkpoint(path) -> dict[str, np.ndarray]:
    """Load a reference ``.pth`` checkpoint's net state_dict as numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    return state_dict_to_numpy(state)
