"""Export flax RefineNet params to a PyTorch-reference-loadable checkpoint.

The inverse of :mod:`.torch_import` for the flagship model: nets trained on
TPU can be re-evaluated (or fine-tuned) with the original PyTorch stack —
the strongest cross-framework validation path.

The reference's state_dict also contains the refine-block PReLU it registers
but never calls (SURVEY.md §5 quirk 3); a fresh init-value tensor is emitted
for it so ``load_state_dict(strict=True)`` succeeds.
"""
from __future__ import annotations

import numpy as np


def _w(x) -> np.ndarray:  # HWIO → OIHW
    return np.ascontiguousarray(np.asarray(x).transpose(3, 2, 0, 1))


def refine_net_state_dict(params: dict) -> dict[str, np.ndarray]:
    """flax ``params`` tree → reference RefineNet state_dict (numpy values)."""
    sd: dict[str, np.ndarray] = {}
    sd["in_block.conv.weight"] = _w(params["in_block"]["conv"]["kernel"])
    sd["in_block.conv.bias"] = np.asarray(params["in_block"]["conv"]["bias"])
    sd["in_block.prelu.weight"] = np.asarray(params["in_block"]["prelu"]["weight"])
    for direction in ("forward", "backward"):
        cells = params[f"{direction}_lstm_block"]["cells"]
        for name, cell in cells.items():
            idx = name.replace("cell", "")
            sd[f"{direction}_lstm_block.cell_list.{idx}.conv.weight"] = _w(cell["kernel"])
            sd[f"{direction}_lstm_block.cell_list.{idx}.conv.bias"] = np.asarray(cell["bias"])
    rb = params["refine_block"]
    for conv_name, conv in rb.items():
        sd[f"refine_block.body.{conv_name}.weight"] = _w(conv["kernel"])
        sd[f"refine_block.body.{conv_name}.bias"] = np.asarray(conv["bias"])
    sd["refine_block.prelu.weight"] = np.full((1,), 0.2, np.float32)  # dead param (quirk 3)
    for conv_name, conv in params["out_block"].items():
        sd[f"out_block.{conv_name}.weight"] = _w(conv["kernel"])
        sd[f"out_block.{conv_name}.bias"] = np.asarray(conv["bias"])
    return sd


def save_torch_checkpoint(params: dict, path, model_name: str = "RefineNet") -> None:
    """Write a reference-compatible ``torch.save({'net': state_dict})`` file."""
    import torch

    if model_name != "RefineNet":
        raise NotImplementedError(f"torch export implemented for RefineNet, got {model_name}.")
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in refine_net_state_dict(params).items()}
    torch.save({"net": sd}, path)
