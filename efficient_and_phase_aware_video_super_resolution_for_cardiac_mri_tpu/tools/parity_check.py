"""Cross-framework parity harness (the BASELINE.md ≤0.05 dB contract checker).

Given a reference RefineNet ``.pth`` checkpoint and a preprocessed data tree,
runs the SAME sequences through (a) this framework's jitted model and (b) the
dynamically-loaded PyTorch reference model, computes PSNR/SSIM of each against
the HR ground truth with this framework's metrics, and reports the deltas.

The PyTorch reference *framework* (datasets/predictors) needs nibabel and
cannot run in this image — but its MODEL is pure torch, so the comparison
runs both models on identically-prepared inputs from our data pipeline.

Usage:
    python -m <pkg>.tools.parity_check CKPT.pth DATA_DIR POS_CODE.pkl \
        [--factor 4] [--split test] [--max-items N] [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from .. import data as _data  # noqa: F401  (populates the dataset registry)
from ..config import DATASETS
from ..metrics import PSNR, SSIM
from ..models import RefineNet
from ..utils.stats import denormalize
from ..utils.torch_import import load_torch_checkpoint, variables_from_torch_state_dict

NET_KWARGS = dict(
    in_channels=1,
    out_channels=1,
    num_features=[64, 64, 64],
    upscale_factor=4,
    num_stages=3,
    update_memory=True,
    num_updated_frames=6,
    refine_window_size=5,
    positional_encoding=True,
)


def load_reference_model(reference_root: Path, net_kwargs: dict):
    """Reference RefineNet, loaded file-by-file (its package __init__ needs
    nibabel), with the hardcoded .cuda() patched for CPU."""
    import importlib.util
    import types

    import torch

    def load_mod(rel, name):
        for i in range(1, len(name.split("."))):
            pkg = ".".join(name.split(".")[:i])
            if pkg not in sys.modules:
                mod = types.ModuleType(pkg)
                mod.__path__ = []
                sys.modules[pkg] = mod
        spec = importlib.util.spec_from_file_location(name, reference_root / rel)
        module = importlib.util.module_from_spec(spec)
        sys.modules[name] = module
        spec.loader.exec_module(module)
        return module

    load_mod("src/model/nets/base_net.py", "src.model.nets.base_net")
    rn = load_mod("src/model/nets/refine_net.py", "src.model.nets.refine_net")

    def init_hidden(self, batch_size, height, width):
        return (
            torch.zeros(batch_size, self.hidden_dim, height, width),
            torch.zeros(batch_size, self.hidden_dim, height, width),
        )

    rn.ConvLSTMCell.init_hidden = init_hidden
    return rn.RefineNet(**net_kwargs)


def main(argv=None):
    parser = argparse.ArgumentParser(description="Reference-vs-TPU parity check.")
    parser.add_argument("checkpoint", type=Path, help="reference .pth checkpoint")
    parser.add_argument("data_dir", type=Path, help="preprocessed videos/ tree")
    parser.add_argument("pos_code_path", type=Path)
    parser.add_argument("--factor", type=int, default=4)
    parser.add_argument("--split", default="test")
    parser.add_argument("--max-items", type=int, default=8)
    parser.add_argument("--reference", type=Path, default=Path("/root/reference"))
    parser.add_argument("--net-kwargs", type=json.loads, default=None)
    args = parser.parse_args(argv)

    import jax
    import torch

    net_kwargs = args.net_kwargs or dict(NET_KWARGS, upscale_factor=args.factor)
    U = net_kwargs["num_updated_frames"]

    dataset = DATASETS.get("AcdcVSRRefineNetDataset")(
        data_dir=args.data_dir,
        type=args.split,
        downscale_factor=args.factor,
        transforms=[
            {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
            {"name": "ToTensor"},
        ],
        pos_code_path=str(args.pos_code_path),
        num_frames=7,
        num_updated_frames=U,
    )

    state = load_torch_checkpoint(args.checkpoint)
    variables = variables_from_torch_state_dict("RefineNet", state)
    model = RefineNet(**net_kwargs)

    ref = load_reference_model(args.reference, net_kwargs)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
        if not hasattr(next(iter(state.values())), "detach")
        else state
    )
    ref.eval()

    @jax.jit
    def forward(v, lr, pos):
        return model.apply(v, lr, pos)[-1]

    psnr, ssim = PSNR(), SSIM()
    rows = []
    for idx in range(min(len(dataset), args.max_items)):
        item = dataset[idx]
        lr = item["lr_imgs"][None]  # (1, T, H, W, 1)
        hr = item["hr_imgs"][None]
        pos = item["pos_code"][None]

        ours = np.asarray(forward(variables, lr, pos))

        t_inputs = [
            torch.from_numpy(lr[:, t].transpose(0, 3, 1, 2)).contiguous()
            for t in range(lr.shape[1])
        ]
        with torch.no_grad():
            theirs_list = ref(t_inputs, torch.from_numpy(pos))[-1]
        theirs = np.stack([o.numpy() for o in theirs_list], axis=1).transpose(0, 1, 3, 4, 2)

        hr_d = np.asarray(denormalize(hr, "acdc"))
        ours_d = np.asarray(denormalize(ours, "acdc"))
        theirs_d = np.asarray(denormalize(theirs, "acdc"))
        row = {
            "item": idx,
            "psnr_ours": float(np.mean([float(psnr(ours_d[:, t], hr_d[:, t])) for t in range(hr.shape[1])])),
            "psnr_ref": float(np.mean([float(psnr(theirs_d[:, t], hr_d[:, t])) for t in range(hr.shape[1])])),
            "ssim_ours": float(np.mean([float(ssim(ours_d[:, t], hr_d[:, t])) for t in range(hr.shape[1])])),
            "ssim_ref": float(np.mean([float(ssim(theirs_d[:, t], hr_d[:, t])) for t in range(hr.shape[1])])),
            "max_abs_output_diff": float(np.abs(ours_d - theirs_d).max()),
        }
        row["psnr_delta"] = row["psnr_ours"] - row["psnr_ref"]
        row["ssim_delta"] = row["ssim_ours"] - row["ssim_ref"]
        rows.append(row)

    deltas = [abs(r["psnr_delta"]) for r in rows]
    summary = {
        "items": len(rows),
        "max_abs_psnr_delta_db": max(deltas) if deltas else None,
        "mean_psnr_ours": float(np.mean([r["psnr_ours"] for r in rows])),
        "mean_psnr_ref": float(np.mean([r["psnr_ref"] for r in rows])),
        "contract_0p05db": bool(deltas and max(deltas) <= 0.05),
        "rows": rows,
    }
    print(json.dumps(summary, indent=1))
    return summary


if __name__ == "__main__":
    main()
