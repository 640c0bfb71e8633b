"""Cross-framework parity harness (the BASELINE.md ≤0.05 dB contract checker).

Given a reference ``.pth`` checkpoint for ANY zoo net and a preprocessed data
tree, runs the SAME items through (a) this framework's jitted model and (b)
the dynamically-loaded PyTorch reference model, computes PSNR/SSIM of each
against the HR ground truth with this framework's metrics, and reports the
deltas.

The PyTorch reference *framework* (datasets/predictors) needs nibabel and
cannot run in this image — but its MODELs are pure torch, so the comparison
runs both models on identically-prepared inputs from our data pipeline.
(EDVRNet additionally needs the CUDA DCN extension; the harness substitutes
the brute-force torch oracle from ``tests/dcn_oracle.py`` when available.)

Usage:
    python -m <pkg>.tools.parity_check CKPT.pth DATA_DIR [POS_CODE.pkl] \
        [--net RefineNet] [--factor 4] [--split test] [--max-items N] \
        [--net-kwargs JSON] [--reference /root/reference]
"""
from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

from .. import data as _data  # noqa: F401  (populates the dataset registry)
from .. import models as M
from ..config import DATASETS
from ..metrics import PSNR, SSIM
from ..utils.stats import denormalize
from ..utils.torch_import import load_torch_checkpoint, variables_from_torch_state_dict

# net name → (reference module relpath, workload, default factor-dependent
# kwargs come from gen_configs._families)
REF_MODULES = {
    "RefineNet": "src/model/nets/refine_net.py",
    "EDSRNet": "src/model/nets/edsr_net.py",
    "SRFBNet": "src/model/nets/srfb_net.py",
    "DRFSISRNet": "src/model/nets/drf_sisr_net.py",
    "DRFNet": "src/model/nets/drf_net.py",
    "DUFNet": "src/model/nets/duf_net.py",
    "TOFlowNet": "src/model/nets/toflow_net.py",
    "RBPNet": "src/model/nets/rbp_net.py",
    "FRVSRNet": "src/model/nets/frvsr_net.py",
    "EDVRNet": "src/model/nets/edvr_net/EDVR_arch.py",
}

NET_TO_FAMILY = {
    "RefineNet": "refine_net",
    "EDSRNet": "edsr_net",
    "SRFBNet": "srfb_net",
    "DRFSISRNet": "srfb_net",  # same workload/protocol family
    "DRFNet": "drf_net",
    "DUFNet": "duf_net",
    "TOFlowNet": "toflow_net",
    "RBPNet": "rbp_net",
    "FRVSRNet": "frvsr_net",
    "EDVRNet": "edvr_net",
}

# nets whose flax apply takes train=... (BatchNorm running stats)
_NEEDS_TRAIN_FLAG = {"TOFlowNet", "DUFNet"}


def _reference_loader(reference_root: Path):
    """The single dynamic-loader implementation lives in
    tests/reference_loader.py (sys.modules shimming + CPU patches); this is a
    developer tool of this repo, so the tests dir is resolvable from here."""
    tests_dir = Path(__file__).resolve().parents[2] / "tests"
    if str(tests_dir) not in sys.path:
        sys.path.insert(0, str(tests_dir))
    try:
        import reference_loader
    except ImportError as e:  # pragma: no cover - repo layout required
        raise SystemExit(
            "parity_check needs tests/reference_loader.py from the repo checkout."
        ) from e
    reference_loader.REFERENCE_ROOT = Path(reference_root)
    return reference_loader


def load_reference_model(reference_root: Path, net_name: str, net_kwargs: dict):
    """Load the reference net class file-by-file (the reference package
    ``__init__`` chain needs nibabel) with CPU patches where required —
    all via tests/reference_loader.py (one loader implementation)."""
    rl = _reference_loader(reference_root)
    if net_name == "RefineNet":
        mod = rl.load_reference_refine_net()  # patches the hardcoded .cuda()
    elif net_name == "EDVRNet":
        mod = rl.load_reference_edvr()  # stubs the CUDA dcn with the oracle
    else:
        rl.load_reference_module("src/model/nets/base_net.py", "src.model.nets.base_net")
        stem = Path(REF_MODULES[net_name]).stem
        mod = rl.load_reference_module(REF_MODULES[net_name], f"src.model.nets.{stem}")
    return getattr(mod, net_name)(**net_kwargs)


def _default_net_kwargs(net_name: str, factor: int) -> dict:
    from .gen_configs import _families

    fam = _families(factor)[NET_TO_FAMILY[net_name]]
    kwargs = dict(fam["net"][1])
    if net_name == "DRFSISRNet":  # srfb family entry names SRFBNet
        kwargs = {"in_channels": 1, "out_channels": 1, "num_steps": 4,
                  "num_features": 32, "num_groups": 6, "upscale_factor": factor}
    return kwargs


def _build_dataset(net_name: str, args, net_kwargs: dict):
    from .gen_configs import _families

    workload = _families(args.factor)[NET_TO_FAMILY[net_name]]["workload"]
    transforms = [
        {"name": "Normalize", "kwargs": {"means": [54.089], "stds": [48.084]}},
        {"name": "ToTensor"},
    ]
    common = dict(
        data_dir=args.data_dir, type=args.split,
        downscale_factor=args.factor, transforms=transforms,
    )
    if workload in ("SISR", "SISRSRFB"):
        return DATASETS.get("AcdcSISRDataset")(**common), workload
    num_frames = int(net_kwargs.get("num_frames", net_kwargs.get("nframes", 7)))
    if workload == "MISR":
        return DATASETS.get("AcdcMISRDataset")(num_frames=num_frames, **common), workload
    if workload in ("VSR", "FRVSR"):
        return DATASETS.get("AcdcVSRDataset")(num_frames=num_frames, **common), workload
    if workload == "VSRRefineNet":
        if not args.pos_code_path:
            raise SystemExit("RefineNet parity needs POS_CODE.pkl.")
        return (
            DATASETS.get("AcdcVSRRefineNetDataset")(
                pos_code_path=str(args.pos_code_path),
                num_frames=num_frames,
                num_updated_frames=net_kwargs["num_updated_frames"],
                **common,
            ),
            workload,
        )
    raise SystemExit(f"Unknown workload {workload!r} for net {net_name!r}.")


def _run_ours(net_name: str, model, variables, item, workload, tel_acc=None):
    import jax

    from ..ops import telemetry

    kwargs = {"train": False} if net_name in _NEEDS_TRAIN_FLAG else {}

    @jax.jit
    def forward(v, *inputs):
        # collect windowed-knob exceedance telemetry alongside the output
        # (empty/free for nets without max_flow/dcn_max_offset) — the
        # parity run is exactly where an out-of-window bound shows up as a
        # PSNR delta, so the cause ships with the contract number
        out, tel_vars = model.apply(v, *inputs, **kwargs, mutable=["telemetry"])
        if net_name in ("SRFBNet", "DRFSISRNet", "RefineNet"):
            out = out[-1]
        elif net_name == "FRVSRNet":
            out = out[0]
        return out, dict(tel_vars.get("telemetry", {}))

    if workload in ("SISR", "SISRSRFB"):
        out, tel = forward(variables, item["lr_img"][None])
    elif workload == "VSRRefineNet":
        out, tel = forward(variables, item["lr_imgs"][None], item["pos_code"][None])
    else:
        out, tel = forward(variables, item["lr_imgs"][None])
    if tel_acc is not None and tel:
        telemetry.merge_summaries(tel_acc, telemetry.summarize(tel))
    return np.asarray(out)


def _run_reference(net_name: str, ref, item, workload):
    import torch

    def frames(arr):  # (T, H, W, C) → list of (1, C, H, W)
        return [
            torch.from_numpy(arr[t].transpose(2, 0, 1))[None].contiguous()
            for t in range(arr.shape[0])
        ]

    with torch.no_grad():
        if workload in ("SISR", "SISRSRFB"):
            out = ref(torch.from_numpy(item["lr_img"].transpose(2, 0, 1))[None])
            if workload == "SISRSRFB":
                out = out[-1]
            return out.numpy().transpose(0, 2, 3, 1)
        if workload == "VSRRefineNet":
            outs = ref(frames(item["lr_imgs"]), torch.from_numpy(item["pos_code"][None]))[-1]
            return np.stack([o.numpy() for o in outs], 1).transpose(0, 1, 3, 4, 2)
        outs = ref(frames(item["lr_imgs"]))
        if net_name == "FRVSRNet":
            outs = outs[0]
        if net_name in ("DRFNet", "FRVSRNet"):  # per-frame list
            return np.stack([o.numpy() for o in outs], 1).transpose(0, 1, 3, 4, 2)
        return outs.numpy().transpose(0, 2, 3, 1)  # MISR single frame


def main(argv=None):
    parser = argparse.ArgumentParser(description="Reference-vs-TPU parity check.")
    parser.add_argument("checkpoint", type=Path, help="reference .pth checkpoint")
    parser.add_argument("data_dir", type=Path, help="preprocessed videos/ or imgs/ tree")
    parser.add_argument("pos_code_path", type=Path, nargs="?", default=None)
    parser.add_argument("--net", default="RefineNet", choices=sorted(REF_MODULES))
    parser.add_argument("--factor", type=int, default=4)
    parser.add_argument("--split", default="test")
    parser.add_argument("--max-items", type=int, default=8)
    parser.add_argument("--reference", type=Path, default=Path("/root/reference"))
    parser.add_argument("--net-kwargs", type=json.loads, default=None)
    args = parser.parse_args(argv)

    import torch

    net_name = args.net
    net_kwargs = args.net_kwargs or _default_net_kwargs(net_name, args.factor)
    dataset, workload = _build_dataset(net_name, args, net_kwargs)

    state = load_torch_checkpoint(args.checkpoint)
    variables = variables_from_torch_state_dict(net_name, state)
    model = getattr(M, net_name)(**net_kwargs)

    # TPU-extension kwargs (windowed warps/DCN) apply to OUR net only — the
    # reference constructor has no such knobs.  Passing e.g.
    # --net-kwargs '{..., "max_flow": 4}' therefore checks the WINDOWED
    # variant against the exact reference: the 0.05 dB contract then
    # empirically validates the bound on the given data.
    ref_kwargs = {
        k: v for k, v in net_kwargs.items()
        if k not in ("max_flow", "dcn_max_offset")
    }
    ref = load_reference_model(args.reference, net_name, ref_kwargs)
    ref.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in state.items()}
        if not hasattr(next(iter(state.values())), "detach")
        else state
    )
    ref.eval()

    psnr, ssim = PSNR(), SSIM()
    rows = []
    tel_acc: dict = {}
    for idx in range(min(len(dataset), args.max_items)):
        item = dataset[idx]
        hr = item["hr_imgs" if "hr_imgs" in item else "hr_img"][None]
        ours = _run_ours(net_name, model, variables, item, workload, tel_acc)
        theirs = _run_reference(net_name, ref, item, workload)

        hr_d = np.asarray(denormalize(hr, "acdc"))
        ours_d = np.asarray(denormalize(ours, "acdc"))
        theirs_d = np.asarray(denormalize(theirs, "acdc"))
        if hr_d.ndim == 5:  # per-frame protocol (VSR families)
            T = hr_d.shape[1]
            p_ours = float(np.mean([float(psnr(ours_d[:, t], hr_d[:, t])) for t in range(T)]))
            p_ref = float(np.mean([float(psnr(theirs_d[:, t], hr_d[:, t])) for t in range(T)]))
            s_ours = float(np.mean([float(ssim(ours_d[:, t], hr_d[:, t])) for t in range(T)]))
            s_ref = float(np.mean([float(ssim(theirs_d[:, t], hr_d[:, t])) for t in range(T)]))
        else:
            p_ours, p_ref = float(psnr(ours_d, hr_d)), float(psnr(theirs_d, hr_d))
            s_ours, s_ref = float(ssim(ours_d, hr_d)), float(ssim(theirs_d, hr_d))
        rows.append(
            {
                "item": idx,
                "psnr_ours": p_ours,
                "psnr_ref": p_ref,
                "ssim_ours": s_ours,
                "ssim_ref": s_ref,
                "psnr_delta": p_ours - p_ref,
                "ssim_delta": s_ours - s_ref,
                "max_abs_output_diff": float(np.abs(ours_d - theirs_d).max()),
            }
        )

    deltas = [abs(r["psnr_delta"]) for r in rows]
    summary = {
        "net": net_name,
        "items": len(rows),
        "max_abs_psnr_delta_db": max(deltas) if deltas else None,
        "mean_psnr_ours": float(np.mean([r["psnr_ours"] for r in rows])),
        "mean_psnr_ref": float(np.mean([r["psnr_ref"] for r in rows])),
        "contract_0p05db": bool(deltas and max(deltas) <= 0.05),
        "rows": rows,
    }
    if tel_acc:
        from ..ops import telemetry

        # the measured bound-validity of the windowed knobs on THIS data —
        # a nonzero frac_out explains (and caps) the PSNR delta
        summary["windowed_telemetry"] = tel_acc
        telemetry.check(tel_acc, warn_frac=0.0, context=f"parity_check --net {net_name}")
    print(json.dumps(summary, indent=1))
    return summary


if __name__ == "__main__":
    main()
