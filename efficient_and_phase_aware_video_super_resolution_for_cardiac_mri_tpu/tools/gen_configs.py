"""Generate the experiment config zoo under ``configs/``.

Reproduces the reference's experiment grid (``/root/reference/configs``:
7 model families × train/test × factors × ACDC + DSB15-external) with this
repo's data layout conventions.  Paths are rooted at ``--data-root`` (default
``./data``) so the whole zoo regenerates for any data location:

    python -m <pkg>.tools.gen_configs [--data-root ./data] [--out configs]

Train hyperparameters follow the reference configs (e.g. RefineNet x4: Adam
1e-4, L1, batch 16, 32×32 LR patches, 7+2·6 frames, 3 stages, 1000 epochs).
"""
from __future__ import annotations

import argparse
from pathlib import Path

import yaml

ACDC_STATS = {"means": [54.089], "stds": [48.084]}
FACTORS = (2, 3, 4)


def _transforms():
    return [
        {"name": "Normalize", "kwargs": dict(ACDC_STATS)},
        {"name": "ToTensor"},
    ]


def _augments(factor):
    return [
        {"name": "RandomHorizontalFlip"},
        {"name": "RandomVerticalFlip"},
        {"name": "RandomCropPatch", "kwargs": {"size": [32, 32], "ratio": factor}},
    ]


# (family, workload, net kwargs fn, train specifics)
def _families(factor):
    return {
        "edsr_net": dict(
            workload="SISR",
            net=("EDSRNet", {"in_channels": 1, "out_channels": 1, "num_resblocks": 32,
                             "num_features": 256, "upscale_factor": factor, "res_scale": 0.1}),
            losses=[{"name": "L1Loss", "weight": 1.0}],
            lr=1e-4, wd=0, batch=16, dataset_extra={},
        ),
        "srfb_net": dict(
            workload="SISRSRFB",
            net=("SRFBNet", {"in_channels": 1, "out_channels": 1, "num_steps": 4,
                             "num_features": 32, "num_groups": 6, "upscale_factor": factor}),
            losses=[{"name": "L1Loss", "weight": 1.0}],
            lr=1e-4, wd=0, batch=16, dataset_extra={},
        ),
        "duf_net": dict(
            workload="MISR",
            net=("DUFNet", {"in_channels": 1, "out_channels": 1, "num_frames": 7,
                            "size_filter": 5, "upscale_factor": factor,
                            "backbone": "_DenseLayer16"}),
            losses=[{"name": "HuberLoss", "kwargs": {"delta": 0.01}, "weight": 1.0}],
            lr=1e-3, wd=0, batch=12, dataset_extra={"num_frames": 7},
        ),
        "rbp_net": dict(
            workload="MISR",
            net=("RBPNet", {"in_channels": 1, "out_channels": 1, "base_filter": 256,
                            "feat": 64, "num_stages": 3, "num_resblocks": 5,
                            "num_frames": 7, "upscale_factor": factor}),
            losses=[{"name": "L1Loss", "weight": 1.0}],
            lr=1e-4, wd=0, batch=16, dataset_extra={"num_frames": 7},
        ),
        "toflow_net": dict(
            workload="MISR",
            net=("TOFlowNet", {"in_channels": 1, "out_channels": 1, "num_frames": 7,
                               "upscale_factor": factor}),
            losses=[{"name": "L1Loss", "weight": 1.0}],
            lr=1e-4, wd=1e-4, batch=16, dataset_extra={"num_frames": 7},
        ),
        "edvr_net": dict(
            workload="MISR",
            net=("EDVRNet", {"in_channels": 1, "out_channels": 1, "nf": 128, "nframes": 5,
                             "groups": 8, "front_RBs": 5, "back_RBs": 40}),
            losses=[{"name": "CharbonnierLoss", "kwargs": {"epsilon": 1e-6}, "weight": 1.0}],
            lr=4e-4, wd=0, batch=16, dataset_extra={"num_frames": 5}, factors=(4,),
        ),
        "frvsr_net": dict(
            workload="FRVSR",
            net=("FRVSRNet", {"in_channels": 1, "out_channels": 1, "num_resblocks": 10,
                              "upscale_factor": factor}),
            losses=[{"name": "FlowLoss", "weight": 1.0}, {"name": "MSELoss", "weight": 1.0}],
            lr=1e-4, wd=0, batch=16, dataset_extra={"num_frames": 10}, factors=(4,),
            vsr=True,
        ),
        "drf_net": dict(
            workload="VSR",
            net=("DRFNet", {"in_channels": 1, "out_channels": 1, "num_features": 32,
                            "num_groups": 6, "upscale_factor": factor}),
            losses=[{"name": "L1Loss", "weight": 1.0}],
            lr=1e-4, wd=0, batch=16, dataset_extra={"num_frames": 7}, vsr=True,
        ),
        "refine_net": dict(
            workload="VSRRefineNet",
            net=("RefineNet", {"in_channels": 1, "out_channels": 1,
                               "num_features": [64, 64, 64], "upscale_factor": factor,
                               "num_stages": 3, "update_memory": True,
                               "num_updated_frames": 6, "refine_window_size": 5,
                               "positional_encoding": True}),
            losses=[{"name": "L1Loss", "weight": 1.0}],
            lr=1e-4, wd=0, batch=16,
            dataset_extra={"num_frames": 7, "num_updated_frames": 6}, vsr=True,
            needs_pos_code=True,
        ),
    }


def _dataset_block(family_cfg, data_root, factor, dataset_prefix="Acdc", with_augments=True):
    workload = family_cfg["workload"]
    base = {"SISR": "SISRDataset", "SISRSRFB": "SISRDataset", "MISR": "MISRDataset",
            "VSR": "VSRDataset", "FRVSR": "VSRDataset",
            "VSRRefineNet": "VSRRefineNetDataset"}[workload]
    tree = "imgs" if workload in ("SISR", "SISRSRFB") else "videos"
    data_dir = "acdc_preprocessed" if dataset_prefix == "Acdc" else "dsb15_preprocessed"
    kwargs = {
        "data_dir": f"{data_root}/{data_dir}/{tree}",
        "downscale_factor": factor,
        "transforms": _transforms(),
    }
    if with_augments:
        kwargs["augments"] = _augments(factor)
    kwargs.update(family_cfg.get("dataset_extra", {}))
    if family_cfg.get("needs_pos_code"):
        kwargs["pos_code_path"] = f"{data_root}/{data_dir}/position_code.pkl"
    return {"name": f"{dataset_prefix}{base}", "kwargs": kwargs}


def _logger_name(family_cfg, prefix="Acdc"):
    w = family_cfg["workload"]
    name = {"SISR": "SISRLogger", "SISRSRFB": "SISRSRFBLogger", "MISR": "MISRLogger",
            "VSR": "VSRLogger", "FRVSR": "VSRLogger", "VSRRefineNet": "VSRLogger"}[w]
    return f"{prefix}{name}"


def _runner_name(family_cfg, kind, prefix="Acdc"):
    w = family_cfg["workload"]
    return f"{prefix}{w}{'Trainer' if kind == 'train' else 'Predictor'}"


def train_config(family, factor, data_root, out_root):
    fc = _families(factor)[family]
    return {
        "main": {"random_seed": "vsr", "saved_dir": f"{out_root}/acdc/{family}/exp1_x{factor}/train"},
        "dataset": _dataset_block(fc, data_root, factor),
        "dataloader": {"name": "Dataloader", "kwargs": {
            "train_batch_size": fc["batch"], "valid_batch_size": 1,
            "shuffle": True, "num_workers": 8}},
        "net": {"name": fc["net"][0], "kwargs": fc["net"][1]},
        "losses": fc["losses"],
        "metrics": [{"name": "PSNR"}, {"name": "SSIM"}],
        "optimizer": {"name": "Adam", "kwargs": {"lr": fc["lr"], "weight_decay": fc["wd"]}},
        "logger": {"name": _logger_name(fc), "kwargs": {"dummy_input": [fc["batch"], 1, 32, 32]}},
        "monitor": {"name": "Monitor", "kwargs": {
            "mode": "min", "target": "Loss", "saved_freq": 10, "early_stop": 0}},
        "trainer": {"name": _runner_name(fc, "train"), "kwargs": {
            "device": "cuda:0", "num_epochs": 1000}},
    }


def test_config(family, factor, data_root, out_root, dataset_prefix="Acdc", suffix=""):
    fc = _families(factor)[family]
    coords = "acdc_cropped" if dataset_prefix == "Acdc" else "dsb15_cropped"
    exp = f"exp1_x{factor}{suffix}"
    cfg = {
        "main": {
            "saved_dir": f"{out_root}/acdc/{family}/{exp}/test",
            "loaded_path": f"{out_root}/acdc/{family}/exp1_x{factor}/train/checkpoints/model_best.pth",
        },
        "dataset": _dataset_block(fc, data_root, factor, dataset_prefix, with_augments=False),
        "dataloader": {"name": "Dataloader", "kwargs": {
            "batch_size": 1, "shuffle": False, "num_workers": 8}},
        "net": {"name": fc["net"][0], "kwargs": fc["net"][1]},
        "losses": fc["losses"],
        "metrics": [
            {"name": "PSNR"},
            {"name": "SSIM"},
            {"name": "CardiacPSNR", "kwargs": {"coordinates_path": f"{data_root}/{coords}/coordinates.pkl"}},
            {"name": "CardiacSSIM", "kwargs": {"coordinates_path": f"{data_root}/{coords}/coordinates.pkl"}},
        ],
        # external evals keep the ACDC predictor: the net was trained on ACDC,
        # so denormalization must use ACDC stats (reference exp1_x*_dsb15.yaml
        # pairs Dsb15*Dataset with AcdcVSRRefineNetPredictor)
        "predictor": {"name": _runner_name(fc, "test", "Acdc"), "kwargs": {
            "device": "cuda:0",
            "saved_dir": f"{out_root}/acdc/{family}/{exp}/test",
            "exported": True}},
    }
    if fc["workload"] == "FRVSR":
        cfg["net"]["kwargs"] = dict(cfg["net"]["kwargs"], is_prediction=True)
        cfg["losses"] = [{"name": "MSELoss", "weight": 1.0}]
    return cfg


def bicubic_test_config(factor, data_root, out_root, dataset_prefix="Acdc", suffix=""):
    data_dir = "acdc_preprocessed" if dataset_prefix == "Acdc" else "dsb15_preprocessed"
    coords = "acdc_cropped" if dataset_prefix == "Acdc" else "dsb15_cropped"
    saved_dir = f"{out_root}/acdc/bicubic/exp1_x{factor}{suffix}/test"
    return {
        "main": {"saved_dir": saved_dir},
        "dataset": {"name": f"{dataset_prefix}SISRDataset", "kwargs": {
            "data_dir": f"{data_root}/{data_dir}/imgs",
            "downscale_factor": factor, "transforms": _transforms()}},
        "dataloader": {"name": "Dataloader", "kwargs": {
            "batch_size": 1, "shuffle": False, "num_workers": 8}},
        "net": {"name": "Bicubic", "kwargs": {"upscale_factor": factor}},
        "losses": [{"name": "L1Loss", "weight": 1.0}],
        "metrics": [
            {"name": "PSNR"},
            {"name": "SSIM"},
            {"name": "CardiacPSNR", "kwargs": {"coordinates_path": f"{data_root}/{coords}/coordinates.pkl"}},
            {"name": "CardiacSSIM", "kwargs": {"coordinates_path": f"{data_root}/{coords}/coordinates.pkl"}},
        ],
        # external evals keep the ACDC predictor (ACDC denorm stats) — see
        # test_config; reference pairs Dsb15SISRDataset with AcdcSISRPredictor
        # (/root/reference/configs/test/bicubic/exp1_x4_dsb15.yaml)
        "predictor": {"name": "AcdcSISRPredictor", "kwargs": {
            "device": "cuda:0",
            "saved_dir": saved_dir,
            "exported": True}},
    }


def _dump(cfg, path: Path):
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f, default_flow_style=False, sort_keys=False)


def main(out: Path, data_root: str, models_root: str):
    count = 0
    for factor in FACTORS:
        _dump(bicubic_test_config(factor, data_root, models_root),
              out / "test" / "bicubic" / f"exp1_x{factor}.yaml")
        count += 1
        for family, fc in _families(factor).items():
            if factor not in fc.get("factors", FACTORS):
                continue
            _dump(train_config(family, factor, data_root, models_root),
                  out / "train" / family / f"exp1_x{factor}.yaml")
            _dump(test_config(family, factor, data_root, models_root),
                  out / "test" / family / f"exp1_x{factor}.yaml")
            count += 2
    # DSB15 external eval for every family (trained on ACDC, eval'd on DSB15
    # with ACDC normalization — the reference ships exp*_x*_dsb15.yaml for
    # each committed family, e.g. configs/test/{bicubic,edsr_net,duf_net,
    # rbp_net,toflow_net,edvr_net,frvsr_net,refine_net}/exp1_x4_dsb15.yaml)
    for factor in FACTORS:
        _dump(bicubic_test_config(factor, data_root, models_root,
                                  dataset_prefix="Dsb15", suffix="_dsb15"),
              out / "test" / "bicubic" / f"exp1_x{factor}_dsb15.yaml")
        count += 1
        for family, fc in _families(factor).items():
            if factor not in fc.get("factors", FACTORS):
                continue
            cfg = test_config(family, factor, data_root, models_root,
                              dataset_prefix="Dsb15", suffix="_dsb15")
            _dump(cfg, out / "test" / family / f"exp1_x{factor}_dsb15.yaml")
            count += 1
    # TPU-extension showcase configs (no reference counterpart): the flagship
    # with the framework's TPU knobs — bf16 compute, eval T-bucketing, and a
    # data-parallel mesh for training (see README "TPU specifics")
    tpu_train = train_config("refine_net", 4, data_root, models_root)
    tpu_train["main"]["saved_dir"] = f"{models_root}/acdc/refine_net/exp1_x4_tpu/train"
    tpu_train["trainer"]["kwargs"]["compute_dtype"] = "bfloat16"
    # per-scan-step remat: gradients bit-identical, temp memory 3.8x smaller
    # AND measured 11% FASTER on-chip at this protocol (saving per-step
    # activations costs more HBM traffic than recomputing them —
    # PERF_NOTES "Remat on-chip")
    tpu_train["net"]["kwargs"]["remat"] = True
    # preemption-resume restarts skip the train-step compile (utils/aot.py)
    tpu_train["trainer"]["kwargs"]["aot_cache"] = (
        f"{models_root}/acdc/refine_net/exp1_x4_tpu/aot_cache"
    )
    # lossless integer-dtype feed: Normalize moves on device, the
    # integer-valued HR/LR batches upload as uint8 (4x less H2D) — matters
    # when the chip link, not compute, bounds the step rate (PERF_NOTES
    # "E2E training ... H2D-upload-bound"); a guarded no-op otherwise
    tpu_train["trainer"]["kwargs"]["int_feed"] = True
    tpu_train["parallel"] = {"num_devices": 8}
    _dump(tpu_train, out / "train" / "refine_net" / "exp1_x4_tpu.yaml")
    tpu_test = test_config("refine_net", 4, data_root, models_root, suffix="_tpu")
    # evaluate the TPU-trained checkpoint, not the plain exp1_x4 run
    tpu_test["main"]["loaded_path"] = (
        f"{models_root}/acdc/refine_net/exp1_x4_tpu/train/checkpoints/model_best.pth"
    )
    tpu_test["predictor"]["kwargs"].update(
        compute_dtype="bfloat16",
        t_bucket=8,
        # serving restarts skip the multi-minute flagship compile
        aot_cache=f"{models_root}/acdc/refine_net/exp1_x4_tpu/aot_cache",
    )
    _dump(tpu_test, out / "test" / "refine_net" / f"exp1_x4_tpu.yaml")
    # EDVR TPU serving showcase: the gather-free windowed DCN.  max_offset=2
    # bounds the PCD alignment's learned displacements to ±2 px per pyramid
    # level (cardiac cine motion between neighboring frames is small and the
    # coarse levels see it /4); the windowed path is EXACT whenever
    # |offset| <= 2 and measured 8.7x faster FULL-NET (88 vs 10
    # center-frames/sec, perf_probe --probes edvr_full; PERF_NOTES.md
    # "Deformable conv").  Remove the key to fall back to exact unbounded
    # gather semantics.
    edvr_tpu = test_config("edvr_net", 4, data_root, models_root, suffix="_tpu")
    edvr_tpu["main"]["loaded_path"] = (
        f"{models_root}/acdc/edvr_net/exp1_x4/train/checkpoints/model_best.pth"
    )
    edvr_tpu["net"]["kwargs"]["dcn_max_offset"] = 2
    edvr_tpu["predictor"]["kwargs"]["compute_dtype"] = "bfloat16"
    _dump(edvr_tpu, out / "test" / "edvr_net" / "exp1_x4_tpu.yaml")
    # EDVR TPU training showcase: the reference protocol (batch 16) with the
    # windowed DCN + 2x8 gradient accumulation — the batch-16 backward graph
    # exceeds the axon remote-compile helper's limits, the batch-8 graph
    # scanned twice does not, and the averaged gradient is mathematically the
    # full-batch gradient (trainers.grad_accum_steps; PERF_NOTES.md).
    edvr_train_tpu = train_config("edvr_net", 4, data_root, models_root)
    edvr_train_tpu["main"]["saved_dir"] = (
        f"{models_root}/acdc/edvr_net/exp1_x4_tpu/train"
    )
    edvr_train_tpu["net"]["kwargs"]["dcn_max_offset"] = 2
    edvr_train_tpu["trainer"]["kwargs"]["grad_accum_steps"] = 2
    # bf16 compute (f32 masters/losses): 2.11 vs 1.48 steps/sec measured
    edvr_train_tpu["trainer"]["kwargs"]["compute_dtype"] = "bfloat16"
    _dump(edvr_train_tpu, out / "train" / "edvr_net" / "exp1_x4_tpu.yaml")
    # RBPN TPU training showcase: the reference batch-16 graph's HLO temp
    # measures 25.6G — past a v5e chip's 15.75G HBM (XLA OOMs at compile,
    # measured on the verbatim train YAML) — so the batch runs as 2x8 exact
    # microbatch accumulation, same remedy as EDVR above.
    rbp_train_tpu = train_config("rbp_net", 4, data_root, models_root)
    rbp_train_tpu["main"]["saved_dir"] = (
        f"{models_root}/acdc/rbp_net/exp1_x4_tpu/train"
    )
    rbp_train_tpu["trainer"]["kwargs"]["grad_accum_steps"] = 2
    rbp_train_tpu["trainer"]["kwargs"]["compute_dtype"] = "bfloat16"
    _dump(rbp_train_tpu, out / "train" / "rbp_net" / "exp1_x4_tpu.yaml")
    # TOFlow / FRVSR TPU serving showcases: the gather-free windowed warps
    # (max_flow=4 px) — the bilinear GATHER measured ~16x a dense conv on
    # chip, and the windowed path is exact while true flows stay within 4 px
    # (cardiac inter-frame motion; perf_probe --probes warp,toflow_full,
    # frvsr_full: TOFlow 3.1x, FRVSR 5.3x full-net).  Remove max_flow for
    # exact unbounded semantics.
    for fam in ("toflow_net", "frvsr_net"):
        warp_tpu = test_config(fam, 4, data_root, models_root, suffix="_tpu")
        warp_tpu["main"]["loaded_path"] = (
            f"{models_root}/acdc/{fam}/exp1_x4/train/checkpoints/model_best.pth"
        )
        warp_tpu["net"]["kwargs"]["max_flow"] = 4
        warp_tpu["predictor"]["kwargs"]["compute_dtype"] = "bfloat16"
        _dump(warp_tpu, out / "test" / fam / "exp1_x4_tpu.yaml")
    # DSB15 tiled-serving showcase: the external-eval split is the
    # heterogeneous-shape case — every distinct (H, W) otherwise costs its
    # own multi-minute flagship compile; tile 64 / overlap 12 serves ANY
    # frame size through ONE executable (ops/tiling.py; recurrent RefineNet
    # makes tiling approximate — border-localized, validate with
    # tools/parity_check on your data; composes with aot_cache: a single
    # signature to store).
    dsb_tile = test_config("refine_net", 4, data_root, models_root,
                           dataset_prefix="Dsb15", suffix="_dsb15_tile_tpu")
    dsb_tile["main"]["loaded_path"] = (
        f"{models_root}/acdc/refine_net/exp1_x4/train/checkpoints/model_best.pth"
    )
    dsb_tile["predictor"]["kwargs"].update(
        tile=64, tile_overlap=12, compute_dtype="bfloat16",
        aot_cache=f"{models_root}/acdc/refine_net/exp1_x4_tpu/aot_cache",
    )
    _dump(dsb_tile, out / "test" / "refine_net" / "exp1_x4_dsb15_tile_tpu.yaml")
    count += 8
    print(f"Wrote {count} configs under {out}.")


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Generate the config zoo.")
    parser.add_argument("--out", type=Path, default=Path("configs"))
    parser.add_argument("--data-root", default="./data")
    parser.add_argument("--models-root", default="./models")
    args = parser.parse_args()
    main(args.out, args.data_root, args.models_root)
