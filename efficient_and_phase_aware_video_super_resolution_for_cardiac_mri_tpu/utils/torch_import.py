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
    """Detach a torch state_dict to plain numpy (torch optional elsewhere).

    COPIES: ``Tensor.numpy()`` shares memory with the live torch parameters,
    so without the copy a later in-place optimizer step on the source net
    would silently mutate the imported tree."""
    out = {}
    for k, v in state_dict.items():
        arr = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[k] = np.array(arr, copy=True)
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


def _deconv_w(t) -> np.ndarray:
    # torch ConvTranspose2d weight (in, out, kh, kw) → (kh, kw, in, out)
    return np.asarray(t).transpose(2, 3, 0, 1)


def _conv3d_w(t) -> np.ndarray:
    # torch Conv3d weight (out, in, kd, kh, kw) → (kd, kh, kw, in, out)
    return np.asarray(t).transpose(2, 3, 4, 1, 0)


def _bn(path: tuple[str, ...], field: str):
    """BatchNorm field → (flax path, converter); running stats go to the
    ``batch_stats`` collection."""
    if field == "weight":
        return path + ("scale",), _as_np
    if field == "bias":
        return path + ("bias",), _as_np
    if field == "running_mean":
        return ("batch_stats",) + path + ("mean",), _as_np
    if field == "running_var":
        return ("batch_stats",) + path + ("var",), _as_np
    if field == "num_batches_tracked":
        return None
    raise KeyError(field)


def _wb(path: tuple[str, ...], field: str, w_conv=_conv_w):
    return path + ("kernel" if field == "weight" else "bias",), (
        w_conv if field == "weight" else _as_np
    )


def edsr_net_key_map(k: str):
    m = re.fullmatch(r"head\.0\.(weight|bias)", k)
    if m:
        return _wb(("head",), m[1])
    m = re.fullmatch(r"body\.(\d+)\.body\.(conv\d)\.(weight|bias)", k)
    if m:
        return _wb((f"resblock{m[1]}", m[2]), m[3])
    m = re.fullmatch(r"body\.conv\.(weight|bias)", k)
    if m:
        return _wb(("body_conv",), m[1])
    m = re.fullmatch(r"tail\.0\.conv(\d)\.(weight|bias)", k)
    if m:
        return _wb((f"up_conv{m[1]}",), m[2])
    m = re.fullmatch(r"tail\.conv\.(weight|bias)", k)
    if m:
        return _wb(("tail_conv",), m[1])
    raise KeyError(f"Unmapped EDSRNet torch key: {k}")


_TOFLOW_SEQ = {"0": "conv1", "3": "conv2", "6": "conv3", "9": "conv4", "12": "conv5"}
_TOFLOW_BN = {"1": "bn1", "4": "bn2", "7": "bn3", "10": "bn4"}
_TOFLOW_OUT = {"0": "out_conv1", "2": "out_conv2", "4": "out_conv3", "6": "out_conv4"}


def toflow_net_key_map(k: str):
    m = re.fullmatch(r"spy_net\.blocks\.(\d)\.block\.(\d+)\.(\w+)", k)
    if m:
        block = ("spy_net", f"block{m[1]}")
        if m[2] in _TOFLOW_SEQ:
            return _wb(block + (_TOFLOW_SEQ[m[2]],), m[3])
        if m[2] in _TOFLOW_BN:
            return _bn(block + (_TOFLOW_BN[m[2]],), m[3])
    m = re.fullmatch(r"out_block\.(\d)\.(weight|bias)", k)
    if m and m[1] in _TOFLOW_OUT:
        return _wb((_TOFLOW_OUT[m[1]],), m[2])
    raise KeyError(f"Unmapped TOFlowNet torch key: {k}")


def frvsr_net_key_map(k: str):
    m = re.fullmatch(r"srnet\.head\.conv\.(weight|bias)", k)
    if m:
        return _wb(("steps", "srnet", "head"), m[1])
    m = re.fullmatch(r"srnet\.body\.(\d+)\.body\.(conv\d)\.(weight|bias)", k)
    if m:
        return _wb(("steps", "srnet", f"resblock{m[1]}", m[2]), m[3])
    m = re.fullmatch(r"srnet\.tail\.deconv(\d)\.(weight|bias)", k)
    if m:
        return _wb(("steps", "srnet", f"deconv{m[1]}"), m[2], _deconv_w)
    m = re.fullmatch(r"srnet\.tail\.conv\.(weight|bias)", k)
    if m:
        return _wb(("steps", "srnet", "tail"), m[1])
    m = re.fullmatch(r"fnet\.body\.(conv\d_\d)\.(weight|bias)", k)
    if m:
        return _wb(("steps", "fnet", m[1]), m[2])
    m = re.fullmatch(r"fnet\.tail\.(conv\d)\.(weight|bias)", k)
    if m:
        return _wb(("steps", "fnet", f"tail_{m[1]}"), m[2])
    raise KeyError(f"Unmapped FRVSRNet torch key: {k}")


def _rbp_block(prefix_t: tuple[str, ...], child: str, field: str):
    """ConvBlock/DeconvBlock/ResnetBlock children: conv, deconv, act, conv1/2."""
    if child == "deconv":
        return _wb(prefix_t + ("deconv",), field, _deconv_w)
    if child == "act":
        return prefix_t + ("act", "weight"), _as_np
    return _wb(prefix_t + (child,), field)


def rbp_net_key_map(k: str):
    m = re.fullmatch(r"(feat0|feat1)\.(conv|act)\.(weight|bias)", k)
    if m:
        return _rbp_block((m[1],), m[2], m[3])
    m = re.fullmatch(r"dbp_net\.feat1\.(conv|act)\.(weight|bias)", k)
    if m:
        return _rbp_block(("dbp_net", "feat1"), m[1], m[2])
    m = re.fullmatch(r"dbp_net\.(up\d|down\d)\.(up_conv\d|down_conv\d)\.(conv|deconv|act)\.(weight|bias)", k)
    if m:
        return _rbp_block(("dbp_net", m[1], m[2]), m[3], m[4])
    m = re.fullmatch(r"dbp_net\.output\.(conv|act)\.(weight|bias)", k)
    if m:
        return _rbp_block(("dbp_net", "output"), m[1], m[2])
    m = re.fullmatch(r"(res_feat\d)\.(\d+)\.(conv1|conv2|act|conv|deconv)\.(weight|bias)", k)
    if m:
        prefix, idx, child, field = m[1], int(m[2]), m[3], m[4]
        # sequential: num_resblocks ResnetBlocks then the tail block
        # (we can't know num_resblocks here; tail children are conv/deconv,
        #  resblock children are conv1/conv2/act)
        if child in ("conv", "deconv"):
            return _rbp_block((prefix, "tail"), child, field)
        if child == "act" and _rbp_tail_act(prefix, idx):
            return _rbp_block((prefix, "tail"), "act", field)
        return _rbp_block((prefix, f"res{idx}"), child, field)
    m = re.fullmatch(r"output\.(conv|act)\.(weight|bias)", k)
    if m:
        return _rbp_block(("output",), m[1], m[2])
    raise KeyError(f"Unmapped RBPNet torch key: {k}")


_RBP_TAIL_IDX: dict[str, int] = {}


def _rbp_tail_act(prefix: str, idx: int) -> bool:
    return _RBP_TAIL_IDX.get(prefix, -1) == idx


def duf_net_key_map(k: str):
    m = re.fullmatch(r"head\.(weight|bias)", k)
    if m:
        return _wb(("head",), m[1])
    m = re.fullmatch(r"denseLayer\.conv(\d+)\.(bn\d|conv\d)\.(\w+)", k)
    if m:
        path = ("denseLayer", f"conv{m[1]}", m[2])
        if m[2].startswith("bn"):
            return _bn(path, m[3])
        return _wb(path, m[3], _conv3d_w)
    m = re.fullmatch(r"denseLayer\.tail\.bn\.(\w+)", k)
    if m:
        return _bn(("denseLayer", "tail_bn"), m[1])
    m = re.fullmatch(r"denseLayer\.tail\.conv\.(weight|bias)", k)
    if m:
        return _wb(("denseLayer", "tail_conv"), m[1], _conv3d_w)
    m = re.fullmatch(r"filterNet\.conv(\d)\.(weight|bias)", k)
    if m:
        return _wb((f"filter_conv{m[1]}",), m[2], _conv3d_w)
    m = re.fullmatch(r"residualNet\.conv(\d)\.(weight|bias)", k)
    if m:
        return _wb((f"residual_conv{m[1]}",), m[2], _conv3d_w)
    raise KeyError(f"Unmapped DUFNet torch key: {k}")


def _srfb_fblock(sub: str, field: str, step_prefix: tuple[str, ...] = ()):
    base = step_prefix + ("f_block",)
    m = re.fullmatch(r"in_block\.(conv|prelu)", sub)
    if m:
        if m[1] == "conv":
            return _wb(base + ("in_conv",), field)
        return base + ("in_prelu", "weight"), _as_np
    m = re.fullmatch(r"(up|down)_blocks\.(\d+)\.(\w+)", sub)
    if m:
        kind, i, child = m[1], m[2], m[3]
        name = f"{kind}{i}_{child}"
        if child.startswith("deconv"):
            return _wb(base + (name,), field, _deconv_w)
        if child.startswith("conv"):
            return _wb(base + (name,), field)
        return base + (name, "weight"), _as_np  # prelu
    m = re.fullmatch(r"out_block\.(conv|prelu)", sub)
    if m:
        if m[1] == "conv":
            return _wb(base + ("out_conv",), field)
        return base + ("out_prelu", "weight"), _as_np
    raise KeyError(sub)


def _srfb_like_key_map(k: str, in_block_name: str, step_prefix: tuple[str, ...] = ()):
    m = re.fullmatch(rf"{in_block_name}\.(conv\d|prelu\d)\.(weight|bias)", k)
    if m:
        ours = "lrf_block" if in_block_name == "lrf_block" else "in_block"
        if m[1].startswith("conv"):
            return _wb((ours, m[1]), m[2])
        return (ours, m[1], "weight"), _as_np
    m = re.fullmatch(r"f_block\.(.+)\.(weight|bias)", k)
    if m:
        return _srfb_fblock(m[1], m[2], step_prefix)
    m = re.fullmatch(r"r_block\.(deconv1|prelu1|conv2)\.(weight|bias)", k)
    if m:
        if m[1] == "deconv1":
            return _wb(("r_block", "deconv1"), m[2], _deconv_w)
        if m[1] == "conv2":
            return _wb(("r_block", "conv2"), m[2])
        return ("r_block", "prelu1", "weight"), _as_np
    m = re.fullmatch(r"out_block\.(conv\d)\.(weight|bias)", k)
    if m:
        return _wb(step_prefix + ("out_block", m[1]), m[2])
    raise KeyError(f"Unmapped SRFB-family torch key: {k}")


def srfb_net_key_map(k: str):
    return _srfb_like_key_map(k, "lrf_block")


def drf_sisr_net_key_map(k: str):
    return _srfb_like_key_map(k, "in_block")


def drf_net_key_map(k: str):
    return _srfb_like_key_map(k, "in_block", step_prefix=("steps",))


_EDVR_TOP_CONVS = {
    "conv_first", "conv_first_1", "conv_first_2", "conv_first_3", "conv_1x1",
    "fea_L2_conv1", "fea_L2_conv2", "fea_L3_conv1", "fea_L3_conv2",
    "upconv1", "upconv2", "HRconv", "conv_last", "tsa_fusion",
}


def edvr_net_key_map(k: str):
    """EDVRNet torch state_dict → flax paths (reference ``EDVR_arch.py:13-321``,
    DCN pack weights ``dcn/deform_conv.py:223-291``)."""
    # plain top-level convs (incl. the non-TSA 1x1 fusion conv, which torch
    # names 'tsa_fusion' too — EDVR_arch.py:54)
    m = re.fullmatch(r"(\w+)\.(weight|bias)", k)
    if m and m[1] in _EDVR_TOP_CONVS:
        return _wb((m[1],), m[2])
    # make_layer sequentials: feature_extraction.{i}, recon_trunk.{i}
    m = re.fullmatch(r"(feature_extraction|recon_trunk)\.(\d+)\.(conv\d)\.(weight|bias)", k)
    if m:
        return _wb((f"{m[1]}{m[2]}", m[3]), m[4])
    # predeblur pyramid (EDVR_arch.py:148-188)
    m = re.fullmatch(
        r"pre_deblur\.(conv_first(?:_\d)?|deblur_L\d_conv)\.(weight|bias)", k
    )
    if m:
        return _wb(("pre_deblur", m[1]), m[2])
    m = re.fullmatch(r"pre_deblur\.(RB_L\d_\d)\.(conv\d)\.(weight|bias)", k)
    if m:
        return _wb(("pre_deblur", m[1], m[2]), m[3])
    # PCD alignment: offset/fea convs + the three DCN pack params per level
    m = re.fullmatch(
        r"pcd_align\.((?:L\d|cas)_(?:offset_conv\d|fea_conv))\.(weight|bias)", k
    )
    if m:
        return _wb(("pcd_align", m[1]), m[2])
    m = re.fullmatch(r"pcd_align\.((?:L\d|cas)_dcnpack)\.conv_offset_mask\.(weight|bias)", k)
    if m:
        return _wb(("pcd_align", m[1], "conv_offset_mask"), m[2])
    m = re.fullmatch(r"pcd_align\.((?:L\d|cas)_dcnpack)\.(weight|bias)", k)
    if m:
        # DCNPack stores its deform-conv weight as a raw param named 'weight'
        path = ("pcd_align", m[1], "weight" if m[2] == "weight" else "bias")
        return path, (_conv_w if m[2] == "weight" else _as_np)
    # TSA fusion submodule convs
    m = re.fullmatch(r"tsa_fusion\.(\w+)\.(weight|bias)", k)
    if m:
        return _wb(("tsa_fusion", m[1]), m[2])
    raise KeyError(f"Unmapped EDVRNet torch key: {k}")


MODEL_KEY_MAPS = {
    "RefineNet": refine_net_key_map,
    "EDVRNet": edvr_net_key_map,
    "EDSRNet": edsr_net_key_map,
    "TOFlowNet": toflow_net_key_map,
    "FRVSRNet": frvsr_net_key_map,
    "RBPNet": rbp_net_key_map,
    "DUFNet": duf_net_key_map,
    "SRFBNet": srfb_net_key_map,
    "DRFSISRNet": drf_sisr_net_key_map,
    "DRFNet": drf_net_key_map,
}


def variables_from_torch_state_dict(model_name: str, state_dict: Mapping) -> dict:
    """Build the flax variables dict ({'params': ..., 'batch_stats': ...})
    for ``model_name`` from a torch state_dict."""
    key_map = MODEL_KEY_MAPS.get(model_name)
    if key_map is None:
        raise KeyError(f"No torch key map registered for model {model_name!r}.")
    arrays = state_dict_to_numpy(state_dict)
    if model_name == "RBPNet":
        _infer_rbp_tail_indices(arrays)
    params: dict = {}
    batch_stats: dict = {}
    for k, v in arrays.items():
        mapped = key_map(k)
        if mapped is None:
            continue
        path, convert = mapped
        if path[0] == "batch_stats":
            _set(batch_stats, path[1:], convert(v))
        else:
            _set(params, path, convert(v))
    variables = {"params": params}
    if batch_stats:
        variables["batch_stats"] = batch_stats
    return variables


def params_from_torch_state_dict(model_name: str, state_dict: Mapping) -> dict:
    return variables_from_torch_state_dict(model_name, state_dict)["params"]


def _infer_rbp_tail_indices(arrays: Mapping) -> None:
    """The res_feat chains end in a Conv/Deconv tail whose sequential index is
    num_resblocks — inferred per chain so its 'act' maps to the tail."""
    _RBP_TAIL_IDX.clear()
    for k in arrays:
        m = re.fullmatch(r"(res_feat\d)\.(\d+)\.(conv|deconv)\.weight", k)
        if m:
            _RBP_TAIL_IDX[m[1]] = int(m[2])


def load_torch_checkpoint(path) -> dict[str, np.ndarray]:
    """Load a reference ``.pth`` checkpoint's net state_dict as numpy."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["net"] if isinstance(ckpt, dict) and "net" in ckpt else ckpt
    return state_dict_to_numpy(state)
