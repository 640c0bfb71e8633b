"""Training-dynamics A/B: the reference's ACTUAL train loop vs ours.

Everything upstream is parity-tested branch-by-branch (forward, gradients,
weight import); this closes the last axis of the fidelity contract — the
optimizer semantics.  Both sides start from the SAME imported initial weights,
iterate the SAME synthetic batches in the same order, and take N real Adam
steps at the shipped config hyperparams; the per-epoch mean losses of the
reference's own epoch loop (``src/runner/trainers/base_trainer.py:99-144``,
driven through the real ``AcdcSISRTrainer`` / ``AcdcSISRSRFBTrainer``) must
track ours step for step.  Losses change after every optimizer step, so
trajectory agreement over 12 steps pins lr/beta/eps placement and the
loss-weight summation (``base_trainer.py:126``) by measurement, not by
construction.

Tolerance: both sides run f32 on CPU with different conv/reduction orders
(XLA vs torch); measured max relative deviation of the per-epoch losses is
~4e-7 after 12 steps, so rtol 1e-5 holds with ~30x margin while a wrong eps
placement, lr, or missing bias correction diverges orders of magnitude
faster within the first step.
"""
import sys

import numpy as np
import pytest

import jax.numpy as jnp

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
    losses as L,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu import (
    models as M,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.optim import (
    Optimizer,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.trainers import (
    MISRTrainer,
    SISRSRFBTrainer,
    SISRTrainer,
)
from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils.torch_import import (
    variables_from_torch_state_dict,
)
from reference_loader import load_reference_module, reference_available

pytestmark = [
    pytest.mark.slow,
    pytest.mark.skipif(not reference_available(), reason="reference repo not mounted"),
]

# shipped hyperparams: /root/reference/configs/train/edsr_net/exp1_x4.yaml:37-41
LR, WEIGHT_DECAY = 1e-4, 0.0
N_ITEMS, BATCH, EPOCHS = 8, 4, 6  # 2 steps/epoch x 6 = 12 optimizer steps


def _load_reference_trainers():
    """Reference trainer classes with their real base-class train loop."""
    load_reference_module("src/utils.py", "src.utils")
    load_reference_module(
        "src/runner/trainers/base_trainer.py", "src.runner.trainers.base_trainer"
    )
    sisr = load_reference_module(
        "src/runner/trainers/acdc_sisr_trainer.py",
        "src.runner.trainers.acdc_sisr_trainer",
    )
    misr = load_reference_module(
        "src/runner/trainers/acdc_misr_trainer.py",
        "src.runner.trainers.acdc_misr_trainer",
    )
    sys.modules["src.runner.trainers"].AcdcMISRTrainer = misr.AcdcMISRTrainer
    # the SRFB trainer imports AcdcSISRTrainer from the package __init__
    # (heavy imports there) — publish it on the stub package instead
    sys.modules["src.runner.trainers"].AcdcSISRTrainer = sisr.AcdcSISRTrainer
    srfb = load_reference_module(
        "src/runner/trainers/acdc_sisr_srfb_trainer.py",
        "src.runner.trainers.acdc_sisr_srfb_trainer",
    )
    return sisr.AcdcSISRTrainer, srfb.AcdcSISRSRFBTrainer, misr.AcdcMISRTrainer


def _sisr_items(seed=0, hw=10, factor=4):
    rng = np.random.default_rng(seed)
    items = []
    for _ in range(N_ITEMS):
        items.append(
            {
                "lr_img": rng.standard_normal((hw, hw, 1)).astype(np.float32),
                "hr_img": rng.standard_normal((hw * factor, hw * factor, 1)).astype(
                    np.float32
                ),
            }
        )
    return items


class _ListDataset:
    """Minimal in-memory dataset for our Dataloader (channels-last numpy)."""

    def __init__(self, items):
        self.items = items

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


class _TorchListDataset:
    """Same items as (C, H, W) torch tensors for the reference DataLoader.

    Rank-4 ``lr_imgs`` windows become the reference MISR format: a list of
    per-frame (C, h, w) tensors (default collate → list of (B, C, h, w),
    matching ``acdc_misr_trainer._get_inputs_targets``)."""

    def __init__(self, items):
        import torch

        def _cvt(v):
            if v.ndim == 4:
                return [torch.from_numpy(f.transpose(2, 0, 1)).contiguous() for f in v]
            if v.ndim == 2:  # pos_code (T, 1): collates to (B, T, 1) untouched
                return torch.from_numpy(v)
            return torch.from_numpy(v.transpose(2, 0, 1)).contiguous()

        self.items = [{k: _cvt(v) for k, v in it.items()} for it in items]

    def __len__(self):
        return len(self.items)

    def __getitem__(self, i):
        return self.items[i]


def _reference_losses(trainer_cls, net, items, valid_tail=False):
    """Per-epoch train losses out of the reference's own epoch loop."""
    import torch

    loader = torch.utils.data.DataLoader(
        _TorchListDataset(items), batch_size=BATCH, shuffle=False
    )
    trainer = trainer_cls(
        device=torch.device("cpu"),
        train_dataloader=loader,
        valid_dataloader=loader,
        net=net,
        loss_fns=[torch.nn.L1Loss()],
        loss_weights=[1.0],
        metric_fns=[],
        optimizer=torch.optim.Adam(net.parameters(), lr=LR, weight_decay=WEIGHT_DECAY),
        lr_scheduler=None,
        logger=None,
        monitor=None,
        num_epochs=EPOCHS,
    )
    losses = []
    for _ in range(EPOCHS):
        log, _, _ = trainer._run_epoch("training")
        losses.append(log["Loss"])
    if valid_tail:
        # eval-mode pass through the RUNNING stats drifted by the momentum
        # updates above — the only observable of the BN running-statistics
        # semantics (train-mode normalization uses batch stats)
        log, _, _ = trainer._run_epoch("validation")
        losses.append(log["Loss"])
    return losses


def _our_losses(trainer_cls, model, variables, items, valid_tail=False):
    """Per-epoch train losses out of OUR trainer's epoch engine."""
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.loader import (
        Dataloader,
    )

    loader = Dataloader(_ListDataset(items), batch_size=BATCH, shuffle=False)
    optimizer = Optimizer("Adam", lr=LR, weight_decay=WEIGHT_DECAY)
    trainer = trainer_cls(
        device="cpu",
        train_dataloader=loader,
        valid_dataloader=loader,
        net=model,
        loss_fns=[L.L1Loss()],
        loss_weights=[1.0],
        metric_fns=[],
        optimizer=optimizer,
        num_epochs=EPOCHS,
    )
    import jax

    variables = dict(variables)
    params = jax.tree.map(jnp.asarray, variables.pop("params"))
    trainer.params = params
    trainer.model_state = jax.tree.map(jnp.asarray, variables)  # e.g. batch_stats
    trainer.opt_state = optimizer.init(params)
    losses = []
    for _ in range(EPOCHS):
        log, _, _ = trainer._run_epoch("training")
        losses.append(log["Loss"])
    if valid_tail:
        log, _, _ = trainer._run_epoch("validation")
        losses.append(log["Loss"])
    return losses


def _compare(ref_losses, our_losses, rtol=1e-5):
    ref, ours = np.asarray(ref_losses), np.asarray(our_losses)
    np.testing.assert_allclose(ours, ref, rtol=rtol, atol=1e-7)
    # the trajectory must actually move (otherwise agreement is vacuous)
    assert abs(ref[0] - ref[-1]) > 1e-4


def _load_net_module(modname):
    load_reference_module("src/model/nets/base_net.py", "src.model.nets.base_net")
    return load_reference_module(
        f"src/model/nets/{modname}.py", f"src.model.nets.{modname}"
    )


def test_edsr_train_dynamics_match_reference():
    import torch

    ref_trainer_cls, _, _ = _load_reference_trainers()
    net_mod = _load_net_module("edsr_net")
    torch.manual_seed(0)
    kwargs = dict(num_resblocks=3, num_features=8, upscale_factor=4)
    ref_net = net_mod.EDSRNet(1, 1, **kwargs)
    variables = variables_from_torch_state_dict("EDSRNet", ref_net.state_dict())
    items = _sisr_items(seed=0)
    ref_losses = _reference_losses(ref_trainer_cls, ref_net, items)
    our_losses = _our_losses(SISRTrainer, M.EDSRNet(1, 1, **kwargs), variables, items)
    _compare(ref_losses, our_losses)


def test_srfb_train_dynamics_match_reference():
    """SRFB also covers the multi-branch loss averaging path
    (reference acdc_sisr_srfb_trainer.py:21-26)."""
    import torch

    _, ref_trainer_cls, _ = _load_reference_trainers()
    net_mod = _load_net_module("srfb_net")
    torch.manual_seed(1)
    kwargs = dict(num_steps=2, num_features=8, num_groups=2, upscale_factor=4)
    ref_net = net_mod.SRFBNet(1, 1, **kwargs)
    variables = variables_from_torch_state_dict("SRFBNet", ref_net.state_dict())
    items = _sisr_items(seed=1, hw=8)
    ref_losses = _reference_losses(ref_trainer_cls, ref_net, items)
    our_losses = _our_losses(
        SISRSRFBTrainer, M.SRFBNet(1, 1, **kwargs), variables, items
    )
    _compare(ref_losses, our_losses)


def _misr_items(seed=0, num_frames=7, hw=8, factor=4):
    rng = np.random.default_rng(seed)
    items = []
    for _ in range(N_ITEMS):
        items.append(
            {
                "lr_imgs": rng.standard_normal((num_frames, hw, hw, 1)).astype(
                    np.float32
                ),
                "hr_img": rng.standard_normal((hw * factor, hw * factor, 1)).astype(
                    np.float32
                ),
            }
        )
    return items


def test_duf_train_dynamics_match_reference():
    """DUF adds the BatchNorm axis: training normalizes with batch stats while
    the RUNNING stats drift by torch's momentum-0.1 UNBIASED-variance updates
    (``torch.nn.BatchNorm3d``); the appended validation epoch reads those
    drifted stats in eval mode, so agreement pins the running-statistics
    update semantics by measurement (the axis forward import-parity cannot
    see).  Reference loop: ``acdc_misr_trainer.py:8-49`` over
    ``base_trainer.py:99-144`` with ``duf_net.py`` BN layers."""
    import torch

    _, _, ref_trainer_cls = _load_reference_trainers()
    net_mod = _load_net_module("duf_net")
    torch.manual_seed(2)
    kwargs = dict(
        num_frames=7, size_filter=5, upscale_factor=4, backbone="_DenseLayer16"
    )
    ref_net = net_mod.DUFNet(1, 1, **kwargs)
    variables = variables_from_torch_state_dict("DUFNet", ref_net.state_dict())
    assert "batch_stats" in variables
    items = _misr_items(seed=2)
    ref_losses = _reference_losses(ref_trainer_cls, ref_net, items, valid_tail=True)
    our_losses = _our_losses(
        MISRTrainer, M.DUFNet(1, 1, **kwargs), variables, items, valid_tail=True
    )
    _compare(ref_losses, our_losses)


def test_drf_train_dynamics_match_reference():
    """DRFNet under the plain VSR trainer loop — the last trainer class
    without a dynamics measurement: sequence-in/sequence-out with per-frame
    loss averaging and B·T log weighting (``acdc_vsr_trainer.py:74-124``),
    plus the frame-scanned feedback carry."""
    import torch

    load_reference_module("src/utils.py", "src.utils")
    load_reference_module(
        "src/runner/trainers/base_trainer.py", "src.runner.trainers.base_trainer"
    )
    vsr = load_reference_module(
        "src/runner/trainers/acdc_vsr_trainer.py", "src.runner.trainers.acdc_vsr_trainer"
    )
    net_mod = _load_net_module("drf_net")
    torch.manual_seed(8)
    kwargs = dict(num_features=8, num_groups=2, upscale_factor=4)
    ref_net = net_mod.DRFNet(1, 1, **kwargs)
    variables = variables_from_torch_state_dict("DRFNet", ref_net.state_dict())

    rng = np.random.default_rng(8)
    T, hw, factor = 4, 8, 4
    items = [
        {
            "lr_imgs": rng.standard_normal((T, hw, hw, 1)).astype(np.float32),
            "hr_imgs": rng.standard_normal(
                (T, hw * factor, hw * factor, 1)
            ).astype(np.float32),
        }
        for _ in range(N_ITEMS)
    ]
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.trainers import (
        VSRTrainer,
    )

    ref_losses = _reference_losses(vsr.AcdcVSRTrainer, ref_net, items)
    our_losses = _our_losses(VSRTrainer, M.DRFNet(1, 1, **kwargs), variables, items)
    _compare(ref_losses, our_losses)


def test_rbp_train_dynamics_match_reference():
    """RBPN covers the PReLU learning dynamics (its slope parameters are
    trained — the init quirk is pinned at import, their UPDATES only here)
    and the up/down back-projection stages under the real MISR loop."""
    import torch

    _, _, ref_trainer_cls = _load_reference_trainers()
    net_mod = _load_net_module("rbp_net")
    torch.manual_seed(7)
    kwargs = dict(
        base_filter=8, feat=8, num_stages=3, num_resblocks=2,
        num_frames=3, upscale_factor=4,
    )
    ref_net = net_mod.RBPNet(1, 1, **kwargs)
    variables = variables_from_torch_state_dict("RBPNet", ref_net.state_dict())
    items = _misr_items(seed=7, num_frames=3, hw=8)
    ref_losses = _reference_losses(ref_trainer_cls, ref_net, items)
    our_losses = _our_losses(MISRTrainer, M.RBPNet(1, 1, **kwargs), variables, items)
    _compare(ref_losses, our_losses)


def test_edvr_train_dynamics_match_reference():
    """EDVR trains against the reference with the differentiable torch DCN
    oracle stub standing in for the CUDA extension (tests/dcn_oracle.py) —
    the deformable-conv GRADIENT semantics inside a real optimizer loop,
    which the static gradient-parity tests cannot see drifting.  The
    ``conv_offset_mask`` layers are randomized identically on both sides
    before import so deformable sampling is live from step 1 (zero-init
    would make the DCN a plain conv for the first steps)."""
    import torch

    from reference_loader import load_reference_edvr

    _, _, ref_trainer_cls = _load_reference_trainers()
    ref_mod = load_reference_edvr()
    torch.manual_seed(6)
    kwargs = dict(
        in_channels=1, out_channels=1, nf=8, nframes=5, groups=2,
        front_RBs=2, back_RBs=2,
    )
    ref_net = ref_mod.EDVRNet(**kwargs)
    with torch.no_grad():
        for name, p in ref_net.named_parameters():
            if "conv_offset_mask" in name:
                p.normal_(0.0, 0.08)
    variables = variables_from_torch_state_dict("EDVRNet", ref_net.state_dict())
    items = _misr_items(seed=6, num_frames=5, hw=12)
    ref_losses = _reference_losses(ref_trainer_cls, ref_net, items)
    our_losses = _our_losses(MISRTrainer, M.EDVRNet(**kwargs), variables, items)
    _compare(ref_losses, our_losses)


def test_toflow_train_dynamics_match_reference():
    """TOFlow pins the per-neighbor SpyNet BN semantics: in train mode each
    neighbor's SpyNet pass updates the SAME running stats sequentially
    (reference ``toflow_net.py:116-138`` loops neighbors; our training path
    deliberately keeps that loop instead of batching it — PERF_NOTES
    'Batched neighbor passes'), plus gradients through the HR flow warp.
    The validation tail reads the sequentially-drifted running stats.

    Tolerance: trajectory rtol 2e-3 (measured max 3.2e-4 over 12 steps) with
    epoch 1 at 1e-5 (measured 2.3e-7).  Unlike every other family, TOFlow's
    warp chain divides coordinates by (W−1) — XLA:CPU lowers f32 division by
    a non-power-of-2 constant without correct IEEE rounding (measured: 74%
    of quotients 1 ulp off torch's eager division), and the trained flows
    feed those ulps back through the warp every step, so bit-parity of the
    trajectory is unattainable across backends.  The ulp drift grows
    smoothly from 1e-7; a semantic bug (wrong momentum, wrong neighbor
    order, wrong loss weighting) blows past 1e-2 within an epoch or two.
    BN running-statistics exactness itself is pinned at rtol 1e-5 by the
    DUF test (no warp) and bit-level by the TorchBatchNorm unit test."""
    import torch

    _, _, ref_trainer_cls = _load_reference_trainers()
    net_mod = _load_net_module("toflow_net")
    torch.manual_seed(5)
    kwargs = dict(num_frames=3, upscale_factor=4)
    ref_net = net_mod.TOFlowNet(1, 1, **kwargs)
    variables = variables_from_torch_state_dict("TOFlowNet", ref_net.state_dict())
    assert "batch_stats" in variables
    items = _misr_items(seed=5, num_frames=3, hw=16)
    ref_losses = _reference_losses(ref_trainer_cls, ref_net, items, valid_tail=True)
    our_losses = _our_losses(
        MISRTrainer, M.TOFlowNet(1, 1, **kwargs), variables, items, valid_tail=True
    )
    np.testing.assert_allclose(our_losses[0], ref_losses[0], rtol=1e-5)
    _compare(ref_losses, our_losses, rtol=2e-3)


def test_frvsr_train_dynamics_match_reference():
    """FRVSR pins the two-headed loss path: FlowLoss(warped-LR, LR) +
    MSELoss(SR, HR) summed per the reference's own epoch loop
    (``acdc_frvsr_trainer.py:40-56,76-89``), with gradients flowing through
    the recurrent STN warp and space-to-depth — semantics no other dynamics
    test exercises."""
    import torch

    load_reference_module("src/utils.py", "src.utils")
    load_reference_module(
        "src/runner/trainers/base_trainer.py", "src.runner.trainers.base_trainer"
    )
    frvsr = load_reference_module(
        "src/runner/trainers/acdc_frvsr_trainer.py",
        "src.runner.trainers.acdc_frvsr_trainer",
    )
    net_mod = _load_net_module("frvsr_net")
    torch.manual_seed(3)
    kwargs = dict(upscale_factor=4, num_resblocks=2)
    ref_net = net_mod.FRVSRNet(1, 1, **kwargs)
    variables = variables_from_torch_state_dict("FRVSRNet", ref_net.state_dict())

    rng = np.random.default_rng(3)
    T, hw, factor = 3, 16, 4
    items = []
    for _ in range(N_ITEMS):
        items.append(
            {
                "lr_imgs": rng.standard_normal((T, hw, hw, 1)).astype(np.float32),
                "hr_imgs": rng.standard_normal(
                    (T, hw * factor, hw * factor, 1)
                ).astype(np.float32),
            }
        )

    import torch as _torch

    loader = _torch.utils.data.DataLoader(
        _TorchListDataset(items), batch_size=BATCH, shuffle=False
    )
    ref_trainer = frvsr.AcdcFRVSRTrainer(
        device=_torch.device("cpu"),
        train_dataloader=loader,
        valid_dataloader=loader,
        net=ref_net,
        loss_fns=[torch.nn.MSELoss(), torch.nn.MSELoss()],  # Flow then SR
        loss_weights=[1.0, 1.0],
        metric_fns=[],
        optimizer=_torch.optim.Adam(
            ref_net.parameters(), lr=LR, weight_decay=WEIGHT_DECAY
        ),
        lr_scheduler=None,
        logger=None,
        monitor=None,
        num_epochs=EPOCHS,
    )
    ref_losses = []
    for _ in range(EPOCHS):
        log, _, _ = ref_trainer._run_epoch("training")
        ref_losses.append(log["Loss"])

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.trainers import (
        FRVSRTrainer,
    )

    our_losses = _our_losses_multi(
        FRVSRTrainer,
        M.FRVSRNet(1, 1, **kwargs),
        variables,
        items,
        loss_fns=[L.FlowLoss(), L.MSELoss()],
    )
    _compare(ref_losses, our_losses)


def test_refinenet_train_dynamics_match_reference():
    """The flagship family: pins the stage-discounted multi-branch loss
    (0.5^(num_stages−1−i//3) over 3·num_stages branches,
    ``acdc_vsr_refinenet_trainer.py:84-103``), the warm-up no-grad boundary
    inside the reference net's own train loop, and the eval-mode final-branch
    loss (the validation tail) — run against the live reference RefineNet
    (CPU-patched ``init_hidden``, reference_loader)."""
    import torch

    from reference_loader import load_reference_refine_net

    load_reference_module("src/utils.py", "src.utils")
    load_reference_module(
        "src/runner/trainers/base_trainer.py", "src.runner.trainers.base_trainer"
    )
    vrt = load_reference_module(
        "src/runner/trainers/acdc_vsr_refinenet_trainer.py",
        "src.runner.trainers.acdc_vsr_refinenet_trainer",
    )
    rn = load_reference_refine_net()
    torch.manual_seed(4)
    cfg = dict(
        in_channels=1,
        out_channels=1,
        num_features=[6, 6],
        num_stages=2,
        refine_window_size=5,
        upscale_factor=4,
        update_memory=True,
        num_updated_frames=3,
        memory=True,
        positional_encoding=True,
    )
    ref_net = rn.RefineNet(**cfg)
    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.utils.torch_import import (
        params_from_torch_state_dict,
    )

    params = params_from_torch_state_dict("RefineNet", ref_net.state_dict())

    rng = np.random.default_rng(4)
    tc, nuf, hw, factor = 5, cfg["num_updated_frames"], 8, 4
    T = tc + 2 * nuf
    items = []
    for _ in range(N_ITEMS):
        items.append(
            {
                "lr_imgs": rng.standard_normal((T, hw, hw, 1)).astype(np.float32),
                "hr_imgs": rng.standard_normal(
                    (tc, hw * factor, hw * factor, 1)
                ).astype(np.float32),
                "pos_code": rng.uniform(-1, 1, (T, 1)).astype(np.float32),
            }
        )

    loader = torch.utils.data.DataLoader(
        _TorchListDataset(items), batch_size=BATCH, shuffle=False
    )
    ref_trainer = vrt.AcdcVSRRefineNetTrainer(
        device=torch.device("cpu"),
        train_dataloader=loader,
        valid_dataloader=loader,
        net=ref_net,
        loss_fns=[torch.nn.L1Loss()],
        loss_weights=[1.0],
        metric_fns=[],
        optimizer=torch.optim.Adam(
            ref_net.parameters(), lr=LR, weight_decay=WEIGHT_DECAY
        ),
        lr_scheduler=None,
        logger=None,
        monitor=None,
        num_epochs=EPOCHS,
    )
    ref_losses = []
    for _ in range(EPOCHS):
        log, _, _ = ref_trainer._run_epoch("training")
        ref_losses.append(log["Loss"])
    log, _, _ = ref_trainer._run_epoch("validation")
    ref_losses.append(log["Loss"])

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.runner.trainers import (
        VSRRefineNetTrainer,
    )

    our_losses = _our_losses(
        VSRRefineNetTrainer,
        M.RefineNet(**cfg),
        {"params": params},
        items,
        valid_tail=True,
    )
    _compare(ref_losses, our_losses)


def _our_losses_multi(trainer_cls, model, variables, items, loss_fns):
    """Like ``_our_losses`` but with explicit (multi-head) loss functions."""
    import jax

    from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.data.loader import (
        Dataloader,
    )

    loader = Dataloader(_ListDataset(items), batch_size=BATCH, shuffle=False)
    optimizer = Optimizer("Adam", lr=LR, weight_decay=WEIGHT_DECAY)
    trainer = trainer_cls(
        device="cpu",
        train_dataloader=loader,
        valid_dataloader=loader,
        net=model,
        loss_fns=loss_fns,
        loss_weights=[1.0] * len(loss_fns),
        metric_fns=[],
        optimizer=optimizer,
        num_epochs=EPOCHS,
    )
    variables = dict(variables)
    params = jax.tree.map(jnp.asarray, variables.pop("params"))
    trainer.params = params
    trainer.model_state = jax.tree.map(jnp.asarray, variables)
    trainer.opt_state = optimizer.init(params)
    losses = []
    for _ in range(EPOCHS):
        log, _, _ = trainer._run_epoch("training")
        losses.append(log["Loss"])
    return losses
