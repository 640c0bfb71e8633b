"""RefineNet — the paper's phase-aware bidirectional ConvLSTM VSR model.

TPU-first redesign of reference ``src/model/nets/refine_net.py:10-344``:

* Sequences are arrays (B, T, H, W, C); the reference's per-frame python
  loops (``refine_net.py:82-93``) become ``lax.scan`` over the time axis, so
  the whole forward is one compiled program regardless of T.
* The ``torch.no_grad()`` warm-up of the recurrent state
  (``refine_net.py:74-93``) becomes segmented scans with ``stop_gradient`` on
  the warm segments' outputs and carry — identical forward values, identical
  gradient cuts, but no re-execution.
* Per-frame blocks (in/out/refine convs) fold time into the batch axis so XLA
  sees one big MXU-shaped conv instead of T small ones.
* The refine block's sliding window over time (``refine_net.py:175-183``)
  becomes a static stack of shifted slices + one batched conv.

Faithfully replicated quirks (SURVEY.md §5):
  #3 — the refine body applies NO activation between its convs (the reference
       registers PReLUs on the wrong module, so forward never runs them).
Fixed (not replicated): #2 — no hardcoded device; #4 — every
``num_updated_frames`` U below ``refine_window_size // 2`` (including 0) is
handled by edge-replication; the reference's ``refine_maps[i+U-half]`` wraps
negative indices to the wrong end for such U and then IndexErrors at the tail
frames, so it has NO defined behavior to replicate there.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.pallas import fused_lstm_gates
from .common import InBlock, PReLU, UpsampleBlock, conv, fold_time, sg, unfold_time

class ConvLSTMStep(nn.Module):
    """One timestep of the stacked ConvLSTM (all layers).

    Gate math matches reference ``ConvLSTMCell.forward``
    (``refine_net.py:247-267``): one conv over [x ‖ h] → split 4 → (i, f, o, g)
    with sigmoid/sigmoid/sigmoid/tanh.  ``memory=False`` replaces h with a
    second copy of x (``refine_net.py:251-255`` ablation).
    """

    input_dim: int
    hidden_dims: Sequence[int]
    memory: bool = True

    @nn.compact
    def __call__(self, carry, x):
        new_carry = []
        inp = x
        in_dim = self.input_dim
        for layer, hd in enumerate(self.hidden_dims):
            h, c = carry[layer]
            combined = jnp.concatenate([inp, h] if self.memory else [inp, inp], axis=-1)
            in_ch = (in_dim + hd) if self.memory else (in_dim * 2)
            gates = conv(4 * hd, 3, in_ch, name=f"cell{layer}")(combined)
            # fused gate tail: Pallas kernel on TPU (one VPU pass over VMEM,
            # single read of (gates, c), single write of (h', c')), identical
            # pure-jax math elsewhere — ops/pallas/lstm_gates.py
            h_next, c_next = fused_lstm_gates(gates, c)
            new_carry.append((h_next, c_next))
            inp = h_next
            in_dim = hd
        return tuple(new_carry), inp

def _zero_carry(batch, height, width, hidden_dims, dtype):
    return tuple(
        (
            jnp.zeros((batch, height, width, hd), dtype),
            jnp.zeros((batch, height, width, hd), dtype),
        )
        for hd in hidden_dims
    )

class ConvLSTM(nn.Module):
    """Stacked ConvLSTM scanned over time, with no-grad warm-up segments.

    ``num_updated_frames`` leading and trailing frames advance the state but
    contribute no gradient (the reference's ``torch.no_grad()`` blocks at
    ``refine_net.py:86-93``).
    """

    input_dim: int
    hidden_dims: Sequence[int]
    memory: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, xs: jnp.ndarray, num_updated_frames: int = 0) -> jnp.ndarray:
        import os

        B, T, H, W, _ = xs.shape
        U = num_updated_frames
        # per-step while-loop overhead dominates clip latency (PERF_NOTES.md);
        # unrolling trades compile time for pipelining across steps
        unroll = int(os.environ.get("EVSR_SCAN_UNROLL", "1"))
        # remat at the SCAN-STEP granularity: the backward recomputes each
        # timestep from its carry, so the stacked per-step residuals (the
        # gate/conv intermediates XLA would otherwise save T times) reduce to
        # the carries alone.  Top-level jax.checkpoint around the whole loss
        # was measured to save NOTHING (PERF_NOTES.md "Remat") — the
        # recomputed forward stores its own residuals; only per-step remat
        # moves peak memory.  prevent_cse=False is safe (and faster) inside
        # scan per the jax.checkpoint docs.
        step_cls = (
            nn.remat(ConvLSTMStep, prevent_cse=False) if self.remat else ConvLSTMStep
        )
        scan = nn.scan(
            step_cls,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=max(1, unroll),
        )(input_dim=self.input_dim, hidden_dims=tuple(self.hidden_dims), memory=self.memory,
          name="cells")
        carry = _zero_carry(B, H, W, self.hidden_dims, xs.dtype)
        if U == 0:
            _, hs = scan(carry, xs)
            return hs
        carry, h_pre = scan(carry, xs[:, :U])
        carry, h_pre = sg(carry), sg(h_pre)
        carry, h_core = scan(carry, xs[:, U : T - U])
        carry, h_suf = scan(carry, xs[:, T - U :])
        return jnp.concatenate([h_pre, h_core, sg(h_suf)], axis=1)

class _WindowConv(nn.Module):
    """Sliding-window-over-time conv, stored with the reference's 2D layout.

    Mathematically identical to "concat `window` frames frame-major on
    channels, then Conv2d" (reference ``refine_net.py:176-180``) but executed
    as a 3D conv with kernel (window, ks, ks), VALID over time — no window-
    times-larger intermediate.  The param keeps shape (ks, ks, window·C, out)
    so imported torch weights need no re-layout; it is viewed depth-major at
    call time.
    """

    features: int
    window: int
    kernel_size: int
    in_channels: int  # = window · C

    @nn.compact
    def __call__(self, feats):  # (B, T, H, W, C)

        from ..ops.torch_init import torch_conv_bias_init, torch_conv_kernel_init

        ks, W = self.kernel_size, self.window
        C = self.in_channels // W
        kernel2d = self.param(
            "kernel", torch_conv_kernel_init, (ks, ks, self.in_channels, self.features)
        )
        bias = self.param(
            "bias", torch_conv_bias_init(self.in_channels * ks * ks), (self.features,)
        )
        # (ks, ks, W·C, out) → (W, ks, ks, C, out): channel index = d·C + c
        kernel3d = kernel2d.reshape(ks, ks, W, C, self.features).transpose(2, 0, 1, 3, 4)
        pad = ks // 2
        out = jax.lax.conv_general_dilated(
            feats,
            kernel3d,
            window_strides=(1, 1, 1),
            padding=[(0, 0), (pad, pad), (pad, pad)],  # VALID over time
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + bias

class RefineBlock(nn.Module):
    """Sliding-window fusion of [fwd_h ‖ bwd_h ‖ pos_code]
    (reference ``_RefineBlock``, ``refine_net.py:138-185``).

    Replicates quirk #3: NO activation between the convs — the reference
    registers its PReLUs outside the Sequential actually used in forward.
    """

    num_features: int
    window: int
    num_updated_frames: int
    positional_encoding: bool = False

    @nn.compact
    def __call__(self, fwd_h, bwd_h, pos_codes):
        B, T, H, W, F = fwd_h.shape
        half = self.window // 2
        U = self.num_updated_frames
        if self.positional_encoding:
            pos = jnp.broadcast_to(pos_codes[:, :, None, None, :], (B, T, H, W, 1))
            pos = pos.astype(fwd_h.dtype)
            feats = jnp.concatenate([fwd_h, bwd_h, pos], axis=-1)
        else:
            feats = jnp.concatenate([fwd_h, bwd_h], axis=-1)
        C = feats.shape[-1]
        K = T - self.window + 1  # number of windows; center of window k is k+half
        in_ch = self.window * C

        # The reference concatenates the window frame-major on channels and
        # runs a 2D conv (:176-177).  That concat would materialize a
        # window-times-larger tensor per stage; the identical computation is
        # ONE 3D conv with kernel (window, kh, kw), VALID over time.  The
        # stored kernel keeps the reference's (kh, kw, window·C, out) layout
        # (frame-major channels ≡ depth-major) so torch weights import
        # unchanged — see _WindowConv.
        if self.positional_encoding:
            x = _WindowConv(in_ch // self.window, self.window, 3, in_ch, name="conv1")(feats)
            x, spec = fold_time(x)
            x = conv(self.num_features, 3, in_ch // self.window, name="conv2")(x)
            maps = unfold_time(x, spec)  # (B, K, H, W, F)
        else:
            maps = _WindowConv(self.num_features, self.window, 1, in_ch, name="conv1")(feats)

        # no-grad windows: gradient only where U <= center < T - U (ref :179-183)
        k_lo = max(0, U - half)
        k_hi = min(K, T - U - half)
        if k_lo > 0 or k_hi < K:
            maps = jnp.concatenate(
                [sg(maps[:, :k_lo]), maps[:, k_lo:k_hi], sg(maps[:, k_hi:])], axis=1
            )
        return maps

class RefineNet(nn.Module):
    """Phase-aware multi-stage bidirectional ConvLSTM VSR
    (reference ``RefineNet``, ``refine_net.py:10-135``).

    Input:  ``lr`` (B, T, h, w, C) with T = num_core + 2·num_updated_frames,
            ``pos_codes`` (B, T, 1).
    Output: list of 3·num_stages arrays (B, num_core, h·r, w·r, C) in the
            reference's branch order per stage: forward, backward, fused.
    """

    in_channels: int
    out_channels: int
    num_features: Sequence[int]
    num_stages: int = 1
    refine_window_size: int = 5
    upscale_factor: int = 4
    update_memory: bool = False
    num_updated_frames: int = 0
    memory: bool = True
    positional_encoding: bool = False
    #: TPU extension: rematerialize each ConvLSTM timestep in the backward
    #: (see ConvLSTM.remat) — activation memory stops scaling with T·stages
    #: at ~one extra forward of the LSTM spine (temp memory 0.68x at T=10,
    #: XLA memory analysis).  Gradients bit-identical (tested).
    remat: bool = False

    def __post_init__(self):
        super().__post_init__()
        if self.upscale_factor not in (2, 3, 4, 8):
            raise ValueError(
                f"The upscale factor should be 2, 3, 4 or 8. Got {self.upscale_factor}."
            )
        if not self.update_memory and self.num_updated_frames != 0:
            raise ValueError('The "update_memory" is not activated!')

    @nn.compact
    def __call__(self, lr: jnp.ndarray, pos_codes: jnp.ndarray | None = None):
        F = self.num_features[0]
        U = self.num_updated_frames
        half = self.refine_window_size // 2
        B, T = lr.shape[:2]
        Tc = T - 2 * U

        in_block = InBlock(F, self.in_channels, name="in_block")
        fwd_lstm = ConvLSTM(F, tuple(self.num_features), self.memory, self.remat,
                            name="forward_lstm_block")
        bwd_lstm = ConvLSTM(F, tuple(self.num_features), self.memory, self.remat,
                            name="backward_lstm_block")
        refine_block = RefineBlock(
            self.num_features[-1],
            self.refine_window_size,
            U,
            self.positional_encoding,
            name="refine_block",
        )
        out_block = UpsampleBlock(F, self.out_channels, self.upscale_factor, name="out_block")

        def per_frame(block, x):
            y, spec = fold_time(x)
            return unfold_time(block(y), spec)

        core = per_frame(in_block, lr[:, U : T - U])
        if U > 0:
            fwd_warm = sg(per_frame(in_block, lr[:, :U]))
            bwd_warm = sg(per_frame(in_block, lr[:, T - U :]))

        outputs = []
        for stage in range(self.num_stages):
            feats = (
                jnp.concatenate([fwd_warm, core, bwd_warm], axis=1) if U > 0 else core
            )
            fwd_h = fwd_lstm(feats, U)
            bwd_h = bwd_lstm(feats[:, ::-1], U)[:, ::-1]
            refine = refine_block(fwd_h, bwd_h, pos_codes)
            K = refine.shape[1]

            # Fused maps aligned to the core frames.  For U >= half this is the
            # reference's exact slice (``:112``); for ANY U < half (0 included)
            # the reference wraps negative indices to the wrong end and then
            # IndexErrors at the tail frames (quirk #4) — edge maps are
            # replicated here instead so every core frame has a window.
            start = U - half
            if start >= 0:
                fused = refine[:, start : start + Tc]
            else:
                pieces = [jnp.repeat(refine[:, :1], -start, axis=1)]
                n_mid = min(K, Tc + start)
                pieces.append(refine[:, :n_mid])
                n_back = Tc + start - K
                if n_back > 0:
                    pieces.append(jnp.repeat(refine[:, -1:], n_back, axis=1))
                fused = jnp.concatenate(pieces, axis=1)

            # Three output branches (reference :99-113): forward, backward, fused.
            outputs.append(per_frame(out_block, core + fwd_h[:, U : U + Tc]))
            outputs.append(per_frame(out_block, core + bwd_h[:, U : U + Tc]))
            outputs.append(per_frame(out_block, core + fused))

            # Residual feature update feeding the next stage (reference :118-133).
            if self.num_stages > 1 and stage < self.num_stages - 1:
                if U > 0:
                    n_ref = max(0, U - half)
                    fwd_warm = sg(
                        fwd_warm
                        + jnp.concatenate(
                            [fwd_h[:, : min(half, U)], refine[:, :n_ref]], axis=1
                        )
                    )
                    b_start = min(K, max(0, T - U - half))
                    bwd_warm = sg(
                        bwd_warm
                        + jnp.concatenate(
                            [
                                refine[:, b_start : b_start + n_ref],
                                bwd_h[:, T - min(half, U) :],
                            ],
                            axis=1,
                        )
                    )
                core = core + fused

        return outputs
