"""Real-time streaming inference for the causal nets (TPU extension).

The reference serves whole clips only.  FRVSR's recurrence is strictly causal
— frame k's SR depends on frames <= k through the carry (lr_last, sr_last)
(reference ``src/model/nets/frvsr_net.py:40-62``) — so it admits EXACT
frame-by-frame serving: one jitted per-frame step with a donated carry,
constant latency per frame, no clip assembly.  That is the natural shape for
interactive/acquisition-time cine-MRI upscaling, where frames arrive from the
scanner one at a time.

``FRVSRStream.push(frame_k)`` returns bit-for-bit the same SR frame the
whole-clip forward produces at index k (tested): the clip forward is an
``nn.scan`` of the very ``_FRVSRStep`` this session applies once per push,
with the identical parameter tree (``params["steps"]``).

The flagship RefineNet is bidirectional (forward AND backward ConvLSTM over
the full cardiac cycle), so it has no streaming form — its real workload is
whole-cycle evaluation and stays on the clip predictors.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.frvsr_net import FRVSRNet, _FRVSRStep
from ..utils.casting import cast_floating


class FRVSRStream:
    """Frame-by-frame FRVSR serving session.

    >>> stream = FRVSRStream(net, variables)
    >>> sr0 = stream.push(lr0)   # (B, h, w, C) -> (B, h*r, w*r, C)
    >>> sr1 = stream.push(lr1)   # carries (lr0, sr0) forward
    >>> stream.reset()           # next push starts a new sequence

    The first pushed frame reproduces the clip forward's initialization:
    carry = (frame_0, zeros) — the first step estimates flow from frame_0 to
    itself and warps a zero SR estimate, exactly as
    ``FRVSRNet.__call__`` seeds its scan.

    ``compute_dtype`` mirrors the predictors' knob (params/carry/inputs cast,
    outputs returned float32).  ``aot_cache`` reuses the persistent AOT
    executable cache (utils/aot.py) so a serving restart skips the compile.
    """

    def __init__(
        self,
        net: FRVSRNet,
        variables: dict,
        compute_dtype=None,
        aot_cache: str | None = None,
    ):
        if not isinstance(net, FRVSRNet):
            raise TypeError(
                f"FRVSRStream serves FRVSRNet (the causal net); got "
                f"{type(net).__name__}."
            )
        self.net = net
        self.compute_dtype = jnp.dtype(compute_dtype) if compute_dtype else None
        params = variables["params"]["steps"]  # the scan-broadcast step params
        if self.compute_dtype is not None:
            params = cast_floating(params, self.compute_dtype)
        self._params = params
        step_mod = _FRVSRStep(
            net.in_channels,
            net.out_channels,
            net.upscale_factor,
            net.num_resblocks,
            net.max_flow,
        )

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, carry, frame):
            new_carry, (sr, _warped) = step_mod.apply({"params": params}, carry, frame)
            return new_carry, sr.astype(jnp.float32)

        if aot_cache:
            from ..utils import aot

            step = aot.cached_dispatch(step, aot_cache, "FRVSRStream-step")
        self._step = step
        self._carry = None

    def reset(self) -> None:
        """Forget the recurrent state; the next push starts a new sequence."""
        self._carry = None

    def push(self, lr_frame) -> jax.Array:
        """Feed one LR frame (B, h, w, C); returns its SR frame (B, h·r, w·r, C).

        The returned array is NOT fetched to host — chain pushes back-to-back
        and fetch (``np.asarray``) only the frames you consume, so the ~33 ms
        tunnel round-trip amortizes across the stream (PERF_NOTES.md).
        """
        # copy=True: the step's carry is DONATED, and _FRVSRStep passes the
        # input frame through as new_carry[0] — without the copy, a caller's
        # jax array (or, on the seed push, the frame argument itself) would
        # alias a donated buffer (`f(donate(a), a)` — runtime error / silent
        # invalidation of the caller's array)
        frame = jnp.array(lr_frame, copy=True)
        if frame.ndim != 4:
            raise ValueError(
                f"push expects one (B, h, w, C) frame; got shape {frame.shape}."
            )
        if self.compute_dtype is not None:
            frame = cast_floating(frame, self.compute_dtype)
        if self._carry is None:
            B, h, w, C = frame.shape
            r = self.net.upscale_factor
            sr0 = jnp.zeros((B, h * r, w * r, C), frame.dtype)
            self._carry = (jnp.array(frame, copy=True), sr0)
        self._carry, sr = self._step(self._params, self._carry, frame)
        return sr

    def run(self, lr_frames, lookahead: int = 2):
        """Stream a whole (B, T, h, w, C) sequence, yielding HOST SR frames.

        Keeps ``lookahead`` pushes in flight before fetching — the pipelined
        dispatch pattern of the predictors (utils/dispatch.DoubleBuffer is
        batch-oriented; this is the streaming equivalent)."""
        lr_frames = np.asarray(lr_frames)
        pending = []
        for t in range(lr_frames.shape[1]):
            pending.append(self.push(lr_frames[:, t]))
            if len(pending) > max(0, int(lookahead)):
                yield np.asarray(pending.pop(0))
        for sr in pending:
            yield np.asarray(sr)
