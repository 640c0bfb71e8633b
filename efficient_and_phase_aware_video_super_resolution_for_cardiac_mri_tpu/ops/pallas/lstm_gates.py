"""Pallas TPU kernel: fused ConvLSTM gate nonlinearities + state update.

The ConvLSTM scan body's elementwise tail — split the gate conv output into
(i, f, o, g), apply sigmoid/sigmoid/sigmoid/tanh, update (h, c)
(reference ``refine_net.py:258-265``) — executed as ONE VPU pass over
VMEM-resident tiles: a single read of (gates, c) and a single write of
(h', c'), no intermediate HBM round trips.

The pure-jax reference implementation (``lstm_gates_reference``) is both the
fallback on non-TPU backends and the oracle for the kernel's tests; the
public entry ``fused_lstm_gates`` dispatches by backend (or the
``EVSR_NO_PALLAS=1`` escape hatch).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def lstm_gates_reference(gates: jnp.ndarray, c: jnp.ndarray):
    """(…, 4F) gates + (…, F) cell state → (h', c')."""
    cc_i, cc_f, cc_o, cc_g = jnp.split(gates, 4, axis=-1)
    c_next = jax.nn.sigmoid(cc_f) * c + jax.nn.sigmoid(cc_i) * jnp.tanh(cc_g)
    h_next = jax.nn.sigmoid(cc_o) * jnp.tanh(c_next)
    return h_next, c_next


def _kernel(gates_ref, c_ref, h_ref, c_out_ref):
    g = gates_ref[:]
    c = c_ref[:]
    F = c.shape[-1]
    i = jax.nn.sigmoid(g[:, :F])
    f = jax.nn.sigmoid(g[:, F : 2 * F])
    o = jax.nn.sigmoid(g[:, 2 * F : 3 * F])
    gg = jnp.tanh(g[:, 3 * F :])
    c_next = f * c + i * gg
    h_ref[:] = o * jnp.tanh(c_next)
    c_out_ref[:] = c_next


@functools.partial(jax.jit, static_argnames=("interpret",))
def _pallas_gates_2d(gates2d: jnp.ndarray, c2d: jnp.ndarray, interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, F = c2d.shape
    TM = 256
    grid = (pl.cdiv(M, TM),)
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TM, 4 * F), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, F), lambda m: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TM, F), lambda m: (m, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TM, F), lambda m: (m, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((M, F), c2d.dtype),
            jax.ShapeDtypeStruct((M, F), c2d.dtype),
        ],
        interpret=interpret,
    )(gates2d, c2d)


def _use_pallas() -> bool:
    # Strictly opt-in (EVSR_PALLAS=1) even on TPU: measured on v5e, the
    # pallas_call boundary breaks XLA's conv<->gate fusion and the fused
    # kernel is ~1.7x SLOWER than XLA's native lowering of the same math
    # (15.2 vs 8.6 ms per T=42 ConvLSTM scan — PERF_NOTES.md round 2).
    if os.environ.get("EVSR_PALLAS") != "1":
        return False
    return jax.default_backend() in ("tpu", "axon")


def _run_pallas(gates: jnp.ndarray, c: jnp.ndarray, interpret: bool):
    F = c.shape[-1]
    lead = c.shape[:-1]
    M = 1
    for d in lead:
        M *= d
    h2, c2 = _pallas_gates_2d(gates.reshape(M, 4 * F), c.reshape(M, F), interpret=interpret)
    return h2.reshape(*lead, F), c2.reshape(*lead, F)


# The Pallas forward needs an explicit VJP for training; the backward is the
# cheap elementwise tail, expressed through the pure-jax reference (XLA fuses
# it into the surrounding gradient computation).
@jax.custom_vjp
def _fused_diff(gates, c):
    return _run_pallas(gates, c, interpret=False)


def _fused_fwd(gates, c):
    return _run_pallas(gates, c, interpret=False), (gates, c)


def _fused_bwd(residuals, cotangents):
    gates, c = residuals
    _, vjp = jax.vjp(lstm_gates_reference, gates, c)
    return vjp(cotangents)


_fused_diff.defvjp(_fused_fwd, _fused_bwd)


def fused_lstm_gates(gates: jnp.ndarray, c: jnp.ndarray, interpret: bool | None = None):
    """Backend-dispatching fused gate update; identical numerics (and
    gradients) to :func:`lstm_gates_reference`."""
    if os.environ.get("EVSR_NO_PALLAS") == "1":
        return lstm_gates_reference(gates, c)
    if interpret is None:
        if not _use_pallas():
            return lstm_gates_reference(gates, c)
        return _fused_diff(gates, c)
    return _run_pallas(gates, c, interpret=interpret)
