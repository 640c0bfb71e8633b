"""Pallas kernels vs their pure-jax oracles (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu.ops.pallas import (
    fused_lstm_gates,
    lstm_gates_reference,
)


@pytest.mark.parametrize("shape", [(2, 8, 8), (1, 16, 16), (3, 7, 5)])
@pytest.mark.parametrize("F", [64, 128])
def test_fused_lstm_gates_matches_reference(shape, F):
    rng = np.random.default_rng(0)
    gates = rng.standard_normal((*shape, 4 * F)).astype(np.float32) * 2
    c = rng.standard_normal((*shape, F)).astype(np.float32)
    h_ref, c_ref = lstm_gates_reference(jnp.asarray(gates), jnp.asarray(c))
    h_got, c_got = fused_lstm_gates(jnp.asarray(gates), jnp.asarray(c), interpret=True)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref), atol=1e-6)


def test_fused_lstm_gates_unaligned_rows():
    # M not a multiple of the 256-row tile: the grid must mask the remainder
    rng = np.random.default_rng(1)
    gates = rng.standard_normal((3, 11, 7, 4 * 64)).astype(np.float32)
    c = rng.standard_normal((3, 11, 7, 64)).astype(np.float32)
    h_ref, c_ref = lstm_gates_reference(jnp.asarray(gates), jnp.asarray(c))
    h_got, c_got = fused_lstm_gates(jnp.asarray(gates), jnp.asarray(c), interpret=True)
    np.testing.assert_allclose(np.asarray(h_got), np.asarray(h_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_got), np.asarray(c_ref), atol=1e-6)


def test_cpu_backend_falls_back_to_reference():
    rng = np.random.default_rng(2)
    gates = rng.standard_normal((4, 4, 4 * 32)).astype(np.float32)
    c = rng.standard_normal((4, 4, 32)).astype(np.float32)
    h, c2 = fused_lstm_gates(jnp.asarray(gates), jnp.asarray(c))  # auto-dispatch
    h_ref, c_ref = lstm_gates_reference(jnp.asarray(gates), jnp.asarray(c))
    np.testing.assert_allclose(np.asarray(h), np.asarray(h_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(c_ref), atol=1e-6)
