"""Pytest configuration: force a virtual 8-device CPU mesh for all tests.

Multi-device sharding paths are tested on fake CPU devices, never on real
TPUs (SURVEY.md §4c).  Note: this environment's sitecustomize force-registers
the axon TPU PJRT plugin, so ``JAX_PLATFORMS=cpu`` alone is not enough — the
platform must also be pinned via ``jax.config`` before any backend is used.
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
