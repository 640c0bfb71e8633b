"""Pytest configuration: force a virtual 8-device CPU mesh for all tests.

Multi-device sharding paths are tested on fake CPU devices, never on real
TPUs (SURVEY.md §4c).  Note: this environment's sitecustomize force-registers
the axon TPU PJRT plugin, so ``JAX_PLATFORMS=cpu`` alone is not enough — the
platform must also be pinned via ``jax.config`` before any backend is used.
"""
import os
import re

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" in xla_flags:
    # OVERRIDE a leftover count (e.g. =1 from debugging): keeping it would
    # silently skip every mesh test via their 8-device skipif guards
    os.environ["XLA_FLAGS"] = re.sub(
        r"--xla_force_host_platform_device_count=\d+",
        "--xla_force_host_platform_device_count=8",
        xla_flags,
    )
else:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
