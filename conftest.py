"""Pytest configuration: force a virtual 8-device CPU mesh for all tests.

Multi-device sharding paths are tested on fake CPU devices, never on real
TPUs (SURVEY.md §4c).  Note: this environment's sitecustomize force-registers
the axon TPU PJRT plugin, so ``JAX_PLATFORMS=cpu`` alone is not enough — the
platform must also be pinned via ``jax.config`` before any backend is used.
"""
import os
import re

os.environ.setdefault("JAX_PLATFORMS", "cpu")
# Persistent compilation cache: measured 2x on repeat suite runs (cold 163 s
# -> warm 82 s on test_model_zoo.py; CPU-backend executables hit it fine —
# only the big scan-heavy TPU graph doesn't, PERF_NOTES round 1).  Keyed by
# backend+flags, so correctness is jax's problem, not ours; delete the dir to
# force cold compiles.  The dir is ADDITIONALLY keyed by the host CPU's ISA
# feature set: jax does NOT do that itself, and XLA:CPU AOT entries written
# on one machine reload on another with machine-feature mismatch warnings
# ("could lead to ... SIGILL") — observed when this repo's .cache moved
# between build hosts.  The helper is loaded BY FILE PATH: importing it as a
# package submodule would execute utils/__init__, which pulls jax before the
# env above is set.
import importlib.util as _ilu  # noqa: E402

_spec = _ilu.spec_from_file_location(
    "_evsr_hostid",
    os.path.join(
        os.path.dirname(__file__),
        "efficient_and_phase_aware_video_super_resolution_for_cardiac_mri_tpu",
        "utils", "hostid.py",
    ),
)
_hostid = _ilu.module_from_spec(_spec)
_spec.loader.exec_module(_hostid)
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(
        os.path.dirname(__file__), ".cache", "jax",
        _hostid.host_cpu_fingerprint(),
    ),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
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
# explicit config update too: if another plugin imported jax before this
# conftest ran, the env vars above were read too late
jax.config.update(
    "jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"]
)
# read back the (possibly user-set) env values rather than hardcoding, so an
# exported threshold survives a too-early jax import just like the cache dir
jax.config.update(
    "jax_persistent_cache_min_compile_time_secs",
    float(os.environ["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"]),
)
jax.config.update(
    "jax_persistent_cache_min_entry_size_bytes",
    int(os.environ["JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES"]),
)
