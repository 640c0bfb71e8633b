"""Multi-host (multi-slice) initialization.

The reference is single-process/single-GPU (SURVEY.md §2.8); scaling past one
TPU host needs only ``jax.distributed.initialize`` — afterwards the same
data-parallel mesh code in :mod:`.mesh` spans all hosts (collectives ride ICI
within a slice and DCN across slices, inserted by GSPMD).

Call :func:`initialize` once at process start (main.py does this when the
config carries ``parallel.multi_host: true`` or the standard TPU cluster env
vars are present).  On single-host runs it is a no-op.
"""
from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)

# NOTE: TPU_WORKER_HOSTNAMES is deliberately absent — single-host tunneled
# runtimes set it too, and a spurious initialize() after backend init fails.
_CLUSTER_ENV_VARS = (
    "COORDINATOR_ADDRESS",
    "JAX_COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)

# set on our own successful jax.distributed.initialize — the stable
# already-initialized signal (the probe of jax's private client handle in
# initialize() is best-effort only)
_initialized = False


def cluster_env_present() -> bool:
    return any(os.environ.get(v) for v in _CLUSTER_ENV_VARS)


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize jax.distributed when running multi-host; returns whether a
    multi-process runtime is active.

    With no arguments, relies on JAX's automatic cluster detection (TPU pods
    set the env); explicit args support bring-your-own clusters.
    """
    import jax

    # Detect an existing coordination client WITHOUT jax.process_count():
    # that call initializes the XLA backend, after which
    # jax.distributed.initialize refuses to run — it must stay untouched
    # until the decision below.  Primary signal: our own success flag from a
    # previous call; secondary: jax's (private, best-effort) client handle.
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return jax.process_count() > 1  # already initialized
    except Exception:
        pass
    if coordinator_address is None and not cluster_env_present():
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()} "
            f"of {jax.process_count()}."
        )
        globals()["_initialized"] = True
        return jax.process_count() > 1
    except Exception as e:
        logger.warning(f"jax.distributed.initialize failed ({e}); continuing single-host.")
        return False


def process_local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(local_batch_size, offset) for this process's shard of a global batch."""
    import jax

    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by {n} processes.")
    local = global_batch_size // n
    return local, jax.process_index() * local
