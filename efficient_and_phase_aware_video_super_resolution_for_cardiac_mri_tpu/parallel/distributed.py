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


def _multiprocess_active() -> bool:
    """True when >1 coordinated process — and, when so, disarm the known
    persistent-cache/Gloo deadlock before any compilation happens."""
    import jax

    active = jax.process_count() > 1
    if active:
        _disable_persistent_cache_for_gloo()
    return active


def _disable_persistent_cache_for_gloo() -> None:
    """Turn off the persistent compile cache for multi-process CPU runs.

    With a shared cache, coordinated processes get ASYMMETRIC cache hits: one
    process reaches execution (and registers its Gloo sub-communicators
    inside the first collective) while a peer is still compiling the same
    graph, and the 30 s GetKeyValue rendezvous deadline expires ("Gloo
    context initialization failed: DEADLINE_EXCEEDED" — measured with the
    4-process CPU mesh test, tests/test_parallel.py).  Compilation must stay
    symmetric across processes, so the cache is disabled process-wide here —
    once, at the production entry point, rather than by hand-stripping envs
    at every jax.distributed call site.  TPU/GPU runtimes use the
    coordination-service barriers (not Gloo's fixed connect deadline) and
    keep the cache.
    """
    import jax

    if jax.default_backend() != "cpu":
        return
    try:
        cache_dir = jax.config.jax_compilation_cache_dir
    except AttributeError:  # config name drift across jax versions
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if not cache_dir:
        return
    logger.warning(
        "Disabling the persistent compilation cache for this multi-process "
        "CPU run: asymmetric cache hits deadlock Gloo rendezvous "
        "(parallel/distributed.py:_disable_persistent_cache_for_gloo)."
    )
    try:
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception as e:  # never let a cache knob kill a training run
        logger.warning(f"could not disable the persistent compile cache: {e}")


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    require: bool = False,
) -> bool:
    """Initialize jax.distributed when running multi-host; returns whether a
    multi-process runtime is active.

    With no arguments, relies on JAX's automatic cluster detection (TPU pods
    set the env); explicit args support bring-your-own clusters
    (``parallel: {coordinator_address, num_processes, process_id}``).

    ``require=True`` (an explicit ``multi_host: true`` request) makes a
    missing coordination signal an error, and ANY attempted-but-failed
    initialization raises rather than degrading: a worker silently falling
    back to single-host would see ``process_index() == 0``, pass every
    lead-only guard, and race the real lead's writes to the shared
    saved_dir — corrupted checkpoints and unsynchronized training.
    """
    import jax

    # Detect an existing coordination client WITHOUT jax.process_count():
    # that call initializes the XLA backend, after which
    # jax.distributed.initialize refuses to run — it must stay untouched
    # until the decision below.  Primary signal: our own success flag from a
    # previous call; secondary: jax's (private, best-effort) client handle.
    global _initialized
    if _initialized:
        return _multiprocess_active()
    try:
        from jax._src import distributed as _dist

        if getattr(_dist.global_state, "client", None) is not None:
            return _multiprocess_active()  # already initialized
    except Exception:
        pass
    if coordinator_address is None and not cluster_env_present():
        if require:
            raise ValueError(
                "parallel.multi_host: true, but neither "
                "parallel.coordinator_address nor a cluster env var "
                f"({', '.join(_CLUSTER_ENV_VARS)}) is set — nothing to "
                "coordinate against."
            )
        return False
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except Exception as e:
        raise RuntimeError(
            "jax.distributed.initialize failed; refusing to continue "
            "single-host (a degraded worker would race the lead's writes "
            f"to the shared saved_dir): {e}"
        ) from e
    logger.info(
        f"jax.distributed initialized: process {jax.process_index()} "
        f"of {jax.process_count()}."
    )
    _initialized = True
    return _multiprocess_active()


def process_local_batch_slice(global_batch_size: int) -> tuple[int, int]:
    """(local_batch_size, offset) for this process's shard of a global batch."""
    import jax

    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by {n} processes.")
    local = global_batch_size // n
    return local, jax.process_index() * local
