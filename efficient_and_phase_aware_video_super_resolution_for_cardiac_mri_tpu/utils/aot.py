"""Persistent ahead-of-time (AOT) executable cache for serving cold-starts.

On the tunneled TPU backend a first compile of the flagship serving graph
costs 5-10 minutes, and jax's persistent *compilation* cache measurably does
not avoid it for the big executable (PERF_NOTES.md round-1 findings: warm
141 s vs cold 144 s).  This module caches the compiled PJRT *executable*
itself via ``jax.experimental.serialize_executable``, so a process restart
pays only trace + lowering (seconds) plus a disk read.

Safety: a serialized executable is specific to the jax version, backend,
device kind/count, process topology, AND the exact lowered program (shapes,
dtypes, shardings, donation).  The cache key is therefore a hash of the
backend fingerprint + the lowered StableHLO text — any mismatch produces a
different key and falls back to a fresh compile.  A corrupt or incompatible
cache entry is skipped with a warning, never trusted.

Interplay with jax's persistent *compilation* cache: serializing an
executable that was RESTORED from that cache can emit a blob missing function
bodies (XLA:CPU, jax 0.9).  :func:`compile_cached` therefore validates every
blob by actually running it — at store time AND on disk hits — and, when a
store-time validation fails, pays one cache-isolated recompile to obtain a
storable blob.  If even that fails, storing is abandoned for the process
(normal compiles, compilation cache untouched — never wrong, just uncached).

No reference counterpart (the reference has no AOT story); this is a
TPU-serving extension (docs/TPU_EXTENSIONS.md).
"""
from __future__ import annotations

import hashlib
import json
import logging
import os
import pickle
import tempfile
from pathlib import Path

import jax

LOG = logging.getLogger(__name__)

#: bump to invalidate every existing cache entry on format changes
_FORMAT_VERSION = 1


from .hostid import host_cpu_fingerprint  # noqa: E402  (re-export; see hostid.py)


def backend_fingerprint() -> str:
    """Everything an executable is specialized to besides the program."""
    devs = jax.devices()
    try:  # jaxlib can move within jax's pin range without jax.__version__ changing
        import jaxlib

        jaxlib_version = jaxlib.__version__
    except Exception:
        jaxlib_version = "unknown"
    # PJRT runtime build (XLA commit / libtpu version) — catches runtime
    # upgrades that neither python package version reflects
    platform_version = getattr(devs[0].client, "platform_version", "unknown")
    fp = {
        "format": _FORMAT_VERSION,
        "jax": jax.__version__,
        "jaxlib": jaxlib_version,
        "platform": devs[0].platform,
        "platform_version": str(platform_version),
        "device_kind": devs[0].device_kind,
        "n_devices": len(devs),
        "process_count": jax.process_count(),
    }
    if devs[0].platform == "cpu":
        # XLA:CPU executables are compiled FOR this host's ISA features;
        # platform_version does not capture them
        fp["host_cpu"] = host_cpu_fingerprint()
    return json.dumps(fp, sort_keys=True)


def _load_payload(payload):
    """Deserialize a cache payload onto its recorded device assignment.

    ``deserialize_and_load`` defaults execution_devices to ALL local devices,
    but the executable is specialized to the device set it was compiled for
    (a 1-device jit on an 8-device host otherwise fails with "expected 8
    shards") — replay the recorded set."""
    from jax.experimental.serialize_executable import deserialize_and_load

    device_ids, (ser, in_tree, out_tree) = payload
    by_id = {d.id: d for d in jax.devices()}
    return deserialize_and_load(
        ser, in_tree, out_tree,
        execution_devices=[by_id[i] for i in device_ids],
    )


def _validate_payload(payload, args, static_argnums):
    """Load a payload, run it once, and return the validated executable.

    Upstream trap this guards against: when the same program was earlier
    restored from jax's persistent *compilation* cache in this process,
    ``serialize`` can emit a blob referencing function bodies that are not
    embedded — its reload then dies at run time with "NOT_FOUND: Buffer
    Definition Event: Function ... not found" (XLA:CPU, jax 0.9), even in a
    fresh process.  Executing the round-tripped executable on COPIES of the
    args (donation-safe, sharding-preserving) and touching one element of
    every output buffer surfaces exactly that failure — at store time for new
    entries AND at load time for disk hits (a blob written by another build
    can deserialize fine yet still die at its first run; validating the hit
    keeps the 'cache can never break correctness' contract).
    """
    import jax.numpy as jnp
    import numpy as np

    exe = _load_payload(payload)
    dynamic = tuple(a for i, a in enumerate(args) if i not in static_argnums)
    copies = jax.tree.map(jnp.copy, dynamic)
    out = exe(*copies)
    # one element of EVERY output buffer, fetched in a single device→host
    # round-trip (the fetch forces the buffers' definition events; per-leaf
    # fetches would cost ~33 ms each through a tunneled backend)
    probes = [
        jnp.asarray(leaf).ravel()[:1].astype(jnp.float32)
        for leaf in jax.tree.leaves(out)
    ]
    if probes:
        np.asarray(jnp.concatenate(probes))
    return exe


#: set when this process has proven it cannot produce a storable blob (the
#: serializer raises, or even a cache-isolated compile fails validation) —
#: further store attempts would just repeat the failure, so they are skipped
#: and the jax persistent *compilation* cache keeps working undisturbed.
_STORE_BROKEN = False


def _publish(payload, path: Path, tag: str):
    blob = pickle.dumps(payload)
    path.parent.mkdir(parents=True, exist_ok=True)
    # atomic publish: a concurrent reader sees either nothing or a full file
    fd, tmp = tempfile.mkstemp(dir=path.parent, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)
    except BaseException:
        os.unlink(tmp)
        raise
    LOG.info(f"AOT cache store: {path.name} ({len(blob)} bytes).")


def _serialize_payload(compiled):
    from jax.experimental.serialize_executable import serialize

    device_ids = [d.id for d in compiled._executable.xla_executable.local_devices()]
    return (device_ids, serialize(compiled))


def compile_cached(jitted_fn, args, cache_dir, tag: str = "step",
                   static_argnums: tuple = ()):
    """``jitted_fn.lower(*args).compile()`` with a disk-backed executable cache.

    Returns a ``jax.stages.Compiled`` (its call takes only the *dynamic*
    arguments — static_argnums values are baked in).  On cache miss the
    compiled executable is serialized, VALIDATED by a round-trip execution,
    and published to ``cache_dir`` atomically; on hit the stored executable is
    loaded AND validated by one execution before it is trusted.  Any
    load/serialize/validate failure degrades to a normal compile (the cache
    can never break correctness).
    """
    global _STORE_BROKEN

    lowered = jitted_fn.lower(*args)
    key_material = backend_fingerprint() + lowered.as_text()
    key = hashlib.sha256(key_material.encode()).hexdigest()[:32]
    cache_dir = Path(cache_dir)
    path = cache_dir / f"{tag}-{key}.jaxexe"
    statics = tuple(static_argnums)
    if path.exists():
        try:
            with open(path, "rb") as f:
                payload = pickle.load(f)
            # validate-by-running: a blob can deserialize cleanly and still
            # die at its first execution (written pre-validation, or by a
            # same-version-different-build runtime) — catch that HERE and
            # fall back to compiling instead of crashing the caller mid-run
            compiled = _validate_payload(payload, args, statics)
            LOG.info(f"AOT cache hit: {path.name} (compile skipped).")
            return compiled
        except Exception as e:  # incompatible/corrupt entry → recompile
            LOG.warning(f"AOT cache entry {path.name} unusable ({e!r}); recompiling.")
    # Compile normally first — the jax persistent *compilation* cache stays
    # enabled, so environments where executable serialization never succeeds
    # keep its warm-restart benefit.  The trap: serializing an executable that
    # was RESTORED from that cache can emit a blob whose reload dies at run
    # time ("Buffer Definition Event: Function ... not found" — XLA:CPU,
    # jax 0.9).  Store-time validation catches exactly that, and only THEN do
    # we pay one cache-isolated recompile to obtain a storable blob.
    compiled = lowered.compile()
    if _STORE_BROKEN:
        return compiled
    try:
        payload = _serialize_payload(compiled)
    except Exception as e:  # serializer itself unsupported — retry is futile
        _STORE_BROKEN = True
        LOG.warning(f"AOT executable serialization unavailable ({e!r}); "
                    f"caching skipped for {tag}.")
        return compiled
    try:
        _validate_payload(payload, args, statics)
        _publish(payload, path, tag)
        return compiled
    except Exception as e:
        LOG.warning(f"AOT blob failed validation ({e!r}); retrying with the "
                    f"compilation cache disabled for {tag}.")
    prev = jax.config.jax_enable_compilation_cache
    try:
        jax.config.update("jax_enable_compilation_cache", False)
        compiled = lowered.compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
    try:
        payload = _serialize_payload(compiled)
        _validate_payload(payload, args, statics)
        _publish(payload, path, tag)
    except Exception as e:  # still broken → stop trying for this process
        _STORE_BROKEN = True
        LOG.warning(f"AOT executable serialization unavailable ({e!r}); "
                    f"caching skipped for {tag}.")
    return compiled


def shape_key(*trees) -> tuple:
    """Hashable (shape, dtype) signature of every array leaf — the in-memory
    dispatch key in front of :func:`compile_cached` (re-lowering per call
    would re-trace; this dict lookup is O(leaves))."""
    leaves = jax.tree.leaves(trees)
    return tuple(
        (tuple(getattr(x, "shape", ())), str(getattr(x, "dtype", type(x).__name__)))
        for x in leaves
    )


def cached_dispatch(jitted_fn, cache_dir, tag: str, static_argnums: tuple = ()):
    """Wrap a jitted fn with per-argument-shape AOT-cached executables.

    The wrapper keeps one executable per (dynamic-arg shape signature,
    static-arg values) in memory, filling misses through the disk cache.
    The compiled call receives only the dynamic arguments (static_argnums
    values are baked into each executable).  Donation declared on the jit is
    preserved through serialization (round-trip tested).

    Multi-process runs bypass the cache: validation executes the program an
    extra time, and a hit on one process vs a miss (or serialize-refusal, or
    cache-isolated retry) on a peer gives the processes DIFFERENT execution
    counts of the same collective program — the launches pair up wrongly and
    the job hangs or corrupts, the same failure class as the persistent
    compilation cache's Gloo rendezvous deadlock (parallel/distributed.py).
    Per-process asymmetry is inherent to a disk cache (host-local dirs,
    partial prepopulation), so the only symmetric choice is OFF for all.
    """
    if jax.process_count() > 1:
        LOG.warning(
            f"AOT executable cache disabled for {tag}: multi-process run "
            "(asymmetric cache hits would desynchronize collective "
            "execution counts across processes)."
        )
        return lambda *args: jitted_fn(*args)
    statics = tuple(static_argnums)
    executables: dict = {}

    def call(*args):
        static_vals = tuple(args[i] for i in statics)
        dynamic = tuple(a for i, a in enumerate(args) if i not in statics)
        # the tree structure is part of the key: two arg trees can share a
        # leaf signature (None leaves vanish from shape_key) yet need
        # different executables — without it the stored Compiled would be
        # called with a mismatched input tree mid-run
        key = (jax.tree.structure(dynamic), shape_key(dynamic)) + static_vals
        exe = executables.get(key)
        if exe is None:
            exe = compile_cached(
                jitted_fn, args, cache_dir, tag=tag, static_argnums=statics
            )
            executables[key] = exe
        return exe(*dynamic)

    return call
