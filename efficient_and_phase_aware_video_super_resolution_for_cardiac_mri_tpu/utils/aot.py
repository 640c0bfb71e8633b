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

Operational note: enable the AOT cache from process start.  If the same
program was already jit-compiled in this process while jax's persistent
compilation cache was warm, XLA:CPU's serializer can emit a blob missing
function bodies; :func:`_validate_payload` catches that at store time and the
entry is skipped with a warning (serving then falls back to normal compiles —
never wrong, just uncached).

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


def backend_fingerprint() -> str:
    """Everything an executable is specialized to besides the program."""
    devs = jax.devices()
    return json.dumps(
        {
            "format": _FORMAT_VERSION,
            "jax": jax.__version__,
            "platform": devs[0].platform,
            "device_kind": devs[0].device_kind,
            "n_devices": len(devs),
            "process_count": jax.process_count(),
        },
        sort_keys=True,
    )


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
    """Run the deserialized executable once before publishing the entry.

    Upstream trap this guards against: when the same program was earlier
    restored from jax's persistent *compilation* cache in this process,
    ``serialize`` can emit a blob referencing function bodies that are not
    embedded — its reload then dies at run time with "NOT_FOUND: Buffer
    Definition Event: Function ... not found" (XLA:CPU, jax 0.9), even in a
    fresh process.  Executing the round-tripped executable on COPIES of the
    args (donation-safe, sharding-preserving) and touching one element of
    every output buffer surfaces exactly that failure at store time.
    """
    import jax.numpy as jnp
    import numpy as np

    exe = _load_payload(payload)
    dynamic = tuple(a for i, a in enumerate(args) if i not in static_argnums)
    copies = jax.tree.map(jnp.copy, dynamic)
    out = exe(*copies)
    for leaf in jax.tree.leaves(out):
        probe = leaf.ravel()[:1] if getattr(leaf, "ndim", 0) else leaf
        np.asarray(probe)  # device→host forces the buffer's definition event


def compile_cached(jitted_fn, args, cache_dir, tag: str = "step",
                   static_argnums: tuple = ()):
    """``jitted_fn.lower(*args).compile()`` with a disk-backed executable cache.

    Returns a ``jax.stages.Compiled`` (its call takes only the *dynamic*
    arguments — static_argnums values are baked in).  On cache miss the
    compiled executable is serialized, VALIDATED by a round-trip execution,
    and published to ``cache_dir`` atomically; on hit the compile is skipped
    entirely.  Any load/serialize/validate failure degrades to a normal
    compile (the cache can never break correctness).
    """
    from jax.experimental.serialize_executable import serialize

    lowered = jitted_fn.lower(*args)
    key_material = backend_fingerprint() + lowered.as_text()
    key = hashlib.sha256(key_material.encode()).hexdigest()[:32]
    cache_dir = Path(cache_dir)
    path = cache_dir / f"{tag}-{key}.jaxexe"
    if path.exists():
        try:
            with open(path, "rb") as f:
                compiled = _load_payload(pickle.load(f))
            LOG.info(f"AOT cache hit: {path.name} (compile skipped).")
            return compiled
        except Exception as e:  # incompatible/corrupt entry → recompile
            LOG.warning(f"AOT cache entry {path.name} unusable ({e!r}); recompiling.")
    # Compile with jax's persistent *compilation* cache disabled: serializing
    # an executable that was RESTORED from that cache produces a blob whose
    # reload dies at run time ("Buffer Definition Event: Function ... not
    # found" — reproduced on XLA:CPU, jax 0.9).  A genuine compile serializes
    # correctly, and after the store this AOT cache serves future restarts
    # anyway, so the lost cache hit costs one compile exactly once.
    prev = jax.config.jax_enable_compilation_cache
    try:
        jax.config.update("jax_enable_compilation_cache", False)
        compiled = lowered.compile()
    finally:
        jax.config.update("jax_enable_compilation_cache", prev)
    try:
        device_ids = [d.id for d in compiled._executable.xla_executable.local_devices()]
        payload = (device_ids, serialize(compiled))
        _validate_payload(payload, args, tuple(static_argnums))
        blob = pickle.dumps(payload)
        cache_dir.mkdir(parents=True, exist_ok=True)
        # atomic publish: a concurrent reader sees either nothing or a full file
        fd, tmp = tempfile.mkstemp(dir=cache_dir, suffix=".tmp")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        except BaseException:
            os.unlink(tmp)
            raise
        LOG.info(f"AOT cache store: {path.name} ({len(blob)} bytes).")
    except Exception as e:  # serialization unsupported on this backend
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
    preserved through serialization (round-trip tested)."""
    statics = tuple(static_argnums)
    executables: dict = {}

    def call(*args):
        static_vals = tuple(args[i] for i in statics)
        dynamic = tuple(a for i, a in enumerate(args) if i not in statics)
        key = shape_key(dynamic) + static_vals
        exe = executables.get(key)
        if exe is None:
            exe = compile_cached(
                jitted_fn, args, cache_dir, tag=tag, static_argnums=statics
            )
            executables[key] = exe
        return exe(*dynamic)

    return call
