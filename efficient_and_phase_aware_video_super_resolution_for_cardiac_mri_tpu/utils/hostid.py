"""Host-CPU ISA fingerprint (jax-free on purpose).

XLA:CPU AOT results embed the compile machine's ISA features; loading them on
a different host is at best warning spam and at worst SIGILL (observed:
entries cached on one build host reloaded on another with 'Target machine
feature ... is not supported on the host machine').  Keying caches by this
hash gives each distinct host CPU its own entries.

Kept free of jax (and of this package's heavier imports) so the repo-root
``conftest.py`` can load it BY FILE PATH before any backend env is set —
importing it as a package submodule would execute ``utils/__init__``, which
pulls jax.  Consumers: ``utils/aot.backend_fingerprint`` (import) and
``conftest.py`` (importlib by path).
"""
from __future__ import annotations

import hashlib
import platform


def host_cpu_fingerprint() -> str:
    """Short stable hash of the host CPU's ISA feature set."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
            else:
                feats = platform.machine()
    except OSError:  # non-Linux
        feats = platform.machine()
    return hashlib.sha256(feats.encode()).hexdigest()[:12]
