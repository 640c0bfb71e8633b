"""Tracing / profiling hooks (the reference has none — SURVEY.md §5).

* ``trace(label)`` — context manager around ``jax.profiler`` traces, enabled
  by setting ``EVSR_PROFILE_DIR``; each labelled region becomes a TensorBoard-
  viewable trace under that directory.
* ``Throughput`` — steps/sec + frames/sec/chip counters (the north-star
  metrics), used by the trainer and predictors.
"""
from __future__ import annotations

import contextlib
import os
import time


@contextlib.contextmanager
def trace(label: str):
    """Profile the enclosed region when EVSR_PROFILE_DIR is set (no-op cost
    otherwise)."""
    profile_dir = os.environ.get("EVSR_PROFILE_DIR")
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(os.path.join(profile_dir, label)):
        yield


class Throughput:
    """Windowed steps/sec and frames/sec counters."""

    def __init__(self):
        self.reset()

    def reset(self):
        self._t0 = time.perf_counter()
        self.steps = 0
        self.frames = 0

    def update(self, steps: int = 1, frames: int = 0):
        self.steps += steps
        self.frames += frames

    @property
    def elapsed(self) -> float:
        return max(time.perf_counter() - self._t0, 1e-9)

    def stats(self) -> dict:
        return {
            "steps_per_sec": self.steps / self.elapsed,
            "frames_per_sec": self.frames / self.elapsed,
            "steps": self.steps,
            "frames": self.frames,
            "seconds": self.elapsed,
        }
