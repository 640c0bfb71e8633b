"""Double-buffered dispatch: finish item k one step behind its dispatch.

The eval loops dispatch device work for item k+1 BEFORE fetching item k's
results, so the next item's host prep + device compute overlap the previous
item's device→host fetch (~33 ms/trip through a tunneled backend —
PERF_NOTES "Pipelined predictor loop").  Finish order equals push order,
which export assembly (e.g. the SISR cross-item GIFs) relies on.

Shared by ``runner/predictors.py`` and ``tools/batch_infer.py``; the
trainer's analogue is its ``_device_prefetch`` (input-side prefetch rather
than output-side fetch deferral).
"""
from __future__ import annotations

from typing import Callable


class DoubleBuffer:
    """Hold one in-flight item; ``finish`` runs exactly once per pushed item,
    in push order, one push behind (or immediately when ``eager``)."""

    def __init__(self, finish: Callable, eager: bool = False):
        self._finish = finish
        self._eager = eager
        self._pending = None

    def push(self, item) -> None:
        if self._pending is not None:
            self._finish(self._pending)
            self._pending = None
        if self._eager:
            self._finish(item)
        else:
            self._pending = item

    def drain(self) -> None:
        """Finish the last in-flight item (call after the dispatch loop)."""
        if self._pending is not None:
            self._finish(self._pending)
            self._pending = None
