"""Profiling: jax.profiler trace capture + phase wall timers.

The reference has no active profiling (its Lightning profiler wiring is
commented out, reference: train.py:89-90,101; inference timing is one
wall-clock sum, inferencer.py:271-281). Here tracing is a first-class flag:
set config.TRACE_DIR (or pass trace_dir) to capture an XLA trace viewable in
TensorBoard/Perfetto, and use `phase_timer` for host-side phase accounting.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """jax.profiler trace if trace_dir is set, else no-op."""
    if trace_dir:
        import jax

        with jax.profiler.trace(trace_dir):
            yield
    else:
        yield


class PhaseTimers:
    """Accumulating named wall-clock timers."""

    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.time()
        try:
            yield
        finally:
            self.totals[name] += time.time() - t0
            self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "count": self.counts[name]}
            for name in self.totals
        }
