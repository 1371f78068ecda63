"""Observability: per-phase timers and device profiling.

The reference's only tracing is the PropertyChangeEvent stream
(BundleAdjustment.java:72 ff., survey section 5).  Here the same state
machine drives structured per-phase timing, and `jax.profiler` traces can be
captured around the estimation for TensorBoard analysis.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from dataclasses import dataclass, field


@dataclass
class PhaseTimer:
    """Accumulates wall-clock per estimation phase; attach via
    ``adjustment.add_property_change_listener(timer.listener)``."""

    totals: dict = field(default_factory=lambda: defaultdict(float))
    counts: dict = field(default_factory=lambda: defaultdict(int))
    events: list = field(default_factory=list)
    _current: str = ""
    _t0: float = 0.0

    def listener(self, name: str, old, new) -> None:
        now = time.perf_counter()
        if self._current:
            self.totals[self._current] += now - self._t0
            self.counts[self._current] += 1
        self._current = name
        self._t0 = now
        self.events.append((now, name, old, new))

    def report(self) -> str:
        if self._current:
            now = time.perf_counter()
            self.totals[self._current] += now - self._t0
            self.counts[self._current] += 1
            self._current = ""
        lines = ["phase                              count      total [s]"]
        for name, total in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            lines.append(f"{name:<32} {self.counts[name]:>6} {total:>14.3f}")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (XLA ops, fusion, HBM traffic) around the
    enclosed block; view with TensorBoard."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
