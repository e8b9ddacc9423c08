"""Profiling and tracing utilities.

The observability analog of the reference's PIX markers + stats readback
(SURVEY.md 5.1: PIXScopedEvent around every pass, shader-side wave/pixel
atomics, UI ms/frame counters):

- `scope(name)`: wraps jax.profiler/jax.named_scope so passes show up
  named in TensorBoard/Perfetto traces.
- `trace_to(dir)`: context manager around jax.profiler.trace.
- `FrameStats`: rolling per-pass wall-clock stats (ms/frame, rays/s,
  live-lane fraction) — the UIController counter panel's data source.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict, deque


@contextlib.contextmanager
def scope(name: str):
    """Named scope visible in XLA/profiler traces + wall-clock timing."""
    import jax

    with jax.named_scope(name):
        yield


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a jax profiler trace (open in TensorBoard / Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameStats:
    """Rolling frame statistics (window of `window` frames)."""

    def __init__(self, window: int = 30):
        self.window = window
        self._times = defaultdict(lambda: deque(maxlen=window))
        self._counters = defaultdict(lambda: deque(maxlen=window))

    @contextlib.contextmanager
    def time_pass(self, name: str):
        t0 = time.perf_counter()
        yield
        self._times[name].append(time.perf_counter() - t0)

    def add_counter(self, name: str, value: float):
        self._counters[name].append(float(value))

    def mean_ms(self, name: str) -> float:
        d = self._times.get(name)
        return 1000.0 * sum(d) / len(d) if d else 0.0

    def mean_counter(self, name: str) -> float:
        d = self._counters.get(name)
        return sum(d) / len(d) if d else 0.0

    def summary(self) -> str:
        parts = [
            f"{k}: {self.mean_ms(k):.1f}ms" for k in sorted(self._times)
        ]
        parts += [
            f"{k}: {self.mean_counter(k):.3g}" for k in sorted(self._counters)
        ]
        return " | ".join(parts)
