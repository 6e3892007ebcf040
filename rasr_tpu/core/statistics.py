"""Runtime statistics, timers and profiling hooks.

Reference: src/Core/StopWatch.hh, Statistics.hh, per-segment RTF channels
(src/Flf/Recognizer.cc:510-511) and search-space statistics
(src/Search/AdvancedTreeSearch/SearchSpaceStatistics.cc).  Adds the
TPU-side hook the reference lacks: jax.profiler trace capture around any
scope.
"""

from __future__ import annotations

import contextlib
import math
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


class StopWatch:
    def __init__(self):
        self.reset()

    def reset(self) -> None:
        self._start: Optional[float] = None
        self.elapsed = 0.0

    def start(self) -> "StopWatch":
        self._start = time.perf_counter()
        return self

    def stop(self) -> float:
        if self._start is not None:
            self.elapsed += time.perf_counter() - self._start
            self._start = None
        return self.elapsed

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()


@dataclass
class Statistics:
    """min/max/mean/variance accumulator (reference Core::Statistics)."""
    name: str = ""
    n: int = 0
    total: float = 0.0
    total_sq: float = 0.0
    minimum: float = math.inf
    maximum: float = -math.inf

    def __iadd__(self, value: float) -> "Statistics":
        self.add(value)
        return self

    def add(self, value: float) -> None:
        self.n += 1
        self.total += value
        self.total_sq += value * value
        self.minimum = min(self.minimum, value)
        self.maximum = max(self.maximum, value)

    @property
    def mean(self) -> float:
        return self.total / self.n if self.n else 0.0

    @property
    def variance(self) -> float:
        if not self.n:
            return 0.0
        return max(self.total_sq / self.n - self.mean ** 2, 0.0)

    def report(self) -> str:
        return (f"{self.name}: n={self.n} mean={self.mean:.4f} "
                f"min={self.minimum:.4f} max={self.maximum:.4f} "
                f"sd={math.sqrt(self.variance):.4f}")


class SearchSpaceStatistics:
    """Per-segment search statistics (hypotheses before/after pruning,
    word ends, scores) as in the reference searchSpace channels."""

    def __init__(self):
        self.stats: Dict[str, Statistics] = {}

    def add(self, key: str, value: float) -> None:
        if key not in self.stats:
            self.stats[key] = Statistics(key)
        self.stats[key].add(value)

    def report(self) -> str:
        return "\n".join(s.report() for s in self.stats.values())


@contextlib.contextmanager
def profiler_trace(log_dir: str) -> Iterator[None]:
    """Capture a jax profiler trace (TensorBoard-viewable) around a scope —
    the TPU-native replacement for the reference's wall-clock channels."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(channel=None, name: str = "") -> Iterator[StopWatch]:
    """Time a scope; optionally write '<name> <seconds>' to a channel."""
    sw = StopWatch().start()
    try:
        yield sw
    finally:
        sw.stop()
        if channel is not None and getattr(channel, "is_open", lambda: False)():
            channel.write(f"<{name or 'elapsed'}> {sw.elapsed:.6f}\n")
