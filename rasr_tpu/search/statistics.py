"""Search-space statistics.

Re-creates the reference's per-segment search-space statistics that the
word-conditioned search logs and the analog tool aggregates
(src/Search/Search.hh SearchSpaceStatistics; Tools/Analog/stats/
searchSpace.py reads the 'search-space-statistics' container with
min/avg/max per named series: states/trees/word-ends before and after
pruning, word ends after recombination, ...).
"""

from __future__ import annotations

from typing import Dict, List


class SearchSpaceStatistics:
    """Named per-frame series, summarized min/avg/max per segment."""

    def __init__(self):
        self._series: Dict[str, List[float]] = {}

    def add(self, name: str, value: float) -> None:
        self._series.setdefault(name, []).append(float(value))

    def reset(self) -> None:
        self._series.clear()

    def values(self, name: str) -> List[float]:
        """Raw per-frame series for one counter ([] when never recorded)."""
        return self._series.get(name, [])

    def summary(self) -> Dict[str, Dict[str, float]]:
        out: Dict[str, Dict[str, float]] = {}
        for name, vals in self._series.items():
            if not vals:
                continue
            out[name] = {
                "min": min(vals),
                "avg": sum(vals) / len(vals),
                "max": max(vals),
                "n": len(vals),
            }
        return out

    def format(self) -> str:
        lines = []
        for name, s in sorted(self.summary().items()):
            lines.append(f"{name}: min {s['min']:.0f} "
                         f"avg {s['avg']:.1f} max {s['max']:.0f}")
        return "\n".join(lines)
