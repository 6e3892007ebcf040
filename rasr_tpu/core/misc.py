"""Miscellaneous core utilities.

Reference: src/Core/ProgressIndicator.hh (terminal progress meter),
src/Core/Dependency.hh (artifact dependency tracking: generated files
record what they were built from, enabling consistency checks)."""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Dict, Optional


class ProgressIndicator:
    """Terminal progress meter (rate-limited updates, tty-aware)."""

    def __init__(self, task: str, unit: str = "items", total: int = 0,
                 stream=None, min_interval: float = 0.2):
        self.task = task
        self.unit = unit
        self.total = total
        self.count = 0
        self._stream = stream if stream is not None else sys.stderr
        self._interval = min_interval
        self._last = 0.0
        self._start = time.perf_counter()
        self._is_tty = hasattr(self._stream, "isatty") and self._stream.isatty()

    def notify(self, count: Optional[int] = None) -> None:
        self.count = self.count + 1 if count is None else count
        now = time.perf_counter()
        if now - self._last < self._interval:
            return
        self._last = now
        elapsed = now - self._start
        rate = self.count / elapsed if elapsed > 0 else 0.0
        if self.total:
            pct = 100.0 * self.count / self.total
            text = (f"{self.task}: {self.count}/{self.total} {self.unit} "
                    f"({pct:.1f}%, {rate:.1f}/s)")
        else:
            text = f"{self.task}: {self.count} {self.unit} ({rate:.1f}/s)"
        end = "\r" if self._is_tty else "\n"
        self._stream.write(text + end)

    def finish(self) -> None:
        elapsed = time.perf_counter() - self._start
        self._stream.write(f"{self.task}: {self.count} {self.unit} "
                           f"in {elapsed:.1f}s\n")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.finish()


@dataclass
class DependencySet:
    """Tracks what an artifact was generated from (file content hashes +
    declared values); persisted next to the artifact and checked on reuse
    (reference Core::DependencySet semantics)."""
    values: Dict[str, str] = field(default_factory=dict)

    def add_value(self, name: str, value) -> None:
        self.values[name] = str(value)

    def add_file(self, name: str, path: str) -> None:
        h = hashlib.sha256()
        with open(path, "rb") as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b""):
                h.update(chunk)
        self.values[name] = f"sha256:{h.hexdigest()}"

    def write(self, path: str) -> None:
        with open(path, "w", encoding="utf-8") as fh:
            json.dump(self.values, fh, indent=2, sort_keys=True)

    @classmethod
    def read(cls, path: str) -> "DependencySet":
        with open(path, "r", encoding="utf-8") as fh:
            return cls(json.load(fh))

    def satisfies(self, other: "DependencySet") -> bool:
        """True when every dependency recorded in `other` matches ours."""
        return all(self.values.get(k) == v for k, v in other.values.items())
