"""Flow data model.

The reference moves ref-counted `Flow::Data` packets with timestamps through
queues (src/Flow/Data.hh:34, src/Flow/Timestamp.hh:39).  The TPU rebuild
replaces per-packet streaming with whole-segment arrays: a `Stream` carries
one segment's worth of data plus the attributes that the reference
negotiates via `configure()` (sample-rate, datatype — src/Flow/Attributes.hh).
Frame timestamps are recovered analytically from (start_time, shift).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Any, Dict, Optional

import jax.numpy as jnp


@dataclass
class Stream:
    """One segment of data flowing through a (compiled) network.

    data: (N,) samples, (T, L) frames, or (T, D) feature vectors.
    sample_rate: rate along the leading time axis (samples/s or frames/s).
    start_time: segment start in seconds.
    frame_shift: seconds between consecutive leading-axis entries
                 (1/sample_rate unless a windowing node changed it).
    """
    data: Any
    sample_rate: float
    start_time: float = 0.0
    frame_shift: Optional[float] = None
    meta: Dict[str, Any] = field(default_factory=dict)

    @property
    def shift(self) -> float:
        return self.frame_shift if self.frame_shift is not None else 1.0 / self.sample_rate

    def with_data(self, data, **changes) -> "Stream":
        return replace(self, data=data, **changes)

    def timestamps(self):
        """(start, end) times per leading-axis entry."""
        import numpy as np
        n = self.data.shape[0]
        starts = self.start_time + np.arange(n) * self.shift
        dur = self.meta.get("frame_duration", self.shift)
        return starts, starts + dur


# ---------------------------------------------------------------------------
# stream sentinels (reference: src/Flow/Data.hh sentinel packets) — used by
# incremental drivers (OnlineRecognizer, synchronization nodes) to signal
# "no more data ever" (EOS) vs "no data buffered right now" (OOD).
# ---------------------------------------------------------------------------


class _Sentinel:
    __slots__ = ("name",)

    def __init__(self, name: str):
        self.name = name

    def __repr__(self):
        return f"<flow:{self.name}>"

    def __bool__(self):
        return False


#: end-of-stream: the producing node will never emit another packet.
END_OF_STREAM = _Sentinel("end-of-stream")
#: out-of-data: nothing buffered now, but more may arrive (streaming).
OUT_OF_DATA = _Sentinel("out-of-data")


def is_sentinel(obj) -> bool:
    return isinstance(obj, _Sentinel)


# ---------------------------------------------------------------------------
# attributes (reference: src/Flow/Attributes.hh) — string-valued network
# metadata negotiated node-to-node before data flows (datatype, sample-rate,
# id, filename, track-count ...).  merge() keeps existing values, matching
# Attributes::merge which only adds absent names.
# ---------------------------------------------------------------------------


class Attributes:
    """String attribute set with reference merge semantics."""

    def __init__(self, values: Optional[Dict[str, str]] = None):
        self._values: Dict[str, str] = dict(values or {})

    def get(self, name: str, default: str = "") -> str:
        return self._values.get(name, default)

    def set(self, name: str, value) -> None:
        self._values[name] = str(value)

    def merge(self, other: "Attributes") -> "Attributes":
        for k, v in other._values.items():
            self._values.setdefault(k, v)
        return self

    def copy(self) -> "Attributes":
        return Attributes(self._values)

    def items(self):
        return self._values.items()

    def __contains__(self, name: str) -> bool:
        return name in self._values

    def __eq__(self, other) -> bool:
        return isinstance(other, Attributes) and self._values == other._values

    def __repr__(self):
        inner = ", ".join(f"{k}={v!r}" for k, v in sorted(self._values.items()))
        return f"Attributes({inner})"
