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
