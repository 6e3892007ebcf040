"""Configurable multi-dimensional Flf semirings.

The reference Flf framework attaches an n-dimensional score vector to
every lattice arc; a ``Semiring`` names the dimensions (keys), carries a
scale per dimension and a semiring type (tropical/log) that fixes how
projected weights combine (src/Flf/FlfCore/Semiring.hh: Semiring over
ScoresRef with `keys_`, `scales_`, Zero/One constants; construction from
config in src/Flf/FlfCore/Utility + NodeRegistration `semiring` params).

Here the score block of a whole lattice is one ``(n_arcs, n_dims)``
numpy array, so projection (scores @ scales), rescaling and dimension
arithmetic are single vectorized operations instead of per-arc object
math — the shape that feeds directly into batched posterior computation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

TROPICAL = "tropical"
LOG = "log"

#: the reference encodes semiring Zero as Score::max (Semiring.hh:46)
ZERO_SCORE = np.inf


@dataclass(frozen=True)
class FlfSemiring:
    """Named, scaled score dimensions + combination type.

    keys   — dimension names, e.g. ("am", "lm")
    scales — one linear scale per dimension; the *projected* weight of a
             score vector v is sum_i scales[i] * v[i]
    stype  — "tropical" (min/+, Viterbi) or "log" (-logsumexp/+, posterior)
    """

    keys: Tuple[str, ...] = ("am", "lm")
    scales: Tuple[float, ...] = None  # type: ignore[assignment]
    stype: str = TROPICAL

    def __post_init__(self):
        if self.scales is None:
            object.__setattr__(self, "scales", (1.0,) * len(self.keys))
        if len(self.scales) != len(self.keys):
            raise ValueError(
                f"semiring: {len(self.keys)} keys but {len(self.scales)} "
                f"scales")
        if self.stype not in (TROPICAL, LOG):
            raise ValueError(f"semiring type {self.stype!r}")

    # -- shape ---------------------------------------------------------------

    @property
    def n(self) -> int:
        return len(self.keys)

    def id_of(self, key: str) -> int:
        try:
            return self.keys.index(key)
        except ValueError:
            raise KeyError(f"semiring has no dimension {key!r}; "
                           f"known: {self.keys}") from None

    def has(self, key: str) -> bool:
        return key in self.keys

    # -- score algebra ---------------------------------------------------------

    def zeros(self, n_rows: int = 1) -> np.ndarray:
        return np.zeros((n_rows, self.n), np.float64)

    def project(self, scores: np.ndarray) -> np.ndarray:
        """(A, n) score block -> (A,) combined weights (scales applied)."""
        scores = np.asarray(scores, np.float64)
        if scores.ndim == 1:
            return float(scores @ np.asarray(self.scales))
        return scores @ np.asarray(self.scales, np.float64)

    def collect(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Semiring 'plus' on projected weights (min for tropical,
        -logaddexp for log)."""
        if self.stype == TROPICAL:
            return np.minimum(a, b)
        return -np.logaddexp(-np.asarray(a), -np.asarray(b))

    # -- derivation -------------------------------------------------------------

    def with_scales(self, scales: Sequence[float]) -> "FlfSemiring":
        return FlfSemiring(self.keys, tuple(float(s) for s in scales),
                           self.stype)

    def with_scale(self, key: str, scale: float) -> "FlfSemiring":
        scales = list(self.scales)
        scales[self.id_of(key)] = float(scale)
        return FlfSemiring(self.keys, tuple(scales), self.stype)

    def with_type(self, stype: str) -> "FlfSemiring":
        return FlfSemiring(self.keys, self.scales, stype)

    def extended(self, key: str, scale: float = 1.0) -> "FlfSemiring":
        """Append a new dimension (reference extend-by-* nodes create a
        score dimension when asked for an unknown key)."""
        if key in self.keys:
            return self
        return FlfSemiring(self.keys + (key,), self.scales + (float(scale),),
                           self.stype)

    def projected(self, keys: Sequence[str]) -> Tuple["FlfSemiring", List[int]]:
        """Sub-semiring over `keys` plus the column indices to gather."""
        ids = [self.id_of(k) for k in keys]
        return FlfSemiring(tuple(keys), tuple(self.scales[i] for i in ids),
                           self.stype), ids

    # -- config -----------------------------------------------------------------

    @classmethod
    def from_config(cls, config, default: Optional["FlfSemiring"] = None
                    ) -> "FlfSemiring":
        """Build from a `[*.semiring]`-style section:

            type   = tropical | log
            keys   = am lm
            scales = 1.0 20.0
        """
        keys_s = config.get("keys")
        if not keys_s:
            return default or cls()
        keys = tuple(keys_s.split())
        scales_s = config.get("scales")
        scales = (tuple(float(x) for x in scales_s.split())
                  if scales_s else (1.0,) * len(keys))
        stype = config.get("type") or TROPICAL
        return cls(keys, scales, stype)

    def describe(self) -> str:
        dims = " ".join(f"{k}/{s:g}" for k, s in zip(self.keys, self.scales))
        return f"{self.stype}({dims})"
