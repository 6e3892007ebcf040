"""Per-hypothesis state compression for search-time caches.

The reference quantizes cached LM/NN hidden states per hypothesis so
wide beams and long segments fit in memory
(src/Nn/CompressedVector.hh:52,90;
src/Nn/FixedQuantizationCompressedVectorFactory.hh;
src/Lm/RecurrentLanguageModel.hh:292-293 `state-compression` /
`nn-output-compression`).  This module is the shared codec: opt-in int8
affine quantization with per-array scale/offset, used by the neural LM's
score-row cache and the transducer's per-prefix prediction-state cache.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

MODES = (None, "int8")


class StateCodec:
    """Encode/decode numpy state arrays for a hypothesis cache.

    mode=None stores arrays untouched; mode="int8" stores uint8 with a
    per-array affine (lo, scale) — 4x smaller than float32 with
    max-abs-error <= range/510."""

    def __init__(self, mode: Optional[str] = None):
        if mode not in MODES:
            raise ValueError(f"unknown state-compression mode {mode!r}; "
                             f"known: {MODES}")
        self.mode = mode

    def encode(self, x: np.ndarray):
        if self.mode is None:
            return x
        x = np.asarray(x)
        lo = float(x.min())
        hi = float(x.max())
        scale = max(hi - lo, 1e-12) / 255.0
        q = np.clip(np.round((x - lo) / scale), 0, 255).astype(np.uint8)
        return (q, np.float32(lo), np.float32(scale), x.dtype)

    def decode(self, packed) -> np.ndarray:
        if self.mode is None:
            return packed
        q, lo, scale, dtype = packed
        return (q.astype(np.float32) * float(scale)
                + float(lo)).astype(dtype)

    def nbytes(self, packed) -> int:
        if self.mode is None:
            return packed.nbytes
        return packed[0].nbytes + 8
