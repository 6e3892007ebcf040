"""Sparse vectors (reference: src/Sparse/SingleValSparseVector.hh:44,
Sparse/Vector.hh:33 Flow integration).

The reference stores sorted (index, value) pairs with a default value
for inactive entries and iterates rather than random-accessing.  The
TPU-native equivalent keeps the active set as parallel index/value
arrays — gather/segment-sum friendly — with dense conversion for XLA
consumption (sparse layouts don't pay off on the MXU; density wins, so
sparse vectors are a host-side and IO representation here).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterator, Tuple, Union

import numpy as np


@dataclass
class SparseVector:
    size: int
    indices: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.int32))
    values: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.float32))
    default: float = 0.0

    def __post_init__(self):
        self.indices = np.asarray(self.indices, dtype=np.int32)
        self.values = np.asarray(self.values, dtype=np.float32)
        if len(self.indices) != len(self.values):
            raise ValueError("indices/values length mismatch")
        order = np.argsort(self.indices, kind="stable")
        self.indices = self.indices[order]
        self.values = self.values[order]

    # -- construction ------------------------------------------------------

    @classmethod
    def from_dense(cls, dense, default: float = 0.0,
                   tolerance: float = 0.0) -> "SparseVector":
        d = np.asarray(dense)
        active = np.abs(d - default) > tolerance
        return cls(len(d), np.nonzero(active)[0].astype(np.int32),
                   d[active].astype(np.float32), default)

    @classmethod
    def from_pairs(cls, size: int, pairs, default: float = 0.0
                   ) -> "SparseVector":
        idx, vals = zip(*pairs) if pairs else ((), ())
        return cls(size, np.asarray(idx, np.int32),
                   np.asarray(vals, np.float32), default)

    # -- access --------------------------------------------------------------

    @property
    def n_active(self) -> int:
        return len(self.indices)

    def __len__(self) -> int:
        return self.size

    def __iter__(self) -> Iterator[Tuple[int, float]]:
        return iter(zip(self.indices.tolist(), self.values.tolist()))

    def __getitem__(self, index: int) -> float:
        pos = np.searchsorted(self.indices, index)
        if pos < len(self.indices) and self.indices[pos] == index:
            return float(self.values[pos])
        if not 0 <= index < self.size:
            raise IndexError(index)
        return self.default

    def to_dense(self) -> np.ndarray:
        out = np.full(self.size, self.default, dtype=np.float32)
        out[self.indices] = self.values
        return out

    # -- arithmetic ------------------------------------------------------------

    def dot(self, other: Union["SparseVector", np.ndarray]) -> float:
        """Inner product; exact including non-zero defaults."""
        if isinstance(other, SparseVector):
            return float(self.to_dense() @ other.to_dense())
        other = np.asarray(other)
        if self.default == 0.0:
            return float(self.values @ other[self.indices])
        return float(self.to_dense() @ other)

    def scaled(self, factor: float) -> "SparseVector":
        return SparseVector(self.size, self.indices.copy(),
                            self.values * factor, self.default * factor)

    def __add__(self, other: "SparseVector") -> "SparseVector":
        if self.size != other.size:
            raise ValueError("size mismatch")
        if self.default == 0.0 and other.default == 0.0:
            idx = np.concatenate([self.indices, other.indices])
            val = np.concatenate([self.values, other.values])
            uniq, inv = np.unique(idx, return_inverse=True)
            summed = np.zeros(len(uniq), np.float32)
            np.add.at(summed, inv, val)
            return SparseVector(self.size, uniq.astype(np.int32), summed)
        return SparseVector.from_dense(self.to_dense() + other.to_dense())

    # -- IO --------------------------------------------------------------------

    def write(self, stream) -> None:
        """Binary layout: u32 size, u32 n_active, f32 default,
        then (u32 index, f32 value) pairs (reference BinaryStream form)."""
        import struct
        stream.write(struct.pack("<IIf", self.size, self.n_active,
                                 self.default))
        for i, v in zip(self.indices, self.values):
            stream.write(struct.pack("<If", int(i), float(v)))

    @classmethod
    def read(cls, stream) -> "SparseVector":
        import struct
        size, n, default = struct.unpack("<IIf", stream.read(12))
        idx = np.zeros(n, np.int32)
        val = np.zeros(n, np.float32)
        for k in range(n):
            idx[k], val[k] = struct.unpack("<If", stream.read(8))
        return cls(size, idx, val, default)
