"""Alignments: (frame, allophone-state id, weight) sequences with cache IO.

Reference: src/Speech/Alignment.hh:63,171 — alignments are vectors of
(time frame, allophone state, weight) items with binary/XML IO, stored in
archives keyed by segment name and consumed by accumulation, LDA and CART
training.  Cache item layout here:

    string "flow-alignment"
    u32 n_items
    per item: u32 frame, u32 allophone_state_id (packed 26+6 bit), f32 weight
"""

from __future__ import annotations

import struct
from io import BytesIO
from typing import List, Optional, Tuple

import numpy as np

from ..core.archive import open_archive

DATATYPE = "flow-alignment"


class Alignment:
    def __init__(self, frames: np.ndarray, state_ids: np.ndarray,
                 weights: Optional[np.ndarray] = None):
        self.frames = np.asarray(frames, dtype=np.uint32)
        self.state_ids = np.asarray(state_ids, dtype=np.uint32)
        self.weights = (np.ones(len(self.frames), np.float32)
                        if weights is None
                        else np.asarray(weights, dtype=np.float32))

    def __len__(self):
        return len(self.frames)

    @classmethod
    def from_viterbi(cls, labels: np.ndarray) -> "Alignment":
        """From a per-frame allophone-state label path (aligner output)."""
        labels = np.asarray(labels)
        return cls(np.arange(len(labels)), labels)

    def pack(self) -> bytes:
        buf = BytesIO()
        name = DATATYPE.encode()
        buf.write(struct.pack("<I", len(name)))
        buf.write(name)
        buf.write(struct.pack("<I", len(self.frames)))
        for f, s, w in zip(self.frames, self.state_ids, self.weights):
            buf.write(struct.pack("<IIf", int(f), int(s), float(w)))
        return buf.getvalue()

    @classmethod
    def unpack(cls, data: bytes) -> "Alignment":
        off = 0
        (nlen,) = struct.unpack_from("<I", data, off)
        off += 4
        datatype = data[off:off + nlen].decode()
        off += nlen
        if datatype != DATATYPE:
            raise ValueError(f"not an alignment item: {datatype!r}")
        (n,) = struct.unpack_from("<I", data, off)
        off += 4
        frames = np.empty(n, np.uint32)
        states = np.empty(n, np.uint32)
        weights = np.empty(n, np.float32)
        for i in range(n):
            frames[i], states[i], weights[i] = struct.unpack_from(
                "<IIf", data, off)
            off += 12
        return cls(frames, states, weights)

    def write_xml(self, fh) -> None:
        fh.write(f'<alignment n="{len(self)}">\n')
        for f, s, w in zip(self.frames, self.state_ids, self.weights):
            fh.write(f"  <item t=\"{f}\" state=\"{s}\" weight=\"{w}\"/>\n")
        fh.write("</alignment>\n")


class AlignmentCacheWriter:
    def __init__(self, path: str, mode: str = "w"):
        self.archive = open_archive(path, mode)

    def write(self, segment_name: str, alignment: Alignment) -> None:
        self.archive.write(segment_name, alignment.pack())

    def close(self):
        self.archive.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class AlignmentCacheReader:
    def __init__(self, path: str):
        self.archive = open_archive(path, "r")

    def keys(self):
        return self.archive.keys()

    def read(self, segment_name: str) -> Alignment:
        return Alignment.unpack(self.archive.read(segment_name))

    def close(self):
        self.archive.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
