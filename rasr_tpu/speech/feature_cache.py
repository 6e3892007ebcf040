"""Feature caches: archive-backed per-segment feature storage.

Byte-compatible with the reference Flow cache format
(src/Flow/Cache.cc readData/writeData + src/Flow/Datatype.cc
writeGatheredData + src/Flow/Vector.hh write + src/Flow/Timestamp.cc):

    item := string datatype-name ("vector-f32": u32 len + utf8)
            u32 n-frames
            per frame: u32 dim, dim * f32, f64 start-time, f64 end-time

Items are keyed by segment full name inside a FileArchive/Bundle/Directory
archive (doc/file_formats/archive.rst).
"""

from __future__ import annotations

import struct
from io import BytesIO
from typing import Optional, Tuple

import numpy as np

from ..core.archive import Archive, open_archive

VECTOR_F32 = "vector-f32"


def pack_features(features: np.ndarray, start_times: np.ndarray,
                  end_times: np.ndarray, datatype: str = VECTOR_F32) -> bytes:
    """(T, D) float32 features + per-frame times -> cache item bytes."""
    feats = np.asarray(features, dtype="<f4")
    T, D = feats.shape
    buf = BytesIO()
    name = datatype.encode("utf-8")
    buf.write(struct.pack("<I", len(name)))
    buf.write(name)
    buf.write(struct.pack("<I", T))
    dim = struct.pack("<I", D)
    for t in range(T):
        buf.write(dim)
        buf.write(feats[t].tobytes())
        buf.write(struct.pack("<dd", float(start_times[t]), float(end_times[t])))
    return buf.getvalue()


def unpack_features(data: bytes) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cache item bytes -> (features (T, D), start_times, end_times)."""
    off = 0
    (nlen,) = struct.unpack_from("<I", data, off)
    off += 4 + nlen
    datatype = data[4:4 + nlen].decode("utf-8")
    if not datatype.endswith("f32"):
        raise ValueError(f"unsupported cache datatype {datatype!r}")
    (n,) = struct.unpack_from("<I", data, off)
    off += 4
    feats = []
    starts = np.empty(n, dtype=np.float64)
    ends = np.empty(n, dtype=np.float64)
    for t in range(n):
        (dim,) = struct.unpack_from("<I", data, off)
        off += 4
        feats.append(np.frombuffer(data, dtype="<f4", count=dim, offset=off))
        off += 4 * dim
        starts[t], ends[t] = struct.unpack_from("<dd", data, off)
        off += 16
    return (np.stack(feats) if feats else np.zeros((0, 0), np.float32),
            starts, ends)


class FeatureCacheWriter:
    def __init__(self, path: str, mode: str = "w"):
        self.archive = open_archive(path, mode)

    def write(self, segment_name: str, features: np.ndarray,
              start_times: Optional[np.ndarray] = None,
              end_times: Optional[np.ndarray] = None,
              frame_shift: float = 0.01, frame_duration: float = 0.025,
              start_offset: float = 0.0) -> None:
        T = len(features)
        if start_times is None:
            start_times = start_offset + np.arange(T) * frame_shift
        if end_times is None:
            end_times = start_times + frame_duration
        self.archive.write(segment_name,
                           pack_features(features, start_times, end_times))

    def close(self):
        self.archive.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FeatureCacheReader:
    def __init__(self, path: str):
        self.archive = open_archive(path, "r")

    def keys(self):
        return self.archive.keys()

    def read(self, segment_name: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        return unpack_features(self.archive.read(segment_name))

    def features(self, segment_name: str) -> np.ndarray:
        return self.read(segment_name)[0]

    def close(self):
        self.archive.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
