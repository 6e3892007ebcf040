"""Matrix / vector file IO.

Supports the reference's format-qualified matrix files (bin: / xml: /
ascii:, doc/architecture.rst:700-735) used for LDA transforms, means,
covariances.  Binary layout: u32 rows, u32 cols, row-major f32 payload
(little-endian); XML: <matrix-f32 nRows= nColumns=> whitespace numbers.
"""

from __future__ import annotations

import gzip
import io
import re
import struct
from typing import Union

import numpy as np

from ..core.formats import split_qualifier


def _open(path: str, mode: str):
    if path.endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_matrix(path: str) -> np.ndarray:
    fmt, real = split_qualifier(path)
    if fmt == "xml" or (not fmt and real.endswith((".xml", ".xml.gz"))):
        return _read_matrix_xml(real)
    if fmt in ("ascii", "txt"):
        return np.loadtxt(real, dtype=np.float32, ndmin=2)
    return _read_matrix_bin(real)


def _read_matrix_bin(path: str) -> np.ndarray:
    with _open(path, "rb") as fh:
        rows, cols = struct.unpack("<II", fh.read(8))
        data = np.frombuffer(fh.read(rows * cols * 4), dtype="<f4")
    return data.reshape(rows, cols).copy()


_NUM_RE = re.compile(r"[-+0-9.eE]+")


def _read_matrix_xml(path: str) -> np.ndarray:
    import xml.etree.ElementTree as ET
    with _open(path, "rb") as fh:
        root = ET.parse(fh).getroot()
    elem = root if root.tag.startswith("matrix") else root.find(".//*[@nRows]")
    if elem is None:
        raise ValueError(f"{path}: no matrix element found")
    rows = int(elem.get("nRows"))
    cols = int(elem.get("nColumns"))
    values = [float(x) for x in (elem.text or "").split()]
    if len(values) != rows * cols:
        raise ValueError(f"{path}: expected {rows * cols} values, got {len(values)}")
    return np.asarray(values, dtype=np.float32).reshape(rows, cols)


def write_matrix(path: str, matrix: np.ndarray) -> None:
    fmt, real = split_qualifier(path)
    m = np.asarray(matrix, dtype=np.float32)
    if m.ndim != 2:
        raise ValueError("write_matrix expects 2-D")
    if fmt == "xml" or (not fmt and real.endswith(".xml")):
        with _open(real, "wt") as fh:
            fh.write(f'<matrix-f32 nRows="{m.shape[0]}" nColumns="{m.shape[1]}">\n')
            for row in m:
                fh.write(" ".join(repr(float(v)) for v in row) + "\n")
            fh.write("</matrix-f32>\n")
    elif fmt in ("ascii", "txt"):
        np.savetxt(real, m)
    else:
        with _open(real, "wb") as fh:
            fh.write(struct.pack("<II", m.shape[0], m.shape[1]))
            fh.write(m.astype("<f4").tobytes())


def read_vector(path: str) -> np.ndarray:
    fmt, real = split_qualifier(path)
    if fmt == "xml" or (not fmt and real.endswith((".xml", ".xml.gz"))):
        import xml.etree.ElementTree as ET
        with _open(real, "rb") as fh:
            root = ET.parse(fh).getroot()
        return np.asarray([float(x) for x in (root.text or "").split()],
                          dtype=np.float32)
    if fmt in ("ascii", "txt"):
        return np.loadtxt(real, dtype=np.float32)
    with _open(real, "rb") as fh:
        (n,) = struct.unpack("<I", fh.read(4))
        return np.frombuffer(fh.read(n * 4), dtype="<f4").copy()


def write_vector(path: str, vector: np.ndarray) -> None:
    fmt, real = split_qualifier(path)
    v = np.asarray(vector, dtype=np.float32).ravel()
    if fmt == "xml" or (not fmt and real.endswith(".xml")):
        with _open(real, "wt") as fh:
            fh.write(f'<vector-f32 size="{v.size}">\n')
            fh.write(" ".join(repr(float(x)) for x in v))
            fh.write("\n</vector-f32>\n")
    elif fmt in ("ascii", "txt"):
        np.savetxt(real, v)
    else:
        with _open(real, "wb") as fh:
            fh.write(struct.pack("<I", v.size))
            fh.write(v.astype("<f4").tobytes())
