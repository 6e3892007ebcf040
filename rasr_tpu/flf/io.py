"""Flf-native lattice IO: XML descriptor + binary parts + archives.

The reference Flf format (src/Flf/FlfIo.hh:30-57, FlfIo.cc
writeDescriptor) is an XML descriptor

    <lattice semiring="tropical">
      <structure format="bin" file=".../structure.bin"/>
      <boundaries format="bin" file=".../boundaries.bin"/>
      <scores n="2">
        <dim id="0"><name>am</name></dim>
        <dim id="1"><name>lm</name><scale>20.0</scale></dim>
      </scores>
    </lattice>

referencing binary part files; lattice archives store descriptor + parts
per segment (src/Flf/Archive.cc).  This implementation keeps the same
descriptor structure and part separation but stores each part as a
little-endian numpy block (one (A, D) score block instead of one FSA per
dimension — the arrays are exactly the in-memory SoA representation, so
reading a lattice is a few np.frombuffer calls, no per-arc parsing).

Archives use the byte-compatible Core FileArchive/DirectoryArchive
(core/archive.py), so `archiver` tooling can inspect them.
"""

from __future__ import annotations

import io
import struct
import xml.etree.ElementTree as ET
from typing import Callable, Dict, Iterator, List, Optional

import numpy as np

from ..core.archive import open_archive
from .lattice import FlfLattice
from .semiring import FlfSemiring

_MAGIC = b"FLFLAT1\x00"


# -- binary parts ---------------------------------------------------------------


def _pack_structure(lat: FlfLattice) -> bytes:
    buf = io.BytesIO()
    buf.write(_MAGIC)
    buf.write(struct.pack("<IIII", lat.n_states, lat.n_arcs,
                          lat.initial, len(lat.final_states)))
    buf.write(lat.sources.astype("<u4").tobytes())
    buf.write(lat.targets.astype("<u4").tobytes())
    buf.write(lat.labels.astype("<i4").tobytes())
    buf.write(lat.final_states.astype("<u4").tobytes())
    return buf.getvalue()


def _unpack_structure(data: bytes) -> Dict:
    if data[:8] != _MAGIC:
        raise ValueError("not an flf structure part")
    S, A, initial, F = struct.unpack_from("<IIII", data, 8)
    off = 8 + 16
    out: Dict = {"n_states": S, "initial": initial}
    for name, dt, n in (("sources", "<u4", A), ("targets", "<u4", A),
                        ("labels", "<i4", A), ("final_states", "<u4", F)):
        arr = np.frombuffer(data, dt, n, off)
        off += arr.nbytes
        out[name] = arr.astype(np.int32)
    return out


def _pack_f64(arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr, "<f8")
    return struct.pack("<II", *((arr.shape + (1,))[:2])) + arr.tobytes()


def _unpack_f64(data: bytes) -> np.ndarray:
    r, c = struct.unpack_from("<II", data, 0)
    return np.frombuffer(data, "<f8", r * c, 8).reshape(r, c).copy()


# -- descriptor -------------------------------------------------------------------


def _descriptor(lat: FlfLattice, base: str) -> bytes:
    root = ET.Element("lattice", semiring=lat.semiring.stype)
    head = ET.SubElement(root, "head")
    ET.SubElement(head, "creator").text = "rasr-tpu"
    ET.SubElement(root, "structure", format="bin",
                  file=f"{base}.structure.bin")
    ET.SubElement(root, "boundaries", format="bin",
                  file=f"{base}.boundaries.bin")
    if lat.words:
        ET.SubElement(root, "alphabet", format="txt",
                      file=f"{base}.alphabet.txt")
    scores = ET.SubElement(root, "scores", n=str(lat.semiring.n),
                           file=f"{base}.scores.bin", format="bin")
    for i, (key, scale) in enumerate(zip(lat.semiring.keys,
                                         lat.semiring.scales)):
        dim = ET.SubElement(scores, "dim", id=str(i))
        ET.SubElement(dim, "name").text = key
        if scale != 1.0:
            ET.SubElement(dim, "scale").text = repr(float(scale))
    return (b'<?xml version="1.0" encoding="UTF-8"?>\n'
            + ET.tostring(root))


def _parse_descriptor(data: bytes) -> Dict:
    root = ET.fromstring(data)
    if root.tag != "lattice":
        raise ValueError("not an flf lattice descriptor")
    out: Dict = {"stype": root.get("semiring", "tropical"), "words": None}
    out["structure"] = root.find("structure").get("file")
    bnd = root.find("boundaries")
    out["boundaries"] = bnd.get("file") if bnd is not None else None
    alpha = root.find("alphabet")
    out["alphabet"] = alpha.get("file") if alpha is not None else None
    scores = root.find("scores")
    out["scores"] = scores.get("file")
    keys: List[str] = []
    scales: List[float] = []
    for dim in scores.findall("dim"):
        keys.append(dim.findtext("name", default=f"d{len(keys)}").strip())
        scales.append(float(dim.findtext("scale", default="1.0")))
    out["keys"], out["scales"] = keys, scales
    return out


# -- read/write over a put/get transport ----------------------------------------------


def write_flf(lat: FlfLattice, base: str,
              put: Callable[[str, bytes], None]) -> None:
    put(f"{base}.flf", _descriptor(lat, base))
    put(f"{base}.structure.bin", _pack_structure(lat))
    put(f"{base}.boundaries.bin",
        struct.pack("<I", lat.n_states)
        + lat.boundaries.astype("<i4").tobytes())
    put(f"{base}.scores.bin", _pack_f64(
        np.concatenate([lat.scores, lat.final_scores], axis=0)))
    if lat.words:
        txt = "\n".join(f"{i}\t{w}" for i, w in sorted(lat.words.items()))
        put(f"{base}.alphabet.txt", txt.encode("utf-8"))


def read_flf(base_or_descriptor: str,
             get: Callable[[str], bytes]) -> FlfLattice:
    name = base_or_descriptor
    if not name.endswith(".flf"):
        name += ".flf"
    desc = _parse_descriptor(get(name))
    st = _unpack_structure(get(desc["structure"]))
    semiring = FlfSemiring(tuple(desc["keys"]), tuple(desc["scales"]),
                           desc["stype"])
    block = _unpack_f64(get(desc["scores"]))
    A = len(st["sources"])
    scores, final_scores = block[:A], block[A:]
    bounds = None
    if desc["boundaries"]:
        data = get(desc["boundaries"])
        n = struct.unpack_from("<I", data, 0)[0]
        bounds = np.frombuffer(data, "<i4", n, 4).astype(np.int32)
    words = None
    if desc["alphabet"]:
        words = {}
        for line in get(desc["alphabet"]).decode("utf-8").splitlines():
            if line.strip():
                i, w = line.split("\t", 1)
                words[int(i)] = w
    return FlfLattice(semiring=semiring, n_states=st["n_states"],
                      sources=st["sources"], targets=st["targets"],
                      labels=st["labels"], scores=scores,
                      boundaries=bounds, initial=st["initial"],
                      final_states=st["final_states"],
                      final_scores=final_scores, words=words)


# -- file and archive frontends ----------------------------------------------------


def write_flf_file(lat: FlfLattice, path: str) -> None:
    """Descriptor at `path` (.flf appended if missing) + sibling parts."""
    import os
    if path.endswith(".flf"):
        path = path[:-4]
    d = os.path.dirname(path) or "."
    os.makedirs(d, exist_ok=True)

    def put(name: str, data: bytes) -> None:
        with open(os.path.join(d, os.path.basename(name)), "wb") as fh:
            fh.write(data)

    write_flf(lat, os.path.basename(path), put)


def read_flf_file(path: str) -> FlfLattice:
    import os
    d = os.path.dirname(path) or "."

    def get(name: str) -> bytes:
        with open(os.path.join(d, os.path.basename(name)), "rb") as fh:
            return fh.read()

    return read_flf(os.path.basename(path), get)


class FlfArchiveWriter:
    """Per-segment lattice archive over Core FileArchive/DirectoryArchive
    (reference FlfArchiveWriter, src/Flf/FlfIo.hh:318)."""

    def __init__(self, path: str, mode: str = "w"):
        self.archive = open_archive(path, mode)

    def write(self, segment_name: str, lat: FlfLattice) -> None:
        write_flf(lat, segment_name, lambda n, d: self.archive.write(n, d))

    def close(self) -> None:
        self.archive.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FlfArchiveReader:
    def __init__(self, path: str):
        self.archive = open_archive(path, "r")

    def segments(self) -> Iterator[str]:
        for k in self.archive.keys():
            if k.endswith(".flf"):
                yield k[:-4]

    def read(self, segment_name: str) -> FlfLattice:
        return read_flf(segment_name, self.archive.read)

    def has(self, segment_name: str) -> bool:
        return f"{segment_name}.flf" in self.archive

    def close(self) -> None:
        self.archive.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
