"""Little-endian binary stream IO.

Byte-compatible with the reference binary streams
(src/Core/BinaryStream.hh/.cc): all scalars little-endian, strings
u32-length-prefixed without terminator.
"""

from __future__ import annotations

import struct
from io import BytesIO
from typing import BinaryIO, List, Sequence

import numpy as np


class BinaryWriter:
    def __init__(self, stream: BinaryIO):
        self._s = stream

    def write(self, data: bytes) -> None:
        self._s.write(data)

    def u8(self, v: int): self._s.write(struct.pack("<B", v))
    def s8(self, v: int): self._s.write(struct.pack("<b", v))
    def u16(self, v: int): self._s.write(struct.pack("<H", v))
    def s16(self, v: int): self._s.write(struct.pack("<h", v))
    def u32(self, v: int): self._s.write(struct.pack("<I", v))
    def s32(self, v: int): self._s.write(struct.pack("<i", v))
    def u64(self, v: int): self._s.write(struct.pack("<Q", v))
    def s64(self, v: int): self._s.write(struct.pack("<q", v))
    def f32(self, v: float): self._s.write(struct.pack("<f", v))
    def f64(self, v: float): self._s.write(struct.pack("<d", v))
    def bool(self, v: bool): self.u8(1 if v else 0)

    def string(self, s: str) -> None:
        data = s.encode("utf-8")
        self.u32(len(data))
        self._s.write(data)

    def cstring(self, s: str) -> None:
        """0-terminated string (FileArchive info table entries)."""
        self._s.write(s.encode("utf-8") + b"\0")

    def f32_array(self, a: Sequence[float]) -> None:
        arr = np.asarray(a, dtype="<f4")
        self._s.write(arr.tobytes())

    def f64_array(self, a: Sequence[float]) -> None:
        arr = np.asarray(a, dtype="<f8")
        self._s.write(arr.tobytes())

    def u32_array(self, a: Sequence[int]) -> None:
        arr = np.asarray(a, dtype="<u4")
        self._s.write(arr.tobytes())

    def tell(self) -> int:
        return self._s.tell()

    def seek(self, pos: int) -> None:
        self._s.seek(pos)


class BinaryReader:
    def __init__(self, stream: BinaryIO):
        self._s = stream

    def read(self, n: int) -> bytes:
        data = self._s.read(n)
        if len(data) != n:
            raise EOFError(f"expected {n} bytes, got {len(data)}")
        return data

    def u8(self) -> int: return struct.unpack("<B", self.read(1))[0]
    def s8(self) -> int: return struct.unpack("<b", self.read(1))[0]
    def u16(self) -> int: return struct.unpack("<H", self.read(2))[0]
    def s16(self) -> int: return struct.unpack("<h", self.read(2))[0]
    def u32(self) -> int: return struct.unpack("<I", self.read(4))[0]
    def s32(self) -> int: return struct.unpack("<i", self.read(4))[0]
    def u64(self) -> int: return struct.unpack("<Q", self.read(8))[0]
    def s64(self) -> int: return struct.unpack("<q", self.read(8))[0]
    def f32(self) -> float: return struct.unpack("<f", self.read(4))[0]
    def f64(self) -> float: return struct.unpack("<d", self.read(8))[0]
    def bool(self) -> bool: return self.u8() != 0

    def string(self) -> str:
        n = self.u32()
        return self.read(n).decode("utf-8")

    def cstring(self) -> str:
        chunks: List[bytes] = []
        while True:
            b = self._s.read(1)
            if not b or b == b"\0":
                break
            chunks.append(b)
        return b"".join(chunks).decode("utf-8")

    def f32_array(self, n: int) -> np.ndarray:
        return np.frombuffer(self.read(4 * n), dtype="<f4").copy()

    def f64_array(self, n: int) -> np.ndarray:
        return np.frombuffer(self.read(8 * n), dtype="<f8").copy()

    def u32_array(self, n: int) -> np.ndarray:
        return np.frombuffer(self.read(4 * n), dtype="<u4").copy()

    def tell(self) -> int:
        return self._s.tell()

    def seek(self, pos: int) -> None:
        self._s.seek(pos)


def pack_to_bytes(fn) -> bytes:
    """Run `fn(BinaryWriter)` against an in-memory buffer, return bytes."""
    buf = BytesIO()
    fn(BinaryWriter(buf))
    return buf.getvalue()
