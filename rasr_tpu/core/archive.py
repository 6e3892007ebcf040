"""Archive containers ("caches").

Byte-compatible re-implementation of the reference archive family
(src/Core/Archive.hh, src/Core/FileArchive.cc:27-66 file format,
src/Core/DirectoryArchive.hh, src/Core/BundleArchive.hh:26,
doc/file_formats/archive.rst):

  * FileArchive  — single file, 'SP_ARC1\\0' magic, per-item optional zlib,
                   recovery tags, trailing file-info table;
  * DirectoryArchive — items are plain files below a directory;
  * BundleArchive — a text file listing member archives (read-combines them).

`open_archive` dispatches on what exists at the path.
"""

from __future__ import annotations

import os
import struct
import zlib
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional

_MAGIC = b"SP_ARC1\x00"
_START_TAG = 0xAA55AA55
_END_TAG = 0x55AA55AA


class ArchiveError(Exception):
    pass


@dataclass
class _Item:
    name: str
    position: int  # file offset of the sizes field (after name), as in reference
    uncompressed: int
    compressed: int  # 0 => stored uncompressed


class Archive:
    """Abstract archive interface."""

    def keys(self) -> List[str]:
        raise NotImplementedError

    def has(self, name: str) -> bool:
        return name in set(self.keys())

    def read(self, name: str) -> bytes:
        raise NotImplementedError

    def write(self, name: str, data: bytes, compress: bool = True) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass

    def __contains__(self, name: str) -> bool:
        return self.has(name)

    def __iter__(self) -> Iterator[str]:
        return iter(self.keys())

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class FileArchive(Archive):
    def __init__(self, path: str, mode: str = "r", shared: bool = False):
        """shared=True (append mode): multi-writer archive — several
        processes may append concurrently; every record write happens
        under an exclusive POSIX flock, the info-table flag stays clear
        so readers recover items by scanning the recovery tags, and a
        crashed writer's trailing partial record is skipped on read
        (reference: concurrent cache-archive appends with recovery)."""
        self.path = path
        self.mode = mode
        self.shared = shared and mode == "a"
        self._items: Dict[str, _Item] = {}
        # empty (removed) slots: (position-of-sizes-field, data size)
        self._empty: List[Tuple[int, int]] = []
        self._dirty = False
        if mode == "r":
            self._fh = open(path, "rb")
            self._read_header_and_table()
        elif mode == "w":
            self._fh = open(path, "w+b")
            self._fh.write(_MAGIC)
            self._fh.write(b"\x00")  # info table not yet written
            self._end_of_data = self._fh.tell()
            self._dirty = True
        elif mode == "a":
            exists = os.path.exists(path) and os.path.getsize(path) > 0
            self._fh = open(path, "r+b" if exists else "w+b")
            if self.shared:
                with self._locked():
                    if exists:
                        self._read_header_and_table()
                        self._unfinalize()
                    else:
                        self._fh.write(_MAGIC)
                        self._fh.write(b"\x00")
                        self._fh.flush()
                        self._end_of_data = self._fh.tell()
            elif exists:
                self._read_header_and_table()
            else:
                self._fh.write(_MAGIC)
                self._fh.write(b"\x00")
                self._end_of_data = self._fh.tell()
                self._dirty = True
        else:
            raise ValueError(f"bad mode {mode!r}")

    # -- shared-mode locking -------------------------------------------------

    def _locked(self):
        import contextlib
        import fcntl

        @contextlib.contextmanager
        def guard():
            fcntl.flock(self._fh.fileno(), fcntl.LOCK_EX)
            try:
                yield
            finally:
                self._fh.flush()
                fcntl.flock(self._fh.fileno(), fcntl.LOCK_UN)

        return guard()

    def _unfinalize(self) -> None:
        """Drop a written info table so concurrent appends stay
        recoverable (flag byte 0 + truncate the table tail)."""
        self._fh.seek(8)
        flag = self._fh.read(1)
        if flag and flag[0]:
            self._fh.seek(8)
            self._fh.write(b"\x00")
            self._fh.truncate(self._end_of_data)
            self._fh.flush()

    def refresh(self) -> None:
        """Re-scan for records appended by other writers (shared mode)."""
        self._fh.seek(0)
        self._read_header_and_table()

    # -- reading ------------------------------------------------------------

    def _read_header_and_table(self) -> None:
        magic = self._fh.read(8)
        if magic != _MAGIC:
            raise ArchiveError(f"{self.path}: not a file archive (magic {magic!r})")
        flag = self._fh.read(1)
        if flag and flag[0]:
            self._read_info_table()
        else:
            self._scan_items()

    def _read_info_table(self) -> None:
        self._fh.seek(-16, os.SEEK_END)
        table_end = self._fh.tell()
        empty_table_pos, file_table_pos = struct.unpack("<QQ", self._fh.read(16))
        self._fh.seek(file_table_pos)
        (count,) = struct.unpack("<I", self._fh.read(4))
        for _ in range(count):
            (nlen,) = struct.unpack("<I", self._fh.read(4))
            name = self._fh.read(nlen).decode("utf-8")
            pos, unc, comp = struct.unpack("<QII", self._fh.read(16))
            self._items[name] = _Item(name, pos, unc, comp)
        # empty-slot table (reference: empty file info blocks)
        self._fh.seek(empty_table_pos)
        (n_empty,) = struct.unpack("<I", self._fh.read(4))
        for _ in range(n_empty):
            pos, size = struct.unpack("<QI", self._fh.read(12))
            self._empty.append((pos, size))
        self._end_of_data = file_table_pos

    def _scan_items(self) -> None:
        """Recover items by scanning recovery tags (unfinished archive).
        A crashed writer's trailing partial record — truncated anywhere
        after its start tag — is skipped: any parse failure ends the scan
        at the last complete record."""
        self._fh.seek(9)
        self._items.clear()
        end = self._fh.tell()
        file_size = os.fstat(self._fh.fileno()).st_size
        while True:
            record_start = self._fh.tell()
            try:
                head = self._fh.read(4)
                if len(head) < 4:
                    break
                (tag,) = struct.unpack("<I", head)
                if tag != _START_TAG:
                    break
                (nlen,) = struct.unpack("<I", self._fh.read(4))
                name = self._fh.read(nlen).decode("utf-8")
                pos = self._fh.tell()
                unc, comp, _checksum = struct.unpack("<III",
                                                     self._fh.read(12))
                size = comp if comp else unc
                if pos + 12 + size + 4 > file_size:
                    break  # payload truncated
                self._fh.seek(size, os.SEEK_CUR)
                (end_tag,) = struct.unpack("<I", self._fh.read(4))
                if end_tag != _END_TAG:
                    break
            except (struct.error, UnicodeDecodeError):
                self._fh.seek(record_start)
                break
            if nlen > 0:
                self._items[name] = _Item(name, pos, unc, comp)
            end = self._fh.tell()
        self._end_of_data = end

    def keys(self) -> List[str]:
        return list(self._items)

    def read(self, name: str) -> bytes:
        item = self._items.get(name)
        if item is None:
            raise KeyError(f"{name} not in archive {self.path}")
        self._fh.seek(item.position)
        unc, comp, _checksum = struct.unpack("<III", self._fh.read(12))
        size = comp if comp else unc
        data = self._fh.read(size)
        if comp:
            data = zlib.decompress(data)
            if len(data) != unc:
                raise ArchiveError(f"{name}: decompressed size mismatch")
        return data

    # -- writing ------------------------------------------------------------

    def remove(self, name: str) -> None:
        """Mark an item's slot empty for reuse (reference FileArchive
        remove: the data block stays, a zero-length name marks it)."""
        item = self._items.pop(name, None)
        if item is None:
            raise KeyError(f"{name} not in archive {self.path}")
        size = item.compressed or item.uncompressed
        self._empty.append((item.position, size))
        self._dirty = True

    def write(self, name: str, data: bytes, compress: bool = True,
              allow_overwrite: bool = True) -> None:
        if self.mode == "r":
            raise ArchiveError("archive opened read-only")
        if self.shared:
            # append-only under the file lock; the true end of data may
            # have moved since our last write (other writers)
            payload = data
            comp_size = 0
            if compress:
                z = zlib.compress(data, 6)
                if len(z) < len(data):
                    payload, comp_size = z, len(z)
            nb = name.encode("utf-8")
            with self._locked():
                self._fh.seek(0, os.SEEK_END)
                self._fh.write(struct.pack("<I", _START_TAG))
                self._fh.write(struct.pack("<I", len(nb)))
                self._fh.write(nb)
                write_pos = self._fh.tell()
                self._fh.write(struct.pack("<III", len(data), comp_size, 0))
                self._fh.write(payload)
                self._fh.write(struct.pack("<I", _END_TAG))
                self._end_of_data = self._fh.tell()
            self._items[name] = _Item(name, write_pos, len(data), comp_size)
            return
        if name in self._items:
            if not allow_overwrite:
                raise ArchiveError(f"{name} exists and overwrite disabled")
            self.remove(name)
        payload = data
        comp_size = 0
        if compress:
            z = zlib.compress(data, 6)
            if len(z) < len(data):
                payload, comp_size = z, len(z)
        nb = name.encode("utf-8")
        # reuse an exactly-fitting empty slot (reference write(): equal
        # payload+name size; we match on payload size at the same position
        # layout, so require identical name+payload footprint)
        slot = None
        for i, (pos, size) in enumerate(self._empty):
            if size == len(payload) and pos - 4 - len(nb) >= 9:
                # the name sits directly before the sizes field; in-place
                # reuse requires an identical name length
                self._fh.seek(pos - len(nb) - 4)
                try:
                    (old_nlen,) = struct.unpack("<I", self._fh.read(4))
                except struct.error:
                    continue
                if old_nlen == len(nb):
                    slot = i
                    break
        if slot is not None:
            pos, size = self._empty.pop(slot)
            self._fh.seek(pos - 4 - len(nb))
            self._fh.write(nb)
            write_pos = pos
            self._fh.seek(pos)
        else:
            self._fh.seek(self._end_of_data)
            self._fh.write(struct.pack("<I", _START_TAG))
            self._fh.write(struct.pack("<I", len(nb)))
            self._fh.write(nb)
            write_pos = self._fh.tell()
        self._fh.write(struct.pack("<III", len(data), comp_size, 0))
        self._fh.write(payload)
        self._fh.write(struct.pack("<I", _END_TAG))
        if slot is None:
            self._end_of_data = self._fh.tell()
        self._items[name] = _Item(name, write_pos, len(data), comp_size)
        self._dirty = True

    def _write_info_table(self) -> None:
        self._fh.seek(self._end_of_data)
        file_table_pos = self._fh.tell()
        self._fh.write(struct.pack("<I", len(self._items)))
        for item in self._items.values():
            nb = item.name.encode("utf-8")
            self._fh.write(struct.pack("<I", len(nb)))
            self._fh.write(nb)
            self._fh.write(struct.pack("<QII", item.position,
                                       item.uncompressed, item.compressed))
        empty_table_pos = self._fh.tell()
        self._fh.write(struct.pack("<I", len(self._empty)))
        for pos, size in self._empty:
            self._fh.write(struct.pack("<QI", pos, size))
        self._fh.write(struct.pack("<QQ", empty_table_pos, file_table_pos))
        end = self._fh.tell()
        self._fh.seek(8)
        self._fh.write(b"\x01")
        self._fh.truncate(end)

    def finalize(self) -> None:
        """Shared mode: take the lock, absorb every writer's records, and
        write the info table (run once after all writers are done)."""
        if not self.shared:
            return
        with self._locked():
            self.refresh()
            self._write_info_table()
        self._dirty = False

    def close(self) -> None:
        if self._fh.closed:
            return
        if self.shared:
            # leave the archive in recoverable (scan) form: another writer
            # may still be appending; finalize() is the explicit opt-in
            self._fh.close()
            return
        if self._dirty and self.mode in ("w", "a"):
            self._write_info_table()
        self._fh.close()


class DirectoryArchive(Archive):
    def __init__(self, path: str, mode: str = "r"):
        self.path = path
        self.mode = mode
        if mode in ("w", "a"):
            os.makedirs(path, exist_ok=True)
        elif not os.path.isdir(path):
            raise ArchiveError(f"{path}: not a directory")

    def _file(self, name: str) -> str:
        return os.path.join(self.path, name)

    def keys(self) -> List[str]:
        out = []
        for root, _dirs, files in os.walk(self.path):
            for f in files:
                full = os.path.join(root, f)
                rel = os.path.relpath(full, self.path)
                if rel.endswith(".gz"):
                    rel = rel[:-3]
                out.append(rel)
        return out

    def read(self, name: str) -> bytes:
        f = self._file(name)
        if os.path.exists(f):
            with open(f, "rb") as fh:
                return fh.read()
        if os.path.exists(f + ".gz"):
            with open(f + ".gz", "rb") as fh:
                return zlib.decompress(fh.read(), wbits=47)
        raise KeyError(f"{name} not in directory archive {self.path}")

    def write(self, name: str, data: bytes, compress: bool = True) -> None:
        f = self._file(name)
        os.makedirs(os.path.dirname(f) or ".", exist_ok=True)
        with open(f, "wb") as fh:
            fh.write(data)


class BundleArchive(Archive):
    """Read-only union of member archives listed in a `.bundle` text file
    (src/Core/BundleArchive.hh:26)."""

    def __init__(self, path: str):
        self.path = path
        self._members: List[Archive] = []
        base = os.path.dirname(os.path.abspath(path))
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                member = line if os.path.isabs(line) else os.path.join(base, line)
                self._members.append(open_archive(member, "r"))

    def keys(self) -> List[str]:
        out: List[str] = []
        for m in self._members:
            out.extend(m.keys())
        return out

    def read(self, name: str) -> bytes:
        for m in self._members:
            if m.has(name):
                return m.read(name)
        raise KeyError(f"{name} not in bundle {self.path}")

    def write(self, name: str, data: bytes, compress: bool = True) -> None:
        raise ArchiveError("bundle archives are read-only")

    def close(self) -> None:
        for m in self._members:
            m.close()


def open_archive(path: str, mode: str = "r") -> Archive:
    if path.endswith(".bundle"):
        return BundleArchive(path)
    if os.path.isdir(path):
        return DirectoryArchive(path, mode)
    if mode == "r" or (mode == "a" and os.path.exists(path)):
        with open(path, "rb") as fh:
            magic = fh.read(8)
        if magic == _MAGIC:
            return FileArchive(path, mode)
        raise ArchiveError(f"{path}: unknown archive format")
    return FileArchive(path, mode)
