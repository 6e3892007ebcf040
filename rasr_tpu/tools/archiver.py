"""archiver tool: manipulate cache archives, with typed item views.

Reference-parity mode set (src/Tools/Archiver/Archiver.cc:41-62,580):
add / combine / copy / extract / extractAll / list / recover / remove /
show, with typed serialization for `show` (Archiver.cc:63-76):

    ascii       raw text item
    feat        feature cache item: "start end v0 v1 ..." per frame
    align       alignment item: time/emission per frame, decoded to
                allophone symbol + HMM state (+ tied class) when an
                allophone file / state-tying LUT is given
                (Archiver.cc:427-459 `show --type=align`)
    bin-matrix  binary matrix file: <matrix-f32 ...> XML dump
    flow-cache  datatype-dispatched view (feature or alignment items)

Usage (reference flag style; legacy positional verbs still work):

    python -m rasr_tpu.tools.archiver --mode=list    <archive>...
    python -m rasr_tpu.tools.archiver --mode=show --type=feat <ar> <item>...
    python -m rasr_tpu.tools.archiver --mode=show --type=align \
        --allophone-file=<txt> --lut=<state-tying> <ar> <item>...
    python -m rasr_tpu.tools.archiver --mode=add     <archive> <file|dir>...
    python -m rasr_tpu.tools.archiver --mode=combine <dst> <src>...
    python -m rasr_tpu.tools.archiver --mode=copy    <dst> <src>...
    python -m rasr_tpu.tools.archiver --mode=extract <archive> <item>...
    python -m rasr_tpu.tools.archiver --mode=extractAll <archive> <dir>
    python -m rasr_tpu.tools.archiver --mode=remove  <archive> <item>...
    python -m rasr_tpu.tools.archiver --mode=recover <archive>

Options: --type, --allophone-file, --lut, --compress, --select=<file>,
--overwrite={no|keep-first|yes|replace|check}, --prefix, --verbose,
--quiet, --full-precision.

The allophone file is one symbol per line ('#' comments), line index ==
allophone index; the LUT file is "symbol index" pairs — both exactly the
reference's text formats (Archiver.cc:548-573).
"""

from __future__ import annotations

import gzip
import os
import sys
from typing import Dict, List, Optional

import numpy as np

from ..core.archive import FileArchive, open_archive
from ..speech.feature_cache import unpack_features

MODES = ("add", "combine", "copy", "extract", "extractAll", "list",
         "recover", "remove", "show")
TYPES = ("ascii", "feat", "align", "bin-matrix", "flow-cache")


def _read_lines(path: str) -> List[str]:
    op = gzip.open if path.endswith(".gz") else open
    out = []
    with op(path, "rt") as fh:
        for line in fh:
            line = line.strip()
            if line and not line.startswith("#"):
                out.append(line)
    return out


class Archiver:
    def __init__(self, opts: Dict[str, str]):
        self.mode = opts.get("mode", "list")
        self.type = opts.get("type", "feat")
        self.compress = opts.get("compress", "false") == "true"
        self.verbose = opts.get("verbose", "false") == "true"
        self.quiet = opts.get("quiet", "false") == "true"
        self.full_precision = opts.get("full-precision", "false") == "true"
        self.overwrite = {"no": "keep-first", "yes": "replace",
                          "save": "check"}.get(opts.get("overwrite", "check"),
                                               opts.get("overwrite", "check"))
        self.prefix = opts.get("prefix", "")
        self.select: Optional[List[str]] = None
        if opts.get("select"):
            self.select = _read_lines(opts["select"])
        self.allophones: List[str] = []
        if opts.get("allophone-file"):
            self.allophones = _read_lines(opts["allophone-file"])
        self.lut: Dict[str, int] = {}
        if opts.get("lut"):
            for line in _read_lines(opts["lut"]):
                fields = line.split()
                self.lut[fields[0]] = int(fields[1])

    # -- add: files / directories into an archive ---------------------------

    def _add_item(self, ar, name: str, data: bytes) -> None:
        path = self.prefix + name
        if ar.has(path):
            if self.overwrite == "keep-first":
                print(f'    file "{path}" already exists: keeping existing')
                return
            if self.overwrite == "check":
                equal = ar.read(path) == data
                print(f'    file "{path}" already exists: '
                      + ("files are equal" if equal else "FILES DIFFER"))
                return
            print(f'    file "{path}" already exists: replacing')
        ar.write(path, data, compress=self.compress)

    def add(self, archive: str, sources: List[str]) -> int:
        with open_archive(archive, "a") as ar:
            for src in sources:
                if os.path.isdir(src):
                    if not self.quiet:
                        print(f"adding directory {src}")
                    for root, _dirs, files in os.walk(src):
                        for f in sorted(files):
                            full = os.path.join(root, f)
                            rel = os.path.relpath(full, src)
                            if not self.quiet:
                                print(f"  adding file {rel}")
                            with open(full, "rb") as fh:
                                self._add_item(ar, rel, fh.read())
                elif os.path.isfile(src):
                    if not self.quiet:
                        print(f"adding file {src}")
                    with open(src, "rb") as fh:
                        self._add_item(ar, os.path.basename(src), fh.read())
                else:
                    print(f'could not find file "{src}"', file=sys.stderr)
                    return 1
        return 0

    # -- combine / copy: archives into an archive ----------------------------

    def combine(self, dst: str, sources: List[str]) -> int:
        copied: Dict[str, bool] = {k: False for k in (self.select or [])}
        with open_archive(dst, "a") as out:
            for src in sources:
                n = 0
                with open_archive(src) as ar:
                    names = (self.select if self.select is not None
                             else sorted(ar.keys()))
                    for k in names:
                        if self.select is not None:
                            if copied.get(k):
                                if self.verbose:
                                    print(f"{k}\talready copied")
                                continue
                            if not ar.has(k):
                                if self.verbose:
                                    print(f"{k}\tnot found")
                                continue
                            copied[k] = True
                        self._add_item(out, k, ar.read(k))
                        n += 1
                if not self.quiet:
                    print(f"copied {n} files from {src}")
        missing = [k for k, done in copied.items() if not done]
        for k in missing:
            print(f"missing file: {k}", file=sys.stderr)
        return 1 if missing else 0

    # -- extract -------------------------------------------------------------

    def extract(self, archive: str, names: List[str]) -> int:
        with open_archive(archive) as ar:
            for name in names:
                target = name[:-3] if name.endswith(".gz") else name
                d = os.path.dirname(target)
                if d:
                    os.makedirs(d, exist_ok=True)
                with open(target, "wb") as fh:
                    fh.write(ar.read(name))
                if not self.quiet:
                    print(f"extracted {name} -> {target}")
        return 0

    def extract_all(self, archive: str, directory: str) -> int:
        with open_archive(archive) as ar:
            for name in sorted(ar.keys()):
                target = os.path.join(directory, name)
                os.makedirs(os.path.dirname(target) or ".", exist_ok=True)
                with open(target, "wb") as fh:
                    fh.write(ar.read(name))
                if not self.quiet:
                    print(f"extracted {name}")
        return 0

    # -- list / remove / recover ---------------------------------------------

    def list(self, archives: List[str]) -> int:
        for path in archives:
            with open_archive(path) as ar:
                for k in sorted(ar.keys()):
                    if self.verbose and isinstance(ar, FileArchive):
                        item = ar._items[k]
                        print(f"{k}\t{item.size}\t"
                              f"{'z' if item.compressed else '-'}")
                    else:
                        print(k)
        return 0

    def remove(self, archive: str, names: List[str]) -> int:
        with open_archive(archive, "a") as ar:
            for name in names:
                ar.remove(name)
                if not self.quiet:
                    print(f"removed {name}")
        return 0

    def recover(self, archive: str) -> int:
        """Rebuild a broken archive's file-info table by re-scanning the
        recovery tags and rewriting a finalized archive in place."""
        tmp = archive + ".recover.tmp"
        with open_archive(archive) as ar:  # falls back to tag scan
            keys = sorted(ar.keys())
            with FileArchive(tmp, "w") as out:
                for k in keys:
                    out.write(k, ar.read(k))
        os.replace(tmp, archive)
        if not self.quiet:
            print(f"recovered {len(keys)} items")
        return 0

    # -- show: typed serialization -------------------------------------------

    def show(self, archive: str, names: List[str]) -> int:
        with open_archive(archive) as ar:
            for name in names:
                data = ar.read(name)
                self._show_item(name, data)
        return 0

    def _fmt(self, v: float) -> str:
        return repr(float(v)) if self.full_precision else f"{v:.6f}"

    def _show_item(self, name: str, data: bytes) -> None:
        t = self.type
        if t == "flow-cache":
            # dispatch on the datatype string at the head of the item
            # (reference reads the Flow datatype name, Archiver.cc:490)
            import struct
            (nlen,) = struct.unpack_from("<I", data, 0)
            datatype = data[4:4 + nlen].decode("utf-8", "replace") \
                if 0 < nlen < 64 else ""
            t = "align" if datatype == "flow-alignment" else "feat"
        if t == "ascii":
            sys.stdout.write(data.decode("utf-8", "replace"))
        elif t == "feat":
            try:
                feats, starts, ends = unpack_features(data)
            except Exception:
                # legacy behavior: non-feature items dump raw
                sys.stdout.buffer.write(data)
                return
            print(f"# {name}: {feats.shape[0]} frames x {feats.shape[1]} "
                  "dims")
            for i in range(len(feats)):
                vals = " ".join(self._fmt(v) for v in feats[i])
                print(f"{starts[i]:.3f} {ends[i]:.3f} {vals}")
        elif t == "align":
            self._show_alignment(data)
        elif t == "bin-matrix":
            self._show_matrix(data)
        else:
            raise ValueError(f"unknown type {self.type!r}; known: {TYPES}")

    def _show_alignment(self, data: bytes) -> None:
        """Reference field layout: time/emission (+ allophone symbol,
        index, HMM state, tied class) per item (Archiver.cc:445-459)."""
        from ..am.allophone import AllophoneAlphabet
        from ..speech.alignment import Alignment

        align = Alignment.unpack(data)
        for f, sid, w in zip(align.frames, align.state_ids, align.weights):
            line = f"time=\t{int(f)}\temission=\t{int(sid)}"
            if self.allophones:
                allo, state = AllophoneAlphabet.split_state_id(int(sid))
                if allo < len(self.allophones):
                    sym = self.allophones[allo]
                    line += (f"\tallophone=\t{sym}\tindex=\t{allo}"
                             f"\tstate=\t{state}")
                    tied = self.lut.get(f"{sym}.{state}")
                    if tied is not None:
                        line += f"\ttied=\t{tied}"
            if w != 1.0:
                line += f"\tweight\t= {w:f}"
            print(line)

    def _show_matrix(self, data: bytes) -> None:
        import struct
        rows, cols = struct.unpack_from("<II", data, 0)
        m = np.frombuffer(data[8:8 + rows * cols * 4],
                          dtype="<f4").reshape(rows, cols)
        print(f'<matrix-f32 nRows="{rows}" nColumns="{cols}">')
        for row in m:
            print(" ".join(self._fmt(v) for v in row))
        print("</matrix-f32>")

    # -- dispatch -------------------------------------------------------------

    def run(self, args: List[str]) -> int:
        m = self.mode
        if m == "list":
            return self.list(args)
        if m == "show":
            return self.show(args[0], args[1:])
        if m == "add":
            return self.add(args[0], args[1:])
        if m in ("combine", "copy"):
            return self.combine(args[0], args[1:])
        if m == "extract":
            return self.extract(args[0], args[1:])
        if m == "extractAll":
            return self.extract_all(args[0], args[1])
        if m == "remove":
            return self.remove(args[0], args[1:])
        if m == "recover":
            return self.recover(args[0])
        print(__doc__)
        return 1


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1

    opts: Dict[str, str] = {}
    args: List[str] = []
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                k, v = a[2:].split("=", 1)
            elif a[2:] in ("verbose", "quiet", "compress", "full-precision"):
                k, v = a[2:], "true"
            else:
                k, v = a[2:], argv[i + 1]
                i += 1
            opts[k] = v
        else:
            args.append(a)
        i += 1

    # legacy positional verbs (round-1 CLI): list/show/copy <args>
    if "mode" not in opts and args and args[0] in MODES:
        opts["mode"] = args.pop(0)
        if opts["mode"] == "copy" and len(args) >= 2:
            # legacy round-1 order was <src>... <dst-new>; reference
            # order is <dst> <src>... — detect legacy: sources exist,
            # destination does not
            if os.path.exists(args[0]) and not os.path.exists(args[-1]):
                args = [args[-1]] + args[:-1]

    arch = Archiver(opts)
    try:
        return arch.run(args)
    except (KeyError, FileNotFoundError, ValueError) as exc:
        print(f"archiver: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
