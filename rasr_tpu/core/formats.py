"""Format-qualified IO dispatch.

Reference: src/Core/FormatSet.hh, doc/architecture.rst:700-720 — file names
may carry a format qualifier prefix (``bin:``, ``xml:``, ``ascii:``); readers
and writers register per (type, format) and `FormatSet` dispatches on the
prefix, defaulting to a type-specific format.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple


def split_qualifier(path: str) -> Tuple[str, str]:
    """Split 'bin:file' into ('bin', 'file'); no qualifier -> ('', path)."""
    if ":" in path:
        head, rest = path.split(":", 1)
        # avoid eating windows-style or URL-ish paths; qualifiers are short words
        if (head.replace("-", "").isalpha() and len(head) <= 12
                and not rest.startswith("//")):
            return head, rest
    return "", path


class FormatSet:
    def __init__(self):
        self._readers: Dict[Tuple[type, str], Callable] = {}
        self._writers: Dict[Tuple[type, str], Callable] = {}
        self._default: Dict[type, str] = {}

    def register_reader(self, typ: type, fmt: str, fn: Callable, default: bool = False):
        self._readers[(typ, fmt)] = fn
        if default or typ not in self._default:
            self._default[typ] = fmt

    def register_writer(self, typ: type, fmt: str, fn: Callable, default: bool = False):
        self._writers[(typ, fmt)] = fn
        if default or typ not in self._default:
            self._default[typ] = fmt

    def read(self, typ: type, path: str, **kw):
        fmt, real = split_qualifier(path)
        fmt = fmt or self._default.get(typ, "")
        fn = self._readers.get((typ, fmt))
        if fn is None:
            raise KeyError(f"no reader for {typ.__name__} format {fmt!r}")
        return fn(real, **kw)

    def write(self, typ: type, path: str, obj, **kw):
        fmt, real = split_qualifier(path)
        fmt = fmt or self._default.get(typ, "")
        fn = self._writers.get((typ, fmt))
        if fn is None:
            raise KeyError(f"no writer for {typ.__name__} format {fmt!r}")
        return fn(real, obj, **kw)


FORMATS = FormatSet()
