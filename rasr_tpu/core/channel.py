"""Logging channels.

Re-creates the reference channel system (src/Core/Channel.hh:107,
doc/channel.rst): named output streams that components write to, each
individually redirectable via configuration to stdout / stderr / a file /
nil, with optional XML formatting and compression.
"""

from __future__ import annotations

import gzip
import sys
import threading
from typing import Dict, Optional, TextIO
from xml.sax.saxutils import escape, quoteattr

from .configuration import Configuration
from .parameter import ParameterBool, ParameterString


class _Target:
    """A physical output target shared by channels (one per file name)."""

    def __init__(self, name: str, append: bool = False, compressed: bool = False):
        self.name = name
        self._lock = threading.Lock()
        # stdout/stderr are resolved at write time: sys.stdout may be
        # redirected/replaced between Application lifetimes (pytest capture,
        # shell redirection), and a cached handle would go stale
        self._std: Optional[str] = None
        if name == "stdout" or name == "-":
            self._std = "stdout"
            self._fh: Optional[TextIO] = None
            self._owned = False
        elif name == "stderr":
            self._std = "stderr"
            self._fh = None
            self._owned = False
        elif name == "nil":
            self._fh = None
            self._owned = False
        else:
            mode = "at" if append else "wt"
            if compressed or name.endswith(".gz"):
                self._fh = gzip.open(name, mode, encoding="utf-8")
            else:
                self._fh = open(name, mode, encoding="utf-8")
            self._owned = True

    def _handle(self) -> Optional[TextIO]:
        if self._std is not None:
            return getattr(sys, self._std)
        return self._fh

    def write(self, text: str) -> None:
        fh = self._handle()
        if fh is not None and not getattr(fh, "closed", False):
            with self._lock:
                fh.write(text)

    def flush(self) -> None:
        fh = self._handle()
        if fh is not None and not getattr(fh, "closed", False):
            fh.flush()

    def close(self) -> None:
        if self._fh is not None and self._owned:
            self._fh.close()
            self._fh = None


class ChannelManager:
    """Resolves channel names to shared targets; caches open files."""

    _instance: Optional["ChannelManager"] = None

    def __init__(self):
        self._targets: Dict[str, _Target] = {}

    @classmethod
    def instance(cls) -> "ChannelManager":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def target(self, name: str, append: bool = False, compressed: bool = False) -> _Target:
        key = name
        if key not in self._targets:
            self._targets[key] = _Target(name, append, compressed)
        return self._targets[key]

    def flush_all(self) -> None:
        for t in self._targets.values():
            t.flush()

    def close_all(self) -> None:
        for t in self._targets.values():
            t.close()
        self._targets.clear()


class Channel:
    """A named, configurable output channel.

    Configuration (matching reference semantics):
        <selection>.channel          -> target name (file / stdout / stderr / nil)
        <selection>.append           -> append to file
        <selection>.compressed       -> gzip output
    Default target comes from the `default` argument ('nil' disables output).
    """

    param_channel = ParameterString("channel", "output target", "")
    param_append = ParameterBool("append", "append to file", False)
    param_compressed = ParameterBool("compressed", "gzip output", False)

    def __init__(self, config: Configuration, name: str, default: str = "nil"):
        sub = config.sub(name)
        target_name = sub.get("channel") or default
        self._open = target_name != "nil"
        if self._open:
            self._target = ChannelManager.instance().target(
                target_name,
                append=self.param_append(sub),
                compressed=self.param_compressed(sub))
        else:
            self._target = None

    def is_open(self) -> bool:
        return self._open

    def write(self, text: str) -> None:
        if self._open:
            self._target.write(text)

    def flush(self) -> None:
        if self._open:
            self._target.flush()


class XmlWriter:
    """Minimal XML writer used for log output (src/Core/XmlStream.hh)."""

    def __init__(self, sink):
        self._sink = sink  # anything with .write(str)
        self._stack = []

    def open(self, tag: str, **attrs) -> "XmlWriter":
        attr_text = "".join(f" {k.replace('_', '-')}={quoteattr(str(v))}"
                            for k, v in attrs.items())
        self._sink.write(f"{'  ' * len(self._stack)}<{tag}{attr_text}>\n")
        self._stack.append(tag)
        return self

    def close(self, tag: Optional[str] = None) -> "XmlWriter":
        top = self._stack.pop()
        if tag is not None and tag != top:
            raise ValueError(f"XML close mismatch: {tag} != {top}")
        self._sink.write(f"{'  ' * len(self._stack)}</{top}>\n")
        return self

    def element(self, tag: str, text: str = "", **attrs) -> "XmlWriter":
        attr_text = "".join(f" {k.replace('_', '-')}={quoteattr(str(v))}"
                            for k, v in attrs.items())
        indent = "  " * len(self._stack)
        if text:
            self._sink.write(f"{indent}<{tag}{attr_text}>{escape(str(text))}</{tag}>\n")
        else:
            self._sink.write(f"{indent}<{tag}{attr_text}/>\n")
        return self

    def text(self, value: str) -> "XmlWriter":
        self._sink.write(f"{'  ' * len(self._stack)}{escape(str(value))}\n")
        return self
