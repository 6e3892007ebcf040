"""xml-tool: XML <-> line-oriented format converters
(reference: src/Tools/Xml/xml2line.c, line2xml.c).

The line format makes XML logs grep/sed/awk-able:

    <path> <element> <type> [<content>]

with one line per event; `type` is
    S  start tag            A  attribute (name value)
    E  end tag              C  character data (one line per text line)
    ?  processing instr.    !  comment

Usage:
    python -m rasr_tpu.tools.xml_tool xml2line [file...]   (stdin default)
    python -m rasr_tpu.tools.xml_tool line2xml [file...]
"""

from __future__ import annotations

import sys
import xml.parsers.expat
from typing import IO, List


def xml2line(src: IO, out: IO) -> None:
    path: List[str] = []
    pending: List[str] = []

    def prefix() -> str:
        return ("/" + "/".join(path) + " " + path[-1]) if path else "- -"

    def flush_content() -> None:
        if not pending:
            return
        text = "".join(pending)
        pending.clear()
        for line in text.split("\n"):
            line = line.strip()
            if line:
                out.write(f"{prefix()} C {line}\n")

    def start(name, attrs):
        flush_content()
        path.append(name)
        out.write(f"{prefix()} S\n")
        for k, v in attrs.items():
            out.write(f"{prefix()} A {k} {v}\n")

    def end(name):
        flush_content()
        out.write(f"{prefix()} E\n")
        path.pop()

    def chars(data):
        pending.append(data)

    def comment(data):
        flush_content()
        out.write(f"{prefix()} ! {data.strip()}\n")

    def pi(target, data):
        flush_content()
        out.write(f"{prefix()} ? {target} {data}\n")

    parser = xml.parsers.expat.ParserCreate()
    parser.StartElementHandler = start
    parser.EndElementHandler = end
    parser.CharacterDataHandler = chars
    parser.CommentHandler = comment
    parser.ProcessingInstructionHandler = pi
    parser.ParseFile(src)


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def line2xml(src: IO, out: IO) -> None:
    out.write('<?xml version="1.0" encoding="utf-8"?>\n')
    depth = 0
    open_tag: List[str] = []   # tag awaiting '>' (attributes may follow)

    def close_open() -> None:
        if open_tag:
            out.write(">\n")
            open_tag.clear()

    for raw in src:
        raw = raw.rstrip("\n")
        if not raw.strip():
            continue
        parts = raw.split(" ", 3)
        if len(parts) < 3:
            continue
        _path, element, typ = parts[0], parts[1], parts[2]
        rest = parts[3] if len(parts) > 3 else ""
        if typ == "S":
            close_open()
            out.write("  " * depth + f"<{element}")
            open_tag.append(element)
            depth += 1
        elif typ == "A":
            name, _, value = rest.partition(" ")
            out.write(f' {name}="{_escape(value)}"')
        elif typ == "E":
            depth -= 1
            if open_tag:
                out.write("/>\n")
                open_tag.clear()
            else:
                out.write("  " * depth + f"</{element}>\n")
        elif typ == "C":
            close_open()
            out.write("  " * depth + _escape(rest) + "\n")
        elif typ == "!":
            close_open()
            out.write("  " * depth + f"<!-- {rest} -->\n")
        elif typ == "?":
            close_open()
            target, _, data = rest.partition(" ")
            out.write("  " * depth + f"<?{target} {data}?>\n")


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("xml2line", "line2xml"):
        sys.stderr.write(__doc__ + "\n")
        return 1
    mode, files = argv[0], argv[1:]
    convert = xml2line if mode == "xml2line" else line2xml
    if not files:
        src = sys.stdin.buffer if mode == "xml2line" else sys.stdin
        convert(src, sys.stdout)
        return 0
    for f in files:
        with open(f, "rb" if mode == "xml2line" else "r") as fh:
            convert(fh, sys.stdout)
    return 0


if __name__ == "__main__":
    sys.exit(main())
