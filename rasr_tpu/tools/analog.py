"""analog: recognition log analyzer.

The reference analog tool aggregates WER / time / search-space statistics
from recognition logs (src/Tools/Analog/analog, stats/{wer,time,
searchSpace}.py).  This version parses the JSON lines emitted by
speech-recognizer and reports corpus WER, RTF percentiles and totals.

Usage: python -m rasr_tpu.tools.analog <logfile>...
"""

from __future__ import annotations

import json
import re
import sys
from typing import Dict, List

import numpy as np

_JSON_RE = re.compile(r"\{.*\}")


def parse_log(path: str) -> List[Dict]:
    """Parses either this framework's JSON-line logs or reference-format
    XML channel logs (auto-detected)."""
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        head = fh.read(4096)
    if head.lstrip().startswith("<?xml") or "<segment" in head:
        from ..core.xml_log import parse_xml_log
        return parse_xml_log(path)
    records = []
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            if '"segment"' not in line:
                continue
            m = _JSON_RE.search(line)
            if not m:
                continue
            try:
                records.append(json.loads(m.group(0)))
            except json.JSONDecodeError:
                continue
    return records


def analyze(records: List[Dict]) -> Dict:
    errors = sum(r.get("errors") or 0 for r in records)
    ref = sum(r.get("ref-len") or 0 for r in records)
    rtfs = np.asarray([r["rtf"] for r in records if r.get("rtf") is not None])
    times = np.asarray([r["time"] for r in records if r.get("time") is not None])
    durations = np.asarray([r["duration"] for r in records
                            if r.get("duration") is not None])
    out = {
        "segments": len(records),
        "wer": round(100.0 * errors / ref, 2) if ref else None,
        "errors": errors,
        "ref-words": ref,
        "total-audio-s": round(float(durations.sum()), 2) if len(durations) else 0,
        "total-time-s": round(float(times.sum()), 2) if len(times) else 0,
    }
    if len(rtfs):
        out.update({
            "mean-rtf": round(float(np.mean(rtfs)), 5),
            "median-rtf": round(float(np.median(rtfs)), 5),
            "p95-rtf": round(float(np.percentile(rtfs, 95)), 5),
            "overall-rtf": round(float(times.sum() / max(durations.sum(), 1e-9)),
                                 5),
        })
    # search-space statistics section (reference analog
    # stats/searchSpace.py: min/avg/max of the per-segment series)
    space: Dict[str, Dict[str, List[float]]] = {}
    for r in records:
        for name, s in (r.get("search-space-statistics") or {}).items():
            agg = space.setdefault(name, {"min": [], "avg": [], "max": []})
            for k in ("min", "avg", "max"):
                if s.get(k) is not None:
                    agg[k].append(s[k])
    if space:
        out["search-space"] = {
            name: {"min": round(float(np.min(v["min"])), 1) if v["min"] else None,
                   "avg": round(float(np.mean(v["avg"])), 1) if v["avg"] else None,
                   "max": round(float(np.max(v["max"])), 1) if v["max"] else None}
            for name, v in space.items()}
    return out


def compare(paths: List[str]) -> Dict:
    """Per-log comparison table (reference analog multi-log overview):
    one summary per log file + a combined section."""
    per_log = {}
    combined: List[Dict] = []
    for path in paths:
        recs = parse_log(path)
        per_log[path] = analyze(recs)
        combined.extend(recs)
    return {"logs": per_log, "combined": analyze(combined)}


def format_table(result: Dict) -> str:
    """Fixed-width comparison table over logs (wer / rtf / segments)."""
    cols = ["segments", "wer", "mean-rtf", "overall-rtf", "total-audio-s"]
    header = f"{'log':<32}" + "".join(f"{c:>14}" for c in cols)
    lines = [header, "-" * len(header)]
    entries = list(result["logs"].items()) + [("COMBINED",
                                               result["combined"])]
    for name, summary in entries:
        short = name if len(name) <= 31 else "..." + name[-28:]
        row = f"{short:<32}"
        for c in cols:
            v = summary.get(c)
            row += f"{v if v is not None else '-':>14}"
        lines.append(row)
    return "\n".join(lines)


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    table = "--table" in argv
    if table:
        argv.remove("--table")
    if not argv:
        print(__doc__)
        return 1
    if table or len(argv) > 1:
        result = compare(argv)
        if table:
            print(format_table(result))
        else:
            print(json.dumps(result, indent=2))
        return 0
    print(json.dumps(analyze(parse_log(argv[0])), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
