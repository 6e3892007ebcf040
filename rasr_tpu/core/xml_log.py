"""Reference-format XML recognition logs.

Emits the channel XML schema the reference writes and its `analog` tool
parses (doc/channel.rst; schema consumed by
src/Tools/Analog/analog_util/parser.py):

    <recording name=... audio=...>
      <segment full-name=... name=... start=... end=... track=...>
        <orth source="reference"> ... </orth>
        <orth source="recognized"> ... </orth>
        <evaluation name="single best" type="eval">
          <alignment type="edit-distance" format="bliss">
            ref  =  hyp          (correct;   # sub, } deletion, { insertion
          </alignment>            — src/Bliss/EditDistance.cc:32-49)
          <statistic type="edit-distance">
            <count event="token">N</count> ...
          </statistic>            (src/Bliss/EditDistance.cc:500-516)
        </evaluation>
        <real-time>...</real-time>
        <timer><user>...</user></timer>
        <search-space-statistics>
          <statistic name="..."><min/><avg/><max/></statistic>
        </search-space-statistics>
      </segment>
    </recording>

A log written through RecognitionXmlLog is parseable by the reference
analog (stats/wer.py, stats/time.py, stats/searchSpace.py) and by this
framework's analog XML mode — restoring two-way log compatibility.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from .channel import XmlWriter


class RecognitionXmlLog:
    """Per-segment recognition logging in the reference schema."""

    def __init__(self, sink):
        self.xml = XmlWriter(sink)
        self._sink = sink
        self._recording: Optional[str] = None
        self._sink.write('<?xml version="1.0" encoding="ISO-8859-1"?>\n')
        self.xml.open("sprint")

    # -- structure -----------------------------------------------------------

    def _ensure_recording(self, name: str, audio: Optional[str]) -> None:
        if self._recording == name:
            return
        if self._recording is not None:
            self.xml.close("recording")
        self.xml.open("recording", name=name, audio=audio or "")
        self._recording = name

    def open_segment(self, segment) -> None:
        self._ensure_recording(segment.recording.name,
                               getattr(segment.recording, "audio", None))
        self.xml.open("segment", full_name=segment.full_name,
                      name=segment.name, start=f"{segment.start:.3f}",
                      end=f"{segment.end or 0.0:.3f}", track=0)

    def close_segment(self) -> None:
        self.xml.close("segment")

    # -- content -----------------------------------------------------------------

    def orth(self, source: str, text: str) -> None:
        self.xml.element("orth", text or "", source=source)

    def evaluation(self, counts,
                   alignment: Optional[Sequence[Tuple[Optional[str],
                                                      Optional[str]]]] = None,
                   name: str = "single best", type_: str = "eval") -> None:
        """counts: bliss.evaluation.ErrorCounts; alignment: (ref, hyp)
        pairs with None marking gaps."""
        self.xml.open("evaluation", name=name, type=type_)
        if alignment is not None:
            self.xml.open("alignment", type="edit-distance",
                          format="bliss")
            for ref, hyp in alignment:
                if ref is None:
                    self.xml.text(f"{'---':<20}  {{  {hyp:<20}")
                elif hyp is None:
                    self.xml.text(f"{ref:<20}  }}  {'---':<20}")
                elif ref == hyp:
                    self.xml.text(f"{ref:<20}  =  {hyp:<20}")
                else:
                    self.xml.text(f"{ref:<20}  #  {hyp:<20}")
            self.xml.close("alignment")
        self.xml.open("statistic", type="edit-distance")
        self.xml.element("count", str(counts.ref_len), event="token")
        self.xml.element("count", str(counts.dele), event="deletion")
        self.xml.element("count", str(counts.ins), event="insertion")
        self.xml.element("count", str(counts.sub), event="substitution")
        self.xml.close("statistic")
        self.xml.close("evaluation")

    def timing(self, user_seconds: float, real_time_factor: float) -> None:
        self.xml.open("timer")
        self.xml.element("user", f"{user_seconds:.4f}")
        self.xml.close("timer")
        self.xml.element("real-time", f"{real_time_factor:.5f}")

    def search_space_statistics(self, summary: Dict[str, Dict[str, float]]
                                ) -> None:
        """summary: name -> {min, avg, max} (search.statistics format)."""
        if not summary:
            return
        self.xml.open("search-space-statistics")
        for name, stats in summary.items():
            self.xml.open("statistic", name=name)
            for k in ("min", "avg", "max"):
                if k in stats:
                    self.xml.element(k, f"{stats[k]:.2f}")
            self.xml.close("statistic")
        self.xml.close("search-space-statistics")

    def close(self) -> None:
        if self._recording is not None:
            self.xml.close("recording")
            self._recording = None
        self.xml.close("sprint")


# ---------------------------------------------------------------------------
# parsing (the analog side): reference-schema XML -> per-segment records
# ---------------------------------------------------------------------------


def parse_xml_log(path: str) -> List[Dict]:
    """Parses a reference-format recognition log into the record dicts
    analog aggregates (a port of stats/wer.py + stats/time.py semantics:
    counts come from <statistic type="edit-distance"> of the
    'single best' evaluation, time from <timer><user> and <real-time>)."""
    import xml.etree.ElementTree as ET
    with open(path, "r", encoding="utf-8", errors="replace") as fh:
        data = fh.read()
    # tolerate logs without the XML declaration and/or enclosing root
    # (the reference analog wraps such logs in <sprint> too)
    if data.lstrip().startswith("<?xml"):
        data = data.split("?>", 1)[1]
    if "<sprint" not in data[:200]:
        data = "<sprint>" + data + "</sprint>"
    root = ET.fromstring(data)
    records: List[Dict] = []
    for rec in root.iter("recording"):
        for seg in rec.iter("segment"):
            start = float(seg.get("start") or 0.0)
            end = float(seg.get("end") or 0.0)
            record: Dict = {
                "segment": seg.get("full-name") or seg.get("name"),
                "duration": max(end - start, 0.0) or None,
            }
            for orth in seg.iter("orth"):
                key = {"reference": "ref", "recognized": "hyp"}.get(
                    orth.get("source") or "")
                if key:
                    record[key] = " ".join((orth.text or "").split())
            for ev in seg.iter("evaluation"):
                if ev.get("name") != "single best" or \
                        ev.get("type") != "eval":
                    continue
                for st in ev.iter("statistic"):
                    if st.get("type") != "edit-distance":
                        continue
                    counts = {c.get("event"): int(c.text or 0)
                              for c in st.iter("count")}
                    record["ref-len"] = counts.get("token", 0)
                    record["errors"] = (counts.get("deletion", 0)
                                        + counts.get("insertion", 0)
                                        + counts.get("substitution", 0))
            timer = seg.find("timer/user")
            if timer is not None:
                record["time"] = float(timer.text)
            rt = seg.find("real-time")
            if rt is not None:
                record["rtf"] = float(rt.text)
            elif record.get("time") and record.get("duration"):
                record["rtf"] = record["time"] / record["duration"]
            sss = seg.find("search-space-statistics")
            if sss is not None:
                record["search-space-statistics"] = {
                    st.get("name"): {k.tag: float(k.text)
                                     for k in st}
                    for st in sss.iter("statistic")}
            records.append(record)
    return records
