"""Bliss corpus description.

Data model + visitor traversal for the Bliss corpus XML format
(reference: src/Bliss/CorpusDescription.hh:267,281,321,
src/Bliss/CorpusParser.cc).  Supports the reference parallelization knobs
(src/Bliss/CorpusDescription.cc:173-207,482-496): `partition` /
`select-partition` (round-robin by segment or recording index),
`skip-first-segments`, segment whitelists (`segments.file`),
`segments-to-skip`, `segment-order` files and shuffling — these define the
data-parallel unit of the framework.

Corpus XML structure::

    <corpus name="c">
      <subcorpus name="sc"> ... </subcorpus>
      <include file="more.corpus"/>
      <speaker-description name="s1"><gender>male</gender></speaker-description>
      <recording name="r1" audio="r1.wav">
        <segment name="1" start="0.0" end="2.5" track="0">
          <speaker name="s1"/>
          <orth> HELLO WORLD </orth>
        </segment>
      </recording>
    </corpus>
"""

from __future__ import annotations

import gzip
import os
import random
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

from ..core.configuration import Configuration
from ..core.parameter import (ParameterBool, ParameterInt, ParameterString,
                              ParameterStringVector)


@dataclass
class Speaker:
    name: str = ""
    gender: str = ""
    attributes: Dict[str, str] = field(default_factory=dict)


@dataclass
class AcousticCondition:
    name: str = ""
    attributes: Dict[str, str] = field(default_factory=dict)


@dataclass
class Recording:
    name: str
    audio: str = ""
    video: str = ""
    duration: float = 0.0
    corpus_name: str = ""  # full name of enclosing (sub)corpus
    segments: List["Segment"] = field(default_factory=list)

    @property
    def full_name(self) -> str:
        return f"{self.corpus_name}/{self.name}" if self.corpus_name else self.name


@dataclass
class Segment:
    name: str
    recording: Recording
    start: float = 0.0
    end: float = 0.0
    track: int = 0
    orth: str = ""
    left_context_orth: str = ""
    right_context_orth: str = ""
    speaker: Optional[Speaker] = None
    condition: Optional[AcousticCondition] = None

    @property
    def full_name(self) -> str:
        return f"{self.recording.full_name}/{self.name}"

    @property
    def duration(self) -> float:
        return self.end - self.start


# speech segments carry an orthography; plain segments do not
SpeechSegment = Segment


class CorpusVisitor:
    """Visitor interface (reference CorpusVisitor, doc/architecture.rst:355)."""

    def enter_corpus(self, name: str) -> None: ...
    def leave_corpus(self, name: str) -> None: ...
    def enter_recording(self, recording: Recording) -> None: ...
    def leave_recording(self, recording: Recording) -> None: ...
    def visit_segment(self, segment: Segment) -> None: ...


def _open_maybe_gz(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rb")
    return open(path, "rb")


class CorpusDescription:
    param_file = ParameterString("file", "corpus XML file")
    param_partition = ParameterInt("partition", "number of partitions", 0, minimum=0)
    param_select_partition = ParameterInt("select-partition", "partition index", 0, minimum=0)
    param_recording_based = ParameterBool(
        "recording-based-partition", "partition by recording index", False)
    param_skip_first = ParameterInt("skip-first-segments", "skip first N segments", 0)
    param_segments_to_skip = ParameterStringVector("segments-to-skip", "full names to skip")
    param_segment_order = ParameterString("segment-order", "segment order file", "")
    param_shuffle = ParameterBool("segment-order-shuffle", "shuffle segments", False)
    param_shuffle_seed = ParameterInt("segment-order-shuffle-seed", "shuffle seed", -1)
    param_sort_by_length = ParameterBool(
        "segment-order-sort-by-time-length", "sort by duration", False)
    param_sort_chunk = ParameterInt(
        "segment-order-sort-by-time-length-chunk-size", "sort chunk", -1)

    def __init__(self, config: Configuration):
        self.config = config
        self.file = self.param_file(config)
        self.name = ""
        self.recordings: List[Recording] = []
        self._speakers: Dict[str, Speaker] = {}
        self._conditions: Dict[str, AcousticCondition] = {}
        if self.file:
            self._parse(self.file)
        # segment whitelist: <selection>.segments.file
        self._whitelist: Optional[set] = None
        wl_file = config.sub("segments").get("file")
        if wl_file:
            with open(wl_file, "r", encoding="utf-8") as fh:
                self._whitelist = {l.strip() for l in fh if l.strip()}

    # -- parsing --------------------------------------------------------------

    def _parse(self, path: str) -> None:
        with _open_maybe_gz(path) as fh:
            root = ET.parse(fh).getroot()
        if root.tag != "corpus":
            raise ValueError(f"{path}: root element must be <corpus>, got <{root.tag}>")
        self.name = root.get("name", "")
        base_dir = os.path.dirname(os.path.abspath(path))
        self._parse_corpus_body(root, self.name, base_dir)

    def _parse_corpus_body(self, elem: ET.Element, corpus_name: str, base_dir: str) -> None:
        default_speaker: Optional[Speaker] = None
        default_condition: Optional[AcousticCondition] = None
        for child in elem:
            if child.tag == "speaker-description":
                sp = self._parse_speaker_description(child)
                self._speakers[sp.name] = sp
            elif child.tag == "speaker":
                default_speaker = self._speakers.get(child.get("name", ""))
            elif child.tag == "condition-description":
                cond = AcousticCondition(name=child.get("name", ""))
                for sub in child:
                    cond.attributes[sub.tag] = (sub.text or "").strip()
                self._conditions[cond.name] = cond
            elif child.tag == "condition":
                default_condition = self._conditions.get(child.get("name", ""))
            elif child.tag == "subcorpus":
                sub_name = f"{corpus_name}/{child.get('name', '')}"
                self._parse_corpus_body(child, sub_name, base_dir)
            elif child.tag == "include":
                inc = child.get("file", "")
                inc_path = inc if os.path.isabs(inc) else os.path.join(base_dir, inc)
                with _open_maybe_gz(inc_path) as fh:
                    inc_root = ET.parse(fh).getroot()
                self._parse_corpus_body(inc_root, corpus_name, os.path.dirname(inc_path))
            elif child.tag == "recording":
                self._parse_recording(child, corpus_name, base_dir,
                                      default_speaker, default_condition)

    def _parse_speaker_description(self, elem: ET.Element) -> Speaker:
        sp = Speaker(name=elem.get("name", ""))
        for sub in elem:
            text = (sub.text or "").strip()
            if sub.tag == "gender":
                sp.gender = text
            sp.attributes[sub.tag] = text
        return sp

    def _parse_recording(self, elem: ET.Element, corpus_name: str, base_dir: str,
                         default_speaker, default_condition) -> None:
        audio = elem.get("audio", "")
        if audio and not os.path.isabs(audio):
            audio_dir = self.config.get("audio-dir") or base_dir
            audio = os.path.join(audio_dir, audio)
        rec = Recording(name=elem.get("name", ""), audio=audio,
                        duration=float(elem.get("duration", 0) or 0),
                        corpus_name=corpus_name)
        rec_speaker, rec_condition = default_speaker, default_condition
        seg_auto = 0
        for child in elem:
            if child.tag == "speaker-description":
                sp = self._parse_speaker_description(child)
                self._speakers[sp.name] = sp
            elif child.tag == "speaker":
                rec_speaker = self._speakers.get(child.get("name", ""))
            elif child.tag == "condition":
                rec_condition = self._conditions.get(child.get("name", ""))
            elif child.tag == "segment":
                seg_auto += 1
                seg = Segment(
                    name=child.get("name") or str(seg_auto),
                    recording=rec,
                    start=float(child.get("start", 0) or 0),
                    end=float(child.get("end", 0) or rec.duration),
                    track=int(child.get("track", 0) or 0),
                    speaker=rec_speaker,
                    condition=rec_condition)
                for sub in child:
                    text = (sub.text or "").strip()
                    if sub.tag == "orth":
                        seg.orth = " ".join(text.split())
                    elif sub.tag == "left-context-orth":
                        seg.left_context_orth = text
                    elif sub.tag == "right-context-orth":
                        seg.right_context_orth = text
                    elif sub.tag == "speaker":
                        seg.speaker = self._speakers.get(sub.get("name", ""), seg.speaker)
                    elif sub.tag == "condition":
                        seg.condition = self._conditions.get(sub.get("name", ""), seg.condition)
                rec.segments.append(seg)
        self.recordings.append(rec)

    # -- iteration / traversal ------------------------------------------------

    def segments(self) -> Iterator[Segment]:
        """Segments after partitioning / skipping / ordering (the reference's
        effective visiting order)."""
        n_part = self.param_partition(self.config)
        sel = self.param_select_partition(self.config)
        if n_part and sel == n_part:
            sel = 0  # SGE array-job convention (CorpusDescription.cc:493)
        rec_based = self.param_recording_based(self.config)
        skip_first = self.param_skip_first(self.config)
        to_skip = set(self.param_segments_to_skip(self.config))

        segs: List[Segment] = []
        seg_index = 0
        for rec_index, rec in enumerate(self.recordings):
            for seg in rec.segments:
                index = rec_index if rec_based else seg_index
                seg_index += 1
                if n_part and (index % n_part) != sel:
                    continue
                if self._whitelist is not None and seg.full_name not in self._whitelist:
                    continue
                if seg.full_name in to_skip:
                    continue
                segs.append(seg)
        segs = segs[skip_first:]

        order_file = self.param_segment_order(self.config)
        if order_file:
            by_name = {s.full_name: s for s in segs}
            ordered = []
            with open(order_file, "r", encoding="utf-8") as fh:
                for line in fh:
                    nm = line.strip()
                    if nm in by_name:
                        ordered.append(by_name[nm])
            segs = ordered
        if self.param_sort_by_length(self.config):
            chunk = self.param_sort_chunk(self.config)
            if chunk and chunk > 0:
                segs = [s for i in range(0, len(segs), chunk)
                        for s in sorted(segs[i:i + chunk], key=lambda x: x.duration)]
            else:
                segs = sorted(segs, key=lambda s: s.duration)
        if self.param_shuffle(self.config):
            seed = self.param_shuffle_seed(self.config)
            rng = random.Random(seed if seed >= 0 else None)
            segs = list(segs)
            rng.shuffle(segs)
        return iter(segs)

    def accept(self, visitor: CorpusVisitor) -> None:
        """Visitor traversal in effective segment order, with recording
        enter/leave events (reference accept(), doc/architecture.rst:355-375)."""
        visitor.enter_corpus(self.name)
        current_rec: Optional[Recording] = None
        for seg in self.segments():
            if seg.recording is not current_rec:
                if current_rec is not None:
                    visitor.leave_recording(current_rec)
                current_rec = seg.recording
                visitor.enter_recording(current_rec)
            visitor.visit_segment(seg)
        if current_rec is not None:
            visitor.leave_recording(current_rec)
        visitor.leave_corpus(self.name)


# ---------------------------------------------------------------------------
# corpus writing (reference: the Bliss corpus XML format written by
# src/Tools/Bliss/corpustool.py / xmlWriterLib.py)
# ---------------------------------------------------------------------------


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;").replace('"', "&quot;"))


def write_corpus_xml(name: str, recordings: List[Recording], path: str
                     ) -> None:
    """Write a Bliss corpus XML file (gzip when path ends with .gz)."""
    import gzip
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="utf-8"?>\n')
        fh.write(f'<corpus name="{_xml_escape(name)}">\n')
        speakers_written = set()
        for rec in recordings:
            for seg in rec.segments:
                sp = seg.speaker
                if sp is not None and sp.name and \
                        sp.name not in speakers_written:
                    speakers_written.add(sp.name)
                    fh.write(f'  <speaker-description name='
                             f'"{_xml_escape(sp.name)}">\n')
                    if sp.gender:
                        fh.write(f'    <gender>{_xml_escape(sp.gender)}'
                                 f'</gender>\n')
                    fh.write('  </speaker-description>\n')
        for rec in recordings:
            attrs = f' name="{_xml_escape(rec.name)}"'
            if rec.audio:
                attrs += f' audio="{_xml_escape(rec.audio)}"'
            fh.write(f'  <recording{attrs}>\n')
            for seg in rec.segments:
                s_attrs = f' name="{_xml_escape(seg.name)}"'
                s_attrs += f' start="{seg.start:.3f}" end="{seg.end:.3f}"'
                if seg.track:
                    s_attrs += f' track="{seg.track}"'
                fh.write(f'    <segment{s_attrs}>\n')
                if seg.speaker is not None and seg.speaker.name:
                    fh.write(f'      <speaker name='
                             f'"{_xml_escape(seg.speaker.name)}"/>\n')
                if seg.orth:
                    fh.write(f'      <orth> {_xml_escape(seg.orth)} '
                             f'</orth>\n')
                fh.write('    </segment>\n')
            fh.write('  </recording>\n')
        fh.write('</corpus>\n')


def collect_recordings(corpus: "CorpusDescription") -> List[Recording]:
    """Materialize the streamed corpus as a recording list (segments
    grouped under their recordings, original order preserved)."""
    recs: List[Recording] = []
    seen: Dict[int, Recording] = {}
    for seg in corpus.segments():
        rec = seg.recording
        if id(rec) not in seen:
            seen[id(rec)] = rec
            recs.append(rec)
    return recs


def corpus_key(segment) -> str:
    """Grouping key for per-speaker estimation AND per-segment transform
    selection (reference Bliss::CorpusKey): speaker name when present,
    else the recording's full name.  The trainer writes adaptation
    transforms under these keys and the recognizer looks them up — both
    must use THIS helper."""
    if getattr(segment, "speaker", None) is not None:
        return segment.speaker.name
    return segment.recording.full_name
