"""corpus-tool: Bliss corpus manipulation CLI
(reference: src/Tools/Bliss/corpustool.py + corpus.py helpers).

Actions (chained left to right over the loaded corpus):
  info                     print corpus statistics (JSON)
  filter                   keep segments matching --corpus-tool.filter.*
                           (min/max-duration, speaker, orth-regex,
                           segment-list=<file with full names>)
  merge                    (implicit) all input corpora are concatenated
  head=N                   keep the first N segments
  write=<out.xml[.gz]>     write the (filtered) corpus as Bliss XML
  text=<out.txt>           write one orthography per line
  stm=<out.stm>            write NIST STM transcripts
  vocab=<out.txt>          write the sorted word list
  segments=<out.txt>       write full segment names (cache keys)

Usage:
  python -m rasr_tpu.tools.corpus_tool --corpus-tool.corpus.file=c.xml \
      [--corpus-tool.corpus.file-2=c2.xml ...] info filter write=out.xml
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter
from typing import List

from ..bliss.corpus import (CorpusDescription, Recording, Segment,
                            collect_recordings, write_corpus_xml)
from ..core.application import Application


class CorpusToolApp(Application):
    def __init__(self, argv=None):
        super().__init__("corpus-tool", argv)

    # -- corpus loading ------------------------------------------------------

    def _load(self) -> List[Recording]:
        cfg = self.config.sub("corpus")
        recs: List[Recording] = []
        idx = 0
        while True:
            key = "file" if idx == 0 else f"file-{idx + 1}"
            path = cfg.get(key)
            if not path:
                break
            sub = self.config.sub("corpus")
            sub.set("file", path)
            recs.extend(collect_recordings(CorpusDescription(sub)))
            idx += 1
        if not recs:
            raise SystemExit("no corpus given (--corpus-tool.corpus.file=)")
        return recs

    def _segments(self, recs: List[Recording]):
        for rec in recs:
            for seg in rec.segments:
                yield seg

    # -- actions -------------------------------------------------------------

    def _info(self, recs: List[Recording]) -> None:
        segs = list(self._segments(recs))
        vocab = Counter(tok for s in segs for tok in s.orth.split())
        print(json.dumps({
            "recordings": len(recs),
            "segments": len(segs),
            "total-duration-s": round(sum(s.duration for s in segs), 2),
            "orth-tokens": sum(vocab.values()),
            "distinct-words": len(vocab),
            "speakers": len({s.speaker.name for s in segs
                             if s.speaker is not None}),
        }, indent=2))

    def _filter(self, recs: List[Recording]) -> List[Recording]:
        f = self.config.sub("filter")
        min_dur = float(f.get("min-duration") or 0.0)
        max_dur = float(f.get("max-duration") or 1e30)
        speaker = f.get("speaker")
        orth_re = f.get("orth-regex")
        pattern = re.compile(orth_re) if orth_re else None
        seg_list = f.get("segment-list")
        allowed = None
        if seg_list:
            with open(seg_list) as fh:
                allowed = {line.strip() for line in fh if line.strip()}

        def keep(seg: Segment) -> bool:
            if not (min_dur <= seg.duration <= max_dur):
                return False
            if speaker and (seg.speaker is None
                            or seg.speaker.name != speaker):
                return False
            if pattern is not None and not pattern.search(seg.orth):
                return False
            if allowed is not None and seg.full_name not in allowed:
                return False
            return True

        out = []
        for rec in recs:
            kept = [s for s in rec.segments if keep(s)]
            if kept:
                new = Recording(rec.name, rec.audio, rec.video, rec.duration,
                                rec.corpus_name, kept)
                for s in kept:
                    s.recording = new
                out.append(new)
        return out

    def _head(self, recs: List[Recording], n: int) -> List[Recording]:
        out, count = [], 0
        for rec in recs:
            if count >= n:
                break
            kept = rec.segments[:n - count]
            count += len(kept)
            out.append(Recording(rec.name, rec.audio, rec.video,
                                 rec.duration, rec.corpus_name, kept))
        return out

    # -- STM import (reference: src/Tools/Ger/ger.py StmToBlissConverter) ----

    @staticmethod
    def _from_stm(path: str) -> List[Recording]:
        """NIST STM -> recordings: lines `wave channel speaker t0 t1
        [<labels>] transcript`; ;;-comment lines skipped."""
        from ..bliss.corpus import Speaker
        recs: Dict[str, Recording] = {}
        speakers: Dict[str, Speaker] = {}
        counter: Dict[str, int] = {}
        with open(path, encoding="utf-8", errors="replace") as fh:
            for line in fh:
                if not line.strip() or line.startswith(";;"):
                    continue
                parts = line.split(None, 5)
                if len(parts) < 6:
                    continue
                wave, channel, spk, t0, t1, rest = parts
                rest = rest.strip()
                if rest.startswith("<"):  # optional label set <o,f0,...>
                    close = rest.find(">")
                    rest = rest[close + 1:].strip() if close >= 0 else rest
                if wave not in recs:
                    recs[wave] = Recording(wave, audio=wave + ".wav")
                    counter[wave] = 0
                counter[wave] += 1
                rec = recs[wave]
                speaker = speakers.setdefault(spk, Speaker(name=spk))
                try:
                    track = max(int(channel) - 1, 0)
                except ValueError:
                    track = 0
                seg = Segment(name=str(counter[wave]), recording=rec,
                              start=float(t0), end=float(t1), track=track,
                              orth=rest, speaker=speaker)
                rec.segments.append(seg)
        return list(recs.values())

    # -- main ---------------------------------------------------------------

    def run(self) -> int:
        stm = self.config.get("from-stm")
        recs = self._from_stm(stm) if stm else self._load()
        name = self.config.sub("corpus").get("name") or "corpus"
        actions = self.arguments or ["info"]
        for action in actions:
            op, _, arg = action.partition("=")
            if op == "info":
                self._info(recs)
            elif op == "filter":
                recs = self._filter(recs)
            elif op == "head":
                recs = self._head(recs, int(arg))
            elif op == "write":
                write_corpus_xml(name, recs, arg)
                self.log("wrote %s", arg)
            elif op == "text":
                with open(arg, "w") as fh:
                    for seg in self._segments(recs):
                        fh.write(seg.orth + "\n")
            elif op == "stm":
                with open(arg, "w") as fh:
                    for seg in self._segments(recs):
                        spk = (seg.speaker.name if seg.speaker is not None
                               else "unknown")
                        fh.write(f"{seg.recording.name} {seg.track + 1} "
                                 f"{spk} {seg.start:.2f} {seg.end:.2f} "
                                 f"{seg.orth}\n")
            elif op == "vocab":
                vocab = sorted({tok for seg in self._segments(recs)
                                for tok in seg.orth.split()})
                with open(arg, "w") as fh:
                    fh.write("\n".join(vocab) + "\n")
            elif op == "segments":
                with open(arg, "w") as fh:
                    for seg in self._segments(recs):
                        fh.write(seg.full_name + "\n")
            else:
                raise SystemExit(f"unknown action {action!r}")
        return 0


def main(argv=None) -> int:
    return CorpusToolApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
