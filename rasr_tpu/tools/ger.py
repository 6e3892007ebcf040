"""ger: grapheme/word error rate tool (reference: src/Tools/Ger/ger.py).

The reference ger.py orchestrates STM -> Bliss corpus -> lattice archive
-> filtered lexicon -> alignment -> error statistics; those stages live
in corpus-tool (STM import), archiver, lexicon-tool, and
bliss.evaluation here.  This tool is the final stage: align reference
and hypothesis transcriptions and report WER + GER (grapheme error
rate), per utterance and aggregated.

Inputs are line-oriented transcription files.  With --by-id, each line
is "<utterance-id> <text>" and pairs are matched by id (CTM-derived or
trn-style); otherwise line N pairs with line N.

Usage:
    python -m rasr_tpu.tools.ger --ref=ref.txt --hyp=hyp.txt [--by-id]
        [--per-utterance]
"""

from __future__ import annotations

import sys
from typing import Dict, List, Tuple

from ..bliss.evaluation import ErrorCounts, align, grapheme_counts


def _load(path: str, by_id: bool) -> List[Tuple[str, str]]:
    out: List[Tuple[str, str]] = []
    with open(path, encoding="utf-8") as fh:
        for i, line in enumerate(fh):
            line = line.rstrip("\n")
            if not line.strip():
                continue
            if by_id:
                parts = line.split(None, 1)
                out.append((parts[0], parts[1] if len(parts) > 1 else ""))
            else:
                out.append((str(i), line))
    return out


def evaluate_pairs(pairs: List[Tuple[str, str, str]]
                   ) -> Tuple[ErrorCounts, ErrorCounts, List[str]]:
    """pairs: (id, ref, hyp).  Returns (word counts, grapheme counts,
    per-utterance report lines)."""
    wer_total = ErrorCounts()
    ger_total = ErrorCounts()
    lines = []
    for uid, ref, hyp in pairs:
        wc, _ = align(ref.split(), hyp.split())
        gc = grapheme_counts(ref, hyp)
        wer_total = wer_total + wc
        ger_total = ger_total + gc
        lines.append(f"{uid} wer={100.0 * wc.rate:.2f}% "
                     f"ger={100.0 * gc.rate:.2f}% "
                     f"(sub {wc.sub} ins {wc.ins} "
                     f"del {wc.dele} / {wc.ref_len})")
    return wer_total, ger_total, lines


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    opts: Dict[str, str] = {}
    for a in argv:
        if a.startswith("--"):
            k, _, v = a[2:].partition("=")
            opts[k] = v or "true"
    ref_path, hyp_path = opts.get("ref"), opts.get("hyp")
    if not ref_path or not hyp_path:
        print(__doc__, file=sys.stderr)
        return 2
    by_id = opts.get("by-id") == "true"
    refs = _load(ref_path, by_id)
    hyps = dict(_load(hyp_path, by_id))
    pairs = [(uid, text, hyps.get(uid, "")) for uid, text in refs]
    wer, ger, lines = evaluate_pairs(pairs)
    if opts.get("per-utterance") == "true":
        for line in lines:
            print(line)
    print(f"utterances: {len(pairs)}")
    print(f"WER: {100.0 * wer.rate:.2f}%  (sub {wer.sub} "
          f"ins {wer.ins} del {wer.dele} / {wer.ref_len})")
    print(f"GER: {100.0 * ger.rate:.2f}%  (sub {ger.sub} "
          f"ins {ger.ins} del {ger.dele} / {ger.ref_len})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
