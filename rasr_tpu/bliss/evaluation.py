"""Edit-distance evaluation (WER/GER).

Levenshtein alignment between reference and hypothesis token sequences with
substitution/insertion/deletion counting (reference: src/Bliss/EditDistance.hh:63,
src/Bliss/Evaluation.hh:31).  Works on words (WER), graphemes (GER) or any
token sequence.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

# costs as in the reference edit distance (unit costs)
_COST_SUB = 1
_COST_INS = 1
_COST_DEL = 1


@dataclass
class ErrorCounts:
    corr: int = 0
    sub: int = 0
    ins: int = 0
    dele: int = 0
    ref_len: int = 0

    @property
    def errors(self) -> int:
        return self.sub + self.ins + self.dele

    @property
    def rate(self) -> float:
        return self.errors / self.ref_len if self.ref_len else (
            1.0 if self.ins else 0.0)

    def __add__(self, other: "ErrorCounts") -> "ErrorCounts":
        return ErrorCounts(self.corr + other.corr, self.sub + other.sub,
                           self.ins + other.ins, self.dele + other.dele,
                           self.ref_len + other.ref_len)


def align(ref: Sequence[str], hyp: Sequence[str]
          ) -> Tuple[ErrorCounts, List[Tuple[Optional[str], Optional[str]]]]:
    """Levenshtein alignment; returns error counts and (ref, hyp) pairs
    (None marks an insertion/deletion gap)."""
    n, m = len(ref), len(hyp)
    # DP over (n+1, m+1); back pointers: 0=diag, 1=up(del), 2=left(ins)
    dist = np.zeros((n + 1, m + 1), dtype=np.int32)
    back = np.zeros((n + 1, m + 1), dtype=np.int8)
    dist[:, 0] = np.arange(n + 1) * _COST_DEL
    dist[0, :] = np.arange(m + 1) * _COST_INS
    back[1:, 0] = 1
    back[0, 1:] = 2
    for i in range(1, n + 1):
        sub_cost = np.where(np.array([ref[i - 1] == h for h in hyp]), 0, _COST_SUB)
        for j in range(1, m + 1):
            diag = dist[i - 1, j - 1] + sub_cost[j - 1]
            up = dist[i - 1, j] + _COST_DEL
            left = dist[i, j - 1] + _COST_INS
            best = min(diag, up, left)
            dist[i, j] = best
            back[i, j] = 0 if best == diag else (1 if best == up else 2)
    # traceback
    pairs: List[Tuple[Optional[str], Optional[str]]] = []
    counts = ErrorCounts(ref_len=n)
    i, j = n, m
    while i > 0 or j > 0:
        b = back[i, j]
        if b == 0 and i > 0 and j > 0:
            pairs.append((ref[i - 1], hyp[j - 1]))
            if ref[i - 1] == hyp[j - 1]:
                counts.corr += 1
            else:
                counts.sub += 1
            i, j = i - 1, j - 1
        elif b == 1 and i > 0:
            pairs.append((ref[i - 1], None))
            counts.dele += 1
            i -= 1
        else:
            pairs.append((None, hyp[j - 1]))
            counts.ins += 1
            j -= 1
    pairs.reverse()
    return counts, pairs


class Evaluator:
    """Per-segment and corpus-aggregated WER evaluation
    (reference Bliss::Evaluator, src/Bliss/Evaluation.hh:31)."""

    def __init__(self, name: str = "evaluation"):
        self.name = name
        self.total = ErrorCounts()
        self.n_segments = 0

    def evaluate(self, ref_orth: str, hyp_orth: str) -> ErrorCounts:
        counts, _ = align(ref_orth.split(), hyp_orth.split())
        self.total = self.total + counts
        self.n_segments += 1
        return counts

    @property
    def wer(self) -> float:
        return self.total.rate

    def report(self) -> str:
        t = self.total
        return (f"{self.name}: segments={self.n_segments} ref={t.ref_len} "
                f"cor={t.corr} sub={t.sub} del={t.dele} ins={t.ins} "
                f"errors={t.errors} wer={100.0 * t.rate:.2f}%")


def grapheme_counts(ref_orth: str, hyp_orth: str) -> ErrorCounts:
    """Grapheme error rate counting (reference Ger tool, src/Tools/Ger)."""
    counts, _ = align(list(ref_orth.replace(" ", "")), list(hyp_orth.replace(" ", "")))
    return counts
