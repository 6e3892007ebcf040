"""Lattice-side evaluation: oracle alignment (lattice WER) and
time-frame error.

The reference evaluates both the single-best path and the whole lattice
("lattice" evaluation mode, src/Bliss/Evaluation.hh:31; Flf evaluator +
oracle-alignment nodes, src/Flf/Evaluate.cc, NodeRegistration
"oracle-alignment").  Lattice WER is the minimum edit distance between
the reference orthography and ANY path of the lattice — the floor any
downstream rescoring can reach.

The DP here runs over (lattice states in topological order) x (reference
positions) with the whole reference axis vectorized per arc: each arc
relaxation is a handful of shifted numpy min-ops, so cost is
O(arcs * ref_len) array ops, not a Python cell loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..fsa.automaton import EPS
from .lattice import FlfLattice


@dataclass
class OracleResult:
    errors: int                 # substitutions + insertions + deletions
    ref_len: int
    labels: List[int]           # oracle path word labels (eps-free)
    arc_path: List[int]         # arc indices of the oracle path

    @property
    def wer(self) -> float:
        return self.errors / max(self.ref_len, 1)


def _del_closure(row: np.ndarray) -> np.ndarray:
    """Allow deletions (skip reference words): prefix-min with +1 steps."""
    out = row.copy()
    for i in range(1, len(out)):
        if out[i - 1] + 1.0 < out[i]:
            out[i] = out[i - 1] + 1.0
    return out


def oracle_alignment(lat: FlfLattice, ref_words: Sequence[str],
                     word_of: Optional[Dict[int, str]] = None
                     ) -> OracleResult:
    """Minimum-edit-distance path through the lattice vs `ref_words`."""
    words = word_of if word_of is not None else (lat.words or {})
    R = len(ref_words)
    ref = list(ref_words)
    INF = 1e18
    n = lat.n_states
    # D[s] = (R+1,) best errors reaching state s having consumed i refs
    D = np.full((n, R + 1), INF)
    # backpointer: (arc index, prev ref position) per (state, ref pos)
    bp_arc = np.full((n, R + 1), -1, np.int64)
    bp_pos = np.full((n, R + 1), -1, np.int64)
    D[lat.initial] = _del_closure(
        np.concatenate([[0.0], np.full(R, INF)]))
    order = lat.topological()
    out_order = np.argsort(lat.sources, kind="stable")
    out_ptr = np.searchsorted(lat.sources[out_order], np.arange(n + 1))
    for s in order:
        row = D[s]
        if not np.isfinite(row).any():
            continue
        for k in out_order[out_ptr[s]:out_ptr[s + 1]]:
            k = int(k)
            t = int(lat.targets[k])
            lab = int(lat.labels[k])
            if lab == EPS:
                cand = row
                cpos = np.arange(R + 1)
            else:
                hyp = words.get(lab, f"w{lab}")
                # substitution/match: consume one ref word
                sub = np.full(R + 1, INF)
                match_cost = np.asarray(
                    [0.0 if hyp == ref[i] else 1.0 for i in range(R)])
                sub[1:] = row[:-1] + match_cost
                # insertion: hyp word, no ref consumed
                ins = row + 1.0
                cand = np.minimum(sub, ins)
                cpos = np.where(sub <= ins,
                                np.arange(R + 1) - 1, np.arange(R + 1))
            better = cand < D[t]
            if better.any():
                D[t] = np.where(better, cand, D[t])
                bp_arc[t][better] = k
                bp_pos[t][better] = cpos[better]
            # deletion closure at t
            closed = _del_closure(D[t])
            ddel = closed < D[t]
            if ddel.any():
                # deletions: same arc as position i-1's entry
                for i in np.flatnonzero(ddel):
                    D[t][i] = closed[i]
                    bp_arc[t][i] = -2  # marker: deletion step
                    bp_pos[t][i] = i - 1
    # best final
    best = (None, INF)
    for s in lat.final_states:
        v = D[int(s)][R]
        if v < best[1]:
            best = (int(s), float(v))
    if best[0] is None:
        return OracleResult(R, R, [], [])
    # trace back
    s, i = best[0], R
    arcs_rev: List[int] = []
    while not (s == lat.initial and bp_arc[s][i] == -1):
        k = bp_arc[s][i]
        if k == -1:
            break
        if k == -2:   # deletion
            i = int(bp_pos[s][i])
            continue
        arcs_rev.append(int(k))
        i = int(bp_pos[s][i])
        s = int(lat.sources[int(k)])
    arcs_rev.reverse()
    labels = [int(lat.labels[k]) for k in arcs_rev
              if lat.labels[k] != EPS]
    return OracleResult(int(round(best[1])), R, labels, arcs_rev)


def lattice_wer(lat: FlfLattice, ref_orth: str) -> float:
    """Lattice (oracle) WER vs a reference orthography string."""
    return oracle_alignment(lat, ref_orth.split()).wer


def timeframe_error(lat: FlfLattice, ref_labels: Sequence[int],
                    ref_bounds: Sequence[Tuple[int, int]]) -> float:
    """Time-frame error of the best path vs a time-aligned reference:
    fraction of reference frames whose covering word differs (reference
    TimeframeError, src/Flf/TimeframeConfusionNetwork.cc family)."""
    _, _, path = lat.best()
    if not ref_bounds:
        return 0.0
    T = max(e for (_s, e) in ref_bounds)
    hyp = np.zeros(T, np.int64)
    for k in path:
        s = int(lat.boundaries[lat.sources[k]])
        e = int(lat.boundaries[lat.targets[k]])
        hyp[s:min(e, T)] = int(lat.labels[k])
    err = 0
    tot = 0
    for lab, (s, e) in zip(ref_labels, ref_bounds):
        e = min(e, T)
        tot += e - s
        err += int((hyp[s:e] != lab).sum())
    return err / max(tot, 1)
