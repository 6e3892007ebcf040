"""Lattice transforms: time conditioning, determinization, minimization.

Reference: Lattice::timeConditionedWordLattice (src/Lattice/Lattice.cc:283
TimeConditionedWordLattice merges states with equal word boundary) and the
Flf determinize/minimize nodes (src/Flf/Determinize.hh:25,31, which apply
the Fsa-layer weighted algorithms to the lattice FSA part).

Determinize/minimize operate on the combined-score acceptor view; the
resulting lattice carries the combined weight on am_score (the am/lm
split cannot be preserved through subset construction) and state times
re-derived as the minimum merged boundary.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from ..fsa.automaton import Automaton, minimize as fsa_minimize
from .word_lattice import WordLattice


def time_conditioned(lattice: WordLattice) -> WordLattice:
    """Merge states with equal time frame (word boundary): the result has
    one state per distinct boundary, arcs unioned over merged states.
    Arcs duplicated by the merge (same word, source time, target time and
    scores) collapse to one."""
    times = sorted(set(lattice.boundaries[s] for s in range(lattice.n_states)))
    state_of: Dict[int, int] = {t: i for i, t in enumerate(times)}
    out = WordLattice(words=lattice.words)
    for t in times:
        out.add_state(t)
    out.initial = state_of[lattice.boundaries[lattice.initial]]
    seen = set()
    for s in range(lattice.n_states):
        src = state_of[lattice.boundaries[s]]
        for arc in lattice.arcs[s]:
            dst = state_of[lattice.boundaries[arc.target]]
            key = (src, dst, arc.word, round(arc.am_score, 9),
                   round(arc.lm_score, 9))
            if key in seen:
                continue
            seen.add(key)
            out.add_arc(src, dst, arc.word, arc.am_score, arc.lm_score)
    for s, w in lattice.final.items():
        t = state_of[lattice.boundaries[s]]
        if t not in out.final or w < out.final[t]:
            out.set_final(t, w)
    return out


def _from_automaton(fsa: Automaton, times: List[int],
                    words=None) -> WordLattice:
    out = WordLattice(words=words)
    for s in range(fsa.n_states):
        out.add_state(times[s] if s < len(times) else 0)
    out.initial = fsa.initial
    for s in range(fsa.n_states):
        for a in fsa.arcs[s]:
            out.add_arc(s, a.target, a.ilabel, am_score=a.weight,
                        lm_score=0.0)
    for s, w in fsa.final.items():
        out.set_final(s, w)
    return out


def _derive_times(lattice: WordLattice, fsa: Automaton) -> List[int]:
    """Assign each automaton state the earliest time consistent with a
    BFS over arc topology (merged subsets lose exact boundaries)."""
    times = [0] * fsa.n_states
    seen = [False] * fsa.n_states
    seen[fsa.initial] = True
    times[fsa.initial] = (lattice.boundaries[lattice.initial]
                          if lattice.boundaries else 0)
    order = [fsa.initial]
    i = 0
    max_t = max(lattice.boundaries) if lattice.boundaries else 0
    while i < len(order):
        s = order[i]
        i += 1
        for a in fsa.arcs[s]:
            t = min(times[s] + 1, max_t)
            if not seen[a.target]:
                seen[a.target] = True
                times[a.target] = t
                order.append(a.target)
            else:
                times[a.target] = min(times[a.target], t)
    return times


def determinize_lattice(lattice: WordLattice, am_scale: float = 1.0,
                        lm_scale: float = 1.0) -> WordLattice:
    """Weighted determinization of the combined-score acceptor view
    (Flf::determinize): subset construction with residual weights, at
    most one arc per word per state, path scores preserved.  A merged
    state's boundary is the minimum boundary of its subset."""
    from ..fsa.automaton import INF

    out = WordLattice(words=lattice.words)
    start = ((lattice.initial, 0.0),)
    t0 = (lattice.boundaries[lattice.initial]
          if lattice.boundaries else 0)
    ids: Dict[Tuple, int] = {start: out.add_state(t0)}
    out.initial = ids[start]
    stack = [start]
    while stack:
        subset = stack.pop()
        sid = ids[subset]
        fw = INF
        for (s, r) in subset:
            if s in lattice.final:
                fw = min(fw, r + lattice.final[s])
        if fw < INF:
            out.set_final(sid, fw)
        by_word: Dict[int, Dict[int, float]] = {}
        for (s, r) in subset:
            for arc in lattice.arcs[s]:
                w = r + am_scale * arc.am_score + lm_scale * arc.lm_score
                d = by_word.setdefault(arc.word, {})
                if w < d.get(arc.target, INF):
                    d[arc.target] = w
        for word, targets in sorted(by_word.items()):
            w_min = min(targets.values())
            new_subset = tuple(sorted((t, w - w_min)
                                      for t, w in targets.items()))
            if new_subset not in ids:
                bnd = min(lattice.boundaries[t] for t, _ in new_subset)
                ids[new_subset] = out.add_state(bnd)
                stack.append(new_subset)
            out.add_arc(sid, ids[new_subset], word, am_score=w_min,
                        lm_score=0.0)
    return out


def minimize_lattice(lattice: WordLattice, am_scale: float = 1.0,
                     lm_scale: float = 1.0) -> WordLattice:
    """Weighted minimization (Flf::minimize) of the acceptor view."""
    fsa = fsa_minimize(lattice.automaton(am_scale, lm_scale))
    return _from_automaton(fsa, _derive_times(lattice, fsa), lattice.words)
