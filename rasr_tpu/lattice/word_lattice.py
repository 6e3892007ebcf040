"""Word lattices.

The reference StandardWordLattice keeps parallel acoustic and LM
Fsa acceptors plus word boundaries (src/Lattice/Lattice.hh:183,279,
doc/architecture.rst:563-575).  Here a single automaton carries structure
while arcs store (am_score, lm_score) separately — scale changes rescore
without rebuilding; boundaries live on states.

Includes posterior computation (forward-backward over the log semiring,
reference src/Lattice/Posterior.cc / Flf FwdBwd), n-best extraction and
HTK SLF text IO (src/Lattice/HtkWriter.cc).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from ..fsa.automaton import EPS, INF, Automaton, LOG, logadd, n_best as fsa_n_best, sssp


@dataclass
class LatticeArc:
    target: int
    word: int                  # lemma / label id; EPS for non-word arcs
    am_score: float = 0.0
    lm_score: float = 0.0


@dataclass
class WordLattice:
    arcs: List[List[LatticeArc]] = field(default_factory=list)
    boundaries: List[int] = field(default_factory=list)  # frame per state
    initial: int = 0
    final: Dict[int, float] = field(default_factory=dict)
    words: Optional[Dict[int, str]] = None  # id -> orth

    def add_state(self, time_frame: int = 0) -> int:
        self.arcs.append([])
        self.boundaries.append(time_frame)
        return len(self.arcs) - 1

    def add_arc(self, source: int, target: int, word: int,
                am_score: float = 0.0, lm_score: float = 0.0) -> None:
        self.arcs[source].append(LatticeArc(target, word, am_score, lm_score))

    def set_final(self, state: int, weight: float = 0.0) -> None:
        self.final[state] = weight

    @property
    def n_states(self) -> int:
        return len(self.arcs)

    @property
    def n_arcs(self) -> int:
        return sum(len(a) for a in self.arcs)

    # -- views ---------------------------------------------------------------

    def automaton(self, am_scale: float = 1.0, lm_scale: float = 1.0,
                  semiring=None) -> Automaton:
        """Combined-score FSA view (reference: lattice 'total' part)."""
        fsa = Automaton()
        if semiring is not None:
            fsa.semiring = semiring
        for _ in range(self.n_states):
            fsa.add_state()
        fsa.initial = self.initial
        for s in range(self.n_states):
            for arc in self.arcs[s]:
                fsa.add_arc(s, arc.target, arc.word, arc.word,
                            am_scale * arc.am_score + lm_scale * arc.lm_score)
        for s, w in self.final.items():
            fsa.set_final(s, w)
        return fsa

    # -- algorithms -----------------------------------------------------------

    def best(self, am_scale: float = 1.0, lm_scale: float = 1.0
             ) -> Tuple[List[int], float]:
        from ..fsa.automaton import best_path
        ilabels, _, score = best_path(self.automaton(am_scale, lm_scale))
        return ilabels, score

    def n_best(self, n: int, am_scale: float = 1.0, lm_scale: float = 1.0
               ) -> List[Tuple[List[int], float]]:
        return fsa_n_best(self.automaton(am_scale, lm_scale), n)

    def arc_posteriors(self, am_scale: float = 1.0, lm_scale: float = 1.0
                       ) -> List[List[float]]:
        """Per-arc posterior probabilities via forward-backward
        (reference FwdBwd, src/Flf/FwdBwd.hh:33)."""
        fsa = self.automaton(am_scale, lm_scale, semiring=LOG)
        fwd = sssp(fsa)
        bwd = sssp(fsa, backward=True)
        total = bwd[fsa.initial]
        out: List[List[float]] = []
        for s in range(self.n_states):
            row = []
            for arc_l, arc_f in zip(self.arcs[s], fsa.arcs[s]):
                g = fwd[s] + arc_f.weight + bwd[arc_f.target]
                row.append(math.exp(-(g - total)) if g < INF else 0.0)
            out.append(row)
        return out

    def word_confidences(self, am_scale: float = 1.0, lm_scale: float = 1.0
                         ) -> Dict[Tuple[int, int, int], float]:
        """(word, start_state, end_state) -> posterior (simple confidence,
        reference Flf Confidence via posteriors)."""
        post = self.arc_posteriors(am_scale, lm_scale)
        out: Dict[Tuple[int, int, int], float] = {}
        for s in range(self.n_states):
            for arc, p in zip(self.arcs[s], post[s]):
                if arc.word != EPS:
                    key = (arc.word, s, arc.target)
                    out[key] = out.get(key, 0.0) + p
        return out

    def prune_posterior(self, threshold: float, am_scale: float = 1.0,
                        lm_scale: float = 1.0) -> "WordLattice":
        """Drop arcs with posterior < exp(-threshold)
        (reference prune-posterior node)."""
        post = self.arc_posteriors(am_scale, lm_scale)
        min_p = math.exp(-threshold)
        out = WordLattice(words=self.words)
        for s in range(self.n_states):
            out.add_state(self.boundaries[s])
        out.initial = self.initial
        for s in range(self.n_states):
            for arc, p in zip(self.arcs[s], post[s]):
                if p >= min_p:
                    out.add_arc(s, arc.target, arc.word, arc.am_score,
                                arc.lm_score)
        out.final = dict(self.final)
        return out

    # -- IO ---------------------------------------------------------------------

    def write_htk_slf(self, path: str, frame_shift: float = 0.01,
                      lm_scale: float = 1.0) -> None:
        """HTK Standard Lattice Format writer (reference HtkWriter.cc)."""
        words = self.words or {}
        arcs = [(s, a) for s in range(self.n_states) for a in self.arcs[s]]
        with open(path, "w", encoding="utf-8") as fh:
            fh.write("VERSION=1.0\n")
            fh.write(f"lmscale={lm_scale:.2f}\n")
            fh.write(f"N={self.n_states}\tL={len(arcs)}\n")
            for s in range(self.n_states):
                fh.write(f"I={s}\tt={self.boundaries[s] * frame_shift:.2f}\n")
            for j, (s, a) in enumerate(arcs):
                w = words.get(a.word, f"w{a.word}") if a.word != EPS else "!NULL"
                fh.write(f"J={j}\tS={s}\tE={a.target}\tW={w}\t"
                         f"a={-a.am_score:.4f}\tl={-a.lm_score:.4f}\n")

    @classmethod
    def read_htk_slf(cls, path: str, frame_shift: float = 0.01,
                     word_ids: Optional[Dict[str, int]] = None) -> "WordLattice":
        lat = cls(words={})
        next_id = [1]
        ids: Dict[str, int] = dict(word_ids or {})

        def wid(w: str) -> int:
            if w == "!NULL":
                return EPS
            if w not in ids:
                ids[w] = max(ids.values(), default=0) + 1
            return ids[w]

        states: Dict[int, int] = {}
        pending_arcs = []
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                fields = dict(f.split("=", 1) for f in line.split()
                              if "=" in f)
                if "I" in fields:
                    t = float(fields.get("t", 0.0))
                    states[int(fields["I"])] = lat.add_state(
                        int(round(t / frame_shift)))
                elif "J" in fields:
                    pending_arcs.append(fields)
        for f in pending_arcs:
            lat.add_arc(states[int(f["S"])], states[int(f["E"])],
                        wid(f.get("W", "!NULL")),
                        am_score=-float(f.get("a", 0.0)),
                        lm_score=-float(f.get("l", 0.0)))
        lat.words = {v: k for k, v in ids.items()}
        # final states: no outgoing arcs
        for s in range(lat.n_states):
            if not lat.arcs[s]:
                lat.set_final(s)
        return lat


def lattice_from_nbest(hypotheses: Sequence[Tuple[Sequence[int], float, float]],
                       boundaries: Optional[Sequence[Sequence[int]]] = None,
                       words: Optional[Dict[int, str]] = None) -> WordLattice:
    """Build a lattice from n-best (labels, am_score, lm_score) with prefix
    merging (the minimal lattice the beam searches can emit in round 1)."""
    lat = WordLattice(words=words)
    root = lat.add_state(0)
    lat.initial = root
    # trie over prefixes; cumulative arc score per node so the final weight
    # can absorb the residual (otherwise shorter/empty prefixes would
    # always dominate the best path)
    trie: Dict[Tuple[int, ...], int] = {(): root}
    cum: Dict[Tuple[int, ...], float] = {(): 0.0}
    for hi, (labels, am, lm) in enumerate(hypotheses):
        labels = tuple(labels)
        total = am + lm
        n = len(labels) or 1
        am_per, lm_per = am / n, lm / n
        prev = ()
        for i, lab in enumerate(labels):
            cur = labels[:i + 1]
            if cur not in trie:
                frame = (boundaries[hi][i] if boundaries else i)
                trie[cur] = lat.add_state(frame)
                lat.add_arc(trie[prev], trie[cur], lab, am_per, lm_per)
                cum[cur] = cum[prev] + am_per + lm_per
            prev = cur
        residual = total - cum[labels]
        state = trie[labels]
        if state not in lat.final or residual < lat.final[state]:
            lat.set_final(state, residual)
    return lat
