"""Lattice LM rescoring by exact composition.

The reference offers compose-with-lm and push-forward k-best rescoring
(src/Flf/Compose.cc, RescoreLm.cc, PushForwardRescoring.cc).  Here:

  * compose_with_lm — exact n-gram composition: lattice states expand by
    reachable LM histories, every arc gets its exact LM score (the result
    is the reference's compose-with-lm);
  * nbest_rescore — k-best extraction + full LM re-ranking (the cheap
    push-forward variant).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from ..fsa.automaton import EPS
from ..lm.arpa import LanguageModel
from .word_lattice import WordLattice


def compose_with_lm(lattice: WordLattice, lm: LanguageModel,
                    scale: float = 1.0,
                    add_sentence_end: bool = True) -> WordLattice:
    """Exact composition: output states are (lattice state, LM history)."""
    words = lattice.words or {}
    out = WordLattice(words=lattice.words)
    ids: Dict[Tuple[int, tuple], int] = {}
    stack: List[Tuple[int, tuple]] = []

    def state(s: int, h: tuple) -> int:
        key = (s, h)
        if key not in ids:
            ids[key] = out.add_state(lattice.boundaries[s])
            stack.append(key)
        return ids[key]

    out.initial = state(lattice.initial, lm.initial_history())
    seen = set()
    while stack:
        key = stack.pop()
        if key in seen:
            continue
        seen.add(key)
        s, h = key
        sid = ids[key]
        if s in lattice.final:
            w = lattice.final[s]
            if add_sentence_end:
                w = w + scale * lm.sentence_end_score(h)
            out.set_final(sid, w)
        for arc in lattice.arcs[s]:
            if arc.word != EPS and arc.word in words:
                tok = words[arc.word]
                lm_score = scale * lm.score(h, tok)
                nh = lm.extended_history(h, tok)
            else:
                lm_score = arc.lm_score
                nh = h
            out.add_arc(sid, state(arc.target, nh), arc.word,
                        arc.am_score, lm_score)
    return out


def nbest_rescore(lattice: WordLattice, lm: LanguageModel, n: int = 100,
                  scale: float = 1.0, am_scale: float = 1.0
                  ) -> List[Tuple[List[int], float]]:
    """k-best push-forward rescoring: extract n best paths by acoustic
    score, re-rank with exact LM sequence scores."""
    words = lattice.words or {}
    paths = lattice.n_best(n, am_scale=am_scale, lm_scale=0.0)
    rescored = []
    for labels, am in paths:
        tokens = [words.get(l, str(l)) for l in labels if l != EPS]
        lm_score = scale * lm.sequence_score(tokens)
        rescored.append((labels, am + lm_score))
    rescored.sort(key=lambda x: x[1])
    return rescored
