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


def push_forward_rescore(lattice: WordLattice, lm: LanguageModel,
                         scale: float = 1.0, k: int = 16,
                         am_scale: float = 1.0,
                         n_out: int = 1
                         ) -> List[Tuple[List[int], float]]:
    """Beamed push-forward rescoring (the reference algorithm,
    src/Flf/PushForwardRescoring.cc): per lattice state keep the best
    `k` LM histories; every arc extends them with its acoustic score
    plus the NEW LM's scaled score — the lattice's own LM dimension is
    replaced.  Works with unbounded-history LMs (recurrent) where exact
    composition would explode; `prefetch`-capable LMs (the neural LM)
    get their per-state history wave forwarded in one device batch.

    Returns up to n_out (word-id sequence, total score), best first."""
    words = lattice.words or {}
    n_states = lattice.n_states
    # restrict to the subgraph reachable from the initial state first:
    # in-degrees from unreachable states would otherwise never drain and
    # silently cut off their downstream suffix (finals included)
    reach = {lattice.initial}
    stack = [lattice.initial]
    while stack:
        s = stack.pop()
        for arc in lattice.arcs[s]:
            if arc.target not in reach:
                reach.add(arc.target)
                stack.append(arc.target)
    indeg = [0] * n_states
    for s in reach:
        for arc in lattice.arcs[s]:
            indeg[arc.target] += 1
    order: List[int] = [lattice.initial]
    seen_zero = {lattice.initial}
    head = 0
    while head < len(order):
        s = order[head]
        head += 1
        for arc in lattice.arcs[s]:
            indeg[arc.target] -= 1
            if indeg[arc.target] == 0 and arc.target not in seen_zero:
                seen_zero.add(arc.target)
                order.append(arc.target)
    # per-state hypothesis lists: (score, history, backpointer)
    hyps: List[List[Tuple[float, tuple, int]]] = [[] for _ in range(n_states)]
    hyps[lattice.initial] = [(0.0, lm.initial_history(), -1)]
    back_parent: List[int] = []
    back_word: List[int] = []
    prefetch = getattr(lm, "prefetch", None)
    finals: List[Tuple[float, tuple, int]] = []
    for s in order:
        cur = hyps[s]
        if not cur:
            continue
        # recombine on history, then beam to k
        best: Dict[tuple, Tuple[float, tuple, int]] = {}
        for h in cur:
            old = best.get(h[1])
            if old is None or h[0] < old[0]:
                best[h[1]] = h
        cur = sorted(best.values())[:k]
        hyps[s] = cur
        if prefetch is not None and any(
                arc.word != EPS and arc.word in words
                for arc in lattice.arcs[s]):
            prefetch([h for _sc, h, _bp in cur])
        if s in lattice.final:
            w = lattice.final[s]
            for sc, h, bp in cur:
                finals.append(
                    (sc + w + scale * lm.sentence_end_score(h), h, bp))
        for arc in lattice.arcs[s]:
            base = am_scale * arc.am_score
            for sc, h, bp in cur:
                if arc.word != EPS and arc.word in words:
                    tok = words[arc.word]
                    nsc = sc + base + scale * lm.score(h, tok)
                    nh = lm.extended_history(h, tok)
                    back_parent.append(bp)
                    back_word.append(arc.word)
                    nbp = len(back_parent) - 1
                else:
                    nsc = sc + base
                    nh, nbp = h, bp
                hyps[arc.target].append((nsc, nh, nbp))
    finals.sort(key=lambda x: x[0])
    out: List[Tuple[List[int], float]] = []
    for sc, _h, bp in finals[:n_out]:
        labels: List[int] = []
        while bp >= 0:
            labels.append(back_word[bp])
            bp = back_parent[bp]
        out.append((labels[::-1], sc))
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
