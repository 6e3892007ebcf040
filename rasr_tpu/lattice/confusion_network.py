"""Confusion networks and minimum-Bayes-risk decoding.

The reference builds CNs from lattices with several algorithms
(center-frame / state-cluster / arc-cluster,
src/Flf/CenterFrameConfusionNetworkBuilder.cc, ConfusionNetwork.cc) and
decodes minimum-fWER from them.  This implementation uses time-overlap
pivot clustering (the center-frame family): arcs group into slots by
posterior-weighted time overlap with a pivot (best-path) arc sequence;
each slot holds word posterior mass including an epsilon (skip) entry;
CN decoding picks each slot's argmax (MBR under the slot-wise WER
approximation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

from ..fsa.automaton import EPS
from .word_lattice import WordLattice


@dataclass
class Slot:
    """One confusion slot: word -> posterior (EPS = skip)."""
    start: float
    end: float
    posteriors: Dict[int, float] = field(default_factory=dict)

    def add(self, word: int, p: float) -> None:
        self.posteriors[word] = self.posteriors.get(word, 0.0) + p

    def best(self) -> Tuple[int, float]:
        return max(self.posteriors.items(), key=lambda kv: kv[1])

    def normalized(self) -> "Slot":
        total = sum(self.posteriors.values())
        eps_mass = max(1.0 - total, 0.0)
        out = Slot(self.start, self.end, dict(self.posteriors))
        out.add(EPS, eps_mass)
        return out


class ConfusionNetwork:
    def __init__(self, slots: List[Slot], words: Optional[Dict[int, str]] = None):
        self.slots = slots
        self.words = words or {}

    def decode(self) -> Tuple[List[int], List[float]]:
        """Slot-wise argmax (min expected WER); returns (words, confidences),
        epsilon slots skipped."""
        out, conf = [], []
        for slot in self.slots:
            w, p = slot.best()
            if w != EPS:
                out.append(w)
                conf.append(p)
        return out, conf

    def decode_orth(self) -> str:
        labels, _ = self.decode()
        return " ".join(self.words.get(l, str(l)) for l in labels)

    def __len__(self):
        return len(self.slots)


def build_confusion_network(lattice: WordLattice, am_scale: float = 1.0,
                            lm_scale: float = 1.0) -> ConfusionNetwork:
    """Pivot-based CN construction:

    1. arc posteriors by forward-backward,
    2. pivot = best path arcs define initial slots (by state time bounds),
    3. every other word arc joins the slot with maximal time overlap
       (creating a new slot when it overlaps none).
    """
    post = lattice.arc_posteriors(am_scale, lm_scale)
    best_labels, _ = lattice.best(am_scale, lm_scale)

    # pivot arcs along the best path
    from ..fsa.automaton import best_path as fsa_best
    fsa = lattice.automaton(am_scale, lm_scale)
    # reconstruct the best path with state sequence for time bounds
    import heapq
    n = fsa.n_states
    INF = float("inf")
    dist = [INF] * n
    back: List[Optional[Tuple[int, int]]] = [None] * n  # (prev, arc idx)
    dist[fsa.initial] = 0.0
    heap = [(0.0, fsa.initial)]
    while heap:
        d, s = heapq.heappop(heap)
        if d > dist[s]:
            continue
        for ai, arc in enumerate(fsa.arcs[s]):
            nd = d + arc.weight
            if nd < dist[arc.target]:
                dist[arc.target] = nd
                back[arc.target] = (s, ai)
                heapq.heappush(heap, (nd, arc.target))
    best_state, best_score = -1, INF
    for s, w in fsa.final.items():
        if dist[s] + w < best_score:
            best_state, best_score = s, dist[s] + w
    path_arcs: List[Tuple[int, int]] = []
    s = best_state
    while s >= 0 and back[s] is not None:
        p, ai = back[s]
        path_arcs.append((p, ai))
        s = p
    path_arcs.reverse()

    def times(src: int, tgt: int) -> Tuple[float, float]:
        return (float(lattice.boundaries[src]), float(lattice.boundaries[tgt]))

    slots: List[Slot] = []
    for (src, ai) in path_arcs:
        arc = lattice.arcs[src][ai]
        if arc.word == EPS:
            continue
        t0, t1 = times(src, arc.target)
        slot = Slot(t0, t1)
        slot.add(arc.word, post[src][ai])
        slots.append(slot)

    pivot_arcs = {(src, ai) for (src, ai) in path_arcs}

    def overlap(a0, a1, b0, b1) -> float:
        return max(0.0, min(a1, b1) - max(a0, b0))

    for s in range(lattice.n_states):
        for ai, arc in enumerate(lattice.arcs[s]):
            if (s, ai) in pivot_arcs or arc.word == EPS:
                continue
            p = post[s][ai]
            if p <= 1e-8:
                continue
            t0, t1 = times(s, arc.target)
            best_slot, best_ov = None, 0.0
            for slot in slots:
                ov = overlap(t0, t1, slot.start, slot.end)
                if ov > best_ov:
                    best_slot, best_ov = slot, ov
            if best_slot is None:
                new_slot = Slot(t0, t1)
                new_slot.add(arc.word, p)
                # keep slots time-ordered
                idx = next((i for i, sl in enumerate(slots)
                            if sl.start > t0), len(slots))
                slots.insert(idx, new_slot)
            else:
                best_slot.add(arc.word, p)

    return ConfusionNetwork([s.normalized() for s in slots],
                            words=lattice.words)


def mbr_decode(lattice: WordLattice, am_scale: float = 1.0,
               lm_scale: float = 1.0) -> Tuple[List[int], List[float]]:
    """Minimum-Bayes-risk (slot-wise) decode via the CN."""
    cn = build_confusion_network(lattice, am_scale, lm_scale)
    return cn.decode()


def build_confusion_network_arc_cluster(lattice: WordLattice,
                                        am_scale: float = 1.0,
                                        lm_scale: float = 1.0
                                        ) -> ConfusionNetwork:
    """Arc-cluster (consensus, Mangu-style) CN construction — the
    forward-backward clustering alternative to the pivot builder
    (reference StateClusterConfusionNetworkBuilder.cc /
    ConfusionNetwork.cc cluster algorithms):

    1. intra-word: agglomerate same-word arcs whose time spans overlap,
       posterior-weighted,
    2. inter-word: merge clusters of different words by maximal overlap
       until no two clusters overlap in time,
    3. order clusters by posterior-weighted mean time -> slots.

    Ordering constraints are enforced through time spans (word
    boundaries are reliable in lattices from time-synchronous search).
    """
    post = lattice.arc_posteriors(am_scale, lm_scale)

    # collect word arcs: [start, end, posterior, word]
    clusters: List[Dict] = []
    for s in range(lattice.n_states):
        for ai, arc in enumerate(lattice.arcs[s]):
            if arc.word == EPS or post[s][ai] <= 1e-8:
                continue
            clusters.append({
                "t0": float(lattice.boundaries[s]),
                "t1": float(lattice.boundaries[arc.target]),
                "mass": {arc.word: post[s][ai]},
                "p": post[s][ai],
            })

    def overlap(a, b) -> float:
        return max(0.0, min(a["t1"], b["t1"]) - max(a["t0"], b["t0"]))

    def merge(a, b) -> Dict:
        mass = dict(a["mass"])
        for w, p in b["mass"].items():
            mass[w] = mass.get(w, 0.0) + p
        return {"t0": min(a["t0"], b["t0"]), "t1": max(a["t1"], b["t1"]),
                "mass": mass, "p": a["p"] + b["p"]}

    def agglomerate(same_word: bool) -> None:
        while True:
            best, bi, bj = 0.0, -1, -1
            for i in range(len(clusters)):
                for j in range(i + 1, len(clusters)):
                    a, b = clusters[i], clusters[j]
                    if same_word and set(a["mass"]) != set(b["mass"]):
                        continue
                    ov = overlap(a, b)
                    if ov > best:
                        best, bi, bj = ov, i, j
            if bi < 0:
                return
            merged = merge(clusters[bi], clusters[bj])
            clusters[bj:bj + 1] = []
            clusters[bi] = merged

    agglomerate(same_word=True)
    agglomerate(same_word=False)
    clusters.sort(key=lambda c: (c["t0"] + c["t1"]) / 2.0)
    slots = []
    for c in clusters:
        slot = Slot(c["t0"], c["t1"])
        for w, p in c["mass"].items():
            slot.add(w, p)
        slots.append(slot)
    return ConfusionNetwork([s.normalized() for s in slots],
                            words=lattice.words)
