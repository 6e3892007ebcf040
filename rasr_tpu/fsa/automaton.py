"""Weighted finite-state acceptors/transducers (host).

A compact re-design of the reference Fsa layer (src/Fsa/tAutomaton.hh:27,
Static.hh, Semiring.hh): static automata with tropical / log semirings over
f32 scores, plus the algorithm set used by the rest of the framework
(compose, determinize, best path, SSSP, prune, connect, epsilon removal,
n-best).  The reference's lazy-evaluation templates are replaced by plain
eager builders — lattices here are small host objects; the heavy numerics
live on the TPU side.

Arc weights follow the framework Score convention: -log probabilities,
accumulated by + along paths; tropical collects min, log collects
-log-sum-exp.
"""

from __future__ import annotations

import heapq
import math
from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Set, Tuple

EPS = 0          # epsilon label id
INF = float("inf")


def logadd(a: float, b: float) -> float:
    """-log(exp(-a) + exp(-b)) (log semiring collect)."""
    if a == INF:
        return b
    if b == INF:
        return a
    m = min(a, b)
    return m - math.log1p(math.exp(-(abs(a - b))))


@dataclass
class Semiring:
    name: str

    def collect(self, a: float, b: float) -> float:
        raise NotImplementedError

    zero: float = INF
    one: float = 0.0


class TropicalSemiring(Semiring):
    def __init__(self):
        super().__init__("tropical")

    def collect(self, a, b):
        return min(a, b)


class LogSemiring(Semiring):
    def __init__(self):
        super().__init__("log")

    def collect(self, a, b):
        return logadd(a, b)


TROPICAL = TropicalSemiring()
LOG = LogSemiring()


@dataclass
class Arc:
    target: int
    ilabel: int
    olabel: int
    weight: float

    def __iter__(self):
        return iter((self.target, self.ilabel, self.olabel, self.weight))


@dataclass
class Automaton:
    """Static automaton; acceptor when olabel == ilabel everywhere."""
    semiring: Semiring = field(default_factory=lambda: TROPICAL)
    initial: int = 0
    arcs: List[List[Arc]] = field(default_factory=list)
    final: Dict[int, float] = field(default_factory=dict)
    input_alphabet: Optional[Dict[int, str]] = None
    output_alphabet: Optional[Dict[int, str]] = None

    # -- construction -----------------------------------------------------

    def add_state(self) -> int:
        self.arcs.append([])
        return len(self.arcs) - 1

    def add_arc(self, source: int, target: int, ilabel: int,
                olabel: Optional[int] = None, weight: float = 0.0) -> None:
        self.arcs[source].append(
            Arc(target, ilabel, ilabel if olabel is None else olabel, weight))

    def set_final(self, state: int, weight: float = 0.0) -> None:
        self.final[state] = weight

    @property
    def n_states(self) -> int:
        return len(self.arcs)

    @property
    def n_arcs(self) -> int:
        return sum(len(a) for a in self.arcs)

    def is_final(self, state: int) -> bool:
        return state in self.final

    # -- path utilities ------------------------------------------------------

    def _eps_closure(self, frontier: Dict[int, float]) -> Dict[int, float]:
        heap = [(w, s) for s, w in frontier.items()]
        heapq.heapify(heap)
        dist = dict(frontier)
        while heap:
            d, s = heapq.heappop(heap)
            if d > dist.get(s, INF):
                continue
            for arc in self.arcs[s]:
                if arc.ilabel == EPS:
                    nd = d + arc.weight
                    if nd < dist.get(arc.target, INF):
                        dist[arc.target] = nd
                        heapq.heappush(heap, (nd, arc.target))
        return dist

    def accepts(self, labels: Sequence[int]) -> float:
        """Score of the best accepting path for an input label sequence
        (tropical); follows input-epsilon arcs."""
        frontier = self._eps_closure({self.initial: 0.0})
        for lab in labels:
            new: Dict[int, float] = {}
            for s, w in frontier.items():
                for arc in self.arcs[s]:
                    if arc.ilabel == lab:
                        c = w + arc.weight
                        if c < new.get(arc.target, INF):
                            new[arc.target] = c
            if not new:
                return INF
            frontier = self._eps_closure(new)
        best = INF
        for s, w in frontier.items():
            if s in self.final:
                best = min(best, w + self.final[s])
        return best


def linear_automaton(labels: Sequence[int], weights: Optional[Sequence[float]]
                     = None, semiring: Semiring = TROPICAL) -> Automaton:
    fsa = Automaton(semiring=semiring)
    s = fsa.add_state()
    for i, lab in enumerate(labels):
        t = fsa.add_state()
        w = weights[i] if weights else 0.0
        fsa.add_arc(s, t, lab, weight=w)
        s = t
    fsa.set_final(s)
    return fsa


# ---------------------------------------------------------------------------
# algorithms
# ---------------------------------------------------------------------------


def sssp(fsa: Automaton, backward: bool = False) -> List[float]:
    """Single-source shortest distance per state (semiring-generic for
    acyclic; tropical-correct for cyclic via Dijkstra).
    backward=True: distance to final states (reference tSssp)."""
    n = fsa.n_states
    if backward:
        rev: List[List[Tuple[int, float]]] = [[] for _ in range(n)]
        for s in range(n):
            for arc in fsa.arcs[s]:
                rev[arc.target].append((s, arc.weight))
        dist = [INF] * n
        if isinstance(fsa.semiring, TropicalSemiring):
            heap = [(w, s) for s, w in fsa.final.items()]
            for w, s in heap:
                dist[s] = min(dist[s], w)
            heapq.heapify(heap)
            while heap:
                d, s = heapq.heappop(heap)
                if d > dist[s]:
                    continue
                for (p, w) in rev[s]:
                    nd = d + w
                    if nd < dist[p]:
                        dist[p] = nd
                        heapq.heappush(heap, (nd, p))
            return dist
        # log semiring: require acyclic; relax in reverse topological order
        order = _topological_order(fsa)
        for s, w in fsa.final.items():
            dist[s] = fsa.semiring.collect(dist[s], w)
        for s in reversed(order):
            for arc in fsa.arcs[s]:
                if dist[arc.target] < INF:
                    dist[s] = fsa.semiring.collect(
                        dist[s], arc.weight + dist[arc.target])
        return dist

    dist = [INF] * n
    dist[fsa.initial] = 0.0
    if isinstance(fsa.semiring, TropicalSemiring):
        heap = [(0.0, fsa.initial)]
        while heap:
            d, s = heapq.heappop(heap)
            if d > dist[s]:
                continue
            for arc in fsa.arcs[s]:
                nd = d + arc.weight
                if nd < dist[arc.target]:
                    dist[arc.target] = nd
                    heapq.heappush(heap, (nd, arc.target))
        return dist
    order = _topological_order(fsa)
    for s in order:
        if dist[s] == INF:
            continue
        for arc in fsa.arcs[s]:
            dist[arc.target] = fsa.semiring.collect(
                dist[arc.target], dist[s] + arc.weight)
    return dist


def _topological_order(fsa: Automaton) -> List[int]:
    n = fsa.n_states
    indeg = [0] * n
    for s in range(n):
        for arc in fsa.arcs[s]:
            indeg[arc.target] += 1
    stack = [s for s in range(n) if indeg[s] == 0]
    order = []
    while stack:
        s = stack.pop()
        order.append(s)
        for arc in fsa.arcs[s]:
            indeg[arc.target] -= 1
            if indeg[arc.target] == 0:
                stack.append(arc.target)
    if len(order) != n:
        raise ValueError("automaton is cyclic; log-semiring sssp needs acyclic")
    return order


def best_path(fsa: Automaton) -> Tuple[List[int], List[int], float]:
    """(input labels, output labels, score) of the best path (tropical)."""
    n = fsa.n_states
    dist = [INF] * n
    back: List[Optional[Tuple[int, Arc]]] = [None] * n
    dist[fsa.initial] = 0.0
    heap = [(0.0, fsa.initial)]
    while heap:
        d, s = heapq.heappop(heap)
        if d > dist[s]:
            continue
        for arc in fsa.arcs[s]:
            nd = d + arc.weight
            if nd < dist[arc.target]:
                dist[arc.target] = nd
                back[arc.target] = (s, arc)
                heapq.heappush(heap, (nd, arc.target))
    best_state, best_score = -1, INF
    for s, w in fsa.final.items():
        if dist[s] + w < best_score:
            best_state, best_score = s, dist[s] + w
    if best_state < 0:
        return [], [], INF
    ilabels: List[int] = []
    olabels: List[int] = []
    s = best_state
    while back[s] is not None:
        p, arc = back[s]
        if arc.ilabel != EPS:
            ilabels.append(arc.ilabel)
        if arc.olabel != EPS:
            olabels.append(arc.olabel)
        s = p
    return ilabels[::-1], olabels[::-1], best_score


def n_best(fsa: Automaton, n: int) -> List[Tuple[List[int], float]]:
    """n best distinct-path (input labels, score) via A* with the backward
    tropical distance as exact heuristic (reference tBest)."""
    h = sssp(fsa, backward=True)
    results: List[Tuple[List[int], float]] = []
    # heap entries: (f = g + h, counter, state, g, labels)
    counter = 0
    heap = [(h[fsa.initial], counter, fsa.initial, 0.0, [])]
    expansions = 0
    limit = 10000 * max(n, 1)
    while heap and len(results) < n and expansions < limit:
        f, _, s, g, labels = heapq.heappop(heap)
        expansions += 1
        if s in fsa.final:
            results.append((labels, g + fsa.final[s]))
            # continue: a final state may also extend
        for arc in fsa.arcs[s]:
            ng = g + arc.weight
            if h[arc.target] == INF:
                continue
            counter += 1
            nl = labels + ([arc.ilabel] if arc.ilabel != EPS else [])
            heapq.heappush(heap, (ng + h[arc.target], counter, arc.target,
                                  ng, nl))
    return results


def connect(fsa: Automaton) -> Automaton:
    """Remove states not on a successful path (reference trim/connect)."""
    fwd = sssp(fsa)
    bwd = sssp(fsa, backward=True)
    keep = [s for s in range(fsa.n_states)
            if fwd[s] < INF and bwd[s] < INF]
    remap = {s: i for i, s in enumerate(keep)}
    out = Automaton(semiring=fsa.semiring,
                    input_alphabet=fsa.input_alphabet,
                    output_alphabet=fsa.output_alphabet)
    for _ in keep:
        out.add_state()
    if fsa.initial in remap:
        out.initial = remap[fsa.initial]
    for s in keep:
        for arc in fsa.arcs[s]:
            if arc.target in remap:
                out.add_arc(remap[s], remap[arc.target], arc.ilabel,
                            arc.olabel, arc.weight)
    for s, w in fsa.final.items():
        if s in remap:
            out.set_final(remap[s], w)
    return out


def prune(fsa: Automaton, threshold: float) -> Automaton:
    """Keep states on paths within `threshold` of the best (reference
    tPrune posterior pruning in the tropical view)."""
    fwd = sssp(fsa)
    bwd = sssp(fsa, backward=True)
    best = min((fwd[s] + w for s, w in fsa.final.items()), default=INF)
    keep = [s for s in range(fsa.n_states)
            if fwd[s] + bwd[s] <= best + threshold]
    keep_set = set(keep)
    remap = {s: i for i, s in enumerate(keep)}
    out = Automaton(semiring=fsa.semiring,
                    input_alphabet=fsa.input_alphabet,
                    output_alphabet=fsa.output_alphabet)
    for _ in keep:
        out.add_state()
    if fsa.initial in remap:
        out.initial = remap[fsa.initial]
    for s in keep:
        for arc in fsa.arcs[s]:
            if (arc.target in keep_set
                    and fwd[s] + arc.weight + bwd[arc.target] <= best + threshold):
                out.add_arc(remap[s], remap[arc.target], arc.ilabel,
                            arc.olabel, arc.weight)
    for s, w in fsa.final.items():
        if s in remap:
            out.set_final(remap[s], w)
    return out


def remove_epsilons(fsa: Automaton) -> Automaton:
    """Epsilon removal via epsilon-closure (tropical)."""
    n = fsa.n_states
    out = Automaton(semiring=fsa.semiring, initial=fsa.initial,
                    input_alphabet=fsa.input_alphabet,
                    output_alphabet=fsa.output_alphabet)
    for _ in range(n):
        out.add_state()

    def closure(s: int) -> Dict[int, float]:
        dist = {s: 0.0}
        heap = [(0.0, s)]
        while heap:
            d, u = heapq.heappop(heap)
            if d > dist.get(u, INF):
                continue
            for arc in fsa.arcs[u]:
                if arc.ilabel == EPS and arc.olabel == EPS:
                    nd = d + arc.weight
                    if nd < dist.get(arc.target, INF):
                        dist[arc.target] = nd
                        heapq.heappush(heap, (nd, arc.target))
        return dist

    for s in range(n):
        for u, d in closure(s).items():
            if u in fsa.final:
                w = d + fsa.final[u]
                if s not in out.final or w < out.final[s]:
                    out.set_final(s, w)
            for arc in fsa.arcs[u]:
                if arc.ilabel != EPS or arc.olabel != EPS:
                    out.add_arc(s, arc.target, arc.ilabel, arc.olabel,
                                d + arc.weight)
    return connect(out)


def determinize(fsa: Automaton) -> Automaton:
    """Weighted subset determinization over the tropical semiring
    (acceptor view on input labels; reference tDeterminize)."""
    out = Automaton(semiring=fsa.semiring,
                    input_alphabet=fsa.input_alphabet,
                    output_alphabet=fsa.output_alphabet)
    start: Tuple[Tuple[int, float], ...] = ((fsa.initial, 0.0),)
    ids: Dict[Tuple, int] = {start: out.add_state()}
    out.initial = ids[start]
    stack = [start]
    while stack:
        subset = stack.pop()
        sid = ids[subset]
        # final weight
        fw = INF
        for (s, r) in subset:
            if s in fsa.final:
                fw = min(fw, r + fsa.final[s])
        if fw < INF:
            out.set_final(sid, fw)
        # group arcs by label
        by_label: Dict[int, Dict[int, float]] = {}
        for (s, r) in subset:
            for arc in fsa.arcs[s]:
                d = by_label.setdefault(arc.ilabel, {})
                w = r + arc.weight
                if w < d.get(arc.target, INF):
                    d[arc.target] = w
        for label, targets in sorted(by_label.items()):
            w_min = min(targets.values())
            new_subset = tuple(sorted((t, w - w_min)
                                      for t, w in targets.items()))
            if new_subset not in ids:
                ids[new_subset] = out.add_state()
                stack.append(new_subset)
            out.add_arc(sid, ids[new_subset], label, label, w_min)
    return out


def reverse(fsa: Automaton) -> Automaton:
    """Reversed automaton: arcs flipped, finals become initial (via a super
    initial state with epsilon arcs), initial becomes final."""
    out = Automaton(semiring=fsa.semiring,
                    input_alphabet=fsa.input_alphabet,
                    output_alphabet=fsa.output_alphabet)
    for _ in range(fsa.n_states + 1):
        out.add_state()
    super_init = fsa.n_states
    out.initial = super_init
    for s in range(fsa.n_states):
        for arc in fsa.arcs[s]:
            out.add_arc(arc.target, s, arc.ilabel, arc.olabel, arc.weight)
    for s, w in fsa.final.items():
        out.add_arc(super_init, s, EPS, EPS, w)
    out.set_final(fsa.initial, 0.0)
    return out


def minimize(fsa: Automaton) -> Automaton:
    """Brzozowski minimization for (weighted) acceptors:
    determinize(reverse(determinize(reverse(A)))) — yields the minimal
    deterministic acceptor; weights stay path-equivalent under the
    tropical pushing done by determinization (reference tMinimize)."""
    step1 = determinize(remove_epsilons(reverse(fsa)))
    step2 = determinize(remove_epsilons(reverse(step1)))
    return connect(step2)


def compose(a: Automaton, b: Automaton) -> Automaton:
    """Transducer composition a∘b (match a's output to b's input) with
    naive epsilon handling (suitable for the lattice/grammar use cases;
    reference tCompose)."""
    out = Automaton(semiring=a.semiring,
                    input_alphabet=a.input_alphabet,
                    output_alphabet=b.output_alphabet)
    ids: Dict[Tuple[int, int], int] = {}

    def state(pa: int, pb: int) -> int:
        key = (pa, pb)
        if key not in ids:
            ids[key] = out.add_state()
            stack.append(key)
        return ids[key]

    stack: List[Tuple[int, int]] = []
    out.initial = state(a.initial, b.initial)
    seen: Set[Tuple[int, int]] = set()
    while stack:
        key = stack.pop()
        if key in seen:
            continue
        seen.add(key)
        pa, pb = key
        sid = ids[key]
        if pa in a.final and pb in b.final:
            out.set_final(sid, a.final[pa] + b.final[pb])
        for arc_a in a.arcs[pa]:
            if arc_a.olabel == EPS:
                out.add_arc(sid, state(arc_a.target, pb), arc_a.ilabel, EPS,
                            arc_a.weight)
                continue
            for arc_b in b.arcs[pb]:
                if arc_b.ilabel == arc_a.olabel:
                    out.add_arc(sid, state(arc_a.target, arc_b.target),
                                arc_a.ilabel, arc_b.olabel,
                                arc_a.weight + arc_b.weight)
        for arc_b in b.arcs[pb]:
            if arc_b.ilabel == EPS:
                out.add_arc(sid, state(pa, arc_b.target), EPS, arc_b.olabel,
                            arc_b.weight)
    return connect(out)
