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
        # log semiring: reverse topological relaxation when acyclic;
        # queue-based convergent relaxation (Mohri's generic SSSP) otherwise
        try:
            order = _topological_order(fsa)
        except ValueError:
            edges = [[(arc.target, arc.weight) for arc in fsa.arcs[s]]
                     for s in range(n)]
            return _sssp_log_cyclic(edges, dict(fsa.final), n)
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
    try:
        order = _topological_order(fsa)
    except ValueError:
        rev_edges: List[List[Tuple[int, float]]] = [[] for _ in range(n)]
        for s in range(n):
            for arc in fsa.arcs[s]:
                rev_edges[arc.target].append((s, arc.weight))
        return _sssp_log_cyclic(rev_edges, {fsa.initial: 0.0}, n)
    for s in order:
        if dist[s] == INF:
            continue
        for arc in fsa.arcs[s]:
            dist[arc.target] = fsa.semiring.collect(
                dist[arc.target], dist[s] + arc.weight)
    return dist


def _sssp_log_cyclic(edges: List[List[Tuple[int, float]]],
                     init: Dict[int, float], n: int,
                     tol: float = 1e-10, max_sweeps: int = 10_000
                     ) -> List[float]:
    """Convergent log-semiring shortest distance on cyclic graphs (Mohri's
    generic SSSP with a work queue): dist[s] accumulates
    logadd(init[s], min-plus-free sum over edges (u, w): dist[u] + w).
    Converges when all cycle weights are positive (probability < 1), the
    case for normalized lattices; bounded by `max_sweeps` otherwise."""
    dist = [INF] * n
    # accumulate by repeated sweeps: F(d)[s] = logadd(init[s],
    # logadd_u d[u] + w(u, s)) is a monotone contraction on [-inf, d0]
    for s, w in init.items():
        dist[s] = w
    for _ in range(max_sweeps):
        delta = 0.0
        for s in range(n):
            acc = init.get(s, INF)
            for (u, w) in edges[s]:
                if dist[u] < INF:
                    acc = logadd(acc, dist[u] + w)
            if acc < INF:
                d = abs(acc - dist[s]) if dist[s] < INF else INF
                if d > delta:
                    delta = d
                dist[s] = acc
        if delta <= tol:
            break
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


def is_acceptor(fsa: Automaton) -> bool:
    return all(arc.olabel == arc.ilabel
               for s in range(fsa.n_states) for arc in fsa.arcs[s])


def determinize(fsa: Automaton) -> Automaton:
    """Weighted subset determinization over the tropical semiring
    (reference tDeterminize).

    Acceptors use plain weighted subsets; transducers use p-subsets of
    (state, residual weight, residual output string) — arcs emit the
    longest common prefix one symbol at a time, and any output residual
    remaining at a final subset is flushed through a chain of
    (eps-input : symbol) arcs to a fresh final state (the factored form of
    gallic-weight determinization).  Terminates for determinizable inputs
    (always for the acyclic lattices/grammars used by Flf/search)."""
    if is_acceptor(fsa):
        return _determinize_acceptor(fsa)
    return _determinize_transducer(fsa)


def _determinize_acceptor(fsa: Automaton) -> Automaton:
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


def _lcp(strings: List[Tuple[int, ...]]) -> Tuple[int, ...]:
    if not strings:
        return ()
    first = min(strings, key=len)
    k = 0
    while k < len(first) and all(s[k] == first[k] for s in strings):
        k += 1
    return first[:k]


def _determinize_transducer(fsa: Automaton) -> Automaton:
    out = Automaton(semiring=fsa.semiring,
                    input_alphabet=fsa.input_alphabet,
                    output_alphabet=fsa.output_alphabet)
    # p-subset entry: (state, residual weight, residual output string)
    start = ((fsa.initial, 0.0, ()),)
    ids: Dict[Tuple, int] = {start: out.add_state()}
    out.initial = ids[start]
    stack = [start]
    while stack:
        subset = stack.pop()
        sid = ids[subset]
        # finality: flush each final entry's output residual via an
        # eps-input chain (factored gallic residual)
        for (s, r, z) in subset:
            if s in fsa.final:
                w = r + fsa.final[s]
                if not z:
                    if sid not in out.final or w < out.final[sid]:
                        out.set_final(sid, w)
                else:
                    cur = sid
                    for i, sym in enumerate(z):
                        nxt = out.add_state()
                        out.add_arc(cur, nxt, EPS, sym, w if i == 0 else 0.0)
                        cur = nxt
                    out.set_final(cur, 0.0)
        # group by input label: target -> best (weight, out-string)
        by_label: Dict[int, Dict[Tuple[int, Tuple[int, ...]], float]] = {}
        for (s, r, z) in subset:
            for arc in fsa.arcs[s]:
                zo = z + ((arc.olabel,) if arc.olabel != EPS else ())
                d = by_label.setdefault(arc.ilabel, {})
                key = (arc.target, zo)
                w = r + arc.weight
                if w < d.get(key, INF):
                    d[key] = w
        for label, targets in sorted(by_label.items()):
            w_min = min(targets.values())
            common = _lcp([zo for (_t, zo) in targets])
            emit = common[0] if common else EPS
            strip = 1 if common else 0
            new_subset = tuple(sorted(
                (t, w - w_min, zo[strip:])
                for (t, zo), w in targets.items()))
            if new_subset not in ids:
                ids[new_subset] = out.add_state()
                stack.append(new_subset)
            out.add_arc(sid, ids[new_subset], label, emit, w_min)
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
    """Brzozowski minimization: determinize(reverse(determinize(reverse(A))))
    — yields the minimal deterministic acceptor; weights stay
    path-equivalent under the tropical pushing done by determinization
    (reference tMinimize).  Transducers are minimized in the pair-label
    encoding (each (i, o) pair treated as one acceptor symbol), which
    preserves the input-output relation exactly."""
    if is_acceptor(fsa):
        step1 = determinize(remove_epsilons(reverse(fsa)))
        step2 = determinize(remove_epsilons(reverse(step1)))
        return connect(step2)
    enc, decode = _encode_pairs(fsa)
    step1 = determinize(remove_epsilons(reverse(enc)))
    step2 = determinize(remove_epsilons(reverse(step1)))
    return connect(_decode_pairs(step2, decode,
                                 fsa.input_alphabet, fsa.output_alphabet))


def _encode_pairs(fsa: Automaton) -> Tuple[Automaton, List[Tuple[int, int]]]:
    """Encode (ilabel, olabel) arc pairs as fresh acceptor symbols
    (pair ids start at 1; 0 stays the (EPS, EPS) pair)."""
    pair_ids: Dict[Tuple[int, int], int] = {(EPS, EPS): EPS}
    decode: List[Tuple[int, int]] = [(EPS, EPS)]
    out = Automaton(semiring=fsa.semiring)
    for _ in range(fsa.n_states):
        out.add_state()
    out.initial = fsa.initial
    out.final = dict(fsa.final)
    for s in range(fsa.n_states):
        for arc in fsa.arcs[s]:
            key = (arc.ilabel, arc.olabel)
            if key not in pair_ids:
                pair_ids[key] = len(decode)
                decode.append(key)
            out.add_arc(s, arc.target, pair_ids[key], pair_ids[key],
                        arc.weight)
    return out, decode


def _decode_pairs(fsa: Automaton, decode: List[Tuple[int, int]],
                  input_alphabet, output_alphabet) -> Automaton:
    out = Automaton(semiring=fsa.semiring, input_alphabet=input_alphabet,
                    output_alphabet=output_alphabet)
    for _ in range(fsa.n_states):
        out.add_state()
    out.initial = fsa.initial
    out.final = dict(fsa.final)
    for s in range(fsa.n_states):
        for arc in fsa.arcs[s]:
            i, o = decode[arc.ilabel]
            out.add_arc(s, arc.target, i, o, arc.weight)
    return out


def compose(a: Automaton, b: Automaton) -> Automaton:
    """Transducer composition a∘b (match a's output to b's input) with the
    three-state epsilon-sequencing filter (Mohri/Pereira/Riley; reference
    tCompose), so every epsilon interleaving is matched exactly once and
    weights are correct under the log semiring as well as the tropical.

    Filter states: 0 = free; 1 = inside an a-side epsilon run; 2 = inside a
    b-side epsilon run.  Joint eps:eps moves only from 0; a-only from
    {0, 1}; b-only from {0, 2}; any real match resets to 0."""
    out = Automaton(semiring=a.semiring,
                    input_alphabet=a.input_alphabet,
                    output_alphabet=b.output_alphabet)
    ids: Dict[Tuple[int, int, int], int] = {}

    def state(pa: int, pb: int, f: int) -> int:
        key = (pa, pb, f)
        if key not in ids:
            ids[key] = out.add_state()
            stack.append(key)
        return ids[key]

    stack: List[Tuple[int, int, int]] = []
    out.initial = state(a.initial, b.initial, 0)
    seen: Set[Tuple[int, int, int]] = set()
    while stack:
        key = stack.pop()
        if key in seen:
            continue
        seen.add(key)
        pa, pb, f = key
        sid = ids[key]
        if pa in a.final and pb in b.final:
            out.set_final(sid, a.final[pa] + b.final[pb])
        a_eps = [arc for arc in a.arcs[pa] if arc.olabel == EPS]
        b_eps = [arc for arc in b.arcs[pb] if arc.ilabel == EPS]
        # real matches (reset filter)
        for arc_a in a.arcs[pa]:
            if arc_a.olabel == EPS:
                continue
            for arc_b in b.arcs[pb]:
                if arc_b.ilabel == arc_a.olabel:
                    out.add_arc(sid, state(arc_a.target, arc_b.target, 0),
                                arc_a.ilabel, arc_b.olabel,
                                arc_a.weight + arc_b.weight)
        # joint eps:eps move (both sides advance) — only from the free state
        if f == 0:
            for arc_a in a_eps:
                for arc_b in b_eps:
                    out.add_arc(sid,
                                state(arc_a.target, arc_b.target, 0),
                                arc_a.ilabel, arc_b.olabel,
                                arc_a.weight + arc_b.weight)
        # a-side epsilon run
        if f != 2:
            for arc_a in a_eps:
                out.add_arc(sid, state(arc_a.target, pb, 1),
                            arc_a.ilabel, EPS, arc_a.weight)
        # b-side epsilon run
        if f != 1:
            for arc_b in b_eps:
                out.add_arc(sid, state(pa, arc_b.target, 2),
                            EPS, arc_b.olabel, arc_b.weight)
    return connect(out)
