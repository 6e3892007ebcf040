"""Flf lattices: structure-of-arrays word lattices with n-dimensional scores.

The reference Flf::Lattice is an Ftl automaton whose weights are
refcounted n-dim score vectors with per-state word boundaries
(src/Flf/FlfCore/Lattice.hh:35,127).  Here the whole lattice is a handful
of numpy arrays — arc sources/targets/labels plus one (n_arcs, n_dims)
score block — so posterior computation, pruning, rescaling and projection
are vectorized array programs rather than per-arc pointer walks.  This is
the same SoA shape the TPU-side batched rescoring consumes.

All algorithms assume acyclic lattices (word lattices are DAGs by
construction; a cycle raises in topological()).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..fsa.automaton import EPS
from .semiring import LOG, TROPICAL, FlfSemiring


@dataclass
class FlfLattice:
    semiring: FlfSemiring = field(default_factory=FlfSemiring)
    n_states: int = 0
    sources: np.ndarray = None          # (A,) int32
    targets: np.ndarray = None          # (A,) int32
    labels: np.ndarray = None           # (A,) int32 word/lemma ids, EPS=0
    scores: np.ndarray = None           # (A, D) float64
    boundaries: np.ndarray = None       # (S,) int32 time frame per state
    initial: int = 0
    final_states: np.ndarray = None     # (F,) int32
    final_scores: np.ndarray = None     # (F, D) float64
    words: Optional[Dict[int, str]] = None

    def __post_init__(self):
        D = self.semiring.n
        if self.sources is None:
            self.sources = np.zeros(0, np.int32)
            self.targets = np.zeros(0, np.int32)
            self.labels = np.zeros(0, np.int32)
            self.scores = np.zeros((0, D), np.float64)
        if self.boundaries is None:
            self.boundaries = np.zeros(self.n_states, np.int32)
        if self.final_states is None:
            self.final_states = np.zeros(0, np.int32)
            self.final_scores = np.zeros((0, D), np.float64)

    # -- basic facts -----------------------------------------------------------

    @property
    def n_arcs(self) -> int:
        return len(self.sources)

    def word_of(self, label: int) -> str:
        if self.words and label in self.words:
            return self.words[label]
        return f"w{label}"

    # -- construction ------------------------------------------------------------

    @classmethod
    def build(cls, semiring: FlfSemiring, n_states: int,
              arcs: Sequence[Tuple[int, int, int, Sequence[float]]],
              boundaries: Optional[Sequence[int]] = None, initial: int = 0,
              finals: Optional[Dict[int, Sequence[float]]] = None,
              words: Optional[Dict[int, str]] = None) -> "FlfLattice":
        """arcs = [(source, target, label, score-vector)]."""
        D = semiring.n
        A = len(arcs)
        lat = cls(semiring=semiring, n_states=n_states,
                  sources=np.fromiter((a[0] for a in arcs), np.int32, A),
                  targets=np.fromiter((a[1] for a in arcs), np.int32, A),
                  labels=np.fromiter((a[2] for a in arcs), np.int32, A),
                  scores=np.asarray([a[3] for a in arcs],
                                    np.float64).reshape(A, D),
                  boundaries=(np.asarray(boundaries, np.int32)
                              if boundaries is not None else None),
                  initial=initial, words=words)
        if finals:
            lat.final_states = np.asarray(sorted(finals), np.int32)
            lat.final_scores = np.asarray(
                [finals[int(s)] for s in lat.final_states],
                np.float64).reshape(len(finals), D)
        return lat

    @classmethod
    def from_word_lattice(cls, wl, semiring: Optional[FlfSemiring] = None
                          ) -> "FlfLattice":
        """Lift a 2-score WordLattice into dims (am, lm)."""
        semiring = semiring or FlfSemiring(("am", "lm"))
        arcs = []
        for s in range(wl.n_states):
            for a in wl.arcs[s]:
                arcs.append((s, a.target, a.word, (a.am_score, a.lm_score)))
        finals = {s: (w, 0.0) for s, w in wl.final.items()}
        return cls.build(semiring, wl.n_states, arcs,
                         boundaries=wl.boundaries, initial=wl.initial,
                         finals=finals, words=wl.words)

    def to_word_lattice(self):
        """Project back onto the legacy (am, lm) pair: existing am/lm dims
        pass through scaled; other dims fold (scaled) into am."""
        from ..lattice.word_lattice import WordLattice
        sr = self.semiring
        scales = np.asarray(sr.scales)
        am_col = sr.keys.index("am") if "am" in sr.keys else -1
        lm_col = sr.keys.index("lm") if "lm" in sr.keys else -1
        am = np.zeros(self.n_arcs)
        lm = np.zeros(self.n_arcs)
        fam = np.zeros(len(self.final_states))
        for i in range(sr.n):
            col = self.scores[:, i] * scales[i]
            fcol = self.final_scores[:, i] * scales[i]
            if i == lm_col:
                lm += col
            else:
                am += col
                fam += fcol
        if lm_col >= 0:
            fam += self.final_scores[:, lm_col] * scales[lm_col]
        wl = WordLattice(words=self.words)
        for s in range(self.n_states):
            wl.add_state(int(self.boundaries[s]))
        wl.initial = int(self.initial)
        for k in range(self.n_arcs):
            wl.add_arc(int(self.sources[k]), int(self.targets[k]),
                       int(self.labels[k]), float(am[k]), float(lm[k]))
        for s, w in zip(self.final_states, fam):
            wl.set_final(int(s), float(w))
        return wl

    def to_automaton(self):
        """Combined-weight acceptor view (projected scores)."""
        from ..fsa.automaton import Automaton
        fsa = Automaton()
        for _ in range(self.n_states):
            fsa.add_state()
        fsa.initial = int(self.initial)
        w = self.semiring.project(self.scores)
        for k in range(self.n_arcs):
            fsa.add_arc(int(self.sources[k]), int(self.targets[k]),
                        int(self.labels[k]), int(self.labels[k]), float(w[k]))
        fw = self.semiring.project(self.final_scores)
        for s, fwt in zip(self.final_states, np.atleast_1d(fw)):
            fsa.set_final(int(s), float(fwt))
        return fsa

    def copy(self) -> "FlfLattice":
        return FlfLattice(
            semiring=self.semiring, n_states=self.n_states,
            sources=self.sources.copy(), targets=self.targets.copy(),
            labels=self.labels.copy(), scores=self.scores.copy(),
            boundaries=self.boundaries.copy(), initial=self.initial,
            final_states=self.final_states.copy(),
            final_scores=self.final_scores.copy(),
            words=dict(self.words) if self.words else None)

    # -- structure ---------------------------------------------------------------

    def topological(self) -> np.ndarray:
        """Kahn topological order over states; raises on cycles."""
        indeg = np.bincount(self.targets, minlength=self.n_states)
        order = np.empty(self.n_states, np.int32)
        head = 0
        stack = list(np.flatnonzero(indeg == 0))
        # CSR by source for successor lookups
        out_order = np.argsort(self.sources, kind="stable")
        out_ptr = np.searchsorted(self.sources[out_order],
                                  np.arange(self.n_states + 1))
        indeg = indeg.copy()
        while stack:
            s = int(stack.pop())
            order[head] = s
            head += 1
            for k in out_order[out_ptr[s]:out_ptr[s + 1]]:
                t = int(self.targets[k])
                indeg[t] -= 1
                if indeg[t] == 0:
                    stack.append(t)
        if head != self.n_states:
            raise ValueError("lattice has a cycle")
        return order

    def _csr_by(self, index: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        order = np.argsort(index, kind="stable")
        ptr = np.searchsorted(index[order], np.arange(self.n_states + 1))
        return order, ptr

    def connect(self) -> "FlfLattice":
        """Trim states not on an initial->final path (reference
        Fsa::trim / Flf clean-up)."""
        order = self.topological()
        out_order, out_ptr = self._csr_by(self.sources)
        fwd = np.zeros(self.n_states, bool)
        fwd[self.initial] = True
        for s in order:
            if fwd[s]:
                ks = out_order[out_ptr[s]:out_ptr[s + 1]]
                fwd[self.targets[ks]] = True
        bwd = np.zeros(self.n_states, bool)
        bwd[self.final_states] = True
        for s in order[::-1]:
            if not bwd[s]:
                ks = out_order[out_ptr[s]:out_ptr[s + 1]]
                if len(ks) and np.any(bwd[self.targets[ks]]):
                    bwd[s] = True
        keep_state = fwd & bwd
        remap = np.cumsum(keep_state) - 1
        keep_arc = keep_state[self.sources] & keep_state[self.targets]
        kf = keep_state[self.final_states]
        return FlfLattice(
            semiring=self.semiring, n_states=int(keep_state.sum()),
            sources=remap[self.sources[keep_arc]].astype(np.int32),
            targets=remap[self.targets[keep_arc]].astype(np.int32),
            labels=self.labels[keep_arc].copy(),
            scores=self.scores[keep_arc].copy(),
            boundaries=self.boundaries[keep_state].copy(),
            initial=int(remap[self.initial]),
            final_states=remap[self.final_states[kf]].astype(np.int32),
            final_scores=self.final_scores[kf].copy(), words=self.words)

    # -- potentials / posteriors ---------------------------------------------------

    def _collect_into(self, acc: np.ndarray, idx: np.ndarray,
                      vals: np.ndarray, log_mode: bool) -> None:
        if not log_mode:
            np.minimum.at(acc, idx, vals)
        else:
            # -logsumexp scatter: group by idx, stable two-pass
            m = np.full(acc.shape, np.inf)
            np.minimum.at(m, idx, vals)
            m2 = np.minimum(m, acc)
            with np.errstate(over="ignore", invalid="ignore"):
                p = np.zeros(acc.shape)
                np.add.at(p, idx, np.exp(-(vals - m2[idx])))
                p += np.where(np.isfinite(acc), np.exp(-(acc - m2)), 0.0)
                out = m2 - np.log(p, where=p > 0,
                                  out=np.full(acc.shape, np.inf))
            acc[:] = np.where(p > 0, out, np.inf)

    def forward(self, log_mode: Optional[bool] = None) -> np.ndarray:
        """Per-state forward potential of projected weights (inf =
        unreachable)."""
        log_mode = (self.semiring.stype == LOG) if log_mode is None \
            else log_mode
        w = self.semiring.project(self.scores)
        pot = np.full(self.n_states, np.inf)
        pot[self.initial] = 0.0
        out_order, out_ptr = self._csr_by(self.sources)
        for s in self.topological():
            if not np.isfinite(pot[s]):
                continue
            ks = out_order[out_ptr[s]:out_ptr[s + 1]]
            if len(ks) == 0:
                continue
            self._collect_into(pot, self.targets[ks], pot[s] + w[ks],
                               log_mode)
        return pot

    def backward(self, log_mode: Optional[bool] = None) -> np.ndarray:
        log_mode = (self.semiring.stype == LOG) if log_mode is None \
            else log_mode
        w = self.semiring.project(self.scores)
        pot = np.full(self.n_states, np.inf)
        fw = np.atleast_1d(self.semiring.project(self.final_scores))
        for s, f in zip(self.final_states, fw):
            s, f = int(s), float(f)
            if not np.isfinite(pot[s]):
                pot[s] = f
            elif log_mode:
                pot[s] = float(-np.logaddexp(-pot[s], -f))
            else:
                pot[s] = min(pot[s], f)
        in_order, in_ptr = self._csr_by(self.targets)
        for s in self.topological()[::-1]:
            ks = in_order[in_ptr[s]:in_ptr[s + 1]]
            if len(ks) == 0 or not np.isfinite(pot[s]):
                continue
            self._collect_into(pot, self.sources[ks], pot[s] + w[ks],
                               log_mode)
        return pot

    def posteriors(self) -> np.ndarray:
        """(A,) arc posterior probabilities via forward-backward in the
        log semiring (reference FwdBwd, src/Flf/FwdBwd.hh:33)."""
        if self.n_arcs == 0:
            return np.zeros(0)
        fwd = self.forward(log_mode=True)
        bwd = self.backward(log_mode=True)
        total = bwd[self.initial]
        w = self.semiring.project(self.scores)
        g = fwd[self.sources] + w + bwd[self.targets]
        with np.errstate(over="ignore", invalid="ignore"):
            p = np.exp(-(g - total))
        return np.where(np.isfinite(g), p, 0.0)

    # -- decoding -----------------------------------------------------------------

    def best(self) -> Tuple[List[int], float, List[int]]:
        """Viterbi best path: (labels-without-eps, projected score,
        arc indices)."""
        w = self.semiring.project(self.scores)
        pot = np.full(self.n_states, np.inf)
        back = np.full(self.n_states, -1, np.int64)
        pot[self.initial] = 0.0
        out_order, out_ptr = self._csr_by(self.sources)
        for s in self.topological():
            if not np.isfinite(pot[s]):
                continue
            ks = out_order[out_ptr[s]:out_ptr[s + 1]]
            if len(ks) == 0:
                continue
            cand = pot[s] + w[ks]
            tgt = self.targets[ks]
            # scatter-min (duplicate targets: plain fancy assignment
            # would let the LAST arc win, not the best)
            np.minimum.at(pot, tgt, cand)
            win = cand == pot[tgt]
            back[tgt[win]] = ks[win]
        if len(self.final_states) == 0:
            return [], float("inf"), []
        fw = np.atleast_1d(self.semiring.project(self.final_scores))
        totals = pot[self.final_states] + fw
        bi = int(np.argmin(totals))
        state = int(self.final_states[bi])
        path: List[int] = []
        while state != self.initial and back[state] >= 0:
            k = int(back[state])
            path.append(k)
            state = int(self.sources[k])
        path.reverse()
        labels = [int(self.labels[k]) for k in path
                  if self.labels[k] != EPS]
        return labels, float(totals[bi]), path

    def n_best(self, n: int) -> List[Tuple[List[int], float]]:
        from ..fsa.automaton import n_best as fsa_n_best
        return fsa_n_best(self.to_automaton(), n)

    # -- score arithmetic ------------------------------------------------------------

    def rescale(self, **key_scales: float) -> "FlfLattice":
        """New lattice with changed dimension scales (reference rescale
        node — scales live on the semiring, O(1))."""
        out = self.copy()
        sr = self.semiring
        for k, v in key_scales.items():
            sr = sr.with_scale(k, v)
        out.semiring = sr
        return out

    def extend_dim(self, key: str, arc_values: Optional[np.ndarray] = None,
                   const: float = 0.0, scale: float = 1.0) -> "FlfLattice":
        """Append a score dimension (reference extend-by-penalty /
        extend-by-*-score nodes)."""
        sr = self.semiring.extended(key, scale)
        if sr is self.semiring:  # existing dim: add into it
            out = self.copy()
            col = out.semiring.id_of(key)
            out.scores[:, col] += (arc_values if arc_values is not None
                                   else const)
            return out
        vals = (np.asarray(arc_values, np.float64)
                if arc_values is not None
                else np.full(self.n_arcs, const))
        out = self.copy()
        out.semiring = sr
        out.scores = np.concatenate(
            [out.scores, vals.reshape(-1, 1)], axis=1)
        out.final_scores = np.concatenate(
            [out.final_scores, np.zeros((len(out.final_states), 1))], axis=1)
        return out

    def map_scores(self, fn) -> "FlfLattice":
        """Apply fn to the (A, D) score block (reference add / multiply /
        exp / log nodes)."""
        out = self.copy()
        out.scores = np.asarray(fn(out.scores), np.float64)
        return out

    def project_dims(self, keys: Sequence[str]) -> "FlfLattice":
        """Keep only the named dimensions (reference project node)."""
        sr, ids = self.semiring.projected(keys)
        out = self.copy()
        out.semiring = sr
        out.scores = out.scores[:, ids].copy()
        out.final_scores = out.final_scores[:, ids].copy()
        return out

    def change_semiring(self, semiring: FlfSemiring) -> "FlfLattice":
        """Re-key the score block onto a target semiring: matching keys
        copy over, new dims start at 0 (reference change-semiring node)."""
        out = self.copy()
        A = self.n_arcs
        scores = np.zeros((A, semiring.n))
        fscores = np.zeros((len(self.final_states), semiring.n))
        for i, k in enumerate(semiring.keys):
            if self.semiring.has(k):
                j = self.semiring.id_of(k)
                scores[:, i] = self.scores[:, j]
                fscores[:, i] = self.final_scores[:, j]
        out.semiring = semiring
        out.scores = scores
        out.final_scores = fscores
        return out

    # -- pruning ------------------------------------------------------------------

    def prune_posterior(self, threshold: float) -> "FlfLattice":
        """Drop arcs with -log posterior > threshold, then trim
        (reference prune-posterior node over FwdBwd scores)."""
        post = self.posteriors()
        keep = post >= float(np.exp(-threshold))
        out = self.copy()
        out.sources = out.sources[keep]
        out.targets = out.targets[keep]
        out.labels = out.labels[keep]
        out.scores = out.scores[keep]
        return out.connect()

    # -- epsilon handling -------------------------------------------------------------

    def remove_epsilons(self) -> "FlfLattice":
        """Eliminate eps arcs by pushing their (vector) scores onto
        successor arcs; best (tropical-projected) eps closure.  Acyclic
        only."""
        eps = self.labels == EPS
        if not eps.any():
            return self
        D = self.semiring.n
        # closure[s] = list of (state, score-vec) reachable via eps from s
        order = self.topological()
        out_order, out_ptr = self._csr_by(self.sources)
        clo: List[Dict[int, np.ndarray]] = [dict() for _ in
                                            range(self.n_states)]
        for s in order[::-1]:
            ks = out_order[out_ptr[s]:out_ptr[s + 1]]
            for k in ks:
                if not eps[k]:
                    continue
                t = int(self.targets[k])
                vec = self.scores[k]
                cands = {t: vec}
                for u, uvec in clo[t].items():
                    cands[u] = vec + uvec
                for u, uvec in cands.items():
                    old = clo[int(s)].get(u)
                    if old is None or (self.semiring.project(uvec)
                                       < self.semiring.project(old)):
                        clo[int(s)][u] = uvec
        arcs: List[Tuple[int, int, int, np.ndarray]] = []
        finals: Dict[int, np.ndarray] = {
            int(s): self.final_scores[i]
            for i, s in enumerate(self.final_states)}
        fw = {int(s): self.final_scores[i]
              for i, s in enumerate(self.final_states)}
        for k in range(self.n_arcs):
            if not eps[k]:
                arcs.append((int(self.sources[k]), int(self.targets[k]),
                             int(self.labels[k]), self.scores[k]))
        for s in range(self.n_states):
            for u, uvec in clo[s].items():
                # non-eps arcs leaving the closure target move up to s
                ks = out_order[out_ptr[u]:out_ptr[u + 1]]
                for k in ks:
                    if eps[k]:
                        continue
                    arcs.append((s, int(self.targets[k]),
                                 int(self.labels[k]),
                                 uvec + self.scores[k]))
                if u in fw:
                    tot = uvec + fw[u]
                    old = finals.get(s)
                    if old is None or (self.semiring.project(tot)
                                       < self.semiring.project(old)):
                        finals[s] = tot
        lat = FlfLattice.build(
            self.semiring, self.n_states,
            [(a, b, l, v) for a, b, l, v in arcs],
            boundaries=self.boundaries, initial=self.initial,
            finals={s: v for s, v in finals.items()}, words=self.words)
        return lat.connect()

    # -- combination -------------------------------------------------------------------

    def union(self, other: "FlfLattice") -> "FlfLattice":
        """Lattice union with a fresh initial state and eps arcs
        (reference unite node, src/Flf/Union.cc)."""
        other = other.change_semiring(self.semiring)
        off_a, off_b = 1, 1 + self.n_states
        D = self.semiring.n
        arcs: List[Tuple[int, int, int, np.ndarray]] = [
            (0, off_a + self.initial, EPS, np.zeros(D)),
            (0, off_b + other.initial, EPS, np.zeros(D))]
        for lat, off in ((self, off_a), (other, off_b)):
            for k in range(lat.n_arcs):
                arcs.append((off + int(lat.sources[k]),
                             off + int(lat.targets[k]),
                             int(lat.labels[k]), lat.scores[k]))
        finals: Dict[int, np.ndarray] = {}
        for lat, off in ((self, off_a), (other, off_b)):
            for i, s in enumerate(lat.final_states):
                finals[off + int(s)] = lat.final_scores[i]
        bounds = np.concatenate([[0], self.boundaries, other.boundaries])
        words = dict(self.words or {})
        words.update(other.words or {})
        return FlfLattice.build(self.semiring,
                                1 + self.n_states + other.n_states, arcs,
                                boundaries=bounds, initial=0, finals=finals,
                                words=words or None)

    def concatenate(self, other: "FlfLattice") -> "FlfLattice":
        """Sequential concatenation: finals of self eps-link to the
        initial of other, carrying final scores (reference
        concatenate-lattices node)."""
        other = other.change_semiring(self.semiring)
        off_b = self.n_states
        arcs = [(int(self.sources[k]), int(self.targets[k]),
                 int(self.labels[k]), self.scores[k])
                for k in range(self.n_arcs)]
        for i, s in enumerate(self.final_states):
            arcs.append((int(s), off_b + other.initial, EPS,
                         self.final_scores[i]))
        for k in range(other.n_arcs):
            arcs.append((off_b + int(other.sources[k]),
                         off_b + int(other.targets[k]),
                         int(other.labels[k]), other.scores[k]))
        finals = {off_b + int(s): other.final_scores[i]
                  for i, s in enumerate(other.final_states)}
        last = int(self.boundaries[self.final_states].max()) \
            if len(self.final_states) else 0
        bounds = np.concatenate([self.boundaries, other.boundaries + last])
        words = dict(self.words or {})
        words.update(other.words or {})
        return FlfLattice.build(self.semiring,
                                self.n_states + other.n_states, arcs,
                                boundaries=bounds, initial=self.initial,
                                finals=finals, words=words or None)

    def intersection(self, other: "FlfLattice") -> "FlfLattice":
        """Label-sequence intersection (product construction over
        eps-free views; scores add per matched arc pair)."""
        a = self.remove_epsilons()
        b = other.change_semiring(self.semiring).remove_epsilons()
        pair_of: Dict[Tuple[int, int], int] = {}
        bounds: List[int] = []

        def state(sa: int, sb: int) -> int:
            key = (sa, sb)
            if key not in pair_of:
                pair_of[key] = len(pair_of)
                bounds.append(int(a.boundaries[sa]))
            return pair_of[key]

        a_out, a_ptr = a._csr_by(a.sources)
        b_out, b_ptr = b._csr_by(b.sources)
        arcs: List[Tuple[int, int, int, np.ndarray]] = []
        init = state(a.initial, b.initial)
        stack = [(a.initial, b.initial)]
        seen = {(a.initial, b.initial)}
        bf = {int(s): b.final_scores[i]
              for i, s in enumerate(b.final_states)}
        af = {int(s): a.final_scores[i]
              for i, s in enumerate(a.final_states)}
        finals: Dict[int, np.ndarray] = {}
        while stack:
            sa, sb = stack.pop()
            cur = state(sa, sb)
            if sa in af and sb in bf:
                finals[cur] = af[sa] + bf[sb]
            ka = a_out[a_ptr[sa]:a_ptr[sa + 1]]
            kb = b_out[b_ptr[sb]:b_ptr[sb + 1]]
            if len(ka) == 0 or len(kb) == 0:
                continue
            lb = b.labels[kb]
            for k1 in ka:
                match = kb[lb == a.labels[k1]]
                for k2 in match:
                    ta, tb = int(a.targets[k1]), int(b.targets[k2])
                    arcs.append((cur, state(ta, tb), int(a.labels[k1]),
                                 a.scores[k1] + b.scores[k2]))
                    if (ta, tb) not in seen:
                        seen.add((ta, tb))
                        stack.append((ta, tb))
        lat = FlfLattice.build(self.semiring, len(pair_of), arcs,
                               boundaries=bounds, initial=init,
                               finals=finals, words=self.words)
        return lat.connect()

    def difference(self, other: "FlfLattice") -> "FlfLattice":
        """Paths of self whose label sequence is NOT in other
        (product with the complement of other's determinized acceptor;
        reference difference node)."""
        a = self.remove_epsilons()
        dfa = _det_acceptor(other)
        a_out, a_ptr = a._csr_by(a.sources)
        pair_of: Dict[Tuple[int, int], int] = {}
        bounds: List[int] = []

        def state(sa: int, sd: int) -> int:
            key = (sa, sd)
            if key not in pair_of:
                pair_of[key] = len(pair_of)
                bounds.append(int(a.boundaries[sa]))
            return pair_of[key]

        DEAD = -1  # complement sink (accepting in the complement)
        arcs: List[Tuple[int, int, int, np.ndarray]] = []
        init = state(a.initial, dfa["initial"])
        stack = [(a.initial, dfa["initial"])]
        seen = {(a.initial, dfa["initial"])}
        af = {int(s): a.final_scores[i]
              for i, s in enumerate(a.final_states)}
        finals: Dict[int, np.ndarray] = {}
        while stack:
            sa, sd = stack.pop()
            cur = state(sa, sd)
            if sa in af and (sd == DEAD or sd not in dfa["finals"]):
                finals[cur] = af[sa]
            for k in a_out[a_ptr[sa]:a_ptr[sa + 1]]:
                lab = int(a.labels[k])
                td = DEAD if sd == DEAD else \
                    dfa["delta"].get((sd, lab), DEAD)
                ta = int(a.targets[k])
                arcs.append((cur, state(ta, td), lab, a.scores[k]))
                if (ta, td) not in seen:
                    seen.add((ta, td))
                    stack.append((ta, td))
        lat = FlfLattice.build(self.semiring, len(pair_of), arcs,
                               boundaries=bounds, initial=init,
                               finals=finals, words=self.words)
        return lat.connect()


def _det_acceptor(lat: FlfLattice) -> Dict:
    """Unweighted subset-construction DFA over a lattice's label
    sequences (helper for difference)."""
    a = lat.remove_epsilons()
    out_order, out_ptr = a._csr_by(a.sources)
    fin = set(int(s) for s in a.final_states)
    start = frozenset([a.initial])
    ids = {start: 0}
    delta: Dict[Tuple[int, int], int] = {}
    finals = set()
    stack = [start]
    while stack:
        sub = stack.pop()
        sid = ids[sub]
        if sub & fin:
            finals.add(sid)
        by_label: Dict[int, set] = {}
        for s in sub:
            for k in out_order[out_ptr[s]:out_ptr[s + 1]]:
                by_label.setdefault(int(a.labels[k]), set()).add(
                    int(a.targets[k]))
        for lab, tgts in by_label.items():
            nsub = frozenset(tgts)
            if nsub not in ids:
                ids[nsub] = len(ids)
                stack.append(nsub)
            delta[(sid, lab)] = ids[nsub]
    return {"initial": 0, "delta": delta, "finals": finals}
