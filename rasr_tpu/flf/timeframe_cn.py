"""Time-frame confusion networks (fCN).

Reference: src/Flf/TimeframeConfusionNetwork*.cc — a per-frame posterior
distribution over words built from lattice arc posteriors; used for
min-fWER decoding, frame-level confidences, time-frame error, and
posterior-level system combination (fCN combination).

Representation: a dict {word label -> (T,) posterior array} plus the
frame count — per-arc accumulation is one vectorized slice-add per arc,
and combination/decoding are pure array ops.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..fsa.automaton import EPS
from .lattice import FlfLattice


@dataclass
class TimeframeCN:
    n_frames: int
    posteriors: Dict[int, np.ndarray] = field(default_factory=dict)
    words: Optional[Dict[int, str]] = None

    def mass(self) -> np.ndarray:
        """(T,) total accumulated probability mass per frame."""
        total = np.zeros(self.n_frames)
        for arr in self.posteriors.values():
            total += arr
        return total

    def normalized(self) -> "TimeframeCN":
        """Per-frame normalization: mass > 1 scales down, missing mass
        (frames no word arc covers) goes to eps."""
        total = self.mass()
        denom = np.maximum(total, 1.0)
        out = TimeframeCN(self.n_frames, words=self.words)
        for lab, arr in self.posteriors.items():
            out.posteriors[lab] = arr / denom
        non_eps = sum((a for l, a in out.posteriors.items() if l != EPS),
                      np.zeros(self.n_frames))
        out.posteriors[EPS] = np.maximum(1.0 - non_eps, 0.0)
        return out

    # -- decoding -----------------------------------------------------------------

    def decode(self, eps_bonus: float = 0.0
               ) -> Tuple[List[int], List[Tuple[int, int]], List[float]]:
        """Min-fWER decode: per-frame argmax then merge runs.
        Returns (labels, [(start, end) frames], mean word posterior)."""
        if not self.posteriors:
            return [], [], []
        labs = np.asarray(sorted(self.posteriors))
        mat = np.stack([self.posteriors[int(l)] for l in labs])  # (W, T)
        if EPS in self.posteriors and eps_bonus:
            mat[int(np.flatnonzero(labs == EPS)[0])] += eps_bonus
        arg = labs[np.argmax(mat, axis=0)]            # (T,)
        best_p = np.max(mat, axis=0)
        out_labels: List[int] = []
        bounds: List[Tuple[int, int]] = []
        confs: List[float] = []
        t = 0
        while t < self.n_frames:
            lab = int(arg[t])
            t1 = t
            while t1 < self.n_frames and arg[t1] == lab:
                t1 += 1
            if lab != EPS:
                out_labels.append(lab)
                bounds.append((t, t1))
                confs.append(float(best_p[t:t1].mean()))
            t = t1
        return out_labels, bounds, confs

    def frame_confidence(self, label: int, t0: int, t1: int) -> float:
        """Mean posterior of `label` over [t0, t1) (frame confidence of a
        word hypothesis, reference fCN confidence)."""
        arr = self.posteriors.get(label)
        if arr is None or t1 <= t0:
            return 0.0
        return float(arr[t0:t1].mean())


def build_timeframe_cn(lat: FlfLattice) -> TimeframeCN:
    """Accumulate arc posteriors into per-frame word posteriors."""
    post = lat.posteriors()
    T = int(lat.boundaries.max()) if lat.n_states else 0
    cn = TimeframeCN(max(T, 1), words=lat.words)
    for k in range(lat.n_arcs):
        p = float(post[k])
        if p <= 0.0:
            continue
        lab = int(lat.labels[k])
        t0 = int(lat.boundaries[lat.sources[k]])
        t1 = max(int(lat.boundaries[lat.targets[k]]), t0 + 1)
        t1 = min(t1, cn.n_frames)
        arr = cn.posteriors.get(lab)
        if arr is None:
            arr = cn.posteriors[lab] = np.zeros(cn.n_frames)
        arr[t0:t1] += p
    return cn


def combine_timeframe_cns(cns: Sequence[TimeframeCN],
                          weights: Optional[Sequence[float]] = None
                          ) -> TimeframeCN:
    """Posterior-level system combination: weighted frame-wise average
    (reference fCN combination, the ROVER-style posterior variant)."""
    if not cns:
        raise ValueError("no fCNs to combine")
    weights = list(weights) if weights is not None else [1.0] * len(cns)
    wsum = sum(weights)
    T = max(cn.n_frames for cn in cns)
    words: Dict[int, str] = {}
    out = TimeframeCN(T)
    for cn, w in zip(cns, weights):
        if cn.words:
            words.update(cn.words)
        for lab, arr in cn.posteriors.items():
            dst = out.posteriors.setdefault(lab, np.zeros(T))
            dst[:len(arr)] += (w / wsum) * arr
    out.words = words or None
    return out


def fcn_timeframe_error(cn: TimeframeCN, ref_labels: Sequence[int],
                        ref_bounds: Sequence[Tuple[int, int]]) -> float:
    """Expected time-frame error of an fCN vs a time-aligned reference:
    1 - mean posterior of the correct word per reference frame."""
    tot, acc = 0, 0.0
    for lab, (s, e) in zip(ref_labels, ref_bounds):
        e = min(e, cn.n_frames)
        if e <= s:
            continue
        arr = cn.posteriors.get(int(lab))
        acc += float(arr[s:e].sum()) if arr is not None else 0.0
        tot += e - s
    return 1.0 - acc / max(tot, 1)
