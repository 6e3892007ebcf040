"""Lattice-based discriminative sequence training (MMI / MPE / sMBR).

Re-creates the reference segmentwise NN trainers
(src/Nn/SegmentwiseNnTrainer.hh, MmiSegmentwiseNnTrainer.cc:49
computeInitialErrorSignal, MeSegmentwiseNnTrainer.cc:62 posteriorE path):
the error signal w.r.t. per-frame log-posteriors is

  MMI:      E[t, s] = gamma_den[t, s] - gamma_num[t, s]
  MPE/sMBR: E[t, s] = -kappa[t, s],  kappa(a) = gamma(a) * (c(a) - c_avg)

where gamma are lattice arc posteriors scattered along each arc's frame
alignment, c(a) is the expected path accuracy through arc a (first-order
expectation semiring, Fsa::posteriorE), and c_avg the lattice expected
accuracy.  Vesely et al. (Interspeech 2013) frame rejection zeroes frames
whose denominator occupancy at the numerator-aligned state is below a
threshold (MmiSegmentwiseNnTrainer.cc:76-84).

TPU split: lattices are small host objects (forward-backward in f64
numpy); the error signal enters the jitted training step through
``surrogate_loss``, whose gradient w.r.t. the logits equals the true
criterion gradient (the signal is treated as constant for the step, as
in the reference's per-segment error-signal accumulation).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..fsa.automaton import INF, LOG, sssp
from ..lattice.word_lattice import WordLattice

NEG = -1e30


def _log_fb(lattice: WordLattice, am_scale: float, lm_scale: float
            ) -> Tuple[List[float], List[float], float]:
    """Forward/backward -ln sums and total -ln p over the lattice."""
    fsa = lattice.automaton(am_scale, lm_scale, semiring=LOG)
    fwd = sssp(fsa)
    bwd = sssp(fsa, backward=True)
    return fwd, bwd, bwd[fsa.initial]


def occupancies(lattice: WordLattice,
                arc_alignments: Dict[Tuple[int, int], Sequence[int]],
                n_frames: int, n_classes: int,
                am_scale: float = 1.0, lm_scale: float = 1.0
                ) -> Tuple[np.ndarray, float]:
    """State-time occupancies gamma (T, S) and the total -ln p.

    arc_alignments maps (source_state, arc_index) -> per-frame emission
    class ids covering [boundaries[src], boundaries[target]) (the
    reference walks each lattice arc's alignment,
    SegmentwiseNnTrainer accumulateStatisticsOnLattice).
    """
    fwd, bwd, total = _log_fb(lattice, am_scale, lm_scale)
    gamma = np.zeros((n_frames, n_classes), dtype=np.float64)
    for s in range(lattice.n_states):
        for i, arc in enumerate(lattice.arcs[s]):
            w = am_scale * arc.am_score + lm_scale * arc.lm_score
            g = fwd[s] + w + bwd[arc.target]
            if g >= INF:
                continue
            p = math.exp(-(g - total))
            states = arc_alignments.get((s, i))
            if states is None:
                continue
            t0 = lattice.boundaries[s]
            for dt, cls in enumerate(states):
                t = t0 + dt
                if 0 <= t < n_frames:
                    gamma[t, cls] += p
    return gamma, total


def expectation_posteriors(lattice: WordLattice,
                           accuracies: Dict[Tuple[int, int], float],
                           am_scale: float = 1.0, lm_scale: float = 1.0
                           ) -> Tuple[Dict[Tuple[int, int], float], float]:
    """First-order expectation-semiring posteriors (Fsa::posteriorE).

    Returns ({(state, arc_index): kappa(a)}, expected accuracy c_avg)
    with kappa(a) = gamma(a) * (c(a) - c_avg) and
    c(a) = E[path accuracy | path through a].
    """
    fwd, bwd, total = _log_fb(lattice, am_scale, lm_scale)
    n = lattice.n_states

    # expected accumulated accuracy at each state, forward and backward:
    # ahat(s) = sum_{paths to s} p(path) acc(path) / sum p(path)
    order = sorted(range(n), key=lambda s: (lattice.boundaries[s], s))
    ahat = [0.0] * n
    anorm = [0.0] * n  # sum of path probs (relative, normalized by fwd)
    anorm[lattice.initial] = 1.0
    for s in order:
        if anorm[s] <= 0.0 or fwd[s] >= INF:
            continue
        for i, arc in enumerate(lattice.arcs[s]):
            w = am_scale * arc.am_score + lm_scale * arc.lm_score
            t = arc.target
            if fwd[t] >= INF:
                continue
            # transition probability contribution, normalized at target
            rel = math.exp(-(fwd[s] + w - fwd[t]))
            contrib = anorm[s] * rel
            ahat[t] += contrib * (ahat[s] / anorm[s]
                                  + accuracies.get((s, i), 0.0))
            anorm[t] += contrib

    bhat = [0.0] * n
    bnorm = [0.0] * n
    # the final weight acts as a stop transition with accuracy 0
    for s, wf in lattice.final.items():
        if bwd[s] < INF:
            bnorm[s] = math.exp(-(wf - bwd[s]))
    for s in reversed(order):
        if bwd[s] >= INF:
            continue
        for i, arc in enumerate(lattice.arcs[s]):
            t = arc.target
            if bnorm[t] <= 0.0 or bwd[t] >= INF:
                continue
            w = am_scale * arc.am_score + lm_scale * arc.lm_score
            rel = math.exp(-(w + bwd[t] - bwd[s]))
            contrib = bnorm[t] * rel
            bhat[s] += contrib * (bhat[t] / bnorm[t]
                                  + accuracies.get((s, i), 0.0))
            bnorm[s] += contrib

    # normalize (guards numerical drift; exact values are ahat/anorm)
    kappa: Dict[Tuple[int, int], float] = {}
    c_avg = (bhat[lattice.initial] / bnorm[lattice.initial]
             if bnorm[lattice.initial] > 0 else 0.0)
    for s in range(n):
        if fwd[s] >= INF or anorm[s] <= 0.0:
            continue
        for i, arc in enumerate(lattice.arcs[s]):
            t = arc.target
            w = am_scale * arc.am_score + lm_scale * arc.lm_score
            g = fwd[s] + w + bwd[t]
            if g >= INF or bnorm[t] <= 0.0:
                continue
            gamma = math.exp(-(g - total))
            c_a = (ahat[s] / anorm[s] + accuracies.get((s, i), 0.0)
                   + bhat[t] / bnorm[t])
            kappa[(s, i)] = gamma * (c_a - c_avg)
    return kappa, c_avg


def povey_arc_accuracies(lattice: WordLattice,
                         reference: Sequence[Tuple[int, int, int]]
                         ) -> Dict[Tuple[int, int], float]:
    """Approximate (M)PE arc accuracies (Povey 2002):

    acc(a) = max_r  -1 + 2 e(a, r)  if word(a) == word(r)
             max_r  -1 +   e(a, r)  otherwise
    with e the proportion of r's duration overlapped by a.
    reference: list of (word, start_frame, end_frame).
    """
    out: Dict[Tuple[int, int], float] = {}
    for s in range(lattice.n_states):
        t0 = lattice.boundaries[s]
        for i, arc in enumerate(lattice.arcs[s]):
            t1 = lattice.boundaries[arc.target]
            best = -1.0
            for word, r0, r1 in reference:
                dur = max(r1 - r0, 1)
                ov = max(0, min(t1, r1) - max(t0, r0)) / dur
                cand = -1.0 + (2.0 * ov if word == arc.word else ov)
                best = max(best, cand)
            out[(s, i)] = best
    return out


def frame_accuracies(alignment: Sequence[int],
                     lattice: WordLattice,
                     arc_alignments: Dict[Tuple[int, int], Sequence[int]]
                     ) -> Dict[Tuple[int, int], float]:
    """sMBR arc accuracies: # frames whose emission class matches the
    numerator alignment (state-level accuracy)."""
    out: Dict[Tuple[int, int], float] = {}
    for s in range(lattice.n_states):
        t0 = lattice.boundaries[s]
        for i in range(len(lattice.arcs[s])):
            states = arc_alignments.get((s, i), ())
            acc = 0.0
            for dt, cls in enumerate(states):
                t = t0 + dt
                if 0 <= t < len(alignment) and alignment[t] == cls:
                    acc += 1.0
            out[(s, i)] = acc
    return out


@dataclass
class SequenceErrorSignal:
    objective: float           # criterion value (to be maximized)
    error: np.ndarray          # (T, S) gradient w.r.t. log-posteriors
    weights: np.ndarray        # (T,) frame weights after rejection
    n_rejected: int = 0


def mmi_error_signal(den_lattice: WordLattice,
                     den_alignments: Dict[Tuple[int, int], Sequence[int]],
                     num_lattice: WordLattice,
                     num_alignments: Dict[Tuple[int, int], Sequence[int]],
                     n_frames: int, n_classes: int,
                     am_scale: float = 1.0, lm_scale: float = 1.0,
                     frame_rejection_threshold: float = 0.0,
                     numerator_alignment: Optional[Sequence[int]] = None
                     ) -> SequenceErrorSignal:
    """MMI criterion F = ln p(num) - ln p(den); error = d(-F)/d lp
    = am_scale * (gamma_den - gamma_num)
    (MmiSegmentwiseNnTrainer.cc:63,97; the reference accumulates the
    raw +/-posteriors, i.e. the am_scale=1 case)."""
    g_den, tot_den = occupancies(den_lattice, den_alignments, n_frames,
                                 n_classes, am_scale, lm_scale)
    g_num, tot_num = occupancies(num_lattice, num_alignments, n_frames,
                                 n_classes, am_scale, lm_scale)
    objective = tot_den - tot_num  # (-ln den) - (-ln num) = ln num/den
    weights = np.ones(n_frames, dtype=np.float64)
    n_rej = 0
    if frame_rejection_threshold > 0 and numerator_alignment is not None:
        for t in range(min(n_frames, len(numerator_alignment))):
            if g_den[t, numerator_alignment[t]] < frame_rejection_threshold:
                weights[t] = 0.0
                n_rej += 1
    return SequenceErrorSignal(objective, am_scale * (g_den - g_num),
                               weights, n_rej)


def minimum_error_signal(den_lattice: WordLattice,
                         den_alignments: Dict[Tuple[int, int],
                                              Sequence[int]],
                         accuracies: Dict[Tuple[int, int], float],
                         n_frames: int, n_classes: int,
                         am_scale: float = 1.0, lm_scale: float = 1.0
                         ) -> SequenceErrorSignal:
    """MPE/sMBR: maximize expected accuracy c_avg; error w.r.t.
    log-posteriors is -kappa scattered along arc alignments
    (MeSegmentwiseNnTrainer.cc:62, accumulate -posteriorE)."""
    kappa, c_avg = expectation_posteriors(den_lattice, accuracies,
                                          am_scale, lm_scale)
    err = np.zeros((n_frames, n_classes), dtype=np.float64)
    for (s, i), k in kappa.items():
        states = den_alignments.get((s, i))
        if states is None:
            continue
        t0 = den_lattice.boundaries[s]
        for dt, cls in enumerate(states):
            t = t0 + dt
            if 0 <= t < n_frames:
                # d(-c_avg)/d am_score(a) = +kappa; am = -sum lp -> -kappa
                err[t, cls] -= am_scale * k
    return SequenceErrorSignal(c_avg, err,
                               np.ones(n_frames, dtype=np.float64))


def surrogate_loss(log_posteriors, error_signal, weights=None):
    """Device-side loss whose gradient w.r.t. ``log_posteriors`` is the
    (frame-weighted) error signal; jit/grad-safe.

    log_posteriors (T, S) traced; error_signal/weights constants for the
    step (stop-gradient), matching the reference's error-signal
    back-substitution into the output layer.
    """
    import jax
    import jax.numpy as jnp
    e = jax.lax.stop_gradient(jnp.asarray(error_signal,
                                          dtype=log_posteriors.dtype))
    if weights is not None:
        w = jax.lax.stop_gradient(jnp.asarray(weights,
                                              dtype=log_posteriors.dtype))
        e = e * w[:, None]
    return jnp.sum(e * log_posteriors)
