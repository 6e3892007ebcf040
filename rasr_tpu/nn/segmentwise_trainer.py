"""Segmentwise (lattice-based) discriminative NN training.

The reference's Nn::SegmentwiseNnTrainer family (MMI/ME variants,
src/Nn/MmiSegmentwiseNnTrainer.hh, MODULE_NN_SEQUENCE_TRAINING) runs
behind the nn-trainer `supervised-segmentwise-training` and
`batch-estimation` actions (src/Tools/NnTrainer/NnTrainer.cc:133-144):
per segment it decodes/loads a denominator lattice, aligns the spoken
numerator, rescoring both with the current net's emissions, derives the
criterion's error signal at the output layer and backpropagates.

TPU-native realization: the emission forward + surrogate-loss gradient
is ONE jitted program; the lattice/alignment bookkeeping stays on host
(nn.sequence_training provides the FB machinery, brute-force-verified in
tests/test_sequence_training.py).  `update_mode`:

  * "segment" — optimizer step per segment (the reference's default
    online SGD);
  * "batch"   — gradients accumulate over the whole corpus pass, one
    estimation step at the end (the `batch-estimation` action,
    reference Estimator batch mode src/Nn/Estimator.hh:29).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..lattice.word_lattice import WordLattice
from .sequence_training import (SequenceErrorSignal, frame_accuracies,
                                mmi_error_signal, minimum_error_signal,
                                povey_arc_accuracies, surrogate_loss)


@dataclass
class SegmentStats:
    segments: int = 0
    skipped: int = 0
    frames: int = 0
    rejected_frames: int = 0
    objective_sum: float = 0.0

    def summary(self) -> Dict[str, float]:
        return {"segments": self.segments, "skipped": self.skipped,
                "frames": self.frames,
                "rejected_frames": self.rejected_frames,
                "avg_objective": self.objective_sum
                / max(self.segments, 1)}


class SegmentwiseNnTrainer:
    """Lattice-based MMI/MPE/sMBR training of a hybrid frame model.

    model_apply(params, feats (T, D)) -> (T, S) log-posteriors must be
    traceable; `params` is a pytree.  The denominator search and the
    numerator aligner come from the acoustic model + optional LM.
    """

    def __init__(self, am, model_apply, params, optimizer,
                 criterion: str = "mmi",
                 am_scale: float = 1.0, lm_scale: float = 1.0,
                 frame_rejection_threshold: float = 0.0,
                 beam_size: int = 128, lm=None,
                 update_mode: str = "segment",
                 silence_class: Optional[int] = None):
        import jax

        self.am = am
        self.criterion = criterion
        self.am_scale = float(am_scale)
        self.lm_scale = float(lm_scale)
        self.frame_rejection_threshold = float(frame_rejection_threshold)
        self.update_mode = update_mode
        self.params = params
        self._opt = optimizer
        self._opt_state = optimizer.init(params)
        self._grad_accum = None
        self._accum_weight = 0.0
        self.stats = SegmentStats()

        from ..search.aligner import Aligner
        from ..search.hmm_timesync import WordConditionedTreeSearch
        from ..search.linear import LinearSearch
        from ..speech.allophone_graph import StateGraphBuilder
        self._search = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=lm_scale, beam_size=beam_size)
        self._linear = LinearSearch(am, silence_between_words=False)
        self._builder = StateGraphBuilder(am, silence_at_boundaries=False,
                                          silence_between_words=False)
        self._aligner_cls = Aligner
        if silence_class is None:
            # derive from the ACTUAL tying of the silence allophone
            # (a closed-form guess like n_classes - silence_states is
            # wrong for monophone tying, which emits silence at
            # 3*(sil_phoneme-1), not at the end of the class range)
            silence_class = -1
            sil = next((l for l in am.lexicon.lemmas
                        if l.special == "silence"), None)
            if sil is not None and sil.pronunciations:
                from ..am.allophone import Allophone
                pid = sil.pronunciations[0].pronunciation.phonemes[0]
                silence_class = am.state_tying.emission_index(
                    Allophone(pid, 0, 0, 3), 0)
        self.silence_class = int(silence_class)

        self._log_post = jax.jit(model_apply)

        def seg_loss(p, feats, error, weights):
            return surrogate_loss(model_apply(p, feats), error, weights)

        self._grad = jax.jit(jax.grad(seg_loss))
        self._jax = jax

    # -- lattice plumbing -------------------------------------------------------

    def _arc_alignments(self, lat: WordLattice, scores: np.ndarray
                        ) -> Dict[Tuple[int, int], List[int]]:
        """Viterbi per-arc state alignments (the reference's
        SegmentwiseAlignmentGenerator role)."""
        aligns: Dict[Tuple[int, int], List[int]] = {}
        cache: Dict[Tuple[str, int, int], List[int]] = {}
        for s in range(lat.n_states):
            for i, arc in enumerate(lat.arcs[s]):
                t0, t1 = lat.boundaries[s], lat.boundaries[arc.target]
                if t1 <= t0:
                    continue
                lemma = self.am.lexicon.lemmas[arc.word]
                if lemma.special:
                    aligns[(s, i)] = [self.silence_class] * (t1 - t0)
                    continue
                orth = lemma.preferred_orth
                key = (orth, int(t0), int(t1))
                if key not in cache:
                    g = self._builder.build(orth)
                    path, _, _tot = self._aligner_cls(g).align(
                        scores[t0:t1])
                    cache[key] = list(np.asarray(g.emissions)[path])
                aligns[(s, i)] = cache[key]
        return aligns

    def _numerator(self, orth: str, scores: np.ndarray, words: Dict
                   ) -> Tuple[WordLattice, Dict, List[int]]:
        """Linear numerator lattice + alignment from forced alignment."""
        T = scores.shape[0]
        g = self._builder.build(orth)
        path, _, _tot = self._aligner_cls(g).align(scores)
        align = list(np.asarray(g.emissions)[path])
        lat = WordLattice(words=dict(words or {}))
        s0 = lat.add_state(0)
        s1 = lat.add_state(T)
        lat.initial = s0
        am_score = float(sum(scores[t, c] for t, c in enumerate(align)))
        lemma = self.am.lexicon.lemma_by_orth(orth.split()[0])
        lat.add_arc(s0, s1, lemma.id if lemma else 0, am_score, 0.0)
        lat.set_final(s1)
        return lat, {(s0, 0): align}, align

    def _rescore(self, lat: WordLattice, aligns: Dict,
                 scores: np.ndarray) -> WordLattice:
        """Arc am scores recomputed from the CURRENT emissions along the
        fixed alignments (the per-iteration emission rescoring of
        src/Nn/EmissionLatticeRescorer.hh)."""
        out = WordLattice(words=dict(lat.words or {}))
        for s in range(lat.n_states):
            out.add_state(lat.boundaries[s])
        out.initial = lat.initial
        for s in range(lat.n_states):
            for i, arc in enumerate(lat.arcs[s]):
                states = aligns.get((s, i), [])
                t0 = lat.boundaries[s]
                am_s = float(sum(scores[t0 + dt, c]
                                 for dt, c in enumerate(states)))
                out.add_arc(s, arc.target, arc.word, am_s, arc.lm_score)
        out.final = dict(lat.final)
        return out

    # -- the per-segment step -----------------------------------------------------

    def error_signal(self, feats: np.ndarray, orth: str
                     ) -> Optional[SequenceErrorSignal]:
        """Decode + align + criterion error signal for one segment."""
        import jax.numpy as jnp
        lp = np.asarray(self._log_post(self.params, jnp.asarray(feats)))
        scores = -self.am_scale * lp
        T, S = scores.shape
        self._search.recognize(scores)
        den_lat = self._search.create_lattice()
        if den_lat.n_arcs == 0:
            return None
        den_al = self._arc_alignments(den_lat, scores)
        try:
            num_lat, num_al, num_align = self._numerator(
                orth, scores, den_lat.words)
        except Exception:
            return None
        den_lat = self._rescore(den_lat, den_al, scores)
        if self.criterion == "mmi":
            return mmi_error_signal(
                den_lat, den_al, num_lat, num_al, T, S,
                self.am_scale, self.lm_scale,
                frame_rejection_threshold=self.frame_rejection_threshold,
                numerator_alignment=num_align)
        if self.criterion == "smbr":
            accs = frame_accuracies(num_align, den_lat, den_al)
        elif self.criterion == "mpe":
            ref = [(arc.word, num_lat.boundaries[s],
                    num_lat.boundaries[arc.target])
                   for s in range(num_lat.n_states)
                   for arc in num_lat.arcs[s]]
            accs = povey_arc_accuracies(den_lat, ref)
        else:
            raise ValueError(f"unknown criterion {self.criterion!r}")
        return minimum_error_signal(den_lat, den_al, accs, T, S,
                                    self.am_scale, self.lm_scale)

    def process_segment(self, feats: np.ndarray, orth: str) -> bool:
        """One segment: error signal -> gradient -> update/accumulate.
        Returns False when the segment was skipped."""
        import jax
        import jax.numpy as jnp
        sig = self.error_signal(feats, orth)
        self.stats.segments += 1
        if sig is None:
            self.stats.skipped += 1
            return False
        self.stats.frames += int(feats.shape[0])
        self.stats.rejected_frames += int(getattr(sig, "n_rejected", 0))
        self.stats.objective_sum += float(sig.objective)
        g = self._grad(self.params, jnp.asarray(feats),
                       jnp.asarray(sig.error, jnp.float32),
                       jnp.asarray(sig.weights, jnp.float32))
        if self.update_mode == "batch":
            if self._grad_accum is None:
                self._grad_accum = g
            else:
                self._grad_accum = jax.tree_util.tree_map(
                    jnp.add, self._grad_accum, g)
            self._accum_weight += 1.0
        else:
            self._apply(g)
        return True

    def _apply(self, grads) -> None:
        import optax
        updates, self._opt_state = self._opt.update(
            grads, self._opt_state, self.params)
        self.params = optax.apply_updates(self.params, updates)

    def estimate(self) -> None:
        """Apply the accumulated batch gradient (batch-estimation's
        final step); no-op when nothing accumulated."""
        if self._grad_accum is None:
            return
        import jax
        mean = jax.tree_util.tree_map(
            lambda x: x / max(self._accum_weight, 1.0), self._grad_accum)
        self._apply(mean)
        self._grad_accum = None
        self._accum_weight = 0.0
