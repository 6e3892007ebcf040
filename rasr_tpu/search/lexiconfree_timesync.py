"""Lexicon-free time-synchronous beam search (search v2).

API-parity implementation of the reference LexiconfreeTimesyncBeamSearch
(src/Search/LexiconfreeTimesyncBeamSearch, SearchAlgorithmV2 interface
src/Search/SearchV2.hh:50-96: enter_segment / put_feature /
decode_step / decode_many_steps / get_current_best_traceback /
finish_segment), generalized over any LabelScorer.

Per step: ONE batched score request for the whole beam (the TPU boundary),
then host-side extension + pruning (score threshold / beam size /
recombination on (scoring context, label history modulo loops)).

For pure-CTC encoder-only scorers, `recognize_segment` short-circuits to
the fully device-side ctc_prefix_beam (search/ctc_decode.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..nn.label_scorer import (EncoderOnlyLabelScorer, LabelScorer,
                               ScoringContext, TransitionType)


@dataclass
class TracebackItem:
    """One emitted label (reference Traceback / LibRASR TracebackItem,
    src/Tools/LibRASR/Search.cc:41-49)."""
    label: int
    score: float          # accumulated score at emission
    start_time: int       # decode step of first frame
    end_time: int         # decode step after last frame


@dataclass
class Hypothesis:
    context: ScoringContext
    labels: Tuple[int, ...] = ()
    last_label: int = -1
    is_blank_last: bool = True
    score: float = 0.0
    traceback: Tuple[TracebackItem, ...] = ()


class LexiconfreeTimesyncBeamSearch:
    """blank_index < 0 disables blank handling (plain time-sync)."""

    def __init__(self, scorer: LabelScorer,
                 beam_size: int = 16,
                 score_threshold: float = math.inf,
                 histogram_bins: int = 0,
                 blank_index: int = 0,
                 collapse_repeated: bool = True,
                 length_norm: bool = False):
        self.scorer = scorer
        self.beam_size = beam_size
        self.score_threshold = score_threshold
        # histogram pruning (reference doc/search_v2.rst pruning types):
        # cap candidates by binning scores below the threshold and cutting
        # at the bin that fills the beam — cheaper than a full sort when
        # candidate sets are huge; here also caps pathological thresholds
        self.histogram_bins = histogram_bins
        self.blank = blank_index
        self.collapse_repeated = collapse_repeated
        self.length_norm = length_norm
        self.enter_segment()

    # -- segment control (SearchAlgorithmV2) --------------------------------

    def enter_segment(self) -> None:
        self.scorer.reset()
        self._beam: List[Hypothesis] = [
            Hypothesis(context=self.scorer.get_initial_scoring_context())]
        self._step = 0
        self._finished = False

    def put_feature(self, feature: np.ndarray) -> None:
        self.scorer.add_input(np.asarray(feature, dtype=np.float32))

    def put_features(self, features: np.ndarray) -> None:
        self.scorer.add_inputs(np.asarray(features, dtype=np.float32))

    def finish_segment(self) -> None:
        self.scorer.signal_segment_end()
        self._finished = True
        self.decode_many_steps()

    # -- decoding -------------------------------------------------------------

    def decode_step(self) -> bool:
        """One time-synchronous expansion; False when no scores are ready."""
        scores = self.scorer.score_batch([h.context for h in self._beam])
        if scores is None:
            return False
        V = scores.shape[1]
        n_beam = len(self._beam)
        # total candidate scores (n_beam, V)
        base = np.asarray([h.score for h in self._beam])[:, None]
        cand = base + scores

        # score-threshold pruning relative to best candidate
        best = cand.min()
        threshold = self.score_threshold
        if self.histogram_bins and np.isfinite(threshold):
            # histogram pruning: tighten the threshold to the bin where the
            # cumulative candidate count reaches the beam size
            counts, edges = np.histogram(
                cand[cand <= best + threshold],
                bins=self.histogram_bins)
            cum = np.cumsum(counts)
            idx = int(np.searchsorted(cum, self.beam_size))
            if idx + 1 < len(edges):
                threshold = min(threshold, float(edges[idx + 1] - best))
        cand_mask = cand <= best + threshold

        # top beam_size among allowed candidates
        flat = np.where(cand_mask, cand, np.inf).ravel()
        k = min(self.beam_size * 2, flat.size)  # 2x before recombination
        top = np.argpartition(flat, k - 1)[:k]
        top = top[np.argsort(flat[top])]

        new_hyps: Dict[Tuple, Hypothesis] = {}
        for idx in top:
            if not np.isfinite(flat[idx]):
                break
            b, v = divmod(int(idx), V)
            hyp = self._beam[b]
            score = float(flat[idx])
            is_blank = (v == self.blank)
            is_loop = (self.collapse_repeated and not hyp.is_blank_last
                       and v == hyp.last_label)
            if is_blank:
                ttype = (TransitionType.BLANK_LOOP if hyp.is_blank_last
                         else TransitionType.LABEL_TO_BLANK)
                labels = hyp.labels
                traceback = hyp.traceback
            elif is_loop:
                ttype = TransitionType.LABEL_LOOP
                labels = hyp.labels
                traceback = hyp.traceback
            else:
                ttype = (TransitionType.BLANK_TO_LABEL if hyp.is_blank_last
                         else TransitionType.LABEL_TO_LABEL)
                labels = hyp.labels + (v,)
                traceback = hyp.traceback + (
                    TracebackItem(v, score, self._step, self._step + 1),)
            ctx = self.scorer.extended_scoring_context(hyp.context, v, ttype)
            key = (labels, ctx, v if not is_blank else -1)
            prev = new_hyps.get(key)
            if prev is None or score < prev.score:
                new_hyps[key] = Hypothesis(
                    context=ctx, labels=labels, last_label=v,
                    is_blank_last=is_blank, score=score, traceback=traceback)
            if len(new_hyps) >= self.beam_size * 4:
                break

        beam = sorted(new_hyps.values(), key=lambda h: h.score)
        self._beam = beam[:self.beam_size] or self._beam
        self._step += 1
        return True

    def decode_many_steps(self) -> int:
        steps = 0
        while self.decode_step():
            steps += 1
        return steps

    # -- results ------------------------------------------------------------

    def best(self) -> Hypothesis:
        if self.length_norm:
            return min(self._beam,
                       key=lambda h: h.score / max(len(h.labels), 1))
        return self._beam[0]

    def get_current_best_traceback(self) -> List[TracebackItem]:
        return list(self.best().traceback)

    def get_current_best_labels(self) -> List[int]:
        return list(self.best().labels)

    def get_common_prefix(self) -> List[int]:
        """Longest label prefix shared by ALL beam hypotheses — stable
        output for streaming (reference SearchAlgorithmV2
        getCurrentCommonPrefix, src/Search/SearchV2.hh)."""
        if not self._beam:
            return []
        first = self._beam[0].labels
        n = min(len(h.labels) for h in self._beam)
        out = []
        for i in range(n):
            v = first[i]
            if all(h.labels[i] == v for h in self._beam):
                out.append(v)
            else:
                break
        return out

    def prune_stable_delay(self, max_delay: int) -> None:
        """maximum-stable-delay pruning (doc/search_v2.rst:303-307): drop
        hypotheses whose traceback diverges from the best hypothesis
        earlier than `max_delay` steps ago, bounding streaming latency."""
        if not self._beam:
            return
        best = self._beam[0]
        horizon = self._step - max_delay

        def diverges_early(h: Hypothesis) -> bool:
            for i, (a, b) in enumerate(zip(best.traceback, h.traceback)):
                if a.label != b.label:
                    return a.start_time < horizon
            if len(best.traceback) != len(h.traceback):
                tail = (best.traceback[len(h.traceback):]
                        or h.traceback[len(best.traceback):])
                return tail[0].start_time < horizon
            return False

        kept = [h for h in self._beam if h is best or not diverges_early(h)]
        self._beam = kept

    def n_best(self, n: int) -> List[Hypothesis]:
        return self._beam[:n]

    # -- convenience (LibRASR recognize_segment) ------------------------------

    def recognize_segment(self, features: np.ndarray) -> List[int]:
        self.enter_segment()
        self.put_features(features)
        self.finish_segment()
        return self.get_current_best_labels()
