"""Lexicon-free label-synchronous beam search (search v2, AED family).

Re-creates the reference LexiconfreeLabelsyncBeamSearch
(src/Search/LexiconfreeLabelsyncBeamSearch, doc/search_v2.rst): hypotheses
advance one OUTPUT label per step (not per frame); scoring conditions on
the label history (attention decoder); search ends when every beam entry
emitted the sentence-end label or max length is reached; final ranking can
length-normalize.

One batched device call scores the whole beam per step: histories pad to
the current prefix length and the decoder forward returns next-label
distributions for all hypotheses at once.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .lexiconfree_timesync import TracebackItem


@dataclass
class LabelsyncHypothesis:
    labels: Tuple[int, ...] = ()
    score: float = 0.0
    finished: bool = False

    def normalized_score(self, length_norm_scale: float) -> float:
        if length_norm_scale <= 0:
            return self.score
        return self.score / max(len(self.labels), 1) ** length_norm_scale


class LexiconfreeLabelsyncBeamSearch:
    """score_fn(histories (B, L) int32 with BOS) -> (B, V) negative
    log-probs for the next label; sentence_end terminates a hypothesis."""

    def __init__(self, score_fn: Callable[[np.ndarray], np.ndarray],
                 n_labels: int,
                 sentence_end_index: int = 0,
                 bos_index: Optional[int] = None,
                 beam_size: int = 8,
                 max_labels: int = 200,
                 length_norm_scale: float = 1.0,
                 score_threshold: float = math.inf):
        self.score_fn = score_fn
        self.n_labels = n_labels
        self.eos = sentence_end_index
        self.bos = bos_index if bos_index is not None else sentence_end_index
        self.beam_size = beam_size
        self.max_labels = max_labels
        self.length_norm_scale = length_norm_scale
        self.score_threshold = score_threshold
        self.enter_segment()

    # -- segment api ----------------------------------------------------------

    def enter_segment(self) -> None:
        self._beam: List[LabelsyncHypothesis] = [LabelsyncHypothesis()]
        self._features: Optional[np.ndarray] = None

    def put_features(self, features: np.ndarray) -> None:
        self._features = np.asarray(features, dtype=np.float32)
        # config-built scorers (nn.scorer_factory.AedPrefixScorer) run
        # their encoder once per segment from here
        if hasattr(self.score_fn, "set_features"):
            self.score_fn.set_features(self._features)

    def finish_segment(self) -> None:
        self.decode_all()

    # -- decoding ----------------------------------------------------------------

    def decode_step(self) -> bool:
        active = [h for h in self._beam if not h.finished]
        if not active or all(len(h.labels) >= self.max_labels for h in active):
            return False
        L = max(len(h.labels) for h in active) + 1
        batch = np.full((len(active), L), self.bos, dtype=np.int32)
        for i, h in enumerate(active):
            batch[i, 1:1 + len(h.labels)] = h.labels
        scores = np.asarray(self.score_fn(batch))  # (B, V)

        candidates: List[LabelsyncHypothesis] = [
            h for h in self._beam if h.finished]
        for i, h in enumerate(active):
            row = h.score + scores[i]
            top = np.argpartition(row, min(self.beam_size, len(row) - 1)
                                  )[:self.beam_size]
            for v in top:
                v = int(v)
                if v == self.eos:
                    candidates.append(replace(h, score=float(row[v]),
                                              finished=True))
                elif len(h.labels) < self.max_labels:
                    candidates.append(LabelsyncHypothesis(
                        labels=h.labels + (v,), score=float(row[v])))
        candidates.sort(key=lambda h: h.normalized_score(self.length_norm_scale))
        if candidates:
            best = candidates[0].normalized_score(self.length_norm_scale)
            candidates = [
                h for h in candidates
                if h.normalized_score(self.length_norm_scale)
                <= best + self.score_threshold]
        self._beam = candidates[:self.beam_size]
        return any(not h.finished for h in self._beam)

    def decode_all(self) -> None:
        while self.decode_step():
            pass

    # -- results --------------------------------------------------------------

    def best(self) -> LabelsyncHypothesis:
        finished = [h for h in self._beam if h.finished]
        pool = finished or self._beam
        return min(pool, key=lambda h: h.normalized_score(self.length_norm_scale))

    def get_current_best_labels(self) -> List[int]:
        return list(self.best().labels)

    def n_best(self, n: int) -> List[LabelsyncHypothesis]:
        return sorted(self._beam,
                      key=lambda h: h.normalized_score(
                          self.length_norm_scale))[:n]

    def recognize_segment(self, features: np.ndarray) -> List[int]:
        self.enter_segment()
        self.put_features(features)
        self.finish_segment()
        return self.get_current_best_labels()
