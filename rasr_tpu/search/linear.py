"""Linear search: forced recognition along the transcription.

Reference: the linear search decodes against the linear word sequence of
the segment's orthography (forced alignment with word boundaries) —
used for supervised alignment, boundary extraction, and confidence
scoring of given transcriptions.  TPU-native: builds the allophone state
graph for the orth, Viterbi-aligns on device, and cuts the state path at
word-index changes (StateGraph.word_of)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from ..speech.allophone_graph import StateGraphBuilder
from .aligner import Aligner


@dataclass
class WordBoundary:
    word: str
    lemma_index: int      # position in the transcription
    start_frame: int
    end_frame: int        # exclusive


class LinearSearch:
    """Forced recognition with word time boundaries."""

    def __init__(self, acoustic_model, allow_skip: bool = True,
                 silence_between_words: bool = True):
        self.am = acoustic_model
        self.builder = StateGraphBuilder(
            acoustic_model, allow_skip=allow_skip,
            silence_between_words=silence_between_words)

    def recognize(self, orth: str, scores: np.ndarray
                  ) -> Tuple[List[WordBoundary], np.ndarray, float]:
        """scores (T, E) emission scores -> (word boundaries,
        state path, total score)."""
        graph = self.builder.build(orth)
        path, _, total = Aligner(graph).align(scores)
        word_of = graph.word_of[path]           # (T,) word index or -1
        words = [l.preferred_orth for l in self.builder.lemmas_of_orth(orth)]
        out: List[WordBoundary] = []
        t = 0
        T = len(word_of)
        while t < T:
            w = int(word_of[t])
            start = t
            while t < T and int(word_of[t]) == w:
                t += 1
            if w >= 0:
                out.append(WordBoundary(words[w], w, start, t))
        return out, np.asarray(path), float(total)
