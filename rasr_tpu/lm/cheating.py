"""Cheating segment LM and the trivial full-history LM.

CheatingSegmentLm (reference src/Lm/CheatingSegmentLm.hh:29): per
segment, the reference transcription is parsed into a lemma graph
(all tokenizations / alternatives) and turned into an acceptor; the LM
then only allows word sequences realizing the transcription — used for
forced recognition and oracle experiments.  Scoring/garbage semantics
are inherited from FsaLm.

SimpleHistoryLm (src/Lm/SimpleHistoryLm.hh:63): scores everything 0 but
keeps the FULL token sequence as history (noLM recognition where
recombination must still distinguish label sequences), with
reduced_history for limited context.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

from ..bliss.lexicon import Lexicon
from ..bliss.orthography import OrthographicParser
from ..fsa.automaton import EPS, Automaton
from .arpa import LanguageModel
from .fsa_lm import FsaLm


class CheatingSegmentLm(FsaLm):
    """FSA LM over the current segment's transcription lemma graph."""

    def __init__(self, lexicon: Lexicon, infinity_score: float = 1e9,
                 garbage_loop_mode: bool = False):
        self.lexicon = lexicon
        self.parser = OrthographicParser(lexicon,
                                         allow_silence_repetitions=False)
        # token ids: lemma orth -> id (shared across segments)
        tokens: Dict[str, int] = {}
        for lemma in lexicon.lemmas:
            for orth in lemma.orths:
                if orth and orth not in tokens:
                    tokens[orth] = len(tokens) + 1  # 0 = eps
        empty = Automaton()
        empty.add_state()
        super().__init__(empty, tokens,
                         garbage_loop_mode=garbage_loop_mode)
        self.infinity_score = infinity_score
        self.segment_index = -1

    def set_segment(self, orth: str) -> None:
        """Parse the transcription and swap in its acceptor
        (CheatingSegmentLm::setSegment)."""
        graph = self.parser.parse(orth)
        fsa = Automaton()
        for _ in range(graph.n_nodes):
            fsa.add_state()
        fsa.initial = graph.initial
        for e in graph.edges:
            if e.source == e.target:
                continue  # silence self-loops: silence handled acoustically
            if e.lemma is None:
                label = EPS  # skipped unknown word
            else:
                orth_form = e.orth or e.lemma.preferred_orth
                label = self.tokens.get(orth_form)
                if label is None:
                    label = self.tokens.get(e.lemma.preferred_orth, EPS)
            fsa.add_arc(e.source, e.target, label, label, 0.0)
        fsa.set_final(graph.final, 0.0)
        self.fsa = fsa
        self.segment_index += 1


class SimpleHistoryLm(LanguageModel):
    """Zero-score LM with full token-sequence histories."""

    def initial_history(self) -> Tuple[str, ...]:
        return ()

    def extended_history(self, history: Tuple[str, ...], token: str
                         ) -> Tuple[str, ...]:
        return tuple(history) + (token,)

    def reduced_history(self, history: Tuple[str, ...], limit: int
                        ) -> Tuple[str, ...]:
        return tuple(history)[-limit:] if limit < len(history) \
            else tuple(history)

    def score(self, history, token: str) -> float:
        return 0.0

    def sentence_end_score(self, history) -> float:
        return 0.0
