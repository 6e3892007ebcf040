"""Grammar-constrained recognition.

Re-creation of the reference ConstrainedOfflineRecognizer
(/root/reference/src/Speech/Recognizer.cc:330-397): per segment, a
grammar automaton — the segment's orthography parsed into a lemma
acceptor, or an FSA loaded from an archive — restricts the search to
word sequences the grammar accepts.  The reference composes the grammar
into the decoder's state network (`recognizer_->setGrammar`); here the
grammar becomes a per-segment FSA language model (lm/fsa_lm.py) swapped
into the search via `set_language_model`, optionally log-linearly
combined with the main n-gram LM (lm.CombineLm, matching the
reference's compose-with-lmFsa path) — the same restriction with the
word-conditioned recombination machinery unchanged.

Used for forced lattices and numerator generation in
sequence-discriminative training.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import numpy as np

from ..bliss.lexicon import Lexicon
from ..bliss.orthography import LemmaGraph, OrthographicParser
from ..fsa.automaton import Automaton
from ..lm.arpa import SENTENCE_END, CombineLm, LanguageModel
from ..lm.fsa_lm import FsaLm


def syntactic_token_table(lexicon: Lexicon) -> Dict[str, int]:
    """token string -> FSA arc label id (>= 1; 0 is epsilon)."""
    tokens: Dict[str, int] = {}
    for lemma in lexicon.lemmas:
        for tok in lemma.syntactic_tokens:
            if tok not in tokens:
                tokens[tok] = len(tokens) + 1
    return tokens


def lemma_graph_to_grammar(graph: LemmaGraph, lexicon: Lexicon,
                           tokens: Optional[Dict[str, int]] = None,
                           scale: float = 0.0) -> FsaLm:
    """LemmaGraph (orthographic parse) -> grammar FsaLm over syntactic
    tokens: lemma edges become token-arc chains, silence/unknown edges
    become epsilon arcs; the graph-final node is the FSA final state.
    `scale` weights every grammar arc (reference paramScale)."""
    tokens = tokens if tokens is not None else syntactic_token_table(lexicon)
    fsa = Automaton()
    state_of = {}

    def state(n: int) -> int:
        if n not in state_of:
            state_of[n] = fsa.add_state()
        return state_of[n]

    fsa.initial = state(graph.initial)
    for e in graph.edges:
        src, dst = state(e.source), state(e.target)
        toks = e.lemma.syntactic_tokens if e.lemma is not None else []
        if not toks:
            if src != dst:          # silence self-loops need no arc: the
                fsa.add_arc(src, dst, 0, 0, scale)   # LM never sees them
            continue
        cur = src
        for i, tok in enumerate(toks):
            nxt = dst if i == len(toks) - 1 else fsa.add_state()
            fsa.add_arc(cur, nxt, tokens[tok], tokens[tok], scale)
            cur = nxt
    fsa.set_final(state(graph.final), 0.0)
    return FsaLm(fsa, tokens)


def grammar_for_orth(lexicon: Lexicon, orth: str,
                     scale: float = 0.0,
                     tokens: Optional[Dict[str, int]] = None) -> FsaLm:
    """The segment-orthography lemma acceptor as a grammar LM (the
    numerator/forced-recognition grammar)."""
    graph = OrthographicParser(lexicon).parse(orth)
    return lemma_graph_to_grammar(graph, lexicon, tokens, scale)


def grammar_from_words(lexicon: Lexicon, sentences: List[List[str]],
                       scale: float = 0.0,
                       tokens: Optional[Dict[str, int]] = None) -> FsaLm:
    """Union-of-sentences grammar: each sentence is one accepted word
    sequence (a simple explicit grammar, e.g. a command-and-control
    set or an n-best constraint)."""
    tokens = tokens if tokens is not None else syntactic_token_table(lexicon)
    fsa = Automaton()
    start = fsa.add_state()
    fsa.initial = start
    final = fsa.add_state()
    fsa.set_final(final, 0.0)
    for sent in sentences:
        cur = start
        for i, word in enumerate(sent):
            nxt = final if i == len(sent) - 1 else fsa.add_state()
            label = tokens.get(word)
            if label is None:
                raise ValueError(f"grammar word {word!r} not in lexicon")
            fsa.add_arc(cur, nxt, label, label, scale)
            cur = nxt
    return FsaLm(fsa, tokens)


class ConstrainedOfflineRecognizer:
    """Wraps a search (WordConditionedTreeSearch or
    TreeTimesyncBeamSearch) and swaps a per-segment grammar LM into it
    before decoding (reference enterSpeechSegment -> setGrammar).

    grammar_source(segment_or_orth) -> FsaLm; defaults to the
    orthography lemma acceptor.  With `language_model` set, the grammar
    is log-linearly combined with it (grammar restricts, LM scores)."""

    def __init__(self, search, lexicon: Lexicon,
                 grammar_source: Optional[Callable] = None,
                 language_model: Optional[LanguageModel] = None,
                 lm_scale: float = 1.0,
                 grammar_scale: float = 1.0):
        self.search = search
        self.lexicon = lexicon
        self.language_model = language_model
        self.lm_scale = lm_scale
        self.grammar_scale = grammar_scale
        self._tokens = syntactic_token_table(lexicon)
        self._grammar_source = grammar_source or (
            lambda orth: grammar_for_orth(lexicon, orth,
                                          tokens=self._tokens))

    def set_segment_grammar(self, orth_or_segment) -> None:
        orth = getattr(orth_or_segment, "orth", orth_or_segment)
        grammar = self._grammar_source(orth)
        if self.language_model is not None:
            lm = CombineLm([grammar, self.language_model],
                           [self.grammar_scale, self.lm_scale])
            self.search.set_language_model(lm, lm_scale=1.0)
        else:
            self.search.set_language_model(grammar,
                                           lm_scale=self.grammar_scale)

    def recognize(self, scores_or_features, orth_or_segment) -> List[str]:
        """Set the segment grammar, then decode.  The argument is the
        emission-score matrix for the classic search, or features for a
        v2 search (dispatched on the wrapped search's API)."""
        self.set_segment_grammar(orth_or_segment)
        if hasattr(self.search, "recognize_segment"):
            # SearchAlgorithmV2 feature-driven path
            return self.search.recognize_segment(
                np.asarray(scores_or_features, np.float32))
        return self.search.recognize(scores_or_features)
