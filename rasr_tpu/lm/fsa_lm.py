"""FSA grammar language model.

Re-creates the reference Lm::FsaLm (src/Lm/FsaLm.hh:24, FsaLm.cc):
a weighted acceptor over (syntactic) tokens acts as the grammar; the
LM history IS the automaton state.  Scoring walks arcs by input label,
following the FIRST epsilon arc of a state when the label is absent and
accumulating epsilon weights (FsaLm.cc:stateScore); dead ends score
``infinity_score`` (1e9, deliberately finite so search arithmetic stays
NaN-free, FsaLm.hh:58-68).

garbage_loop_mode (FsaLm.cc:28-35): unmatched input at any state falls
back to the initial state (garbage absorbed at infinite score), and a
FINAL state may reset to the initial state once per token so several
valid phrases can be accepted in one utterance; accept_partial_repeat
additionally allows restarting a partial begin phrase.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

from ..fsa.automaton import EPS, Automaton
from .arpa import SENTENCE_END, LanguageModel

INVALID_STATE = -1


class FsaLm(LanguageModel):
    """Grammar LM over an Automaton; histories are state ids (int).

    tokens: symbol table mapping token string -> arc input label id
    (labels 0 is epsilon per the fsa module convention, so token ids
    should start at 1).
    """

    infinity_score = 1e9

    def __init__(self, fsa: Automaton, tokens: Dict[str, int],
                 garbage_loop_mode: bool = False,
                 accept_partial_repeat: bool = False,
                 sentence_end_token: str = SENTENCE_END):
        self.fsa = fsa
        self.tokens = dict(tokens)
        self.garbage_loop_mode = garbage_loop_mode
        self.accept_partial_repeat = garbage_loop_mode and accept_partial_repeat
        self.sentence_end_token = sentence_end_token

    # -- automaton walking ------------------------------------------------
    def _find(self, state: int, label: int):
        """(matching arc, first eps arc) of a state."""
        match = eps = None
        for arc in self.fsa.arcs[state]:
            if arc.ilabel == label and match is None:
                match = arc
            if arc.ilabel == EPS and eps is None:
                eps = arc
        return match, eps

    def initial_history(self) -> int:
        return self.fsa.initial

    def extended_history(self, history: int, token: str) -> int:
        if history == INVALID_STATE:
            return INVALID_STATE
        label = self.tokens.get(token)
        if label is None:
            return (self.fsa.initial if self.garbage_loop_mode
                    else INVALID_STATE)
        sp = history
        initial = self.fsa.initial
        repeat = self.accept_partial_repeat and sp != initial
        reset_final = sp != initial  # final->initial only once (no loops)
        while True:
            match, eps = self._find(sp, label)
            if match is not None:
                return match.target
            if eps is None:
                if self.garbage_loop_mode:
                    if (self.fsa.is_final(sp) and reset_final) or repeat:
                        sp = initial
                        repeat = reset_final = False
                        continue
                    return initial  # garbage state
                return INVALID_STATE
            sp = eps.target

    def score(self, history: int, token: str) -> float:
        if token == self.sentence_end_token:
            return self.sentence_end_score(history)
        if history == INVALID_STATE:
            return self.infinity_score
        label = self.tokens.get(token)
        if label is None:
            return self.infinity_score
        sp = history
        initial = self.fsa.initial
        repeat = self.accept_partial_repeat and sp != initial
        reset_final = sp != initial
        score = 0.0
        while True:
            match, eps = self._find(sp, label)
            if match is not None:
                return score + match.weight
            if eps is None:
                if self.garbage_loop_mode:
                    if self.fsa.is_final(sp):
                        score += self.fsa.final[sp]
                    if (self.fsa.is_final(sp) and reset_final) or repeat:
                        sp = initial
                        repeat = reset_final = False
                        continue
                return self.infinity_score
            sp = eps.target
            score += eps.weight

    def sentence_end_score(self, history: int) -> float:
        if history == INVALID_STATE:
            return self.infinity_score
        sp, score, hops = history, 0.0, 0
        while hops <= self.fsa.n_states:
            if self.fsa.is_final(sp):
                return score + self.fsa.final[sp]
            eps = next((a for a in self.fsa.arcs[sp] if a.ilabel == EPS),
                       None)
            if eps is None:
                return self.infinity_score
            sp = eps.target
            score += eps.weight
            hops += 1
        return self.infinity_score

    def get_history_successors(self, history: int
                               ) -> List[Tuple[int, float]]:
        """Sparse lookahead: reachable (token label, score) pairs; the
        back-off score is infinite (FsaLm.hh isSparse/getBackOffScore)."""
        out: List[Tuple[int, float]] = []
        if history == INVALID_STATE:
            return out
        sp = history
        initial = self.fsa.initial
        repeat = self.accept_partial_repeat and sp != initial
        reset_final = sp != initial
        score, hops = 0.0, 0
        while hops <= 2 * self.fsa.n_states:
            hops += 1
            eps = None
            for arc in self.fsa.arcs[sp]:
                if arc.ilabel == EPS:
                    if eps is None:
                        eps = arc
                else:
                    out.append((arc.ilabel, score + arc.weight))
            if eps is None:
                if self.garbage_loop_mode:
                    if self.fsa.is_final(sp):
                        score += self.fsa.final[sp]
                    if (self.fsa.is_final(sp) and reset_final) or repeat:
                        sp = initial
                        repeat = reset_final = False
                        continue
                break
            sp = eps.target
            score += eps.weight
        return out
