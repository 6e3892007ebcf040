"""Allophone-state graph construction for alignment and full-sum training.

Builds the HMM state graph for an orthography: orth -> lemmas ->
pronunciations -> context-expanded allophones -> HMM states with TDP arcs
(loop / forward / skip / exit) and optional silence at the start, end and
between words.  This is the functional equivalent of the reference chain
AllophoneStateGraphBuilder -> ClassicTransducerBuilder ->
TransitionModel::apply (src/Speech/AllophoneStateGraphBuilder.hh:49,
src/Am/ClassicTransducerBuilder.hh, src/Am/TransitionModel.hh:70), but
produces a flat arc-list DAG directly consumable by the batched TPU
aligner (search/aligner.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..am.acoustic_model import AcousticModel, INFINITY
from ..am.allophone import Allophone, allophones_of_pronunciation
from ..bliss.lexicon import Lemma


@dataclass
class StateGraph:
    """Flat alignment graph: states carry emissions, arcs carry -log scores.

    States are topologically ordered.  Arc (i -> j, score); self loops have
    i == j.  `labels` are packed allophone-state ids (for alignment output),
    `emissions` are tied emission-class indices (rows of the score matrix).
    """
    n_states: int
    emissions: np.ndarray            # (N,) int32
    labels: np.ndarray               # (N,) int32 packed allophone-state ids
    arcs_from: np.ndarray            # (A,) int32
    arcs_to: np.ndarray              # (A,) int32
    arcs_score: np.ndarray           # (A,) float32
    initial: np.ndarray              # (I,) int32 entry states
    initial_score: np.ndarray        # (I,) float32
    final: np.ndarray                # (F,) int32 exit states
    final_score: np.ndarray          # (F,) float32
    word_of: Optional[np.ndarray] = None  # (N,) word index per state, -1=sil


class StateGraphBuilder:
    def __init__(self, am: AcousticModel,
                 allow_skip: bool = True,
                 silence_between_words: bool = True,
                 silence_at_boundaries: bool = True):
        self.am = am
        self.allow_skip = allow_skip
        self.silence_between_words = silence_between_words
        self.silence_at_boundaries = silence_at_boundaries

    # -- lemma lookup -------------------------------------------------------

    def lemmas_of_orth(self, orth: str) -> List[Lemma]:
        lemmas = []
        for token in orth.split():
            lemma = self.am.lexicon.lemma_by_orth(token)
            if lemma is None:
                unk = self.am.lexicon.special_lemma("unknown")
                if unk is None:
                    raise KeyError(f"out-of-vocabulary word {token!r} "
                                   "and no [unknown] lemma")
                lemma = unk
            lemmas.append(lemma)
        return lemmas

    # -- graph building -------------------------------------------------------

    def build(self, orth: str) -> StateGraph:
        am = self.am
        states_em: List[int] = []
        states_label: List[int] = []
        states_word: List[int] = []
        current_word = [-1]  # -1 = silence / non-word
        arcs: List[Tuple[int, int, float]] = []

        def add_phone_states(allo: Allophone) -> Tuple[int, int, List[int]]:
            """Emit HMM states for one allophone; returns (first, last,
            state list)."""
            is_sil = am.is_silence_phoneme(allo.central)
            n = am.topology.n_states(is_sil)
            tdp = am.transitions.tdp_for(is_sil)
            allo_idx = am.alphabet.index(allo)
            first = len(states_em)
            for s in range(n):
                hmm_state = s // am.topology.state_repetitions
                states_em.append(am.state_tying.emission_index(allo, hmm_state))
                states_label.append(am.alphabet.state_id(allo_idx, hmm_state))
                states_word.append(current_word[0])
            last = len(states_em) - 1
            for s in range(first, last + 1):
                if tdp.loop < INFINITY:
                    arcs.append((s, s, tdp.loop))
                if s < last:
                    arcs.append((s, s + 1, tdp.forward))
                if self.allow_skip and s + 2 <= last and tdp.skip < INFINITY:
                    arcs.append((s, s + 2, tdp.skip))
            return first, last, list(range(first, last + 1))

        def add_silence() -> Tuple[int, int]:
            sil = am.lexicon.special_lemma("silence")
            if sil is None or not sil.pronunciations:
                return -1, -1
            pid = sil.pronunciations[0].pronunciation.phonemes[0]
            saved = current_word[0]
            current_word[0] = -1
            f, l, _ = add_phone_states(Allophone(pid, 0, 0, 3))
            current_word[0] = saved
            return f, l

        tdp_exit = am.transitions.tdp_for(False).exit
        sil_exit = am.transitions.tdp_for(True).exit

        lemmas = self.lemmas_of_orth(orth)
        # per word: (entry state, exit state, pron score)
        word_spans: List[Tuple[List[Tuple[int, int, float]]]] = []
        word_variants: List[List[Tuple[int, int, float]]] = []
        for word_index, lemma in enumerate(lemmas):
            current_word[0] = word_index
            variants: List[Tuple[int, int, float]] = []
            for lp in lemma.pronunciations:
                phones = list(lp.pronunciation.phonemes)
                if not phones:
                    continue
                allos = allophones_of_pronunciation(phones, am.alphabet)
                prev_last = None
                first_state = None
                for allo in allos:
                    f, l, _ = add_phone_states(allo)
                    if first_state is None:
                        first_state = f
                    if prev_last is not None:
                        arcs.append((prev_last, f,
                                     am.transitions.tdp_for(False).forward))
                    prev_last = l
                variants.append((first_state, prev_last, float(lp.score)))
            if not variants:
                raise ValueError(f"lemma {lemma.preferred_orth!r} has no "
                                 "non-empty pronunciation")
            word_variants.append(variants)
        current_word[0] = -1

        initial: List[Tuple[int, float]] = []
        finals: List[Tuple[int, float]] = []

        # optional leading silence
        lead_f, lead_l = (add_silence() if self.silence_at_boundaries
                          else (-1, -1))

        # connection frontier: list of (state, score-to-leave-it)
        frontier: List[Tuple[int, float]] = []
        if lead_f >= 0:
            initial.append((lead_f, 0.0))
            frontier.append((lead_l, sil_exit))
        # direct entry into first word as well
        entry_direct = True

        for wi, variants in enumerate(word_variants):
            new_frontier: List[Tuple[int, float]] = []
            for (first, last, pron_score) in variants:
                # connect previous frontier
                for (st, out_score) in frontier:
                    arcs.append((st, first, out_score + pron_score))
                if wi == 0 and entry_direct:
                    initial.append((first, pron_score))
                new_frontier.append((last, tdp_exit))
            # optional silence after this word
            if (self.silence_between_words and wi < len(word_variants) - 1) or \
                    (self.silence_at_boundaries and wi == len(word_variants) - 1):
                sf, sl = add_silence()
                if sf >= 0:
                    for (_, last, _) in variants:
                        arcs.append((last, sf, tdp_exit))
                    new_frontier.append((sl, sil_exit))
            frontier = new_frontier

        for (st, out_score) in frontier:
            finals.append((st, out_score))

        n = len(states_em)
        af = np.asarray([a[0] for a in arcs], dtype=np.int32)
        at = np.asarray([a[1] for a in arcs], dtype=np.int32)
        ascore = np.asarray([a[2] for a in arcs], dtype=np.float32)
        return StateGraph(
            n_states=n,
            emissions=np.asarray(states_em, dtype=np.int32),
            labels=np.asarray(states_label, dtype=np.int32),
            arcs_from=af, arcs_to=at, arcs_score=ascore,
            initial=np.asarray([i for i, _ in initial], dtype=np.int32),
            initial_score=np.asarray([s for _, s in initial], dtype=np.float32),
            final=np.asarray([i for i, _ in finals], dtype=np.int32),
            final_score=np.asarray([s for _, s in finals], dtype=np.float32),
            word_of=np.asarray(states_word, dtype=np.int32))
