"""Word-conditioned HMM tree search (the classic decoder).

Functional re-creation of the reference AdvancedTreeSearch
(src/Search/AdvancedTreeSearch/AdvancedTreeSearch.cc:242-282 per-frame
feed loop: startNewTrees -> expandHmm -> pruneAndAddScores -> findWordEnds;
SearchSpace with per-LM-history tree instances, SearchSpaceHelpers.hh:84
StateHypothesis / :226 WordEndHypothesis), redesigned for TPU:

  * ALL emission scores for a segment are computed in one device call
    (GmmScorer GEMM or NN posteriors) -> (T, S) matrix; the host loop never
    touches the device again (the reference interleaves per-frame scorer
    calls with pointer chasing);
  * hypotheses live in dicts keyed by (tree node, HMM state, LM history) —
    word conditioning == recombination on the LM history;
  * TDP loop/forward/skip/exit penalties per state, word-end LM application,
    beam + score-threshold pruning.

The lexical tree is built over phoneme HMM state sequences with state-tying
emission indices (monophone / CART via the Am layer).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..am.acoustic_model import AcousticModel, INFINITY
from ..am.allophone import Allophone, allophones_of_pronunciation
from ..bliss.lexicon import Lexicon
from ..lm.arpa import LanguageModel
from .lexiconfree_timesync import TracebackItem


@dataclass
class HmmTreeNode:
    """One phoneme segment in the lexical tree: its HMM emission classes,
    TDPs, children keyed by phoneme id, and word ends."""
    phoneme: int = 0
    emissions: Tuple[int, ...] = ()
    is_silence: bool = False
    children: Dict[int, int] = field(default_factory=dict)
    word_ends: List[Tuple[int, float]] = field(default_factory=list)


class HmmPrefixTree:
    def __init__(self, am: AcousticModel):
        self.am = am
        self.nodes: List[HmmTreeNode] = [HmmTreeNode()]
        lex = am.lexicon
        for lemma in lex.lemmas:
            if lemma.special and lemma.special != "silence":
                continue
            for lp in lemma.pronunciations:
                phones = list(lp.pronunciation.phonemes)
                if not phones:
                    continue
                allos = allophones_of_pronunciation(phones,
                                                    am.alphabet)
                node = 0
                for pid, allo in zip(phones, allos):
                    nxt = self.nodes[node].children.get(pid)
                    if nxt is None:
                        is_sil = am.is_silence_phoneme(pid)
                        n_states = am.topology.n_states(is_sil)
                        reps = am.topology.state_repetitions
                        emissions = tuple(
                            am.state_tying.emission_index(allo, s // reps)
                            for s in range(n_states))
                        nxt = len(self.nodes)
                        self.nodes.append(HmmTreeNode(
                            phoneme=pid, emissions=emissions,
                            is_silence=is_sil))
                        self.nodes[node].children[pid] = nxt
                    node = nxt
                self.nodes[node].word_ends.append((lemma.id, lp.score))

    @property
    def root(self) -> int:
        return 0


@dataclass
class HmmHypothesis:
    node: int                  # tree node (0 = root, pre-first-phoneme)
    state: int                 # HMM state within node (-1 at root)
    lm_history: tuple
    words: Tuple[int, ...] = ()
    score: float = 0.0
    traceback: Tuple[TracebackItem, ...] = ()
    # word-boundary bookkeeping for lattice generation (not part of the
    # recombination key): frame and total score at the last word end
    last_boundary: int = 0
    boundary_score: float = 0.0


class WordConditionedTreeSearch:
    """feed() over a precomputed (T, S) emission score matrix."""

    def __init__(self, am: AcousticModel,
                 lm: Optional[LanguageModel] = None,
                 lm_scale: float = 1.0,
                 beam_size: int = 64,
                 word_end_beam_size: Optional[int] = None,
                 score_threshold: float = math.inf):
        self.am = am
        self.tree = HmmPrefixTree(am)
        self.lm = lm
        self.lm_scale = lm_scale
        self.beam_size = beam_size
        self.word_end_beam = word_end_beam_size or max(beam_size // 4, 8)
        self.score_threshold = score_threshold
        self._orth = {l.id: l.preferred_orth for l in am.lexicon.lemmas}
        self.reset()

    def reset(self) -> None:
        if not hasattr(self, "statistics"):
            from .statistics import SearchSpaceStatistics
            self.statistics = SearchSpaceStatistics()
        self.statistics.reset()
        h0 = HmmHypothesis(
            node=self.tree.root, state=-1,
            lm_history=self.lm.initial_history() if self.lm else ())
        self._hyps: Dict[Tuple, HmmHypothesis] = {
            (h0.node, h0.state, h0.lm_history): h0}
        self._t = 0
        # word-end trace for lattice construction:
        # (prefix_before, start_frame, end_frame, lemma, am_delta, lm_score)
        self._word_trace: List[Tuple] = []

    # -- per-frame expansion ---------------------------------------------------

    def _lm_score(self, history, lemma_id) -> Tuple[float, tuple]:
        if self.lm is None:
            return 0.0, history
        lemma = self.am.lexicon.lemmas[lemma_id]
        score, h = 0.0, history
        for tok in lemma.syntactic_tokens:
            score += self.lm_scale * self.lm.score(h, tok)
            h = self.lm.extended_history(h, tok)
        return score, h

    def feed(self, frame_scores: np.ndarray) -> None:
        """One time-synchronous step with emission scores (S,)."""
        tree = self.tree
        new: Dict[Tuple, HmmHypothesis] = {}

        def offer(node, state, hist, words, score, tb, lb=0, bs=0.0):
            em = tree.nodes[node].emissions[state]
            total = score + float(frame_scores[em])
            key = (node, state, hist, words)
            prev = new.get(key)
            if prev is None or total < prev.score:
                new[key] = HmmHypothesis(node, state, hist, words, total,
                                         tb, lb, bs)

        def enter_node(node, hist, words, score, tb, lb=0, bs=0.0):
            """Enter a node's first state."""
            offer(node, 0, hist, words, score, tb, lb, bs)

        def word_end(hyp_words, node, hist, score, tb, lb=0, bs=0.0):
            """Apply word ends at a completed node: LM + back to root
            children (new word can start next frame via enter)."""
            for lemma_id, pron_score in tree.nodes[node].word_ends:
                lm_s, nh = self._lm_score(hist, lemma_id)
                we_words = hyp_words + (lemma_id,)
                we_score = score + pron_score + lm_s
                we_tb = tb + (TracebackItem(lemma_id, we_score,
                                            self._t, self._t + 1),)
                # lattice trace: the word spans [lb, t+1), am part =
                # acoustic+pron delta since the last boundary
                self._word_trace.append(
                    (hyp_words, lb, self._t + 1, lemma_id,
                     we_score - lm_s - bs, lm_s))
                # word-end hypothesis: positioned at root; next frame it
                # enters first states of new words
                for pid, child in tree.nodes[tree.root].children.items():
                    enter_node(child, nh, we_words, we_score, we_tb,
                               lb=self._t + 1, bs=we_score)

        for hyp in self._hyps.values():
            node = tree.nodes[hyp.node]
            if hyp.state < 0:
                # at root: enter all first phonemes
                for pid, child in node.children.items():
                    enter_node(child, hyp.lm_history, hyp.words, hyp.score,
                               hyp.traceback, hyp.last_boundary,
                               hyp.boundary_score)
                continue
            tdp = self.am.transitions.tdp_for(node.is_silence)
            n_states = len(node.emissions)
            # loop
            if tdp.loop < INFINITY:
                offer(hyp.node, hyp.state, hyp.lm_history, hyp.words,
                      hyp.score + tdp.loop, hyp.traceback,
                      hyp.last_boundary, hyp.boundary_score)
            # forward / skip within the node
            for step, penalty in ((1, tdp.forward), (2, tdp.skip)):
                if penalty >= INFINITY:
                    continue
                nxt = hyp.state + step
                if nxt < n_states:
                    offer(hyp.node, nxt, hyp.lm_history, hyp.words,
                          hyp.score + penalty, hyp.traceback,
                          hyp.last_boundary, hyp.boundary_score)
                elif nxt == n_states:
                    # leaving the node: into children or word end
                    exit_score = hyp.score + penalty
                    for pid, child in node.children.items():
                        enter_node(child, hyp.lm_history, hyp.words,
                                   exit_score, hyp.traceback,
                                   hyp.last_boundary, hyp.boundary_score)
                    if node.word_ends:
                        word_end(hyp.words, hyp.node, hyp.lm_history,
                                 exit_score + tdp.exit, hyp.traceback,
                                 hyp.last_boundary, hyp.boundary_score)

        # pruning
        hyps = sorted(new.values(), key=lambda h: h.score)
        stats = self.statistics
        stats.add("states before pruning", len(hyps))
        if hyps:
            best = hyps[0].score
            hyps = [h for h in hyps if h.score <= best + self.score_threshold]
            self._hyps = {(h.node, h.state, h.lm_history, h.words): h
                          for h in hyps[:self.beam_size]}
            stats.add("states after pruning", len(self._hyps))
            # a "tree" is one LM-history copy of the prefix tree
            stats.add("trees after pruning",
                      len({h.lm_history for h in self._hyps.values()}))
            stats.add("ending words after recombi",
                      len({h.words for h in self._hyps.values()}))
        self._t += 1

    # -- segment api --------------------------------------------------------------

    def recognize(self, scores: np.ndarray) -> List[str]:
        """scores: (T, S) emission score matrix (from GmmScorer or NN)."""
        self.reset()
        for t in range(scores.shape[0]):
            self.feed(scores[t])
        return self.best_words()

    def best(self) -> HmmHypothesis:
        def final_score(h):
            s = h.score
            node = self.tree.nodes[h.node]
            # must be at the end of a word-final node
            if h.state == len(node.emissions) - 1 and node.word_ends:
                lemma_id, pron_score = node.word_ends[0]
                lm_s, _ = self._lm_score(h.lm_history, lemma_id)
                return (s + pron_score + lm_s, h.words + (lemma_id,))
            return (s + 1e6, h.words)  # incomplete word: heavy penalty

        best_h, best_s, best_w = None, math.inf, ()
        for h in self._hyps.values():
            s, w = final_score(h)
            if s < best_s:
                best_h, best_s, best_w = h, s, w
        if best_h is None:
            return HmmHypothesis(0, -1, ())
        return replace(best_h, words=best_w, score=best_s)

    def best_words(self) -> List[str]:
        return [self._orth[w] for w in self.best().words
                if not self.am.lexicon.lemmas[w].special]

    def create_lattice(self):
        """Time-stamped word lattice from the word-end trace
        (the reference's word-conditioned lattice construction: states =
        (word prefix, boundary frame), arcs carry the word's acoustic
        delta and LM score over its [start, end) span — the format
        lattice-based sequence training consumes)."""
        from ..lattice.word_lattice import WordLattice
        lat = WordLattice(words=self._orth)
        state_of: Dict[Tuple, int] = {}

        def state(prefix: Tuple[int, ...], frame: int) -> int:
            key = (prefix, frame)
            if key not in state_of:
                state_of[key] = lat.add_state(frame)
            return state_of[key]

        lat.initial = state((), 0)
        for (prefix, t0, t1, lemma, am, lm_s) in self._word_trace:
            src = state(prefix, t0)
            dst = state(prefix + (lemma,), t1)
            lat.add_arc(src, dst, lemma, am_score=am, lm_score=lm_s)
        # finals: only word ends AT the segment end are complete paths;
        # if no hypothesis ended a word exactly at T, close at the latest
        # boundary reached (the reference forces word ends at segment end)
        latest = max((h.last_boundary for h in self._hyps.values()),
                     default=0)
        for h in self._hyps.values():
            if h.last_boundary != latest:
                continue
            key = (h.words[:len(h.words)], h.last_boundary)
            # the trace state uses the prefix INCLUDING the ended word
            if key in state_of:
                lat.set_final(state_of[key], 0.0)
        if not lat.final:
            for (prefix, frame), sid in state_of.items():
                if frame == latest:
                    lat.set_final(sid, 0.0)
        return lat
