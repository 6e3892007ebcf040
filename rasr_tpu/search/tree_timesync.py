"""Tree time-synchronous beam search (lexicon-constrained, search v2).

Re-creates the reference TreeTimesyncBeamSearch
(src/Search/TreeTimesyncBeamSearch/TreeTimesyncBeamSearch.cc:509 decodeStep:
batched score request -> extensions over tree successors -> pruning ->
recombination on (tree state, scoring context, LM history)) and the
CTC tree builder (src/Search/TreeBuilder.hh:260 CtcTreeBuilder): a lexical
prefix tree over pronunciations whose arc labels are the label-scorer's
output tokens; word identities attach to tree nodes; an (optionally
scaled) word-level LM scores at word ends.

Host keeps the pointer-heavy tree/beam bookkeeping; the device provides one
batched (beam, V) score matrix per frame (the reference's ONNX-session
boundary becomes a jitted encoder call).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..bliss.lexicon import Lexicon
from ..lm.arpa import LanguageModel
from ..nn.label_scorer import LabelScorer, ScoringContext, TransitionType
from .lexiconfree_timesync import TracebackItem


@dataclass
class TreeNode:
    token: int = -1                      # arc label entering this node
    children: Dict[int, int] = field(default_factory=dict)  # token -> node id
    word_ends: List[Tuple[int, float]] = field(default_factory=list)
    # word_ends: (lemma id, pronunciation score)


class PrefixTree:
    """Lexical prefix tree over pronunciations; token ids are phoneme ids
    mapped through `token_of_phoneme` (identity by default: vocab-text
    lexica have phoneme id == label id + 1)."""

    def __init__(self, lexicon: Lexicon,
                 token_of_phoneme=None,
                 skip_special: bool = True):
        self.nodes: List[TreeNode] = [TreeNode()]
        self.lexicon = lexicon
        tok = token_of_phoneme or (lambda pid: pid - 1)
        for lemma in lexicon.lemmas:
            if skip_special and lemma.special:
                continue
            for lp in lemma.pronunciations:
                tokens = [tok(p) for p in lp.pronunciation.phonemes]
                if not tokens:
                    continue
                node = 0
                for t in tokens:
                    nxt = self.nodes[node].children.get(t)
                    if nxt is None:
                        nxt = len(self.nodes)
                        self.nodes.append(TreeNode(token=t))
                        self.nodes[node].children[t] = nxt
                    node = nxt
                self.nodes[node].word_ends.append((lemma.id, lp.score))

    @property
    def root(self) -> int:
        return 0

    def successors(self, node: int) -> Dict[int, int]:
        return self.nodes[node].children

    def word_ends(self, node: int) -> List[Tuple[int, float]]:
        return self.nodes[node].word_ends

    def reachable_word_ends(self) -> List[np.ndarray]:
        """Per node: lemma ids of all word ends in the subtree (for LM
        lookahead, reference LanguageModelLookahead tree compression)."""
        n = len(self.nodes)
        memo: List[Optional[set]] = [None] * n

        def collect(i: int) -> set:
            if memo[i] is not None:
                return memo[i]
            out = {lemma for lemma, _ in self.nodes[i].word_ends}
            for child in self.nodes[i].children.values():
                out |= collect(child)
            memo[i] = out
            return out

        collect(0)
        return [np.asarray(sorted(memo[i]), dtype=np.int64) for i in range(n)]


class LmLookahead:
    """Per-history lookahead tables over the prefix tree: la(node, h) =
    min over word ends reachable below node of the scaled LM score
    (reference LanguageModelLookahead, src/Search/LanguageModelLookahead.hh:
    compressed lookahead tree + cached per-history score tables).

    One batched LM query per new history fills the whole table."""

    def __init__(self, tree: PrefixTree, lm, lm_scale: float,
                 lexicon: Lexicon):
        self.tree = tree
        self.lm = lm
        self.lm_scale = lm_scale
        self._reachable = tree.reachable_word_ends()
        # unique first syntactic token per lemma (unigram-style lookahead)
        self._tokens = []
        self._lemma_ids = []
        for lemma in lexicon.lemmas:
            toks = lemma.syntactic_tokens
            if toks:
                self._lemma_ids.append(lemma.id)
                self._tokens.append(toks[0])
        self._lemma_pos = {l: i for i, l in enumerate(self._lemma_ids)}
        # tree compression (reference lookahead network compression):
        # nodes with the same reachable-lemma set share one lookahead
        # class — single-word tails collapse, tables shrink from
        # n_nodes to n_classes entries
        sig: Dict[frozenset, int] = {}
        self._class_of = np.zeros(len(self._reachable), dtype=np.int32)
        self._class_idx: List[np.ndarray] = []
        for node, lemmas in enumerate(self._reachable):
            key = frozenset(int(l) for l in lemmas)
            cid = sig.get(key)
            if cid is None:
                cid = len(self._class_idx)
                sig[key] = cid
                self._class_idx.append(np.asarray(
                    [self._lemma_pos[l] for l in sorted(key)
                     if l in self._lemma_pos], dtype=np.int32))
            self._class_of[node] = cid
        self.n_classes = len(self._class_idx)
        # flattened per-class member lists for one-shot reduceat fills
        nonempty = [cid for cid, idx in enumerate(self._class_idx)
                    if len(idx)]
        self._ne_classes = np.asarray(nonempty, dtype=np.int64)
        self._ne_perm = (np.concatenate(
            [self._class_idx[c] for c in nonempty])
            if nonempty else np.zeros(0, np.int64))
        sizes = [len(self._class_idx[c]) for c in nonempty]
        self._ne_starts = np.cumsum([0] + sizes[:-1]).astype(np.int64) \
            if nonempty else np.zeros(0, np.int64)
        self._cache: Dict[tuple, np.ndarray] = {}

    def table(self, history: tuple) -> np.ndarray:
        """Per-class lookahead scores (n_classes,) for one LM history —
        one vectorized LM query + one segmented min (reference: cached
        table fill, src/Search/LanguageModelLookahead.cc)."""
        t = self._cache.get(history)
        if t is None:
            scores = self.lm_scale * self.lm.score_batch(
                [history], self._tokens)[0]                 # (n_lemmas,)
            t = np.zeros(self.n_classes, dtype=np.float32)
            if len(self._ne_perm):
                t[self._ne_classes] = np.minimum.reduceat(
                    scores[self._ne_perm], self._ne_starts)
            self._cache[history] = t
        return t

    def score(self, node: int, history: tuple) -> float:
        return float(self.table(history)[self._class_of[node]])

    def cleanup(self, keep_histories) -> None:
        keep = set(keep_histories)
        self._cache = {h: t for h, t in self._cache.items() if h in keep}


@dataclass
class TreeHypothesis:
    node: int
    context: ScoringContext
    lm_history: tuple
    score: float = 0.0
    last_label: int = -1
    is_blank_last: bool = True
    trace: int = -1            # word-end trace arena index
    word_start: int = 0        # frame the in-progress word started at
    boundary_score: float = 0.0  # total score at the last word end
    traceback: Tuple[TracebackItem, ...] = ()


class WordTrace:
    """Word-end traceback arena shared by all hypotheses (reference
    Trace.hh:53): entry = (parent, lemma, t0, t1, total score, am delta,
    scaled lm score). Word sequences are read by walking parents; the
    time-stamped lattice is the arena DAG itself."""

    def __init__(self):
        self.parent: list = []
        self.lemma: list = []
        self.t0: list = []
        self.t1: list = []
        self.score: list = []
        self.am: list = []
        self.lm: list = []

    def add(self, parent, lemma, t0, t1, score, am, lm) -> int:
        self.parent.append(parent)
        self.lemma.append(lemma)
        self.t0.append(t0)
        self.t1.append(t1)
        self.score.append(score)
        self.am.append(am)
        self.lm.append(lm)
        return len(self.parent) - 1

    def words(self, idx: int):
        out = []
        while idx >= 0:
            out.append(self.lemma[idx])
            idx = self.parent[idx]
        return out[::-1]

    def items(self, idx: int):
        """(lemma, t0, t1) triples from sentence start."""
        out = []
        while idx >= 0:
            out.append((self.lemma[idx], self.t0[idx], self.t1[idx]))
            idx = self.parent[idx]
        return out[::-1]

    def __len__(self):
        return len(self.parent)


class TreeTimesyncBeamSearch:
    """SearchAlgorithmV2-compatible lexicon-constrained search."""

    def __init__(self, scorer: LabelScorer, lexicon: Lexicon,
                 lm: Optional[LanguageModel] = None,
                 lm_scale: float = 1.0,
                 beam_size: int = 16,
                 word_end_beam_size: Optional[int] = None,
                 score_threshold: float = math.inf,
                 blank_index: int = 0,
                 collapse_repeated: bool = True,
                 token_of_phoneme=None,
                 sentence_end_fallback: bool = True,
                 lm_lookahead: bool = False):
        self.scorer = scorer
        self.lexicon = lexicon
        self.tree = PrefixTree(lexicon, token_of_phoneme=token_of_phoneme)
        self.lm = lm
        self.lm_scale = lm_scale
        self.lookahead = (LmLookahead(self.tree, lm, lm_scale, lexicon)
                          if (lm_lookahead and lm is not None) else None)
        self.beam_size = beam_size
        self.word_end_beam = word_end_beam_size or beam_size
        self.score_threshold = score_threshold
        self.blank = blank_index
        self.collapse_repeated = collapse_repeated
        self.sentence_end_fallback = sentence_end_fallback
        self._orth_of_lemma = {l.id: l.preferred_orth
                               for l in lexicon.lemmas}
        from .statistics import SearchSpaceStatistics
        self.statistics = SearchSpaceStatistics()
        self.enter_segment()

    # -- segment control ------------------------------------------------------

    def set_language_model(self, lm, lm_scale: Optional[float] = None
                           ) -> None:
        """Swap the LM for the next segment (reference setGrammar —
        grammar-constrained recognition, src/Speech/Recognizer.cc:330);
        the lookahead table cache is LM-specific and is rebuilt only
        when one was configured and the new LM supports it."""
        self.lm = lm
        if lm_scale is not None:
            self.lm_scale = lm_scale
        self.lookahead = (LmLookahead(self.tree, lm, self.lm_scale,
                                      self.lexicon)
                          if (self.lookahead is not None and lm is not None
                              and hasattr(lm, "score_batch")) else None)
        self.enter_segment()

    def enter_segment(self) -> None:
        self.scorer.reset()
        h0 = TreeHypothesis(
            node=self.tree.root,
            context=self.scorer.get_initial_scoring_context(),
            lm_history=self.lm.initial_history() if self.lm else ())
        self._beam: List[TreeHypothesis] = [h0]
        self._step = 0
        self.arena = WordTrace()
        self.statistics.reset()

    def put_feature(self, feature) -> None:
        self.scorer.add_input(np.asarray(feature, dtype=np.float32))

    def put_features(self, features) -> None:
        self.scorer.add_inputs(np.asarray(features, dtype=np.float32))

    def finish_segment(self) -> None:
        self.scorer.signal_segment_end()
        self.decode_many_steps()

    # -- decoding ----------------------------------------------------------------

    def _lm_score(self, history, lemma_id: int) -> Tuple[float, tuple]:
        if self.lm is None:
            return 0.0, history
        lemma = self.lexicon.lemmas[lemma_id]
        score = 0.0
        h = history
        for tok in lemma.syntactic_tokens:
            score += self.lm_scale * self.lm.score(h, tok)
            h = self.lm.extended_history(h, tok)
        return score, h

    def decode_step(self) -> bool:
        scores = self.scorer.score_batch([h.context for h in self._beam])
        if scores is None:
            return False
        candidates: Dict[Tuple, TreeHypothesis] = {}

        def offer(h: TreeHypothesis):
            # recombination on (tree node, scoring context, LM history)
            # — the word sequence does NOT key (reference
            # TreeTimesyncBeamSearch recombination, doc/search_v2.rst);
            # merged-away alternatives stay reachable via the arena
            key = (h.node, h.context, h.lm_history,
                   h.last_label if not h.is_blank_last else -1)
            prev = candidates.get(key)
            if prev is None or h.score < prev.score:
                candidates[key] = h

        for bi, hyp in enumerate(self._beam):
            row = scores[bi]
            # blank: stay on node
            if self.blank >= 0:
                ttype = (TransitionType.BLANK_LOOP if hyp.is_blank_last
                         else TransitionType.LABEL_TO_BLANK)
                ctx = self.scorer.extended_scoring_context(
                    hyp.context, self.blank, ttype)
                offer(replace(hyp, context=ctx,
                              score=hyp.score + float(row[self.blank]),
                              is_blank_last=True))
            # label loop: repeat last label without advancing the tree
            if (self.collapse_repeated and not hyp.is_blank_last
                    and hyp.last_label >= 0):
                ctx = self.scorer.extended_scoring_context(
                    hyp.context, hyp.last_label, TransitionType.LABEL_LOOP)
                offer(replace(hyp, context=ctx,
                              score=hyp.score + float(row[hyp.last_label])))
            # tree successors: advance with a (new) label
            word_start = self._step if hyp.node == self.tree.root \
                else hyp.word_start
            for token, child in self.tree.successors(hyp.node).items():
                if token == self.blank:
                    continue
                if (self.collapse_repeated and not hyp.is_blank_last
                        and token == hyp.last_label):
                    continue  # would be a loop, handled above
                ttype = (TransitionType.BLANK_TO_LABEL if hyp.is_blank_last
                         else TransitionType.LABEL_TO_LABEL)
                ctx = self.scorer.extended_scoring_context(hyp.context, token,
                                                           ttype)
                new_score = hyp.score + float(row[token])
                tb = hyp.traceback + (TracebackItem(
                    token, new_score, self._step, self._step + 1),)
                advanced = replace(
                    hyp, node=child, context=ctx, score=new_score,
                    last_label=token, is_blank_last=False,
                    word_start=word_start, traceback=tb)
                offer(advanced)
                # word ends at the child: emit word(s), jump to root with
                # a time-stamped arena entry [word_start, step+1)
                for lemma_id, pron_score in self.tree.word_ends(child):
                    lm_s, new_hist = self._lm_score(hyp.lm_history, lemma_id)
                    we_score = new_score + pron_score + lm_s
                    tidx = self.arena.add(
                        hyp.trace, lemma_id, word_start, self._step + 1,
                        we_score, we_score - lm_s - hyp.boundary_score,
                        lm_s)
                    offer(replace(
                        advanced,
                        node=self.tree.root,
                        lm_history=new_hist,
                        score=we_score,
                        trace=tidx,
                        boundary_score=we_score))

        # prospect = score + LM lookahead (anticipated best word-end LM
        # cost below the node); pruning uses prospects, stored scores stay
        # raw (the reference's lookahead semantics)
        if self.lookahead is not None:
            def prospect(h):
                return h.score + self.lookahead.score(h.node, h.lm_history)
        else:
            def prospect(h):
                return h.score

        hyps = sorted(candidates.values(), key=prospect)
        if not hyps:
            return False
        stats = self.statistics
        stats.add("states before pruning", len(hyps))
        best = prospect(hyps[0])
        hyps = [h for h in hyps if prospect(h) <= best + self.score_threshold]
        # separate beams for within-word and word-end hypotheses
        word_end = [h for h in hyps if h.node == self.tree.root]
        in_word = [h for h in hyps if h.node != self.tree.root]
        stats.add("ending words before pruning", len(word_end))
        self._beam = sorted(word_end[:self.word_end_beam]
                            + in_word[:self.beam_size],
                            key=prospect)
        stats.add("states after pruning", len(self._beam))
        stats.add("ending words after pruning",
                  min(len(word_end), self.word_end_beam))
        stats.add("lm histories",
                  len({h.lm_history for h in self._beam}))
        if self.lookahead is not None:
            self.lookahead.cleanup({h.lm_history for h in self._beam})
        self._step += 1
        return True

    def decode_many_steps(self) -> int:
        steps = 0
        while self.decode_step():
            steps += 1
        return steps

    # -- results --------------------------------------------------------------

    def best(self) -> TreeHypothesis:
        done = [h for h in self._beam if h.node == self.tree.root]
        pool = done or self._beam
        if self.lm is not None and self.sentence_end_fallback:
            def final_score(h):
                return h.score + self.lm_scale * self.lm.sentence_end_score(
                    h.lm_history)
            return min(pool, key=final_score)
        return min(pool, key=lambda h: h.score)

    def get_current_best_labels(self) -> List[int]:
        return self.arena.words(self.best().trace)

    def get_current_best_words(self) -> List[str]:
        return [self._orth_of_lemma.get(w, f"<{w}>")
                for w in self.arena.words(self.best().trace)]

    def get_current_best_word_boundaries(self) -> List[Tuple[int, int, int]]:
        """(lemma, start frame, end frame) of the current best sentence."""
        return self.arena.items(self.best().trace)

    def get_current_best_traceback(self) -> List[TracebackItem]:
        return list(self.best().traceback)

    def n_best(self, n: int) -> List[TreeHypothesis]:
        return sorted(self._beam, key=lambda h: h.score)[:n]

    def recognize_segment(self, features) -> List[str]:
        self.enter_segment()
        self.put_features(features)
        self.finish_segment()
        return self.get_current_best_words()

    def create_lattice(self):
        """Time-stamped word lattice from the traceback arena: arcs are
        word-end entries with [t0, t1) spans and split am/lm scores
        (reference TreeTimesyncBeamSearch lattice output); finals are the
        traces of completed hypotheses in the final beam."""
        from ..lattice.word_lattice import WordLattice
        final_traces = sorted({h.trace for h in self._beam
                               if h.node == self.tree.root and h.trace >= 0})
        if not final_traces:
            final_traces = sorted({h.trace for h in self._beam
                                   if h.trace >= 0})
        lat = WordLattice(words=self._orth_of_lemma)
        state_of: Dict[int, int] = {}

        def state(tidx: int) -> int:
            if tidx not in state_of:
                frame = 0 if tidx < 0 else self.arena.t1[tidx]
                state_of[tidx] = lat.add_state(frame)
            return state_of[tidx]

        lat.initial = state(-1)
        seen = set()
        stack = list(final_traces)
        while stack:
            t = stack.pop()
            if t < 0 or t in seen:
                continue
            seen.add(t)
            stack.append(self.arena.parent[t])
        lm_scale = self.lm_scale if self.lm_scale else 1.0
        for t in sorted(seen):
            lat.add_arc(state(self.arena.parent[t]), state(t),
                        self.arena.lemma[t],
                        am_score=self.arena.am[t],
                        lm_score=self.arena.lm[t] / lm_scale)
        for t in final_traces:
            lat.set_final(state(t), 0.0)
        return lat
