"""Word-conditioned HMM tree search (the classic decoder).

Re-creation of the reference AdvancedTreeSearch
(src/Search/AdvancedTreeSearch/AdvancedTreeSearch.cc:242-282 per-frame
feed loop: startNewTrees -> expandHmm -> pruneAndAddScores -> findWordEnds;
SearchSpace with per-LM-history tree instances), redesigned for TPU:

  * ALL emission scores for a segment are computed in one device call
    (GmmScorer GEMM or NN posteriors) -> (T, S) matrix; the host loop never
    touches the device again (the reference interleaves per-frame scorer
    calls with pointer chasing);
  * the lexical prefix tree is flattened into a static HMM-state network
    (reference StateTree, src/Search/StateTree.hh:42) and the beam lives
    in structure-of-arrays numpy vectors (reference SearchSpaceHelpers.hh:84
    StateHypothesis arrays) — per-frame expansion, recombination and
    pruning are vectorized, no per-hypothesis Python objects;
  * hypotheses recombine on (network state, LM history) — the word
    sequence is NOT part of the key (reference SearchSpace.hh:302-455
    recombination); word identities live in a traceback arena of
    word-end entries (reference Trace refs, Trace.hh:53) from which the
    best sentence and the word lattice are read out;
  * TDP loop/forward/skip/exit penalties per state class, word-end LM
    application with per-(history, lemma) caching, beam + score-threshold
    + word-end beam pruning.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..am.acoustic_model import AcousticModel, INFINITY
from ..am.allophone import allophones_of_pronunciation
from ..bliss.lexicon import Lexicon
from ..lm.arpa import LanguageModel


@dataclass
class HmmTreeNode:
    """One phoneme segment in the lexical tree: its HMM emission classes,
    TDPs, children keyed by phoneme id, and word ends."""
    phoneme: int = 0
    emissions: Tuple[int, ...] = ()
    is_silence: bool = False
    children: Dict = field(default_factory=dict)
    # word_ends: (lemma id, pron score, re-entry group, can_close)
    word_ends: List[Tuple[int, float, int, bool]] = \
        field(default_factory=list)


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
                    # key by (phoneme, EMISSION CLASSES), not the bare
                    # phoneme: with context-dependent tying, words
                    # sharing a phoneme prefix can still differ in the
                    # last shared phoneme's RIGHT context (b{a+c} vs
                    # b{a+d}) — a phoneme-keyed tree would collapse
                    # them onto one node's emissions.  Keying on the
                    # tied classes keeps full sharing under monophone
                    # tying (same classes -> same node) while splitting
                    # exactly where the tying distinguishes contexts
                    # (the reference's minimized tree builder merges on
                    # equal state sequences, src/Search/TreeBuilder.hh)
                    is_sil = am.is_silence_phoneme(pid)
                    n_states = am.topology.n_states(is_sil)
                    reps = am.topology.state_repetitions
                    emissions = tuple(
                        am.state_tying.emission_index(allo, s // reps)
                        for s in range(n_states))
                    key = (pid, emissions)
                    nxt = self.nodes[node].children.get(key)
                    if nxt is None:
                        nxt = len(self.nodes)
                        self.nodes.append(HmmTreeNode(
                            phoneme=pid, emissions=emissions,
                            is_silence=is_sil))
                        self.nodes[node].children[key] = nxt
                    node = nxt
                self.nodes[node].word_ends.append(
                    (lemma.id, lp.score, 0, True))

    @property
    def root(self) -> int:
        return 0

    @property
    def entry_groups(self) -> List[List[int]]:
        # one unconstrained group: monophone trees have no
        # across-word coarticulation
        return [sorted(self.nodes[0].children.values())]


def _csr(rows: List[List[int]]) -> Tuple[np.ndarray, np.ndarray]:
    """offsets (n+1,), flat values."""
    off = np.zeros(len(rows) + 1, np.int64)
    for i, r in enumerate(rows):
        off[i + 1] = off[i] + len(r)
    flat = np.asarray([v for r in rows for v in r], np.int64)
    return off, flat


def _csr_expand(off: np.ndarray, flat: np.ndarray, rows: np.ndarray
                ) -> Tuple[np.ndarray, np.ndarray]:
    """Gather variable-length CSR rows: returns (owner_index, values) where
    owner_index[i] tells which input row values[i] came from."""
    starts = off[rows]
    counts = (off[rows + 1] - starts).astype(np.int64)
    total = int(counts.sum())
    if total == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    owners = np.repeat(np.arange(len(rows), dtype=np.int64), counts)
    # flat positions: starts[owner] + within-row offset
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(counts) - counts, counts)
    return owners, flat[np.repeat(starts, counts) + within]


class StateNetwork:
    """Flattened HMM-state network over the lexical prefix tree with
    per-state TDP penalties (reference StateTree + TransitionModel::apply,
    src/Am/TransitionModel.hh:70)."""

    def __init__(self, tree: HmmPrefixTree, am: AcousticModel):
        self.tree = tree
        nodes = tree.nodes
        n_nodes = len(nodes)
        first = np.zeros(n_nodes, np.int64)
        n_states = np.zeros(n_nodes, np.int64)
        s = 0
        for i in range(1, n_nodes):
            first[i] = s
            n_states[i] = len(nodes[i].emissions)
            s += n_states[i]
        S = s
        self.n_states = S
        self.first = first
        emis = np.zeros(S, np.int64)
        node_of = np.zeros(S, np.int64)
        pos = np.zeros(S, np.int64)
        sil = np.zeros(S, bool)
        for i in range(1, n_nodes):
            f, n = first[i], n_states[i]
            emis[f:f + n] = nodes[i].emissions
            node_of[f:f + n] = i
            pos[f:f + n] = np.arange(n)
            sil[f:f + n] = nodes[i].is_silence
        self.emis = emis
        self.node_of = node_of
        tdp_sp = am.transitions.tdp_for(False)
        tdp_si = am.transitions.tdp_for(True)
        self.loop_pen = np.where(sil, tdp_si.loop, tdp_sp.loop
                                 ).astype(np.float64)
        fwd = np.where(sil, tdp_si.forward, tdp_sp.forward)
        skp = np.where(sil, tdp_si.skip, tdp_sp.skip)
        self.exit_pen = np.where(sil, tdp_si.exit, tdp_sp.exit
                                 ).astype(np.float64)
        last = pos == (n_states[node_of] - 1)
        last2 = pos == (n_states[node_of] - 2)
        self.fwd_in = (~last) & (fwd < INFINITY)
        self.fwd_pen = fwd.astype(np.float64)
        self.skip_in = (pos + 2 < n_states[node_of]) & (skp < INFINITY)
        self.skip_pen = skp.astype(np.float64)
        self.exit_fwd = last & (fwd < INFINITY)
        self.exit_skip = last2 & (skp < INFINITY)
        self.loop_ok = self.loop_pen < INFINITY
        # children CSR: per tree node, first states of child nodes
        child_rows = [[int(first[c]) for c in nodes[i].children.values()]
                      for i in range(n_nodes)]
        self.child_off, self.child_flat = _csr(child_rows)
        # word-end CSR: per tree node, (lemma, pron score,
        # re-entry group, can_close) quadruples
        wl_rows = [[w[0] for w in nodes[i].word_ends]
                   for i in range(n_nodes)]
        self.wend_off, self.wend_lemma = _csr(wl_rows)
        # static position index over the word-end CSR (allocating this
        # per frame dominated the whole decode at 100k-word scale)
        self.wend_pos = np.arange(len(self.wend_lemma), dtype=np.int64)
        flat_wends = [w for i in range(n_nodes)
                      for w in nodes[i].word_ends]
        self.wend_pron = np.asarray([w[1] for w in flat_wends],
                                    np.float64)
        self.wend_group = np.asarray([w[2] for w in flat_wends],
                                     np.int64)
        self.wend_close = np.asarray([w[3] for w in flat_wends], bool)
        # re-entry tables: entry group id -> first states (reference
        # across-word transit entries; group 0 = utterance start)
        self.entry_group_states = [
            np.asarray([int(first[nid]) for nid in grp], np.int64)
            for grp in tree.entry_groups]
        self.entry_states = self.entry_group_states[0]


class _TraceArena:
    """Word-end traceback entries (reference Trace.hh:53): append-only
    parallel lists; each entry is one word hypothesis with time span and
    split am/lm scores, linked by parent index (-1 = sentence start)."""

    def __init__(self):
        self.parent: List[int] = []
        self.lemma: List[int] = []
        self.t0: List[int] = []
        self.t1: List[int] = []
        self.score: List[float] = []  # total path score at the word end
        self.am: List[float] = []     # acoustic+tdp+pron delta of the word
        self.lm: List[float] = []     # scaled LM score of the word
        self.hist: List[int] = []     # successor LM history id
        self.group: List[int] = []    # re-entry group (across-word ctx)

    def add(self, parent: int, lemma: int, t0: int, t1: int,
            score: float, am: float, lm: float, hist: int = 0,
            group: int = 0) -> int:
        self.parent.append(parent)
        self.lemma.append(lemma)
        self.t0.append(t0)
        self.t1.append(t1)
        self.score.append(score)
        self.am.append(am)
        self.lm.append(lm)
        self.hist.append(hist)
        self.group.append(group)
        return len(self.parent) - 1

    def extend(self, parents, lemmas, t0s, t1: int, scores, ams, lms,
               hists=None, groups=None) -> np.ndarray:
        """Bulk add (one per element); returns the new entry indices."""
        start = len(self.parent)
        self.parent.extend(np.asarray(parents, np.int64).tolist())
        self.lemma.extend(np.asarray(lemmas, np.int64).tolist())
        self.t0.extend(np.asarray(t0s, np.int64).tolist())
        n = len(self.parent) - start
        self.t1.extend([t1] * n)
        self.score.extend(np.asarray(scores, np.float64).tolist())
        self.am.extend(np.asarray(ams, np.float64).tolist())
        self.lm.extend(np.asarray(lms, np.float64).tolist())
        self.hist.extend([0] * n if hists is None
                         else np.asarray(hists, np.int64).tolist())
        self.group.extend([0] * n if groups is None
                          else np.asarray(groups, np.int64).tolist())
        return np.arange(start, start + n, dtype=np.int64)

    def words(self, idx: int) -> List[int]:
        out: List[int] = []
        while idx >= 0:
            out.append(self.lemma[idx])
            idx = self.parent[idx]
        return out[::-1]

    def __len__(self):
        return len(self.parent)


class DynamicBeamStrategy:
    """Frame-rate beam adaptation (reference: src/Search/
    AdvancedTreeSearch/DynamicBeamPruningStrategy.cc — there driven by
    decode-time targets; here by the machine-independent proxy, the
    active-hypothesis count): the score threshold tightens multiplicatively
    while the count exceeds `max_active` and relaxes back toward the
    configured base while it stays under `min_active`."""

    def __init__(self, base_threshold: float, min_active: int = 256,
                 max_active: int = 4096, shrink: float = 0.9,
                 grow: float = 1.05, floor_fraction: float = 0.25):
        self.base = base_threshold
        self.min_active = min_active
        self.max_active = max_active
        self.shrink = shrink
        self.grow = grow
        self.floor = base_threshold * floor_fraction
        self.reset()

    def reset(self) -> None:
        self._scale = 1.0

    def threshold(self, configured: float) -> float:
        base = min(self.base, configured)
        return max(base * self._scale, self.floor)

    def update(self, n_active: int) -> None:
        if n_active > self.max_active:
            self._scale = max(self._scale * self.shrink,
                              self.floor / max(self.base, 1e-9))
        elif n_active < self.min_active:
            self._scale = min(self._scale * self.grow, 1.0)


class WordConditionedTreeSearch:
    """feed() over a precomputed (T, S) emission score matrix."""

    def __init__(self, am: AcousticModel,
                 lm: Optional[LanguageModel] = None,
                 lm_scale: float = 1.0,
                 beam_size: int = 64,
                 word_end_beam_size: Optional[int] = None,
                 score_threshold: float = math.inf,
                 across_word: bool = False,
                 tree_image: Optional[str] = None,
                 acoustic_lookahead: int = 0,
                 acoustic_lookahead_scale: float = 0.5,
                 dynamic_beam: Optional["DynamicBeamStrategy"] = None,
                 use_native: bool = True,
                 lm_lookahead: bool = False,
                 lm_lookahead_history: int = 1,
                 lm_lookahead_slots: int = 32,
                 lm_lookahead_min_hyps: int = 1,
                 lm_lookahead_max_fills: int = 8,
                 lm_lookahead_depth: int = 0,
                 word_end_threshold: float = math.inf):
        """acoustic_lookahead: number of future frames whose (averaged)
        emission scores bias PRUNING decisions — hypotheses about to hit
        expensive acoustics are dropped earlier, like the reference's
        AcousticLookAhead (src/Search/AdvancedTreeSearch/
        AcousticLookAhead.cc) but computed from the already-batched score
        matrix instead of a downsampled second pass.  dynamic_beam: adapt
        the score threshold each frame to hold the active-hypothesis
        count inside a target band (DynamicBeamPruningStrategy.cc adapts
        on decode-time pressure; hypothesis count is its machine-
        independent proxy)."""
        self.am = am
        if across_word or tree_image:
            # minimized HMM-state tree with across-word coarticulation
            # (reference MinimizedTreeBuilder + PersistentStateTree)
            from .tree_builder import build_tree
            self.tree = build_tree(am, across_word=across_word,
                                   image_path=tree_image)
        else:
            self.tree = HmmPrefixTree(am)
        self.net = StateNetwork(self.tree, am)
        self.lm = lm
        self.lm_scale = lm_scale
        self.beam_size = beam_size
        self.word_end_beam = word_end_beam_size or max(beam_size // 2, 8)
        self.score_threshold = score_threshold
        self.word_end_threshold = word_end_threshold
        # LM lookahead (reference LanguageModelLookahead.cc): per-history
        # min-LM tables over the compressed tree bias the pruning score
        self._lmla = None
        if lm_lookahead and lm is not None \
                and hasattr(lm, "score_dense") and hasattr(lm, "token_id"):
            from .lm_lookahead import LmLookahead
            self._lmla = LmLookahead(
                self.tree, self.net, am.lexicon, lm, lm_scale,
                history_limit=lm_lookahead_history,
                max_slots=lm_lookahead_slots,
                min_hyps=lm_lookahead_min_hyps,
                max_fills_per_frame=lm_lookahead_max_fills,
                depth_limit=lm_lookahead_depth)
        self.acoustic_lookahead = int(acoustic_lookahead)
        self.acoustic_lookahead_scale = acoustic_lookahead_scale
        self.dynamic_beam = dynamic_beam
        self._la: Optional[np.ndarray] = None  # (T, S) lookahead table
        self._orth = {l.id: l.preferred_orth for l in am.lexicon.lemmas}
        # flattened entry-group CSR (built lazily for the word-end fan-out)
        self._entry_off: Optional[np.ndarray] = None
        self._entry_flat: Optional[np.ndarray] = None
        # word-end LM transition cache: (hist_id, lemma) -> (score, hist_id)
        self._lm_cache: Dict[Tuple[int, int], Tuple[float, int]] = {}
        # dense word-end scoring (trie all-words rows, LRU-cached per
        # history): exact batched LM application for every ending word in
        # one gather — the scale path for big lexica (the reference
        # batches word-end LM requests: Lm compileBatchRequest/getBatch)
        self._lm_dense_ok = (lm is not None and hasattr(lm, "score_dense")
                             and hasattr(lm, "token_id"))
        if self._lm_dense_ok:
            from collections import OrderedDict
            self._dense_cache: "OrderedDict[tuple, np.ndarray]" = \
                OrderedDict()
            self._dense_cache_cap = 128
            tid = lm.token_id
            toks = []
            for l in am.lexicon.lemmas:
                st = l.syntactic_tokens
                # single-token lemmata score via the dense row; empty
                # sequences (silence, -1) are 0; multi-token or OOV
                # (-2) fall back to the scalar cache
                if not st:
                    toks.append(-1)
                elif len(st) == 1 and tid(st[0]) >= 0:
                    toks.append(tid(st[0]))
                else:
                    toks.append(-2)
            self._lemma_token = np.asarray(toks, np.int64)
        # search-space-aware LM scheduling hook
        self._lm_aware = (
            lm is not None
            and getattr(type(lm), "set_search_space_info", None)
            not in (None, LanguageModel.set_search_space_info))
        # native expansion kernel (native/rasr_beam.cpp): fused
        # move/entry generation + recombination + pruning, the
        # reference's C++ hot core (SearchSpace.cc); numpy fallback.
        # Tie-breaking caveat: on *exactly equal* scores the native path
        # may keep a different hypothesis than numpy (first-offered in
        # interleaved loop/fwd/skip order vs blockwise lexsort; C++
        # nth_element vs np.argpartition at the histogram cut), so
        # decodes can differ across environments on score ties — both
        # orders are valid Viterbi recombinations with identical scores.
        self._native = None
        import os
        if use_native and os.environ.get("RASR_NATIVE_BEAM", "1") != "0":
            try:
                from .native_beam import NativeBeam
                self._native = NativeBeam(self.net)
            except Exception:
                self._native = None
        self.reset()

    def set_lm_scale(self, lm_scale: float) -> None:
        """Retune the LM scale on the SAME search instance: clears the
        scale-dependent caches (word-end LM rows, transition cache) and
        rescales the lookahead tables — tree, state network and
        lookahead structure are scale-independent, so tuning loops skip
        the expensive rebuild."""
        self.lm_scale = float(lm_scale)
        self._lm_cache.clear()
        if hasattr(self, "_ext_cache"):
            self._ext_cache.clear()
        if self._lm_dense_ok:
            self._dense_cache.clear()
        if self._lmla is not None:
            self._lmla.set_scale(lm_scale)
        self.reset()

    def set_language_model(self, lm, lm_scale: Optional[float] = None
                           ) -> None:
        """Swap the LM for the next segment (reference setGrammar:
        grammar-constrained recognition swaps a per-segment grammar FSA
        in, src/Speech/Recognizer.cc:330-397).  Dense word-end scoring
        and LM lookahead re-enable automatically when the new LM
        supports them (score_dense/token_id); grammar FSA LMs take the
        exact scalar path."""
        self.lm = lm
        if lm_scale is not None:
            self.lm_scale = lm_scale
        self._lm_dense_ok = (lm is not None and hasattr(lm, "score_dense")
                             and hasattr(lm, "token_id"))
        if self._lm_dense_ok:
            from collections import OrderedDict
            self._dense_cache = OrderedDict()
            self._dense_cache_cap = 128
            tid = lm.token_id
            toks = []
            for l in self.am.lexicon.lemmas:
                st = l.syntactic_tokens
                if not st:
                    toks.append(-1)
                elif len(st) == 1 and tid(st[0]) >= 0:
                    toks.append(tid(st[0]))
                else:
                    toks.append(-2)
            self._lemma_token = np.asarray(toks, np.int64)
        # lookahead tables are LM-specific; drop them (a grammar swap
        # rarely benefits — the constrained space is tiny)
        self._lmla = None
        self.reset()

    def reset(self) -> None:
        if not hasattr(self, "statistics"):
            from .statistics import SearchSpaceStatistics
            self.statistics = SearchSpaceStatistics()
        self.statistics.reset()
        self._hist_list: List[tuple] = [
            self.lm.initial_history() if self.lm else ()]
        self._hist_index: Dict[tuple, int] = {self._hist_list[0]: 0}
        # interned lookahead-history id per hist id (amortized-growth
        # array: the per-frame hist->slot map is one vectorized gather)
        if self._lmla is not None:
            self._hist_la_arr = np.zeros(256, np.int64)
            self._hist_la_arr[0] = self._lmla.intern(
                self._lmla.lookahead_history(self._hist_list[0]))
        self.arena = _TraceArena()
        self._lm_cache.clear()
        # int keys (hist_id * n_lemmas + lemma_id): cheaper to hash than
        # tuples on the per-word-end lookup path
        self._ext_cache: Dict[int, int] = {}
        self._n_lemmas = max(len(self.am.lexicon.lemmas), 1)
        # SoA beam (empty until the first feed enters the tree)
        self._b_state = np.zeros(0, np.int64)
        self._b_hist = np.zeros(0, np.int64)
        self._b_score = np.zeros(0, np.float64)
        self._b_trace = np.zeros(0, np.int64)
        self._b_bframe = np.zeros(0, np.int64)   # last word-boundary frame
        self._b_bscore = np.zeros(0, np.float64)  # total score at boundary
        self._t = 0

    # -- LM ---------------------------------------------------------------------

    def _hist_id(self, h: tuple) -> int:
        i = self._hist_index.get(h)
        if i is None:
            i = len(self._hist_list)
            self._hist_index[h] = i
            self._hist_list.append(h)
            if self._lmla is not None:
                if i >= len(self._hist_la_arr):
                    grown = np.zeros(2 * len(self._hist_la_arr), np.int64)
                    grown[:len(self._hist_la_arr)] = self._hist_la_arr
                    self._hist_la_arr = grown
                self._hist_la_arr[i] = self._lmla.intern(
                    self._lmla.lookahead_history(h))
        return i

    def _lm_la_arrays(self):
        """(pool, hist->slot, state->la-node) for the current hist list,
        or None; the slot map is a single vectorized gather."""
        la = self._lmla
        if la is None:
            return None
        n = len(self._hist_list)
        slot_arr = la.slot_of_id[self._hist_la_arr[:n]]
        return la.pool, slot_arr, la.la_of_state

    def _lm_extend(self, hist_id: int, lemma_id: int
                   ) -> Tuple[float, int]:
        """Scaled LM score + successor history for appending one lemma."""
        if self.lm is None:
            return 0.0, hist_id
        key = (hist_id, lemma_id)
        hit = self._lm_cache.get(key)
        if hit is not None:
            return hit
        lemma = self.am.lexicon.lemmas[lemma_id]
        score, h = 0.0, self._hist_list[hist_id]
        for tok in lemma.syntactic_tokens:
            score += self.lm_scale * self.lm.score(h, tok)
            h = self.lm.extended_history(h, tok)
        out = (score, self._hist_id(h))
        self._lm_cache[key] = out
        return out

    def _extend_hist(self, hist_id: int, lemma_id: int) -> int:
        """Successor history id only (no score) — cached separately so
        the dense word-end path never recomputes scalar LM scores."""
        key = hist_id * self._n_lemmas + lemma_id
        hit = self._ext_cache.get(key)
        if hit is not None:
            return hit
        h = self._hist_list[hist_id]
        for tok in self.am.lexicon.lemmas[lemma_id].syntactic_tokens:
            h = self.lm.extended_history(h, tok)
        out = self._hist_id(h)
        self._ext_cache[key] = out
        return out

    def _dense_row(self, hist_id: int) -> np.ndarray:
        """Scaled dense LM row for a history (LRU across segments)."""
        h = self._hist_list[hist_id]
        row = self._dense_cache.get(h)
        if row is None:
            row = (self.lm_scale
                   * self.lm.score_dense(h)).astype(np.float32)
            self._dense_cache[h] = row
            if len(self._dense_cache) > self._dense_cache_cap:
                self._dense_cache.popitem(last=False)
        else:
            self._dense_cache.move_to_end(h)
        return row

    # -- per-frame expansion ---------------------------------------------------

    def feed(self, frame_scores: np.ndarray) -> None:
        """One time-synchronous step with emission scores (S_emissions,)."""
        net = self.net
        frame = np.asarray(frame_scores, np.float64)
        cs, ch, cc, ct, cb, cbs = [], [], [], [], [], []

        def emit(states, hists, scores, traces, bframes, bscores):
            if len(states):
                cs.append(states)
                ch.append(hists)
                cc.append(scores)
                ct.append(traces)
                cb.append(bframes)
                cbs.append(bscores)

        if self._t == 0 and len(self._b_state) == 0:
            n = len(net.entry_states)
            emit(net.entry_states, np.zeros(n, np.int64),
                 np.zeros(n, np.float64), np.full(n, -1, np.int64),
                 np.zeros(n, np.int64), np.zeros(n, np.float64))

        st, hi, sc = self._b_state, self._b_hist, self._b_score
        tr, bf, bs = self._b_trace, self._b_bframe, self._b_bscore
        native = self._native
        if self._lm_aware and len(hi):
            # search-space-aware LM hook (reference
            # src/Lm/SearchSpaceAwareLanguageModel.hh:38): per-frame
            # hypothesis statistics for the LM's batch scheduling
            self.lm.set_search_space_info({
                "frame": self._t,
                "active_states": int(len(st)),
                "active_histories": int(len(np.unique(hi)))})
        if self._lmla is not None and len(hi):
            # lookahead laziness: fill tables for the lookahead histories
            # whose instances hold enough hypotheses this frame
            self._lmla.activate_ids(self._hist_la_arr[hi])
        exits = None
        if len(st):
            if native is None:
                # within-node moves (vectorized masks over the beam);
                # the native kernel generates these itself
                m = net.loop_ok[st]
                emit(st[m], hi[m], sc[m] + net.loop_pen[st[m]], tr[m],
                     bf[m], bs[m])
                m = net.fwd_in[st]
                emit(st[m] + 1, hi[m], sc[m] + net.fwd_pen[st[m]], tr[m],
                     bf[m], bs[m])
                m = net.skip_in[st]
                emit(st[m] + 2, hi[m], sc[m] + net.skip_pen[st[m]], tr[m],
                     bf[m], bs[m])
            # node exits (forward off the last state / skip off the
            # second-to-last)
            ex_sc, ex_nd, ex_hi, ex_tr, ex_bf, ex_bs = [], [], [], [], [], []
            for mask, pen in ((net.exit_fwd[st], net.fwd_pen),
                              (net.exit_skip[st], net.skip_pen)):
                if mask.any():
                    ex_sc.append(sc[mask] + pen[st[mask]])
                    ex_nd.append(net.node_of[st[mask]])
                    ex_hi.append(hi[mask])
                    ex_tr.append(tr[mask])
                    ex_bf.append(bf[mask])
                    ex_bs.append(bs[mask])
            if ex_sc:
                e_sc = np.concatenate(ex_sc)
                e_nd = np.concatenate(ex_nd)
                e_hi = np.concatenate(ex_hi)
                e_tr = np.concatenate(ex_tr)
                e_bf = np.concatenate(ex_bf)
                e_bs = np.concatenate(ex_bs)
                if native is None:
                    # entries into child nodes (within-word continuation)
                    own, states = _csr_expand(net.child_off,
                                              net.child_flat, e_nd)
                    emit(states, e_hi[own], e_sc[own], e_tr[own],
                         e_bf[own], e_bs[own])
                else:
                    exits = (e_nd, e_hi, e_sc, e_tr, e_bf, e_bs)
                # word ends
                self._word_ends(e_sc, e_nd, e_hi, e_tr, e_bf, e_bs, emit)

        if native is not None:
            self._feed_native(cs, ch, cc, ct, cb, cbs, exits, frame,
                              len(st))
            return

        if not cs:
            self._t += 1
            return
        a_state = np.concatenate(cs)
        a_hist = np.concatenate(ch)
        a_score = np.concatenate(cc) + frame[net.emis[a_state]]
        a_trace = np.concatenate(ct)
        a_bf = np.concatenate(cb)
        a_bs = np.concatenate(cbs)

        # recombination on (state, LM history): keep the best per pair
        # (reference SearchSpace.hh:302-455 — word sequences do NOT key)
        H = len(self._hist_list)
        key = a_state * H + a_hist
        order = np.lexsort((a_score, key))
        key_sorted = key[order]
        first = np.ones(len(order), bool)
        first[1:] = key_sorted[1:] != key_sorted[:-1]
        keep = order[first]
        stats = self.statistics
        stats.add("states before pruning", len(a_state))

        a_state, a_hist = a_state[keep], a_hist[keep]
        a_score, a_trace = a_score[keep], a_trace[keep]
        a_bf, a_bs = a_bf[keep], a_bs[keep]

        # pruning: score threshold + histogram/beam; the pruning score may
        # carry an acoustic-lookahead bias (future emission cost), which
        # never touches the true hypothesis score
        prune_score = a_score
        if self._la is not None and self._t + 1 < len(self._la):
            prune_score = a_score + self.acoustic_lookahead_scale \
                * self._la[self._t + 1][net.emis[a_state]]
        lm_la = self._lm_la_arrays()
        if lm_la is not None:
            pool, slot_arr, la_map = lm_la
            prune_score = prune_score + pool[slot_arr[a_hist],
                                             la_map[a_state]]
        threshold = self.score_threshold
        if self.dynamic_beam is not None:
            threshold = self.dynamic_beam.threshold(self.score_threshold)
        best = float(prune_score.min())
        m = prune_score <= best + threshold
        if m.sum() > self.beam_size:
            idx = np.flatnonzero(m)
            part = np.argpartition(prune_score[idx], self.beam_size - 1)
            sel = idx[part[:self.beam_size]]
        else:
            sel = np.flatnonzero(m)
        if self.dynamic_beam is not None:
            self.dynamic_beam.update(int(m.sum()))
        self._b_state, self._b_hist = a_state[sel], a_hist[sel]
        self._b_score, self._b_trace = a_score[sel], a_trace[sel]
        self._b_bframe, self._b_bscore = a_bf[sel], a_bs[sel]
        stats.add("states after pruning", len(sel))
        stats.add("trees after pruning", len(np.unique(self._b_hist)))
        self._t += 1

    def _feed_native(self, cs, ch, cc, ct, cb, cbs, exits, frame,
                     n_beam: int) -> None:
        """Native-kernel tail of feed(): injected candidates are whatever
        Python emitted (utterance-start entries + word-end re-entries);
        moves and child entries are generated inside the kernel."""
        if cs:
            inj = (np.concatenate(cs), np.concatenate(ch),
                   np.concatenate(cc), np.concatenate(ct),
                   np.concatenate(cb), np.concatenate(cbs))
        else:
            inj = (np.zeros(0, np.int64), np.zeros(0, np.int64),
                   np.zeros(0, np.float64), np.zeros(0, np.int64),
                   np.zeros(0, np.int64), np.zeros(0, np.float64))
        if n_beam == 0 and len(inj[0]) == 0 and exits is None:
            self._t += 1
            return
        la_row = None
        if self._la is not None and self._t + 1 < len(self._la):
            la_row = self._la[self._t + 1]
        threshold = self.score_threshold
        if self.dynamic_beam is not None:
            threshold = self.dynamic_beam.threshold(self.score_threshold)
        out = self._native.expand(
            (self._b_state, self._b_hist, self._b_score, self._b_trace,
             self._b_bframe, self._b_bscore),
            exits, inj, frame, la_row, self.acoustic_lookahead_scale,
            len(self._hist_list), threshold, self.beam_size,
            lm_la=self._lm_la_arrays())
        if out is None:
            self._t += 1
            return
        (self._b_state, self._b_hist, self._b_score, self._b_trace,
         self._b_bframe, self._b_bscore), stats = out
        self.statistics.add("states before pruning", stats[0])
        if self.dynamic_beam is not None:
            self.dynamic_beam.update(stats[2])
        self.statistics.add("states after pruning", len(self._b_state))
        self.statistics.add("trees after pruning",
                            len(np.unique(self._b_hist)))
        self._t += 1

    def _word_ends(self, e_sc, e_nd, e_hi, e_tr, e_bf, e_bs, emit) -> None:
        """Word-end handling for the exit set: LM application, word-end
        pruning, traceback arena entries, re-entry at the root children
        (reference findWordEnds -> pruneEarlyWordEnds).

        With LM lookahead active, the order is scale-hardened (reference
        pruneEarlyWordEnds BEFORE LM access): candidates are deduped and
        pruned on base + lookahead-estimated LM first, and the exact LM
        runs only over the surviving <= word_end_beam candidates, grouped
        by unique (history, lemma) pair."""
        net = self.net
        own, wpos = _csr_expand(net.wend_off, net.wend_pos, e_nd)
        if len(own) == 0:
            return
        lemmas = net.wend_lemma[wpos]
        prons = net.wend_pron[wpos]
        base = e_sc[own] + net.exit_pen[net.first[e_nd[own]]] + prons
        hists = e_hi[own]
        groups = net.wend_group[wpos]
        traces = e_tr[own]
        self.statistics.add("ending words before pruning", len(own))

        if self._lm_dense_ok:
            # -- early dedup on (trace, lemma, hist, group): the winner on
            # base is the winner on total, since the LM score is a
            # function of (hist, lemma) only
            order = np.lexsort((base, groups, hists, lemmas, traces))
            t_o, l_o = traces[order], lemmas[order]
            h_o, g_o = hists[order], groups[order]
            first = np.ones(len(order), bool)
            if len(order) > 1:
                first[1:] = ((t_o[1:] != t_o[:-1]) | (l_o[1:] != l_o[:-1])
                             | (h_o[1:] != h_o[:-1])
                             | (g_o[1:] != g_o[:-1]))
            idx0 = order[first]
            # -- EXACT LM for every deduped candidate: one cached dense
            # trie row per distinct history, gathered per lemma token
            # (the batched equivalent of the reference's word-end LM
            # requests — no estimate-based mispruning)
            hh, ll = hists[idx0], lemmas[idx0]
            tok = self._lemma_token[ll]
            lm_sel = np.zeros(len(idx0), np.float64)
            # group candidates by history once (argsort + boundaries)
            # instead of a full-length mask per unique history
            uh, inv = np.unique(hh, return_inverse=True)
            order_h = np.argsort(inv, kind="stable")
            bounds = np.searchsorted(inv[order_h],
                                     np.arange(len(uh) + 1))
            for k in range(len(uh)):
                grp = order_h[bounds[k]:bounds[k + 1]]
                val = grp[tok[grp] >= 0]
                if len(val):
                    lm_sel[val] = self._dense_row(int(uh[k]))[tok[val]]
            for i in np.flatnonzero(tok == -2):
                lm_sel[i], _ = self._lm_extend(int(hh[i]), int(ll[i]))
            total0 = base[idx0] + lm_sel
            # -- word-end pruning on exact totals
            keep = np.arange(len(idx0))
            if math.isfinite(self.word_end_threshold):
                keep = keep[total0 <= total0.min()
                            + self.word_end_threshold]
            if len(keep) > self.word_end_beam:
                part = np.argpartition(total0[keep],
                                       self.word_end_beam - 1
                                       )[:self.word_end_beam]
                keep = keep[part]
            idx = idx0[keep]
            lm_sel = lm_sel[keep]
            total_sel = total0[keep]
            self.statistics.add("ending words after pruning", len(idx))
            kp_sel, kl_sel = traces[idx], lemmas[idx]
            kg_sel = groups[idx]
            # bulk successor-history lookup: inline dict hits (the
            # common case), method call only on misses
            ext = self._ext_cache
            nl = self._n_lemmas
            kh_sel = np.fromiter(
                (hit if (hit := ext.get(h * nl + l)) is not None
                 else self._extend_hist(h, l)
                 for h, l in zip(hists[idx].tolist(),
                                 lemmas[idx].tolist())),
                np.int64, count=len(idx))
        else:
            # exact LM for every candidate (per-(history, lemma) cache)
            lm_s = np.zeros(len(own), np.float64)
            new_hist = hists.copy()
            for i in range(len(own)):
                s, h2 = self._lm_extend(int(hists[i]), int(lemmas[i]))
                lm_s[i] = s
                new_hist[i] = h2
            total = base + lm_s
            # word-end beam pruning
            if len(total) > self.word_end_beam:
                keep = np.argpartition(total, self.word_end_beam - 1
                                       )[:self.word_end_beam]
            else:
                keep = np.arange(len(total))
            self.statistics.add("ending words after pruning", len(keep))
            # arena entries; dedup (parent trace, lemma, successor
            # history, re-entry group) keeping the best score — the same
            # word ending with different across-word right contexts stays
            # distinct (vectorized lexsort + first-per-key, like the beam
            # recombination)
            kp = traces[keep]
            kl = lemmas[keep]
            kh = new_hist[keep]
            kg = groups[keep]
            order = np.lexsort((total[keep], kg, kh, kl, kp))
            kp_o, kl_o = kp[order], kl[order]
            kh_o, kg_o = kh[order], kg[order]
            first = np.ones(len(order), bool)
            if len(order) > 1:
                first[1:] = ((kp_o[1:] != kp_o[:-1])
                             | (kl_o[1:] != kl_o[:-1])
                             | (kh_o[1:] != kh_o[:-1])
                             | (kg_o[1:] != kg_o[:-1]))
            sel = order[first]       # positions within the keep array
            idx = keep[sel]          # positions within the word-end arrays
            kp_sel, kl_sel = kp[sel], kl[sel]
            kh_sel, kg_sel = kh[sel], kg[sel]
            lm_sel = lm_s[idx]
            total_sel = total[idx]
        if len(idx) == 0:
            return
        tidxs = self.arena.extend(
            kp_sel, kl_sel, e_bf[own[idx]], self._t, total_sel,
            base[idx] - e_bs[own[idx]], lm_sel,
            hists=kh_sel, groups=kg_sel)
        # fan each surviving word end into ITS entry group (reference
        # across-word transits: the next word must start with the
        # coarticulated right-context phoneme) — one CSR-vectorized emit
        # in group-ascending order (same concatenation order as the old
        # per-group loop, so native/numpy tie-breaking is unchanged)
        hsel, gsel, tsel = kh_sel, kg_sel, total_sel
        if self._entry_off is None:
            lens = [len(e) for e in net.entry_group_states]
            self._entry_off = np.concatenate(
                [[0], np.cumsum(lens)]).astype(np.int64)
            self._entry_flat = (
                np.concatenate(net.entry_group_states).astype(np.int64)
                if sum(lens) else np.zeros(0, np.int64))
        order_g = np.argsort(gsel, kind="stable")
        g_o = gsel[order_g]
        src, rep_states = _csr_expand(self._entry_off, self._entry_flat,
                                      g_o)
        if len(rep_states) == 0:
            return
        rep_hist = hsel[order_g][src]
        rep_score = tsel[order_g][src]
        rep_trace = tidxs[order_g][src]
        rep_bf = np.full(len(rep_states), self._t, np.int64)
        emit(rep_states, rep_hist, rep_score, rep_trace, rep_bf,
             rep_score.copy())

    # -- segment api --------------------------------------------------------------

    def set_lookahead_scores(self, scores: np.ndarray) -> None:
        """Precompute the acoustic-lookahead table from the full (T, S)
        emission matrix: la[t, s] = mean emission score of s over the next
        `acoustic_lookahead` frames (one cumsum — the batched equivalent
        of AcousticLookAhead.cc's sparse lookahead pass)."""
        if self.acoustic_lookahead <= 0:
            self._la = None
            return
        s = np.asarray(scores, np.float64)
        L = self.acoustic_lookahead
        c = np.concatenate([np.zeros((1,) + s.shape[1:]), np.cumsum(s, 0)])
        T = len(s)
        hi = np.minimum(np.arange(T) + L, T)
        lo = np.arange(T)
        count = np.maximum(hi - lo, 1).astype(np.float64)[:, None]
        self._la = (c[hi] - c[lo]) / count

    def recognize(self, scores: np.ndarray) -> List[str]:
        """scores: (T, S_emissions) emission score matrix (from GmmScorer
        or NN posteriors)."""
        self.reset()
        self.set_lookahead_scores(scores)
        if self.dynamic_beam is not None:
            self.dynamic_beam.reset()
        for t in range(scores.shape[0]):
            self.feed(scores[t])
        return self.best_words()

    def _final_candidates(self):
        """(score, trace, words_tail) per beam hyp that can close a word at
        the segment end; incomplete words carry a heavy penalty."""
        net = self.net
        out = []
        for i in range(len(self._b_state)):
            s = int(self._b_state[i])
            node = int(net.node_of[s])
            tree_node = self.tree.nodes[node]
            at_last = (s - int(net.first[node])) == \
                len(tree_node.emissions) - 1
            score = float(self._b_score[i])
            closable = [w for w in tree_node.word_ends if w[3]]
            if at_last and closable:
                # forced word end at segment end, incl. the TDP exit
                # penalty (as in-segment word ends get)
                exit_pen = float(net.exit_pen[s])
                lemma_id, pron = closable[0][0], closable[0][1]
                lm_s, nh = self._lm_extend(int(self._b_hist[i]), lemma_id)
                t0 = int(self._b_bframe[i])
                am_delta = score + exit_pen + pron - float(self._b_bscore[i])
                out.append((score + exit_pen + pron + lm_s,
                            int(self._b_trace[i]), lemma_id, t0,
                            am_delta, lm_s, nh))
            else:
                out.append((score + 1e6, int(self._b_trace[i]), -1, 0,
                            0.0, 0.0, int(self._b_hist[i])))
        return out

    def best(self) -> Tuple[List[int], float]:
        """(lemma id sequence, score) of the best closed hypothesis."""
        cands = self._final_candidates()
        if not cands:
            return [], math.inf
        if self.lm is not None:
            def fs(c):
                return c[0] + self.lm_scale * self.lm.sentence_end_score(
                    self._hist_list[c[6]])
        else:
            def fs(c):
                return c[0]
        bestc = min(cands, key=fs)
        words = self.arena.words(bestc[1])
        if bestc[2] >= 0:
            words.append(bestc[2])
        return words, bestc[0]

    def best_words(self) -> List[str]:
        words, _ = self.best()
        return [self._orth[w] for w in words
                if not self.am.lexicon.lemmas[w].special]

    def best_trace_items(self) -> List[Tuple[int, int, int, float]]:
        """(lemma, t0, t1, path score at the word end) of the best closed
        hypothesis, for traceback/CTM output."""
        cands = self._final_candidates()
        if not cands:
            return []
        bestc = min(cands, key=lambda c: c[0])
        out = []
        t = bestc[1]
        while t >= 0:
            out.append((self.arena.lemma[t], self.arena.t0[t],
                        self.arena.t1[t], self.arena.score[t]))
            t = self.arena.parent[t]
        out = out[::-1]
        if bestc[2] >= 0:
            out.append((bestc[2], bestc[3], self._t, bestc[0]))
        return out

    def create_lattice(self, time_quantum: int = 1):
        """Time-stamped word lattice from the traceback arena.

        time_quantum > 1 coarsens the recombination classes' time key to
        that many frames: word alternatives whose boundary times differ
        by a frame or two re-merge instead of staying parallel forever
        (a few frames of acoustic-score approximation on CROSSING paths
        only — the surviving best path is exact).  Rescoring passes use
        a small quantum for n-best diversity; 1 keeps exact boundaries.

        Lattice states are RECOMBINATION CLASSES (end frame, successor
        LM history, re-entry group): every pruned-in word end whose
        successor class coincides with a surviving path's becomes a
        genuine alternative arc, not just the single best-path ancestry
        — the reference's word-conditioned lattice construction, where
        word-boundary recombination keeps all incoming word ends as
        lattice arcs (doc/architecture.rst:563-575, Trace refs).  Arcs
        carry the word's acoustic delta and unscaled LM score over its
        [t0, t1) span — the format lattice rescoring and sequence
        training consume."""
        from ..lattice.word_lattice import WordLattice
        ar = self.arena
        # segment-final closures become arena entries too
        final_traces: List[int] = []
        for (score, trace, lemma, t0, am_d, lm_s, nh) in \
                self._final_candidates():
            if lemma >= 0:
                tidx = ar.add(trace, lemma, t0, self._t, score, am_d,
                              lm_s, hist=nh, group=0)
                final_traces.append(tidx)
        if not final_traces:
            # no closed word at the end: accept the last boundaries
            final_traces = [int(t) for t in self._b_trace if t >= 0]
        n = len(ar.parent)
        INIT = (-1, -1, -1)

        # word-pair approximation (the classic word-conditioned lattice
        # construction): the recombination class keeps only the LAST LM
        # word of the successor history, so paths re-merge one word
        # after diverging instead of only after a full n-gram context
        # ages out (which a pruned beam rarely survives).  The best path
        # stays exact; crossing paths carry each arc's true
        # search-time LM score.
        red: Dict[int, object] = {}
        for h in set(ar.hist):
            tup = self._hist_list[h] if h < len(self._hist_list) else ()
            red[h] = tup[-1] if tup else None

        q = max(int(time_quantum), 1)

        def cls_of(e: int):
            """Recombination class of entry e.  With q > 1, an entry
            whose PARENT falls in the same time bucket takes an
            exact-time class instead: word boundaries strictly increase
            along paths, so bucketed classes order by bucket, exact
            classes by frame, and mixed arcs still move forward in time
            — the quantized lattice stays acyclic and repeated words
            keep their arcs."""
            b = ar.t1[e] // q
            p = ar.parent[e]
            if q > 1 and p >= 0 and ar.t1[p] // q == b:
                return (ar.t1[e], red[ar.hist[e]], ar.group[e], "x")
            return (b, red[ar.hist[e]], ar.group[e])

        entries_of: Dict[tuple, List[int]] = {}
        for e in range(n):
            entries_of.setdefault(cls_of(e), []).append(e)

        # backward closure from the final classes: a class pulls in ALL
        # word ends that recombined into it, each contributing an arc
        # from its parent's class
        keep: set = set()
        arcs: List[Tuple[tuple, tuple, int]] = []
        stack = [cls_of(t) for t in final_traces]
        while stack:
            c = stack.pop()
            if c in keep:
                continue
            keep.add(c)
            for e in entries_of.get(c, []):
                p = ar.parent[e]
                pc = INIT if p < 0 else cls_of(p)
                arcs.append((pc, c, e))
                if pc != INIT and pc not in keep:
                    stack.append(pc)

        lat = WordLattice(words=self._orth)
        sid: Dict[tuple, int] = {}

        def state(c: tuple) -> int:
            if c not in sid:
                if c == INIT:
                    frame = 0
                elif len(c) == 4:          # exact-time self-loop split
                    frame = c[0]
                else:
                    frame = c[0] * q
                sid[c] = lat.add_state(frame)
            return sid[c]

        lat.initial = state(INIT)
        # parallel (src, dst, lemma) arcs keep the best-scoring variant
        best_arc: Dict[tuple, Tuple[float, int]] = {}
        for pc, c, e in arcs:
            k = (pc, c, ar.lemma[e])
            tot = ar.am[e] + ar.lm[e]
            old = best_arc.get(k)
            if old is None or tot < old[0]:
                best_arc[k] = (tot, e)
        inv_scale = 1.0 / (self.lm_scale if self.lm_scale else 1.0)
        for (pc, c, lemma), (_tot, e) in sorted(
                best_arc.items(), key=lambda kv: repr(kv[0])):
            lat.add_arc(state(pc), state(c), lemma,
                        am_score=ar.am[e],
                        lm_score=ar.lm[e] * inv_scale)
        for t in final_traces:
            lat.set_final(state(cls_of(t)), 0.0)
        return lat
