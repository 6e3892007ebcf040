"""Language-model lookahead for the word-conditioned tree search.

Re-creation of the reference's LanguageModelLookahead
(/root/reference/src/Search/LanguageModelLookahead.hh:64, .cc — 2158
LoC of compressed-tree + per-history score-table machinery), built for
the SoA/numpy search runtime:

  * the lexical tree is compressed into a *lookahead network*: chains
    of single-child, no-word-end nodes share one lookahead node
    (reference buildCompressedLookaheadNetwork), so tables are dense
    over ~branching+word-end nodes only;
  * a lookahead table for an LM history h holds, per lookahead node,
    min over all word ends w reachable below it of  scale * P_lm(w|h)
    — computed in ONE dense LM pass (`ArpaLm.score_dense`, the trie's
    vectorized all-words scorer) followed by a level-ordered
    min-propagation up the (DAG) network — no per-node recursion;
  * tables live in a fixed slot pool (float32) so the native beam
    kernel reads them zero-copy; histories map to slots via an LRU;
    slot 0 is the history-independent unigram table, used for
    instances that are too small to justify a fill (the reference's
    lookahead "laziness": sparse/low-count tree instances reuse the
    context-free table);
  * reduced-order lookahead (default bigram) truncates the history
    before table lookup, collapsing the table space exactly like the
    reference's `lm-lookahead-history-limit`.

The tables bias ONLY pruning decisions (the prospect score); true path
scores take exact LM values at word ends.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from typing import Dict, List, Optional, Tuple

import numpy as np


def _la_lib():
    """ctypes handle to the fused C fill (native/rasr_la.cpp), or None
    (numpy fallback).  RASR_NATIVE_LA=0 disables the native path."""
    if os.environ.get("RASR_NATIVE_LA", "1") == "0":
        return None
    try:
        import ctypes

        from ..speech.native_io import _ensure_built
        lib = _ensure_built()
        if lib is None:
            return None
        if not getattr(lib, "_la_ready", False):
            P = ctypes.c_void_p
            lib.rasr_la_fill.restype = None
            lib.rasr_la_fill.argtypes = [
                P, ctypes.c_int64, P, ctypes.c_double,
                P, P, P, ctypes.c_int64, ctypes.c_int64,
                P, ctypes.c_int64, ctypes.c_int64,
                P, P, P, P, P, ctypes.c_float]
            lib._la_ready = True
        return lib
    except Exception:
        return None


class LmLookahead:
    """Per-history lookahead tables over the compressed lexical tree."""

    def __init__(self, tree, net, lexicon, lm, lm_scale: float,
                 history_limit: int = 1, max_slots: int = 32,
                 min_hyps: int = 1, max_fills_per_frame: int = 8,
                 depth_limit: int = 0):
        """history_limit: number of history words the table conditions
        on (1 = bigram lookahead, 0 = unigram only).  min_hyps: smallest
        tree-instance size that triggers a history-specific fill;
        smaller instances use the unigram table (slot 0).

        depth_limit > 0 caps the lookahead network at that tree depth
        (the reference's size-capped lookahead tree,
        src/Search/LanguageModelLookahead.hh:64): states deeper than the
        cap share their depth-cap ancestor's table entry.  Tables shrink
        from O(tree) to O(branching^depth) — fills get much cheaper and
        the slot pool becomes cache-resident — at the cost of a coarser
        (still subtree-min) pruning bias below the cap."""
        self.lm = lm
        self.lm_scale = float(lm_scale)
        self.history_limit = int(history_limit)
        self.min_hyps = int(min_hyps)
        self.max_fills = int(max_fills_per_frame)
        nodes = tree.nodes
        n_nodes = len(nodes)

        # ---- compress: chains of single-child / no-word-end nodes share
        # their child's lookahead node.  Children may be shared (the
        # minimized tree is a DAG), so compute in reverse topological
        # (deepest-first) order over levels.
        n_children = np.zeros(n_nodes, np.int64)
        for i in range(n_nodes):
            n_children[i] = len(nodes[i].children)
        has_wend = np.asarray([len(nodes[i].word_ends) > 0
                               for i in range(n_nodes)], bool)

        # level[i] = 1 + max(level[children]): vectorized relaxation over
        # the edge arrays, converging in max-depth iterations (the node
        # order is NOT guaranteed topological after tree minimization)
        child_lists = [list(nodes[i].children.values())
                       for i in range(n_nodes)]
        ep = np.asarray([i for i in range(n_nodes)
                         for _ in child_lists[i]], np.int64)
        ec = np.asarray([c for i in range(n_nodes)
                         for c in child_lists[i]], np.int64)
        level = np.zeros(n_nodes, np.int64)
        for _ in range(n_nodes + 1):
            new = level.copy()
            if len(ep):
                np.maximum.at(new, ep, level[ec] + 1)
            if (new == level).all():
                break
            level = new

        rep = None
        if depth_limit > 0:
            # BFS (min-)depth + representative: nodes below the cap
            # share their depth-cap ancestor's lookahead entry
            rep = np.arange(n_nodes, dtype=np.int64)
            depth = np.full(n_nodes, -1, np.int64)
            depth[0] = 0
            queue = [0]
            head = 0
            while head < len(queue):
                i = queue[head]
                head += 1
                for c in child_lists[i]:
                    if depth[c] < 0:
                        depth[c] = depth[i] + 1
                        rep[c] = c if depth[c] <= depth_limit else rep[i]
                        queue.append(c)

        la_of = np.full(n_nodes, -1, np.int64)
        n_la = 0
        order = np.argsort(level, kind="stable")  # leaves first
        for i in order:
            i = int(i)
            if rep is not None and rep[i] != i:
                continue              # assigned via its representative
            cs = child_lists[i]
            if rep is None and len(cs) == 1 and not has_wend[i]:
                la_of[i] = la_of[cs[0]]
            else:
                la_of[i] = n_la
                n_la += 1
        if rep is not None:
            la_of = la_of[rep]
        self.n_la = n_la
        self.la_of_node = la_of

        # ---- propagation edges (la parent <- la child), grouped by
        # parent level so each group is one vectorized np.minimum.at
        edges: set = set()
        for i in range(n_nodes):
            for c in child_lists[i]:
                if la_of[i] != la_of[c]:
                    edges.add((int(level[i]), int(la_of[i]),
                               int(la_of[c])))
        by_level: Dict[int, Tuple[List[int], List[int]]] = {}
        for lvl, p, c in edges:
            by_level.setdefault(lvl, ([], []))[0].append(p)
            by_level[lvl][1].append(c)
        self.levels = [
            (np.asarray(by_level[lvl][0], np.int64),
             np.asarray(by_level[lvl][1], np.int64))
            for lvl in sorted(by_level)]

        # ---- word ends: (la node, LM token id); lemmata with an empty
        # syntactic sequence (silence/blank) contribute 0 (they do not
        # consume the LM)
        wn: List[int] = []
        wt: List[int] = []
        free: List[int] = []   # la nodes with a zero-score word end
        tid = getattr(lm, "token_id", None)
        unk_id = tid(getattr(lm, "unknown", "<unk>")) if tid else -1
        lemmas = lexicon.lemmas
        for i in range(n_nodes):
            for (lemma_id, _pron, _grp, _close) in nodes[i].word_ends:
                toks = lemmas[lemma_id].syntactic_tokens
                if not toks:
                    free.append(int(la_of[i]))
                elif tid is not None:
                    t = int(tid(toks[0]))
                    if t < 0:
                        t = int(unk_id)
                    if t < 0:
                        # OOV without <unk>: no LM continuation — skip
                        # (the node keeps +inf unless another word covers it)
                        continue
                    wn.append(int(la_of[i]))
                    wt.append(t)
        self.wend_la = np.asarray(wn, np.int64)
        self.wend_token = np.asarray(wt, np.int64)
        self.free_la = np.asarray(free, np.int64)

        # fill-path layout: segment-min via argsort + reduceat
        # (np.minimum.at is ~10x slower at millions of entries, and fills
        # sit on the decode path)
        if len(self.wend_la):
            ws = np.argsort(self.wend_la, kind="stable")
            wla = self.wend_la[ws]
            starts = np.flatnonzero(
                np.concatenate([[True], wla[1:] != wla[:-1]]))
            self._w_tok = np.ascontiguousarray(self.wend_token[ws])
            self._w_starts = np.ascontiguousarray(starts)
            self._w_la_unique = np.ascontiguousarray(wla[starts])
        else:
            self._w_tok = np.zeros(0, np.int64)
            self._w_starts = np.zeros(0, np.int64)
            self._w_la_unique = np.zeros(0, np.int64)
        self._levels_fast = []
        for parents, children in self.levels:
            ps = np.argsort(parents, kind="stable")
            p = parents[ps]
            c = children[ps]
            starts = np.flatnonzero(
                np.concatenate([[True], p[1:] != p[:-1]]))
            self._levels_fast.append((p[starts], c, starts))

        # flattened level layout + native binding for the fused C fill
        # (native/rasr_la.cpp); the numpy path below stays as fallback
        # and parity oracle
        self._free = np.ascontiguousarray(self.free_la)
        pf, cf, sf, po, co = [], [], [], [0], [0]
        for pu, c, starts in self._levels_fast:
            pf.append(pu)
            cf.append(c)
            sf.append(starts)
            po.append(po[-1] + len(pu))
            co.append(co[-1] + len(c))
        cat = (lambda xs: np.ascontiguousarray(
            np.concatenate(xs), np.int64) if xs else np.zeros(0, np.int64))
        self._p_flat, self._c_flat, self._s_flat = cat(pf), cat(cf), cat(sf)
        self._pstart = np.asarray(po, np.int64)
        self._cstart = np.asarray(co, np.int64)
        self._native = _la_lib()

        # per-state la node for the search kernel: state -> la node
        self.la_of_state = la_of[net.node_of]

        # ---- slot pool (float32, fixed allocation: the native kernel
        # reads it in place).  Lookahead histories are INTERNED to int
        # ids; slot_of_id maps id -> resident slot (0 = unigram fallback)
        # so the per-frame hist->slot map is one vectorized gather.
        self.max_slots = max(int(max_slots), 2)
        self.pool = np.zeros((self.max_slots, n_la), np.float32)
        self._id_of: Dict[tuple, int] = {(): 0}
        self._la_hists: List[tuple] = [()]
        self.slot_of_id = np.zeros(64, np.int64)
        self._lru: "OrderedDict[int, int]" = OrderedDict()  # la id -> slot
        self._free_slots = list(range(self.max_slots - 1, 0, -1))
        # statistics: table fill cost is a first-class number to report
        # (the reference's lookahead machinery exists to amortize it)
        self.n_fills = 0
        self.fill_seconds = 0.0
        #: bumped on every fill/eviction so callers can cache slot maps
        self.version = 0
        # slot 0: unigram (empty-history) table, always resident
        self._fill(0, ())

    # -- table computation ------------------------------------------------------

    def _fill(self, slot: int, hist: tuple) -> None:
        t0 = time.perf_counter()
        if self._native is not None:
            dense = (self.lm.score_dense(hist) if len(self.wend_la)
                     else np.zeros(1, np.float32))
            if dense.dtype != np.float32 or not dense.flags["C_CONTIGUOUS"]:
                dense = np.ascontiguousarray(dense, np.float32)
            tab = self.pool[slot]
            self._native.rasr_la_fill(
                tab.ctypes.data, self.n_la,
                dense.ctypes.data, float(self.lm_scale),
                self._w_tok.ctypes.data, self._w_starts.ctypes.data,
                self._w_la_unique.ctypes.data,
                len(self._w_tok), len(self._w_starts),
                self._free.ctypes.data, len(self._free),
                len(self._pstart) - 1,
                self._p_flat.ctypes.data, self._pstart.ctypes.data,
                self._c_flat.ctypes.data, self._cstart.ctypes.data,
                self._s_flat.ctypes.data, 3.0e8)
        else:
            tab = np.full(self.n_la, np.inf, np.float32)
            if len(self.wend_la):
                dense = self.lm.score_dense(hist)
                vals = (self.lm_scale
                        * dense[self._w_tok]).astype(np.float32)
                tab[self._w_la_unique] = np.minimum.reduceat(
                    vals, self._w_starts)
            if len(self.free_la):
                tab[self.free_la] = np.minimum(tab[self.free_la], 0.0)
            for pu, c, starts in self._levels_fast:
                tab[pu] = np.minimum(
                    tab[pu], np.minimum.reduceat(tab[c], starts))
            # unreachable la nodes (none in practice) must not poison
            # pruning
            np.nan_to_num(tab, copy=False, posinf=3.0e8)
            self.pool[slot] = tab
        self.n_fills += 1
        self.version += 1
        self.fill_seconds += time.perf_counter() - t0

    def set_scale(self, lm_scale: float) -> None:
        """Change the LM scale: every resident table is stale, so the
        slot pool resets and the unigram table refills at the new scale
        (cheap next to a full lookahead rebuild — tuning loops switch
        scales on one search instance)."""
        self.lm_scale = float(lm_scale)
        self.slot_of_id[:] = 0
        self._lru.clear()
        self._free_slots = list(range(self.max_slots - 1, 0, -1))
        self.version += 1
        self._fill(0, ())

    def lookahead_history(self, hist: tuple) -> tuple:
        if self.history_limit <= 0:
            return ()
        return tuple(hist[-self.history_limit:])

    def intern(self, la_hist: tuple) -> int:
        """Stable int id for a lookahead history (grows slot_of_id)."""
        i = self._id_of.get(la_hist)
        if i is None:
            i = len(self._la_hists)
            self._id_of[la_hist] = i
            self._la_hists.append(la_hist)
            if i >= len(self.slot_of_id):
                grown = np.zeros(2 * len(self.slot_of_id), np.int64)
                grown[:len(self.slot_of_id)] = self.slot_of_id
                self.slot_of_id = grown
        return i

    def slot(self, la_hist: tuple) -> int:
        """Slot of la_hist's table, or 0 (unigram) if not resident."""
        i = self._id_of.get(la_hist)
        return 0 if i is None else int(self.slot_of_id[i])

    def ensure(self, la_hist: tuple) -> int:
        return self.ensure_id(self.intern(la_hist))

    def ensure_id(self, la_id: int) -> int:
        """Fill (or touch) the table for the interned history; returns
        its slot."""
        if la_id == 0:
            return 0
        s = int(self.slot_of_id[la_id])
        if s != 0:
            self._lru.move_to_end(la_id)
            return s
        if self._free_slots:
            s = self._free_slots.pop()
        else:
            evicted, s = self._lru.popitem(last=False)
            self.slot_of_id[evicted] = 0
        self._fill(s, self._la_hists[la_id])
        self.slot_of_id[la_id] = s
        self._lru[la_id] = s
        return s

    def activate_ids(self, la_ids: np.ndarray) -> None:
        """Per-frame laziness policy over the beam's per-hypothesis
        lookahead-history ids: fill tables for histories whose tree
        instances hold >= min_hyps hypotheses, biggest first, bounded by
        max_fills_per_frame (the rest fall back to the unigram table —
        the reference's lookahead laziness for sparse instances)."""
        if len(la_ids) == 0:
            return
        counts = np.bincount(la_ids)
        missing = np.flatnonzero(
            (counts >= self.min_hyps)
            & (self.slot_of_id[:len(counts)] == 0))
        missing = missing[missing != 0]
        if len(missing) == 0:
            # touch resident entries so the LRU tracks active instances
            for i in np.flatnonzero(counts[1:] > 0) + 1:
                if self.slot_of_id[i] != 0:
                    self._lru.move_to_end(int(i))
            return
        order = np.argsort(-counts[missing], kind="stable")
        for i in missing[order][:self.max_fills]:
            self.ensure_id(int(i))

    def activate(self, hist_counts: Dict[tuple, int]) -> None:
        """Tuple-keyed convenience wrapper around activate_ids."""
        fills = 0
        for la_hist, count in sorted(hist_counts.items(),
                                     key=lambda kv: -kv[1]):
            if count < self.min_hyps or fills >= self.max_fills:
                break
            if self.slot(la_hist) == 0 and la_hist != ():
                self.ensure(la_hist)
                fills += 1
