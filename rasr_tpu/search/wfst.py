"""WFST decoding: static graph search (MODULE_SEARCH_WFST equivalent).

The reference's OpenFST-based decoder (src/Search/Wfst) searches a
statically composed lexicon/LM transducer.  Here the graph builds from the
native fsa layer:

  * L — lexicon transducer: token chains per pronunciation (input = label
    scorer tokens, output = lemma id at the word end), closed at the root;
  * G — the ARPA n-gram as a WFSA over lemma outputs (backoff arcs as
    epsilons with bow weights);
  * decoding graph = connect(compose(L, G)) (or L alone without LM).

Decoding is time-synchronous beam search over graph states with CTC
blank/loop handling and per-frame batched emission scores — the same host
loop shape as the tree search but over a pre-composed static automaton.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..bliss.lexicon import Lexicon
from ..fsa.automaton import EPS, Automaton, compose, connect
from ..lm.arpa import ArpaLm, SENTENCE_BEGIN, SENTENCE_END


def lexicon_to_transducer(lexicon: Lexicon, token_of_phoneme=None,
                          word_boundary_label: Optional[int] = None,
                          include_silence: bool = False) -> Automaton:
    """Closed lexicon transducer L: input tokens, output lemma-id+1 on the
    final arc of each pronunciation (0 is the epsilon label).

    `word_boundary_label` puts an explicit marker token on the closure
    arc back to the root instead of epsilon — the context-dependency
    composition keys on it to reset triphone contexts at word ends
    (reference ContextTransducerBuilder boundary handling).
    `include_silence` adds the silence lemma's pronunciation as an
    ordinary (LM-transparent) chain."""
    tok = token_of_phoneme or (lambda pid: pid - 1)
    L = Automaton()
    root = L.add_state()
    L.initial = root
    L.set_final(root)
    closure = (EPS if word_boundary_label is None
               else word_boundary_label)
    # PREFIX TRIE over pronunciations (the property the whole decoder
    # architecture rests on: the trie front after one phone is
    # |phonemes| chains, not |words| chains — without sharing a
    # 100k-word front floods any beam at the first frame).  The word
    # output and pronunciation weight ride the CLOSURE arc, which is
    # unique per word end even under full prefix sharing.
    trie: Dict[Tuple[int, int], int] = {}
    for lemma in lexicon.lemmas:
        is_sil = lemma.special == "silence"
        if lemma.special and not (include_silence and is_sil):
            continue
        for lp in lemma.pronunciations:
            tokens = [tok(p) for p in lp.pronunciation.phonemes]
            if not tokens:
                continue
            if is_sil:
                # silence keeps its own LM-transparent chain (epsilon
                # output lets it pass composition at every G state —
                # the reference adds silence self-loops to G)
                state = root
                for t in tokens:
                    nxt = L.add_state()
                    L.add_arc(state, nxt, t, EPS, 0.0)
                    state = nxt
                L.add_arc(state, root, closure, EPS, 0.0)
                continue
            state = root
            for t in tokens:
                nxt = trie.get((state, t))
                if nxt is None:
                    nxt = L.add_state()
                    L.add_arc(state, nxt, t, EPS, 0.0)
                    trie[(state, t)] = nxt
                state = nxt
            L.add_arc(state, root, closure, lemma.id + 1, lp.score)
    return L


def arpa_to_automaton(lm: ArpaLm, lexicon: Lexicon,
                      scale: float = 1.0) -> Automaton:
    """G: n-gram WFSA over lemma-id+1 labels with epsilon backoff arcs."""
    G = Automaton()
    ids: Dict[tuple, int] = {}

    def state(h: tuple) -> int:
        if h not in ids:
            ids[h] = G.add_state()
        return ids[h]

    # histories = all contexts of order < n
    contexts = [()]
    if lm.order > 1:
        contexts.extend(lm.contexts())
    contexts = list(dict.fromkeys(contexts))
    for h in contexts:
        state(h)
    G.initial = state(lm.reduced_history((SENTENCE_BEGIN,))
                      if lm.order > 1 else ())

    word_tokens = {}
    for lemma in lexicon.lemmas:
        if lemma.special:
            continue
        toks = lemma.syntactic_tokens
        if toks:
            word_tokens[lemma.id] = toks[0]

    for h in contexts:
        sid = ids[h]
        # word arcs
        for lemma_id, tokstr in word_tokens.items():
            entry = lm._lookup(h + (tokstr,))
            if entry is not None:
                target = lm.reduced_history(
                    (h + (tokstr,))[-(lm.order - 1):] if lm.order > 1 else ())
                G.add_arc(sid, state(target), lemma_id + 1, lemma_id + 1,
                          scale * entry[0])
        # backoff arc
        if h:
            entry = lm._lookup(h)
            bow = entry[1] if entry is not None else 0.0
            G.add_arc(sid, state(h[1:]), EPS, EPS, scale * bow)
        else:
            # sentence end from the unigram context
            end = lm._lookup((SENTENCE_END,))
            if end is not None:
                G.set_final(sid, scale * end[0])
            else:
                G.set_final(sid, 0.0)
    # non-unigram contexts: sentence end via direct n-gram or backoff chain
    for h in contexts:
        if not h:
            continue
        entry = lm._lookup(h + (SENTENCE_END,))
        if entry is not None:
            G.set_final(ids[h], scale * entry[0])
    return G


def build_decoding_graph(lexicon: Lexicon, lm: Optional[ArpaLm] = None,
                         lm_scale: float = 1.0,
                         token_of_phoneme=None,
                         minimize: bool = False,
                         cache_path: Optional[str] = None,
                         dependencies: Optional[dict] = None) -> Automaton:
    """Compose (and optionally minimize) the static decoding graph.

    minimize applies weighted minimization to shrink the composed graph
    (big lexica).  cache_path enables the graph-image cache (reference
    Search::PersistentStateTree image): the built graph serializes next
    to a DependencySet of `dependencies` (e.g. lexicon/LM file hashes +
    scales); a matching cache loads instead of rebuilding.
    """
    if cache_path is not None:
        cached = _load_graph_cache(cache_path, dependencies)
        if cached is not None:
            return cached
    L = lexicon_to_transducer(lexicon, token_of_phoneme)
    if lm is None:
        graph = L
    else:
        G = arpa_to_automaton(lm, lexicon, scale=lm_scale)
        graph = connect(compose(L, G))
    if minimize:
        from ..fsa.automaton import minimize as fsa_minimize
        graph = fsa_minimize(graph)
    if cache_path is not None:
        _save_graph_cache(cache_path, graph, dependencies)
    return graph


def _graph_to_bytes(graph: Automaton) -> bytes:
    import io
    import pickle
    buf = io.BytesIO()
    pickle.dump({
        "n_states": graph.n_states,
        "initial": graph.initial,
        "final": dict(graph.final),
        "arcs": [[(a.target, a.ilabel, a.olabel, a.weight)
                  for a in graph.arcs[s]] for s in range(graph.n_states)],
    }, buf, protocol=4)
    return buf.getvalue()


def _graph_from_bytes(data: bytes) -> Automaton:
    import io
    import pickle
    d = pickle.load(io.BytesIO(data))
    g = Automaton()
    for _ in range(d["n_states"]):
        g.add_state()
    g.initial = d["initial"]
    for s, arcs in enumerate(d["arcs"]):
        for (t, i, o, w) in arcs:
            g.add_arc(s, t, i, o, w)
    for s, w in d["final"].items():
        g.set_final(s, w)
    return g


def _load_graph_cache(path: str, dependencies: Optional[dict]) -> \
        Optional[Automaton]:
    import os
    from ..core.misc import DependencySet
    if not os.path.exists(path):
        return None
    if dependencies is not None:
        dep_path = path + ".deps"
        if not os.path.exists(dep_path):
            return None
        stored = DependencySet.read(dep_path)
        current = DependencySet({k: str(v) for k, v in dependencies.items()})
        if not stored.satisfies(current) or not current.satisfies(stored):
            return None  # stale image: inputs changed
    with open(path, "rb") as fh:
        return _graph_from_bytes(fh.read())


def _save_graph_cache(path: str, graph: Automaton,
                      dependencies: Optional[dict]) -> None:
    import os
    from ..core.misc import DependencySet
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(_graph_to_bytes(graph))
    os.replace(tmp, path)
    if dependencies is not None:
        DependencySet({k: str(v) for k, v in dependencies.items()}).write(
            path + ".deps")


@dataclass
class WfstHypothesis:
    state: int
    words: Tuple[int, ...] = ()
    score: float = 0.0
    last_label: int = -1
    is_blank_last: bool = True


class WfstDecoder:
    """Time-sync beam over a static decoding graph with CTC semantics.

    Epsilon arcs (word returns / LM backoff) traverse eagerly after every
    label advance (bounded closure)."""

    def __init__(self, graph: Automaton, blank: int = 0,
                 beam_size: int = 32,
                 score_threshold: float = math.inf):
        self.graph = graph
        self.blank = blank
        self.beam_size = beam_size
        self.score_threshold = score_threshold

    def _eps_closure(self, hyp: WfstHypothesis,
                     out: Dict[Tuple, WfstHypothesis]) -> None:
        stack = [hyp]
        seen = set()
        while stack:
            h = stack.pop()
            key = (h.state, h.words, h.last_label if not h.is_blank_last
                   else -1)
            prev = out.get(key)
            if prev is None or h.score < prev.score:
                out[key] = h
            if h.state in seen:
                continue
            seen.add(h.state)
            for arc in self.graph.arcs[h.state]:
                if arc.ilabel == EPS:
                    words = h.words + ((arc.olabel - 1,)
                                       if arc.olabel != EPS else ())
                    stack.append(replace(h, state=arc.target, words=words,
                                         score=h.score + arc.weight))

    def decode(self, log_probs: np.ndarray) -> WfstHypothesis:
        """(T, V) label log-posteriors -> best hypothesis."""
        beam: Dict[Tuple, WfstHypothesis] = {}
        self._eps_closure(WfstHypothesis(state=self.graph.initial), beam)
        scores = -np.asarray(log_probs)
        for t in range(scores.shape[0]):
            row = scores[t]
            new: Dict[Tuple, WfstHypothesis] = {}
            for h in beam.values():
                # blank: stay
                self._eps_closure(replace(
                    h, score=h.score + float(row[self.blank]),
                    is_blank_last=True), new)
                # label loop
                if not h.is_blank_last and h.last_label >= 0:
                    self._eps_closure(replace(
                        h, score=h.score + float(row[h.last_label])), new)
                # advance over label arcs
                for arc in self.graph.arcs[h.state]:
                    if arc.ilabel == EPS:
                        continue
                    if (not h.is_blank_last and arc.ilabel == h.last_label):
                        continue  # would be a loop
                    words = h.words + ((arc.olabel - 1,)
                                       if arc.olabel != EPS else ())
                    self._eps_closure(WfstHypothesis(
                        state=arc.target, words=words,
                        score=h.score + arc.weight + float(row[arc.ilabel]),
                        last_label=arc.ilabel, is_blank_last=False), new)
            hyps = sorted(new.values(), key=lambda h: h.score)
            if hyps:
                best = hyps[0].score
                hyps = [h for h in hyps
                        if h.score <= best + self.score_threshold]
                beam = {(h.state, h.words, h.last_label if not h.is_blank_last
                         else -1): h for h in hyps[:self.beam_size]}
        # finals only
        finals = [replace(h, score=h.score + self.graph.final[h.state])
                  for h in beam.values() if h.state in self.graph.final]
        pool = finals or list(beam.values())
        return min(pool, key=lambda h: h.score)

    def recognize(self, log_probs: np.ndarray, lexicon: Lexicon) -> List[str]:
        best = self.decode(log_probs)
        return [lexicon.lemmas[w].preferred_orth for w in best.words]


# ---------------------------------------------------------------------------
# context-dependency composition + HMM expansion (triphone C o L o G)
# ---------------------------------------------------------------------------
#
# The reference's WFST module composes a context-dependency transducer C
# with the lexicon/LM graph and decodes the allophone-level result
# (src/Search/Wfst/ContextTransducerBuilder.cc).  Here the C-composition
# is computed fused: expand_context() walks the phoneme-level L o G with
# the classic one-phoneme-delayed context construction (state carries the
# pending phoneme arc; its allophone resolves once the right neighbor is
# known), producing the allophone-input C o L o G directly — same result
# as materializing C and composing, without the intermediate blowup.
# expand_hmm() then applies the HMM topology + TDPs per allophone arc
# (the reference's H-level / TransitionModel::apply role).


def build_clg(am, lm: Optional[ArpaLm] = None, lm_scale: float = 1.0,
              include_silence: bool = True) -> Automaton:
    """Allophone-input decoding graph C o (L o G) for the acoustic
    model's lexicon: input = allophone index + 1 (am.alphabet), output
    = lemma id + 1, weights = pronunciation + scaled LM scores."""
    lex = am.lexicon
    wb = len(lex.phoneme_inventory) + 1           # word-boundary marker
    L = lexicon_to_transducer(lex, token_of_phoneme=lambda p: p,
                              word_boundary_label=wb,
                              include_silence=include_silence)
    if lm is None:
        LG = L
    else:
        G = arpa_to_automaton(lm, lex, scale=lm_scale)
        LG = connect(compose(L, G))
    return expand_context(LG, am, wb)


def expand_context(LG: Automaton, am, wb_label: int) -> Automaton:
    """Fused C-composition: phoneme-input L o G -> allophone-input
    C o L o G with within-word triphone contexts and word-boundary
    resets (the tree builder's allophone convention,
    am/allophone.py allophones_of_pronunciation)."""
    from ..am.allophone import IS_FINAL, IS_INITIAL, Allophone
    inv = am.lexicon.phoneme_inventory

    def ctx(pid: int) -> int:
        if pid and pid <= len(inv) and not inv.by_id(pid).context_dependent:
            return 0
        return pid

    out = Automaton()
    # state key: (lg_state, left_ctx_of_pending, pending_arc_key or None,
    #             pending_is_initial)
    ids: Dict[Tuple, int] = {}
    stack: List[Tuple] = []

    def state(key: Tuple) -> int:
        if key not in ids:
            ids[key] = out.add_state()
            stack.append(key)
        return ids[key]

    def allo_label(pid: int, left: int, right: int, initial: bool,
                   final: bool) -> int:
        if not inv.by_id(pid).context_dependent:
            a = Allophone(pid, 0, 0,
                          (IS_INITIAL if initial else 0)
                          | (IS_FINAL if final else 0))
        else:
            a = Allophone(pid, ctx(left), ctx(right),
                          (IS_INITIAL if initial else 0)
                          | (IS_FINAL if final else 0))
        return am.alphabet.index(a) + 1

    init_key = (LG.initial, 0, None, True)
    out.initial = state(init_key)
    seen = set()
    while stack:
        key = stack.pop()
        if key in seen:
            continue
        seen.add(key)
        sid = ids[key]
        lg_s, left, pending, p_init = key
        if pending == "final":
            continue            # terminal sentinel: finality already set
        if pending is None:
            if lg_s in LG.final:
                out.set_final(sid, LG.final[lg_s])
            for arc in LG.arcs[lg_s]:
                if arc.ilabel == EPS:
                    out.add_arc(sid, state((arc.target, left, None, p_init)),
                                EPS, arc.olabel, arc.weight)
                elif arc.ilabel == wb_label:
                    out.add_arc(sid, state((arc.target, 0, None, True)),
                                EPS, arc.olabel, arc.weight)
                else:
                    # buffer the phoneme arc; emit once right ctx known
                    state_key = (arc.target, left,
                                 (arc.ilabel, arc.olabel, arc.weight),
                                 p_init)
                    out.add_arc(sid, state(state_key), EPS, EPS, 0.0)
        else:
            pid, p_out, p_w = pending
            if lg_s in LG.final:
                # pending phoneme is utterance-final: right ctx 0
                lab = allo_label(pid, left, 0, p_init, True)
                fin = state((lg_s, ctx(pid), "final", False))
                out.add_arc(sid, fin, lab, p_out, p_w)
                out.set_final(fin, LG.final[lg_s])
            for arc in LG.arcs[lg_s]:
                if arc.ilabel == EPS:
                    out.add_arc(sid, state((arc.target, left, pending,
                                            p_init)),
                                EPS, arc.olabel, arc.weight)
                elif arc.ilabel == wb_label:
                    # pending phoneme is word-final; the closure arc
                    # carries the word output (trie L), unless the
                    # pending arc already held one
                    lab = allo_label(pid, left, 0, p_init, True)
                    mid = state((arc.target, 0, None, True))
                    out_l = p_out if p_out != EPS else arc.olabel
                    out.add_arc(sid, mid, lab, out_l, p_w + arc.weight)
                else:
                    lab = allo_label(pid, left, arc.ilabel, p_init, False)
                    nxt = state((arc.target, ctx(pid),
                                 (arc.ilabel, arc.olabel, arc.weight),
                                 False))
                    out.add_arc(sid, nxt, lab, p_out, p_w)
    # drop "final" sentinel states from key space (they are plain states)
    return connect(out)


def expand_hmm(clg: Automaton, am) -> Automaton:
    """H-level expansion: each allophone arc becomes its HMM state chain
    with emission-class input labels and TDP loop/forward/skip weights
    (reference TransitionModel::apply, src/Am/TransitionModel.hh:70).
    Exit penalties ride on the chain-leaving arc."""
    out = Automaton()
    for _ in range(clg.n_states):
        out.add_state()
    out.initial = clg.initial
    for s, w in clg.final.items():
        out.set_final(s, w)
    for s in range(clg.n_states):
        for arc in clg.arcs[s]:
            if arc.ilabel == EPS:
                out.add_arc(s, arc.target, EPS, arc.olabel, arc.weight)
                continue
            allo = am.alphabet.allophone(arc.ilabel - 1)
            is_sil = am.is_silence_phoneme(allo.central)
            tdp = am.transitions.tdp_for(is_sil)
            n_states = am.topology.n_states(is_sil)
            reps = am.topology.state_repetitions
            ems = [am.state_tying.emission_index(allo, q // reps) + 1
                   for q in range(n_states)]
            chain = [out.add_state() for _ in range(n_states)]
            # entry (first emission consumed entering state 0)
            out.add_arc(s, chain[0], ems[0], arc.olabel, arc.weight)
            for q in range(n_states):
                out.add_arc(chain[q], chain[q], ems[q], EPS, tdp.loop)
                if q + 1 < n_states:
                    out.add_arc(chain[q], chain[q + 1], ems[q + 1],
                                EPS, tdp.forward)
                    if q + 2 < n_states and math.isfinite(tdp.skip):
                        out.add_arc(chain[q], chain[q + 2], ems[q + 2],
                                    EPS, tdp.skip)
            # leave the chain: exit penalty, epsilon (next chain's entry
            # arc consumes the next emission)
            out.add_arc(chain[-1], arc.target, EPS, EPS,
                        tdp.forward + tdp.exit)
    return out


class HmmWfstDecoder:
    """Time-synchronous Viterbi beam over a static emission-class
    automaton (expand_hmm output): per frame every non-eps arc relaxes
    with weight + emission score, then bounded epsilon closure; state-
    level recombination (LM state lives in the graph, so Viterbi over
    graph states is exact for a static G)."""

    def __init__(self, graph: Automaton, beam_size: int = 1024,
                 score_threshold: float = math.inf):
        self.graph = graph
        self.beam_size = beam_size
        self.score_threshold = score_threshold
        # CSR arc arrays for the hot loop
        srcs, tgts, ils, ols, ws = [], [], [], [], []
        for s in range(graph.n_states):
            for a in graph.arcs[s]:
                srcs.append(s)
                tgts.append(a.target)
                ils.append(a.ilabel)
                ols.append(a.olabel)
                ws.append(a.weight)
        self._src = np.asarray(srcs, np.int64)
        self._tgt = np.asarray(tgts, np.int64)
        self._il = np.asarray(ils, np.int64)
        self._ol = np.asarray(ols, np.int64)
        self._w = np.asarray(ws, np.float64)
        self._em_arcs = np.flatnonzero(self._il != EPS)
        self._eps_arcs = np.flatnonzero(self._il == EPS)
        # loop-invariant eps-arc views, hoisted out of the per-frame
        # fixpoint (mirrors the emission-arc hoists in decode())
        self._eps_src = self._src[self._eps_arcs]
        self._eps_tgt = self._tgt[self._eps_arcs]
        self._eps_w = self._w[self._eps_arcs]

    def _eps_relax(self, pot: np.ndarray, back: np.ndarray,
                   back_arc: np.ndarray) -> None:
        """Bounded epsilon relaxation to fixpoint (graphs here have
        acyclic eps structure plus word-return arcs)."""
        for _ in range(64):
            cand = pot[self._eps_src] + self._eps_w
            tgt = self._eps_tgt
            better = cand < pot[tgt] - 1e-12
            if not np.any(better):
                break
            ks = self._eps_arcs[better]
            np.minimum.at(pot, tgt[better], cand[better])
            win = (pot[self._tgt[ks]] ==
                   (pot[self._src[ks]] + self._w[ks]))
            back[self._tgt[ks[win]]] = self._src[ks[win]]
            back_arc[self._tgt[ks[win]]] = ks[win]

    def decode(self, scores: np.ndarray) -> Tuple[List[int], float]:
        """(T, S) emission -log scores (1-based class = ilabel-1 maps to
        column ilabel-1) -> (lemma ids, total score)."""
        n = self.graph.n_states
        INF = np.inf
        pot = np.full(n, INF)
        pot[self.graph.initial] = 0.0
        # traceback: per (frame, state) winning arc
        tb: List[np.ndarray] = []
        back = np.full(n, -1, np.int64)
        back_arc = np.full(n, -1, np.int64)
        self._eps_relax(pot, back, back_arc)
        tb_pre = (back.copy(), back_arc.copy())
        ea = self._em_arcs
        esrc, etgt = self._src[ea], self._tgt[ea]
        eil, ew = self._il[ea], self._w[ea]
        for t in range(scores.shape[0]):
            em = scores[t]
            cand = pot[esrc] + ew + em[eil - 1]
            new_pot = np.full(n, INF)
            np.minimum.at(new_pot, etgt, cand)
            back = np.full(n, -1, np.int64)
            back_arc = np.full(n, -1, np.int64)
            win = cand == new_pot[etgt]
            back[etgt[win]] = esrc[win]
            back_arc[etgt[win]] = ea[win]
            # beam pruning
            finite = new_pot[np.isfinite(new_pot)]
            if len(finite) > self.beam_size:
                cut = np.partition(finite, self.beam_size)[self.beam_size]
                new_pot[new_pot > cut] = INF
            if math.isfinite(self.score_threshold) and len(finite):
                new_pot[new_pot > finite.min()
                        + self.score_threshold] = INF
            pot = new_pot
            self._eps_relax(pot, back, back_arc)
            tb.append((back.copy(), back_arc.copy()))
        finals = [(pot[s] + w, s) for s, w in self.graph.final.items()
                  if np.isfinite(pot[s])]
        if not finals:
            return [], math.inf
        total, state = min(finals)
        # traceback: word outputs live only on emission (entry) arcs
        # (expand_context puts outputs on resolving allophone arcs; eps
        # arcs here are chain exits / LM backoffs / buffers, all eps-out)
        words: List[int] = []

        def unwind_eps(state, back, back_arc):
            for _ in range(1 << 16):
                k = back_arc[state]
                if k < 0 or self._il[k] != EPS:
                    return state
                if self._ol[k] != EPS:
                    words.append(int(self._ol[k]) - 1)
                state = int(back[state])
            raise RuntimeError("epsilon traceback cycle")

        for back, back_arc in reversed(tb):
            state = unwind_eps(state, back, back_arc)
            k = back_arc[state]
            if k >= 0:
                if self._ol[k] != EPS:
                    words.append(int(self._ol[k]) - 1)
                state = int(back[state])
        unwind_eps(state, *tb_pre)
        words.reverse()
        return words, float(total)

    def recognize(self, scores: np.ndarray, lexicon) -> List[str]:
        words, _ = self.decode(scores)
        return [lexicon.lemmas[w].preferred_orth for w in words]


class DynamicLmWfstDecoder:
    """On-the-fly LM composition over the LM-free C o L graph
    (reference src/Search/Wfst/DynamicLmFst.cc): the static graph holds
    only lexicon + context-dependency + TDPs; hypotheses carry an LM
    history and word outputs score through the LM as they appear, so
    the G-expansion never materializes.  Exact for Viterbi because
    recombination keys on (graph state, LM history)."""

    def __init__(self, graph: Automaton, lm, lexicon,
                 lm_scale: float = 1.0, beam_size: int = 2048,
                 score_threshold: float = math.inf):
        self.graph = graph
        self.lm = lm
        self.lm_scale = lm_scale
        self.beam_size = beam_size
        self.score_threshold = score_threshold
        self._tokens = {}
        for lemma in lexicon.lemmas:
            st = lemma.syntactic_tokens
            self._tokens[lemma.id] = st[0] if st else None

    def decode(self, scores: np.ndarray) -> Tuple[List[int], float]:
        lm = self.lm
        hist0 = lm.initial_history()
        # hyp: (state, hist) -> (score, words tuple)
        beam: Dict[Tuple[int, object], Tuple[float, Tuple[int, ...]]] = {}

        def relax(state, hist, score, words, out: Dict) -> None:
            key = (state, hist)
            prev = out.get(key)
            if prev is None or score < prev[0]:
                out[key] = (score, words)

        def eps_closure(out: Dict) -> None:
            stack = list(out.items())
            while stack:
                (state, hist), (score, words) = stack.pop()
                cur = out.get((state, hist))
                if cur is None or cur[0] < score - 1e-12:
                    continue
                for arc in self.graph.arcs[state]:
                    if arc.ilabel != EPS:
                        continue
                    s2, h2, w2 = score + arc.weight, hist, words
                    if arc.olabel != EPS:
                        lemma_id = arc.olabel - 1
                        tok = self._tokens.get(lemma_id)
                        if tok is not None:
                            s2 += self.lm_scale * lm.score(hist, tok)
                            h2 = lm.extended_history(hist, tok)
                        w2 = words + (lemma_id,)
                    key = (arc.target, h2)
                    prev = out.get(key)
                    if prev is None or s2 < prev[0]:
                        out[key] = (s2, w2)
                        stack.append((key, (s2, w2)))

        beam[(self.graph.initial, hist0)] = (0.0, ())
        eps_closure(beam)
        for t in range(scores.shape[0]):
            em = scores[t]
            new: Dict = {}
            for (state, hist), (score, words) in beam.items():
                for arc in self.graph.arcs[state]:
                    if arc.ilabel == EPS:
                        continue
                    s2 = score + arc.weight + float(em[arc.ilabel - 1])
                    h2, w2 = hist, words
                    if arc.olabel != EPS:
                        lemma_id = arc.olabel - 1
                        tok = self._tokens.get(lemma_id)
                        if tok is not None:
                            s2 += self.lm_scale * lm.score(hist, tok)
                            h2 = lm.extended_history(hist, tok)
                        w2 = words + (lemma_id,)
                    relax(arc.target, h2, s2, w2, new)
            eps_closure(new)
            if len(new) > self.beam_size or \
                    math.isfinite(self.score_threshold):
                items = sorted(new.items(), key=lambda kv: kv[1][0])
                best = items[0][1][0] if items else 0.0
                items = [kv for kv in items
                         if kv[1][0] <= best + self.score_threshold]
                new = dict(items[:self.beam_size])
            beam = new
        finals = []
        for (state, hist), (score, words) in beam.items():
            if state in self.graph.final:
                end = self.lm_scale * lm.sentence_end_score(hist)
                finals.append((score + self.graph.final[state] + end,
                               words))
        if not finals:
            return [], math.inf
        total, words = min(finals, key=lambda x: x[0])
        return list(words), float(total)

    def recognize(self, scores: np.ndarray, lexicon) -> List[str]:
        words, _ = self.decode(scores)
        return [lexicon.lemmas[w].preferred_orth for w in words]


class BatchedDynamicLmDecoder:
    """Vocabulary-scale on-the-fly LM composition over a static
    emission-level C o L graph.

    The per-hypothesis dict decoder (DynamicLmWfstDecoder) and eager
    G composition both collapse at production vocabulary; this decoder
    keeps the reference's dynamic-composition architecture
    (src/Search/Wfst/DynamicLmFst.cc over a compressed static network,
    src/Search/Wfst/CompressedNetwork.hh:36) but runs the beam as
    structure-of-arrays numpy over CSR-flattened arcs — the same
    runtime shape as the word-conditioned tree search:

      * the graph flattens once into emission-arc and epsilon-arc CSR
        arrays (the compressed static network);
      * hypotheses are (state, LM-history id) rows; word outputs score
        through cached dense LM rows grouped by history (one
        score_dense per distinct history per wave);
      * recombination on (state, history) via lexsort, score-threshold
        + beam pruning, word traceback in an append-only arena.
    """

    def __init__(self, graph: Automaton, lm, lexicon,
                 lm_scale: float = 1.0, beam_size: int = 4096,
                 score_threshold: float = math.inf,
                 dense_cache_size: int = 256,
                 anticipation_cap: float = 20.0,
                 acoustic_lookahead: int = 6,
                 acoustic_lookahead_scale: float = 0.5,
                 emission_to_phone=None):
        S = graph.n_states
        em_rows: List[List[Tuple[int, int, int, float]]] = []
        eps_rows: List[List[Tuple[int, int, float]]] = []
        for s in range(S):
            em: List[Tuple[int, int, int, float]] = []
            ep: List[Tuple[int, int, float]] = []
            for arc in graph.arcs[s]:
                if arc.ilabel == EPS:
                    ep.append((arc.target, arc.olabel, arc.weight))
                else:
                    em.append((arc.target, arc.ilabel - 1, arc.olabel,
                               arc.weight))
            em_rows.append(em)
            eps_rows.append(ep)

        def csr(rows, width):
            off = np.zeros(len(rows) + 1, np.int64)
            for i, r in enumerate(rows):
                off[i + 1] = off[i] + len(r)
            flat = [np.asarray([r[k] for row in rows for r in row],
                               np.float64 if k == width - 1 else np.int64)
                    for k in range(width)]
            return off, flat

        self.em_off, (self.em_tgt, self.em_in, self.em_out,
                      self.em_w) = csr(em_rows, 4)
        self.eps_off, (self.eps_tgt, self.eps_out,
                       self.eps_w) = csr(eps_rows, 3)
        self.em_pos = np.arange(len(self.em_tgt), dtype=np.int64)
        self.eps_pos = np.arange(len(self.eps_tgt), dtype=np.int64)
        self.initial = graph.initial
        self.final_w = np.full(S, np.inf)
        for s, w in graph.final.items():
            self.final_w[s] = w
        self.lm = lm
        self.lm_scale = float(lm_scale)
        self.beam_size = int(beam_size)
        self.score_threshold = float(score_threshold)
        max_lemma = max((l.id for l in lexicon.lemmas), default=0)
        tok = np.full(max_lemma + 1, -1, np.int64)
        self.lemma_tok_str: List[Optional[str]] =             [None] * (max_lemma + 1)
        unk = lm.token_id(getattr(lm, "unknown", "<unk>"))
        for lemma in lexicon.lemmas:
            st = lemma.syntactic_tokens
            if st:
                t = lm.token_id(st[0])
                if t is None or t < 0:
                    # OOV lemmas SCORE as <unk>; the history still
                    # extends with the real token (matches lm.score +
                    # extended_history in DynamicLmWfstDecoder)
                    t = unk if unk is not None and unk >= 0 else -1
                tok[lemma.id] = t
                self.lemma_tok_str[lemma.id] = st[0]
        self.lemma_token = tok
        self._dense_cap = dense_cache_size
        self.frames_decoded = 0

        # static unigram LM anticipation (weight-pushing lite, the role
        # OpenFST weight pushing plays for the reference's static
        # graphs): la[s] = min over paths from s to the FIRST word
        # output of that word's scaled unigram score.  Biases pruning
        # only; exact scores stay at the word outputs.
        # cap: a rare word's unigram anticipation can exceed its actual
        # CONTEXTUAL cost by tens of nats -- uncapped it pushes correct
        # hypotheses outside any practical threshold (the reference
        # controls the same effect through its lookahead scale/cutoffs)
        u = np.minimum(
            self.lm_scale * np.asarray(lm.score_dense(()), np.float64),
            float(anticipation_cap))
        em_uv = np.where(self.em_out > 0, 0.0, np.inf)
        eps_uv = np.where(self.eps_out > 0, 0.0, np.inf)
        idx_em = np.flatnonzero(self.em_out > 0)
        tk = self.lemma_token[self.em_out[idx_em] - 1]
        em_uv[idx_em] = np.where(tk >= 0, u[np.maximum(tk, 0)], 0.0)
        idx_ep = np.flatnonzero(self.eps_out > 0)
        tk = self.lemma_token[self.eps_out[idx_ep] - 1]
        eps_uv[idx_ep] = np.where(tk >= 0, u[np.maximum(tk, 0)], 0.0)
        la = np.full(S, np.inf)
        for _ in range(256):
            cand_em = np.where(np.isfinite(em_uv), em_uv,
                               la[self.em_tgt])
            cand_ep = np.where(np.isfinite(eps_uv), eps_uv,
                               la[self.eps_tgt])
            new = la.copy()
            # per-state min via reduceat over the CSR layout
            new = np.minimum(new, _csr_min(self.em_off, cand_em, S))
            new = np.minimum(new, _csr_min(self.eps_off, cand_ep, S))
            if np.allclose(new, la, equal_nan=True):
                break
            la = new
        np.nan_to_num(la, copy=False, posinf=0.0)
        self.la = la
        self.acoustic_lookahead = int(acoustic_lookahead)
        self.acoustic_lookahead_scale = float(acoustic_lookahead_scale)

        # ---- per-history FIRST-PHONE anticipation (the discriminator
        # the static unigram pushing lacks exactly where the beam
        # saturates: the trie front right after word re-entry).  A
        # (history, |phones|) table is tiny; deep states keep the static
        # subtree-min bias.  `emission_to_phone(em_class) -> phone id`
        # identifies a front state's phone from its self-loop emission
        # (exact under monophone-style tying); None disables.
        self._fp = None
        self._anticipation_cap = float(anticipation_cap)
        if emission_to_phone is not None:
            # front = states within 3 emission steps of the root region
            root = {self.initial}
            stack = [self.initial]
            while stack:  # eps closure of the initial state
                s0 = stack.pop()
                for k in range(self.eps_off[s0], self.eps_off[s0 + 1]):
                    t = int(self.eps_tgt[k])
                    if t not in root:
                        root.add(t)
                        stack.append(t)
            depth = np.full(S, 99, np.int64)
            frontier = sorted(root)
            for s0 in frontier:
                depth[s0] = 0
            for d in (1, 2, 3):
                nxt = []
                for s0 in frontier:
                    for k in range(self.em_off[s0],
                                   self.em_off[s0 + 1]):
                        t = int(self.em_tgt[k])
                        if depth[t] > d:
                            depth[t] = d
                            nxt.append(t)
                frontier = nxt
            in_front = (depth >= 1) & (depth <= 3)
            # phone of a front state: its self-loop emission class
            phone_of = np.full(S, -1, np.int64)
            for s0 in np.flatnonzero(in_front):
                for k in range(self.em_off[s0], self.em_off[s0 + 1]):
                    if int(self.em_tgt[k]) == s0:
                        phone_of[s0] = emission_to_phone(
                            int(self.em_in[k]))
                        break
            ok = in_front & (phone_of >= 0)
            # word tokens grouped by FIRST phone (from the lexicon)
            n_ph = int(phone_of[ok].max()) + 1 if ok.any() else 0
            by_phone: List[List[int]] = [[] for _ in range(n_ph)]
            for lemma in lexicon.lemmas:
                if lemma.special:
                    continue
                ph = lemma.pronunciations[0].pronunciation.phonemes
                t = int(self.lemma_token[lemma.id])
                p0 = emission_to_phone(
                    (ph[0] - 1) * 3) if ph else -1
                if t >= 0 and 0 <= p0 < n_ph:
                    by_phone[p0].append(t)
            if n_ph and any(by_phone):
                starts = np.zeros(n_ph + 1, np.int64)
                for p, lst in enumerate(by_phone):
                    starts[p + 1] = starts[p] + len(lst)
                flat = np.asarray([t for lst in by_phone for t in lst],
                                  np.int64)
                self._fp = {
                    "front": ok, "phone_of": phone_of,
                    "starts": starts, "flat": flat, "n_ph": n_ph,
                    "tables": {},          # hist id -> (n_ph,) float64
                }

    def _fp_table(self, hist_id: int) -> np.ndarray:
        fp = self._fp
        tab = fp["tables"].get(hist_id)
        if tab is None:
            dense = self._dense_row(hist_id)   # already cached/LRU
            vals = self.lm_scale * dense[fp["flat"]]
            tab = np.full(fp["n_ph"], 0.0)
            ne = np.flatnonzero(np.diff(fp["starts"]) > 0)
            if len(ne):
                tab[ne] = np.minimum.reduceat(
                    vals, fp["starts"][ne])
            # same cap as the static pushing: mixing uncapped front
            # biases with capped deep biases would distort the relative
            # pruning scores across depths
            np.minimum(tab, self._anticipation_cap, out=tab)
            fp["tables"][hist_id] = tab
            if len(fp["tables"]) > 4 * self._dense_cap:
                fp["tables"].clear()    # simple bound; refills are cheap
        return tab

    # -- LM helpers -----------------------------------------------------------

    def _dense_row(self, hist_id: int) -> np.ndarray:
        h = self._hist_list[hist_id]
        row = self._dense.get(h)
        if row is None:
            row = np.asarray(self.lm.score_dense(h), np.float64)
            self._dense[h] = row
            if len(self._dense) > self._dense_cap:
                self._dense.popitem(last=False)
        else:
            self._dense.move_to_end(h)
        return row

    def _hist_id(self, h) -> int:
        i = self._hist_index.get(h)
        if i is None:
            i = len(self._hist_list)
            self._hist_index[h] = i
            self._hist_list.append(h)
        return i

    def _apply_words(self, sc, hi, tr, out, t1: int):
        """Score word outputs (out > 0) through the LM, extend histories
        and write arena entries; arrays are modified in place."""
        idx = np.flatnonzero(out > 0)
        if len(idx) == 0:
            return
        lemmas = out[idx] - 1
        toks = self.lemma_token[lemmas]
        val = np.flatnonzero(toks >= 0)
        if len(val):
            vi = idx[val]
            hh = hi[vi]
            uh, inv = np.unique(hh, return_inverse=True)
            add = np.zeros(len(vi))
            nh = np.zeros(len(vi), np.int64)
            for k, h in enumerate(uh.tolist()):
                grp = np.flatnonzero(inv == k)
                row = self._dense_row(h)
                add[grp] = self.lm_scale * row[toks[val][grp]]
                base = self._hist_list[h]
                ext = self._ext_cache
                lem_here = lemmas[val]
                for g in grp.tolist():
                    lem = int(lem_here[g])
                    key = (h, lem)
                    hid = ext.get(key)
                    if hid is None:
                        hid = self._hist_id(
                            self.lm.extended_history(
                                base, self.lemma_tok_str[lem]))
                        ext[key] = hid
                    nh[g] = hid
            sc[vi] += add
            hi[vi] = nh
        # arena entries for every emitted word (silence included)
        par = tr[idx]
        start = len(self._arena_parent)
        self._arena_parent.extend(par.tolist())
        self._arena_word.extend(lemmas.tolist())
        self._arena_t.extend([t1] * len(idx))
        tr[idx] = np.arange(start, start + len(idx), dtype=np.int64)

    def _eps_closure(self, st, hi, sc, tr, em, t1: int,
                     max_iters: int = 24):
        """Vectorized bounded epsilon closure with word outputs; `em`
        (last consumed emission class, for acoustic lookahead) rides
        along unchanged through epsilon moves."""
        # recombine the INCOMING pool first: the frame expansion
        # produces duplicate (state, hist) rows (loop + forward into the
        # same state), and a frontier without epsilon arcs must still
        # come back deduplicated
        H0 = len(self._hist_list)
        key0 = st * H0 + hi
        order0 = np.lexsort((sc, key0))
        ks0 = key0[order0]
        first0 = np.ones(len(order0), bool)
        first0[1:] = ks0[1:] != ks0[:-1]
        keep0 = order0[first0]
        st, hi, sc, tr, em = (st[keep0], hi[keep0], sc[keep0], tr[keep0],
                              em[keep0])
        pool_st, pool_hi, pool_sc, pool_tr, pool_em = st, hi, sc, tr, em
        frontier = (st, hi, sc, tr, em)
        for _ in range(max_iters):
            fst, fhi, fsc, ftr, fem = frontier
            own, pos = _csr_expand_wfst(self.eps_off, self.eps_pos, fst)
            if len(pos) == 0:
                break
            n_sc = fsc[own] + self.eps_w[pos]
            n_st = self.eps_tgt[pos]
            n_hi = fhi[own].copy()
            n_tr = ftr[own].copy()
            n_em = fem[own]
            n_out = self.eps_out[pos]
            self._apply_words(n_sc, n_hi, n_tr, n_out, t1)
            # merge into pool, recombine on (state, hist)
            a_st = np.concatenate([pool_st, n_st])
            a_hi = np.concatenate([pool_hi, n_hi])
            a_sc = np.concatenate([pool_sc, n_sc])
            a_tr = np.concatenate([pool_tr, n_tr])
            a_em = np.concatenate([pool_em, n_em])
            H = len(self._hist_list)
            key = a_st * H + a_hi
            order = np.lexsort((a_sc, key))
            ks = key[order]
            first = np.ones(len(order), bool)
            first[1:] = ks[1:] != ks[:-1]
            keep = order[first]
            improved = keep[keep >= len(pool_st)]   # new entries that won
            pool_st, pool_hi = a_st[keep], a_hi[keep]
            pool_sc, pool_tr = a_sc[keep], a_tr[keep]
            pool_em = a_em[keep]
            if len(improved) == 0:
                break
            frontier = (a_st[improved], a_hi[improved], a_sc[improved],
                        a_tr[improved], a_em[improved])
        return pool_st, pool_hi, pool_sc, pool_tr, pool_em

    def decode(self, scores: np.ndarray) -> Tuple[List[int], float]:
        """(T, S_emissions) -log emission scores -> (word ids, score)."""
        from collections import OrderedDict
        # history interning + dense-row LRU + extension cache persist
        # across segments (the LM is fixed per decoder; recurring
        # histories keep their score_dense rows like the tree search's
        # cross-segment dense cache)
        if not hasattr(self, "_hist_list"):
            self._hist_list = [self.lm.initial_history()]
            self._hist_index = {self._hist_list[0]: 0}
            self._dense: "OrderedDict" = OrderedDict()
            self._ext_cache: Dict[Tuple[int, int], int] = {}
        self._arena_parent: List[int] = []
        self._arena_word: List[int] = []
        self._arena_t: List[int] = []

        # acoustic lookahead table: mean emission cost over the next L
        # frames per class (identical to the tree search's
        # set_lookahead_scores — the bias that keeps lagging hypotheses
        # from surviving on stale audio)
        la_ac = None
        L = self.acoustic_lookahead
        if L > 0:
            s64 = np.asarray(scores, np.float64)
            c = np.concatenate([np.zeros((1,) + s64.shape[1:]),
                                np.cumsum(s64, 0)])
            T = len(s64)
            hi_i = np.minimum(np.arange(T) + L, T)
            lo_i = np.arange(T)
            cnt = np.maximum(hi_i - lo_i, 1).astype(np.float64)[:, None]
            la_ac = (c[hi_i] - c[lo_i]) / cnt

        st = np.asarray([self.initial], np.int64)
        hi = np.zeros(1, np.int64)
        sc = np.zeros(1, np.float64)
        tr = np.full(1, -1, np.int64)
        em = np.zeros(1, np.int64)
        st, hi, sc, tr, em = self._eps_closure(st, hi, sc, tr, em, 0)
        for t in range(scores.shape[0]):
            frame = scores[t]
            own, pos = _csr_expand_wfst(self.em_off, self.em_pos, st)
            if len(pos) == 0:
                break
            n_sc = sc[own] + self.em_w[pos] + frame[self.em_in[pos]]
            n_st = self.em_tgt[pos]
            n_hi = hi[own].copy()
            n_tr = tr[own].copy()
            n_em = self.em_in[pos]
            self._apply_words(n_sc, n_hi, n_tr, self.em_out[pos], t + 1)
            st, hi, sc, tr, em = self._eps_closure(
                n_st, n_hi, n_sc, n_tr, n_em, t + 1)
            # prune on the anticipated score: unigram pushing (LM) +
            # acoustic lookahead over the just-consumed emission class;
            # front states upgrade to the per-history first-phone table
            prune = sc + self.la[st]
            if self._fp is not None:
                fr = self._fp["front"][st]
                if fr.any():
                    idxf = np.flatnonzero(fr)
                    ph = self._fp["phone_of"][st[idxf]]
                    hh = hi[idxf]
                    uh = np.unique(hh)
                    bias = np.empty(len(idxf))
                    for h in uh.tolist():
                        m2 = hh == h
                        bias[m2] = self._fp_table(int(h))[ph[m2]]
                    prune[idxf] = sc[idxf] + bias
            if la_ac is not None and t + 1 < len(la_ac):
                prune = prune + self.acoustic_lookahead_scale                     * la_ac[t + 1][em]
            best = float(prune.min())
            m = prune <= best + self.score_threshold
            if m.sum() > self.beam_size:
                iidx = np.flatnonzero(m)
                part = np.argpartition(prune[iidx], self.beam_size - 1)
                sel = iidx[part[:self.beam_size]]
            else:
                sel = np.flatnonzero(m)
            st, hi, sc, tr, em = (st[sel], hi[sel], sc[sel], tr[sel],
                                  em[sel])
            self.frames_decoded += 1
        fw = self.final_w[st]
        ok = np.isfinite(fw)
        if not ok.any():
            return [], math.inf
        ends = np.asarray([
            self.lm_scale * self.lm.sentence_end_score(
                self._hist_list[h]) for h in hi[ok].tolist()])
        totals = sc[ok] + fw[ok] + ends
        j = int(np.argmin(totals))
        tidx = int(tr[ok][j])
        words: List[int] = []
        while tidx >= 0:
            words.append(self._arena_word[tidx])
            tidx = self._arena_parent[tidx]
        return words[::-1], float(totals[j])

    def recognize(self, scores: np.ndarray, lexicon) -> List[str]:
        words, _ = self.decode(scores)
        return [lexicon.lemmas[w].preferred_orth for w in words
                if not lexicon.lemmas[w].special]


def _csr_expand_wfst(off: np.ndarray, flat: np.ndarray,
                     rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    from .hmm_timesync import _csr_expand
    return _csr_expand(off, flat, rows)


def _csr_min(off: np.ndarray, values: np.ndarray, n: int) -> np.ndarray:
    """Per-row min over a CSR-ordered value array (inf for empty rows)."""
    out = np.full(n, np.inf)
    if len(values) == 0:
        return out
    starts = off[:-1]
    nonempty = np.flatnonzero(off[1:] > starts)
    if len(nonempty) == 0:
        return out
    out[nonempty] = np.minimum.reduceat(values,
                                        starts[nonempty].astype(np.int64))
    return out


def _relax_potentials(pot: np.ndarray, src: np.ndarray,
                      tgt: np.ndarray, w: np.ndarray) -> np.ndarray:
    """Bounded epsilon fixpoint over potentials only (the backpointered
    twin lives in HmmWfstDecoder._eps_relax — keep bounds/tolerances in
    sync)."""
    for _ in range(64):
        cand = pot[src] + w
        better = cand < pot[tgt] - 1e-12
        if not np.any(better):
            break
        np.minimum.at(pot, tgt[better], cand[better])
    return pot


def hmm_wfst_lattice(decoder: HmmWfstDecoder, scores: np.ndarray,
                     lattice_threshold: float = 20.0,
                     max_trellis_bytes: int = 4 << 30):
    """Word lattice from the static-graph trellis (the reference WFST
    module's lattice generation role, src/Search/Wfst/LatticeHandler,
    BookKeeping.cc): forward + backward Viterbi potentials over the
    frame-expanded trellis keep every transition lying on some path
    within `lattice_threshold` of the global best; the surviving
    sub-trellis IS the lattice — states are (frame, graph-state) pairs
    with exact per-arc scores (graph weight + emission), word outputs
    on their resolving arcs, epsilon elsewhere.  Path scores in the
    lattice equal trellis path scores exactly; condense with the
    existing lattice transforms (remove-epsilons / time-conditioned)
    for word-level views.

    Arc labels use the GRAPH's output space — lemma id + 1 — with the
    lattice's `words` dict keyed accordingly, so lemma id 0 cannot
    collide with the epsilon label (0).

    The two (T+1, n_states) float32 potential planes are dense;
    `max_trellis_bytes` guards against silently allocating tens of GB
    on production graphs (1M+ states) — word lattices at that scale
    come from the tree search's lattice path, which is sparse.

    Returns a legacy WordLattice (am_score carries the full combined
    weight; lm_score 0 — the static graph folds LM/TDP/pron in)."""
    from ..lattice.word_lattice import WordLattice

    g = decoder.graph
    n = g.n_states
    T = scores.shape[0]
    need = 2 * (T + 1) * n * 4
    if need > max_trellis_bytes:
        raise MemoryError(
            f"hmm_wfst_lattice trellis needs {need >> 20} MiB "
            f"({T + 1} frames x {n} states x 2 planes); raise "
            f"max_trellis_bytes or generate lattices with the tree "
            f"search at this scale")
    INF = np.inf
    ea = decoder._em_arcs
    esrc, etgt = decoder._src[ea], decoder._tgt[ea]
    eil, ew = decoder._il[ea], decoder._w[ea]
    z_src, z_tgt, z_w = (decoder._eps_src, decoder._eps_tgt,
                         decoder._eps_w)
    z_ol = decoder._ol[decoder._eps_arcs]

    # forward potentials BEFORE each frame's emission step
    fwd = np.full((T + 1, n), INF, np.float32)
    pot = np.full(n, INF)
    pot[g.initial] = 0.0
    fwd[0] = _relax_potentials(pot.copy(), z_src, z_tgt, z_w)
    for t in range(T):
        new = np.full(n, INF)
        cand = fwd[t][esrc] + ew + scores[t][eil - 1]
        np.minimum.at(new, etgt, cand)
        fwd[t + 1] = _relax_potentials(new, z_src, z_tgt, z_w)

    # backward potentials (reverse relaxation) AFTER each frame
    bwd = np.full((T + 1, n), INF, np.float32)
    pot = np.full(n, INF)
    for s, w in g.final.items():
        pot[s] = w
    bwd[T] = _relax_potentials(pot.copy(), z_tgt, z_src, z_w)
    for t in range(T - 1, -1, -1):
        new = np.full(n, INF)
        cand = bwd[t + 1][etgt] + ew + scores[t][eil - 1]
        np.minimum.at(new, esrc, cand)
        bwd[t] = _relax_potentials(new, z_tgt, z_src, z_w)

    best = float(np.min(fwd[T] + bwd[T]))
    empty = WordLattice(words={})
    empty.add_state(0)
    empty.initial = 0
    empty.set_final(0, 0.0)
    if not math.isfinite(best):
        return empty                      # no complete path survived
    cut = best + lattice_threshold

    lat = WordLattice(words={})
    node_of: Dict[Tuple[int, int], int] = {}

    def node(t, s):
        key = (t, s)
        if key not in node_of:
            node_of[key] = lat.add_state(t)
        return node_of[key]

    # float32 planes: compare with a tolerance scaled to the cut
    tol = 1e-3
    for t in range(T):
        em = scores[t]
        tot = fwd[t][esrc] + ew + em[eil - 1] + bwd[t + 1][etgt]
        for k in np.flatnonzero(tot <= cut + tol):
            ol = int(decoder._ol[ea[k]])
            lat.add_arc(node(t, int(esrc[k])), node(t + 1, int(etgt[k])),
                        ol if ol != EPS else EPS,
                        float(ew[k] + em[eil[k] - 1]), 0.0)
    for t in range(T + 1):
        tot = fwd[t][z_src] + z_w + bwd[t][z_tgt]
        for j in np.flatnonzero(tot <= cut + tol):
            ol = int(z_ol[j])
            lat.add_arc(node(t, int(z_src[j])), node(t, int(z_tgt[j])),
                        ol if ol != EPS else EPS,
                        float(z_w[j]), 0.0)
    if (0, g.initial) not in node_of:
        return empty
    lat.initial = node_of[(0, g.initial)]
    for s, w in g.final.items():
        if (T, s) in node_of:
            lat.set_final(node_of[(T, s)], float(w))
    if not lat.final:
        return empty
    return lat
