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


def lexicon_to_transducer(lexicon: Lexicon, token_of_phoneme=None
                          ) -> Automaton:
    """Closed lexicon transducer L: input tokens, output lemma-id+1 on the
    final arc of each pronunciation (0 is the epsilon label)."""
    tok = token_of_phoneme or (lambda pid: pid - 1)
    L = Automaton()
    root = L.add_state()
    L.initial = root
    L.set_final(root)
    for lemma in lexicon.lemmas:
        if lemma.special:
            continue
        for lp in lemma.pronunciations:
            tokens = [tok(p) for p in lp.pronunciation.phonemes]
            if not tokens:
                continue
            state = root
            for i, t in enumerate(tokens):
                nxt = root if False else L.add_state()
                last = i == len(tokens) - 1
                L.add_arc(state, nxt, t,
                          (lemma.id + 1) if last else EPS,
                          lp.score if last else 0.0)
                state = nxt
            L.add_arc(state, root, EPS, EPS, 0.0)
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
