"""Synthetic production-scale lexicon + n-gram LM for decoder scale proofs.

The reference's classic decoder is engineered for ~100k-word vocabularies
with multi-million-entry backing-off LMs (SearchSpace SoA hypothesis
arrays /root/reference/src/Search/AdvancedTreeSearch/SearchSpace.hh:129,
LanguageModelLookahead.cc table machinery).  The environment has no
egress, so this module builds a *deterministic* task of that shape:

  * a lexicon of `n_words` unique phoneme-string words over a
    plausible-size phoneme inventory (pronunciation length 4-10);
  * a first-order Markov "language" (each word has a sparse successor
    distribution) from which a corpus is sampled; 1..4-gram counts are
    estimated into a valid ARPA file with absolute discounting — real
    n-gram density, real backoff structure, millions of entries;
  * eval sentences sampled from the SAME chain (so the LM genuinely
    disambiguates) with synthetic emission scores: the true
    allophone-state sequence scores well, a confusable phoneme pair
    scores nearly as well, everything else is noise — acoustics alone
    leave word identity ambiguous, as on real speech.

Everything derives from seeds; nothing is shipped.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

SENT_BEGIN = "<s>"
SENT_END = "</s>"


def make_lexicon(n_words: int, n_phonemes: int = 40, seed: int = 1,
                 min_len: int = 4, max_len: int = 10,
                 twin_words: bool = False):
    """(Lexicon, AcousticModel, prons int32 (n_words, max_len) padded -1).

    Monophone 3-state topology; phoneme `si` is context-independent
    silence.  Word w is named "w<idx>".

    twin_words: every odd word's pronunciation is the even partner's
    with every phoneme swapped for its CONFUSABLE PAIR twin (2i <->
    2i+1, the near-identical formants in the synthetic audio) — the
    lexicon then has a dense acoustic neighborhood, so recognition
    lattices genuinely hold competing word hypotheses the language
    model must resolve (the regime the reference's lattice rescoring
    exists for)."""
    from ..am.acoustic_model import (AcousticModel, HmmTopology,
                                     MonophoneStateTying, Tdp,
                                     TransitionModel)
    from ..am.allophone import AllophoneAlphabet
    from ..bliss.lexicon import Lexicon

    rng = np.random.default_rng(seed)
    lex = Lexicon()
    for i in range(n_phonemes):
        lex.phoneme_inventory.add(f"p{i}")
    lex.phoneme_inventory.add("si", context_dependent=False)
    sil = lex.new_lemma(special="silence")
    sil.orths.append("[SILENCE]")
    lex.add_pronunciation(sil, ["si"])
    lex._index(sil)

    lens = rng.integers(min_len, max_len + 1, size=n_words)
    prons = np.full((n_words, max_len), -1, np.int32)
    seen = set()
    for w in range(n_words):
        if twin_words and w % 2 == 1:
            # pair-swap of the even partner's pronunciation; on the
            # rare collision fall through to a fresh draw
            prev = prons[w - 1]
            L = int(lens[w - 1])
            p = np.where(prev[:L] >= 0, prev[:L] ^ 1, prev[:L])
            p = np.minimum(p, n_phonemes - 1)
            key = tuple(int(x) for x in p)
            if key not in seen:
                seen.add(key)
                lens[w] = L
                prons[w, :L] = p
                lemma = lex.new_lemma()
                lemma.orths.append(f"w{w}")
                lex.add_pronunciation(lemma, [f"p{int(x)}" for x in p])
                lex._index(lemma)
                continue
        while True:
            L = int(lens[w])
            p = rng.integers(0, n_phonemes, size=L)
            key = tuple(int(x) for x in p)
            if key not in seen:
                seen.add(key)
                break
            # collision: redraw with a possibly longer pronunciation
            lens[w] = min(int(lens[w]) + 1, max_len)
        prons[w, :L] = p
        lemma = lex.new_lemma()
        lemma.orths.append(f"w{w}")
        lex.add_pronunciation(lemma, [f"p{int(x)}" for x in p])
        lex._index(lemma)
    am = AcousticModel(
        lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
        HmmTopology(3, 1, 1), MonophoneStateTying(n_phonemes + 1, 3),
        TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                        Tdp(0.0, 2.0, float("inf"), 4.0)))
    return lex, am, prons


@dataclass
class MarkovLanguage:
    """Sparse first-order word chain: successor sets + probabilities."""
    n_words: int
    branching: int
    seed: int = 2

    def __post_init__(self):
        rng = np.random.default_rng(self.seed)
        V, K = self.n_words, self.branching
        self.succ = np.empty((V, K), np.int32)
        for w in range(V):
            self.succ[w] = rng.choice(V, size=K, replace=False) \
                if K <= V else np.arange(V)[:K]
        raw = rng.dirichlet(np.full(K, 0.5), size=V)
        self.probs = raw.astype(np.float64)
        # initial distribution: Zipf-ish over a random permutation
        ranks = np.argsort(rng.permutation(V))
        p0 = 1.0 / (ranks + 1.0)
        self.p_init = p0 / p0.sum()
        self.p_end = 0.08   # per-step sentence-end probability

    def sample_sentence(self, rng: np.random.Generator,
                        min_words: int = 3, max_words: int = 30
                        ) -> List[int]:
        w = int(rng.choice(self.n_words, p=self.p_init))
        out = [w]
        while len(out) < max_words:
            if len(out) >= min_words and rng.random() < self.p_end:
                break
            w = int(rng.choice(self.succ[w], p=self.probs[w]))
            out.append(w)
        return out

    def sample_corpus(self, n_tokens: int, seed: int = 3) -> List[List[int]]:
        rng = np.random.default_rng(seed)
        sents, total = [], 0
        while total < n_tokens:
            s = self.sample_sentence(rng)
            sents.append(s)
            total += len(s) + 2
        return sents


@dataclass
class TopicMarkovLanguage(MarkovLanguage):
    """Markov word chain with a per-sentence hidden topic: each topic
    reweights the shared successor sets.  An n-gram sees only the topic
    MIXTURE (bounded context), while a recurrent LM can infer the topic
    from the sentence prefix — the synthetic analogue of the long-range
    structure that makes the reference's RecurrentLanguageModel
    (src/Lm/RecurrentLanguageModel.hh:89) worth its cost over ARPA."""
    n_topics: int = 4
    topic_alpha: float = 0.25    # smaller = sharper per-topic reweighting
    #: fraction of words whose successor distribution is topic-sensitive;
    #: the rest share the base chain.  With a sparse fraction an n-gram's
    #: bounded context rarely holds enough evidence to identify the
    #: topic, while a recurrent LM integrates it over the whole prefix —
    #: the honest synthetic analogue of long-range discourse structure.
    topic_fraction: float = 1.0

    def __post_init__(self):
        super().__post_init__()
        rng = np.random.default_rng(self.seed + 77)
        self.topic_probs = rng.dirichlet(
            np.full(self.branching, self.topic_alpha),
            size=(self.n_topics, self.n_words))
        self.sensitive = (rng.random(self.n_words)
                          < self.topic_fraction)
        self.topic_probs[:, ~self.sensitive] = \
            self.probs[None, ~self.sensitive]

    def sample_sentence(self, rng: np.random.Generator,
                        min_words: int = 3, max_words: int = 30
                        ) -> List[int]:
        topic = int(rng.integers(0, self.n_topics))
        w = int(rng.choice(self.n_words, p=self.p_init))
        out = [w]
        while len(out) < max_words:
            if len(out) >= min_words and rng.random() < self.p_end:
                break
            w = int(rng.choice(self.succ[w],
                               p=self.topic_probs[topic, w]))
            out.append(w)
        return out


def count_ngrams(sents: List[List[int]], order: int, n_words: int):
    """Per-order (keys (N, k) int32 sorted rows, counts) from sentences
    padded with <s>/</s> (ids n_words, n_words+1)."""
    BOS, EOS = n_words, n_words + 1
    flat: List[np.ndarray] = []
    for s in sents:
        flat.append(np.asarray([BOS] + s + [EOS], np.int32))
    out = []
    for k in range(1, order + 1):
        rows = []
        for s in flat:
            if len(s) >= k:
                # sliding windows; exclude windows that start after <s>
                # only for k=1 keep all (unigram <s> needed for contexts)
                win = np.lib.stride_tricks.sliding_window_view(s, k)
                rows.append(win)
        allk = np.concatenate(rows)
        # sort rows lexicographically and run-length encode
        idx = np.lexsort(allk.T[::-1])
        srt = allk[idx]
        new = np.ones(len(srt), bool)
        if len(srt) > 1:
            new[1:] = (srt[1:] != srt[:-1]).any(axis=1)
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, len(srt)))
        out.append((srt[starts], counts.astype(np.int64)))
    return out


def write_arpa(path: str, ngram_data, n_words: int,
               discount: float = 0.6) -> dict:
    """Absolute-discounted backing-off ARPA from per-order counts.

    p_k(w|h) = (c(h,w) - d) / c(h);  bow(h) = d * N1+(h) / c(h)
    (the leftover mass, unnormalized against the lower order — valid
    backoff structure at scale without the O(V) per-context
    normalization sweep; decoding consumes score *differences*, which
    this preserves).  Returns {"ngram_counts": [...], "vocab": V}."""
    BOS, EOS = n_words, n_words + 1

    def name(i: int) -> str:
        return SENT_BEGIN if i == BOS else (SENT_END if i == EOS
                                            else f"w{int(i)}")

    order = len(ngram_data)
    import math
    log10 = math.log10

    # full-vocabulary floor BEFORE the header: words never seen in the
    # corpus get a floored unigram (real LMs ship complete vocab — without
    # it an unseen word scores +inf and the decoder cannot hypothesize it)
    keys1, counts1 = ngram_data[0]
    seen = set(int(x) for x in keys1[:, 0])
    missing = np.asarray([w for w in range(n_words) if w not in seen],
                         np.int32)
    if len(missing):
        keys1 = np.concatenate([keys1, missing[:, None]])
        counts1 = np.concatenate(
            [counts1, np.zeros(len(missing), np.int64)])
        order_ix = np.argsort(keys1[:, 0], kind="stable")
        ngram_data = list(ngram_data)
        ngram_data[0] = (keys1[order_ix], counts1[order_ix])

    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        for k, (keys, _c) in enumerate(ngram_data, start=1):
            fh.write(f"ngram {k}={len(keys)}\n")
        fh.write("\n")
        for k, (keys, counts) in enumerate(ngram_data, start=1):
            fh.write(f"\\{k}-grams:\n")
            # per-entry probability
            if k == 1:
                total = float(counts.sum())
                p = np.maximum(counts - discount, 0.01) / total
                p[keys[:, 0] == BOS] = 1e-99   # <s> is never predicted
            else:
                # c(h) via the (k-1)-gram counts of each prefix row
                pk, pc = ngram_data[k - 2]
                pos = _row_searchsorted(pk, keys[:, :-1])
                ch = pc[pos].astype(np.float64)
                p = np.maximum(counts - discount, 0.05) / ch
            lp = np.log10(p)
            # backoff weight: leftover discounted mass per context
            # (the contexts of order k are exactly the k-grams when a
            # (k+1)-gram order follows)
            bw = None
            if k < order:
                nk, _nc = ngram_data[k]
                pos2 = _row_searchsorted(keys, nk[:, :-1])
                n1p = np.bincount(pos2, minlength=len(keys))
                bw = np.where(
                    n1p > 0,
                    np.clip(discount * n1p / counts, 1e-3, 0.9),
                    np.nan)
                lbw = np.log10(np.where(np.isnan(bw), 1.0, bw))
            # stream in chunks; tokens formatted per row
            CH = 200_000
            for lo in range(0, len(keys), CH):
                hi = min(lo + CH, len(keys))
                rows = keys[lo:hi]
                if bw is not None:
                    chunk = [
                        ("%.6g\t%s\t%.6g" % (lp[i],
                                             " ".join(name(int(x))
                                                      for x in rows[j]),
                                             lbw[i])
                         if not np.isnan(bw[i]) else
                         "%.6g\t%s" % (lp[i],
                                       " ".join(name(int(x))
                                                for x in rows[j])))
                        for j, i in enumerate(range(lo, hi))]
                else:
                    chunk = ["%.6g\t%s" % (lp[i],
                                           " ".join(name(int(x))
                                                    for x in rows[j]))
                             for j, i in enumerate(range(lo, hi))]
                fh.write("\n".join(chunk))
                fh.write("\n")
            fh.write("\n")
        fh.write("\\end\\\n")
    return {"ngram_counts": [len(k) for k, _ in ngram_data]}


def _row_searchsorted(sorted_rows: np.ndarray, queries: np.ndarray
                      ) -> np.ndarray:
    """Index of each query row in lexicographically sorted unique rows
    (every query must be present — guaranteed for n-gram prefixes)."""
    k = sorted_rows.shape[1]
    if k == 1:
        return np.searchsorted(sorted_rows[:, 0], queries[:, 0])
    # pack columns into a single sortable int64 (ids < 2^21 each for
    # k <= 3 packs; for k == 3 use 21 bits x 3 = 63)
    bits = 63 // k
    assert sorted_rows.max() < (1 << bits)
    pack_s = np.zeros(len(sorted_rows), np.int64)
    pack_q = np.zeros(len(queries), np.int64)
    for j in range(k):
        pack_s = (pack_s << bits) | sorted_rows[:, j].astype(np.int64)
        pack_q = (pack_q << bits) | queries[:, j].astype(np.int64)
    return np.searchsorted(pack_s, pack_q)


# ---------------------------------------------------------------------------
# emission synthesis
# ---------------------------------------------------------------------------

def synth_emissions(word_seq: List[int], prons: np.ndarray,
                    n_phonemes: int, rng: np.random.Generator,
                    frames_per_state: Tuple[int, int] = (2, 4),
                    true_score: float = 1.0, confusable_score: float = 2.2,
                    noise_score: float = 6.0, jitter: float = 0.6,
                    sil_frames: Tuple[int, int] = (2, 5)):
    """(T, 3*(n_phonemes+1)) emission -log-score matrix for a word
    sequence: the true state track is cheap, each phoneme's fixed
    confusable partner is nearly as cheap (acoustic ambiguity the LM
    must resolve), everything else is expensive noise."""
    S = 3 * (n_phonemes + 1)
    sil_class = 3 * n_phonemes  # states of `si`
    confus = (np.arange(n_phonemes) + 1) % n_phonemes
    track: List[int] = []

    def emit_phone(ph: int):
        for st in range(3):
            for _ in range(int(rng.integers(*frames_per_state))):
                track.append(3 * ph + st)

    for _ in range(int(rng.integers(*sil_frames))):
        track.append(sil_class)
    for w in word_seq:
        for ph in prons[w]:
            if ph < 0:
                break
            emit_phone(int(ph))
    for _ in range(int(rng.integers(*sil_frames))):
        track.append(sil_class)
    T = len(track)
    scores = rng.normal(noise_score, jitter, size=(T, S))
    t_idx = np.arange(T)
    true_c = np.asarray(track)
    scores[t_idx, true_c] = rng.normal(true_score, jitter * 0.5, size=T)
    # confusable partner of the true phoneme (same HMM state index)
    ph = true_c // 3
    st = true_c % 3
    is_sp = ph < n_phonemes
    conf_c = np.where(is_sp, 3 * confus[np.minimum(ph, n_phonemes - 1)]
                      + st, true_c)
    scores[t_idx, conf_c] = np.minimum(
        scores[t_idx, conf_c],
        rng.normal(confusable_score, jitter * 0.5, size=T))
    # silence states stay open everywhere at moderate cost
    return np.maximum(scores, 0.05).astype(np.float32)
