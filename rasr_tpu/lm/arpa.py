"""ARPA back-off n-gram language model, trie-backed.

Re-creates the reference Lm::ArpaLm (src/Lm/ArpaLm.hh:70 over
BackingOff.hh:33): \\data\\ header, per-order blocks of
``log10(p) <tokens...> [log10(backoff)]``.  Scores are converted to the
framework convention -ln(p) (the reference multiplies by ln 10,
src/Lm/ArpaLm.cc:102).

Storage (production-scale, the reference's BackingOff trie redesigned
around numpy):

  * vocabulary interning: token -> int id; order-1 scores/backoffs are
    dense (V,) float32 arrays;
  * order-k (k>=2) n-grams are rows of three parallel arrays sorted by an
    int64 key ``parent_node * V + word_id`` where ``parent_node`` is the
    trie node of the (k-1)-prefix; a node id at order k is the row index.
    Child lookup and children-range enumeration are O(log N) searchsorted.

Scoring is exposed three ways:

  * ``score(history, token)`` — scalar backing-off walk;
  * ``score_dense(history)`` — the FULL (V,) vector -ln p(.|h) in a few
    vectorized ops (base = unigram + cumulated backoffs, then overwrite
    the explicit children ranges of each history suffix).  This is the
    equivalent of the reference's compileBatchRequest/getBatch bulk API
    (src/Lm/LanguageModel.hh:542-552) and what LM lookahead table fills
    use;
  * ``score_batch(histories, tokens)`` — dense per history, gathered at
    the requested token columns.

History handles remain immutable tuples of token strings (reference
History / HistoryManager, src/Lm/LanguageModel.hh:74), so wrapping LMs
(class/combine/cheating) compose unchanged.
"""

from __future__ import annotations

import gzip
import math
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

LN10 = math.log(10.0)
INF_SCORE = 1e30  # -ln(0)

SENTENCE_BEGIN = "<s>"
SENTENCE_END = "</s>"
UNKNOWN = "<unk>"


class LanguageModel:
    """Interface (reference src/Lm/LanguageModel.hh:297)."""

    def initial_history(self) -> Tuple[str, ...]:
        raise NotImplementedError

    def extended_history(self, history: Tuple[str, ...], token: str
                         ) -> Tuple[str, ...]:
        raise NotImplementedError

    def score(self, history: Tuple[str, ...], token: str) -> float:
        """-ln p(token | history)."""
        raise NotImplementedError

    def sentence_end_score(self, history: Tuple[str, ...]) -> float:
        return self.score(history, SENTENCE_END)

    def score_batch(self, histories: Sequence[Tuple[str, ...]],
                    tokens: Sequence[str]) -> np.ndarray:
        """(n_histories, n_tokens) matrix of -ln p."""
        return np.asarray([[self.score(h, t) for t in tokens]
                           for h in histories], dtype=np.float32)

    def sequence_score(self, tokens: Sequence[str],
                       with_sentence_end: bool = True) -> float:
        h = self.initial_history()
        total = 0.0
        for t in tokens:
            total += self.score(h, t)
            h = self.extended_history(h, t)
        if with_sentence_end:
            total += self.sentence_end_score(h)
        return total

    def set_search_space_info(self, info: Dict) -> None:
        """Search-space-aware hook (reference
        src/Lm/SearchSpaceAwareLanguageModel.hh:38): the search passes
        per-frame hypothesis statistics ({"frame", "active_states",
        "active_histories"}) so batching LMs can schedule their
        forwards.  Default: ignore."""
        return None


class ArpaLm(LanguageModel):
    def __init__(self, path: Optional[str] = None, unknown_token: str = UNKNOWN):
        self.order = 0
        self.unknown = unknown_token
        self._tokens: List[str] = []          # id -> token
        self._tid: Dict[str, int] = {}        # token -> id
        self._uni_score = np.zeros(0, np.float32)
        self._uni_bow = np.zeros(0, np.float32)
        # per order k>=2 (index k-2): sorted int64 keys + parallel arrays
        self._keys: List[np.ndarray] = []
        self._scores: List[np.ndarray] = []
        self._bows: List[np.ndarray] = []
        self._dropped = 0                     # n-grams with missing prefix
        if path:
            self.load(path)

    # -- vocabulary -----------------------------------------------------------

    @property
    def vocabulary(self) -> List[str]:
        return self._tokens

    def token_id(self, token: str) -> int:
        """id or -1 when out of vocabulary."""
        return self._tid.get(token, -1)

    def _get_or_add(self, token: str) -> int:
        i = self._tid.get(token)
        if i is None:
            i = len(self._tokens)
            self._tid[token] = i
            self._tokens.append(token)
        return i

    # -- loading ------------------------------------------------------------

    def load(self, path: str, image_cache: bool = True) -> None:
        """Parse an ARPA file; with image_cache (default) a binary trie
        image is written next to the file on first parse and mmap-loaded
        on subsequent loads (the reference caches LM-derived binary images
        the same way, src/Core/MappedArchive.hh:72)."""
        import os
        image = path + ".trie.npz"
        if image_cache and os.path.exists(image):
            try:
                st = os.stat(path)
                if self._load_image(image, st.st_size, st.st_mtime_ns):
                    return
            except (OSError, ValueError, KeyError):
                pass
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as fh:
            self._parse(fh)
        if image_cache:
            try:
                st = os.stat(path)
                self._save_image(image, st.st_size, st.st_mtime_ns)
            except OSError:
                pass

    def _save_image(self, image_path: str, src_size: int,
                    src_mtime_ns: int) -> None:
        arrays = {
            "meta": np.asarray([self.order, src_size, src_mtime_ns],
                               np.int64),
            "tokens": np.asarray(self._tokens),
            "uni_score": self._uni_score,
            "uni_bow": self._uni_bow,
            "unknown": np.asarray([self.unknown]),
        }
        for i, (k, s, b) in enumerate(zip(self._keys, self._scores,
                                          self._bows)):
            arrays[f"keys{i}"] = k
            arrays[f"scores{i}"] = s
            arrays[f"bows{i}"] = b
        tmp = image_path + ".tmp"
        with open(tmp, "wb") as fh:
            np.savez(fh, **arrays)
        import os
        os.replace(tmp, image_path)

    def _load_image(self, image_path: str, src_size: int,
                    src_mtime_ns: int) -> bool:
        data = np.load(image_path, allow_pickle=False)
        meta = data["meta"]
        if int(meta[1]) != src_size or int(meta[2]) != src_mtime_ns:
            return False
        self.order = int(meta[0])
        self._tokens = [str(t) for t in data["tokens"]]
        self._tid = {t: i for i, t in enumerate(self._tokens)}
        self._uni_score = data["uni_score"]
        self._uni_bow = data["uni_bow"]
        self.unknown = str(data["unknown"][0])
        self._keys, self._scores, self._bows = [], [], []
        for i in range(self.order - 1):
            self._keys.append(data[f"keys{i}"])
            self._scores.append(data[f"scores{i}"])
            self._bows.append(data[f"bows{i}"])
        return True

    def _parse(self, fh) -> None:
        self._parse_text(fh.read())

    def _parse_text(self, text: str) -> None:
        """Slice the \\k-grams: sections as raw text blocks (no per-line
        Python for the bulk path)."""
        import re
        per_order: List[str] = []
        markers = list(re.finditer(r"\\(\d+)-grams:[ \t]*\n", text))
        endm = re.search(r"\n\\end\\", text)
        for i, m in enumerate(markers):
            k = int(m.group(1))
            stop = (markers[i + 1].start() if i + 1 < len(markers)
                    else (endm.start() if endm else len(text)))
            while len(per_order) < k:
                per_order.append("")
            per_order[k - 1] = text[m.end():stop]
        self._build(per_order)

    def _build(self, per_order: List[str]) -> None:
        """Assemble the trie arrays order by order from raw text blocks."""
        self.order = len(per_order)
        # pass 1: unigrams define the vocabulary
        parsed = (self._parse_block_fast(1, per_order[0], build_vocab=True)
                  if per_order else None)
        if parsed is None and per_order:
            parsed = self._parse_block_slow(1, per_order[0])
        if parsed is None:
            sc1 = np.zeros(0, np.float32)
            ids1 = np.zeros((0, 1), np.int64)
            bo1 = np.zeros(0, np.float32)
        else:
            sc1, ids1, bo1 = parsed
        V = len(self._tokens)
        self._uni_score = np.full(V, INF_SCORE, np.float32)
        self._uni_bow = np.zeros(V, np.float32)
        self._uni_score[ids1[:, 0]] = -sc1 * LN10
        self._uni_bow[ids1[:, 0]] = -bo1 * LN10
        # higher orders: vectorized key construction + sort
        self._keys, self._scores, self._bows = [], [], []
        self._dropped = 0
        for k in range(2, self.order + 1):
            parsed = self._parse_block_fast(k, per_order[k - 1])
            if parsed is None:
                parsed = self._parse_block_slow(k, per_order[k - 1])
            sc, ids, bo = parsed
            n = len(sc)
            if not (k < self.order):
                bo = np.zeros(n, np.float32)
            if len(self._tokens) != V:
                # tokens first seen above order 1 (malformed but tolerated):
                # grow the unigram arrays with -inf prob entries
                grow = len(self._tokens) - V
                self._uni_score = np.concatenate(
                    [self._uni_score, np.full(grow, INF_SCORE, np.float32)])
                self._uni_bow = np.concatenate(
                    [self._uni_bow, np.zeros(grow, np.float32)])
                V = len(self._tokens)
            sc = sc * -LN10
            bo = bo * -LN10
            # parent node of (t1..tk) = trie node of the (k-1)-prefix
            parent = ids[:, 0]
            ok = np.ones(n, bool)
            for j in range(1, k - 1):
                parent, valid = self._child_vec(j, parent, ids[:, j])
                ok &= valid
            keys = parent * V + ids[:, k - 1]
            self._dropped += int(n - ok.sum())
            keys, sc, bo = keys[ok], sc[ok], bo[ok]
            perm = np.argsort(keys, kind="stable")
            self._keys.append(keys[perm])
            self._scores.append(np.ascontiguousarray(sc[perm], np.float32))
            self._bows.append(np.ascontiguousarray(bo[perm], np.float32))

    def _parse_block_fast(self, k: int, block: str,
                          build_vocab: bool = False) -> Optional[tuple]:
        """Bulk-parse one n-gram block (raw text) with the pandas C csv
        reader (~10x the pure-Python tokenizer on multi-million-line
        models).  Returns None when pandas is unavailable or the block
        isn't plain single-space/tab separated — the caller falls back."""
        if not block.strip():
            return (np.zeros(0, np.float32), np.zeros((0, k), np.int64),
                    np.zeros(0, np.float32))
        try:
            import io as _io

            import pandas as pd
        except ImportError:
            return None
        try:
            df = pd.read_csv(_io.StringIO(block.replace("\t", " ")),
                             sep=" ", header=None, engine="c", quoting=3,
                             keep_default_na=False, skip_blank_lines=True)
        except Exception:
            return None
        if not (1 + k <= df.shape[1] <= 2 + k):
            return None
        sc = pd.to_numeric(df[0], errors="coerce").to_numpy(np.float32)
        if np.isnan(sc).any():
            return None  # unexpected layout (e.g. doubled separators)
        if df.shape[1] == 2 + k:
            bo = pd.to_numeric(df[1 + k], errors="coerce")
            bo = bo.astype(np.float32).fillna(0.0).to_numpy(np.float32)
        else:
            bo = np.zeros(len(df), np.float32)
        for j in range(k):
            # a fully numeric-looking vocabulary column would lose its
            # spelling ("007" -> 7); let the exact tokenizer handle it
            if df[1 + j].dtype.kind not in "OUS":
                return None
        word_cols = (pd.concat([df[1 + j] for j in range(k)],
                               ignore_index=True)
                     if k > 1 else df[1])
        # one hash pass over all word columns, then map the (small) set of
        # distinct tokens through the vocabulary
        codes, uniques = pd.factorize(word_cols)
        uniq = [str(u) for u in uniques]
        if build_vocab:
            uid = np.asarray([self._get_or_add(u) for u in uniq], np.int64)
        else:
            uid = np.asarray([self._tid.get(u, -1) for u in uniq], np.int64)
            if (uid < 0).any():  # tokens first seen above order 1 (rare)
                for i in np.nonzero(uid < 0)[0]:
                    uid[i] = self._get_or_add(uniq[i])
        flat_ids = uid[codes]
        ids = flat_ids.reshape(k, len(df)).T.astype(np.int64)
        return sc, ids, bo

    def _parse_block_slow(self, k: int, block: str) -> tuple:
        """Pure-Python per-line tokenizer (robust fallback)."""
        splits = [s for s in (line.split() for line in block.split("\n"))
                  if s]
        n = len(splits)
        sc = (np.array([s[0] for s in splits], np.float32)
              if n else np.zeros(0, np.float32))
        bo = (np.array([s[1 + k] if len(s) > 1 + k else 0.0
                        for s in splits], np.float32)
              if n else np.zeros(0, np.float32))
        ids = np.empty((n, k), np.int64)
        tid = self._tid
        for j in range(k):
            col = [tid.get(s[1 + j], -1) for s in splits]
            miss = [i for i, v in enumerate(col) if v < 0]
            for i in miss:  # tokens first seen above order 1 (rare)
                col[i] = self._get_or_add(splits[i][1 + j])
            ids[:, j] = col
        return sc, ids, bo

    def _child_vec(self, parent_order: int, parents: np.ndarray,
                   words: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized child lookup: nodes (order parent_order+1) reached from
        `parents` (order parent_order) via `words`. Returns (nodes, valid)."""
        V = len(self._tokens)
        keys = self._keys[parent_order - 1]
        if len(keys) == 0:
            invalid = np.zeros(len(parents), bool)
            return np.full(len(parents), -1, np.int64), invalid
        want = parents * V + words
        pos = np.searchsorted(keys, want)
        pos_c = np.minimum(pos, len(keys) - 1)
        valid = (keys[pos_c] == want) & (parents >= 0)
        return np.where(valid, pos_c, -1), valid

    # -- trie lookups ---------------------------------------------------------

    def _child(self, parent_order: int, parent: int, word: int) -> int:
        """Node id (or -1) of the order-(parent_order+1) n-gram reached from
        `parent` (an order-parent_order node) by `word`."""
        if parent < 0 or word < 0:
            return -1
        keys = self._keys[parent_order - 1]
        want = parent * len(self._tokens) + word
        pos = int(np.searchsorted(keys, want))
        if pos < len(keys) and keys[pos] == want:
            return pos
        return -1

    def _node(self, ids: Sequence[int]) -> int:
        """Trie node of a token-id sequence; -1 if absent."""
        k = len(ids)
        if k == 0 or k > self.order:
            return -1
        node = ids[0]
        if node < 0 or node >= len(self._tokens):
            return -1
        if k == 1:
            return node if self._uni_score[node] < INF_SCORE else -1
        for j in range(1, k):
            node = self._child(j, node, ids[j])
            if node < 0:
                return -1
        return node

    def _ids(self, tokens: Sequence[str]) -> List[int]:
        return [self._tid.get(t, -1) for t in tokens]

    def lookup(self, tokens: Tuple[str, ...]
               ) -> Optional[Tuple[float, float]]:
        """(score -ln p, backoff -ln bow) of an explicit n-gram, else None."""
        k = len(tokens)
        if k == 0 or k > self.order:
            return None
        ids = self._ids(tokens)
        if any(i < 0 for i in ids):
            return None
        if k == 1:
            s = float(self._uni_score[ids[0]])
            if s >= INF_SCORE:
                return None
            return s, float(self._uni_bow[ids[0]])
        node = self._node(ids)
        if node < 0:
            return None
        return (float(self._scores[k - 2][node]),
                float(self._bows[k - 2][node]))

    # backwards-compatible internal name
    _lookup = lookup

    def ngram_count(self, order: int) -> int:
        if order == 1:
            return int((self._uni_score < INF_SCORE).sum())
        if 2 <= order <= self.order:
            return len(self._keys[order - 2])
        return 0

    def iter_ngrams(self, order: int
                    ) -> Iterator[Tuple[Tuple[str, ...], float, float]]:
        """Yield (tokens, -ln p, -ln bow) for every explicit n-gram."""
        if order == 1:
            for w in range(len(self._tokens)):
                s = float(self._uni_score[w])
                if s < INF_SCORE:
                    yield (self._tokens[w],), s, float(self._uni_bow[w])
            return
        if not (2 <= order <= self.order):
            return
        # reconstruct token tuples by walking parents; build the parent ->
        # tokens map once per order (iteration is an offline/IO path)
        prefix = {w: (self._tokens[w],) for w in range(len(self._tokens))}
        for k in range(2, order):
            keys = self._keys[k - 2]
            V = len(self._tokens)
            nxt = {}
            for node in range(len(keys)):
                p, w = divmod(int(keys[node]), V)
                nxt[node] = prefix[p] + (self._tokens[w],)
            prefix = nxt
        keys = self._keys[order - 2]
        V = len(self._tokens)
        for node in range(len(keys)):
            p, w = divmod(int(keys[node]), V)
            yield (prefix[p] + (self._tokens[w],),
                   float(self._scores[order - 2][node]),
                   float(self._bows[order - 2][node]))

    def contexts(self) -> Iterator[Tuple[str, ...]]:
        """All explicit contexts (orders 1..order-1), for FSA conversion."""
        for order in range(1, self.order):
            for tokens, _s, _b in self.iter_ngrams(order):
                yield tokens

    @classmethod
    def from_ngram_dicts(cls, ngrams: List[Dict[Tuple[str, ...],
                                                Tuple[float, float]]],
                         unknown_token: str = UNKNOWN) -> "ArpaLm":
        """Build from per-order {tokens: (-ln p, -ln bow)} dicts (used by
        reverse-ARPA construction and tests)."""
        lm = cls(unknown_token=unknown_token)
        per_order: List[str] = []
        for order, table in enumerate(ngrams, start=1):
            lines = []
            for tokens, (s, b) in table.items():
                lines.append("%.9g\t%s\t%.9g"
                             % (-s / LN10, " ".join(tokens), -b / LN10))
            per_order.append("\n".join(lines))
        lm._build(per_order)
        return lm

    # -- history ---------------------------------------------------------------

    def initial_history(self) -> Tuple[str, ...]:
        return (SENTENCE_BEGIN,) if self.order > 1 else ()

    def extended_history(self, history: Tuple[str, ...], token: str
                         ) -> Tuple[str, ...]:
        if self.order <= 1:
            return ()
        h = (history + (token,))[-(self.order - 1):]
        return self.reduced_history(h)

    def reduced_history(self, history: Tuple[str, ...]) -> Tuple[str, ...]:
        """Truncate to the longest context that actually exists (keeps the
        history space small, as the reference does for tree instances)."""
        while history:
            if (len(history) <= self.order - 1
                    and self._node(self._ids(history)) >= 0):
                break
            history = history[1:]
        return history

    # -- scoring ---------------------------------------------------------------

    def score(self, history: Tuple[str, ...], token: str) -> float:
        """Backing-off: p(w|h) = p(w|h) if h,w exists else bow(h)*p(w|h')."""
        if self.order == 0:
            return INF_SCORE
        w = self._tid.get(token, -1)
        if w < 0:
            w = self._tid.get(self.unknown, -1)
            if w < 0:
                return INF_SCORE
        h = self._ids(tuple(history)[-(self.order - 1):]
                      if self.order > 1 else ())
        total_backoff = 0.0
        for start in range(len(h) + 1):
            ctx = h[start:]
            if any(i < 0 for i in ctx):
                continue
            k = len(ctx)  # n-gram order would be k+1
            if k == 0:
                s = float(self._uni_score[w])
                if s < INF_SCORE:
                    return total_backoff + s
                u = self._tid.get(self.unknown, -1)
                if u >= 0 and self._uni_score[u] < INF_SCORE:
                    return total_backoff + float(self._uni_score[u])
                return INF_SCORE
            node = self._node(ctx)
            if node >= 0:
                child = self._child(k, node, w)
                if child >= 0:
                    return total_backoff + float(self._scores[k - 1][child])
                # accumulate this context's backoff weight
                if k == 1:
                    total_backoff += float(self._uni_bow[node])
                else:
                    total_backoff += float(self._bows[k - 2][node])
        return INF_SCORE

    def score_dense(self, history: Tuple[str, ...]) -> np.ndarray:
        """-ln p(w | history) for EVERY vocabulary word, vectorized.

        Recursion dense(h) = where(child(h,w), p(h,w), bow(h) + dense(h'))
        evaluated from the empty context up: each longer suffix adds its
        backoff to all words then overwrites its explicit children range
        (contiguous because keys sort by parent)."""
        V = len(self._tokens)
        out = self._uni_score.copy()
        # vocabulary entries without a unigram fall back to <unk>
        u = self._tid.get(self.unknown, -1)
        if u >= 0 and self._uni_score[u] < INF_SCORE:
            out[out >= INF_SCORE] = float(self._uni_score[u])
        h = self._ids(tuple(history)[-(self.order - 1):]
                      if self.order > 1 else ())
        for k in range(1, len(h) + 1):
            ctx = h[-k:]
            if any(i < 0 for i in ctx):
                break
            node = self._node(ctx)
            if node < 0:
                break
            bow = (float(self._uni_bow[node]) if k == 1
                   else float(self._bows[k - 2][node]))
            keys = self._keys[k - 1]
            lo = int(np.searchsorted(keys, node * V))
            hi = int(np.searchsorted(keys, (node + 1) * V))
            out += bow
            if hi > lo:
                words = (keys[lo:hi] - node * V).astype(np.int64)
                out[words] = self._scores[k - 1][lo:hi]
        return out

    def score_batch(self, histories, tokens) -> np.ndarray:
        ids = np.asarray([self._tid.get(t, -1) for t in tokens], np.int64)
        oov = ids < 0
        ids_c = np.where(oov, 0, ids)
        out = np.empty((len(histories), len(tokens)), dtype=np.float32)
        u = self._tid.get(self.unknown, -1)
        for i, h in enumerate(histories):
            dense = self.score_dense(h)
            row = dense[ids_c]
            if oov.any():
                unk = dense[u] if u >= 0 else INF_SCORE
                row = np.where(oov, unk, row)
            out[i] = row
        return out


class Zerogram(LanguageModel):
    """Uniform LM over a vocabulary (reference 'zerogram')."""

    def __init__(self, vocabulary: Sequence[str]):
        self.vocabulary = list(vocabulary)
        self._score = math.log(max(len(self.vocabulary), 1))

    def initial_history(self):
        return ()

    def extended_history(self, history, token):
        return ()

    def score(self, history, token):
        return self._score


class CombineLm(LanguageModel):
    """Log-linear combination (reference 'combine', src/Lm/CombineLm)."""

    def __init__(self, lms: Sequence[LanguageModel],
                 scales: Optional[Sequence[float]] = None):
        self.lms = list(lms)
        self.scales = list(scales) if scales else [1.0] * len(self.lms)

    def initial_history(self):
        return tuple(lm.initial_history() for lm in self.lms)

    def extended_history(self, history, token):
        return tuple(lm.extended_history(h, token)
                     for lm, h in zip(self.lms, history))

    def score(self, history, token):
        return sum(s * lm.score(h, token)
                   for s, lm, h in zip(self.scales, self.lms, history))

    def score_batch(self, histories, tokens):
        total = None
        for i, (s, lm) in enumerate(zip(self.scales, self.lms)):
            part = s * lm.score_batch([h[i] for h in histories], tokens)
            total = part if total is None else total + part
        return total


class ScaledLanguageModel(LanguageModel):
    """Scale wrapper (reference ScaledLanguageModel)."""

    def __init__(self, lm: LanguageModel, scale: float):
        self.lm = lm
        self._scale = scale

    @property
    def scale(self) -> float:
        return self._scale

    def set_scale(self, scale: float) -> None:
        self._scale = scale

    def initial_history(self):
        return self.lm.initial_history()

    def extended_history(self, history, token):
        return self.lm.extended_history(history, token)

    def score(self, history, token):
        return self._scale * self.lm.score(history, token)

    def score_batch(self, histories, tokens):
        return self._scale * self.lm.score_batch(histories, tokens)
