"""ARPA back-off n-gram language model.

Re-creates the reference Lm::ArpaLm (src/Lm/ArpaLm.hh:70 over
BackingOff.hh:33): \\data\\ header, per-order blocks of
``log10(p) <tokens...> [log10(backoff)]``.  Scores are converted to the
framework convention -ln(p) (the reference multiplies by ln 10,
src/Lm/ArpaLm.cc:102).

History handles are immutable tuples managed per-LM (reference History /
HistoryManager, src/Lm/LanguageModel.hh:74); batch scoring returns a dense
(n_histories, vocab) matrix for search lookahead and device-side fusion
(compileBatchRequest/getBatch, src/Lm/LanguageModel.hh:542-552).
"""

from __future__ import annotations

import gzip
import math
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

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


class ArpaLm(LanguageModel):
    def __init__(self, path: Optional[str] = None, unknown_token: str = UNKNOWN):
        # ngrams[order][tuple(tokens)] = (score -ln p, backoff -ln bow)
        self._ngrams: List[Dict[Tuple[str, ...], Tuple[float, float]]] = []
        self.order = 0
        self.unknown = unknown_token
        self.vocabulary: List[str] = []
        if path:
            self.load(path)

    # -- loading ------------------------------------------------------------

    def load(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8", errors="replace") as fh:
            self._parse(fh)

    def _parse(self, fh) -> None:
        section = None
        counts: List[int] = []
        for raw in fh:
            line = raw.strip()
            if not line:
                continue
            if line == "\\data\\":
                section = "data"
                continue
            if line.startswith("\\") and line.endswith("-grams:"):
                order = int(line[1:line.index("-")])
                while len(self._ngrams) < order:
                    self._ngrams.append({})
                section = order
                continue
            if line == "\\end\\":
                break
            if section == "data":
                if line.startswith("ngram"):
                    counts.append(int(line.split("=")[1]))
                continue
            if isinstance(section, int):
                parts = line.split("\t") if "\t" in line else line.split()
                if "\t" in line:
                    # log10p \t tokens [\t backoff]
                    log10p = float(parts[0])
                    tokens = tuple(parts[1].split())
                    backoff = float(parts[2]) if len(parts) > 2 else 0.0
                else:
                    log10p = float(parts[0])
                    if len(parts) >= section + 2:
                        tokens = tuple(parts[1:1 + section])
                        backoff = float(parts[1 + section])
                    else:
                        tokens = tuple(parts[1:1 + section])
                        backoff = 0.0
                self._ngrams[section - 1][tokens] = (-log10p * LN10,
                                                     -backoff * LN10)
        self.order = len(self._ngrams)
        self.vocabulary = [t[0] for t in self._ngrams[0]] if self._ngrams else []

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
                    and history in self._ngrams[len(history) - 1]):
                break
            history = history[1:]
        return history

    # -- scoring ---------------------------------------------------------------

    def _lookup(self, tokens: Tuple[str, ...]) -> Optional[Tuple[float, float]]:
        order = len(tokens)
        if order == 0 or order > self.order:
            return None
        return self._ngrams[order - 1].get(tokens)

    def score(self, history: Tuple[str, ...], token: str) -> float:
        """Backing-off: p(w|h) = p(w|h) if h,w exists else bow(h)*p(w|h')."""
        if not self._ngrams:
            return INF_SCORE
        h = tuple(history)[-(self.order - 1):] if self.order > 1 else ()
        total_backoff = 0.0
        while True:
            entry = self._lookup(h + (token,))
            if entry is not None:
                return total_backoff + entry[0]
            if not h:
                break
            h_entry = self._lookup(h)
            if h_entry is not None:
                total_backoff += h_entry[1]
            h = h[1:]
        # unigram fallback / unknown
        entry = self._ngrams[0].get((self.unknown,))
        if entry is not None:
            return total_backoff + entry[0]
        return INF_SCORE

    def score_batch(self, histories, tokens) -> np.ndarray:
        out = np.empty((len(histories), len(tokens)), dtype=np.float32)
        for i, h in enumerate(histories):
            for j, t in enumerate(tokens):
                out[i, j] = self.score(h, t)
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
