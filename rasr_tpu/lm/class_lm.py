"""Class-based language model: p(w|h) = q(w|class) * p(class|class history).

Re-creates the reference Lm::ClassMapping / Lm::ArpaClassLm semantics
(src/Lm/ClassLm.hh:31, src/Lm/ClassLm.cc:61 load format,
src/Lm/ArpaLm.cc:240-281 scoring): a text mapping file assigns each
(syntactic) token to a class with an optional unnormalized emission
weight; weights are normalized within each class and stored as
-ln(q / sum_class q).  The n-gram model is trained over class tokens;
per-word scores add the scaled class-emission score.

Mapping file format (one entry per line, '#'/';' comments):
    <token> <class> [q(<token>|<class>)]
Tokens without an entry receive an identity-class mapping with q=1
(src/Lm/ClassLm.cc:104-121).
"""

from __future__ import annotations

import gzip
import math
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from .arpa import SENTENCE_END, ArpaLm, LanguageModel


def _open_text(path: str):
    if path.endswith(".gz"):
        return gzip.open(path, "rt", encoding="utf-8")
    return open(path, "r", encoding="utf-8")


class ClassMapping:
    """token -> (class token, emission score -ln q(token|class))."""

    def __init__(self, vocabulary: Optional[Iterable[str]] = None):
        self._map: Dict[str, Tuple[str, float]] = {}
        self._members: Dict[str, List[str]] = {}
        self._vocabulary = list(vocabulary) if vocabulary is not None else []
        self.warnings: List[str] = []

    def load(self, path: str) -> None:
        raw: Dict[str, Tuple[str, float]] = {}
        with _open_text(path) as fh:
            for line in fh:
                parts = line.split()
                if not parts or parts[0][0] in "#;":
                    continue
                token = parts[0]
                if len(parts) < 2:
                    continue
                cls = parts[1]
                q = float(parts[2]) if len(parts) > 2 else 1.0
                if self._vocabulary and token not in self._vocabulary:
                    self.warnings.append(
                        f"unknown syntactic token \"{token}\" in class file")
                    continue
                if token in raw:
                    self.warnings.append(
                        f"duplicated entry for \"{token}\"; discarded")
                    continue
                raw[token] = (cls, q)
        # identity mappings for uncovered vocabulary tokens
        for token in self._vocabulary:
            if token not in raw:
                raw[token] = (token, 1.0)
        self._finish(raw)

    def _finish(self, raw: Dict[str, Tuple[str, float]]) -> None:
        sums: Dict[str, float] = {}
        members: Dict[str, List[str]] = {}
        for token, (cls, q) in raw.items():
            sums[cls] = sums.get(cls, 0.0) + q
            members.setdefault(cls, []).append(token)
        self._members = members
        self._map = {token: (cls, -math.log(q / sums[cls]))
                     for token, (cls, q) in raw.items()}

    @classmethod
    def from_dict(cls, mapping: Dict[str, Tuple[str, float]],
                  vocabulary: Optional[Iterable[str]] = None
                  ) -> "ClassMapping":
        m = cls(vocabulary)
        raw = dict(mapping)
        for token in m._vocabulary:
            if token not in raw:
                raw[token] = (token, 1.0)
        m._finish(raw)
        return m

    def class_token(self, token: str) -> str:
        entry = self._map.get(token)
        return entry[0] if entry else token

    def class_emission_score(self, token: str) -> float:
        entry = self._map.get(token)
        return entry[1] if entry else 0.0

    def __getitem__(self, token: str) -> Tuple[str, float]:
        return self._map.get(token, (token, 0.0))

    def classes(self) -> List[str]:
        return sorted(self._members)

    def members(self, cls: str) -> List[str]:
        return list(self._members.get(cls, []))


class ClassArpaLm(LanguageModel):
    """ARPA n-gram over class tokens + class-emission scores
    (reference lm type ``ARPA+classes``, src/Lm/Module.cc:65,87).

    score(h, w) = arpa.score(class_history, class(w))
                  + class_emission_scale * (-ln q(w | class(w)))
    Histories are tuples of CLASS tokens (src/Lm/ArpaLm.cc:264-266).
    """

    def __init__(self, arpa: ArpaLm, mapping: ClassMapping,
                 class_emission_scale: float = 1.0):
        self.arpa = arpa
        self.mapping = mapping
        self.class_emission_scale = class_emission_scale

    @classmethod
    def load(cls, arpa_path: str, classes_path: str,
             vocabulary: Optional[Iterable[str]] = None,
             class_emission_scale: float = 1.0) -> "ClassArpaLm":
        mapping = ClassMapping(vocabulary)
        mapping.load(classes_path)
        return cls(ArpaLm(arpa_path), mapping, class_emission_scale)

    def initial_history(self):
        return self.arpa.initial_history()

    def extended_history(self, history, token):
        return self.arpa.extended_history(
            history, self.mapping.class_token(token))

    def score(self, history, token: str) -> float:
        cls, emission = self.mapping[token]
        return (self.arpa.score(history, cls)
                + self.class_emission_scale * emission)

    def sentence_end_score(self, history) -> float:
        return self.score(history, SENTENCE_END)
