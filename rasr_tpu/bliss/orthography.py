"""Orthographic parsing: sentence -> lemma graph.

Re-creates Bliss::OrthographicParser (src/Bliss/OrthographicParser.hh:50,
.cc:79 parse): character positions of the whitespace-normalized sentence
(with trailing blank) are graph nodes; every lexicon orthographic form
matching a substring [i, j) adds an edge labeled with its lemma — this
yields ALL tokenizations including multi-word orthographic forms and
alternative lemmas sharing a form (the greedy single-path lookup lives in
speech.allophone_graph; this is the full lemma-graph variant).  The
silence lemma matches the empty string at every node; unknown words fall
back to the unknown lemma (or a skip edge) exactly as
Handler::newUnmatchableEdge does.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from .lexicon import Lemma, Lexicon


@dataclass
class LemmaEdge:
    source: int
    target: int
    lemma: Optional[Lemma]      # None = skipped unknown word
    orth: str = ""


@dataclass
class LemmaGraph:
    """Acyclic lemma graph over character positions."""
    edges: List[LemmaEdge] = field(default_factory=list)
    initial: int = 0
    final: int = 0
    n_nodes: int = 0

    def successors(self, node: int) -> List[LemmaEdge]:
        return [e for e in self.edges if e.source == node]

    def paths(self, max_paths: int = 1000) -> List[List[Lemma]]:
        """All lemma sequences initial -> final (silence edges included
        as their lemma; skipped unknowns omitted)."""
        out: List[List[Lemma]] = []
        stack: List[Tuple[int, List[Lemma]]] = [(self.initial, [])]
        succ: Dict[int, List[LemmaEdge]] = {}
        for e in self.edges:
            succ.setdefault(e.source, []).append(e)
        while stack and len(out) < max_paths:
            node, prefix = stack.pop()
            if node == self.final:
                out.append(prefix)
                continue
            for e in succ.get(node, []):
                if e.target == node:
                    continue  # silence self-loops do not advance
                stack.append((e.target,
                              prefix + ([e.lemma] if e.lemma else [])))
        return out


class OrthographicParser:
    """Parses orthography into a LemmaGraph against a lexicon."""

    def __init__(self, lexicon: Lexicon,
                 allow_silence_repetitions: bool = True):
        self.lexicon = lexicon
        self.allow_silence_repetitions = allow_silence_repetitions
        self.unknown_lemma = lexicon.special_lemma("unknown")
        self.silence_lemma = lexicon.special_lemma("silence")
        # forms with trailing blank, matched at character level
        self._forms: Dict[str, List[Lemma]] = {}
        for lemma in lexicon.lemmas:
            for orth in lemma.orths:
                if orth:
                    self._forms.setdefault(orth + " ", []).append(lemma)

    def parse(self, orth: str) -> LemmaGraph:
        text = " ".join(orth.split())
        if text:
            text += " "
        length = len(text)
        graph = LemmaGraph()
        nodes: List[Optional[int]] = [None] * (length + 1)
        next_node = 0

        def node_at(pos: int) -> int:
            nonlocal next_node
            if nodes[pos] is None:
                nodes[pos] = next_node
                next_node += 1
            return nodes[pos]

        right_most = 0
        node_at(0)
        for i in range(length + 1):
            if nodes[i] is None:
                continue
            # silence matches the empty orthography at every node
            if self.silence_lemma is not None:
                if self.allow_silence_repetitions:
                    graph.edges.append(LemmaEdge(
                        node_at(i), node_at(i), self.silence_lemma, ""))
            # all forms matching at i
            for form, lemmas in self._forms.items():
                j = i + len(form)
                if j <= length and text[i:j] == form:
                    for lemma in lemmas:
                        graph.edges.append(LemmaEdge(
                            node_at(i), node_at(j), lemma, form.strip()))
                    right_most = max(right_most, j)
            if i == right_most and i < length:
                # unmatchable word: skip to one past the next blank
                j = i
                while j < length and text[j] != " ":
                    j += 1
                j += 1
                word = text[i:j].strip()
                graph.edges.append(LemmaEdge(node_at(i), node_at(j),
                                             self.unknown_lemma, word))
                right_most = j
        graph.initial = node_at(0)
        graph.final = node_at(length)
        graph.n_nodes = next_node
        return graph

    def lemmas(self, orth: str) -> List[Lemma]:
        """All lemmas whose orthographic form equals the full string
        (OrthographicParser::lemmas)."""
        text = " ".join(orth.split()) + " "
        return list(self._forms.get(text, []))
