"""Orthographic lemma-graph parser: alternative tokenizations,
multi-word forms, unknown fallback, silence edges."""

import pytest

from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.bliss.orthography import OrthographicParser


@pytest.fixture()
def lexicon():
    lex = Lexicon()
    for orths in (["new"], ["york"], ["new york"], ["a"], ["b"]):
        lemma = lex.new_lemma(name=orths[0])
        lemma.orths.extend(orths)
    # same orth "color"/"colour" on one lemma; an alternative lemma
    # sharing the orth "a"
    alt = lex.new_lemma(name="a-alt")
    alt.orths.append("a")
    sil = lex.new_lemma(name="si", special="silence")
    sil.orths.append("[SILENCE]")
    unk = lex.new_lemma(name="unk", special="unknown")
    unk.orths.append("[UNKNOWN]")
    return lex


class TestParse:
    def test_multiword_form_gives_two_paths(self, lexicon):
        parser = OrthographicParser(lexicon)
        graph = parser.parse("new york")
        seqs = {tuple(l.name for l in p) for p in graph.paths()}
        # "new"+"york" and the compound "new york" lemma
        assert seqs == {("new", "york"), ("new york",)}

    def test_alternative_lemmas_same_orth(self, lexicon):
        parser = OrthographicParser(lexicon)
        graph = parser.parse("a")
        paths = graph.paths()
        names = {tuple(l.name for l in p) for p in paths}
        assert ("a",) in names and ("a-alt",) in names

    def test_unknown_word_fallback(self, lexicon):
        parser = OrthographicParser(lexicon)
        graph = parser.parse("a zzz b")
        paths = graph.paths()
        assert paths
        for p in paths:
            assert [l.name for l in p][1] == "unk"

    def test_silence_self_edges_present(self, lexicon):
        parser = OrthographicParser(lexicon)
        graph = parser.parse("a")
        self_loops = [e for e in graph.edges if e.source == e.target]
        assert self_loops and all(e.lemma.special == "silence"
                                  for e in self_loops)

    def test_suppressed_silence(self, lexicon):
        parser = OrthographicParser(lexicon,
                                    allow_silence_repetitions=False)
        graph = parser.parse("a")
        assert not [e for e in graph.edges if e.source == e.target]

    def test_lemmas_full_match(self, lexicon):
        parser = OrthographicParser(lexicon)
        got = parser.lemmas("new york")
        assert [l.name for l in got] == ["new york"]
        assert parser.lemmas("zzz") == []
