"""WFST decoder tests: L and G construction, composition, decoding with
and without LM; agreement with the dynamic tree search."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.fsa.automaton import EPS, best_path
from rasr_tpu.lm import ArpaLm
from rasr_tpu.nn.label_scorer import NoOpLabelScorer
from rasr_tpu.search.tree_timesync import TreeTimesyncBeamSearch
from rasr_tpu.search.wfst import (WfstDecoder, arpa_to_automaton,
                                  build_decoding_graph,
                                  lexicon_to_transducer)

LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>blank</symbol><variation>none</variation></phoneme>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
        <phoneme><symbol>c</symbol></phoneme>
      </phoneme-inventory>
      <lemma special="blank"><orth>[blank]</orth><phon>blank</phon></lemma>
      <lemma><orth>AB</orth><phon>a b</phon></lemma>
      <lemma><orth>CA</orth><phon>c a</phon></lemma>
    </lexicon>
""")

ARPA = """\
\\data\\
ngram 1=4

\\1-grams:
-0.3\t</s>
-99\t<s>
-0.2\tAB
-0.9\tCA

\\end\\
"""


@pytest.fixture
def lexicon(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    return lex


def posteriors(seq, V=4, frames_per=2, p=0.93):
    rows = []
    for t in seq:
        for _ in range(frames_per):
            r = np.full(V, (1 - p) / (V - 1))
            r[t] = p
            rows.append(r)
    return np.log(np.asarray(rows, dtype=np.float32))


class TestGraphs:
    def test_lexicon_transducer_accepts_words(self, lexicon):
        L = lexicon_to_transducer(lexicon)
        # tokens: a=1 b=2 c=3 ; AB = [1, 2]
        assert L.accepts([1, 2]) < float("inf")
        assert L.accepts([2, 1]) == float("inf")
        # closed: two words in sequence
        assert L.accepts([1, 2, 3, 1]) < float("inf")

    def test_arpa_automaton(self, lexicon, tmp_path):
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(ARPA)
        lm = ArpaLm(str(arpa))
        G = arpa_to_automaton(lm, lexicon)
        ab = lexicon.lemma_by_orth("AB").id + 1
        ca = lexicon.lemma_by_orth("CA").id + 1
        import math
        LN10 = math.log(10)
        assert abs(G.accepts([ab]) - (0.2 + 0.3) * LN10) < 1e-4
        assert abs(G.accepts([ca, ab]) - (0.9 + 0.2 + 0.3) * LN10) < 1e-4

    def test_composition(self, lexicon, tmp_path):
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(ARPA)
        lm = ArpaLm(str(arpa))
        graph = build_decoding_graph(lexicon, lm)
        assert graph.n_states > 0
        # the composed graph accepts token sequences of legal words
        assert graph.accepts([1, 2]) < float("inf")
        assert graph.accepts([2, 1]) == float("inf")


class TestWfstDecoding:
    def test_no_lm(self, lexicon):
        graph = build_decoding_graph(lexicon)
        dec = WfstDecoder(graph, beam_size=16)
        lp = posteriors([1, 2, 0, 3, 1])
        assert dec.recognize(lp, lexicon) == ["AB", "CA"]

    def test_with_lm_matches_tree_search(self, lexicon, tmp_path):
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(ARPA)
        lm = ArpaLm(str(arpa))
        graph = build_decoding_graph(lexicon, lm, lm_scale=1.0)
        dec = WfstDecoder(graph, beam_size=32)
        for seq, expected in [([1, 2], ["AB"]), ([3, 1], ["CA"]),
                              ([1, 2, 3, 1], ["AB", "CA"])]:
            lp = posteriors(seq)
            got = dec.recognize(lp, lexicon)
            tree = TreeTimesyncBeamSearch(
                NoOpLabelScorer(4), lexicon, lm=lm, lm_scale=1.0,
                beam_size=32, blank_index=0)
            tree_words = tree.recognize_segment(lp)
            assert got == expected == tree_words, (seq, got, tree_words)


@pytest.fixture
def lm(tmp_path):
    arpa = tmp_path / "lm_fixture.arpa"
    arpa.write_text(ARPA)
    return ArpaLm(str(arpa))


class TestGraphImageCache:
    def test_cache_roundtrip_and_staleness(self, lexicon, lm, tmp_path):
        path = str(tmp_path / "graph.image")
        deps = {"lexicon": "v1", "lm-scale": 1.0}
        g1 = build_decoding_graph(lexicon, lm, cache_path=path,
                                  dependencies=deps)
        assert (tmp_path / "graph.image").exists()
        # second build loads the image (mutate nothing -> same language)
        g2 = build_decoding_graph(lexicon, lm, cache_path=path,
                                  dependencies=deps)
        assert g2.n_states == g1.n_states
        assert g2.n_arcs == g1.n_arcs
        from rasr_tpu.fsa.automaton import best_path
        assert best_path(g2)[2] == pytest.approx(best_path(g1)[2])
        # changed dependencies invalidate the image
        g3 = build_decoding_graph(lexicon, lm, lm_scale=2.0,
                                  cache_path=path,
                                  dependencies={"lexicon": "v1",
                                                "lm-scale": 2.0})
        assert g3.n_states == g1.n_states  # rebuilt, same topology

    def test_minimize_option_preserves_best(self, lexicon, lm):
        g = build_decoding_graph(lexicon, lm)
        gm = build_decoding_graph(lexicon, lm, minimize=True)
        from rasr_tpu.fsa.automaton import best_path
        # determinizing minimization can exceed a NONDETERMINISTIC
        # input's state count on tiny graphs; the contract is score
        # preservation, with only loose growth
        assert gm.n_states <= 2 * g.n_states
        assert best_path(gm)[2] == pytest.approx(best_path(g)[2], abs=1e-6)


class TestTrieSharing:
    def test_root_fanout_is_phones_not_words(self, lexicon):
        """The L transducer must be a prefix TRIE: the root's out-degree
        is bounded by the distinct first tokens, not the word count —
        the property the whole beam architecture rests on (a
        chain-per-word L floods any beam at frame 0 at vocabulary
        scale)."""
        L = lexicon_to_transducer(lexicon)
        first_tokens = {arc.ilabel for arc in L.arcs[L.initial]}
        assert len(L.arcs[L.initial]) == len(first_tokens)
        # shared prefix: 'AB' and a hypothetical 'A*' word share the
        # 'a' arc — here just assert state count ~ total distinct
        # prefixes + closure structure, far below sum of pron lengths
        total_phones = 4  # AB (2) + CA (2)
        assert L.n_states <= 1 + total_phones

    def test_word_output_rides_closure_arc(self, lexicon):
        L = lexicon_to_transducer(lexicon)
        out_arcs = [(s, a) for s in range(L.n_states)
                    for a in L.arcs[s] if a.olabel != EPS]
        # outputs only on arcs returning to the root (closure)
        assert out_arcs
        assert all(a.target == L.initial for _s, a in out_arcs)
