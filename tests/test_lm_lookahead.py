"""LM lookahead for the word-conditioned tree search
(reference: src/Search/LanguageModelLookahead.cc — compressed lookahead
network + per-history min-LM score tables biasing pruning)."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        MonophoneStateTying, Tdp,
                                        TransitionModel)
from rasr_tpu.am.allophone import AllophoneAlphabet
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.lm import ArpaLm
from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
from rasr_tpu.search.lm_lookahead import LmLookahead

pytestmark = pytest.mark.fast

LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
        <phoneme><symbol>c</symbol></phoneme>
        <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
      </phoneme-inventory>
      <lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon></lemma>
      <lemma><orth>AB</orth><phon>a b</phon></lemma>
      <lemma><orth>ABC</orth><phon>a b c</phon></lemma>
      <lemma><orth>BA</orth><phon>b a</phon></lemma>
      <lemma><orth>CA</orth><phon>c a</phon></lemma>
    </lexicon>
""")

ARPA = textwrap.dedent("""\
    \\data\\
    ngram 1=6
    ngram 2=4

    \\1-grams:
    -0.5\t</s>
    -99\t<s>\t-0.2
    -0.9\tAB\t-0.2
    -0.4\tABC\t-0.2
    -0.7\tBA\t-0.2
    -1.2\tCA\t-0.2

    \\2-grams:
    -0.1\tAB BA
    -1.5\tAB AB
    -0.2\tBA CA
    -0.3\tCA ABC

    \\end\\
""")


@pytest.fixture
def am(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    return AcousticModel(
        lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
        HmmTopology(3, 1, 1), MonophoneStateTying(4, 3),
        TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                        Tdp(0.0, 2.0, float("inf"), 4.0)))


@pytest.fixture
def lm(tmp_path):
    p = tmp_path / "lm.arpa"
    p.write_text(ARPA)
    return ArpaLm(str(p))


def brute_force_min(tree, lexicon, lm, lm_scale, hist, node) -> float:
    """min over word ends reachable at/below `node` of scaled LM score."""
    best = float("inf")
    stack = [node]
    seen = set()
    while stack:
        n = stack.pop()
        if n in seen:
            continue
        seen.add(n)
        for (lemma_id, _p, _g, _c) in tree.nodes[n].word_ends:
            toks = lexicon.lemmas[lemma_id].syntactic_tokens
            if not toks:
                best = min(best, 0.0)
            else:
                best = min(best, lm_scale * lm.score(hist, toks[0]))
        stack.extend(tree.nodes[n].children.values())
    return best


class TestLookaheadTables:
    def test_table_matches_brute_force(self, am, lm):
        search = WordConditionedTreeSearch(am, lm=lm, lm_scale=2.0,
                                           lm_lookahead=True)
        la = search._lmla
        for hist in [(), ("AB",), ("BA",)]:
            slot = la.ensure(hist)
            tab = la.pool[slot]
            for node in range(1, len(search.tree.nodes)):
                want = brute_force_min(search.tree, am.lexicon, lm, 2.0,
                                       hist, node)
                got = float(tab[la.la_of_node[node]])
                if np.isinf(want):
                    assert got >= 1e8
                else:
                    assert got == pytest.approx(want, abs=1e-4), \
                        f"hist={hist} node={node}"

    def test_compression_shares_chain_nodes(self, am, lm):
        """Single-child no-word-end chains share one lookahead node."""
        search = WordConditionedTreeSearch(am, lm=lm, lm_lookahead=True)
        la = search._lmla
        assert la.n_la < len(search.tree.nodes)
        # every state maps to a valid lookahead node
        assert (la.la_of_state >= 0).all()
        assert (la.la_of_state < la.n_la).all()

    def test_lru_eviction_and_unigram_pinned(self, am, lm):
        search = WordConditionedTreeSearch(am, lm=lm, lm_lookahead=True,
                                           lm_lookahead_slots=2)
        la = search._lmla
        s1 = la.ensure(("AB",))
        assert s1 != 0
        s2 = la.ensure(("BA",))   # evicts ("AB",): only 1 free slot
        assert s2 == s1
        assert la.slot(("AB",)) == 0          # fell back to unigram
        assert la.slot(("BA",)) == s2
        uni = la.pool[0].copy()
        la.ensure(("CA",))
        np.testing.assert_array_equal(la.pool[0], uni)  # slot 0 pinned


class TestLookaheadSearch:
    def _scores(self, classes, n_classes=13, frames_per=3, seed=0):
        rng = np.random.default_rng(seed)
        T = len(classes) * frames_per
        s = rng.normal(5.0, 0.5, size=(T, n_classes))
        for i, c in enumerate(classes):
            s[i * frames_per:(i + 1) * frames_per, c] = 0.5
        return s.astype(np.float32)

    def test_lookahead_preserves_result_at_wide_beam(self, am, lm):
        # AB then BA: phonemes a(0-2) b(3-5) c(6-8) si(9)...
        scores = self._scores([0, 1, 2, 3, 4, 5, 3, 4, 5, 0, 1, 2])
        base = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=2.0, beam_size=4096).recognize(scores)
        with_la = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=2.0, beam_size=4096,
            lm_lookahead=True).recognize(scores)
        assert with_la == base == ["AB", "BA"]

    def test_native_matches_numpy_with_lookahead(self, am, lm):
        scores = self._scores([0, 1, 2, 3, 4, 5, 3, 4, 5, 0, 1, 2],
                              seed=3)
        kw = dict(lm=lm, lm_scale=2.0, beam_size=64, score_threshold=30.0,
                  lm_lookahead=True)
        s_native = WordConditionedTreeSearch(am, use_native=True, **kw)
        s_numpy = WordConditionedTreeSearch(am, use_native=False, **kw)
        if s_native._native is None:
            pytest.skip("native kernel unavailable")
        out_n = s_native.recognize(scores)
        out_p = s_numpy.recognize(scores)
        assert out_n == out_p
        bn, _ = s_native.best()
        bp, _ = s_numpy.best()
        assert bn == bp

    def test_lookahead_rescues_tight_beam(self, am, lm):
        """With acoustically ambiguous input, LM lookahead keeps the
        LM-preferred path inside a tight beam."""
        # ambiguous between ABC (unigram -0.4) and AB+junk: uniform
        scores = np.full((9, 13), 2.0, np.float32)
        for i, c in enumerate([0, 0, 0, 3, 3, 3, 6, 6, 6]):  # a b c
            scores[i, c] = 1.0
            scores[i, c + 1] = 1.1
            scores[i, c + 2] = 1.2
        wide = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=4.0, beam_size=4096).recognize(scores)
        tight_la = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=4.0, beam_size=24,
            lm_lookahead=True).recognize(scores)
        assert tight_la == wide

    def test_word_end_early_pruning_keeps_exact_scores(self, am, lm):
        """The lookahead path prunes word ends on estimates but records
        exact LM scores in the traceback arena."""
        scores = self._scores([0, 1, 2, 3, 4, 5], seed=5)
        s = WordConditionedTreeSearch(am, lm=lm, lm_scale=2.0,
                                      beam_size=512, lm_lookahead=True)
        s.recognize(scores)
        assert len(s.arena) > 0
        lms = np.asarray(s.arena.lm)
        # every non-silence word carries a genuine scaled LM score
        lemmas = np.asarray(s.arena.lemma)
        specials = {l.id for l in am.lexicon.lemmas if l.special}
        nonsil = ~np.isin(lemmas, list(specials))
        assert (np.abs(lms[nonsil]) > 0).all()

    def test_fill_statistics(self, am, lm):
        s = WordConditionedTreeSearch(am, lm=lm, lm_scale=2.0,
                                      beam_size=256, lm_lookahead=True)
        scores = self._scores([0, 1, 2, 3, 4, 5, 3, 4, 5], seed=6)
        s.recognize(scores)
        la = s._lmla
        assert la.n_fills >= 1
        assert la.fill_seconds >= 0.0

    def test_native_fill_matches_numpy(self, am, lm):
        """The fused C fill (native/rasr_la.cpp) is bit-compatible with
        the numpy fill it replaces (same dense scores, same segment
        mins, same inf replacement)."""
        search = WordConditionedTreeSearch(am, lm=lm, lm_scale=2.0,
                                           lm_lookahead=True)
        la = search._lmla
        if la._native is None:
            pytest.skip("native library unavailable")
        native = la._native
        for hist in [(), ("AB",), ("CA",), ("BA", "CA")]:
            la_hist = la.lookahead_history(hist)
            slot = la.ensure(la_hist)
            got = la.pool[slot].copy()
            la._native = None
            try:
                la._fill(slot, la_hist)
            finally:
                la._native = native
            want = la.pool[slot].copy()
            np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
