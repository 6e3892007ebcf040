"""LM lookahead tests: per-history tables over the prefix tree, and the
pruning effect — anticipated LM scores keep LM-favored words alive in
narrow beams where acoustics alone would drop them."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.lm import ArpaLm
from rasr_tpu.nn.label_scorer import NoOpLabelScorer
from rasr_tpu.search.tree_timesync import (LmLookahead, PrefixTree,
                                           TreeTimesyncBeamSearch)

# labels: 0=blank, 1=x, 2=y, 3=a, 4=b
LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>blank</symbol><variation>none</variation></phoneme>
        <phoneme><symbol>x</symbol></phoneme>
        <phoneme><symbol>y</symbol></phoneme>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
      </phoneme-inventory>
      <lemma special="blank"><orth>[blank]</orth><phon>blank</phon></lemma>
      <lemma><orth>XA</orth><phon>x a</phon></lemma>
      <lemma><orth>YB</orth><phon>y b</phon></lemma>
    </lexicon>
""")

ARPA = """\
\\data\\
ngram 1=4

\\1-grams:
-0.3\t</s>
-99\t<s>
-0.02\tXA
-1.2\tYB

\\end\\
"""


@pytest.fixture
def env(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    arpa = tmp_path / "lm.arpa"
    arpa.write_text(ARPA)
    return lex, ArpaLm(str(arpa))


class TestLookaheadTable:
    def test_table_values(self, env):
        lex, lm = env
        tree = PrefixTree(lex)
        la = LmLookahead(tree, lm, lm_scale=1.0, lexicon=lex)
        h = lm.initial_history()
        # node after 'x' can only reach XA; after 'y' only YB
        n_x = tree.successors(tree.root)[1]
        n_y = tree.successors(tree.root)[2]
        assert abs(la.score(n_x, h) - lm.score(h, "XA")) < 1e-5
        assert abs(la.score(n_y, h) - lm.score(h, "YB")) < 1e-5
        # root anticipates the best of both
        assert abs(la.score(tree.root, h)
                   - min(la.score(n_x, h), la.score(n_y, h))) < 1e-6

    def test_tree_compression(self, env):
        lex, lm = env
        tree = PrefixTree(lex)
        la = LmLookahead(tree, lm, 1.0, lex)
        # nodes along a single-word tail share one lookahead class,
        # so the compressed table is smaller than the node count
        n_nodes = len(tree.reachable_word_ends())
        assert la.n_classes < n_nodes
        assert len(la.table(lm.initial_history())) == la.n_classes
        # every node still scores via its class
        for node in range(n_nodes):
            la.score(node, lm.initial_history())

    def test_tables_cached_per_history(self, env):
        lex, lm = env
        tree = PrefixTree(lex)
        la = LmLookahead(tree, lm, 1.0, lex)
        h = lm.initial_history()
        t1 = la.table(h)
        t2 = la.table(h)
        assert t1 is t2
        la.cleanup([])
        assert len(la._cache) == 0


class TestLookaheadPruning:
    def make_scores(self):
        """frame 0: y slightly better than x; frame 1: a/b comparable;
        frame 2: blank."""
        V = 5
        rows = np.full((3, V), np.log(0.02), dtype=np.float32)
        rows[0, 2] = np.log(0.50)   # y
        rows[0, 1] = np.log(0.44)   # x slightly worse
        rows[1, 3] = np.log(0.47)   # a
        rows[1, 4] = np.log(0.47)   # b
        rows[2, 0] = np.log(0.9)    # blank
        return rows

    def test_lookahead_saves_lm_favored_word(self, env):
        lex, lm = env
        scores = self.make_scores()
        base_kwargs = dict(lm=lm, lm_scale=1.0, beam_size=1,
                           word_end_beam_size=1, blank_index=0)
        without = TreeTimesyncBeamSearch(
            NoOpLabelScorer(5), lex, lm_lookahead=False, **base_kwargs)
        with_la = TreeTimesyncBeamSearch(
            NoOpLabelScorer(5), lex, lm_lookahead=True, **base_kwargs)
        r_without = without.recognize_segment(scores)
        r_with = with_la.recognize_segment(scores)
        # narrow beam without lookahead follows the acoustics into 'y'
        assert r_without == ["YB"]
        # lookahead anticipates the LM preference for XA at the first token
        assert r_with == ["XA"]

    def test_wide_beam_unaffected(self, env):
        """With a wide beam, lookahead must not change the result."""
        lex, lm = env
        scores = self.make_scores()
        kw = dict(lm=lm, lm_scale=1.0, beam_size=16, blank_index=0)
        a = TreeTimesyncBeamSearch(NoOpLabelScorer(5), lex,
                                   lm_lookahead=False, **kw)
        b = TreeTimesyncBeamSearch(NoOpLabelScorer(5), lex,
                                   lm_lookahead=True, **kw)
        assert a.recognize_segment(scores) == b.recognize_segment(scores)
