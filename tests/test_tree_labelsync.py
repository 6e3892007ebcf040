"""Tree label-synchronous search tests: lexicon-constrained label-sync
decoding over synthetic next-label distributions, with LM at word ends."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.lm import ArpaLm
from rasr_tpu.search.tree_labelsync import TreeLabelsyncBeamSearch

# labels: 0 = BOS/EOS, 1=a, 2=b, 3=c
LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>eps</symbol><variation>none</variation></phoneme>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
        <phoneme><symbol>c</symbol></phoneme>
      </phoneme-inventory>
      <lemma special="boundary"><orth></orth><phon>eps</phon></lemma>
      <lemma><orth>AB</orth><phon>a b</phon></lemma>
      <lemma><orth>AC</orth><phon>a c</phon></lemma>
      <lemma><orth>CB</orth><phon>c b</phon></lemma>
    </lexicon>
""")


@pytest.fixture
def lexicon(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    return lex


def make_score_fn(preferred_seqs, V=4, p=0.9):
    """Next-label distribution: at position i prefer preferred_seqs[i]
    (list of label per step, 0 = EOS)."""
    def score_fn(histories):
        out = np.full((len(histories), V), -np.log((1 - p) / (V - 1)),
                      dtype=np.float32)
        for i, row in enumerate(histories):
            pos = sum(1 for v in row[1:] if v > 0)
            want = preferred_seqs[pos] if pos < len(preferred_seqs) else 0
            out[i, :] = -np.log((1 - p) / (V - 1))
            out[i, want] = -np.log(p)
        return out
    return score_fn


class TestTreeLabelsync:
    def test_single_word(self, lexicon):
        # prefer a, then b, then EOS -> "AB"
        search = TreeLabelsyncBeamSearch(
            make_score_fn([1, 2, 0]), lexicon, beam_size=8, max_labels=6,
            length_norm_scale=0.0)
        assert search.recognize() == ["AB"]

    def test_lexicon_constraint(self, lexicon):
        # prefer b first — but no word starts with b: must pick a legal word
        search = TreeLabelsyncBeamSearch(
            make_score_fn([2, 2, 0]), lexicon, beam_size=8, max_labels=6,
            length_norm_scale=0.0)
        words = search.recognize()
        assert words and all(w in ("AB", "AC", "CB") for w in words)

    def test_two_words(self, lexicon):
        search = TreeLabelsyncBeamSearch(
            make_score_fn([1, 2, 3, 2, 0]), lexicon, beam_size=8,
            max_labels=8, length_norm_scale=0.0)
        assert search.recognize() == ["AB", "CB"]

    def test_lm_at_word_ends(self, lexicon, tmp_path):
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=5\n\n\\1-grams:\n-0.2\t</s>\n-99\t<s>\n"
            "-2.0\tAB\n-0.05\tAC\n-1.0\tCB\n\n\\end\\\n")
        lm = ArpaLm(str(arpa))
        # acoustics prefer 'a' then ambiguous between b and c
        fn = make_score_fn([1, 2, 0])  # slight preference for b

        def ambiguous_fn(histories):
            out = fn(histories)
            # make b vs c nearly equal at step 1
            for i, row in enumerate(histories):
                pos = sum(1 for v in row[1:] if v > 0)
                if pos == 1:
                    out[i, 2] = -np.log(0.45)
                    out[i, 3] = -np.log(0.44)
            return out

        no_lm = TreeLabelsyncBeamSearch(
            ambiguous_fn, lexicon, beam_size=8, max_labels=4,
            length_norm_scale=0.0).recognize()
        with_lm = TreeLabelsyncBeamSearch(
            ambiguous_fn, lexicon, lm=lm, lm_scale=3.0, beam_size=8,
            max_labels=4, length_norm_scale=0.0).recognize()
        assert no_lm == ["AB"]
        assert with_lm == ["AC"]  # LM strongly prefers AC
