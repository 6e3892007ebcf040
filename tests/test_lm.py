"""ARPA LM tests: parsing, backing-off semantics (hand-computed golden
values), history reduction, combine/scale wrappers."""

import gzip
import math

import numpy as np
import pytest

from rasr_tpu.lm import (ArpaLm, CombineLm, ScaledLanguageModel, Zerogram,
                         SENTENCE_BEGIN)

LN10 = math.log(10.0)

UNIGRAM = """\
\\data\\
ngram 1=4

\\1-grams:
-0.60206\t</s>
-99\t<s>
-0.30103\tA
-0.60206\tB

\\end\\
"""

BIGRAM = """\
\\data\\
ngram 1=5
ngram 2=3

\\1-grams:
-0.69897\t</s>
-99\t<s>\t-0.30103
-0.39794\tA\t-0.17609
-0.69897\tB\t-0.30103
-1.0\t<unk>

\\2-grams:
-0.15490\t<s> A
-0.30103\tA B
-0.52288\tB </s>

\\end\\
"""


class TestArpa:
    def test_unigram_scores(self, tmp_path):
        p = tmp_path / "uni.arpa"
        p.write_text(UNIGRAM)
        lm = ArpaLm(str(p))
        assert lm.order == 1
        # -ln p = -log10 p * ln 10
        assert abs(lm.score((), "A") - 0.30103 * LN10) < 1e-6
        assert abs(lm.score((), "B") - 0.60206 * LN10) < 1e-6

    def test_gzip(self, tmp_path):
        p = tmp_path / "uni.arpa.gz"
        with gzip.open(p, "wt") as fh:
            fh.write(UNIGRAM)
        lm = ArpaLm(str(p))
        assert abs(lm.score((), "A") - 0.30103 * LN10) < 1e-6

    def test_bigram_direct_hit(self, tmp_path):
        p = tmp_path / "bi.arpa"
        p.write_text(BIGRAM)
        lm = ArpaLm(str(p))
        assert lm.order == 2
        h = lm.initial_history()
        assert h == (SENTENCE_BEGIN,)
        # p(A|<s>) is a direct bigram
        assert abs(lm.score(h, "A") - 0.15490 * LN10) < 1e-5

    def test_bigram_backoff(self, tmp_path):
        p = tmp_path / "bi.arpa"
        p.write_text(BIGRAM)
        lm = ArpaLm(str(p))
        # p(A|B): no bigram "B A" -> bow(B) * p(A)
        expected = (0.30103 + 0.39794) * LN10
        assert abs(lm.score(("B",), "A") - expected) < 1e-5

    def test_unknown_fallback(self, tmp_path):
        p = tmp_path / "bi.arpa"
        p.write_text(BIGRAM)
        lm = ArpaLm(str(p))
        # OOV token: backoff to unigram <unk>
        got = lm.score(("A",), "ZZZ")
        expected = (0.17609 + 1.0) * LN10
        assert abs(got - expected) < 1e-4

    def test_sequence_score(self, tmp_path):
        p = tmp_path / "bi.arpa"
        p.write_text(BIGRAM)
        lm = ArpaLm(str(p))
        # <s> A B </s> : p(A|<s>) p(B|A) p(</s>|B), all direct hits
        expected = (0.15490 + 0.30103 + 0.52288) * LN10
        assert abs(lm.sequence_score(["A", "B"]) - expected) < 1e-4

    def test_extended_history_truncates(self, tmp_path):
        p = tmp_path / "bi.arpa"
        p.write_text(BIGRAM)
        lm = ArpaLm(str(p))
        h = lm.extended_history(lm.initial_history(), "A")
        assert h == ("A",)

    def test_score_batch(self, tmp_path):
        p = tmp_path / "bi.arpa"
        p.write_text(BIGRAM)
        lm = ArpaLm(str(p))
        m = lm.score_batch([("A",), ("B",)], ["A", "B", "</s>"])
        assert m.shape == (2, 3)
        assert abs(m[0, 1] - 0.30103 * LN10) < 1e-5


class TestWrappers:
    def test_zerogram(self):
        lm = Zerogram(["A", "B", "C", "D"])
        assert abs(lm.score((), "A") - math.log(4)) < 1e-9

    def test_scaled(self, tmp_path):
        p = tmp_path / "uni.arpa"
        p.write_text(UNIGRAM)
        lm = ScaledLanguageModel(ArpaLm(str(p)), 2.0)
        assert abs(lm.score((), "A") - 2 * 0.30103 * LN10) < 1e-5
        lm.set_scale(0.5)
        assert abs(lm.score((), "A") - 0.5 * 0.30103 * LN10) < 1e-6

    def test_combine(self, tmp_path):
        p = tmp_path / "uni.arpa"
        p.write_text(UNIGRAM)
        a = ArpaLm(str(p))
        z = Zerogram(["A", "B"])
        c = CombineLm([a, z], scales=[1.0, 2.0])
        h = c.initial_history()
        expected = a.score((), "A") + 2.0 * z.score((), "A")
        assert abs(c.score(h, "A") - expected) < 1e-6
