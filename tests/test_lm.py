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


class TestTrieScale:
    """Trie storage + vectorized dense scoring (VERDICT r1 item 4:
    production-scale ARPA; reference src/Lm/ArpaLm.hh:70 trie over
    BackingOff.hh:33, batch API src/Lm/LanguageModel.hh:542-552)."""

    @pytest.fixture(scope="class")
    def big(self):
        import io
        rng = np.random.default_rng(7)
        V, N2, N3 = 20_000, 120_000, 80_000
        buf = io.StringIO()
        buf.write("\\data\\\n")
        for o, n in ((1, V), (2, N2), (3, N3)):
            buf.write(f"ngram {o}={n}\n")
        buf.write("\\1-grams:\n")
        for i in range(V):
            buf.write(f"-4.2\tw{i}\t-0.5\n")
        g2 = np.unique(rng.integers(0, V, size=(N2, 2)), axis=0)
        buf.write("\\2-grams:\n")
        for r in g2:
            buf.write(f"-2.8\tw{r[0]} w{r[1]}\t-0.4\n")
        idx = rng.integers(0, len(g2), size=N3)
        g3 = np.unique(np.concatenate(
            [g2[idx], rng.integers(0, V, size=(N3, 1))], axis=1), axis=0)
        buf.write("\\3-grams:\n")
        for r in g3:
            buf.write(f"-2.1\tw{r[0]} w{r[1]} w{r[2]}\n")
        buf.write("\\end\\\n")
        lm = ArpaLm()
        lm._parse_text(buf.getvalue())
        return lm, g2, g3

    def test_counts(self, big):
        lm, g2, g3 = big
        assert lm.ngram_count(1) == 20_000
        assert lm.ngram_count(2) == len(g2)
        assert lm.ngram_count(3) == len(g3)
        assert lm._dropped == 0

    def test_dense_matches_scalar(self, big):
        lm, g2, g3 = big
        rng = np.random.default_rng(3)
        # histories that hit explicit trigram contexts and random ones
        hists = [tuple(f"w{t}" for t in g3[i][:2]) for i in (0, 7, 42)]
        hists += [(f"w{rng.integers(20_000)}",), ()]
        for h in hists:
            dense = lm.score_dense(h)
            for w in rng.integers(0, 20_000, size=8):
                tok = f"w{w}"
                assert abs(lm.score(h, tok) - dense[lm.token_id(tok)]) < 1e-4

    def test_dense_fill_fast(self, big):
        import time
        lm, g2, _ = big
        h = tuple(f"w{t}" for t in g2[5])
        lm.score_dense(h)  # warm
        t0 = time.time()
        for _ in range(20):
            lm.score_dense(h)
        per_fill = (time.time() - t0) / 20
        assert per_fill < 0.010, f"dense fill {per_fill*1e3:.1f} ms"

    def test_image_cache_roundtrip(self, tmp_path):
        p = tmp_path / "bi.arpa"
        p.write_text(BIGRAM)
        lm1 = ArpaLm(str(p))
        assert (tmp_path / "bi.arpa.trie.npz").exists()
        lm2 = ArpaLm(str(p))  # from image
        for h, w in ((("A",), "B"), ((), "A"), (("<s>",), "A")):
            assert abs(lm1.score(h, w) - lm2.score(h, w)) < 1e-6
        # stale image invalidated on source change
        import os
        st = os.stat(p)
        p.write_text(UNIGRAM)
        os.utime(p, ns=(st.st_atime_ns + 10**9, st.st_mtime_ns + 10**9))
        lm3 = ArpaLm(str(p))
        assert lm3.order == 1
