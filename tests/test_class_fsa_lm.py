"""Class LM (ARPA over classes + emission scores) and FSA grammar LM:
hand-computed golden values, garbage-loop semantics."""

import math

import pytest

from rasr_tpu.fsa import EPS, Automaton
from rasr_tpu.lm import (INVALID_STATE, ArpaLm, ClassArpaLm, ClassMapping,
                         FsaLm)

LN10 = math.log(10.0)

# ARPA over class tokens C1/C2
CLASS_ARPA = """\
\\data\\
ngram 1=4

\\1-grams:
-0.60206\t</s>
-99\t<s>
-0.30103\tC1
-0.60206\tC2

\\end\\
"""

CLASS_FILE = """\
# token  class  q
a C1 3
b C1 1
; another comment
c C2
"""


@pytest.fixture()
def class_lm(tmp_path):
    arpa = tmp_path / "classes.arpa"
    arpa.write_text(CLASS_ARPA)
    cfile = tmp_path / "map.classes"
    cfile.write_text(CLASS_FILE)
    return ClassArpaLm.load(str(arpa), str(cfile),
                            vocabulary=["a", "b", "c", "d"])


class TestClassMapping:
    def test_emission_normalization(self, class_lm):
        m = class_lm.mapping
        # q(a|C1)=3/4, q(b|C1)=1/4
        assert m.class_token("a") == "C1"
        assert abs(m.class_emission_score("a") + math.log(0.75)) < 1e-9
        assert abs(m.class_emission_score("b") + math.log(0.25)) < 1e-9
        # singleton class: emission 1 -> score 0
        assert m.class_token("c") == "C2"
        assert abs(m.class_emission_score("c")) < 1e-9

    def test_identity_fallback(self, class_lm):
        # 'd' had no entry: identity class, q=1
        assert class_lm.mapping.class_token("d") == "d"
        assert abs(class_lm.mapping.class_emission_score("d")) < 1e-9

    def test_members(self, class_lm):
        assert sorted(class_lm.mapping.members("C1")) == ["a", "b"]


class TestClassArpaLm:
    def test_score_adds_emission(self, class_lm):
        h = class_lm.initial_history()
        # -ln p = 0.30103*ln10 (class C1 unigram) - ln 0.75 (emission)
        want = 0.30103 * LN10 - math.log(0.75)
        assert abs(class_lm.score(h, "a") - want) < 1e-5

    def test_history_over_classes(self, tmp_path):
        arpa = tmp_path / "c.arpa"
        arpa.write_text("\\data\\\nngram 1=4\nngram 2=1\n\n\\1-grams:\n"
                        "-0.60206\t</s>\n-99\t<s>\t-0.2\n-0.30103\tC1\t-0.2\n"
                        "-0.60206\tC2\t-0.2\n\n\\2-grams:\n-0.1\tC1 C2\n\n"
                        "\\end\\\n")
        cfile = tmp_path / "m.classes"
        cfile.write_text(CLASS_FILE)
        lm = ClassArpaLm.load(str(arpa), str(cfile),
                              vocabulary=["a", "b", "c"])
        h = lm.extended_history(lm.initial_history(), "a")
        assert "C1" in h  # class token, not the word
        # bigram C1 C2 hit through word tokens a -> c
        want = 0.1 * LN10  # + emission 0 for singleton class C2
        assert abs(lm.score(h, "c") - want) < 1e-5

    def test_emission_scale(self, class_lm):
        class_lm.class_emission_scale = 2.0
        h = class_lm.initial_history()
        want = 0.30103 * LN10 - 2.0 * math.log(0.75)
        assert abs(class_lm.score(h, "a") - want) < 1e-5

    def test_sequence(self, class_lm):
        # a then b: both C1 unigrams + emissions
        s = class_lm.sequence_score(["a", "b"], with_sentence_end=True)
        want = (0.30103 * LN10 - math.log(0.75)
                + 0.30103 * LN10 - math.log(0.25)
                + 0.60206 * LN10)
        assert abs(s - want) < 1e-4


def grammar():
    """0 -hello(0.5)-> 1 -world(0.25)-> 2(final 0.1); 1 -eps(0.3)-> 3 -there(0.2)-> 2."""
    f = Automaton()
    for _ in range(4):
        f.add_state()
    f.add_arc(0, 1, 1, weight=0.5)      # hello
    f.add_arc(1, 2, 2, weight=0.25)     # world
    f.add_arc(1, 3, EPS, weight=0.3)
    f.add_arc(3, 2, 3, weight=0.2)      # there
    f.set_final(2, 0.1)
    return f


TOKENS = {"hello": 1, "world": 2, "there": 3}


class TestFsaLm:
    def test_direct_arc(self):
        lm = FsaLm(grammar(), TOKENS)
        h = lm.initial_history()
        assert abs(lm.score(h, "hello") - 0.5) < 1e-9
        h = lm.extended_history(h, "hello")
        assert abs(lm.score(h, "world") - 0.25) < 1e-9

    def test_eps_path(self):
        lm = FsaLm(grammar(), TOKENS)
        h = lm.extended_history(lm.initial_history(), "hello")
        # 'there' only reachable via eps: 0.3 + 0.2
        assert abs(lm.score(h, "there") - 0.5) < 1e-9
        h2 = lm.extended_history(h, "there")
        assert abs(lm.sentence_end_score(h2) - 0.1) < 1e-9

    def test_dead_end(self):
        lm = FsaLm(grammar(), TOKENS)
        h = lm.initial_history()
        assert lm.score(h, "world") == lm.infinity_score
        assert lm.extended_history(h, "world") == INVALID_STATE
        assert lm.score(INVALID_STATE, "hello") == lm.infinity_score

    def test_sentence_end_requires_final(self):
        lm = FsaLm(grammar(), TOKENS)
        h = lm.initial_history()
        assert lm.sentence_end_score(h) == lm.infinity_score

    def test_garbage_loop_restarts_after_final(self):
        lm = FsaLm(grammar(), TOKENS, garbage_loop_mode=True)
        h = lm.initial_history()
        for w in ("hello", "world"):
            h = lm.extended_history(h, w)
        # at final state: 'hello' restarts the grammar (final wt + arc)
        assert abs(lm.score(h, "hello") - (0.1 + 0.5)) < 1e-9
        h2 = lm.extended_history(h, "hello")
        assert abs(lm.score(h2, "world") - 0.25) < 1e-9

    def test_garbage_absorbs_unmatched(self):
        lm = FsaLm(grammar(), TOKENS, garbage_loop_mode=True)
        h = lm.initial_history()
        h2 = lm.extended_history(h, "world")  # impossible here
        assert h2 == lm.fsa.initial  # back to garbage/initial state
        assert lm.score(h, "world") == lm.infinity_score

    def test_successors_sparse(self):
        lm = FsaLm(grammar(), TOKENS)
        h = lm.extended_history(lm.initial_history(), "hello")
        succ = dict(lm.get_history_successors(h))
        assert abs(succ[2] - 0.25) < 1e-9          # world direct
        assert abs(succ[3] - 0.5) < 1e-9           # there via eps


class TestReverseArpa:
    ARPA = """\\
\\data\\
ngram 1=5
ngram 2=6

\\1-grams:
-0.8\t</s>
-99\t<s>\t-0.30103
-0.5\tA\t-0.4
-0.7\tB\t-0.3
-1.2\t<unk>

\\2-grams:
-0.2\t<s> A
-0.9\t<s> B
-0.4\tA B
-0.6\tA </s>
-0.3\tB </s>
-1.0\tB A

\\end\\
"""

    @pytest.fixture()
    def fwd(self, tmp_path):
        from rasr_tpu.lm import ArpaLm
        p = tmp_path / "f.arpa"
        p.write_text(self.ARPA.replace("\\\\\n", ""))
        return ArpaLm(str(p))

    def test_sentence_probability_preserved(self, fwd):
        from rasr_tpu.lm.reverse_arpa import reverse_arpa
        rev = reverse_arpa(fwd)
        # sentences fully covered by explicit n-grams
        for sent in (["A", "B"], ["B"], ["A"]):
            f = fwd.sequence_score(sent)
            r = rev.sequence_score(list(reversed(sent)))
            assert abs(f - r) < 1e-6, (sent, f, r)

    def test_backoff_sentence_close(self, fwd):
        # "B B" has no explicit forward bigram: both directions back
        # off, scores agree approximately (backing-off is direction-
        # dependent; exactness holds for fully explicit paths)
        from rasr_tpu.lm.reverse_arpa import reverse_arpa
        rev = reverse_arpa(fwd)
        f = fwd.sequence_score(["B", "B"])
        r = rev.sequence_score(["B", "B"])
        assert abs(f - r) < 1.0 and f < 50 and r < 50

    def test_file_roundtrip(self, fwd, tmp_path):
        from rasr_tpu.lm import ArpaLm
        from rasr_tpu.lm.reverse_arpa import reverse_arpa, write_arpa
        rev = reverse_arpa(fwd)
        p = tmp_path / "rev.arpa"
        write_arpa(rev, str(p))
        back = ArpaLm(str(p))
        for sent in (["B", "A"], ["A"]):
            assert abs(back.sequence_score(sent)
                       - rev.sequence_score(sent)) < 1e-4


class TestCheatingSegmentLm:
    @pytest.fixture()
    def lexicon(self):
        from rasr_tpu.bliss.lexicon import Lexicon
        lex = Lexicon()
        for w in ("hello", "world", "foo"):
            lemma = lex.new_lemma(name=w)
            lemma.orths.append(w)
        return lex

    def test_only_transcription_allowed(self, lexicon):
        from rasr_tpu.lm.cheating import CheatingSegmentLm
        lm = CheatingSegmentLm(lexicon)
        lm.set_segment("hello world")
        h = lm.initial_history()
        assert lm.score(h, "hello") < lm.infinity_score
        assert lm.score(h, "world") == lm.infinity_score
        h = lm.extended_history(h, "hello")
        assert lm.score(h, "world") < lm.infinity_score
        h2 = lm.extended_history(h, "world")
        assert lm.sentence_end_score(h2) < lm.infinity_score
        assert lm.sentence_end_score(h) == lm.infinity_score

    def test_segment_swap(self, lexicon):
        from rasr_tpu.lm.cheating import CheatingSegmentLm
        lm = CheatingSegmentLm(lexicon)
        lm.set_segment("hello")
        lm.set_segment("foo")
        h = lm.initial_history()
        assert lm.score(h, "foo") < lm.infinity_score
        assert lm.score(h, "hello") == lm.infinity_score


class TestSimpleHistoryLm:
    def test_full_history_zero_score(self):
        from rasr_tpu.lm.cheating import SimpleHistoryLm
        lm = SimpleHistoryLm()
        h = lm.initial_history()
        for w in ("a", "b", "c"):
            assert lm.score(h, w) == 0.0
            h = lm.extended_history(h, w)
        assert h == ("a", "b", "c")
        assert lm.reduced_history(h, 2) == ("b", "c")
