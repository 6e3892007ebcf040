"""Bliss data-model tests: corpus parsing/partitioning, lexicon parsing
(XML + vocab-text), edit-distance evaluation."""

import textwrap

import pytest

from rasr_tpu.bliss import (CorpusDescription, Evaluator, Lexicon, align,
                            grapheme_counts)
from rasr_tpu.core import Configuration


CORPUS_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="utf-8"?>
    <corpus name="test-corpus">
      <speaker-description name="spk1"><gender>female</gender></speaker-description>
      <recording name="rec1" audio="rec1.wav">
        <segment name="seg1" start="0.0" end="2.5">
          <speaker name="spk1"/>
          <orth> HELLO WORLD </orth>
        </segment>
        <segment name="seg2" start="2.5" end="4.0">
          <orth>GOOD MORNING</orth>
        </segment>
      </recording>
      <subcorpus name="sub">
        <recording name="rec2" audio="rec2.wav">
          <segment start="0.0" end="1.0"><orth>BYE</orth></segment>
        </recording>
      </subcorpus>
    </corpus>
""")

LEXICON_XML = textwrap.dedent("""\
    <?xml version="1.0" encoding="utf-8"?>
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>HH</symbol><variation>context</variation></phoneme>
        <phoneme><symbol>AH</symbol></phoneme>
        <phoneme><symbol>L</symbol></phoneme>
        <phoneme><symbol>OW</symbol></phoneme>
        <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
      </phoneme-inventory>
      <lemma special="silence">
        <orth>[SILENCE]</orth>
        <phon score="0.0">si</phon>
        <synt/>
        <eval/>
      </lemma>
      <lemma>
        <orth>HELLO</orth>
        <orth>HULLO</orth>
        <phon weight="0.75">HH AH L OW</phon>
        <phon weight="0.25">HH OW L OW</phon>
      </lemma>
    </lexicon>
""")


@pytest.fixture
def corpus_file(tmp_path):
    p = tmp_path / "corpus.xml"
    p.write_text(CORPUS_XML)
    return str(p)


def make_corpus(corpus_file, **params):
    c = Configuration(name="test")
    c.set("*.corpus.file", corpus_file)
    for k, v in params.items():
        c.set(f"*.corpus.{k}", v)
    return CorpusDescription(c.sub("corpus"))


class TestCorpus:
    def test_parse(self, corpus_file):
        corpus = make_corpus(corpus_file)
        segs = list(corpus.segments())
        assert [s.full_name for s in segs] == [
            "test-corpus/rec1/seg1", "test-corpus/rec1/seg2",
            "test-corpus/sub/rec2/1"]
        assert segs[0].orth == "HELLO WORLD"
        assert segs[0].speaker.gender == "female"
        assert segs[0].end == 2.5
        assert segs[2].orth == "BYE"

    def test_partition_round_robin(self, corpus_file):
        seg_names = []
        for part in range(2):
            corpus = make_corpus(corpus_file, partition=2,
                                 **{"select-partition": part})
            seg_names.append([s.full_name for s in corpus.segments()])
        # index % 2 == selected (CorpusDescription.cc SegmentPartitionVisitorAdaptor)
        assert seg_names[0] == ["test-corpus/rec1/seg1", "test-corpus/sub/rec2/1"]
        assert seg_names[1] == ["test-corpus/rec1/seg2"]

    def test_select_partition_equal_to_n_means_zero(self, corpus_file):
        corpus = make_corpus(corpus_file, partition=2, **{"select-partition": 2})
        assert [s.name for s in corpus.segments()] == ["seg1", "1"]

    def test_skip_first(self, corpus_file):
        corpus = make_corpus(corpus_file, **{"skip-first-segments": 2})
        assert [s.name for s in corpus.segments()] == ["1"]

    def test_segments_to_skip(self, corpus_file):
        corpus = make_corpus(corpus_file,
                             **{"segments-to-skip": "test-corpus/rec1/seg2"})
        assert [s.name for s in corpus.segments()] == ["seg1", "1"]

    def test_whitelist(self, corpus_file, tmp_path):
        wl = tmp_path / "segments.txt"
        wl.write_text("test-corpus/rec1/seg2\n")
        corpus = make_corpus(corpus_file, **{"segments.file": str(wl)})
        assert [s.name for s in corpus.segments()] == ["seg2"]

    def test_shuffle_deterministic(self, corpus_file):
        a = make_corpus(corpus_file, **{"segment-order-shuffle": "true",
                                        "segment-order-shuffle-seed": 42})
        b = make_corpus(corpus_file, **{"segment-order-shuffle": "true",
                                        "segment-order-shuffle-seed": 42})
        assert [s.full_name for s in a.segments()] == [s.full_name for s in b.segments()]

    def test_visitor(self, corpus_file):
        corpus = make_corpus(corpus_file)
        events = []

        class V:
            def enter_corpus(self, name): events.append(("C+", name))
            def leave_corpus(self, name): events.append(("C-", name))
            def enter_recording(self, r): events.append(("R+", r.name))
            def leave_recording(self, r): events.append(("R-", r.name))
            def visit_segment(self, s): events.append(("S", s.name))

        corpus.accept(V())
        assert events == [("C+", "test-corpus"), ("R+", "rec1"), ("S", "seg1"),
                          ("S", "seg2"), ("R-", "rec1"), ("R+", "rec2"),
                          ("S", "1"), ("R-", "rec2"), ("C-", "test-corpus")]


class TestLexicon:
    def test_xml(self, tmp_path):
        p = tmp_path / "lex.xml"
        p.write_text(LEXICON_XML)
        lex = Lexicon()
        lex.load(str(p))
        assert len(lex.phoneme_inventory) == 5
        assert lex.phoneme_inventory.phoneme("HH").id == 1
        assert not lex.phoneme_inventory.phoneme("si").context_dependent
        sil = lex.special_lemma("silence")
        assert sil is not None and sil.preferred_orth == "[SILENCE]"
        hello = lex.lemma_by_orth("HELLO")
        assert hello is lex.lemma_by_orth("HULLO")
        assert len(hello.pronunciations) == 2
        # weights normalized: 0.75 -> score -log(0.75)
        import math
        assert abs(hello.pronunciations[0].score - (-math.log(0.75))) < 1e-12
        # silence has empty synt and eval
        assert sil.syntactic_tokens == []
        assert sil.evaluation_tokens == [[]]

    def test_vocab_text(self, tmp_path):
        p = tmp_path / "labels.txt"
        p.write_text("<blank>\nA\nB\nC\n")
        lex = Lexicon()
        lex.load(f"vocab-text:{p}")
        assert len(lex.lemmas) == 4
        assert lex.lemmas[0].preferred_orth == "<blank>"
        # nth lemma <-> nth phoneme correspondence
        for i, lemma in enumerate(lex.lemmas):
            assert lemma.pronunciations[0].pronunciation.phonemes == (i + 1,)


class TestEvaluation:
    def test_align_counts(self):
        counts, pairs = align("a b c d".split(), "a x c".split())
        assert counts.corr == 2 and counts.sub == 1 and counts.dele == 1
        assert counts.ins == 0 and counts.errors == 2
        assert counts.ref_len == 4

    def test_evaluator_wer(self):
        ev = Evaluator()
        ev.evaluate("the cat sat", "the cat sat")
        ev.evaluate("the dog ran", "a dog ran fast")
        # second: 1 sub (the->a) + 1 ins (fast) = 2 errors / 6 ref words total
        assert ev.total.errors == 2
        assert abs(ev.wer - 2 / 6) < 1e-12

    def test_ger(self):
        counts = grapheme_counts("abc", "abd")
        assert counts.sub == 1 and counts.corr == 2
