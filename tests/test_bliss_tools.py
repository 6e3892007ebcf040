"""corpus-tool / lexicon-tool CLIs (reference: src/Tools/Bliss/
corpustool.py, lextool.py) plus the Bliss XML writers roundtrip."""

import json
import os

import pytest

from rasr_tpu.bliss.corpus import CorpusDescription, write_corpus_xml
from rasr_tpu.bliss.lexicon import Lexicon, write_lexicon_xml
from rasr_tpu.core.configuration import Configuration
from rasr_tpu.tools import corpus_tool, lexicon_tool


CORPUS_XML = """<?xml version="1.0" encoding="utf-8"?>
<corpus name="demo">
  <speaker-description name="spk1"><gender>female</gender></speaker-description>
  <recording name="rec1" audio="rec1.wav">
    <segment name="1" start="0.0" end="1.5">
      <speaker name="spk1"/>
      <orth> hello world </orth>
    </segment>
    <segment name="2" start="1.5" end="4.0">
      <orth> the quick fox </orth>
    </segment>
  </recording>
  <recording name="rec2" audio="rec2.wav">
    <segment name="1" start="0.0" end="0.4">
      <orth> short </orth>
    </segment>
  </recording>
</corpus>
"""

LEXICON_XML = """<?xml version="1.0" encoding="utf-8"?>
<lexicon>
  <phoneme-inventory>
    <phoneme><symbol>a</symbol></phoneme>
    <phoneme><symbol>b</symbol></phoneme>
    <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
  </phoneme-inventory>
  <lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon></lemma>
  <lemma><orth>aba</orth><phon>a b a</phon></lemma>
  <lemma><orth>ba</orth><phon>b a</phon></lemma>
</lexicon>
"""


@pytest.fixture
def corpus_file(tmp_path):
    p = tmp_path / "demo.corpus.xml"
    p.write_text(CORPUS_XML)
    return str(p)


@pytest.fixture
def lexicon_file(tmp_path):
    p = tmp_path / "demo.lexicon.xml"
    p.write_text(LEXICON_XML)
    return str(p)


def test_corpus_tool_info_and_formats(corpus_file, tmp_path, capsys):
    out_txt = str(tmp_path / "orth.txt")
    out_stm = str(tmp_path / "ref.stm")
    out_vocab = str(tmp_path / "vocab.txt")
    rc = corpus_tool.main([
        f"--corpus-tool.corpus.file={corpus_file}",
        "info", f"text={out_txt}", f"stm={out_stm}", f"vocab={out_vocab}"])
    assert rc == 0
    info = json.loads(capsys.readouterr().out)
    assert info["segments"] == 3 and info["recordings"] == 2
    assert info["total-duration-s"] == pytest.approx(4.4)
    lines = open(out_txt).read().splitlines()
    assert lines[0] == "hello world"
    stm = open(out_stm).read()
    assert "rec1 1 spk1 0.00 1.50 hello world" in stm
    vocab = open(out_vocab).read().split()
    assert vocab == sorted(["fox", "hello", "quick", "short", "the",
                            "world"])


def test_corpus_tool_filter_and_roundtrip(corpus_file, tmp_path):
    out_xml = str(tmp_path / "filtered.xml")
    rc = corpus_tool.main([
        f"--corpus-tool.corpus.file={corpus_file}",
        "--corpus-tool.filter.min-duration=1.0",
        "filter", f"write={out_xml}"])
    assert rc == 0
    cfg = Configuration(name="t")
    cfg.set("*.corpus.file", out_xml)
    reread = CorpusDescription(cfg.sub("corpus"))
    segs = list(reread.segments())
    assert [s.name for s in segs] == ["1", "2"]
    assert segs[0].orth == "hello world"
    assert segs[0].speaker is not None and segs[0].speaker.name == "spk1"


def test_corpus_tool_segment_list_filter(corpus_file, tmp_path):
    seg_list = tmp_path / "keep.txt"
    seg_list.write_text("demo/rec2/1\n")
    out = str(tmp_path / "sel.xml")
    rc = corpus_tool.main([
        f"--corpus-tool.corpus.file={corpus_file}",
        f"--corpus-tool.filter.segment-list={seg_list}",
        "filter", f"write={out}"])
    assert rc == 0
    assert "rec2" in open(out).read() and "rec1" not in open(out).read()


def test_lexicon_tool_info_check_merge(lexicon_file, tmp_path, capsys):
    rc = lexicon_tool.main([
        f"--lexicon-tool.lexicon.file={lexicon_file}", "info", "check"])
    out = capsys.readouterr().out
    assert rc == 0
    info = json.loads(out[:out.index("check:")])
    assert info["lemmas"] == 3 and info["phonemes"] == 3

    other = tmp_path / "other.xml"
    other.write_text("""<?xml version="1.0"?>
    <lexicon>
      <phoneme-inventory><phoneme><symbol>c</symbol></phoneme>
      <phoneme><symbol>a</symbol></phoneme>
      <phoneme><symbol>b</symbol></phoneme></phoneme-inventory>
      <lemma><orth>ca</orth><phon>c a</phon></lemma>
      <lemma><orth>aba</orth><phon>a b</phon></lemma>
    </lexicon>""")
    out_xml = str(tmp_path / "merged.xml")
    rc = lexicon_tool.main([
        f"--lexicon-tool.lexicon.file={lexicon_file}",
        f"merge={other}", f"write={out_xml}"])
    assert rc == 0
    merged = Lexicon()
    merged.load(out_xml)
    assert merged.lemma_by_orth("ca") is not None
    # existing orth not duplicated by merge
    assert len(merged.lemmas_by_orth("aba")) == 1
    assert "c" in merged.phoneme_inventory


def test_lexicon_tool_from_vocab_and_prons(tmp_path):
    vocab = tmp_path / "words.txt"
    vocab.write_text("alpha\nbeta\n")
    dic = tmp_path / "dict.txt"
    dic.write_text("alpha a b a\n")
    out_xml = str(tmp_path / "new.xml")
    rc = lexicon_tool.main([
        f"from-vocab={vocab}", f"prons-from={dic}", f"write={out_xml}"])
    assert rc == 0
    lex = Lexicon()
    lex.load(out_xml)
    alpha = lex.lemma_by_orth("alpha")
    assert alpha is not None and len(alpha.pronunciations) == 1
    assert lex.lemma_by_orth("beta") is not None


def test_lexicon_writer_roundtrip_scores(tmp_path):
    lex = Lexicon()
    lex.phoneme_inventory.add("x")
    lemma = lex.new_lemma()
    lemma.orths = ["word"]
    lex.add_pronunciation(lemma, ["x", "x"], score=0.693)
    lex._index(lemma)
    p = str(tmp_path / "l.xml.gz")
    write_lexicon_xml(lex, p)
    back = Lexicon()
    back.load(p, normalize=False)
    lp = back.lemma_by_orth("word").pronunciations[0]
    assert lp.score == pytest.approx(0.693, abs=1e-4)


def test_corpus_tool_from_stm(tmp_path, capsys):
    stm = tmp_path / "ref.stm"
    stm.write_text(
        ";; comment line\n"
        "rec1 1 spkA 0.00 1.50 <o,f0> hello world\n"
        "rec1 1 spkA 1.50 3.00 more words here\n"
        "rec2 2 spkB 0.00 2.00 second recording\n")
    out_xml = str(tmp_path / "imported.xml")
    rc = corpus_tool.main([
        f"--corpus-tool.from-stm={stm}", "info", f"write={out_xml}"])
    assert rc == 0
    out = capsys.readouterr().out
    info = json.loads(out[:out.index("}") + 1])
    assert info["segments"] == 3 and info["recordings"] == 2
    cfg = Configuration(name="t")
    cfg.set("*.corpus.file", out_xml)
    back = CorpusDescription(cfg.sub("corpus"))
    segs = list(back.segments())
    assert segs[0].orth == "hello world"
    assert segs[0].speaker.name == "spkA"
    assert segs[2].track == 1


def test_xml_tool_roundtrip(tmp_path, capsys):
    from rasr_tpu.tools import xml_tool
    import io
    xml = ('<?xml version="1.0"?>\n<log name="run">\n'
           '  <wer type="word">12.5</wer>\n'
           '  <empty/>\n</log>\n')
    lines = io.StringIO()
    xml_tool.xml2line(io.BytesIO(xml.encode()), lines)
    text = lines.getvalue()
    assert "/log log S" in text
    assert "/log log A name run" in text
    assert "/log/wer wer C 12.5" in text
    assert "/log/empty empty E" in text
    back = io.StringIO()
    xml_tool.line2xml(io.StringIO(text), back)
    import xml.etree.ElementTree as ET
    root = ET.fromstring(back.getvalue())
    assert root.tag == "log" and root.get("name") == "run"
    assert root.find("wer").text.strip() == "12.5"
    assert root.find("empty") is not None


def test_ger_tool(tmp_path, capsys):
    """ger CLI: WER + GER aggregation (reference src/Tools/Ger/ger.py)."""
    from rasr_tpu.tools.ger import main
    ref = tmp_path / "ref.txt"
    hyp = tmp_path / "hyp.txt"
    ref.write_text("u1 hello world\nu2 foo bar baz\n")
    hyp.write_text("u2 foo baz\nu1 hello word\n")
    assert main([f"--ref={ref}", f"--hyp={hyp}", "--by-id"]) == 0
    out = capsys.readouterr().out
    assert "WER: 40.00%" in out and "GER:" in out
