"""Reference-format XML log channels: writer schema + analog parsing
(two-way log compatibility, reference doc/channel.rst +
src/Tools/Analog/analog_util/parser.py)."""

import textwrap
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from rasr_tpu.core.xml_log import parse_xml_log
from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.tools.analog import analyze, parse_log
from rasr_tpu.tools.speech_recognizer import main as rec_main


@pytest.fixture
def setup(tmp_path):
    vocab = tmp_path / "labels.txt"
    vocab.write_text("<blank>\nA\nB\nC\n")
    V = 4

    def posteriors(seq, frames_per=2, p=0.9):
        rows = []
        for t in seq:
            for _ in range(frames_per):
                r = np.full(V, (1 - p) / (V - 1))
                r[t] = p
                rows.append(r)
        return np.log(np.asarray(rows, dtype=np.float32))

    with FeatureCacheWriter(str(tmp_path / "post.cache")) as cache:
        cache.write("c/r/s0", posteriors([1, 2]))       # A B
        cache.write("c/r/s1", posteriors([3, 0, 3]))    # C C
    (tmp_path / "corpus.xml").write_text(textwrap.dedent("""\
        <corpus name="c">
          <recording name="r" audio="none.wav">
            <segment name="s0" start="0" end="0.04"><orth>A B</orth></segment>
            <segment name="s1" start="0.04" end="0.1"><orth>C C C</orth></segment>
          </recording>
        </corpus>
    """))
    xml_path = tmp_path / "rec.xml.log"
    config = tmp_path / "rec.config"
    config.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/corpus.xml
        [*.lexicon]
        file = vocab-text:{vocab}
        [*.feature-cache]
        path = {tmp_path}/post.cache
        [*.label-scorer]
        type = no-op
        n-labels = 4
        [*.search-algorithm]
        type = lexiconfree-timesync-beam-search
        blank-label-index = 0
        [*.recognizer]
        xml-log.channel = {xml_path}
        [*.log]
        channel = {tmp_path}/rec.log
    """))
    return tmp_path, config, xml_path


class TestXmlLogWriter:
    def test_schema_matches_reference_analog_expectations(self, setup):
        tmp_path, config, xml_path = setup
        assert rec_main([f"--config={config}"]) == 0
        text = xml_path.read_text()
        # exact element/attribute names the reference analog greps
        root = ET.fromstring(text.split("?>", 1)[1])
        assert root.tag == "sprint"
        recs = root.findall("recording")
        assert recs and recs[0].get("name") == "r"
        segs = recs[0].findall("segment")
        assert [s.get("full-name") for s in segs] == ["c/r/s0", "c/r/s1"]
        s0 = segs[0]
        assert s0.get("start") == "0.000" and s0.get("track") == "0"
        orths = {o.get("source"): (o.text or "").strip()
                 for o in s0.iter("orth")}
        assert orths == {"reference": "A B", "recognized": "A B"}
        ev = s0.find("evaluation")
        assert ev.get("name") == "single best" and ev.get("type") == "eval"
        st = ev.find("statistic")
        assert st.get("type") == "edit-distance"
        counts = {c.get("event"): int(c.text) for c in st.iter("count")}
        assert counts == {"token": 2, "deletion": 0, "insertion": 0,
                          "substitution": 0}
        align = ev.find("alignment")
        assert align.get("type") == "edit-distance"
        assert "  =  " in align.text  # bliss alignment lines
        assert s0.find("timer/user") is not None
        assert s0.find("real-time") is not None
        # deletion in segment 2
        counts1 = {c.get("event"): int(c.text)
                   for c in segs[1].find("evaluation/statistic")
                   .iter("count")}
        assert counts1["deletion"] == 1 and counts1["token"] == 3

    def test_analog_parses_own_xml(self, setup):
        tmp_path, config, xml_path = setup
        assert rec_main([f"--config={config}"]) == 0
        records = parse_log(str(xml_path))  # auto-detects XML
        assert len(records) == 2
        by_seg = {r["segment"]: r for r in records}
        assert by_seg["c/r/s0"]["errors"] == 0
        assert by_seg["c/r/s1"]["errors"] == 1
        assert by_seg["c/r/s1"]["ref-len"] == 3
        stats = analyze(records)
        assert abs(stats["wer"] - 20.0) < 1e-9
        # same aggregation as from the JSON log
        stats_json = analyze(parse_log(str(tmp_path / "rec.log")))
        assert stats_json["wer"] == stats["wer"]
        assert stats_json["errors"] == stats["errors"]


REFERENCE_STYLE_LOG = """<?xml version="1.0" encoding="ISO-8859-1"?>
<sprint>
<recording name="rec1" audio="a.wav">
<segment full-name="corpus/rec1/seg1" name="seg1" start="0.0" end="2.5" track="0">
<orth source="reference">hello world</orth>
<layer name="recognizer">
<orth source="recognized">hello word</orth>
</layer>
<orth source="recognized">hello word</orth>
<evaluation name="single best" type="eval">
<alignment type="edit-distance" format="bliss">
hello                 =  hello
world                 #  word
</alignment>
<statistic type="edit-distance">
<count event="token">2</count>
<count event="deletion">0</count>
<count event="insertion">0</count>
<count event="substitution">1</count>
</statistic>
</evaluation>
<timer><user>0.42</user></timer>
<real-time>0.168</real-time>
</segment>
</recording>
</sprint>
"""


class TestReferenceLogParsing:
    def test_parses_reference_emitted_log(self, tmp_path):
        """A log in the shape the reference C++ channels emit must parse
        (the other direction of compatibility)."""
        p = tmp_path / "ref.log"
        p.write_text(REFERENCE_STYLE_LOG)
        records = parse_xml_log(str(p))
        assert len(records) == 1
        r = records[0]
        assert r["segment"] == "corpus/rec1/seg1"
        assert r["errors"] == 1 and r["ref-len"] == 2
        assert r["time"] == pytest.approx(0.42)
        assert r["rtf"] == pytest.approx(0.168)
        stats = analyze(records)
        assert stats["wer"] == pytest.approx(50.0)
