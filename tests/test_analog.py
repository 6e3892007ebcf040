"""analog tool: log parsing, aggregation, search-space sections and the
multi-log comparison table."""

import json

import pytest

from rasr_tpu.tools.analog import analyze, compare, format_table, parse_log


def write_log(path, segments):
    with open(path, "w", encoding="utf-8") as fh:
        for seg in segments:
            fh.write("LOG " + json.dumps(seg) + "\n")


def seg(name, errors, ref_len, rtf, space=None):
    rec = {"segment": name, "hyp": "h", "ref": "r",
           "time": rtf * 2.0, "duration": 2.0, "rtf": rtf,
           "errors": errors, "ref-len": ref_len}
    if space:
        rec["search-space-statistics"] = space
    return rec


class TestAnalyze:
    def test_wer_and_rtf(self, tmp_path):
        p = tmp_path / "a.log"
        write_log(p, [seg("s1", 1, 10, 0.1), seg("s2", 2, 10, 0.3)])
        out = analyze(parse_log(str(p)))
        assert out["segments"] == 2
        assert out["wer"] == pytest.approx(15.0)
        assert out["mean-rtf"] == pytest.approx(0.2)

    def test_search_space_section(self, tmp_path):
        p = tmp_path / "a.log"
        space = {"states after pruning": {"min": 4, "avg": 10, "max": 16}}
        write_log(p, [seg("s1", 0, 5, 0.1, space),
                      seg("s2", 0, 5, 0.1,
                          {"states after pruning":
                           {"min": 2, "avg": 8, "max": 30}})])
        out = analyze(parse_log(str(p)))
        sec = out["search-space"]["states after pruning"]
        assert sec["min"] == 2 and sec["max"] == 30
        assert sec["avg"] == pytest.approx(9.0)


class TestCompare:
    def test_two_logs_and_combined(self, tmp_path):
        a, b = tmp_path / "a.log", tmp_path / "b.log"
        write_log(a, [seg("s1", 0, 10, 0.1)])
        write_log(b, [seg("s2", 5, 10, 0.5)])
        result = compare([str(a), str(b)])
        assert result["logs"][str(a)]["wer"] == 0.0
        assert result["logs"][str(b)]["wer"] == 50.0
        assert result["combined"]["wer"] == 25.0
        table = format_table(result)
        assert "COMBINED" in table
        assert table.count("\n") >= 4
