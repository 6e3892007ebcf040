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


class TestMatrixTool:
    def test_pipeline(self, tmp_path, capsys):
        import numpy as np
        from rasr_tpu.math.matrix_io import read_matrix, write_matrix
        from rasr_tpu.tools import matrix_tool
        a = np.arange(6, dtype=np.float32).reshape(2, 3)
        pa = tmp_path / "a.bin"
        write_matrix(str(pa), a)
        out = tmp_path / "out.bin"
        rc = matrix_tool.main(["read", str(pa), "scale", "2",
                               "transpose", "write", str(out)])
        assert rc == 0
        np.testing.assert_allclose(read_matrix(str(out)), 2 * a.T)
        rc = matrix_tool.main(["read", str(pa), "l2norm"])
        assert rc == 0
        got = float(capsys.readouterr().out.strip())
        assert got == pytest.approx(float(np.linalg.norm(a)), rel=1e-5)

    def test_expand_submatrix_add(self, tmp_path):
        import numpy as np
        from rasr_tpu.math.matrix_io import read_matrix, write_matrix
        from rasr_tpu.tools import matrix_tool
        a = np.ones((2, 2), np.float32)
        pa = tmp_path / "a.bin"
        write_matrix(str(pa), a)
        out = tmp_path / "o.bin"
        assert matrix_tool.main(["read", str(pa), "add", str(pa),
                                 "expand", "3", "3",
                                 "write", str(out)]) == 0
        m = read_matrix(str(out))
        assert m.shape == (3, 3) and m[0, 0] == 2 and m[2, 2] == 0
        assert matrix_tool.main(["read", str(out), "submatrix",
                                 "0", "2", "0", "2", "write", str(out)]) == 0
        assert read_matrix(str(out)).shape == (2, 2)
