"""AT&T text IO + dot drawing + fsa CLI tool round-trips."""

import io

import pytest

from rasr_tpu.fsa import Automaton, best_path, read_att, write_att, write_dot
from rasr_tpu.fsa.io import read_symbols, write_symbols
from rasr_tpu.tools import fsa_tool

ATT_ACCEPTOR = """\
0 1 1 0.5
1 2 2 0.25
2 0.1
"""

ATT_TRANSDUCER = """\
0 1 a x 0.5
1 2 b y 0.25
2 0.1
"""


def diamond():
    f = Automaton()
    for _ in range(4):
        f.add_state()
    f.add_arc(0, 1, 1, 1, 1.0)
    f.add_arc(0, 2, 2, 2, 3.0)
    f.add_arc(1, 3, 3, 3, 1.0)
    f.add_arc(2, 3, 3, 3, 0.0)
    f.set_final(3, 0.5)
    return f


class TestAttIo:
    def test_read_acceptor(self):
        f = read_att(io.StringIO(ATT_ACCEPTOR))
        assert f.n_states == 3
        assert abs(f.accepts([1, 2]) - 0.85) < 1e-6

    def test_read_transducer_with_symbols(self):
        syms = {"<eps>": 0, "a": 1, "b": 2}
        osyms = {"<eps>": 0, "x": 1, "y": 2}
        f = read_att(io.StringIO(ATT_TRANSDUCER), isymbols=syms,
                     osymbols=osyms)
        _, olabels, score = best_path(f)
        assert olabels == [1, 2]
        assert abs(score - 0.85) < 1e-6

    def test_roundtrip(self):
        f = diamond()
        buf = io.StringIO()
        write_att(f, buf)
        g = read_att(io.StringIO(buf.getvalue()))
        for seq in ([1, 3], [2, 3]):
            assert abs(g.accepts(seq) - f.accepts(seq)) < 1e-6

    def test_roundtrip_file_and_symbols(self, tmp_path):
        syms = {"<eps>": 0, "one": 1, "two": 2, "three": 3}
        p = tmp_path / "f.fsa"
        write_att(diamond(), str(p), isymbols=syms)
        assert "one" in p.read_text()
        g = read_att(str(p), isymbols=syms)
        assert abs(g.accepts([1, 3]) - 2.5) < 1e-6

    def test_symbol_table_roundtrip(self, tmp_path):
        syms = {"<eps>": 0, "a": 1, "b": 2}
        p = tmp_path / "syms.txt"
        write_symbols(syms, str(p))
        assert read_symbols(str(p)) == syms

    def test_initial_from_first_line(self):
        f = read_att(io.StringIO("5 1 7 0.0\n1 0.0\n"))
        assert f.initial == 5
        assert abs(f.accepts([7])) < 1e-9


class TestDot:
    def test_draw(self):
        buf = io.StringIO()
        write_dot(diamond(), buf, isymbols={"<eps>": 0, "a": 1})
        out = buf.getvalue()
        assert "digraph" in out and "doublecircle" in out
        assert "a/1" in out  # symbol + weight on arc


class TestCli:
    def test_info_and_best(self, tmp_path, capsys):
        p = tmp_path / "f.fsa"
        write_att(diamond(), str(p), acceptor=True)
        assert fsa_tool.main(["--acceptor", "info", str(p)]) == 0
        out = capsys.readouterr().out
        assert "states: 4" in out
        assert fsa_tool.main(["--acceptor", "best", str(p)]) == 0
        out = capsys.readouterr().out
        assert out.startswith("2.5")
        assert "1 3" in out

    def test_determinize_pipeline(self, tmp_path):
        f = Automaton()
        for _ in range(4):
            f.add_state()
        f.add_arc(0, 1, 5, 5, 1.0)
        f.add_arc(0, 2, 5, 5, 2.0)
        f.add_arc(1, 3, 6, 6, 0.0)
        f.add_arc(2, 3, 7, 7, 0.0)
        f.set_final(3)
        src, dst = tmp_path / "in.fsa", tmp_path / "out.fsa"
        write_att(f, str(src))
        assert fsa_tool.main(["determinize", str(src), str(dst)]) == 0
        g = read_att(str(dst))
        for s in range(g.n_states):
            labels = [a.ilabel for a in g.arcs[s]]
            assert len(labels) == len(set(labels))
        assert abs(g.accepts([5, 6]) - 1.0) < 1e-6

    def test_draw_cli(self, tmp_path):
        src, dot = tmp_path / "in.fsa", tmp_path / "out.dot"
        write_att(diamond(), str(src))
        assert fsa_tool.main(["draw", str(src), str(dot)]) == 0
        assert "digraph" in dot.read_text()
