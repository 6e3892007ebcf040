"""mt-aligner tool: IBM-1 EM lexicon + monotone Viterbi alignment
(reference: src/Tools/Aligner/Aligner.cc)."""

import numpy as np

from rasr_tpu.tools import mt_aligner
from rasr_tpu.tools.mt_aligner import Ibm1Lexicon, viterbi_grid


def _toy_corpus(tmp_path, n=80):
    # deterministic word-for-word translations: sX <-> tX, with some
    # two-word source phrases to exercise vertical moves
    rng = np.random.default_rng(0)
    src_lines, tgt_lines = [], []
    for _ in range(n):
        words = rng.integers(0, 10, size=rng.integers(3, 8))
        src = [f"s{w}" for w in words]
        tgt = [f"t{w}" for w in words]
        src_lines.append(" ".join(src))
        tgt_lines.append(" ".join(tgt))
    sp = tmp_path / "src.txt"
    tp = tmp_path / "tgt.txt"
    sp.write_text("\n".join(src_lines) + "\n")
    tp.write_text("\n".join(tgt_lines) + "\n")
    return str(sp), str(tp)


def test_ibm1_em_learns_identity_lexicon(tmp_path):
    sp, tp = _toy_corpus(tmp_path)
    src = [l.split() for l in open(sp)]
    tgt = [l.split() for l in open(tp)]
    sv = mt_aligner.build_vocab(src)
    tv = mt_aligner.build_vocab(tgt)
    pairs = [(np.asarray([sv[w] for w in s]), np.asarray([tv[w] for w in t]))
             for s, t in zip(src, tgt)]
    lex = Ibm1Lexicon(len(sv), len(tv))
    lls = [lex.em_iteration(pairs) for _ in range(6)]
    assert lls[-1] > lls[0]  # likelihood improves
    # each source word's best translation is its counterpart
    for w, i in sv.items():
        best = np.argmax(lex.t[i])
        assert f"t{w[1:]}" == [k for k, v in tv.items() if v == best][0]


def test_viterbi_grid_prefers_diagonal():
    score = np.full((3, 3), 5.0)
    np.fill_diagonal(score, 0.1)
    path = viterbi_grid(score, (0.6, 0.2, 0.2))
    assert path == [(0, 0), (1, 1), (2, 2)]


def test_aligner_tool_end_to_end(tmp_path):
    sp, tp = _toy_corpus(tmp_path)
    aachen = str(tmp_path / "out.A3")
    bilang = str(tmp_path / "out.bi")
    lexf = str(tmp_path / "lex.txt")
    rc = mt_aligner.main([
        f"--mt-aligner.source.file={sp}", f"--mt-aligner.target.file={tp}",
        "--mt-aligner.iterations=5", "--mt-aligner.model=simple",
        f"--mt-aligner.output-aachen={aachen}",
        f"--mt-aligner.output-bilang={bilang}",
        f"--mt-aligner.output-lexicon={lexf}"])
    assert rc == 0
    a = open(aachen).read()
    assert a.startswith("SENT: 0") and "S 0 0" in a
    bi = open(bilang).read().splitlines()
    # word-for-word corpus: every aligned pair matches sX|tX
    first = bi[0].split()
    assert all(p.split("|")[0][1:] == p.split("|")[1][1:] for p in first)
    lex_lines = open(lexf).read().splitlines()
    assert any(line.startswith("s3 t3 ") for line in lex_lines)
