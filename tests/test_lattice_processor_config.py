"""Config-driven lattice-processor action chains over Flf archives
(reference src/Tools/LatticeProcessor/LatticeProcessor.cc:46-92): each
action from the reference's `actions=`/`selections=` surface runs from
.config against the repo's own lattice archives."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.core.configuration import Configuration
from rasr_tpu.flf.io import FlfArchiveReader, FlfArchiveWriter
from rasr_tpu.flf.lattice import FlfLattice
from rasr_tpu.flf.semiring import FlfSemiring
from rasr_tpu.fsa.automaton import EPS
from rasr_tpu.tools.lattice_processor import main as lp_main

WORDS = {1: "a", 2: "b", 3: "x", 4: "[SILENCE]"}
SR = FlfSemiring(("am", "lm"))


def den_s0():
    """Orth 'a b'; paths: [SIL] a b | a b | a x (competitor)."""
    arcs = [
        (0, 1, 4, (0.1, 0.0)),     # [SILENCE]
        (0, 1, EPS, (0.3, 0.0)),   # skip silence
        (1, 2, 1, (1.0, 0.5)),     # a
        (2, 3, 2, (1.0, 0.5)),     # b  (spoken)
        (2, 3, 3, (0.8, 0.9)),     # x  (competitor)
    ]
    return FlfLattice.build(SR, 4, arcs, boundaries=[0, 2, 5, 8],
                            initial=0, finals={3: (0.0, 0.0)}, words=WORDS)


def den_s1():
    """Orth 'b a' but the denominator only contains 'b x'."""
    arcs = [(0, 1, 2, (1.0, 0.5)), (1, 2, 3, (1.0, 0.5))]
    return FlfLattice.build(SR, 3, arcs, boundaries=[0, 4, 8],
                            initial=0, finals={2: (0.0, 0.0)}, words=WORDS)


def num_s1():
    """Spoken linear lattice for s1: b a."""
    arcs = [(0, 1, 2, (1.2, 0.0)), (1, 2, 1, (1.1, 0.0))]
    return FlfLattice.build(SR, 3, arcs, boundaries=[0, 4, 8],
                            initial=0, finals={2: (0.0, 0.0)}, words=WORDS)


def num_s0():
    arcs = [(0, 1, 1, (1.0, 0.0)), (1, 2, 2, (1.0, 0.0))]
    return FlfLattice.build(SR, 3, arcs, boundaries=[0, 5, 8],
                            initial=0, finals={2: (0.0, 0.0)}, words=WORDS)


@pytest.fixture
def setup(tmp_path):
    (tmp_path / "corpus.xml").write_text(textwrap.dedent("""\
        <corpus name="c">
          <recording name="r" audio="x.wav">
            <segment name="s0" start="0" end="1"><orth>a b</orth></segment>
            <segment name="s1" start="1" end="2"><orth>b a</orth></segment>
          </recording>
        </corpus>
    """))
    den = FlfArchiveWriter(str(tmp_path / "den.cache"))
    den.write("c/r/s0", den_s0())
    den.write("c/r/s1", den_s1())
    den.close()
    num = FlfArchiveWriter(str(tmp_path / "num.cache"))
    num.write("c/r/s0", num_s0())
    num.write("c/r/s1", num_s1())
    num.close()
    return tmp_path


def run_chain(tmp_path, body: str) -> int:
    cfg = tmp_path / "lp.config"
    cfg.write_text(textwrap.dedent(f"""\
        [corpus]
        file = {tmp_path}/corpus.xml
        """) + textwrap.dedent(body))
    return lp_main([f"--config={cfg}"])


def read_out(tmp_path, name="out.cache"):
    r = FlfArchiveReader(str(tmp_path / name))
    return {k: r.read(k) for k in ("c/r/s0", "c/r/s1")}


def path_words(lat, ignore_sil=True):
    labels, _s, _a = lat.best()
    out = [WORDS.get(l, str(l)) for l in labels]
    if ignore_sil:
        out = [w for w in out if w != "[SILENCE]"]
    return out


class TestNumeratorDenominator:
    def test_numerator_from_denominator(self, setup, capsys):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,numerator-from-denominator,write
            selections = read,num,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        out = read_out(setup)
        # s0: constrained to 'a b' (the x competitor is gone), times kept
        s0 = out["c/r/s0"]
        assert path_words(s0) == ["a", "b"]
        assert 3 not in set(int(l) for l in s0.labels)
        assert int(s0.boundaries.max()) == 8
        # s1: spoken 'b a' not in denominator -> empty numerator
        assert out["c/r/s1"].n_arcs == 0

    def test_merge(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,merge,write
            selections = read,merge,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.merge.numerator-lattice-archive]
            path = {setup}/num.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        out = read_out(setup)
        # s0: spoken already in denominator -> unchanged
        assert out["c/r/s0"].n_arcs == den_s0().n_arcs
        # s1: spoken missing -> numerator united in; 'b a' now reachable
        from rasr_tpu.flf.nodes_lp import _contains_sequence
        assert _contains_sequence(out["c/r/s1"], [2, 1], {4})
        assert out["c/r/s1"].n_arcs > den_s1().n_arcs

    def test_unite(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,unite,write
            selections = read,unite,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.unite.numerator-lattice-archive]
            path = {setup}/num.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        out = read_out(setup)
        assert out["c/r/s0"].n_arcs == den_s0().n_arcs + num_s0().n_arcs + 2

    def test_spoken_and_competing(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,spoken-and-competing,write
            selections = read,sc,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.sc]
            competing-count = 1
            [lattice-processor.sc.numerator-lattice-archive]
            path = {setup}/num.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        from rasr_tpu.flf.nodes_lp import _contains_sequence
        out = read_out(setup)
        # spoken present AND the top competitor ('a x') present
        assert _contains_sequence(out["c/r/s0"], [1, 2], {4})
        assert _contains_sequence(out["c/r/s0"], [1, 3], {4})

    def test_generate_numerator(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,generate-numerator,write
            selections = read,gen,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        assert path_words(read_out(setup)["c/r/s0"]) == ["a", "b"]


class TestScoresAndStats:
    def test_change_semiring_and_linear_combination(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,change-semiring,linear-combination,write
            selections = read,cs,lc,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.cs.semiring]
            keys = am lm
            scales = 1.0 3.0
            [lattice-processor.lc]
            outputs = total
            [lattice-processor.lc.total]
            scales = 1.0 3.0
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        s0 = read_out(setup)["c/r/s0"]
        assert s0.semiring.keys == ("total",)
        ref = den_s0()
        np.testing.assert_allclose(
            s0.scores[:, 0], ref.scores @ np.asarray([1.0, 3.0]))

    def test_rescore_distance_and_tdp(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,rescore,write
            selections = read,rs,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.rs]
            distance-rescorers = dist
            tdp-rescorers = tdp
            [lattice-processor.rs.dist]
            distance-type = approximate-word-accuracy
            [lattice-processor.rs.tdp]
            penalty-per-frame = 0.5
            [lattice-processor.rs.numerator-lattice-archive]
            path = {setup}/num.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        s0 = read_out(setup)["c/r/s0"]
        assert s0.semiring.has("accuracy") and s0.semiring.has("tdp")
        acc = s0.scores[:, s0.semiring.id_of("accuracy")]
        lab = s0.labels
        # Povey: 'b' (5..8) fully covers ref 'b' (5..8) -> -1+2*1 = 1;
        # 'a' (2..5) covers 3/5 of ref 'a' (0..5) -> -1+2*0.6 = 0.2;
        # competitor 'x' (5..8) only overlaps a non-matching ref -> 0
        assert acc[lab == 2].max() == pytest.approx(1.0)
        assert acc[lab == 1].max() == pytest.approx(0.2)
        assert acc[lab == 3].max() == pytest.approx(0.0)
        tdp = s0.scores[:, s0.semiring.id_of("tdp")]
        frames = (s0.boundaries[s0.targets]
                  - s0.boundaries[s0.sources]).astype(float)
        np.testing.assert_allclose(tdp, 0.5 * frames)

    def test_error_and_density_stats(self, setup, capsys):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,density,graph-error-rate,timeframe-error,write
            selections = read,density,ger,tfe,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.tfe.numerator-lattice-archive]
            path = {setup}/num.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        out = capsys.readouterr().out
        assert "<density-summary" in out
        # s0 contains the truth (GER 0 for it); s1 does not (errors > 0)
        assert '<ger segment="c/r/s0" errors=0' in out
        assert '<ger segment="c/r/s1" errors=1' in out
        assert "<timeframe-error-summary" in out

    def test_remove_silences_and_prune(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,remove-silences-and-noises,prune,write
            selections = read,rsn,prune,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.prune]
            threshold = 50
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        s0 = read_out(setup)["c/r/s0"]
        assert 4 not in set(int(l) for l in s0.labels)


class TestWordToPhoneme:
    def test_word_to_phoneme(self, setup):
        (setup / "lexicon.xml").write_text(textwrap.dedent("""\
            <lexicon>
              <phoneme-inventory>
                <phoneme><symbol>A</symbol></phoneme>
                <phoneme><symbol>B</symbol></phoneme>
                <phoneme><symbol>si</symbol><variation>none</variation>
                </phoneme>
              </phoneme-inventory>
              <lemma special="silence"><orth>[SILENCE]</orth>
                <phon>si</phon></lemma>
              <lemma><orth>a</orth><phon>A A B</phon></lemma>
              <lemma><orth>b</orth><phon>B A</phon></lemma>
              <lemma><orth>x</orth><phon>B B</phon></lemma>
            </lexicon>
        """))
        assert run_chain(setup, f"""
            [lexicon]
            file = {setup}/lexicon.xml
            [lattice-processor]
            actions    = read,numerator-from-denominator,word-to-phoneme,write
            selections = read,num,w2p,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        s0 = read_out(setup)["c/r/s0"]
        # a b -> A A B B A along the best path (labels re-keyed to the
        # phoneme alphabet in the output lattice's own word table)
        labels, _s, _a = s0.best()
        assert [s0.word_of(l) for l in labels][-5:] == \
            ["A", "A", "B", "B", "A"]


class TestLegacyCli:
    def test_positional_still_works(self, tmp_path, capsys):
        from rasr_tpu.lattice.word_lattice import WordLattice
        lat = WordLattice(words={1: "a"})
        s0, s1 = lat.add_state(0), lat.add_state(4)
        lat.initial = s0
        lat.add_arc(s0, s1, 1, 1.0, 0.0)
        lat.set_final(s1)
        lat.write_htk_slf(str(tmp_path / "x.slf"))
        assert lp_main(["best", str(tmp_path / "x.slf")]) == 0
        assert "a" in capsys.readouterr().out


class TestRemainingActions:
    def test_best_nbest_confidence_mbr(self, setup, capsys):
        """single-best-legacy / extract-n-best-list /
        word-posterior-confidence / search-minimum-bayes-risk /
        determinization / remove-epsilon all run from config."""
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,remove-epsilon,determinization,word-posterior-confidence,search-minimum-bayes-risk,write
            selections = read,re,det,conf,mbr,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        out = read_out(setup)
        assert out["c/r/s0"].n_arcs > 0

    def test_single_best_and_nbest(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,extract-n-best-list,single-best-legacy,write
            selections = read,nb,best,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.nb]
            n = 3
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        s0 = read_out(setup)["c/r/s0"]
        # single best of the n-best union: one linear path
        labels, _sc, arcs = s0.best()
        assert labels  # non-empty best path survives the chain

    def test_multiply_and_skip_empty(self, setup):
        assert run_chain(setup, f"""
            [lattice-processor]
            actions    = read,multiply,skip-empty,write
            selections = read,mult,skip,write
            [lattice-processor.read.lattice-archive]
            path = {setup}/den.cache
            format = flf
            [lattice-processor.mult]
            key = am
            value = 2.0
            [lattice-processor.skip]
            min-arcs = 1
            [lattice-processor.write.lattice-archive]
            path = {setup}/out.cache
            format = flf
        """) == 0
        s0 = read_out(setup)["c/r/s0"]
        ref = den_s0()
        am_i = s0.semiring.id_of("am")
        np.testing.assert_allclose(
            sorted(s0.scores[:, am_i]), sorted(2.0 * ref.scores[:, 0]))
