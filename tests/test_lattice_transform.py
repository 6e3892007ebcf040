"""Lattice transforms: time conditioning, determinize, minimize,
arc-cluster confusion networks."""

import math

import pytest

from rasr_tpu.fsa.automaton import EPS
from rasr_tpu.lattice import (WordLattice, build_confusion_network,
                              build_confusion_network_arc_cluster,
                              determinize_lattice, minimize_lattice,
                              time_conditioned)


def two_path_lattice():
    """hello(1)->world(2) vs hallo(3)->world(2), shared times."""
    lat = WordLattice(words={1: "hello", 2: "world", 3: "hallo"})
    s0 = lat.add_state(0)
    a1 = lat.add_state(10)
    a2 = lat.add_state(10)   # same time, different context state
    e = lat.add_state(20)
    lat.add_arc(s0, a1, 1, am_score=1.0, lm_score=0.5)
    lat.add_arc(s0, a2, 3, am_score=2.0, lm_score=0.5)
    lat.add_arc(a1, e, 2, am_score=1.0, lm_score=0.25)
    lat.add_arc(a2, e, 2, am_score=1.0, lm_score=0.25)
    lat.set_final(e, 0.0)
    return lat


def nondet_lattice():
    """Same word twice from the initial state (different scores)."""
    lat = WordLattice(words={1: "a", 2: "b", 3: "c"})
    s0 = lat.add_state(0)
    m1 = lat.add_state(5)
    m2 = lat.add_state(5)
    e = lat.add_state(10)
    lat.add_arc(s0, m1, 1, am_score=1.0)
    lat.add_arc(s0, m2, 1, am_score=2.0)
    lat.add_arc(m1, e, 2, am_score=0.5)
    lat.add_arc(m2, e, 3, am_score=0.5)
    lat.set_final(e)
    return lat


class TestTimeConditioned:
    def test_merges_equal_time_states(self):
        lat = two_path_lattice()
        tc = time_conditioned(lat)
        assert tc.n_states == 3  # times 0, 10, 20
        # the two world arcs collapse into one (identical scores/times)
        assert tc.n_arcs == 3
        # language preserved
        words = {tuple(tc.best(1.0, 1.0)[0])}
        assert tuple(lat.best(1.0, 1.0)[0]) in words

    def test_boundaries_sorted(self):
        tc = time_conditioned(two_path_lattice())
        assert tc.boundaries == sorted(tc.boundaries)


class TestDeterminize:
    def test_one_arc_per_word(self):
        det = determinize_lattice(nondet_lattice())
        for s in range(det.n_states):
            words = [a.word for a in det.arcs[s]]
            assert len(words) == len(set(words))

    def test_path_scores_preserved(self):
        lat = nondet_lattice()
        det = determinize_lattice(lat)
        # a-b best cost: 1.0+0.5 ; a-c: 2.0+0.5
        fsa_in = lat.automaton()
        fsa_out = det.automaton()
        for seq in ([1, 2], [1, 3]):
            assert abs(fsa_in.accepts(seq) - fsa_out.accepts(seq)) < 1e-9

    def test_boundaries_from_subsets(self):
        det = determinize_lattice(nondet_lattice())
        assert det.boundaries[det.initial] == 0
        assert 5 in det.boundaries  # merged middle states keep time 5


class TestMinimize:
    def test_language_preserved(self):
        lat = two_path_lattice()
        m = minimize_lattice(lat)
        fsa_in = lat.automaton()
        fsa_out = m.automaton()
        for seq in ([1, 2], [3, 2]):
            assert abs(fsa_in.accepts(seq) - fsa_out.accepts(seq)) < 1e-9
        assert m.n_states <= lat.n_states


class TestArcClusterCn:
    def test_matches_pivot_decode(self):
        lat = two_path_lattice()
        cn1 = build_confusion_network(lat)
        cn2 = build_confusion_network_arc_cluster(lat)
        w1, _ = cn1.decode()
        w2, _ = cn2.decode()
        assert w1 == w2 == [1, 2]  # hello world wins (lower cost)

    def test_slot_structure(self):
        cn = build_confusion_network_arc_cluster(two_path_lattice())
        assert len(cn.slots) == 2
        first = cn.slots[0].posteriors
        # hello vs hallo compete in the first slot
        assert 1 in first and 3 in first
        assert first[1] > first[3]
        total = sum(p for w, p in first.items())
        assert abs(total - 1.0) < 1e-6
        # second slot: world with posterior ~1
        second = cn.slots[1].posteriors
        assert abs(second[2] - 1.0) < 1e-6

    def test_decode_orth(self):
        cn = build_confusion_network_arc_cluster(two_path_lattice())
        assert cn.decode_orth() == "hello world"


class TestLatticeProcessorCli:
    def test_pipeline(self, tmp_path, capsys):
        from rasr_tpu.tools import lattice_processor as lp
        lat = two_path_lattice()
        src = tmp_path / "in.slf"
        lat.write_htk_slf(str(src))
        assert lp.main(["info", str(src)]) == 0
        out = capsys.readouterr().out
        assert "states: 4" in out
        assert lp.main(["best", str(src)]) == 0
        assert "hello world" in capsys.readouterr().out
        assert lp.main(["extract-n-best-list", "2", str(src)]) == 0
        nbest = capsys.readouterr().out.strip().splitlines()
        assert len(nbest) == 2
        dst = tmp_path / "tc.slf"
        assert lp.main(["time-conditioned", str(src), str(dst)]) == 0
        from rasr_tpu.lattice import WordLattice
        back = WordLattice.read_htk_slf(str(dst))
        assert back.n_states == 3

    def test_remove_silences(self, tmp_path):
        from rasr_tpu.tools import lattice_processor as lp
        lat = WordLattice(words={1: "hello", 2: "[SILENCE]"})
        s0, s1, s2 = lat.add_state(0), lat.add_state(5), lat.add_state(9)
        lat.add_arc(s0, s1, 1, am_score=1.0)
        lat.add_arc(s1, s2, 2, am_score=0.5)
        lat.set_final(s2)
        out = lp.remove_silences(lat)
        words = [a.word for s in range(out.n_states) for a in out.arcs[s]]
        assert 2 not in words and 1 in words and 0 in words  # sil -> eps
