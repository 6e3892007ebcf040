"""Flf core: multi-dim semirings, SoA lattices, native IO."""

import math
import os

import numpy as np
import pytest

from rasr_tpu.flf.lattice import FlfLattice
from rasr_tpu.flf.semiring import LOG, TROPICAL, FlfSemiring


def diamond(semiring=None):
    """0 -a(1)-> 1 -c(1)-> 3 ; 0 -b(2)-> 2 -c(2)-> 3 with (am, lm)."""
    sr = semiring or FlfSemiring(("am", "lm"))
    return FlfLattice.build(
        sr, 4,
        [(0, 1, 1, (1.0, 0.5)), (0, 2, 2, (2.0, 0.25)),
         (1, 3, 3, (1.0, 0.0)), (2, 3, 3, (2.0, 0.0))],
        boundaries=[0, 5, 5, 10], initial=0, finals={3: (0.0, 0.0)},
        words={1: "a", 2: "b", 3: "c"})


class TestSemiring:
    def test_project_and_scales(self):
        sr = FlfSemiring(("am", "lm"), (1.0, 10.0))
        v = np.array([[2.0, 0.5]])
        assert sr.project(v)[0] == pytest.approx(7.0)
        sr2 = sr.with_scale("lm", 2.0)
        assert sr2.project(v)[0] == pytest.approx(3.0)
        assert sr.scales == (1.0, 10.0)  # immutable original

    def test_extend_and_project_dims(self):
        sr = FlfSemiring(("am",))
        sr2 = sr.extended("penalty", 0.5)
        assert sr2.keys == ("am", "penalty")
        sub, ids = sr2.projected(["penalty"])
        assert ids == [1] and sub.scales == (0.5,)

    def test_from_config(self):
        from rasr_tpu.core.configuration import Configuration
        cfg = Configuration()
        cfg.set("semiring.keys", "am lm pen")
        cfg.set("semiring.scales", "1.0 12.0 2.0")
        cfg.set("semiring.type", "log")
        sr = FlfSemiring.from_config(cfg.sub("semiring"))
        assert sr.keys == ("am", "lm", "pen")
        assert sr.scales == (1.0, 12.0, 2.0)
        assert sr.stype == LOG


class TestLattice:
    def test_best_path_tropical(self):
        lat = diamond()
        labels, score, path = lat.best()
        assert labels == [1, 3]  # a-branch is cheaper
        assert score == pytest.approx(2.5)
        # boosting lm scale flips nothing (a-branch also lm-cheaper);
        # raising the am cost of the a-branch flips the decision
        lat.scores[0, 0] = 4.0
        labels2, score2, _ = lat.best()
        assert labels2 == [2, 3]

    def test_posteriors_sum_to_one_per_cut(self):
        lat = diamond(FlfSemiring(("am", "lm"), stype=LOG))
        post = lat.posteriors()
        # arcs 0,1 cross the first cut; arcs 2,3 the second
        assert post[0] + post[1] == pytest.approx(1.0, abs=1e-9)
        assert post[2] + post[3] == pytest.approx(1.0, abs=1e-9)
        # cheaper branch more probable
        assert post[0] > post[1]

    def test_prune_posterior(self):
        lat = diamond()
        pruned = lat.prune_posterior(0.5)  # tight: keeps only best branch
        labels, _, _ = pruned.best()
        assert labels == [1, 3]
        assert pruned.n_arcs == 2

    def test_rescale_is_lazy(self):
        lat = diamond()
        r = lat.rescale(lm=100.0)
        assert r.semiring.scales[1] == 100.0
        assert lat.semiring.scales[1] == 1.0
        np.testing.assert_array_equal(r.scores, lat.scores)

    def test_extend_dim_and_change_semiring(self):
        lat = diamond()
        ext = lat.extend_dim("penalty", const=1.0, scale=2.0)
        assert ext.semiring.keys == ("am", "lm", "penalty")
        _, score, _ = ext.best()
        assert score == pytest.approx(2.5 + 2 * (1.0 + 1.0))
        back = ext.change_semiring(FlfSemiring(("am", "lm")))
        _, score2, _ = back.best()
        assert score2 == pytest.approx(2.5)

    def test_connect_trims_dead_states(self):
        sr = FlfSemiring(("am",))
        lat = FlfLattice.build(
            sr, 4, [(0, 1, 1, (1.0,)), (0, 2, 2, (1.0,))],
            boundaries=[0, 1, 1, 2], finals={1: (0.0,)})
        t = lat.connect()
        assert t.n_states == 2 and t.n_arcs == 1

    def test_remove_epsilons(self):
        sr = FlfSemiring(("am", "lm"))
        lat = FlfLattice.build(
            sr, 4,
            [(0, 1, 0, (0.5, 0.25)),           # eps
             (1, 2, 7, (1.0, 0.0)),
             (2, 3, 0, (0.25, 0.0))],          # eps into final
            boundaries=[0, 0, 4, 4], finals={3: (0.0, 0.0)})
        out = lat.remove_epsilons()
        assert (out.labels != 0).all()
        labels, score, _ = out.best()
        assert labels == [7]
        assert score == pytest.approx(2.0)

    def test_union_and_intersection(self):
        a = diamond()
        b = diamond()
        u = a.union(b)
        labels, score, _ = u.best()
        assert labels == [1, 3] and score == pytest.approx(2.5)
        i = a.intersection(b)
        labels, score, _ = i.best()
        assert labels == [1, 3]
        assert score == pytest.approx(5.0)  # scores add

    def test_difference(self):
        a = diamond()
        # b contains only the [a, c] sequence
        sr = FlfSemiring(("am", "lm"))
        b = FlfLattice.build(sr, 3, [(0, 1, 1, (0.0, 0.0)),
                                     (1, 2, 3, (0.0, 0.0))],
                             boundaries=[0, 1, 2], finals={2: (0.0, 0.0)})
        d = a.difference(b)
        labels, _, _ = d.best()
        assert labels == [2, 3]  # [1, 3] excluded
        seqs = {tuple(l) for l, _ in d.n_best(5)}
        assert (1, 3) not in seqs

    def test_concatenate(self):
        a = diamond()
        c = a.concatenate(a)
        labels, score, _ = c.best()
        assert labels == [1, 3, 1, 3]
        assert score == pytest.approx(5.0)

    def test_word_lattice_roundtrip(self):
        from rasr_tpu.lattice.word_lattice import WordLattice
        wl = WordLattice(words={1: "x", 2: "y"})
        s0, s1, s2 = wl.add_state(0), wl.add_state(3), wl.add_state(6)
        wl.initial = s0
        wl.add_arc(s0, s1, 1, 1.5, 0.5)
        wl.add_arc(s1, s2, 2, 2.0, 0.25)
        wl.set_final(s2, 0.125)
        lat = FlfLattice.from_word_lattice(wl)
        assert lat.semiring.keys == ("am", "lm")
        back = lat.to_word_lattice()
        assert back.n_states == 3
        assert back.arcs[0][0].am_score == pytest.approx(1.5)
        assert back.arcs[0][0].lm_score == pytest.approx(0.5)
        l1, s1_ = wl.best()
        l2, s2_ = back.best()
        assert l1 == l2 and s1_ == pytest.approx(s2_)


class TestIo:
    def test_file_roundtrip(self, tmp_path):
        from rasr_tpu.flf.io import read_flf_file, write_flf_file
        lat = diamond(FlfSemiring(("am", "lm"), (1.0, 17.5)))
        p = str(tmp_path / "seg1.flf")
        write_flf_file(lat, p)
        back = read_flf_file(p)
        assert back.semiring == lat.semiring
        np.testing.assert_allclose(back.scores, lat.scores)
        np.testing.assert_array_equal(back.sources, lat.sources)
        np.testing.assert_array_equal(back.boundaries, lat.boundaries)
        assert back.words == lat.words
        l1, s1, _ = lat.best()
        l2, s2, _ = back.best()
        assert l1 == l2 and s1 == pytest.approx(s2)

    def test_archive_roundtrip(self, tmp_path):
        from rasr_tpu.flf.io import FlfArchiveReader, FlfArchiveWriter
        lat = diamond()
        path = str(tmp_path / "lattices.cache")
        with FlfArchiveWriter(path) as w:
            w.write("corpus/rec/seg-1", lat)
            w.write("corpus/rec/seg-2", lat.rescale(lm=5.0))
        with FlfArchiveReader(path) as r:
            assert sorted(r.segments()) == ["corpus/rec/seg-1",
                                            "corpus/rec/seg-2"]
            one = r.read("corpus/rec/seg-1")
            two = r.read("corpus/rec/seg-2")
        assert one.semiring.scales == (1.0, 1.0)
        assert two.semiring.scales == (1.0, 5.0)
        np.testing.assert_allclose(one.scores, lat.scores)
