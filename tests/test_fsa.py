"""FSA algorithm tests: sssp, best path, n-best, determinize, compose,
epsilon removal, prune — small hand-verified cases."""

import math

import pytest

from rasr_tpu.fsa import (EPS, INF, LOG, TROPICAL, Automaton, best_path, compose, minimize,
                          connect, determinize, linear_automaton, n_best,
                          prune, remove_epsilons, sssp)


def diamond():
    """0 -a(1)-> 1 -c(1)-> 3(final), 0 -b(3)-> 2 -c(0)-> 3."""
    f = Automaton()
    for _ in range(4):
        f.add_state()
    f.add_arc(0, 1, 1, weight=1.0)
    f.add_arc(0, 2, 2, weight=3.0)
    f.add_arc(1, 3, 3, weight=1.0)
    f.add_arc(2, 3, 3, weight=0.0)
    f.set_final(3, 0.5)
    return f


class TestBasics:
    def test_sssp_forward(self):
        d = sssp(diamond())
        assert d == [0.0, 1.0, 3.0, 2.0]

    def test_sssp_backward(self):
        d = sssp(diamond(), backward=True)
        assert d == [2.5, 1.5, 0.5, 0.5]

    def test_best_path(self):
        ilabels, olabels, score = best_path(diamond())
        assert ilabels == [1, 3]
        assert abs(score - 2.5) < 1e-9

    def test_accepts(self):
        f = diamond()
        assert abs(f.accepts([1, 3]) - 2.5) < 1e-9
        assert abs(f.accepts([2, 3]) - 3.5) < 1e-9
        assert f.accepts([1, 2]) == INF

    def test_n_best(self):
        paths = n_best(diamond(), 3)
        assert len(paths) == 2
        assert paths[0] == ([1, 3], 2.5)
        assert paths[1] == ([2, 3], 3.5)

    def test_linear(self):
        f = linear_automaton([5, 6, 7], [0.1, 0.2, 0.3])
        assert abs(f.accepts([5, 6, 7]) - 0.6) < 1e-9


class TestLogSemiring:
    def test_log_sssp_sums_paths(self):
        f = diamond()
        f.semiring = LOG
        d = sssp(f, backward=True)
        # state 0: two paths with total scores 2.5 and 3.5
        expected = -math.log(math.exp(-2.5) + math.exp(-3.5))
        assert abs(d[0] - expected) < 1e-9


class TestTransforms:
    def test_connect_removes_dead_states(self):
        f = diamond()
        dead = f.add_state()
        f.add_arc(1, dead, 9, weight=0.0)  # dead end
        out = connect(f)
        assert out.n_states == 4
        assert abs(out.accepts([1, 3]) - 2.5) < 1e-9

    def test_prune(self):
        out = prune(diamond(), threshold=0.5)
        # only the best path (2.5) survives; second path is at 3.5
        assert out.accepts([1, 3]) < INF
        assert out.accepts([2, 3]) == INF

    def test_remove_epsilons(self):
        f = Automaton()
        for _ in range(4):
            f.add_state()
        f.add_arc(0, 1, EPS, weight=0.5)
        f.add_arc(1, 2, 7, weight=1.0)
        f.add_arc(2, 3, EPS, weight=0.25)
        f.set_final(3)
        out = remove_epsilons(f)
        assert abs(out.accepts([7]) - 1.75) < 1e-9
        for s in range(out.n_states):
            for arc in out.arcs[s]:
                assert arc.ilabel != EPS

    def test_determinize(self):
        f = Automaton()
        for _ in range(4):
            f.add_state()
        # two arcs with same label from initial
        f.add_arc(0, 1, 5, weight=1.0)
        f.add_arc(0, 2, 5, weight=2.0)
        f.add_arc(1, 3, 6, weight=0.0)
        f.add_arc(2, 3, 7, weight=0.0)
        f.set_final(3)
        out = determinize(f)
        # deterministic: one arc per label per state
        for s in range(out.n_states):
            labels = [a.ilabel for a in out.arcs[s]]
            assert len(labels) == len(set(labels))
        assert abs(out.accepts([5, 6]) - 1.0) < 1e-9
        assert abs(out.accepts([5, 7]) - 2.0) < 1e-9

    def test_compose(self):
        # a: maps 1->10 ; b: maps 10->100
        a = Automaton()
        a.add_state(); a.add_state()
        a.add_arc(0, 1, 1, 10, 0.5)
        a.set_final(1)
        b = Automaton()
        b.add_state(); b.add_state()
        b.add_arc(0, 1, 10, 100, 0.25)
        b.set_final(1)
        c = compose(a, b)
        ilabels, olabels, score = best_path(c)
        assert ilabels == [1] and olabels == [100]
        assert abs(score - 0.75) < 1e-9


class TestMinimize:
    def test_merges_equivalent_states(self):
        from rasr_tpu.fsa import minimize
        # two redundant parallel chains accepting the same string
        f = Automaton()
        for _ in range(5):
            f.add_state()
        f.add_arc(0, 1, 5, weight=1.0)
        f.add_arc(0, 2, 5, weight=1.0)
        f.add_arc(1, 3, 6, weight=0.5)
        f.add_arc(2, 4, 6, weight=0.5)
        f.set_final(3)
        f.set_final(4)
        m = minimize(f)
        assert m.n_states < f.n_states
        assert abs(m.accepts([5, 6]) - 1.5) < 1e-9
        assert m.accepts([6, 5]) == INF

    def test_preserves_language_and_weights(self):
        from rasr_tpu.fsa import minimize
        f = diamond()
        m = minimize(f)
        for seq in ([1, 3], [2, 3]):
            assert abs(m.accepts(seq) - f.accepts(seq)) < 1e-9
        assert m.accepts([1, 2]) == INF

    def test_reverse(self):
        from rasr_tpu.fsa import reverse
        f = linear_automaton([7, 8, 9], [0.1, 0.2, 0.3])
        r = reverse(f)
        assert abs(r.accepts([9, 8, 7]) - 0.6) < 1e-9
        assert r.accepts([7, 8, 9]) == INF


class TestEpsilonFilterCompose:
    """Composition with the 3-state epsilon filter: epsilon interleavings
    are matched exactly once, so log-semiring weights stay exact
    (reference tCompose; Mohri/Pereira/Riley filter)."""

    def _ab_with_eps(self, semiring):
        # A: 0 -x:eps(w=1)-> 1 -eps:y(w=2)-> 2(final 0)
        a = Automaton(semiring=semiring)
        for _ in range(3):
            a.add_state()
        a.add_arc(0, 1, 5, EPS, 1.0)
        a.add_arc(1, 2, EPS, 7, 2.0)
        a.set_final(2, 0.0)
        # B: 0 -y:z(w=4)-> 1(final 0), plus eps self-advance 0 -eps:eps-> 0'
        b = Automaton(semiring=semiring)
        for _ in range(3):
            b.add_state()
        b.add_arc(0, 1, EPS, EPS, 0.5)
        b.add_arc(0, 2, 7, 9, 4.0)
        b.add_arc(1, 2, 7, 9, 4.0)
        b.set_final(2, 0.0)
        return a, b

    def test_log_weight_counts_each_path_once(self):
        from rasr_tpu.fsa.automaton import LOG, logadd
        a, b = self._ab_with_eps(LOG)
        c = compose(a, b)
        total = sssp(c, backward=True)[c.initial]
        # two genuine paths: with and without B's eps arc (0.5)
        expected = logadd(1.0 + 2.0 + 4.0, 1.0 + 0.5 + 2.0 + 4.0)
        assert abs(total - expected) < 1e-6

    def test_tropical_best_path_unchanged(self):
        a, b = self._ab_with_eps(TROPICAL)
        c = compose(a, b)
        labels, olabels, score = best_path(c)
        assert [l for l in labels if l != EPS] == [5]
        assert [o for o in olabels if o != EPS] == [9]
        assert abs(score - 7.0) < 1e-6


class TestTransducerDeterminize:
    def test_transducer_subset_with_output_residuals(self):
        # same input label, different output prefixes -> residuals
        t = Automaton()
        for _ in range(4):
            t.add_state()
        t.add_arc(0, 1, 3, 11, 1.0)
        t.add_arc(0, 2, 3, 12, 2.0)
        t.add_arc(1, 3, 4, 13, 0.0)
        t.add_arc(2, 3, 4, 14, 0.0)
        t.set_final(3, 0.0)
        d = determinize(t)
        # deterministic on input
        for s in range(d.n_states):
            labels = [arc.ilabel for arc in d.arcs[s] if arc.ilabel != EPS]
            assert len(labels) == len(set(labels))
        # both input-output pairs survive with exact weights
        def relation(fsa):
            rel = {}
            def walk(s, w, ins, outs):
                if fsa.is_final(s):
                    key = (tuple(ins), tuple(outs))
                    tot = w + fsa.final[s]
                    if key not in rel or tot < rel[key]:
                        rel[key] = tot
                for arc in fsa.arcs[s]:
                    walk(arc.target, w + arc.weight,
                         ins + ([arc.ilabel] if arc.ilabel != EPS else []),
                         outs + ([arc.olabel] if arc.olabel != EPS else []))
            walk(fsa.initial, 0.0, [], [])
            return rel
        assert relation(d) == relation(t)

    def test_common_prefix_emitted_early(self):
        t = Automaton()
        for _ in range(3):
            t.add_state()
        t.add_arc(0, 1, 3, 20, 0.0)
        t.add_arc(0, 2, 3, 20, 1.0)
        t.add_arc(1, 1, 4, 21, 0.0)
        t.set_final(1, 0.0)
        t.set_final(2, 0.5)
        d = determinize(t)
        first = [arc for arc in d.arcs[d.initial] if arc.ilabel == 3]
        assert len(first) == 1 and first[0].olabel == 20

    def test_transducer_minimize_preserves_relation(self):
        t = Automaton()
        for _ in range(5):
            t.add_state()
        t.add_arc(0, 1, 3, 11, 1.0)
        t.add_arc(0, 2, 4, 12, 2.0)
        t.add_arc(1, 3, 5, 13, 0.0)
        t.add_arc(2, 4, 5, 13, 0.0)
        t.set_final(3, 0.0)
        t.set_final(4, 0.0)
        m = minimize(t)
        assert m.n_states <= t.n_states
        assert abs(m.accepts([3, 5]) - 1.0) < 1e-6
        assert abs(m.accepts([4, 5]) - 2.0) < 1e-6


class TestCyclicLogSssp:
    def test_self_loop_geometric_sum(self):
        from rasr_tpu.fsa.automaton import LOG
        import math
        # 0 -a(w)-> 0 (self loop), 0 final(0): sum_k p^k = 1/(1-p)
        p = 0.5
        w = -math.log(p)
        f = Automaton(semiring=LOG)
        f.add_state()
        f.add_arc(0, 0, 1, 1, w)
        f.set_final(0, 0.0)
        total = sssp(f, backward=True)[0]
        assert abs(math.exp(-total) - 1.0 / (1.0 - p)) < 1e-6

    def test_forward_cyclic(self):
        from rasr_tpu.fsa.automaton import LOG
        import math
        p = 0.25
        f = Automaton(semiring=LOG)
        f.add_state(); f.add_state()
        f.add_arc(0, 0, 1, 1, -math.log(p))
        f.add_arc(0, 1, 2, 2, -math.log(0.5))
        f.set_final(1, 0.0)
        dist = sssp(f)
        assert abs(math.exp(-dist[1]) - 0.5 / (1.0 - p)) < 1e-6
