"""CTC decode tests: greedy collapse semantics and prefix beam search vs a
brute-force reference implementation (exhaustive path sum)."""

import itertools
import math

import numpy as np
import pytest

from rasr_tpu.search.ctc_decode import ctc_greedy, ctc_prefix_beam


def brute_force_best_prefix(log_probs, blank=0):
    """Exact best CTC prefix by enumerating ALL alignment paths (tiny T/V):
    p(prefix) = sum over paths collapsing to prefix."""
    T, V = log_probs.shape
    from collections import defaultdict
    scores = defaultdict(lambda: -np.inf)
    for path in itertools.product(range(V), repeat=T):
        lp = sum(log_probs[t, v] for t, v in enumerate(path))
        # collapse
        out = []
        prev = -1
        for v in path:
            if v != blank and v != prev:
                out.append(v)
            prev = v
        key = tuple(out)
        scores[key] = np.logaddexp(scores[key], lp)
    best = max(scores.items(), key=lambda kv: kv[1])
    return best[0], best[1], dict(scores)


class TestGreedy:
    def test_collapse(self):
        # argmax sequence: b l a a - a b b  (blank=0) -> labels l a a b?
        # build log_probs with argmax [1, 2, 2, 0, 2, 3, 3]
        V = 4
        seq = [1, 2, 2, 0, 2, 3, 3]
        lp = np.full((1, len(seq), V), -10.0, dtype=np.float32)
        for t, v in enumerate(seq):
            lp[0, t, v] = 0.0
        labels, n = ctc_greedy(lp, np.array([len(seq)]))
        assert int(n[0]) == 4
        assert labels[0, :4].tolist() == [1, 2, 2, 3]

    def test_length_mask(self):
        V = 3
        lp = np.full((1, 5, V), -10.0, dtype=np.float32)
        lp[0, :, 1] = 0.0  # argmax all 1
        labels, n = ctc_greedy(lp, np.array([3]))
        assert int(n[0]) == 1  # collapsed, padding frames ignored

    def test_batched(self):
        rng = np.random.default_rng(0)
        lp = np.log(rng.dirichlet(np.ones(5), size=(3, 10))).astype(np.float32)
        labels, n = ctc_greedy(lp, np.array([10, 7, 4]))
        assert labels.shape == (3, 10)


class TestPrefixBeam:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(1)
        T, V = 5, 4
        lp = np.log(rng.dirichlet(np.ones(V), size=(1, T))).astype(np.float32)
        # beam >= number of reachable prefixes (sum 3^t <= 121) => exact sum
        labels, n, scores = ctc_prefix_beam(lp, np.array([T]), beam=128, topk=V)
        best_prefix, best_lp, all_scores = brute_force_best_prefix(lp[0])
        got_prefix = tuple(labels[0, 0, :int(n[0, 0])].tolist())
        assert got_prefix == best_prefix
        np.testing.assert_allclose(-scores[0, 0], best_lp, atol=1e-3)
        # with a small beam the best prefix is still found (identity only)
        l8, n8, _ = ctc_prefix_beam(lp, np.array([T]), beam=8, topk=V)
        assert tuple(l8[0, 0, :int(n8[0, 0])].tolist()) == best_prefix

    def test_beam_scores_match_brute_force(self):
        """Every returned beam entry's score equals the exact prefix
        probability (when beam is large enough to avoid pruning loss)."""
        rng = np.random.default_rng(2)
        T, V = 4, 3
        lp = np.log(rng.dirichlet(np.ones(V), size=(1, T))).astype(np.float32)
        # beam >= reachable prefixes (sum 2^t = 31) => every score exact
        labels, n, scores = ctc_prefix_beam(lp, np.array([T]), beam=32, topk=V)
        _, _, all_scores = brute_force_best_prefix(lp[0])
        for b in range(4):
            prefix = tuple(labels[0, b, :int(n[0, b])].tolist())
            if prefix in all_scores and scores[0, b] < 1e29:
                np.testing.assert_allclose(-scores[0, b], all_scores[prefix],
                                           atol=1e-3, err_msg=str(prefix))

    def test_repeated_label_handling(self):
        """'a a' requires blank between; 'a-a' vs 'aa' distinction."""
        # strongly favor label 1 at t=0, blank at t=1, label 1 at t=2
        lp = np.full((1, 3, 3), -20.0, dtype=np.float32)
        lp[0, 0, 1] = -0.01
        lp[0, 1, 0] = -0.01
        lp[0, 2, 1] = -0.01
        labels, n, scores = ctc_prefix_beam(lp, np.array([3]), beam=8, topk=3)
        assert labels[0, 0, :int(n[0, 0])].tolist() == [1, 1]

    def test_batched_consistency(self):
        rng = np.random.default_rng(3)
        T, V = 6, 5
        lp = np.log(rng.dirichlet(np.ones(V), size=(2, T))).astype(np.float32)
        l2, n2, s2 = ctc_prefix_beam(lp, np.array([T, T]), beam=8, topk=V)
        l1, n1, s1 = ctc_prefix_beam(lp[:1], np.array([T]), beam=8, topk=V)
        np.testing.assert_allclose(s2[0], s1[0], atol=1e-4)
        np.testing.assert_array_equal(l2[0], l1[0])

    def test_length_mask_freezes(self):
        rng = np.random.default_rng(4)
        T, V = 8, 4
        lp = np.log(rng.dirichlet(np.ones(V), size=(1, T))).astype(np.float32)
        full = np.concatenate([lp, np.zeros((1, 4, V), np.float32)], axis=1)
        la, na, sa = ctc_prefix_beam(lp, np.array([T]), beam=4, topk=V)
        lb, nb, sb = ctc_prefix_beam(full, np.array([T]), beam=4, topk=V)
        np.testing.assert_allclose(sa[0], sb[0], atol=1e-4)
        np.testing.assert_array_equal(la[0, 0, :T], lb[0, 0, :T])
