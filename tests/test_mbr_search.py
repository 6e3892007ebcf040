"""MBR n-best searches (search/mbr.py): naive scan vs Goel-Byrne A*
equivalence, shortcut criteria, vectorized Levenshtein columns.
Reference: src/Search/MinimumBayesRiskNBestListSearch.cc,
src/Search/MinimumBayesRiskAStarSearch.cc."""

import numpy as np
import pytest

from rasr_tpu.search.mbr import (MinimumBayesRiskAStarSearch,
                                 MinimumBayesRiskNBestListNaiveSearch,
                                 StringHypothesis, _ColumnSet, levenshtein,
                                 nbest_from_fsa, posterior_risk_nbest)

pytestmark = pytest.mark.fast


def brute_levenshtein(a, b):
    n, m = len(a), len(b)
    d = np.zeros((n + 1, m + 1), int)
    d[:, 0] = np.arange(n + 1)
    d[0, :] = np.arange(m + 1)
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i, j] = min(d[i - 1, j] + 1, d[i, j - 1] + 1,
                          d[i - 1, j - 1] + (a[i - 1] != b[j - 1]))
    return d[n, m]


def test_levenshtein_matches_bruteforce():
    rng = np.random.default_rng(0)
    for _ in range(30):
        a = rng.integers(0, 4, rng.integers(0, 8)).tolist()
        b = rng.integers(0, 4, rng.integers(0, 8)).tolist()
        assert levenshtein(a, b) == brute_levenshtein(a, b)


def test_column_set_advance_matches_scalar():
    rng = np.random.default_rng(1)
    sents = [tuple(rng.integers(0, 3, rng.integers(1, 7))) for _ in range(5)]
    lengths = np.asarray([len(s) for s in sents])
    L = int(lengths.max())
    padded = np.full((5, L), -1, np.int64)
    for j, s in enumerate(sents):
        padded[j, :len(s)] = s
    prefix = tuple(rng.integers(0, 3, 6))
    cols = _ColumnSet.initial(5, L)
    for x in prefix:
        cols = cols.advance(padded, int(x))
    got = cols.final_distances(lengths)
    want = [levenshtein(prefix, s) for s in sents]
    np.testing.assert_array_equal(got, want)
    # lower bounds are admissible for any completion
    lb = cols.lower_bounds(lengths)
    for j, s in enumerate(sents):
        assert lb[j] <= levenshtein(prefix + s, s)  # any extension


def _random_nbest(rng, n, vocab=4, max_len=6):
    seen = {}
    while len(seen) < n:
        s = tuple(rng.integers(0, vocab, rng.integers(1, max_len + 1)))
        if s not in seen:
            seen[s] = float(rng.uniform(0.5, 6.0))
    out = sorted(seen.items(), key=lambda kv: kv[1])
    return [(list(k), v) for k, v in out]


def test_astar_equals_naive():
    rng = np.random.default_rng(2)
    for trial in range(10):
        nbest = _random_nbest(rng, 12)
        naive = MinimumBayesRiskNBestListNaiveSearch().perform_search(nbest)
        astar = MinimumBayesRiskAStarSearch().perform_search(nbest)
        if naive.one_half_criterion or naive.distance_one_criterion:
            continue
        assert astar.risk == pytest.approx(naive.risk, abs=1e-9)
        # risk ties may pick different sentences; both must be optimal
        r, _, _ = posterior_risk_nbest(
            astar.sentence,
            [StringHypothesis(tuple(s), w) for s, w in nbest])
        assert r == pytest.approx(naive.risk, abs=1e-9)


def test_one_half_criterion_shortcuts():
    # MAP has posterior > 1/2 -> MAP == MBR, no evaluation loop
    nbest = [([1, 2], 0.0), ([1, 3], 3.0), ([2, 3], 3.0)]
    res = MinimumBayesRiskNBestListNaiveSearch().perform_search(nbest)
    assert res.one_half_criterion
    assert res.sentence == (1, 2)
    assert res.number_evaluations == 1


def test_mbr_beats_map_on_split_mass():
    """Classic case: MAP is an outlier; mass concentrates around a
    cluster whose centroid minimizes expected edit distance."""
    nbest = [
        ([9, 9, 9], 1.00),        # MAP (barely), far from the cluster
        ([1, 2, 3], 1.05),
        ([1, 2, 4], 1.06),
        ([1, 2, 5], 1.07),
        ([1, 2, 6], 1.08),
    ]
    naive = MinimumBayesRiskNBestListNaiveSearch().perform_search(nbest)
    astar = MinimumBayesRiskAStarSearch().perform_search(nbest)
    assert naive.sentence[:2] == (1, 2)
    assert naive.risk < naive.map_risk
    assert astar.sentence == naive.sentence
    assert astar.risk == pytest.approx(naive.risk, abs=1e-12)


def test_astar_explores_less_on_peaked_posterior():
    rng = np.random.default_rng(3)
    nbest = _random_nbest(rng, 30)
    # make the list peaked but below the shortcut criteria
    nbest = [(s, 0.25 * i) for i, (s, _) in enumerate(nbest)]
    naive = MinimumBayesRiskNBestListNaiveSearch().perform_search(nbest)
    if naive.one_half_criterion or naive.distance_one_criterion:
        pytest.skip("criteria fired; nothing to compare")
    astar = MinimumBayesRiskAStarSearch().perform_search(nbest)
    assert astar.risk == pytest.approx(naive.risk, abs=1e-9)
    assert astar.number_computations < 30 * sum(
        len(s) + 1 for s, _ in nbest)


def test_nbest_from_fsa():
    from rasr_tpu.fsa.automaton import Automaton
    fsa = Automaton()
    for _ in range(3):
        fsa.add_state()
    fsa.set_final(2)
    fsa.add_arc(0, 1, 1, weight=0.5)
    fsa.add_arc(1, 2, 2, weight=0.5)
    fsa.add_arc(0, 1, 3, weight=2.0)
    nbest = nbest_from_fsa(fsa, 2)
    assert nbest[0][0] == [1, 2]
    res = MinimumBayesRiskNBestListNaiveSearch().perform_search(nbest)
    assert res.sentence == (1, 2)
