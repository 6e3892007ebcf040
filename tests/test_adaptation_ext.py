"""Band-MLLR + semi-tied covariance estimation (reference
src/Mm/BandMllrAdaptation.cc, src/Mm/SemiTiedAdaptation.cc): recovery
and likelihood/objective checks on synthetic Gaussian data."""

import numpy as np
import pytest

from rasr_tpu.mm.adaptation import (AdaptationAccumulator,
                                    apply_mllr_mean_transform,
                                    apply_semi_tied_transform,
                                    estimate_band_mllr_transform,
                                    estimate_mllr_mean_transform,
                                    estimate_semi_tied_transform,
                                    semi_tied_objective)
from rasr_tpu.mm.mixture_set import Mixture, MixtureSet

D, N = 6, 8


def make_model(seed=0):
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((N, D)) * 2.0
    var = rng.uniform(0.5, 1.5, (N, D))
    densities = np.stack([np.arange(N), np.arange(N)], axis=1)
    mixtures = [Mixture([i], [0.0]) for i in range(N)]
    ms = MixtureSet(D, means, var, densities, mixtures)
    return ms, rng


def draw(ms, rng, frames_per_density=400, shift_W=None):
    """Aligned data: frames from each density; means optionally moved
    by the affine transform `shift_W` (D, D+1) first."""
    means = ms.means
    if shift_W is not None:
        ext = np.concatenate([np.ones((N, 1)), means], axis=1)
        means = ext @ shift_W.T
    xs, labs = [], []
    for g in range(N):
        xs.append(means[g] + np.sqrt(ms.covariances[g])
                  * rng.standard_normal((frames_per_density, D)))
        labs.append(np.full(frames_per_density, g))
    return np.concatenate(xs), np.concatenate(labs)


def aligned_ll(ms, x, lab):
    mu = ms.means[lab]
    v = ms.covariances[lab]
    return float(np.mean(-0.5 * (np.log(2 * np.pi * v)
                                 + (x - mu) ** 2 / v).sum(-1)))


class TestBandMllr:
    def band_truth(self, rng, n_bands=1):
        W = np.zeros((D, D + 1))
        for d in range(D):
            W[d, 0] = 0.3 * rng.standard_normal()
            lo, hi = max(0, d - n_bands), min(D - 1, d + n_bands)
            W[d, lo + 1:hi + 2] = 0.2 * rng.standard_normal(hi - lo + 1)
            W[d, d + 1] += 1.0
        return W

    def test_recovers_banded_transform(self):
        ms, rng = make_model()
        W_true = self.band_truth(rng)
        x, lab = draw(ms, rng, shift_W=W_true)
        acc = AdaptationAccumulator.zeros(D, N)
        acc.accumulate(x, lab)
        W = estimate_band_mllr_transform(acc, ms, n_bands=1)
        # structure: rows are zero outside bias + band
        for d in range(D):
            for j in range(D):
                if abs(j - d) > 1:
                    assert W[d, j + 1] == 0.0
        np.testing.assert_allclose(W, W_true, atol=0.1)

    def test_improves_aligned_likelihood(self):
        ms, rng = make_model(1)
        W_true = self.band_truth(rng)
        x, lab = draw(ms, rng, shift_W=W_true)
        acc = AdaptationAccumulator.zeros(D, N)
        acc.accumulate(x, lab)
        W = estimate_band_mllr_transform(acc, ms, n_bands=1)
        adapted = apply_mllr_mean_transform(ms, W)
        assert aligned_ll(adapted, x, lab) > aligned_ll(ms, x, lab) + 0.1

    def test_full_band_equals_mllr(self):
        ms, rng = make_model(2)
        x, lab = draw(ms, rng, shift_W=self.band_truth(rng, 2))
        acc = AdaptationAccumulator.zeros(D, N)
        acc.accumulate(x, lab)
        W_full = estimate_mllr_mean_transform(acc, ms)
        W_band = estimate_band_mllr_transform(acc, ms, n_bands=D)
        np.testing.assert_allclose(W_band, W_full, atol=1e-6)

    def test_min_occupancy_gate(self):
        ms, _rng = make_model(3)
        acc = AdaptationAccumulator.zeros(D, N)
        assert estimate_band_mllr_transform(acc, ms) is None


class TestSemiTied:
    def correlated_data(self, seed=4):
        """x = B z with z diag-Gaussian around the model means: the
        true semi-tied transform is A = B^{-1} (shared full
        covariance structure across densities)."""
        ms, rng = make_model(seed)
        B = np.eye(D) + 0.3 * rng.standard_normal((D, D))
        xs, labs = [], []
        for g in range(N):
            z = ms.means[g] + np.sqrt(ms.covariances[g]) \
                * rng.standard_normal((500, D))
            xs.append(z @ B.T)
            labs.append(np.full(500, g))
        return ms, np.concatenate(xs), np.concatenate(labs), B

    def accumulate(self, x, lab):
        acc = AdaptationAccumulator.zeros(D, N)
        acc.accumulate(x, lab)
        acc.accumulate_scatter(x, lab)
        return acc

    def scatters(self, ms, acc):
        S = np.zeros((N, D, D))
        for g in range(N):
            mu = ms.means[g]  # NOT the transformed mean: model scatter
            S[g] = (acc.sum_xx[g] - np.outer(mu, acc.sum_x[g])
                    - np.outer(acc.sum_x[g], mu)
                    + acc.gamma[g] * np.outer(mu, mu))
        return S

    def test_objective_beats_identity(self):
        ms, x, lab, _B = self.correlated_data()
        acc = self.accumulate(x, lab)
        A, _vars = estimate_semi_tied_transform(acc, ms)
        # compare against the empirical scatter around the EMPIRICAL
        # means (so both A's face the same statistics)
        S = np.zeros((N, D, D))
        for g in range(N):
            mu = acc.sum_x[g] / acc.gamma[g]
            S[g] = (acc.sum_xx[g] - np.outer(mu, acc.sum_x[g])
                    - np.outer(acc.sum_x[g], mu)
                    + acc.gamma[g] * np.outer(mu, mu))
        q_est = semi_tied_objective(A, acc.gamma, S)
        q_id = semi_tied_objective(np.eye(D), acc.gamma, S)
        assert q_est > q_id + 1.0, (q_est, q_id)

    def test_more_iterations_no_worse(self):
        ms, x, lab, _B = self.correlated_data(5)
        acc = self.accumulate(x, lab)
        S = self.scatters(ms, acc)
        A1, _ = estimate_semi_tied_transform(acc, ms, iterations=1)
        A5, _ = estimate_semi_tied_transform(acc, ms, iterations=5)
        assert semi_tied_objective(A5, acc.gamma, S) >= \
            semi_tied_objective(A1, acc.gamma, S) - 1e-6

    def test_diagonalizes_shared_structure(self):
        """A must (approximately) undo the shared mixing B: the
        transformed per-density scatters become near-diagonal.  As in
        the real recipe, means are refit (ML) in observation space
        BEFORE the semi-tied pass, so the model-mean scatters equal the
        empirical ones."""
        ms, x, lab, B = self.correlated_data(6)
        acc = self.accumulate(x, lab)
        ms.means = acc.sum_x / acc.gamma[:, None]
        A, _vars = estimate_semi_tied_transform(acc, ms, iterations=15)

        def offdiag_share(S):
            total = np.abs(S).sum()
            return (total - np.abs(np.diagonal(S, axis1=-2,
                                               axis2=-1)).sum()) / total

        # empirical within-density scatters
        S = np.zeros((N, D, D))
        for g in range(N):
            mu = acc.sum_x[g] / acc.gamma[g]
            xs = x[lab == g] - mu
            S[g] = xs.T @ xs
        before = np.mean([offdiag_share(S[g]) for g in range(N)])
        after = np.mean([offdiag_share(A @ S[g] @ A.T) for g in range(N)])
        assert after < 0.5 * before, (before, after)

    def test_apply_improves_transformed_likelihood(self):
        """Adapted model in z = A x space (+ log|A| Jacobian) must beat
        the naive diagonal model in x space."""
        ms, x, lab, _B = self.correlated_data(7)
        acc = self.accumulate(x, lab)
        ms.means = acc.sum_x / acc.gamma[:, None]   # ML mean refit first
        A, new_vars = estimate_semi_tied_transform(acc, ms)
        adapted = apply_semi_tied_transform(ms, A, new_vars)
        _sign, logdet = np.linalg.slogdet(A)
        ll_st = aligned_ll(adapted, x @ A.T, lab) + logdet
        # baseline: diagonal model refit on the same alignment
        base_vars = np.maximum(
            acc.sum_x2 / acc.gamma[:, None]
            - (acc.sum_x / acc.gamma[:, None]) ** 2, 1e-6)
        base = MixtureSet(D, acc.sum_x / acc.gamma[:, None], base_vars,
                          ms.densities.copy(), list(ms.mixtures))
        ll_diag = aligned_ll(base, x, lab)
        assert ll_st > ll_diag + 0.05, (ll_st, ll_diag)

    def test_requires_scatter(self):
        ms, _rng = make_model(8)
        acc = AdaptationAccumulator.zeros(D, N)
        acc.accumulate(np.zeros((10, D)), np.zeros(10, np.int64))
        with pytest.raises(ValueError):
            estimate_semi_tied_transform(acc, ms, min_occupancy=1)
