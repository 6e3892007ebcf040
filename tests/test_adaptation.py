"""MLLR / CMLLR adaptation tests: a known affine shift between training
and test conditions is recovered by the estimated transforms."""

import numpy as np
import pytest

from rasr_tpu.mm import GmmScorer, MixtureSet
from rasr_tpu.mm.adaptation import (AdaptationAccumulator,
                                    apply_feature_transform,
                                    apply_mllr_mean_transform,
                                    estimate_cmllr_transform,
                                    estimate_mllr_mean_transform)


@pytest.fixture
def setup():
    rng = np.random.default_rng(0)
    dim, n_class = 4, 6
    means = rng.standard_normal((n_class, dim)) * 3.0
    ms = MixtureSet.single_gaussian(means, np.ones((n_class, dim)))
    # speaker condition: affine distortion of the acoustic space
    A_true = np.eye(dim) + 0.1 * rng.standard_normal((dim, dim))
    b_true = rng.standard_normal(dim)
    # observed features: distorted class samples, labels = class ids
    feats, labels = [], []
    for c in range(n_class):
        x = means[c] + 0.3 * rng.standard_normal((400, dim))
        feats.append(x @ A_true.T + b_true)
        labels.append(np.full(400, c))
    return ms, np.concatenate(feats), np.concatenate(labels), means


class TestMllr:
    def test_mean_transform_improves_likelihood(self, setup):
        ms, feats, labels, means = setup
        acc = AdaptationAccumulator.zeros(ms.dim, ms.n_densities)
        acc.accumulate(feats, labels)
        W = estimate_mllr_mean_transform(acc, ms)
        assert W is not None and W.shape == (ms.dim, ms.dim + 1)
        adapted = apply_mllr_mean_transform(ms, W)
        base = np.asarray(GmmScorer(ms).score(feats.astype(np.float32)))
        ad = np.asarray(GmmScorer(adapted).score(feats.astype(np.float32)))
        # aligned-class scores must improve substantially
        base_ll = base[np.arange(len(labels)), labels].mean()
        ad_ll = ad[np.arange(len(labels)), labels].mean()
        assert ad_ll < base_ll - 0.5

    def test_adapted_means_match_condition(self, setup):
        ms, feats, labels, means = setup
        acc = AdaptationAccumulator.zeros(ms.dim, ms.n_densities)
        acc.accumulate(feats, labels)
        W = estimate_mllr_mean_transform(acc, ms)
        adapted = apply_mllr_mean_transform(ms, W)
        # adapted means ~ empirical class means of the distorted data
        for c in range(ms.n_mixtures):
            emp = feats[labels == c].mean(0)
            np.testing.assert_allclose(adapted.means[c], emp, atol=0.2)


class TestCmllr:
    def test_feature_transform_improves_likelihood(self, setup):
        ms, feats, labels, means = setup
        acc = AdaptationAccumulator.zeros(ms.dim, ms.n_densities)
        acc.accumulate(feats, labels)
        W = estimate_cmllr_transform(acc, ms, iterations=10)
        assert W is not None
        transformed = apply_feature_transform(feats, W)
        base = np.asarray(GmmScorer(ms).score(feats.astype(np.float32)))
        tr = np.asarray(GmmScorer(ms).score(transformed.astype(np.float32)))
        base_ll = base[np.arange(len(labels)), labels].mean()
        tr_ll = tr[np.arange(len(labels)), labels].mean()
        assert tr_ll < base_ll - 0.5
