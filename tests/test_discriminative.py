"""EBW/MMI discriminative GMM update tests: numerator-favored data moves
means toward the numerator statistics and away from denominator mass, and
the update improves the MMI criterion on a separable toy problem."""

import numpy as np
import pytest

from rasr_tpu.mm import GmmScorer, MixtureSet, MixtureAccumulator
from rasr_tpu.mm.discriminative import ebw_update


def accs_for(dim, n, weights, xs):
    acc = MixtureAccumulator.zeros(dim, list(range(n)))
    acc.mixture_of = np.arange(n, dtype=np.int32)
    for g, (w, x) in enumerate(zip(weights, xs)):
        acc.weight[g] = w
        acc.sum_x[g] = w * x
        acc.sum_x2[g] = w * (x ** 2 + 0.5)  # some spread
    return acc


class TestEbw:
    def test_means_move_toward_numerator(self):
        dim, n = 2, 2
        means = np.zeros((n, dim))
        ms = MixtureSet.single_gaussian(means, np.ones((n, dim)))
        num = accs_for(dim, n, [100.0, 100.0],
                       [np.array([2.0, 0.0]), np.array([0.0, -1.0])])
        den = accs_for(dim, n, [50.0, 50.0],
                       [np.array([-1.0, 0.0]), np.array([0.0, 1.0])])
        new = ebw_update(num, den, ms, e_constant=2.0, d_min=50.0)
        # numerator mean for class 0 is +2 in dim 0; denominator pulls -1
        assert new.means[0, 0] > 0.5
        assert new.means[1, 1] < -0.2
        assert (new.covariances > 0).all()

    def test_i_smoothing_pulls_to_prior(self):
        dim, n = 2, 1
        prior_mean = np.array([[5.0, 5.0]])
        ms = MixtureSet.single_gaussian(prior_mean, np.ones((n, dim)))
        num = accs_for(dim, n, [10.0], [np.array([0.0, 0.0])])
        den = accs_for(dim, n, [1.0], [np.array([0.0, 0.0])])
        no_smooth = ebw_update(num, den, ms, d_min=5.0, i_smoothing_tau=0.0)
        smooth = ebw_update(num, den, ms, d_min=5.0, i_smoothing_tau=100.0)
        # heavy I-smoothing keeps means near the prior
        assert np.abs(smooth.means - 5.0).mean() \
            < np.abs(no_smooth.means - 5.0).mean()
        assert np.abs(smooth.means - 5.0).mean() < 1.5

    def test_mmi_criterion_improves(self):
        """On separable data, one EBW step increases num-LL - den-LL."""
        rng = np.random.default_rng(0)
        dim, n = 3, 2
        # poor initial model: both classes at the origin
        ms = MixtureSet.single_gaussian(np.zeros((n, dim)),
                                        np.ones((n, dim)))
        x0 = 1.5 + 0.3 * rng.standard_normal((300, dim))
        x1 = -1.5 + 0.3 * rng.standard_normal((300, dim))

        def make_acc(data_per_class):
            acc = MixtureAccumulator.zeros(dim, list(range(n)))
            for g, x in enumerate(data_per_class):
                acc.weight[g] = len(x)
                acc.sum_x[g] = x.sum(0)
                acc.sum_x2[g] = (x ** 2).sum(0)
            return acc

        num = make_acc([x0, x1])          # correct assignment
        den = make_acc([0.5 * np.concatenate([x0, x1])[:300],
                        0.5 * np.concatenate([x0, x1])[300:]])  # confused

        def mmi(m):
            s = GmmScorer(m)
            ll0 = -np.asarray(s.score(x0.astype(np.float32)))[:, 0].mean()
            ll1 = -np.asarray(s.score(x1.astype(np.float32)))[:, 1].mean()
            den0 = -np.asarray(s.score(x0.astype(np.float32)))[:, 1].mean()
            den1 = -np.asarray(s.score(x1.astype(np.float32)))[:, 0].mean()
            return (ll0 + ll1) - 0.5 * (den0 + den1)

        new = ebw_update(num, den, ms, d_min=100.0)
        assert mmi(new) > mmi(ms)
