"""Rprop optimizer (vs a direct port of the reference branch logic) and
multi-stream CombinedScorer."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.mm import CombinedScorer, GmmScorer, MixtureSet
from rasr_tpu.nn.optim import rprop


def oracle_rprop(grads_seq, x0, init_step, inc=1.2, dec=0.5,
                 max_step=1e6, min_step=0.0, backtracking=False):
    """Scalar-wise port of Mm::RpropOptimization::apply (descent)."""
    x = float(x0)
    step = init_step
    hold = False
    prev_delta = 0.0
    xs = []
    for g in grads_seq:
        cur_dir = -np.sign(g)
        if hold:
            delta = cur_dir * step
            hold = False
        elif prev_delta * cur_dir >= 0:
            step = min(step * inc, max_step)
            delta = cur_dir * step
        else:
            step = max(step * dec, min_step)
            hold = True
            delta = -prev_delta if backtracking else 0.0
        x += delta
        prev_delta = delta
        xs.append(x)
    return xs


class TestRprop:
    @pytest.mark.parametrize("backtracking", [False, True])
    def test_matches_oracle_on_random_gradients(self, backtracking):
        rng = np.random.default_rng(5)
        grads = rng.standard_normal(30)
        opt = rprop(init_step=0.1, backtracking=backtracking)
        x = jnp.asarray([2.0])
        state = opt.init(x)
        got = []
        for g in grads:
            upd, state = opt.update(jnp.asarray([g]), state)
            x = optax.apply_updates(x, upd)
            got.append(float(x[0]))
        want = oracle_rprop(grads, 2.0, 0.1, backtracking=backtracking)
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_minimizes_quadratic(self):
        opt = rprop(init_step=0.5)
        x = jnp.asarray([10.0, -7.0, 3.0])
        state = opt.init(x)

        @jax.jit
        def step(x, state):
            g = jax.grad(lambda z: jnp.sum((z - 1.0) ** 2))(x)
            upd, state = opt.update(g, state)
            return optax.apply_updates(x, upd), state

        for _ in range(80):
            x, state = step(x, state)
        np.testing.assert_allclose(np.asarray(x), np.ones(3), atol=1e-2)

    def test_step_adapts(self):
        opt = rprop(init_step=0.1, max_step=1.0)
        x = jnp.asarray([0.0])
        state = opt.init(x)
        # constant gradient sign: step should grow by 1.2 per iter
        for _ in range(3):
            upd, state = opt.update(jnp.asarray([1.0]), state)
        np.testing.assert_allclose(np.asarray(state.signed_step),
                                   [0.1 * 1.2 ** 3], rtol=1e-6)
        # flip: step halves and is marked hold (negative)
        upd, state = opt.update(jnp.asarray([-1.0]), state)
        assert float(state.signed_step[0]) < 0
        np.testing.assert_allclose(-np.asarray(state.signed_step),
                                   [0.1 * 1.2 ** 3 * 0.5], rtol=1e-6)
        assert float(upd[0]) == 0.0  # held


def tiny_mixture_set(dim, n_mix, seed):
    from rasr_tpu.mm import Mixture
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((n_mix, dim)) * 2.0
    variances = rng.uniform(0.3, 2.0, size=(n_mix, dim))
    table = np.stack([np.arange(n_mix), np.arange(n_mix)], 1).astype(np.int32)
    mixtures = [Mixture([i], [0.0]) for i in range(n_mix)]
    return MixtureSet(dim, means, variances, table, mixtures)


class TestCombinedScorer:
    def test_sums_scaled_streams(self):
        ms1 = tiny_mixture_set(3, 4, 0)
        ms2 = tiny_mixture_set(2, 3, 1)
        s1, s2 = GmmScorer(ms1), GmmScorer(ms2)
        # combined emissions: (e % 4, e % 3) for 6 emissions
        table = np.asarray([[e % 4, e % 3] for e in range(6)])
        comb = CombinedScorer([s1, s2], table, scales=[1.0, 0.5])
        x1 = np.random.default_rng(2).standard_normal((5, 3)).astype(np.float32)
        x2 = np.random.default_rng(3).standard_normal((5, 2)).astype(np.float32)
        got = np.asarray(comb.score([x1, x2]))
        assert got.shape == (5, 6)
        m1 = np.asarray(s1.score(x1))
        m2 = np.asarray(s2.score(x2))
        for e in range(6):
            np.testing.assert_allclose(
                got[:, e], m1[:, e % 4] + 0.5 * m2[:, e % 3], rtol=1e-6)

    def test_validates_table(self):
        ms1 = tiny_mixture_set(3, 2, 0)
        with pytest.raises(ValueError):
            CombinedScorer([GmmScorer(ms1)], np.asarray([[5]]))


class TestRegressionTree:
    def make_setup(self):
        from rasr_tpu.mm import Mixture
        rng = np.random.default_rng(7)
        dim, n_mix = 2, 6
        # two groups of mixtures with distinct mean regions
        means = np.concatenate([
            rng.standard_normal((3, dim)) + 5.0,
            rng.standard_normal((3, dim)) - 5.0])
        variances = np.ones((n_mix, dim))
        table = np.stack([np.arange(n_mix), np.arange(n_mix)], 1).astype(np.int32)
        mixtures = [Mixture([i], [0.0]) for i in range(n_mix)]
        return MixtureSet(2, means, variances, table, mixtures)

    def test_tree_partitions_mixtures(self):
        from rasr_tpu.mm.adaptation import AdaptationTree
        ms = self.make_setup()
        tree = AdaptationTree(ms, n_base_classes=2)
        leaves = tree.leaves()
        assert len(leaves) == 2
        # the two mean groups land in different leaves
        l0 = {int(tree.leaf_of_mixture[m]) for m in range(3)}
        l1 = {int(tree.leaf_of_mixture[m]) for m in range(3, 6)}
        assert l0 != l1 and len(l0) == 1 and len(l1) == 1

    def test_silence_separated(self):
        from rasr_tpu.mm.adaptation import AdaptationTree
        ms = self.make_setup()
        tree = AdaptationTree(ms, n_base_classes=2, silence_mixtures=(0,))
        sil_leaf = int(tree.leaf_of_mixture[0])
        assert all(int(tree.leaf_of_mixture[m]) != sil_leaf
                   for m in range(1, 6))

    def test_per_class_transforms_recovered(self):
        from rasr_tpu.mm.adaptation import AdaptationTree, TreeMllrEstimator
        ms = self.make_setup()
        tree = AdaptationTree(ms, n_base_classes=2)
        est = TreeMllrEstimator(tree, ms, min_observations=10.0)
        rng = np.random.default_rng(8)
        # group 0 shifted +2, group 1 shifted -3: enough frames per leaf
        feats, dens, mixp = [], [], []
        for m in range(6):
            shift = 2.0 if m < 3 else -3.0
            x = ms.means[m] + shift + 0.01 * rng.standard_normal((200, 2))
            feats.append(x)
            dens.append(np.full(200, m))
            mixp.append(np.full(200, m))
        est.accumulate(np.concatenate(feats), np.concatenate(dens),
                       np.concatenate(mixp))
        transforms = est.estimate()
        assert transforms  # at least the root
        adapted = est.apply(transforms)
        # adapted means close to the shifted data means
        for m in range(6):
            shift = 2.0 if m < 3 else -3.0
            np.testing.assert_allclose(adapted.means[m], ms.means[m] + shift,
                                       atol=0.1)

    def test_insufficient_data_falls_back_to_ancestor(self):
        from rasr_tpu.mm.adaptation import AdaptationTree, TreeMllrEstimator
        ms = self.make_setup()
        tree = AdaptationTree(ms, n_base_classes=2)
        est = TreeMllrEstimator(tree, ms, min_observations=150.0)
        rng = np.random.default_rng(9)
        # only 100 frames per leaf: leaves below threshold, root (200) above
        feats, dens, mixp = [], [], []
        for m in (0, 3):
            x = ms.means[m] + 1.0 + 0.01 * rng.standard_normal((100, 2))
            feats.append(x); dens.append(np.full(100, m))
            mixp.append(np.full(100, m))
        est.accumulate(np.concatenate(feats), np.concatenate(dens),
                       np.concatenate(mixp))
        transforms = est.estimate()
        assert 0 in transforms            # root estimated
        assert len(transforms) == 1       # leaves skipped
