"""Mm tests: GMM scoring semantics vs an independent numpy implementation,
PMS round-trip, accumulate/combine/estimate/split, and the psum merge path
on a virtual device mesh."""

import math

import numpy as np
import pytest

from rasr_tpu.mm import (GmmScorer, Mixture, MixtureSet, MixtureSetEstimator,
                         psum_accumulator)


def make_mixture_set(rng, dim=8, n_mix=5, densities_per_mix=3):
    n_dens = n_mix * densities_per_mix
    means = rng.standard_normal((n_dens, dim)) * 2.0
    variances = rng.uniform(0.3, 2.0, size=(n_dens, dim))
    density_table = np.stack([np.arange(n_dens), np.arange(n_dens)], 1).astype(np.int32)
    mixtures = []
    for mi in range(n_mix):
        idxs = list(range(mi * densities_per_mix, (mi + 1) * densities_per_mix))
        w = rng.uniform(0.2, 1.0, size=densities_per_mix)
        w /= w.sum()
        mixtures.append(Mixture(idxs, list(np.log(w))))
    return MixtureSet(dim, means, variances, density_table, mixtures)


def reference_score(ms, x, mode="max"):
    """Independent implementation of the reference scorer math
    (GaussDiagonalMaximumFeatureScorer::calculateScoreAndDensity):
    0.5 * min_d [ -2 log w + D log 2pi + sum log var + sum ((x-mu)^2/var) ]."""
    scores = np.zeros(len(ms.mixtures))
    for mi, mix in enumerate(ms.mixtures):
        per_density = []
        for di, lw in zip(mix.density_indices, mix.log_weights):
            mean = ms.means[ms.densities[di, 0]]
            var = ms.covariances[ms.densities[di, 1]]
            d2 = (-2.0 * lw + ms.dim * math.log(2 * math.pi)
                  + np.sum(np.log(var)) + np.sum((x - mean) ** 2 / var))
            per_density.append(d2)
        if mode == "max":
            scores[mi] = 0.5 * min(per_density)
        else:
            scores[mi] = -np.logaddexp.reduce([-0.5 * d for d in per_density])
    return scores


class TestGmmScorer:
    def test_max_mode_matches_reference_math(self):
        rng = np.random.default_rng(5)
        ms = make_mixture_set(rng)
        scorer = GmmScorer(ms, mode="max")
        feats = rng.standard_normal((7, ms.dim)).astype(np.float32)
        got = np.asarray(scorer.score(feats))
        assert got.shape == (7, ms.n_mixtures)
        for t in range(7):
            np.testing.assert_allclose(got[t], reference_score(ms, feats[t]),
                                       rtol=1e-4, atol=1e-3)

    def test_sum_mode(self):
        rng = np.random.default_rng(6)
        ms = make_mixture_set(rng)
        scorer = GmmScorer(ms, mode="sum")
        feats = rng.standard_normal((3, ms.dim)).astype(np.float32)
        got = np.asarray(scorer.score(feats))
        for t in range(3):
            np.testing.assert_allclose(
                got[t], reference_score(ms, feats[t], mode="sum"),
                rtol=1e-4, atol=1e-3)

    def test_batched(self):
        rng = np.random.default_rng(7)
        ms = make_mixture_set(rng)
        scorer = GmmScorer(ms)
        feats = rng.standard_normal((2, 5, ms.dim)).astype(np.float32)
        got = np.asarray(scorer.score(feats))
        single = np.asarray(scorer.score(feats[0]))
        assert got.shape == (2, 5, ms.n_mixtures)
        np.testing.assert_allclose(got[0], single, atol=1e-5)


class TestPmsFormat:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(8)
        ms = make_mixture_set(rng, dim=4, n_mix=3, densities_per_mix=2)
        p = str(tmp_path / "model.pms")
        ms.write_pms(p)
        back = MixtureSet.read_pms(p)
        assert back.dim == ms.dim
        assert back.n_mixtures == ms.n_mixtures
        np.testing.assert_allclose(back.means, ms.means, rtol=1e-12)
        np.testing.assert_allclose(back.covariances, ms.covariances, rtol=1e-12)
        np.testing.assert_allclose(back.mixtures[1].log_weights,
                                   ms.mixtures[1].log_weights, rtol=1e-12)

    def test_gzip(self, tmp_path):
        rng = np.random.default_rng(9)
        ms = make_mixture_set(rng, dim=2, n_mix=2, densities_per_mix=1)
        p = str(tmp_path / "model.pms.gz")
        ms.write_pms(p)
        back = MixtureSet.read_pms(p)
        np.testing.assert_allclose(back.means, ms.means)


class TestEstimator:
    def test_single_gaussian_recovery(self):
        """Accumulating samples drawn per class recovers class means."""
        rng = np.random.default_rng(10)
        dim, n_mix = 4, 3
        true_means = rng.standard_normal((n_mix, dim)) * 3
        est = MixtureSetEstimator(dim, mixture_of=list(range(n_mix)))
        for mi in range(n_mix):
            x = true_means[mi] + 0.5 * rng.standard_normal((500, dim))
            est.accumulate_segment(x.astype(np.float32),
                                   np.full(500, mi, dtype=np.int32))
        ms = est.estimate()
        np.testing.assert_allclose(ms.means, true_means, atol=0.15)
        np.testing.assert_allclose(ms.covariances, 0.25, atol=0.1)

    def test_combine_equals_joint(self, tmp_path):
        """Two partitions accumulated separately then combined == one job
        (the reference combine-mixture-set-estimators semantics)."""
        rng = np.random.default_rng(11)
        dim = 3
        x = rng.standard_normal((100, dim)).astype(np.float32)
        labels = rng.integers(0, 2, size=100).astype(np.int32)

        joint = MixtureSetEstimator(dim, [0, 1])
        joint.accumulate_segment(x, labels)

        a = MixtureSetEstimator(dim, [0, 1])
        a.accumulate_segment(x[:50], labels[:50])
        b = MixtureSetEstimator(dim, [0, 1])
        b.accumulate_segment(x[50:], labels[50:])
        p = str(tmp_path / "b.acc")
        b.acc.write(p)
        a.combine_file(p)

        np.testing.assert_allclose(a.acc.weight, joint.acc.weight, rtol=1e-6)
        np.testing.assert_allclose(a.acc.sum_x, joint.acc.sum_x, rtol=1e-5)
        np.testing.assert_allclose(a.acc.sum_x2, joint.acc.sum_x2, rtol=1e-5)

    def test_padding_ignored(self):
        est = MixtureSetEstimator(2, [0])
        x = np.ones((4, 2), dtype=np.float32)
        est.accumulate_segment(x, np.array([0, 0, -1, -1], dtype=np.int32))
        assert est.acc.weight[0] == 2.0

    def test_split_doubles_densities(self):
        rng = np.random.default_rng(12)
        est = MixtureSetEstimator(2, [0, 0, 1])
        est.accumulate_segment(rng.standard_normal((50, 2)).astype(np.float32),
                               rng.integers(0, 3, 50).astype(np.int32))
        est2 = est.split()
        assert est2.acc.n_densities == 6
        # total mass preserved
        np.testing.assert_allclose(est2.acc.weight.sum(),
                                   est.acc.weight.sum(), rtol=1e-9)
        ms = est2.estimate(pooled_variance=False)
        assert ms.n_mixtures == 2
        assert ms.mixtures[0].n_densities == 4

    def test_psum_merge_on_mesh(self):
        """The in-mesh collective replacement for accumulator-file merges."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh, PartitionSpec as P
        from jax import shard_map

        devices = np.array(jax.devices()[:4])
        mesh = Mesh(devices, ("data",))
        w = jnp.arange(4 * 2, dtype=jnp.float32).reshape(4, 2)
        sx = jnp.ones((4, 2, 3), dtype=jnp.float32)
        sx2 = 2 * jnp.ones((4, 2, 3), dtype=jnp.float32)

        def merged(w, sx, sx2):
            return psum_accumulator(w, sx, sx2, axis_name="data")

        fn = shard_map(merged, mesh=mesh,
                       in_specs=(P("data"), P("data"), P("data")),
                       out_specs=P())
        mw, msx, msx2 = fn(w, sx, sx2)
        # each device holds a (1, 2) shard; psum sums over the 4 devices
        np.testing.assert_allclose(np.asarray(mw)[0], np.asarray(w).sum(0))
        np.testing.assert_allclose(np.asarray(msx)[0], 4 * np.ones((2, 3)))
        np.testing.assert_allclose(np.asarray(msx2)[0], 8 * np.ones((2, 3)))


class TestLegacyAccumulatorIO:
    def make_legacy(self):
        from rasr_tpu.mm.legacy_io import LegacyAccumulatorFile
        rng = np.random.default_rng(11)
        dim, n_dens = 3, 4
        mean_sums = rng.standard_normal((n_dens, dim)) * 10
        mean_w = rng.uniform(5, 20, n_dens)
        covar_sums = rng.uniform(1, 50, (2, dim))   # two shared covariances
        covar_w = np.asarray([mean_w[0] + mean_w[1], mean_w[2] + mean_w[3]])
        densities = np.asarray([[0, 0], [1, 0], [2, 1], [3, 1]], np.uint32)
        mixtures = [[(0, float(mean_w[0])), (1, float(mean_w[1]))],
                    [(2, float(mean_w[2])), (3, float(mean_w[3]))]]
        return LegacyAccumulatorFile(dim, mean_sums, mean_w, covar_sums,
                                     covar_w, densities, mixtures)

    def test_roundtrip(self, tmp_path):
        from rasr_tpu.mm.legacy_io import (read_legacy_accumulator,
                                           write_legacy_accumulator)
        acc = self.make_legacy()
        p = tmp_path / "acc.mix"
        write_legacy_accumulator(acc, str(p))
        data = p.read_bytes()
        assert data[:6] == b"MIXSET"
        back = read_legacy_accumulator(str(p))
        assert back.dim == acc.dim
        np.testing.assert_allclose(back.mean_sums, acc.mean_sums)
        np.testing.assert_allclose(back.covar_weights, acc.covar_weights)
        np.testing.assert_array_equal(back.densities, acc.densities)
        assert back.mixtures == acc.mixtures

    def test_convert_to_native(self):
        from rasr_tpu.mm.legacy_io import to_mixture_accumulator
        legacy = self.make_legacy()
        acc = to_mixture_accumulator(legacy)
        assert acc.n_densities == 4
        np.testing.assert_array_equal(acc.mixture_of, [0, 0, 1, 1])
        np.testing.assert_allclose(acc.weight, legacy.mean_weights)
        np.testing.assert_allclose(acc.sum_x, legacy.mean_sums)
        # shared covariance mass split proportionally, totals preserved
        np.testing.assert_allclose(acc.sum_x2[0] + acc.sum_x2[1],
                                   legacy.covar_sums[0])
        np.testing.assert_allclose(acc.sum_x2[2] + acc.sum_x2[3],
                                   legacy.covar_sums[1])

    def test_bad_magic_rejected(self, tmp_path):
        from rasr_tpu.mm.legacy_io import read_legacy_accumulator
        p = tmp_path / "bad.mix"
        p.write_bytes(b"NOTMIX\x00\x00" + b"\x00" * 32)
        with pytest.raises(ValueError):
            read_legacy_accumulator(str(p))


def test_int8_quantized_scores_close_to_f32():
    """int8 MXU path (GmmScorer(quantize='int8')): per-channel symmetric
    quantization keeps scores within ~2% relative of f32, and the argmin
    mixture (what alignment and decoding consume) almost always agrees."""
    rng = np.random.default_rng(11)
    ms = make_mixture_set(rng, dim=12, n_mix=16, densities_per_mix=4)
    f32 = GmmScorer(ms, mode="max")
    q8 = GmmScorer(ms, mode="max", quantize="int8")
    feats = rng.standard_normal((40, 12)).astype(np.float32)
    s_f = np.asarray(f32.score(feats))
    s_q = np.asarray(q8.score(feats))
    rel = np.abs(s_q - s_f) / np.maximum(np.abs(s_f), 1.0)
    assert rel.max() < 0.03, rel.max()
    agree = (s_f.argmin(-1) == s_q.argmin(-1)).mean()
    assert agree > 0.95, agree


def test_int8_sum_mode_also_close():
    rng = np.random.default_rng(12)
    ms = make_mixture_set(rng, dim=8, n_mix=6, densities_per_mix=2)
    s_f = np.asarray(GmmScorer(ms, mode="sum").score(
        rng.standard_normal((10, 8)).astype(np.float32)))
    rng = np.random.default_rng(12)
    ms = make_mixture_set(rng, dim=8, n_mix=6, densities_per_mix=2)
    s_q = np.asarray(GmmScorer(ms, mode="sum", quantize="int8").score(
        rng.standard_normal((10, 8)).astype(np.float32)))
    rel = np.abs(s_q - s_f) / np.maximum(np.abs(s_f), 1.0)
    assert rel.max() < 0.02
