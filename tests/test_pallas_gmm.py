"""Pallas fused GMM kernel: interpret-mode correctness vs the XLA scorer
(the real-TPU path is exercised by bench/driver runs; on TPU v5e the kernel
measured ~10x faster than the unfused XLA path at 512x1024x16)."""

import numpy as np
import pytest

import jax
from jax.experimental import pallas as pl

from rasr_tpu.mm import GmmScorer
from rasr_tpu.ops import gmm_kernel as gk

from test_mm import make_mixture_set


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    orig = pl.pallas_call

    def patched(*a, **k):
        k.setdefault("interpret", True)
        return orig(*a, **k)

    monkeypatch.setattr(gk.pl, "pallas_call", patched)
    yield


class TestPallasGmm:
    def test_matches_xla_scorer(self):
        rng = np.random.default_rng(0)
        ms = make_mixture_set(rng, dim=16, n_mix=32, densities_per_mix=4)
        feats = rng.standard_normal((50, 16)).astype(np.float32)
        ref = np.asarray(GmmScorer(ms).score(feats))
        got = np.asarray(gk.PallasGmmScorer(ms, tile_s=128).score(feats))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)

    def test_unequal_density_counts(self):
        """Mixtures with fewer densities than the max are padded with BIG
        and never win the min."""
        from rasr_tpu.mm.mixture_set import Mixture, MixtureSet
        rng = np.random.default_rng(1)
        dim, n_dens = 8, 5
        means = rng.standard_normal((n_dens, dim))
        variances = rng.uniform(0.5, 1.5, (n_dens, dim))
        table = np.stack([np.arange(n_dens), np.arange(n_dens)], 1).astype(np.int32)
        mixtures = [Mixture([0, 1, 2], list(np.log([0.5, 0.3, 0.2]))),
                    Mixture([3], [0.0]),
                    Mixture([4], [0.0])]
        ms = MixtureSet(dim, means, variances, table, mixtures)
        feats = rng.standard_normal((20, dim)).astype(np.float32)
        ref = np.asarray(GmmScorer(ms).score(feats))
        got = np.asarray(gk.PallasGmmScorer(ms, tile_s=128).score(feats))
        np.testing.assert_allclose(got, ref, atol=1e-3, rtol=1e-5)
