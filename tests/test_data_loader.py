"""Bucketed prefetching data loader + multi-host global batch assembly
(on the virtual CPU mesh)."""

import numpy as np
import pytest

from rasr_tpu.speech.data_loader import (BucketBatcher, FeatureBatchLoader,
                                         bucket_boundaries,
                                         make_global_batch, pad_batch)


class TestBuckets:
    def test_boundaries_quantiles(self):
        b = bucket_boundaries([10, 20, 30, 40], n_buckets=2)
        assert b[-1] == 40
        assert len(b) == 2

    def test_batcher_groups_by_length(self):
        b = BucketBatcher([10, 20], batch_size=2)
        assert b.add("a", 5) is None
        assert b.add("b", 15) is None
        full = b.add("c", 8)
        assert full is not None and [k for k, _ in full] == ["a", "c"]
        rest = list(b.flush())
        assert len(rest) == 1 and rest[0][0][0] == "b"

    def test_padded_length_snaps_to_boundary(self):
        b = BucketBatcher([10, 20], batch_size=4)
        assert b.padded_length([("x", 7), ("y", 9)]) == 10
        assert b.padded_length([("x", 11)]) == 20
        assert b.padded_length([("x", 25)]) == 25  # overflow bucket


class TestLoader:
    def make(self, n=10, batch=3, seed=None):
        rng = np.random.default_rng(0)
        lengths = rng.integers(5, 40, size=n).tolist()
        data = {f"seg{i}": rng.standard_normal(
            (lengths[i], 4)).astype(np.float32) for i in range(n)}
        loader = FeatureBatchLoader(
            list(data.keys()), lengths, lambda k: data[k],
            batch_size=batch, n_buckets=3, shuffle_seed=seed)
        return loader, data, lengths

    def test_all_segments_delivered_once(self):
        loader, data, _ = self.make()
        seen = []
        for keys, feats, lens in loader:
            assert feats.shape[0] == 3  # fixed batch dim
            seen.extend(keys)
            for i, k in enumerate(keys):
                np.testing.assert_array_equal(feats[i, :lens[i]], data[k])
                assert lens[i] == len(data[k])
            # padded rows are zero with length 0
            for i in range(len(keys), feats.shape[0]):
                assert lens[i] == 0
        assert sorted(seen) == sorted(data.keys())

    def test_shapes_bucketed(self):
        loader, _, lengths = self.make(n=20, batch=4)
        t_pads = {f.shape[1] for _, f, _ in loader}
        # at most n_buckets distinct padded lengths (+ overflow)
        assert len(t_pads) <= 4
        assert max(t_pads) >= max(lengths)

    def test_shuffle_changes_order(self):
        l1, _, _ = self.make(seed=1)
        l2, _, _ = self.make(seed=2)
        k1 = [k for keys, _, _ in l1 for k in keys]
        k2 = [k for keys, _, _ in l2 for k in keys]
        assert k1 != k2 and sorted(k1) == sorted(k2)


class TestGlobalBatch:
    def test_make_global_batch_on_mesh(self):
        import jax
        from jax.sharding import Mesh
        devs = np.array(jax.devices()[:4]).reshape(4, 1)
        mesh = Mesh(devs, ("data", "model"))
        local = np.arange(4 * 6 * 2, dtype=np.float32).reshape(4, 6, 2)
        lens = np.full((4,), 6, np.int32)
        feats, glens = make_global_batch(mesh, local, lens)
        assert feats.shape == (4, 6, 2)  # single process: local == global
        np.testing.assert_array_equal(np.asarray(feats), local)
        np.testing.assert_array_equal(np.asarray(glens), lens)
