"""Device-side AED label-sync beam (search/aed_device.py).

The device beam must reproduce the host CachedAedDecoder exactly: same
candidate generation (top-beam tokens per live hypothesis + stays for
finished ones), same length-normalized ranking, same EOS handling — the
only difference is that the whole loop runs in one device program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.models.aed import AedModel
from rasr_tpu.search.aed_cached import CachedAedDecoder
from rasr_tpu.search.aed_device import make_aed_beam

VOCAB, D = 8, 10


@pytest.fixture(scope="module")
def toy():
    model = AedModel(vocab_size=VOCAB, d_model=16, encoder_layers=1,
                     decoder_layers=1, n_heads=2, dropout=0.0,
                     dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, D)),
                        jnp.asarray([16]),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


class TestDeviceVsHost:
    def test_same_results(self, toy):
        model, params = toy
        for seed in range(3):
            feats = np.asarray(jax.random.normal(
                jax.random.PRNGKey(seed), (24, D)))
            dev = CachedAedDecoder(model, params, beam_size=4,
                                   max_labels=12, device_beam=True)
            host = CachedAedDecoder(model, params, beam_size=4,
                                    max_labels=12, device_beam=False)
            got = dev.decode(feats, 24, feat_bucket=24)
            want = host.decode(feats, 24, feat_bucket=24)
            assert got[0].labels == want[0].labels, f"seed {seed}"
            assert got[0].score == pytest.approx(want[0].score,
                                                 abs=1e-2), f"seed {seed}"

    def test_nbest_sorted_and_finite(self, toy):
        model, params = toy
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(9),
                                             (24, D)))
        dec = CachedAedDecoder(model, params, beam_size=4, max_labels=12)
        res = dec.decode(feats, 24, feat_bucket=24)
        assert 1 <= len(res) <= 4
        norm = [r.score / max(len(r.labels), 1) for r in res]
        assert norm == sorted(norm)

    def test_segment_api(self, toy):
        model, params = toy
        dec = CachedAedDecoder(model, params, beam_size=4, max_labels=12)
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                             (24, D)))
        dec.enter_segment()
        dec.put_features(feats)
        dec.finish_segment()
        direct = dec.decode(feats, feats.shape[0])
        assert dec.get_current_best_labels() == direct[0].labels
        assert dec.n_best(2)[0].labels == direct[0].labels


class TestBatchedDeviceBeam:
    def test_batch_matches_single(self, toy):
        """Batched decoding must equal per-utterance decoding (padding
        rows of other utterances cannot leak)."""
        model, params = toy
        search = make_aed_beam(model, beam=4, max_labels=12)
        encode = jax.jit(lambda p, f, l: model.apply(
            {"params": p}, f, l, method=model.encode))
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(4),
                                             (3, 24, D)))
        lens = jnp.asarray([24, 16, 20], jnp.int32)
        enc, mask = encode(params, jnp.asarray(feats), lens)
        lab_b, n_b, sc_b = jax.tree_util.tree_map(
            np.asarray, search(params, enc, mask))
        for i in range(3):
            enc1, mask1 = encode(params, jnp.asarray(feats[i:i + 1]),
                                 lens[i:i + 1])
            lab1, n1, sc1 = jax.tree_util.tree_map(
                np.asarray, search(params, enc1, mask1))
            assert n1[0, 0] == n_b[i, 0], f"utt {i}"
            np.testing.assert_array_equal(
                lab1[0, 0, :n1[0, 0]], lab_b[i, 0, :n_b[i, 0]])
            assert sc1[0, 0] == pytest.approx(sc_b[i, 0], abs=1e-2)
