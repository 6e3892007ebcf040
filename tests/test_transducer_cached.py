"""Per-hypothesis state compression in the cached transducer decoder
(reference src/Nn/CompressedVector.hh:52,
src/Lm/RecurrentLanguageModel.hh:292-293 state-compression)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.models.transducer import TransducerModel
from rasr_tpu.search.transducer_cached import CachedTransducerDecoder

FEAT = 12
VOCAB = 9


@pytest.fixture(scope="module")
def toy():
    model = TransducerModel(vocab_size=VOCAB, d_model=16,
                            encoder_layers=1, pred_hidden=24,
                            joint_dim=16, n_heads=2, dtype=jnp.float32)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, FEAT)),
        jnp.asarray([16]), jnp.zeros((1, 4), jnp.int32),
        jnp.asarray([4]))["params"]
    return model, params


class TestStateCompression:
    def test_int8_cache_matches_and_shrinks(self, toy):
        """Opt-in int8 per-hypothesis state storage: same decode at the
        same beam within tolerance, cache ~4x smaller."""
        model, params = toy
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(5),
                                             (30, FEAT)))
        raw = CachedTransducerDecoder(model, params, beam_size=16,
                                      device_beam=False)
        comp = CachedTransducerDecoder(model, params, beam_size=16,
                                       device_beam=False,
                                       state_compression="int8")
        enc, _ = raw._encode(jnp.asarray(feats[None]),
                             jnp.asarray([30], jnp.int32))
        enc = np.asarray(enc)[0]
        n_enc = enc.shape[0]      # encoder subsamples the 30 frames
        a = raw.decode(enc, n_enc)
        b = comp.decode(enc, n_enc)
        assert a[0].labels == b[0].labels
        assert abs(a[0].score - b[0].score) < 0.35
        assert raw.cache_bytes() == 0     # decode() cleans its cache
        # repopulate both caches identically and compare sizes
        raw._seed_cache()
        comp._seed_cache()
        from rasr_tpu.search.transducer_beam import TransducerHypothesis
        for h in a[:8]:
            for k in range(len(h.labels) + 1):
                hyp = TransducerHypothesis(labels=tuple(h.labels[:k]),
                                           score=0.0)
                raw._pred_batch([hyp])
                comp._pred_batch([hyp])
        assert comp.cache_bytes() < 0.35 * raw.cache_bytes(), (
            comp.cache_bytes(), raw.cache_bytes())

    def test_bad_mode_rejected(self, toy):
        model, params = toy
        with pytest.raises(ValueError):
            CachedTransducerDecoder(model, params,
                                    state_compression="fp4")
