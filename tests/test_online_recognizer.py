"""Streaming OnlineRecognizer: chunked feeding matches offline
recognition bit-for-bit; partials are stable prefixes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.nn.async_scorer import AsyncChunkedEncoderScorer
from rasr_tpu.nn.label_scorer import EncoderOnlyLabelScorer
from rasr_tpu.search.lexiconfree_timesync import LexiconfreeTimesyncBeamSearch
from rasr_tpu.signal.dsp import MfccPipeline
from rasr_tpu.speech.online_recognizer import OnlineRecognizer

SR = 8000
V = 5


@pytest.fixture(scope="module")
def setup():
    """Synthetic task: tones at distinct frequencies map to labels via a
    fixed linear readout of the MFCCs."""
    pipe = MfccPipeline(sample_rate=SR, n_cepstra=8)
    rng = np.random.default_rng(0)
    W = rng.standard_normal((8, V)).astype(np.float32) * 2.0

    def encode(feats):
        logits = jnp.asarray(feats) @ jnp.asarray(W)
        return np.asarray(jax.nn.log_softmax(logits, -1))

    # one second of audio: three tone segments
    t = np.arange(SR) / SR
    audio = np.concatenate([
        np.sin(2 * np.pi * 400 * t[:3000]),
        np.sin(2 * np.pi * 1200 * t[:2500]),
        np.sin(2 * np.pi * 2800 * t[:2500]),
    ]).astype(np.float32) * 0.5
    return pipe, encode, audio


def offline_labels(pipe, encode, audio, **search_kw):
    feats = np.asarray(pipe(jnp.asarray(audio)))
    scorer = EncoderOnlyLabelScorer(encode, n_labels=V)
    search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=4,
                                           blank_index=-1, **search_kw)
    search.enter_segment()
    search.put_features(feats)
    search.finish_segment()
    return search.get_current_best_labels()


class TestOnlineRecognizer:
    def test_streaming_matches_offline(self, setup):
        pipe, encode, audio = setup
        want = offline_labels(pipe, encode, audio)

        scorer = AsyncChunkedEncoderScorer(encode, n_labels=V,
                                           chunk_frames=16, chunk_history=0)
        search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=4,
                                               blank_index=-1)
        online = OnlineRecognizer(pipe, search)
        # arbitrary chunk sizes incl. tiny ones
        pos, sizes = 0, [700, 123, 2048, 64, 3000, 1000, 1065]
        for sz in sizes:
            online.feed_samples(audio[pos:pos + sz])
            pos += sz
        assert pos == len(audio)
        got = online.finish()
        assert got == want

    def test_incremental_features_exact(self, setup):
        pipe, encode, audio = setup
        scorer = AsyncChunkedEncoderScorer(encode, n_labels=V,
                                           chunk_frames=16, chunk_history=0)
        search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=4,
                                               blank_index=-1)
        online = OnlineRecognizer(pipe, search,
                                  decode_while_streaming=False)
        for i in range(0, len(audio), 900):
            online.feed_samples(audio[i:i + 900])
        # flush the tail, then compare the scorer's feature stream
        total = pipe.n_frames(len(audio))
        feats_off = np.asarray(pipe(jnp.asarray(audio)))
        online.finish()
        feats_on = np.stack(scorer._features)
        assert feats_on.shape == feats_off.shape
        np.testing.assert_allclose(feats_on, feats_off, atol=2e-4)

    def test_partials_are_prefixes(self, setup):
        pipe, encode, audio = setup
        scorer = AsyncChunkedEncoderScorer(encode, n_labels=V,
                                           chunk_frames=8, chunk_history=0)
        search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=4,
                                               blank_index=-1)
        online = OnlineRecognizer(pipe, search)
        partials = []
        for i in range(0, len(audio), 1600):
            online.feed_samples(audio[i:i + 1600])
            partials.append(online.partial())
        final = online.finish()
        for p in partials:
            assert list(final[:len(p)]) == list(p)
