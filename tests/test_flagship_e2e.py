"""End-to-end decode with the SHIPPED flagship model through the
config-driven surface: scorer factory -> SearchAlgorithm (v2
lexiconfree-timesync) -> trained checkpoint from assets/flagship.
Covers the same path as examples/flagship_decode.config."""

import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET = os.path.join(REPO, "assets", "flagship", "flagship_f16.msgpack")


@pytest.mark.slow
@pytest.mark.skipif(not os.path.exists(ASSET),
                    reason="flagship checkpoint not present")
def test_flagship_config_decode_matches_reference():
    import jax.numpy as jnp

    from rasr_tpu.api import SearchAlgorithm
    from rasr_tpu.core.configuration import Configuration
    from rasr_tpu.data import SynthSpeechTask
    from scripts.train_flagship import feature_pipeline

    cfg = Configuration(name="test")
    for k, v in {
        "*.search-algorithm.type": "lexiconfree-timesync-beam-search",
        "*.search-algorithm.max-beam-size": "8",
        "*.search-algorithm.blank-label-index": "0",
        "*.label-scorer.type": "encoder-only",
        "*.model.checkpoint": ASSET,
        "*.model.vocab-size": "1024",
        "*.model.d-model": "512",
        "*.model.n-layers": "12",
        "*.model.n-heads": "8",
        "*.model.feature-dim": "80",
        "*.model.intermediate-ctc-layer": "6",
    }.items():
        cfg.set(k, v)

    algo = SearchAlgorithm(cfg)
    task = SynthSpeechTask()
    pipe, feats_of = feature_pipeline()
    audio, ns, labels, lens, orths = task.batch(
        seed=10_000_123, batch_size=2, max_seconds=8.0,
        min_words=3, max_words=5)
    N = audio.shape[1]
    T = pipe.n_frames(N)
    flens = jnp.asarray([min(pipe.n_frames(int(n)), T) for n in ns])
    feats = feats_of(jnp.asarray(audio), T, flens)
    errors = 0
    for i in range(2):
        f = np.asarray(feats[i, :int(flens[i])])
        algo.enter_segment()
        algo.put_features(f)
        algo.finish_segment()
        traceback = algo.get_current_best_traceback()
        hyp = task.units_to_orth([int(t.label) for t in traceback])
        if hyp != orths[i]:
            errors += 1
    assert errors == 0, "flagship decode should be exact on easy utterances"
