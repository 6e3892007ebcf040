"""End-to-end frame-sync decode with the SHIPPED RNN-T flagship through
the config-driven surface: [model] type=transducer -> scorer factory ->
transducer-framesync -> api.SearchAlgorithm (the stateful-scorer path
the reference builds from config, src/Nn/Module.cc:132-218).  Companion
of tests/test_flagship_e2e.py (CTC) and tests/test_aed_flagship_e2e.py
(AED)."""

import json
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ASSET_DIR = os.path.join(REPO, "assets", "transducer")
CKPT = os.path.join(ASSET_DIR, "transducer_f16.msgpack")
META = os.path.join(ASSET_DIR, "transducer.json")


@pytest.mark.slow
@pytest.mark.skipif(not (os.path.exists(CKPT) and os.path.exists(META)),
                    reason="transducer flagship checkpoint not present")
def test_transducer_flagship_config_framesync_decode():
    import jax.numpy as jnp

    from rasr_tpu.api import SearchAlgorithm
    from rasr_tpu.core.configuration import Configuration
    from rasr_tpu.data import SynthSpeechTask
    from scripts.train_flagship import feature_pipeline

    with open(META) as fh:
        meta = json.load(fh)
    mc = meta["model"]

    cfg = Configuration(name="test")
    for k, v in {
        "*.search-algorithm.type": "transducer-framesync",
        "*.search-algorithm.beam-size": "4",
        "*.search-algorithm.blank-label-index": "0",
        "*.search-algorithm.max-symbols-per-frame": "3",
        "*.model.type": "transducer",
        "*.model.checkpoint": CKPT,
        "*.model.vocab-size": str(mc["vocab_size"]),
        "*.model.d-model": str(mc["d_model"]),
        "*.model.encoder-layers": str(mc["encoder_layers"]),
        "*.model.pred-hidden": str(mc["pred_hidden"]),
        "*.model.joint-dim": str(mc["joint_dim"]),
        "*.model.n-heads": str(mc["n_heads"]),
        "*.model.feature-dim": str(meta["feat_dim"]),
    }.items():
        cfg.set(k, v)

    algo = SearchAlgorithm(cfg)
    task = SynthSpeechTask()
    pipe, feats_of = feature_pipeline()
    audio, ns, labels, lens, orths = task.batch(
        seed=10_000_321, batch_size=2, max_seconds=8.0,
        min_words=3, max_words=5)
    N = audio.shape[1]
    T = pipe.n_frames(N)
    flens = [min(pipe.n_frames(int(n)), T) for n in ns]
    feats = np.asarray(feats_of(jnp.asarray(audio), T,
                                jnp.asarray(flens, jnp.int32)))

    errs = refs = 0
    from rasr_tpu.bliss.evaluation import Evaluator
    ev = Evaluator("rnnt-e2e")
    for b in range(2):
        out = algo.recognize_segment(feats[b, :flens[b]])
        units = [int(tok) for tok in str(out).split() if tok.isdigit()]
        counts = ev.evaluate(orths[b], task.units_to_orth(units))
        errs += counts.errors
        refs += counts.ref_len
    assert errs <= max(1, refs // 8), (errs, refs)
