"""Config-constructible frame-sync transducer decoding: the whole
CachedTransducerDecoder (encoder + prediction + joint, KV/state caches)
is built from [model] (type=transducer, checkpoint, dims) so it runs
from the librasr API and the speech-recognizer tool with zero Python —
the third flagship family's analog of the AED label-sync config path
(reference: stateful scorers built by Nn::Module from config,
src/Nn/Module.cc:132-218 + src/Nn/LabelScorer/StatefulOnnxLabelScorer.hh).
"""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.api import SearchAlgorithm
from rasr_tpu.core.configuration import Configuration
from rasr_tpu.models.transducer import TransducerModel, rnnt_loss
from rasr_tpu.nn.checkpoint import save_params

pytestmark = pytest.mark.fast

VOCAB = 8  # 0 = blank
B, T, D = 4, 32, 8
LABELS = np.array([[1, 2, 3], [4, 5, 6], [7, 1, 4], [2, 6, 5]], np.int32)


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Overfit a tiny RNN-T and save its checkpoint."""
    tmp = tmp_path_factory.mktemp("rnnt")
    rng = np.random.default_rng(5)
    class_means = rng.standard_normal((VOCAB, D)) * 2.5
    feats = np.zeros((B, T, D), dtype=np.float32)
    for b in range(B):
        for i, lab in enumerate(LABELS[b]):
            feats[b, i * 10:(i + 1) * 10] = class_means[lab] \
                + 0.1 * rng.standard_normal((10, D))
    feat_lens = np.full((B,), 30, dtype=np.int32)
    label_lens = np.full((B,), 3, dtype=np.int32)
    model = TransducerModel(vocab_size=VOCAB, d_model=32, encoder_layers=1,
                            pred_hidden=32, joint_dim=32, n_heads=2,
                            dropout=0.0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(feat_lens),
                        jnp.asarray(LABELS))["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, out_lens = model.apply(
                {"params": p}, jnp.asarray(feats), jnp.asarray(feat_lens),
                jnp.asarray(LABELS))
            return jnp.mean(rnnt_loss(logits, out_lens, jnp.asarray(LABELS),
                                      jnp.asarray(label_lens)))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_opt, loss

    loss = np.inf
    for _ in range(250):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.05:
            break
    ckpt = str(tmp / "rnnt.msgpack")
    save_params(ckpt, params, step=1)
    return ckpt, feats, float(loss)


def test_transducer_framesync_from_config(trained_ckpt, tmp_path):
    ckpt, feats, loss = trained_ckpt
    assert loss < 1.0, "RNN-T did not converge"
    path = tmp_path / "search.config"
    path.write_text(textwrap.dedent(f"""\
        [search-algorithm]
        type = transducer-framesync
        beam-size = 4
        blank-label-index = 0
        max-symbols-per-frame = 3

        [model]
        type = transducer
        checkpoint = {ckpt}
        vocab-size = 8
        d-model = 32
        encoder-layers = 1
        pred-hidden = 32
        joint-dim = 32
        n-heads = 2
        feature-dim = 8
    """))
    cfg = Configuration()
    cfg.set_from_file(str(path))
    algo = SearchAlgorithm(cfg)
    for b in range(B):
        out = algo.recognize_segment(feats[b])
        assert out == " ".join(str(v) for v in LABELS[b]), \
            f"utt {b}: {out!r}"
    # n-best surface exposes the final beam
    nb = algo.recognize_segment_n_best(feats[0], 2)
    assert nb and nb[0][0] == " ".join(str(v) for v in LABELS[0])


def test_recognize_batch_matches_per_segment(trained_ckpt, tmp_path):
    """Corpus-batched decoding (one encoder + one device beam program)
    returns the same best hypotheses as the per-segment API."""
    ckpt, feats, _loss = trained_ckpt
    path = tmp_path / "batch.config"
    path.write_text(textwrap.dedent(f"""\
        [search-algorithm]
        type = transducer-framesync
        beam-size = 4
        blank-label-index = 0
        max-symbols-per-frame = 3

        [model]
        type = transducer
        checkpoint = {ckpt}
        vocab-size = 8
        d-model = 32
        encoder-layers = 1
        pred-hidden = 32
        joint-dim = 32
        n-heads = 2
        feature-dim = 8
        dtype = float32
    """))
    cfg = Configuration()
    cfg.set_from_file(str(path))
    algo = SearchAlgorithm(cfg)
    lens = np.full((B,), 30, np.int32)
    nbest = algo._search.recognize_batch(feats, lens, n_best=2)
    assert len(nbest) == B
    for b in range(B):
        assert list(nbest[b][0].labels) == list(LABELS[b])
        per_seg = algo.recognize_segment(feats[b])
        assert per_seg == " ".join(str(v) for v in nbest[b][0].labels)
