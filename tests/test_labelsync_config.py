"""Config-constructible label-sync decoding (VERDICT r2 item 4): the
AED decoder score_fn is built from [model] (type, checkpoint, dims) so
lexiconfree-labelsync / tree-labelsync run from the librasr API and the
speech-recognizer tool with zero Python (reference: encoder-decoder
scorers built by Nn::Module from config, src/Nn/Module.cc:132-218)."""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.api import SearchAlgorithm
from rasr_tpu.core.configuration import Configuration
from rasr_tpu.models.aed import AedModel
from rasr_tpu.nn.checkpoint import save_params

pytestmark = pytest.mark.fast

VOCAB = 8  # 0 = BOS/EOS
B, T, D = 4, 32, 8
LABELS = np.array([[1, 2, 3], [4, 5, 6], [7, 1, 4], [2, 6, 5]], np.int32)


@pytest.fixture(scope="module")
def trained_ckpt(tmp_path_factory):
    """Overfit a tiny AED and save its checkpoint."""
    tmp = tmp_path_factory.mktemp("aed")
    rng = np.random.default_rng(3)
    class_means = rng.standard_normal((VOCAB, D)) * 2.5
    feats = np.zeros((B, T, D), dtype=np.float32)
    for b in range(B):
        for i, lab in enumerate(LABELS[b]):
            feats[b, i * 10:(i + 1) * 10] = class_means[lab] \
                + 0.1 * rng.standard_normal((10, D))
    feat_lens = np.full((B,), 30, dtype=np.int32)
    dec_in = np.concatenate([np.zeros((B, 1), np.int32), LABELS], axis=1)
    target = np.concatenate([LABELS, np.zeros((B, 1), np.int32)], axis=1)
    model = AedModel(vocab_size=VOCAB, d_model=32, encoder_layers=1,
                     decoder_layers=1, n_heads=2, dropout=0.0,
                     dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(feat_lens),
                        jnp.asarray(dec_in))["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, jnp.asarray(feats),
                                 jnp.asarray(feat_lens),
                                 jnp.asarray(dec_in))
            lp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(
                lp, jnp.asarray(target)[..., None], axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_opt, loss

    for _ in range(250):
        params, opt_state, loss = step(params, opt_state)
        if float(loss) < 0.03:
            break
    ckpt = str(tmp / "aed.msgpack")
    save_params(ckpt, params, step=1)
    return ckpt, feats, float(loss)


MODEL_SECTION = """\
    [model]
    type = aed
    checkpoint = {ckpt}
    vocab-size = 8
    d-model = 32
    encoder-layers = 1
    decoder-layers = 1
    n-heads = 2
    feature-dim = 8
    dtype = float32
"""


def _config(text: str, tmp_dir) -> Configuration:
    path = tmp_dir / "search.config"
    path.write_text(textwrap.dedent(text))
    cfg = Configuration()
    cfg.set_from_file(str(path))
    return cfg


class TestLexiconfreeLabelsyncFromConfig:
    def test_e2e_decode(self, trained_ckpt, tmp_path):
        ckpt, feats, loss = trained_ckpt
        assert loss < 0.5, "AED did not converge"
        cfg = _config(f"""\
            [search-algorithm]
            type = lexiconfree-labelsync
            beam-size = 4
            max-labels = 8
            sentence-end-index = 0
        """ + MODEL_SECTION.format(ckpt=ckpt), tmp_path)
        algo = SearchAlgorithm(cfg)
        for b in range(B):
            out = algo.recognize_segment(feats[b])
            assert out == " ".join(str(v) for v in LABELS[b]), \
                f"utt {b}: {out!r}"

    def test_recognize_batch_matches_per_segment(self, trained_ckpt,
                                                 tmp_path):
        """Corpus-batched device beam == per-segment results."""
        import numpy as np
        ckpt, feats, _loss = trained_ckpt
        cfg = _config(f"""\
            [search-algorithm]
            type = lexiconfree-labelsync
            beam-size = 4
            max-labels = 8
            sentence-end-index = 0
        """ + MODEL_SECTION.format(ckpt=ckpt), tmp_path)
        algo = SearchAlgorithm(cfg)
        lens = np.full((B,), feats.shape[1], np.int32)
        nbest = algo._search.recognize_batch(np.asarray(feats), lens)
        assert len(nbest) == B
        for b in range(B):
            assert list(nbest[b][0].labels) == list(LABELS[b])


LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>eps</symbol><variation>none</variation></phoneme>
        <phoneme><symbol>l1</symbol></phoneme>
        <phoneme><symbol>l2</symbol></phoneme>
        <phoneme><symbol>l3</symbol></phoneme>
        <phoneme><symbol>l4</symbol></phoneme>
        <phoneme><symbol>l5</symbol></phoneme>
        <phoneme><symbol>l6</symbol></phoneme>
        <phoneme><symbol>l7</symbol></phoneme>
      </phoneme-inventory>
      <lemma special="boundary"><orth></orth><phon>eps</phon></lemma>
      <lemma><orth>W0</orth><phon>l1 l2 l3</phon></lemma>
      <lemma><orth>W1</orth><phon>l4 l5 l6</phon></lemma>
      <lemma><orth>W2</orth><phon>l7 l1 l4</phon></lemma>
      <lemma><orth>W3</orth><phon>l2 l6 l5</phon></lemma>
    </lexicon>
""")


class TestTreeLabelsyncFromConfig:
    def test_e2e_decode(self, trained_ckpt, tmp_path):
        ckpt, feats, _ = trained_ckpt
        lex = tmp_path / "lex.xml"
        lex.write_text(LEXICON_XML)
        cfg = _config(f"""\
            [lexicon]
            file = {lex}
            [search-algorithm]
            type = tree-labelsync
            beam-size = 8
            max-labels = 8
            sentence-end-index = 0
        """ + MODEL_SECTION.format(ckpt=ckpt), tmp_path)
        algo = SearchAlgorithm(cfg)
        for b in range(B):
            algo.enter_segment()
            algo.put_features(feats[b])
            algo.finish_segment()
            words = algo._search.best_words()
            assert words == [f"W{b}"], f"utt {b}: {words}"
