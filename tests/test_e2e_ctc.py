"""Milestone C end-to-end test: train the conformer-CTC on a tiny synthetic
task until it overfits, then decode with the device-side prefix beam search
and the generic host beam search, and check WER via the evaluator.

This exercises the full loop: features -> sharded training -> log-probs ->
search -> lemma orthography -> WER.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.bliss.evaluation import Evaluator
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.models import ConformerCtc
from rasr_tpu.nn.label_scorer import EncoderOnlyLabelScorer
from rasr_tpu.nn.training import CtcTrainer
from rasr_tpu.parallel import make_mesh
from rasr_tpu.search.ctc_decode import ctc_greedy, ctc_prefix_beam
from rasr_tpu.search.lexiconfree_timesync import LexiconfreeTimesyncBeamSearch
from rasr_tpu.speech.recognizer import OfflineRecognizer


VOCAB = 8  # 0 = blank, labels 1..7
B, T, D = 4, 48, 8


@pytest.fixture(scope="module")
def trained():
    """Overfit 4 synthetic utterances; label sequence derivable from input."""
    rng = np.random.default_rng(42)
    # class-conditional feature means make the task learnable
    class_means = rng.standard_normal((VOCAB, D)) * 2.0
    labels = np.array([[1, 2, 3], [4, 5, 6], [7, 1, 4], [2, 2, 5]],
                      dtype=np.int32)
    feats = np.zeros((B, T, D), dtype=np.float32)
    for b in range(B):
        for i, lab in enumerate(labels[b]):
            feats[b, i * 16:(i + 1) * 16] = class_means[lab] \
                + 0.1 * rng.standard_normal((16, D))
    feat_lens = np.full((B,), T, dtype=np.int32)
    label_lens = np.full((B,), 3, dtype=np.int32)

    mesh = make_mesh(n_devices=2, data_parallel=2)
    model = ConformerCtc(vocab_size=VOCAB, d_model=32, n_layers=2, n_heads=2,
                         conv_kernel=7, dropout=0.0, dtype=jnp.float32)
    trainer = CtcTrainer(model, mesh, optimizer=optax.adam(3e-3),
                         example_shape=(B, T, D))
    losses = []
    for _ in range(300):
        losses.append(trainer.train_step(feats, feat_lens, labels, label_lens))
        # loss is per-label normalized; 0.02/label is a crisp fit (the
        # repeated-label case needs a confident blank between repeats)
        if losses[-1] < 0.02:
            break
    return trainer, feats, feat_lens, labels, losses


class TestEndToEnd:
    def test_loss_converges(self, trained):
        _, _, _, _, losses = trained
        assert losses[-1] < 1.0, f"CTC loss did not converge: {losses[-10:]}"

    def test_greedy_decodes_training_data(self, trained):
        trainer, feats, feat_lens, labels, _ = trained
        fn = trainer.log_probs_fn()
        lp, out_lens = fn(trainer.params, feats, feat_lens)
        dec, n = ctc_greedy(np.asarray(lp), np.asarray(out_lens))
        for b in range(B):
            assert dec[b, :int(n[b])].tolist() == labels[b].tolist()

    def test_prefix_beam_decodes_training_data(self, trained):
        trainer, feats, feat_lens, labels, _ = trained
        fn = trainer.log_probs_fn()
        lp, out_lens = fn(trainer.params, feats, feat_lens)
        dec, n, scores = ctc_prefix_beam(np.asarray(lp), np.asarray(out_lens),
                                         beam=8, topk=VOCAB - 1)
        for b in range(B):
            assert dec[b, 0, :int(n[b, 0])].tolist() == labels[b].tolist()
        assert np.all(scores[:, 0] <= scores[:, 1] + 1e-6)

    def test_host_beam_search_matches(self, trained):
        """Generic LabelScorer + host beam search find the same labels."""
        trainer, feats, feat_lens, labels, _ = trained
        fn = trainer.log_probs_fn()

        def encode(x):
            lp, out_lens = fn(trainer.params, x[None],
                              jnp.asarray([x.shape[0]], jnp.int32))
            return np.asarray(lp[0, :int(out_lens[0])])

        scorer = EncoderOnlyLabelScorer(encode, n_labels=VOCAB)
        search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=8,
                                               blank_index=0)
        got = search.recognize_segment(feats[0])
        assert got == labels[0].tolist()

    def test_offline_recognizer_wer(self, trained):
        """Recognizer + vocab-text lexicon + evaluator end to end."""
        trainer, feats, feat_lens, labels, _ = trained
        fn = trainer.log_probs_fn()

        def encode(x):
            lp, out_lens = fn(trainer.params, x[None],
                              jnp.asarray([x.shape[0]], jnp.int32))
            return np.asarray(lp[0, :int(out_lens[0])])

        import tempfile, os
        lex = Lexicon()
        with tempfile.TemporaryDirectory() as d:
            vp = os.path.join(d, "labels.txt")
            with open(vp, "w") as fh:
                fh.write("<blank>\n" + "\n".join(f"W{i}" for i in range(1, VOCAB)))
            lex.load(f"vocab-text:{vp}")
        lex.lemmas[0].special = "blank"  # mark blank lemma

        scorer = EncoderOnlyLabelScorer(encode, n_labels=VOCAB)
        search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=8,
                                               blank_index=0)
        ev = Evaluator()
        rec = OfflineRecognizer(feature_fn=lambda s: s, search=search,
                                lexicon=lex, evaluator=ev)
        ref_orth = " ".join(f"W{l}" for l in labels[0])
        result = rec.recognize_samples(feats[0], name="seg0",
                                       reference_orth=ref_orth)
        assert result.orth == ref_orth
        assert ev.wer == 0.0
