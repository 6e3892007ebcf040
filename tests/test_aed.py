"""AED model + label-synchronous beam search E2E: overfit a tiny
encoder-decoder on synthetic utterances, decode with the labelsync search."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.models.aed import AedModel
from rasr_tpu.search.lexiconfree_labelsync import LexiconfreeLabelsyncBeamSearch

VOCAB = 8  # 0 = BOS/EOS
B, T, D = 4, 32, 8


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(3)
    class_means = rng.standard_normal((VOCAB, D)) * 2.5
    labels = np.array([[1, 2, 3], [4, 5, 6], [7, 1, 4], [2, 6, 5]],
                      dtype=np.int32)
    feats = np.zeros((B, T, D), dtype=np.float32)
    for b in range(B):
        for i, lab in enumerate(labels[b]):
            feats[b, i * 10:(i + 1) * 10] = class_means[lab] \
                + 0.1 * rng.standard_normal((10, D))
    feat_lens = np.full((B,), 30, dtype=np.int32)
    # teacher forcing: input = BOS + labels, target = labels + EOS
    dec_in = np.concatenate([np.zeros((B, 1), np.int32), labels], axis=1)
    target = np.concatenate([labels, np.zeros((B, 1), np.int32)], axis=1)

    model = AedModel(vocab_size=VOCAB, d_model=32, encoder_layers=1,
                     decoder_layers=1, n_heads=2, dropout=0.0,
                     dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(feat_lens), jnp.asarray(dec_in))["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply({"params": p}, jnp.asarray(feats),
                                 jnp.asarray(feat_lens), jnp.asarray(dec_in))
            lp = jax.nn.log_softmax(logits, -1)
            return -jnp.mean(jnp.take_along_axis(
                lp, jnp.asarray(target)[..., None], axis=-1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_opt, loss

    losses = []
    for _ in range(200):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
        if losses[-1] < 0.03:
            break
    return model, params, feats, feat_lens, labels, losses


class TestAed:
    def test_training_converges(self, trained):
        *_, losses = trained
        assert losses[-1] < 0.5, f"AED did not converge: {losses[-5:]}"

    def test_labelsync_beam_decodes(self, trained):
        model, params, feats, feat_lens, labels, _ = trained

        @jax.jit
        def enc_fn(f, l):
            return model.apply({"params": params}, f, l, method=model.encode)

        for b in range(B):
            enc, enc_mask = enc_fn(jnp.asarray(feats[b:b + 1]),
                                   jnp.asarray(feat_lens[b:b + 1]))

            def score_fn(histories):
                n = histories.shape[0]
                e = jnp.repeat(enc, n, axis=0)
                m = jnp.repeat(enc_mask, n, axis=0)
                logits = model.apply({"params": params}, e, m,
                                     jnp.asarray(histories),
                                     method=model.decode)
                return -np.asarray(jax.nn.log_softmax(logits[:, -1], -1))

            search = LexiconfreeLabelsyncBeamSearch(
                score_fn, n_labels=VOCAB, sentence_end_index=0,
                beam_size=4, max_labels=8)
            got = search.recognize_segment(feats[b])
            assert got == labels[b].tolist(), f"utt {b}: {got}"

    def test_nbest_sorted(self, trained):
        model, params, feats, feat_lens, labels, _ = trained

        @jax.jit
        def enc_fn(f, l):
            return model.apply({"params": params}, f, l, method=model.encode)

        enc, enc_mask = enc_fn(jnp.asarray(feats[:1]),
                               jnp.asarray(feat_lens[:1]))

        def score_fn(histories):
            n = histories.shape[0]
            logits = model.apply({"params": params},
                                 jnp.repeat(enc, n, axis=0),
                                 jnp.repeat(enc_mask, n, axis=0),
                                 jnp.asarray(histories), method=model.decode)
            return -np.asarray(jax.nn.log_softmax(logits[:, -1], -1))

        search = LexiconfreeLabelsyncBeamSearch(score_fn, VOCAB,
                                                beam_size=4, max_labels=8)
        search.recognize_segment(feats[0])
        nb = search.n_best(4)
        scores = [h.normalized_score(1.0) for h in nb]
        assert scores == sorted(scores)


class TestCachedDecoder:
    def test_cached_matches_uncached(self, trained):
        """KV-cached O(L) decoding finds the same transcripts as the
        O(L^2) label-sync search (and the references)."""
        from rasr_tpu.search.aed_cached import CachedAedDecoder
        model, params, feats, feat_lens, labels, _ = trained
        dec = CachedAedDecoder(model, params, beam_size=4, max_labels=8)
        for b in range(B):
            got = dec.recognize(feats[b], int(feat_lens[b]))
            assert got == labels[b].tolist(), f"utt {b}: {got}"

    def test_step_scores_match_full_decode(self, trained):
        """Per-step cached logits equal the full-prefix decoder's last
        position (the cache is exact, not an approximation)."""
        from rasr_tpu.search.aed_cached import CachedAedDecoder
        import jax
        model, params, feats, feat_lens, labels, _ = trained
        dec = CachedAedDecoder(model, params, beam_size=1, max_labels=8)
        enc, enc_mask = dec._encode(jnp.asarray(feats[:1]),
                                    jnp.asarray(feat_lens[:1], jnp.int32))

        # cached: step through BOS, l0, l1
        def prime(model, enc, enc_mask, tokens):
            y = model.embed(tokens).astype(model.dtype)
            cross = enc_mask[:, None, None, :]
            for block in model.blocks:
                y = block(y, enc, cross, None, deterministic=True,
                          decode=True)
            return y

        variables = model.init(jax.random.PRNGKey(0), enc, enc_mask,
                               jnp.zeros((1, 8), jnp.int32), method=prime)
        cache = jax.tree_util.tree_map(jnp.zeros_like, variables["cache"])
        seq = [0, int(labels[0][0]), int(labels[0][1])]
        cached_rows = []
        position = jnp.zeros((1,), jnp.int32)
        for tok in seq:
            lp, cache = dec._step(cache, enc, enc_mask,
                                  jnp.asarray([[tok]], jnp.int32), position)
            cached_rows.append(np.asarray(lp[0]))
            position = position + 1
        # uncached: full prefix decode, take the last position each time
        for i in range(len(seq)):
            prefix = jnp.asarray([seq[:i + 1]], jnp.int32)
            logits = model.apply({"params": params}, enc, enc_mask, prefix,
                                 method=model.decode)
            full = np.asarray(jax.nn.log_softmax(logits[0, -1], -1))
            np.testing.assert_allclose(cached_rows[i], full, atol=2e-4,
                                       err_msg=f"step {i}")
