"""Transducer tests: RNN-T loss vs brute-force alignment-path enumeration,
training convergence, greedy decode of the training set."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.models.transducer import (TransducerModel, rnnt_loss,
                                        transducer_greedy)


def brute_force_rnnt_nll(log_probs, labels, blank=0):
    """Sum over all monotonic alignment paths: T blanks + U emits
    interleaved; path = positions of emits among T+U steps with the
    constraint that each frame t advances by blank."""
    T, U1, V = log_probs.shape
    U = len(labels)
    # enumerate emit patterns: choose at which (t, u) each emit happens.
    # recursive DP in plain python float
    from functools import lru_cache
    import math

    def logaddexp(a, b):
        if a == -np.inf:
            return b
        if b == -np.inf:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    @lru_cache(maxsize=None)
    def alpha(t, u):
        if t == 0 and u == 0:
            return 0.0
        best = -np.inf
        if t > 0:
            best = logaddexp(best, alpha(t - 1, u) + float(log_probs[t - 1, u, blank]))
        if u > 0:
            best = logaddexp(best, alpha(t, u - 1)
                             + float(log_probs[t, u - 1, labels[u - 1]]))
        return best

    return -(alpha(T - 1, U) + float(log_probs[T - 1, U, blank]))


class TestRnntLoss:
    def test_matches_brute_force(self):
        rng = np.random.default_rng(0)
        T, U, V = 4, 2, 5
        logits = rng.standard_normal((1, T, U + 1, V)).astype(np.float32)
        labels = np.array([[2, 4]], dtype=np.int32)
        nll = float(rnnt_loss(jnp.asarray(logits), jnp.asarray([T]),
                              jnp.asarray(labels), jnp.asarray([U]))[0])
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))[0]
        expected = brute_force_rnnt_nll(lp, labels[0].tolist())
        assert abs(nll - expected) < 1e-4

    def test_batched_lengths(self):
        rng = np.random.default_rng(1)
        T, U, V = 5, 3, 4
        logits = rng.standard_normal((2, T, U + 1, V)).astype(np.float32)
        labels = np.array([[1, 2, 3], [2, 1, 0]], dtype=np.int32)
        nll = np.asarray(rnnt_loss(jnp.asarray(logits),
                                   jnp.asarray([T, 4]),
                                   jnp.asarray(labels), jnp.asarray([3, 2])))
        lp = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        e0 = brute_force_rnnt_nll(lp[0], [1, 2, 3])
        e1 = brute_force_rnnt_nll(lp[1][:4], [2, 1])
        assert abs(nll[0] - e0) < 1e-4
        assert abs(nll[1] - e1) < 1e-4


VOCAB = 8
B, T, D = 4, 32, 8


@pytest.fixture(scope="module")
def trained():
    rng = np.random.default_rng(5)
    class_means = rng.standard_normal((VOCAB, D)) * 2.5
    labels = np.array([[1, 2, 3], [4, 5, 6], [7, 1, 4], [2, 6, 5]],
                      dtype=np.int32)
    feats = np.zeros((B, T, D), dtype=np.float32)
    for b in range(B):
        for i, lab in enumerate(labels[b]):
            feats[b, i * 10:(i + 1) * 10] = class_means[lab] \
                + 0.1 * rng.standard_normal((10, D))
    feat_lens = np.full((B,), 30, dtype=np.int32)
    label_lens = np.full((B,), 3, dtype=np.int32)

    model = TransducerModel(vocab_size=VOCAB, d_model=32, encoder_layers=1,
                            pred_hidden=32, joint_dim=32, n_heads=2,
                            dropout=0.0, dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                        jnp.asarray(feat_lens), jnp.asarray(labels))["params"]
    opt = optax.adam(3e-3)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits, out_lens = model.apply(
                {"params": p}, jnp.asarray(feats), jnp.asarray(feat_lens),
                jnp.asarray(labels))
            return jnp.mean(rnnt_loss(logits, out_lens, jnp.asarray(labels),
                                      jnp.asarray(label_lens)))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state)
        return optax.apply_updates(params, updates), new_opt, loss

    losses = []
    for _ in range(250):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
        if losses[-1] < 0.05:
            break
    return model, params, feats, feat_lens, labels, losses


class TestTransducerE2E:
    def test_training_converges(self, trained):
        *_, losses = trained
        assert losses[-1] < 1.0, f"RNN-T did not converge: {losses[-5:]}"

    def test_greedy_decodes_training_data(self, trained):
        model, params, feats, feat_lens, labels, _ = trained

        @jax.jit
        def encode(f, l):
            return model.apply({"params": params}, f, l, method=model.encode)

        @jax.jit
        def pred_all(lab_seq):
            return model.apply({"params": params}, lab_seq,
                               method=model.predict)

        @jax.jit
        def joint(enc_t, pred_h):
            logits = model.apply({"params": params}, enc_t[None, None],
                                 pred_h[None, None], method=model.joint_logits)
            return jax.nn.log_softmax(logits[0, 0, 0], -1)

        for b in range(B):
            enc, out_lens = encode(jnp.asarray(feats[b:b + 1]),
                                   jnp.asarray(feat_lens[b:b + 1]))
            enc_np = np.asarray(enc[0])

            def pred_step(label, state):
                # stateless re-run over the prefix (fine at test size)
                prefix = state or []
                if label >= 0:
                    prefix = prefix + [label]
                seq = jnp.asarray([[0] + prefix], jnp.int32)
                h = np.asarray(pred_all(seq))[0, -1]
                return h, prefix

            got = transducer_greedy(
                lambda e, p: np.asarray(joint(jnp.asarray(e), jnp.asarray(p))),
                pred_step, enc_np, int(out_lens[0]))
            assert got == labels[b].tolist(), f"utt {b}: {got}"


class TestTransducerBeam:
    def test_beam_decodes_training_data(self, trained):
        from rasr_tpu.search.transducer_beam import TransducerBeamSearch
        model, params, feats, feat_lens, labels, _ = trained

        @jax.jit
        def encode(f, l):
            return model.apply({"params": params}, f, l, method=model.encode)

        @jax.jit
        def pred_batch(lab_seq):
            # full (B, L, P): the search gathers per-hypothesis lengths
            return model.apply({"params": params}, lab_seq,
                               method=model.predict)

        @jax.jit
        def joint_batch(enc_t, pred):
            logits = model.apply({"params": params},
                                 enc_t[None, None].repeat(pred.shape[0], 0),
                                 pred[:, None], method=model.joint_logits)
            return jax.nn.log_softmax(logits[:, 0, 0], -1)

        search = TransducerBeamSearch(
            lambda p: np.asarray(pred_batch(jnp.asarray(p))),
            lambda e, p: np.asarray(joint_batch(jnp.asarray(e),
                                                jnp.asarray(p))),
            beam_size=4, max_symbols_per_frame=2, expansion_topk=3)
        for b in range(2):
            enc, out_lens = encode(jnp.asarray(feats[b:b + 1]),
                                   jnp.asarray(feat_lens[b:b + 1]))
            got = search.recognize(np.asarray(enc[0]), int(out_lens[0]))
            assert got == labels[b].tolist(), f"utt {b}: {got}"


class TestCachedDecoder:
    def test_cached_matches_uncached(self, trained):
        """State-cached beam reproduces the prefix-rescoring beam (and the
        training transcripts): one prediction step per emitted label."""
        from rasr_tpu.search.transducer_cached import CachedTransducerDecoder
        model, params, feats, feat_lens, labels, _ = trained
        dec = CachedTransducerDecoder(model, params, beam_size=4,
                                      max_symbols_per_frame=2,
                                      expansion_topk=3)
        for b in range(B):
            got = dec.recognize_features(feats[b], int(feat_lens[b]))
            assert got == labels[b].tolist(), f"utt {b}: {got}"

    def test_step_equals_full_prefix(self, trained):
        """Stepped LSTM state equals the full-sequence scan at each
        position (the cache is exact)."""
        from rasr_tpu.search.transducer_cached import CachedTransducerDecoder
        model, params, feats, feat_lens, labels, _ = trained
        seq = [0] + labels[0].tolist()
        full = model.apply({"params": params},
                           jnp.asarray([seq], jnp.int32),
                           method=model.predict)   # (1, U+1, P)
        carry = model.apply({"params": params}, 1,
                            method=model.predict_init)
        for u, tok in enumerate(seq):
            carry, out = model.apply({"params": params}, carry,
                                     jnp.asarray([tok], jnp.int32),
                                     method=model.predict_step)
            np.testing.assert_allclose(np.asarray(out[0]),
                                       np.asarray(full[0, u]), atol=1e-5,
                                       err_msg=f"step {u}")


class TestPredictionStateChain:
    """The step-wise prediction-state chain must equal the full-prefix
    forward INCLUDING the leading BOS/blank — on arbitrary (random)
    params, not an overfit model.  Regression test for the batched
    greedy-decode bug where carry0 skipped BOS consumption: every label
    was re-emitted 2-4x (~60% WER) on an otherwise-converged flagship,
    invisible to overfit-model decode tests."""

    @pytest.mark.fast
    def test_step_chain_matches_full_prefix(self):
        model = TransducerModel(vocab_size=8, d_model=32, encoder_layers=1,
                                pred_hidden=32, joint_dim=32, n_heads=2,
                                dropout=0.0, dtype=jnp.float32)
        params = model.init(
            jax.random.PRNGKey(7), jnp.zeros((1, 8, 8), jnp.float32),
            jnp.asarray([8]), jnp.zeros((1, 3), jnp.int32))["params"]
        prefix = [3, 5, 1]
        # full forward over [BOS] + prefix (what training conditions on)
        full = model.apply({"params": params},
                           jnp.asarray([[0] + prefix], jnp.int32),
                           method=TransducerModel.predict)
        # step chain: init -> consume BOS -> consume prefix tokens
        carry = model.apply({"params": params}, 1,
                            method=TransducerModel.predict_init)
        outs = []
        for tok in [0] + prefix:
            carry, p = model.apply({"params": params}, carry,
                                   jnp.asarray([tok], jnp.int32),
                                   method=TransducerModel.predict_step)
            outs.append(p)
        for i, p in enumerate(outs):
            np.testing.assert_allclose(np.asarray(p[0]),
                                       np.asarray(full[0, i]),
                                       rtol=1e-5, atol=1e-5,
                                       err_msg=f"position {i}")
