"""Device-side transducer beam search (search/transducer_device.py).

Verified three ways:
  * EXACT: with beam >= the whole sequence space and topk = V-1 no
    pruning occurs, so the device beam's per-sequence scores must equal a
    brute-force enumeration of every bounded-emission alignment path
    (log-sum over paths, argmax over sequences);
  * greedy equivalence: beam=1 / topk=1 makes the same local decision as
    the host greedy walk (models.transducer.transducer_greedy);
  * the config/`api` path: CachedTransducerDecoder's device fast path is
    at least as good (total log-prob) as its host cached search and
    returns identical best labels on a toy model.
"""

import itertools
import math
from collections import defaultdict

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.models.transducer import TransducerModel, transducer_greedy
from rasr_tpu.search.transducer_cached import CachedTransducerDecoder
from rasr_tpu.search.transducer_device import make_transducer_beam

V = 4          # blank + 3 labels
E_DIM = 16


@pytest.fixture(scope="module")
def toy():
    model = TransducerModel(vocab_size=V, d_model=E_DIM, encoder_layers=1,
                            pred_hidden=8, joint_dim=8, n_heads=2,
                            dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 8, 10)), jnp.asarray([8]),
                        jnp.zeros((1, 2), jnp.int32))["params"]
    return model, params


def _lp_row(model, params, enc_t, prefix):
    """log-prob row after BOS+prefix at one encoder frame."""
    toks = jnp.asarray([[0] + list(prefix)], jnp.int32)
    pred = model.apply({"params": params}, toks, method=model.predict)
    logits = model.apply({"params": params}, enc_t[None, None, :],
                         pred[:, -1:, :], method=model.joint_logits)
    return np.asarray(jax.nn.log_softmax(
        logits[0, 0, 0].astype(jnp.float32)))


def brute_force_sequences(model, params, enc, T, max_symbols, vocab=V):
    """Total log-prob per label sequence over ALL bounded-emission
    monotonic paths (<= max_symbols non-blank emits per frame, each frame
    closed by one blank)."""
    seq_lp = defaultdict(lambda: -np.inf)

    def go(t, prefix, lp):
        if t == T:
            seq_lp[prefix] = np.logaddexp(seq_lp[prefix], lp)
            return
        def expand(prefix, lp, k):
            row = _lp_row(model, params, enc[t], prefix)
            go(t + 1, prefix, lp + row[0])            # blank closes frame
            if k < max_symbols:
                for v in range(1, vocab):
                    expand(prefix + (v,), lp + row[v], k + 1)
        expand(prefix, lp, 0)

    go(0, (), 0.0)
    return dict(seq_lp)


class TestDeviceBeamExact:
    def test_matches_brute_force(self):
        # dedicated 2-label model so the full sequence space (31 seqs,
        # <= 62 live (sequence, frozen-state) pairs) fits in one beam:
        # with beam >= space and topk = V-1 NOTHING is pruned, so every
        # score must be the exact path-sum
        vv = 3
        model = TransducerModel(vocab_size=vv, d_model=E_DIM,
                                encoder_layers=1, pred_hidden=8,
                                joint_dim=8, n_heads=2, dtype=jnp.float32)
        params = model.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, 8, 10)), jnp.asarray([8]),
                            jnp.zeros((1, 2), jnp.int32))["params"]
        T, max_symbols = 2, 2
        enc = jax.random.normal(jax.random.PRNGKey(7), (1, T, E_DIM))
        ref = brute_force_sequences(model, params, np.asarray(enc[0]),
                                    T, max_symbols, vocab=vv)
        beam = 64          # > 2 * len(ref): exhaustive, exact
        search = make_transducer_beam(model, beam=beam, blank=0,
                                      max_symbols=max_symbols, topk=vv - 1,
                                      max_labels=8)
        labels, n_lab, scores = jax.tree_util.tree_map(
            np.asarray, search(params, enc, jnp.asarray([T], jnp.int32)))

        got = {}
        for k in range(beam):
            if scores[0, k] > 1e20:
                continue
            got[tuple(int(u) for u in labels[0, k, :n_lab[0, k]])] = \
                -float(scores[0, k])
        # every surviving hypothesis's total log-prob is exact
        assert got, "no live hypotheses"
        for seq, lp in got.items():
            assert seq in ref
            assert lp == pytest.approx(ref[seq], abs=2e-3), seq
        # the best sequence is the true argmax
        best_ref = max(ref.items(), key=lambda kv: kv[1])
        best_got = max(got.items(), key=lambda kv: kv[1])
        assert best_got[0] == best_ref[0]
        assert best_got[1] == pytest.approx(best_ref[1], abs=2e-3)
        # and nothing with more mass than the worst survivor was dropped
        kept_min = min(got.values())
        dropped = [lp for seq, lp in ref.items() if seq not in got]
        assert all(lp <= kept_min + 1e-3 for lp in dropped)

    def test_respects_enc_lens(self, toy):
        """Padding frames beyond enc_lens must not change the result."""
        model, params = toy
        T = 3
        enc = jax.random.normal(jax.random.PRNGKey(11), (1, T, E_DIM))
        enc_pad = jnp.concatenate(
            [enc, 100.0 * jnp.ones((1, 2, E_DIM))], axis=1)
        search = make_transducer_beam(model, beam=4, blank=0,
                                      max_symbols=2, topk=3, max_labels=8)
        a = jax.tree_util.tree_map(
            np.asarray, search(params, enc, jnp.asarray([T], jnp.int32)))
        b = jax.tree_util.tree_map(
            np.asarray,
            search(params, enc_pad, jnp.asarray([T], jnp.int32)))
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])
        np.testing.assert_allclose(a[2], b[2], rtol=1e-5)


class TestHostAgreement:
    def test_best_matches_host_beam(self, toy):
        """Device and host searches share pool semantics (K frozen +
        K live); on a toy model they find the same best sequence, and
        the device's exact log-sum recombination scores it at least as
        high (host keeps only the max-prob copy of duplicate emits)."""
        from rasr_tpu.search.transducer_cached import \
            CachedTransducerDecoder
        model, params = toy
        T = 10
        search = make_transducer_beam(model, beam=8, blank=0,
                                      max_symbols=2, topk=3, max_labels=32)
        for seed in range(3):
            enc = jax.random.normal(jax.random.PRNGKey(seed),
                                    (1, T, E_DIM))
            labels, n_lab, scores = jax.tree_util.tree_map(
                np.asarray,
                search(params, enc, jnp.asarray([T], jnp.int32)))
            got = tuple(int(u) for u in labels[0, 0, :n_lab[0, 0]])

            host = CachedTransducerDecoder(model, params, beam_size=8,
                                           max_symbols_per_frame=2,
                                           expansion_topk=3,
                                           device_beam=False)
            want = host.decode(np.asarray(enc[0]), T)[0]
            assert got == want.labels, f"seed {seed}"
            assert scores[0, 0] <= want.score + 1e-3, f"seed {seed}"


class TestStreaming:
    def test_chunked_advance_equals_full(self, toy):
        """The beam state is the scan carry: advancing it in chunks must
        be EXACTLY the whole-utterance search (lossless streaming)."""
        model, params = toy
        T = 12
        enc = jax.random.normal(jax.random.PRNGKey(21), (2, T, E_DIM))
        lens = jnp.asarray([12, 9], jnp.int32)
        search = make_transducer_beam(model, beam=4, blank=0,
                                      max_symbols=2, topk=3, max_labels=16)
        want = jax.tree_util.tree_map(np.asarray,
                                      search(params, enc, lens))

        state = search.init(params, 2)
        for lo, hi in ((0, 5), (5, 8), (8, 12)):
            n_valid = jnp.clip(lens - lo, 0, hi - lo)
            state = search.advance(params, state, enc[:, lo:hi], n_valid)
        got = jax.tree_util.tree_map(np.asarray, search.finalize(state))
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_allclose(got[2], want[2], rtol=1e-5)

    def test_streaming_session_lossless(self):
        """Causal encoder + chunked beam: feeding audio features in
        chunks yields the same labels as one offline pass."""
        from rasr_tpu.search.transducer_stream import \
            StreamingTransducerSession
        model = TransducerModel(vocab_size=V, d_model=E_DIM,
                                encoder_layers=1, pred_hidden=8,
                                joint_dim=8, n_heads=2,
                                dtype=jnp.float32, causal=True)
        params = model.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, 8, 10)), jnp.asarray([8]),
                            jnp.zeros((1, 2), jnp.int32))["params"]
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(6),
                                             (64, 10)))
        sess = StreamingTransducerSession(model, params, beam_size=4,
                                          max_symbols_per_frame=2,
                                          expansion_topk=3,
                                          feat_bucket=16, enc_bucket=4)
        for lo in range(0, 64, 16):
            sess.feed(feats[lo:lo + 16])
            sess.partial()          # non-destructive mid-stream reads
        got = sess.finish()

        # offline reference on the same (causal) model
        encode = jax.jit(lambda p, f, l: model.apply(
            {"params": p}, f, l, method=model.encode))
        enc, out_lens = encode(params, jnp.asarray(feats)[None],
                               jnp.asarray([64], jnp.int32))
        beam = make_transducer_beam(model, beam=4, max_symbols=2,
                                    topk=3, max_labels=128)
        labels, n, _ = jax.tree_util.tree_map(
            np.asarray, beam(params, enc, out_lens))
        want = [int(u) for u in labels[0, 0, :n[0, 0]]]
        assert got == want

    def test_requires_causal_encoder(self, toy):
        from rasr_tpu.search.transducer_stream import \
            StreamingTransducerSession
        model, params = toy
        with pytest.raises(ValueError, match="causal"):
            StreamingTransducerSession(model, params)


class TestCachedDecoderDevicePath:
    def test_device_at_least_as_good_as_host(self, toy):
        model, params = toy
        feats = np.asarray(
            jax.random.normal(jax.random.PRNGKey(5), (40, 10)))
        dev = CachedTransducerDecoder(model, params, beam_size=8,
                                      max_symbols_per_frame=2,
                                      expansion_topk=3, device_beam=True)
        host = CachedTransducerDecoder(model, params, beam_size=8,
                                       max_symbols_per_frame=2,
                                       expansion_topk=3, device_beam=False)
        got_dev = dev.recognize_features(feats, 40, feat_bucket=40)
        got_host = host.recognize_features(feats, 40, feat_bucket=40)
        # same model, same beam width: the exact-merging device search
        # must not be worse; on this toy they agree exactly
        assert got_dev == got_host

    def test_segment_api_uses_device_path(self, toy):
        model, params = toy
        dec = CachedTransducerDecoder(model, params, beam_size=4,
                                      max_symbols_per_frame=2,
                                      expansion_topk=3)
        dec.enter_segment()
        dec.put_features(np.asarray(
            jax.random.normal(jax.random.PRNGKey(9), (32, 10))))
        dec.finish_segment()
        nbest = dec.n_best(4)
        assert nbest and nbest[0].labels == tuple(
            dec.get_current_best_labels())
        assert all(nbest[i].score <= nbest[i + 1].score
                   for i in range(len(nbest) - 1))
