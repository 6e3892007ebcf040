"""LM-fused device CTC prefix beam (search/ctc_decode_lm.py):
equivalence with the acoustic-only beam at lm_scale=0, and exactness
against a brute-force host shallow-fusion reference."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rasr_tpu.lm.neural import LstmLmModel
from rasr_tpu.search.ctc_decode import ctc_prefix_beam
from rasr_tpu.search.ctc_decode_lm import ctc_prefix_beam_lm

V, BOS = 6, 5
N_LAYERS = 2


@pytest.fixture(scope="module")
def lm():
    model = LstmLmModel(vocab_size=V, embed_dim=8, hidden_dim=12,
                        n_layers=N_LAYERS)
    params = model.init(jax.random.PRNGKey(3),
                        jnp.zeros((1, 2), jnp.int32))["params"]
    return model, params


@pytest.fixture(scope="module")
def acoustics():
    rng = np.random.default_rng(0)
    B, T = 3, 7
    lp = jax.nn.log_softmax(
        jnp.asarray(rng.standard_normal((B, T, V)) * 2.0), -1)
    lengths = jnp.asarray([7, 5, 6], jnp.int32)
    return lp, lengths


def test_zero_scale_matches_acoustic_beam(lm, acoustics):
    _, params = lm
    lp, lengths = acoustics
    ref_labels, ref_n, ref_scores = ctc_prefix_beam(lp, lengths,
                                                    beam=4, topk=5)
    labels, n, scores = ctc_prefix_beam_lm(
        lp, lengths, params, bos_id=BOS, n_layers=N_LAYERS,
        lm_scale=0.0, beam=4, topk=5)
    np.testing.assert_array_equal(np.asarray(labels), np.asarray(ref_labels))
    np.testing.assert_allclose(np.asarray(scores), np.asarray(ref_scores),
                               rtol=1e-5, atol=1e-5)


def _host_fused_beam(lp, T_valid, lm_model, params, lm_scale, beam):
    """Brute-force shallow-fusion prefix beam for ONE utterance."""
    def lm_row(prefix):
        toks = jnp.asarray([[BOS] + list(prefix)], jnp.int32)
        logits = lm_model.apply({"params": params}, toks)
        return np.asarray(jax.nn.log_softmax(logits, -1))[0, -1]

    beams = {(): (0.0, -np.inf)}  # prefix -> (log pb, log pnb)
    rows = {(): lm_row(())}
    for t in range(T_valid):
        nxt = {}

        def add(prefix, pb, pnb):
            opb, opnb = nxt.get(prefix, (-np.inf, -np.inf))
            nxt[prefix] = (np.logaddexp(opb, pb), np.logaddexp(opnb, pnb))

        for prefix, (pb, pnb) in beams.items():
            total = np.logaddexp(pb, pnb)
            add(prefix, total + float(lp[t, 0]), -np.inf)  # blank
            if prefix:
                add(prefix, -np.inf, pnb + float(lp[t, prefix[-1]]))
            row = rows[prefix]
            for v in range(1, V):
                base = pb if (prefix and v == prefix[-1]) else total
                add(prefix + (v,), -np.inf,
                    base + float(lp[t, v]) + lm_scale * float(row[v]))
        # prune
        items = sorted(nxt.items(),
                       key=lambda kv: -np.logaddexp(*kv[1]))[:beam]
        beams = dict(items)
        for prefix in beams:
            if prefix not in rows:
                rows[prefix] = lm_row(prefix)
    return sorted(((p, np.logaddexp(*s)) for p, s in beams.items()),
                  key=lambda kv: -kv[1])


def test_matches_host_shallow_fusion(lm, acoustics):
    model, params = lm
    lp, lengths = acoustics
    lm_scale = 0.5
    beam = 8  # wide enough that device and host keep identical sets
    labels, n, scores = ctc_prefix_beam_lm(
        lp, lengths, params, bos_id=BOS, n_layers=N_LAYERS,
        lm_scale=lm_scale, beam=beam, topk=V - 1)
    labels, n = np.asarray(labels), np.asarray(n)
    scores = np.asarray(scores)
    for b in range(lp.shape[0]):
        ref = _host_fused_beam(np.asarray(lp[b]), int(lengths[b]),
                               model, params, lm_scale, beam)
        got = tuple(int(u) for u in labels[b, 0, :n[b, 0]])
        assert got == ref[0][0], (got, ref[0][0])
        assert np.isclose(-scores[b, 0], ref[0][1], atol=1e-4)


def test_lm_changes_ranking(lm, acoustics):
    """With a nonzero scale the LM must be able to flip close decisions
    somewhere in the batch (sanity that fusion is actually applied)."""
    _, params = lm
    lp, lengths = acoustics
    l0, n0, _ = ctc_prefix_beam_lm(lp, lengths, params, bos_id=BOS,
                                   n_layers=N_LAYERS, lm_scale=0.0,
                                   beam=4, topk=V - 1)
    l1, n1, s1 = ctc_prefix_beam_lm(lp, lengths, params, bos_id=BOS,
                                    n_layers=N_LAYERS, lm_scale=5.0,
                                    beam=4, topk=V - 1)
    assert np.isfinite(np.asarray(s1)).any()
    assert not np.array_equal(np.asarray(l0), np.asarray(l1))


def test_batch_recognizer_lm_fusion(lm):
    """BatchedCtcRecognizer switches to the fused beam when lm_params +
    lm_scale are configured."""
    from rasr_tpu.speech.batch_recognizer import BatchedCtcRecognizer

    class Lemma:
        def __init__(self, orth):
            self.preferred_orth = orth
            self.special = False

    class Lexicon:
        lemmas = [Lemma(w) for w in "eps a b c d".split()]

    _, params = lm
    rng = np.random.default_rng(1)

    def encode_fn(feats, lens):
        B, T = feats.shape[0], feats.shape[1]
        lp = jax.nn.log_softmax(
            jnp.asarray(rng.standard_normal((B, T, V)) * 2.0), -1)
        return lp, jnp.asarray(lens)

    rec = BatchedCtcRecognizer(encode_fn, Lexicon(), beam=4, topk=V - 1,
                               lm_params=params, lm_bos_id=BOS,
                               lm_layers=N_LAYERS, lm_scale=0.5)
    segs = [("s1", np.zeros((6, 4), np.float32), "")]
    out = rec.recognize(segs)
    assert len(out) == 1 and np.isfinite(out[0].score)
