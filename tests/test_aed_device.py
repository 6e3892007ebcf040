"""Device-side AED label-sync beam (search/aed_device.py).

The device beam must reproduce the host CachedAedDecoder exactly: same
candidate generation (top-beam tokens per live hypothesis + stays for
finished ones), same length-normalized ranking, same EOS handling — the
only difference is that the whole loop runs in one device program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.models.aed import AedModel
from rasr_tpu.search.aed_cached import CachedAedDecoder
from rasr_tpu.search.aed_device import make_aed_beam

VOCAB, D = 8, 10


@pytest.fixture(scope="module")
def toy():
    model = AedModel(vocab_size=VOCAB, d_model=16, encoder_layers=1,
                     decoder_layers=1, n_heads=2, dropout=0.0,
                     dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, D)),
                        jnp.asarray([16]),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    return model, params


class TestDeviceVsHost:
    def test_same_results(self, toy):
        model, params = toy
        for seed in range(3):
            feats = np.asarray(jax.random.normal(
                jax.random.PRNGKey(seed), (24, D)))
            dev = CachedAedDecoder(model, params, beam_size=4,
                                   max_labels=12, device_beam=True)
            host = CachedAedDecoder(model, params, beam_size=4,
                                    max_labels=12, device_beam=False)
            got = dev.decode(feats, 24, feat_bucket=24)
            want = host.decode(feats, 24, feat_bucket=24)
            assert got[0].labels == want[0].labels, f"seed {seed}"
            assert got[0].score == pytest.approx(want[0].score,
                                                 abs=1e-2), f"seed {seed}"

    def test_nbest_sorted_and_finite(self, toy):
        model, params = toy
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(9),
                                             (24, D)))
        dec = CachedAedDecoder(model, params, beam_size=4, max_labels=12)
        res = dec.decode(feats, 24, feat_bucket=24)
        assert 1 <= len(res) <= 4
        norm = [r.score / max(len(r.labels), 1) for r in res]
        assert norm == sorted(norm)

    def test_segment_api(self, toy):
        model, params = toy
        dec = CachedAedDecoder(model, params, beam_size=4, max_labels=12)
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(2),
                                             (24, D)))
        dec.enter_segment()
        dec.put_features(feats)
        dec.finish_segment()
        direct = dec.decode(feats, feats.shape[0])
        assert dec.get_current_best_labels() == direct[0].labels
        assert dec.n_best(2)[0].labels == direct[0].labels


class TestBatchedDeviceBeam:
    def test_batch_matches_single(self, toy):
        """Batched decoding must equal per-utterance decoding (padding
        rows of other utterances cannot leak)."""
        model, params = toy
        search = make_aed_beam(model, beam=4, max_labels=12)
        encode = jax.jit(lambda p, f, l: model.apply(
            {"params": p}, f, l, method=model.encode))
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(4),
                                             (3, 24, D)))
        lens = jnp.asarray([24, 16, 20], jnp.int32)
        enc, mask = encode(params, jnp.asarray(feats), lens)
        lab_b, n_b, sc_b = jax.tree_util.tree_map(
            np.asarray, search(params, enc, mask))
        for i in range(3):
            enc1, mask1 = encode(params, jnp.asarray(feats[i:i + 1]),
                                 lens[i:i + 1])
            lab1, n1, sc1 = jax.tree_util.tree_map(
                np.asarray, search(params, enc1, mask1))
            assert n1[0, 0] == n_b[i, 0], f"utt {i}"
            np.testing.assert_array_equal(
                lab1[0, 0, :n1[0, 0]], lab_b[i, 0, :n_b[i, 0]])
            assert sc1[0, 0] == pytest.approx(sc_b[i, 0], abs=1e-2)


class TestLmFusion:
    def test_fused_beam_prefers_lm_sequence(self, toy):
        """Shallow fusion: with a unit LM trained hard on one token
        sequence, a large lm-scale must pull the beam onto it, and the
        fused run must differ from the unfused one in score by the LM
        component."""
        import optax
        from rasr_tpu.lm.neural import LstmLmModel
        model, params = toy
        lm = LstmLmModel(vocab_size=VOCAB, embed_dim=8, hidden_dim=16)
        seq = [0, 3, 5, 3, 5, 3]        # BOS then the preferred units
        toks = jnp.asarray([seq], jnp.int32)
        lm_params = lm.init(jax.random.PRNGKey(1), toks)["params"]
        opt = optax.adam(1e-2)
        ostate = opt.init(lm_params)

        @jax.jit
        def step(p, o):
            def loss(p):
                lp = jax.nn.log_softmax(
                    lm.apply({"params": p}, toks[:, :-1]), -1)
                return -jnp.mean(jnp.take_along_axis(
                    lp, toks[:, 1:, None], -1))
            l, g = jax.value_and_grad(loss)(p)
            up, o = opt.update(g, o)
            return optax.apply_updates(p, up), o

        for _ in range(300):
            lm_params, ostate = step(lm_params, ostate)

        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(3),
                                             (1, 24, D)))
        lens = np.asarray([24], np.int32)
        plain = CachedAedDecoder(model, params, beam_size=4,
                                 max_labels=8)
        fused = CachedAedDecoder(model, params, beam_size=4,
                                 max_labels=8, lm_model=lm,
                                 lm_params=lm_params, lm_scale=20.0)
        # EOS stays unfused by design, so compare the best NON-EMPTY
        # hypotheses: the heavily scaled LM must force its alternating
        # units onto every surviving continuation
        fused_nb = fused.recognize_batch(feats, lens, n_best=4)[0]
        cont = [r.labels for r in fused_nb if r.labels]
        assert cont, fused_nb
        assert cont[0][:3] == [3, 5, 3], cont
        plain_nb = plain.recognize_batch(feats, lens, n_best=4)[0]
        plain_cont = [r.labels for r in plain_nb if r.labels]
        assert plain_cont != cont  # random AED alone does not produce them

    def test_zero_scale_matches_unfused(self, toy):
        import optax  # noqa: F401
        from rasr_tpu.lm.neural import LstmLmModel
        model, params = toy
        lm = LstmLmModel(vocab_size=VOCAB, embed_dim=8, hidden_dim=16)
        lm_params = lm.init(jax.random.PRNGKey(1),
                            jnp.zeros((1, 3), jnp.int32))["params"]
        feats = np.asarray(jax.random.normal(jax.random.PRNGKey(4),
                                             (2, 24, D)))
        lens = np.asarray([24, 20], np.int32)
        plain = CachedAedDecoder(model, params, beam_size=4,
                                 max_labels=8)
        zero = CachedAedDecoder(model, params, beam_size=4,
                                max_labels=8, lm_model=lm,
                                lm_params=lm_params, lm_scale=0.0)
        a = plain.recognize_batch(feats, lens)
        b = zero.recognize_batch(feats, lens)
        for ra, rb in zip(a, b):
            assert ra[0].labels == rb[0].labels
