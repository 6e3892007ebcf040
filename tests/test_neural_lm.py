"""Neural LM + checkpoint tests: batched cached scoring consistency,
training a tiny LSTM LM to prefer seen bigrams, checkpoint round trip."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.lm.neural import LstmLmModel, NeuralLanguageModel
from rasr_tpu.nn.checkpoint import load_params, save_params

VOCAB = ["<s>", "</s>", "<unk>", "a", "b", "c"]


@pytest.fixture(scope="module")
def lm():
    model = LstmLmModel(vocab_size=len(VOCAB), embed_dim=16, hidden_dim=32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 3), jnp.int32))["params"]
    return NeuralLanguageModel(model, params, VOCAB)


class TestNeuralLm:
    def test_scores_are_distribution(self, lm):
        h = lm.initial_history()
        total = sum(np.exp(-lm.score(h, t)) for t in VOCAB)
        assert abs(total - 1.0) < 1e-4

    def test_cache_consistency(self, lm):
        h = lm.initial_history()
        s1 = lm.score(h, "a")
        s2 = lm.score(h, "a")
        assert s1 == s2
        assert len(lm._cache) >= 1

    def test_batch_matches_single(self, lm):
        h1 = lm.initial_history()
        h2 = lm.extended_history(h1, "a")
        m = lm.score_batch([h1, h2], ["a", "b"])
        assert abs(m[0, 0] - lm.score(h1, "a")) < 1e-6
        assert abs(m[1, 1] - lm.score(h2, "b")) < 1e-6

    def test_cleanup(self, lm):
        h = lm.initial_history()
        lm.score(h, "a")
        lm.cleanup_cache(keep=[])
        assert len(lm._cache) == 0

    def test_trained_lm_prefers_pattern(self):
        """Train on 'a b c' repeated; p(b|<s> a) must beat p(c|<s> a)."""
        model = LstmLmModel(vocab_size=len(VOCAB), embed_dim=16, hidden_dim=32)
        seq = [0, 3, 4, 5, 1]  # <s> a b c </s>
        tokens = jnp.asarray([seq[:-1]], jnp.int32)
        targets = jnp.asarray([seq[1:]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), tokens)["params"]
        opt = optax.adam(1e-2)
        opt_state = opt.init(params)

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                logits = model.apply({"params": p}, tokens)
                lp = jax.nn.log_softmax(logits, -1)
                return -jnp.mean(jnp.take_along_axis(
                    lp, targets[..., None], axis=-1))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), opt_state, loss

        for _ in range(150):
            params, opt_state, loss = step(params, opt_state)
        lm = NeuralLanguageModel(model, params, VOCAB)
        h = lm.extended_history(lm.initial_history(), "a")
        assert lm.score(h, "b") < lm.score(h, "c")
        # sequence scoring: the trained pattern scores better than a shuffle
        assert (lm.sequence_score(["a", "b", "c"])
                < lm.sequence_score(["c", "b", "a"]))


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, lm):
        p = str(tmp_path / "lm.msgpack")
        save_params(p, lm.params, step=7)
        template = jax.tree_util.tree_map(jnp.zeros_like, lm.params)
        restored, step = load_params(p, template)
        assert step == 7
        leaves_a = jax.tree_util.tree_leaves(lm.params)
        leaves_b = jax.tree_util.tree_leaves(restored)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_partitioned_roundtrip(self, tmp_path):
        """Params with flax Partitioned metadata survive save/load."""
        import flax.linen as fnn
        from rasr_tpu.models import ConformerCtc
        model = ConformerCtc(vocab_size=8, d_model=16, n_layers=1, n_heads=2,
                             dtype=jnp.float32)
        feats = jnp.zeros((1, 16, 8))
        lens = jnp.asarray([16])
        params = model.init(jax.random.PRNGKey(0), feats, lens)["params"]
        p = str(tmp_path / "model.msgpack")
        save_params(p, params)
        restored, _ = load_params(p, params)
        import flax
        flat = flax.traverse_util.flatten_dict(
            restored, is_leaf=lambda k, v: isinstance(v, flax.linen.Partitioned))
        assert any(isinstance(v, flax.linen.Partitioned)
                   for v in flat.values())
