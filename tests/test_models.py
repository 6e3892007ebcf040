"""Conformer CTC model + sharded training tests on the virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.models import ConformerCtc
from rasr_tpu.nn.training import CtcTrainer
from rasr_tpu.parallel import make_mesh


def tiny_model(vocab=32):
    return ConformerCtc(vocab_size=vocab, d_model=32, n_layers=2, n_heads=2,
                        conv_kernel=7, dtype=jnp.float32)


class TestConformer:
    def test_forward_shapes_and_lengths(self):
        model = tiny_model()
        rng = jax.random.PRNGKey(0)
        feats = jnp.zeros((2, 37, 16))
        lens = jnp.array([37, 21])
        variables = model.init(rng, feats, lens)
        logits, out_lens, mask = model.apply(variables, feats, lens)
        # x4 subsampling: ceil(ceil(37/2)/2) = 10, ceil(ceil(21/2)/2) = 6
        assert logits.shape[0] == 2 and logits.shape[2] == 32
        assert int(out_lens[0]) == 10 and int(out_lens[1]) == 6
        assert bool(mask[1, 5]) and not bool(mask[1, 6])

    def test_log_probs_normalized(self):
        model = tiny_model()
        rng = jax.random.PRNGKey(1)
        feats = jax.random.normal(rng, (1, 24, 16))
        lens = jnp.array([24])
        variables = model.init(rng, feats, lens)
        logits, _, _ = model.apply(variables, feats, lens)
        lp = jax.nn.log_softmax(logits, axis=-1)
        np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0,
                                   atol=1e-5)


class TestShardedTraining:
    def test_train_step_decreases_loss(self):
        import optax
        mesh = make_mesh(n_devices=4, data_parallel=2)
        model = tiny_model(vocab=16)
        trainer = CtcTrainer(model, mesh, optimizer=optax.adam(3e-3),
                             example_shape=(4, 32, 16))
        rng = np.random.default_rng(0)
        feats = rng.standard_normal((4, 32, 16)).astype(np.float32)
        feat_lens = np.array([32, 32, 28, 24], dtype=np.int32)
        labels = rng.integers(1, 16, size=(4, 5)).astype(np.int32)
        label_lens = np.array([5, 4, 3, 5], dtype=np.int32)
        losses = [trainer.train_step(feats, feat_lens, labels, label_lens)
                  for _ in range(8)]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_params_are_sharded(self):
        import flax
        mesh = make_mesh(n_devices=4, data_parallel=2)
        model = tiny_model(vocab=16)
        trainer = CtcTrainer(model, mesh, example_shape=(2, 16, 16))
        # find a partitioned param (mlp axis -> 'model' mesh axis)
        flat = flax.traverse_util.flatten_dict(
            jax.tree_util.tree_map(
                lambda x: x, trainer.params,
                is_leaf=lambda x: isinstance(x, flax.linen.Partitioned)))
        partitioned = [v for v in flat.values()
                       if isinstance(v, flax.linen.Partitioned)
                       and "mlp" in (v.names or ())]
        assert partitioned, "expected mlp-partitioned params"
        shard_count = len(partitioned[0].value.sharding.device_set)
        assert shard_count > 1


class TestCausalStreaming:
    def test_prefix_outputs_equal_full(self):
        """Causal encoder: outputs over a prefix equal the corresponding
        full-utterance outputs exactly -> chunked scoring is lossless."""
        import jax
        model = ConformerCtc(vocab_size=16, d_model=32, n_layers=2,
                             n_heads=2, conv_kernel=7, dropout=0.0,
                             dtype=jnp.float32, causal=True)
        rng = jax.random.PRNGKey(0)
        feats = jax.random.normal(rng, (1, 64, 8))
        lens = jnp.asarray([64])
        variables = model.init(rng, feats, lens)
        full, full_lens, _ = model.apply(variables, feats, lens)
        # prefix of 32 frames -> 8 output frames; compare overlap
        pre, pre_lens, _ = model.apply(variables, feats[:, :32],
                                       jnp.asarray([32]))
        n = int(pre_lens[0])
        np.testing.assert_allclose(np.asarray(pre[0, :n]),
                                   np.asarray(full[0, :n]),
                                   atol=2e-4)

    def test_noncausal_differs(self):
        """Sanity: the default (full-context) encoder does NOT have this
        property."""
        import jax
        model = ConformerCtc(vocab_size=16, d_model=32, n_layers=2,
                             n_heads=2, conv_kernel=7, dropout=0.0,
                             dtype=jnp.float32, causal=False)
        rng = jax.random.PRNGKey(0)
        feats = jax.random.normal(rng, (1, 64, 8))
        variables = model.init(rng, feats, jnp.asarray([64]))
        full, _, _ = model.apply(variables, feats, jnp.asarray([64]))
        pre, pre_lens, _ = model.apply(variables, feats[:, :32],
                                       jnp.asarray([32]))
        n = int(pre_lens[0])
        assert not np.allclose(np.asarray(pre[0, :n]),
                               np.asarray(full[0, :n]), atol=1e-3)
