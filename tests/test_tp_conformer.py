"""Tensor-parallel conformer (models/tp_conformer.py): 3-D stage x data x
model forward matches the plain flax ConformerCtc forward, and the whole
thing is differentiable for training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.models import ConformerCtc
from rasr_tpu.models.pipelined import unbox
from rasr_tpu.models.tp_conformer import (split_pointwise1, stack_tp_blocks,
                                          tp_block_apply, tp_block_specs,
                                          tp_pipelined_ctc_forward)
from rasr_tpu.parallel.pipeline import make_3d_mesh, shard_map
from jax.sharding import Mesh, PartitionSpec as P


def small_model(**kw):
    cfg = dict(vocab_size=32, d_model=16, n_layers=4, n_heads=2,
               conv_kernel=5, dtype=jnp.float32, dropout=0.0,
               intermediate_ctc_layer=2)
    cfg.update(kw)
    return ConformerCtc(**cfg)


@pytest.fixture(scope="module")
def setup():
    model = small_model()
    B, T, D = 4, 24, 8
    rng = jax.random.PRNGKey(0)
    feats = jax.random.normal(rng, (B, T, D), jnp.float32)
    lens = jnp.asarray([24, 20, 16, 24], jnp.int32)
    variables = model.init(jax.random.PRNGKey(1), feats, lens,
                           mutable=["params", "intermediates"])
    params = unbox(variables["params"])
    ref_logits, ref_lens, _ = model.apply({"params": params}, feats, lens,
                                          deterministic=True)
    return model, params, feats, lens, ref_logits, ref_lens


def test_tp_block_matches_flax_block(setup):
    """One block, pure model parallelism (mp=2, no pipeline)."""
    from rasr_tpu.models.conformer import ConformerBlock, plain_params
    model, params, *_ = setup
    blk_params = unbox(params["encoder"]["block0"])
    B, T, D = 2, 12, model.d_model
    x = jax.random.normal(jax.random.PRNGKey(2), (B, T, D), jnp.float32)
    mask = jnp.asarray(np.tile([True] * 10 + [False] * 2, (B, 1)))

    block = ConformerBlock(model.d_model, model.n_heads, model.conv_kernel,
                           0.0, jnp.float32, False)
    with plain_params():
        ref = block.apply({"params": blk_params}, x, mask, True)

    tp_params = split_pointwise1(blk_params)
    mesh = Mesh(np.asarray(jax.devices()[:2]), ("model",))
    # strip the (L,) layer axis from the stage specs for a single block
    specs = jax.tree_util.tree_map(
        lambda s: P(*s[1:]), tp_block_specs("model"),
        is_leaf=lambda v: isinstance(v, P))

    def body(p, x, mask):
        return tp_block_apply(p, x, mask, dtype=jnp.float32,
                              d_model=model.d_model, n_heads=model.n_heads,
                              model_axis="model")

    out = shard_map(body, mesh=mesh, in_specs=(specs, P(), P()),
                    out_specs=P(), check_rep=False)(tp_params, x, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_3d_forward_matches_plain(setup):
    """Full forward on a (stage=2, data=2, model=2) mesh == model.apply."""
    model, params, feats, lens, ref_logits, ref_lens = setup
    mesh = make_3d_mesh(2, 2, 2)
    logits, out_lens, inter = tp_pipelined_ctc_forward(
        model, params, feats, lens, mesh, n_microbatches=2)
    assert inter is not None
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-4)


def test_3d_forward_is_differentiable(setup):
    model, params, feats, lens, *_ = setup
    mesh = make_3d_mesh(2, 2, 2)
    stacked = stack_tp_blocks(params, model.n_layers, 2)

    def loss(stacked):
        logits, _, _ = tp_pipelined_ctc_forward(
            model, params, feats, lens, mesh, n_microbatches=2,
            stacked_blocks=stacked)
        return jnp.mean(logits ** 2)

    val, grads = jax.jit(jax.value_and_grad(loss))(stacked)
    assert np.isfinite(float(val))
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    # every weight leaf receives signal
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in leaves)
    assert nonzero >= len(leaves) - 2  # inter head may be unused in loss


def test_3d_dropout_runs_and_differs(setup):
    model_d = small_model(dropout=0.3)
    _, params, feats, lens, *_ = setup
    mesh = make_3d_mesh(2, 2, 2)
    l1, _, _ = tp_pipelined_ctc_forward(
        model_d, params, feats, lens, mesh, n_microbatches=2,
        dropout_rng=jax.random.PRNGKey(7))
    l2, _, _ = tp_pipelined_ctc_forward(
        model_d, params, feats, lens, mesh, n_microbatches=2,
        dropout_rng=jax.random.PRNGKey(8))
    assert np.isfinite(np.asarray(l1)).all()
    assert not np.allclose(np.asarray(l1), np.asarray(l2))


def test_3d_trainer_smoke_and_converges():
    """PipelinedCtcTrainer with model_parallel=2 runs on a
    (stage=2, data=2, model=2) mesh and the loss goes down."""
    import optax
    from rasr_tpu.nn.training import PipelinedCtcTrainer

    model = small_model(dropout=0.1)
    tr = PipelinedCtcTrainer(model, n_stages=2, example_shape=(8, 32, 8),
                             n_microbatches=4, optimizer=optax.adam(3e-3),
                             model_parallel=2)
    assert dict(tr.mesh.shape) == {"stage": 2, "data": 2, "model": 2}
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, 32, 8)).astype(np.float32)
    fl = np.full((8,), 32, np.int32)
    labels = rng.integers(1, 32, size=(8, 5)).astype(np.int32)
    ll = np.full((8,), 5, np.int32)
    losses = [tr.train_step(feats, fl, labels, ll) for _ in range(20)]
    assert all(np.isfinite(l) for l in losses)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.2


def test_3d_trainer_from_config(tmp_path):
    """nn-trainer tool config drives the full 3-D path:
    trainer.pipeline-stages=2 + trainer.model-parallel=2 on 8 devices."""
    import textwrap
    from rasr_tpu.speech.feature_cache import FeatureCacheWriter
    from rasr_tpu.tools.nn_trainer import main as nn_main

    rng = np.random.default_rng(3)
    vocab = tmp_path / "labels.txt"
    vocab.write_text("<blank>\nA\nB\nC\n")
    lines = ['<corpus name="c">', '<recording name="r" audio="x.wav">']
    with FeatureCacheWriter(str(tmp_path / "f.cache")) as cache:
        for i in range(4):
            feats = rng.standard_normal((40, 8)).astype(np.float32)
            cache.write(f"c/r/s{i}", feats)
            orth = ["A B", "B C", "A C", "C"][i]
            lines.append(f'<segment name="s{i}" start="{i}" end="{i + 1}">'
                         f'<orth>{orth}</orth></segment>')
    lines += ["</recording>", "</corpus>"]
    (tmp_path / "corpus.xml").write_text("\n".join(lines))
    cfg = tmp_path / "t.config"
    cfg.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/corpus.xml
        [*.lexicon]
        file = vocab-text:{vocab}
        [*.feature-cache]
        path = {tmp_path}/f.cache
        [*.model]
        d-model = 16
        n-layers = 2
        n-heads = 2
        dtype = float32
        [*.trainer]
        pipeline-stages = 2
        model-parallel = 2
        microbatches = 2
        batch-size = 4
        epochs = 1
        learning-rate = 0.001
        warmup-steps = 10
        checkpoint = {tmp_path}/model.msgpack
    """))
    status = nn_main([f"--config={cfg}", "--*.action=supervised-training"])
    assert status == 0
    assert (tmp_path / "model.msgpack").exists()
