"""Pipeline parallelism (parallel/pipeline.py): GPipe fill-drain over a
'stage' mesh axis with ppermute activation transfer — exact equivalence
with sequential layer application, and differentiability for training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.parallel.pipeline import (make_pipeline_mesh, pipeline_apply,
                                        scan_stage_fn,
                                        split_layers_into_stages,
                                        stack_stage_params)


def layer_fn(params, h):
    w, b = params["w"], params["b"]
    return jnp.tanh(h @ w + b)


def make_layers(n_layers, d, key):
    layers = []
    for i in range(n_layers):
        k1, k2, key = jax.random.split(key, 3)
        layers.append({"w": jax.random.normal(k1, (d, d)) * 0.3,
                       "b": jax.random.normal(k2, (d,)) * 0.1})
    return layers


def sequential(layers, x):
    h = x
    for p in layers:
        h = layer_fn(p, h)
    return h


@pytest.fixture(scope="module")
def mesh():
    return make_pipeline_mesh(4)


def test_pipeline_matches_sequential(mesh):
    d, B = 16, 8
    layers = make_layers(8, d, jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (B, 6, d))
    stages = split_layers_into_stages(layers, 4)
    stacked = stack_stage_params(stages)
    stage_fn = scan_stage_fn(layer_fn)
    y = pipeline_apply(mesh, stage_fn, stacked, x, n_microbatches=4)
    ref = sequential(layers, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_single_stage_per_layer(mesh):
    d, B = 8, 4
    layers = make_layers(4, d, jax.random.PRNGKey(2))
    stacked = stack_stage_params(layers)  # one layer per stage
    x = jax.random.normal(jax.random.PRNGKey(3), (B, d))
    y = pipeline_apply(mesh, layer_fn, stacked, x, n_microbatches=2)
    ref = sequential(layers, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_is_differentiable(mesh):
    d, B = 8, 8
    layers = make_layers(4, d, jax.random.PRNGKey(4))
    stacked = stack_stage_params(layers)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, d))

    def loss(stacked, x):
        y = pipeline_apply(mesh, layer_fn, stacked, x, n_microbatches=4)
        return jnp.mean(y ** 2)

    g = jax.grad(loss)(stacked, x)

    def ref_loss(stacked, x):
        layers_list = [jax.tree_util.tree_map(lambda a: a[i], stacked)
                       for i in range(4)]
        return jnp.mean(sequential(layers_list, x) ** 2)

    g_ref = jax.grad(ref_loss)(stacked, x)
    for a, b in zip(jax.tree_util.tree_leaves(g),
                    jax.tree_util.tree_leaves(g_ref)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_pipeline_rejects_bad_shapes(mesh):
    layers = make_layers(4, 8, jax.random.PRNGKey(6))
    with pytest.raises(ValueError):
        split_layers_into_stages(layers, 3)
    stacked = stack_stage_params(layers)
    x = jnp.zeros((6, 8))
    with pytest.raises(ValueError):
        pipeline_apply(mesh, layer_fn, stacked, x, n_microbatches=4)


def test_pipeline_composes_with_data_parallelism():
    """2-D (stage, data) mesh: microbatches pipeline over 'stage' while
    the intra-microbatch batch axis shards over 'data' — pipeline + dp in
    one SPMD program (ROADMAP scale-out item)."""
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from rasr_tpu.parallel.pipeline import pipeline_apply

    devices = np.asarray(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devices, ("stage", "data"))
    d, B = 8, 8
    layers = make_layers(4, d, jax.random.PRNGKey(7))
    stacked = stack_stage_params(layers)
    x = jax.random.normal(jax.random.PRNGKey(8), (B, d))
    # shard the global batch over 'data' before entering the pipeline
    x_sharded = jax.device_put(x, NamedSharding(mesh, P("data")))
    y = pipeline_apply(mesh, layer_fn, stacked, x_sharded,
                       n_microbatches=2, data_axis="data")
    ref = sequential(layers, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_3d_stage_data_model_pipeline():
    """2x2x2 (stage, data, model) mesh: one SPMD program runs pipeline,
    data, and tensor parallelism together; values and grads match a
    single-device reference (ROADMAP 3-D scale-out item)."""
    import numpy as np
    from jax.sharding import PartitionSpec as P
    from rasr_tpu.parallel.pipeline import (
        column_row_param_specs, column_row_stage_fn, make_3d_mesh,
        pipeline_apply, split_layers_into_stages, stack_stage_params)

    mesh = make_3d_mesh(2, 2, 2)
    D, F, L = 8, 16, 4
    rng = np.random.default_rng(0)
    layers = [{"w1": jnp.asarray(rng.standard_normal((D, F)), jnp.float32) * 0.3,
               "b1": jnp.asarray(rng.standard_normal((F,)), jnp.float32) * 0.1,
               "w2": jnp.asarray(rng.standard_normal((F, D)), jnp.float32) * 0.3,
               "b2": jnp.asarray(rng.standard_normal((D,)), jnp.float32) * 0.1}
              for _ in range(L)]
    stacked = stack_stage_params(split_layers_into_stages(layers, 2))
    x = jnp.asarray(rng.standard_normal((8, D)), jnp.float32)
    stage_fn = column_row_stage_fn()

    def loss3d(stacked, x):
        y = pipeline_apply(mesh, stage_fn, stacked, x, n_microbatches=4,
                           data_axis="data",
                           param_specs=column_row_param_specs())
        return jnp.mean(y ** 2), y

    (val, y), grads = jax.jit(
        jax.value_and_grad(loss3d, has_aux=True))(stacked, x)

    h = x
    for l in layers:
        h = jnp.tanh(h @ l["w1"] + l["b1"]) @ l["w2"] + l["b2"]
    np.testing.assert_allclose(np.asarray(y), np.asarray(h),
                               rtol=2e-5, atol=2e-5)

    def ref_loss(stacked):
        h = x
        for s in range(2):
            for i in range(2):
                l = {k: stacked[k][s][i] for k in stacked}
                h = jnp.tanh(h @ l["w1"] + l["b1"]) @ l["w2"] + l["b2"]
        return jnp.mean(h ** 2)

    g_ref = jax.grad(ref_loss)(stacked)
    for k in grads:
        np.testing.assert_allclose(np.asarray(grads[k]),
                                   np.asarray(g_ref[k]),
                                   rtol=2e-4, atol=2e-5)


def test_pipelined_conformer_matches_apply():
    """The flagship architecture's block stack runs as a (stage, data)
    GPipe pipeline with bit-matching outputs and flowing gradients
    (models.pipelined)."""
    import numpy as np
    from jax.sharding import Mesh
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.models.pipelined import pipelined_ctc_forward, unbox

    model = ConformerCtc(vocab_size=32, d_model=16, n_layers=4, n_heads=2,
                         dtype=jnp.float32)
    B, T, D = 8, 32, 8
    feats = np.random.default_rng(0).standard_normal(
        (B, T, D)).astype(np.float32)
    lens = np.full((B,), T, np.int32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(feats),
                           jnp.asarray(lens))
    params = unbox(variables["params"])
    ref_logits, ref_lens, _ = model.apply({"params": params}, feats, lens,
                                          deterministic=True)
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(4, 2),
                ("stage", "data"))
    logits, out_lens, _ = jax.jit(lambda p, f, l: pipelined_ctc_forward(
        model, p, f, l, mesh, n_microbatches=4, data_axis="data"))(
        params, jnp.asarray(feats), jnp.asarray(lens))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(ref_logits),
                               rtol=1e-4, atol=1e-5)
    assert np.array_equal(np.asarray(out_lens), np.asarray(ref_lens))

    def loss(p):
        lg, _, _ = pipelined_ctc_forward(model, p, jnp.asarray(feats),
                                      jnp.asarray(lens), mesh, 4,
                                      data_axis="data")
        return jnp.mean(jax.nn.logsumexp(lg, -1))

    g = jax.jit(jax.grad(loss))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    assert all(float(np.abs(np.asarray(x)).sum()) > 0 for x in leaves)


def test_pipelined_trainer_smoke():
    """PipelinedCtcTrainer runs CTC steps on a (stage, data) mesh with
    dropout + InterCTC; losses stay finite (convergence covered by the
    slow tier)."""
    import numpy as np
    import optax
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.nn.training import PipelinedCtcTrainer

    model = ConformerCtc(vocab_size=32, d_model=16, n_layers=4, n_heads=2,
                         dtype=jnp.float32, intermediate_ctc_layer=2)
    tr = PipelinedCtcTrainer(model, n_stages=4, example_shape=(8, 32, 8),
                             n_microbatches=4, optimizer=optax.adam(3e-3))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, 32, 8)).astype(np.float32)
    fl = np.full((8,), 32, np.int32)
    labels = rng.integers(1, 32, size=(8, 5)).astype(np.int32)
    ll = np.full((8,), 5, np.int32)
    losses = [tr.train_step(feats, fl, labels, ll) for _ in range(3)]
    assert all(np.isfinite(l) for l in losses)


def test_pipelined_trainer_converges():
    """25 adam steps on one batch drive the pipelined CTC loss down
    (full train loop through the (stage=4, data=2) pipeline)."""
    import numpy as np
    import optax
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.nn.training import PipelinedCtcTrainer

    model = ConformerCtc(vocab_size=32, d_model=16, n_layers=4, n_heads=2,
                         dtype=jnp.float32, intermediate_ctc_layer=2)
    tr = PipelinedCtcTrainer(model, n_stages=4, example_shape=(8, 32, 8),
                             n_microbatches=4, optimizer=optax.adam(3e-3))
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((8, 32, 8)).astype(np.float32)
    fl = np.full((8,), 32, np.int32)
    labels = rng.integers(1, 32, size=(8, 5)).astype(np.int32)
    ll = np.full((8,), 5, np.int32)
    losses = [tr.train_step(feats, fl, labels, ll) for _ in range(25)]
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.3
