"""int8-quantized conformer inference (models/quantized.py): quantized
logits track the float forward and preserve the greedy decision path."""

import jax
import jax.numpy as jnp
import numpy as np

from rasr_tpu.models import ConformerCtc
from rasr_tpu.models.pipelined import unbox
from rasr_tpu.models.quantized import (int8_matmul, quantize_params,
                                       quantize_weight,
                                       quantized_ctc_forward)


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 7, 32)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    ref = x @ w + b
    got = int8_matmul(x, quantize_weight(w), b, jnp.float32)
    err = np.abs(np.asarray(got - ref))
    scale = np.abs(np.asarray(ref)).max()
    assert err.max() / scale < 0.02  # ~1% of dynamic range


def test_static_activation_scales_roundtrip():
    """calibrate -> apply -> jitted forward with static scales tracks the
    dynamic-scale forward (same trade bench.py's WER gate verifies)."""
    from rasr_tpu.models.quantized import calibrate_activation_scales

    model = ConformerCtc(vocab_size=32, d_model=16, n_layers=2, n_heads=2,
                         conv_kernel=5, dtype=jnp.float32)
    B, T, D = 2, 24, 8
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    lens = jnp.asarray([24, 18], jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(1), feats, lens)["params"])

    qp_cal = quantize_params(params, model.n_layers, keep_names=True)
    scales = calibrate_activation_scales(model, qp_cal, feats, lens)
    assert len(scales) == 2 * 11 + 1  # 11 projections/block + ctc head
    assert all(v > 0 for v in scales.values())

    qp_dyn = quantize_params(params, model.n_layers)
    qp_stat = quantize_params(params, model.n_layers, act_scales=scales)
    fwd = jax.jit(lambda qp, f, l: quantized_ctc_forward(model, qp, f, l))
    dyn_logits, _ = fwd(qp_dyn, feats, lens)
    stat_logits, _ = fwd(qp_stat, feats, lens)
    dyn, stat = np.asarray(dyn_logits), np.asarray(stat_logits)
    assert np.abs(stat - dyn).max() / np.abs(dyn).max() < 0.1
    agree = (stat.argmax(-1) == dyn.argmax(-1)).mean()
    assert agree > 0.9


def test_quantized_forward_tracks_float():
    model = ConformerCtc(vocab_size=32, d_model=16, n_layers=2, n_heads=2,
                         conv_kernel=5, dtype=jnp.float32)
    B, T, D = 3, 24, 8
    feats = jax.random.normal(jax.random.PRNGKey(0), (B, T, D))
    lens = jnp.asarray([24, 18, 24], jnp.int32)
    params = unbox(model.init(jax.random.PRNGKey(1), feats, lens)["params"])
    ref_logits, ref_lens, _ = model.apply({"params": params}, feats, lens,
                                          deterministic=True)
    qp = quantize_params(params, model.n_layers)
    logits, out_lens = jax.jit(
        lambda qp, f, l: quantized_ctc_forward(model, qp, f, l))(
            qp, feats, lens)
    np.testing.assert_array_equal(np.asarray(out_lens), np.asarray(ref_lens))
    ref, got = np.asarray(ref_logits), np.asarray(logits)
    # logits track within a few percent of the dynamic range...
    assert np.abs(got - ref).max() / np.abs(ref).max() < 0.1
    # ...and the greedy path mostly survives even on RANDOM weights
    # (near-uniform logits, so argmax is maximally fragile here; the
    # trained-model gate is bench.py's WER check)
    agree = (got.argmax(-1) == ref.argmax(-1)).mean()
    assert agree > 0.8
