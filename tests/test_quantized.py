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


class TestFusedInt8Kernel:
    """ops/int8_gemm_kernel.py (interpret mode on CPU): the fused
    quantize-into-GEMM kernel computes exactly what the XLA int8 path
    computes, for both static and dynamic activation scales."""

    def _ref(self, x, wq, bias, act=None):
        d = dict(wq)
        if act is not None:
            d["act_scale"] = act
        return int8_matmul(x, d, bias, jnp.float32)

    def test_dynamic_matches_xla(self):
        from rasr_tpu.ops.int8_gemm_kernel import int8_quant_matmul
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((8, 256)) * 3, jnp.float32)
        w = jnp.asarray(rng.standard_normal((256, 128)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
        wq = quantize_weight(w)
        want = np.asarray(self._ref(x, wq, b))
        got = np.asarray(int8_quant_matmul(
            x, wq["q"], wq["scale"], bias=b, act_scale=None,
            out_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_static_matches_xla(self):
        from rasr_tpu.ops.int8_gemm_kernel import int8_quant_matmul
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.standard_normal((16, 128)) * 2, jnp.float32)
        w = jnp.asarray(rng.standard_normal((128, 256)), jnp.float32)
        b = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
        wq = quantize_weight(w)
        act = float(np.abs(np.asarray(x)).max()) / 127.0
        want = np.asarray(self._ref(x, wq, b, act=act))
        got = np.asarray(int8_quant_matmul(
            x, wq["q"], wq["scale"], bias=b,
            act_scale=jnp.float32(act), out_dtype=jnp.float32,
            interpret=True))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_leading_dims_and_tiling(self):
        from rasr_tpu.ops.int8_gemm_kernel import int8_quant_matmul
        rng = np.random.default_rng(3)
        # M > tile, N > tile: exercises the grid
        x = jnp.asarray(rng.standard_normal((2, 160, 128)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((128, 640)), jnp.float32)
        wq = quantize_weight(w)
        want = np.asarray(self._ref(x, wq, None))
        got = np.asarray(int8_quant_matmul(
            x, wq["q"], wq["scale"], out_dtype=jnp.float32,
            interpret=True))
        assert got.shape == (2, 160, 640)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_unsupported_shape_falls_back(self, monkeypatch):
        from rasr_tpu.models import quantized as Q
        monkeypatch.setattr(Q, "MATMUL_IMPL", "pallas")
        rng = np.random.default_rng(4)
        # K=32 not lane-aligned -> must fall through to the XLA path
        x = jnp.asarray(rng.standard_normal((4, 32)), jnp.float32)
        w = jnp.asarray(rng.standard_normal((32, 16)), jnp.float32)
        wq = quantize_weight(w)
        got = Q.int8_matmul(x, wq, None, jnp.float32)
        monkeypatch.setattr(Q, "MATMUL_IMPL", "xla")
        want = Q.int8_matmul(x, wq, None, jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want))
