"""Second-tier Signal/Flow filters: harmonic analysis, TRAP, warping,
quantile equalization, integration, nth-order, frame synchronization,
plus Flow attribute negotiation and stream sentinels
(reference: src/Signal/Module.cc:85-172 registrations)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rasr_tpu.signal import dsp
from rasr_tpu import flow
from rasr_tpu.flow import Attributes, END_OF_STREAM, OUT_OF_DATA, Stream
from rasr_tpu.flow.nodes import Registry


rng = np.random.default_rng(7)


def test_harmonic_sum_matches_reference_formula():
    x = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    s = np.asarray(dsp.harmonic_sum(x, 24, 4))
    xn = np.asarray(x)
    ref = [sum(xn[(n * h) % 48] for h in range(1, 5)) for n in range(24)]
    np.testing.assert_allclose(s, ref, atol=1e-5)


def test_harmonic_sum_periodic_peak():
    # a periodic signal's harmonic sum peaks at lag 0 / multiples of period
    t = np.arange(64)
    x = jnp.asarray(np.cos(2 * np.pi * t / 8).astype(np.float32))
    s = np.asarray(dsp.harmonic_sum(x, 64, 8))
    assert s[0] == pytest.approx(s.max())


def test_harmonic_product_shape_and_finite():
    x = jnp.asarray(rng.standard_normal(32).astype(np.float32) + 2.0)
    p = np.asarray(dsp.harmonic_product(x, 16, 3))
    assert p.shape == (16,) and np.isfinite(p).all()


def test_temporal_pattern_dct_identity_band():
    # constant band + rectangular window -> only DCT coefficient 0 nonzero
    # (with a non-trivial window the window's own DCT leaks in, as in the
    # reference where the window is applied before the transform)
    f = jnp.ones((20, 3), jnp.float32)
    tp = np.asarray(dsp.temporal_pattern(f, 11, 4, window="rectangular")
                    ).reshape(20, 3, 4)
    assert np.abs(tp[:, :, 1:]).max() < 1e-4
    assert tp[:, :, 0].min() > 0.1


def test_quantile_equalize_identity_and_shift():
    f = jnp.asarray(rng.standard_normal((200, 5)).astype(np.float32))
    q = dsp.estimate_quantiles(np.asarray(f), 4)
    out = np.asarray(dsp.quantile_equalize(f, q, q))
    np.testing.assert_allclose(out, np.asarray(f), atol=1e-4)
    # shifting the current distribution by +2 maps back onto training
    q2 = q + 2.0
    out2 = np.asarray(dsp.quantile_equalize(f + 2.0, q, q2))
    np.testing.assert_allclose(out2, np.asarray(f), atol=1e-3)


def test_linear_warping_identity_and_stochastic():
    pos = dsp.linear_warping_positions(65, 1.0)
    W = dsp.warping_matrix(65, pos)
    np.testing.assert_allclose(W, np.eye(65), atol=1e-6)
    W2 = dsp.warping_matrix(65, dsp.linear_warping_positions(65, 1.12))
    np.testing.assert_allclose(W2.sum(-1), 1.0, atol=1e-5)
    # endpoint pinned: last output bin reads near the last input bin
    assert W2[-1, -8:].sum() > 0.99


def test_spectral_temporal_integration():
    f = jnp.asarray(rng.standard_normal((30, 16)).astype(np.float32))
    si = dsp.spectral_integration(f, length=4, shift=2, window="rectangular")
    assert si.shape == (30, 7)
    np.testing.assert_allclose(np.asarray(si)[0, 0],
                               np.asarray(f)[0, :4].sum(), atol=1e-5)
    ti = dsp.temporal_integration(f, length=5, shift=3,
                                  window="rectangular")
    np.testing.assert_allclose(np.asarray(ti)[0],
                               np.asarray(f)[:5].sum(0), atol=1e-4)


def test_nth_order_features_second_order_count():
    f = jnp.asarray(rng.standard_normal((4, 6)).astype(np.float32))
    out = dsp.nth_order_features(f, "first+second")
    assert out.shape == (4, 6 + 21)
    d2 = dsp.nth_order_features(f, "zeroth+diagonal-second")
    np.testing.assert_allclose(np.asarray(d2)[:, 1:],
                               np.asarray(f) ** 2, atol=1e-5)


def test_cross_correlation_self_peak_at_zero_lag():
    x = jnp.asarray(rng.standard_normal(64).astype(np.float32))
    r = np.asarray(dsp.cross_correlation(x, x, -4, 5,
                                         normalization="upper-bound"))
    assert r.shape == (9,)
    assert np.argmax(r) == 4 and r[4] == pytest.approx(1.0, abs=1e-5)


def test_frame_predict_and_interpolate():
    f = jnp.asarray(np.arange(10, dtype=np.float32)[:, None])
    t = jnp.arange(10, dtype=jnp.float32) * 0.01
    tt = jnp.asarray([0.0, 0.014, 0.095], jnp.float32)
    fp = np.asarray(dsp.frame_predict(f, t, tt))
    np.testing.assert_allclose(fp[:, 0], [0.0, 1.0, 9.0])
    fi = np.asarray(dsp.frame_interpolate(f, t, jnp.asarray([0.015]), 1))
    assert fi[0, 0] == pytest.approx(1.5, abs=1e-4)


# -- flow-node level --------------------------------------------------------


def _run(filter_name, stream, attrs=None, **extra_inputs):
    node = Registry[filter_name]("n", attrs or {})
    return node.apply({"": stream, **extra_inputs})[""]


def test_registered_node_names():
    for name in ["signal-harmonic-sum", "signal-harmonic-product",
                 "nn-temporal-pattern", "mrasta-filtering",
                 "signal-quantile-equalization",
                 "signal-histogram-normalization",
                 "signal-linear-warping", "signal-warping",
                 "signal-spectralintegration", "signal-temporalintegration",
                 "signal-nth-order-features", "signal-cross-correlation",
                 "signal-frame-prediction", "signal-frame-interpolation",
                 "signal-lpc", "signal-all-poles-power-spectrum"]:
        assert name in Registry, name


def test_warping_nodes_apply():
    spec = Stream(jnp.asarray(rng.standard_normal((5, 64)).astype(np.float32)),
                  sample_rate=100.0)
    out = _run("signal-linear-warping", spec, {"warping-factor": "1.1"})
    assert out.data.shape == (5, 64)
    out2 = _run("signal-warping", spec, {"warping-function": "x*0.9"})
    np.testing.assert_allclose(np.asarray(out2.data)[:, 0],
                               np.asarray(spec.data)[:, 0], atol=1e-5)


def test_lpc_and_all_poles_spectrum_on_ar_process():
    # AR(2) process: x[n] = 0.9 x[n-1] - 0.5 x[n-2] + e
    e = rng.standard_normal(4000).astype(np.float32)
    x = np.zeros_like(e)
    for n in range(2, len(e)):
        x[n] = 0.9 * x[n - 1] - 0.5 * x[n - 2] + e[n]
    s = Stream(jnp.asarray(x[None, 100:3940]), sample_rate=100.0)
    node = Registry["signal-lpc"]("lpc", {"order": "2"})
    outs = node.apply({"": s})
    a = np.asarray(outs[""].data)[0]
    # levinson alphas approximate the negated AR coefficients
    assert a[0] == pytest.approx(-0.9, abs=0.05)
    assert a[1] == pytest.approx(0.5, abs=0.05)
    spec_node = Registry["signal-all-poles-power-spectrum"]("aps",
                                                            {"size": "65"})
    spec = spec_node.apply({"": outs[""], "error": outs["error"]})[""]
    assert np.isfinite(np.asarray(spec.data)).all()


def test_frame_sync_nodes_align_to_target():
    f = Stream(jnp.asarray(np.arange(20, dtype=np.float32)[:, None]),
               sample_rate=100.0)
    target = Stream(jnp.zeros((10, 1), jnp.float32), sample_rate=50.0)
    out = _run("signal-frame-prediction", f, {}, target=target)
    assert out.data.shape[0] == 10
    np.testing.assert_allclose(np.asarray(out.data)[:, 0],
                               np.arange(0, 20, 2, dtype=np.float32))
    out2 = _run("signal-frame-interpolation", f, {}, target=target)
    assert out2.data.shape[0] == 10


# -- attributes + sentinels -------------------------------------------------


def test_attributes_merge_keeps_existing():
    a = Attributes({"datatype": "vector-f32", "sample-rate": "100"})
    b = Attributes({"sample-rate": "16000", "id": "seg1"})
    a.merge(b)
    assert a.get("sample-rate") == "100"  # merge only adds absent names
    assert a.get("id") == "seg1"


def test_pipeline_configure_propagates_and_checks():
    xml = """
    <network name="net">
      <out name="features"/>
      <param name="input-file"/>
      <node name="win" filter="signal-window"
            type="hamming" shift=".01" length=".025"/>
      <link from="net:samples" to="win"/>
      <link from="win" to="net:features"/>
    </network>"""
    net = flow.parse_network_string(xml)
    pipe = flow.FlowPipeline(net, jit=False)
    outs = pipe.configure(samples=Attributes(
        {"datatype": "vector-f32", "sample-rate": "16000"}))
    assert outs["features"].get("sample-rate") == "16000"


def test_sentinels_are_falsy_and_distinct():
    assert not END_OF_STREAM and not OUT_OF_DATA
    assert END_OF_STREAM is not OUT_OF_DATA
    assert flow.is_sentinel(END_OF_STREAM)
    assert not flow.is_sentinel(Stream(jnp.zeros(3), 1.0))


# -- peak detection + silence ----------------------------------------------


def test_peak_detection_finds_peak_with_confidence():
    from rasr_tpu.signal.analysis import peak_detection
    v = np.ones(100) * 0.1
    v[40:45] = [0.5, 1.5, 2.0, 1.5, 0.5]
    pos, val, conf = peak_detection(v, min_pos=10, max_pos=90)
    assert pos == 42 and val == pytest.approx(2.0)
    assert conf > 0.0
    # peak outside the band is ignored
    pos2, _, _ = peak_detection(v, min_pos=50, max_pos=90)
    assert pos2 != 42


def test_silence_detection_masks_quiet_runs():
    from rasr_tpu.signal.analysis import silence_detection
    e = np.concatenate([np.full(30, 1e-6), np.full(40, 1.0),
                        np.full(30, 1e-6)])
    mask = silence_detection(e, min_speech_length=5, min_silence_length=5)
    assert not mask[:25].any() and mask[35:65].all() and not mask[80:].any()
    # short silence gaps inside speech are merged into speech
    e2 = np.concatenate([np.full(40, 1.0), np.full(3, 1e-6),
                         np.full(40, 1.0)])
    m2 = silence_detection(e2, min_silence_length=10)
    assert m2.all()


def test_silence_normalization_reduces_silence_share():
    from rasr_tpu.signal.analysis import silence_normalization
    rng2 = np.random.default_rng(3)
    sr = 1000.0
    sil = rng2.standard_normal(2000).astype(np.float32) * 1e-4
    speech = rng2.standard_normal(1000).astype(np.float32)
    x = np.concatenate([sil, speech, sil])
    out = silence_normalization(x, sr, silence_fraction=0.2,
                                block_size=0.01,
                                min_surrounding_silence=0.05)
    assert len(out) < len(x)               # silence trimmed
    assert np.abs(out).max() == pytest.approx(np.abs(x).max())  # speech kept


def test_sample_normalization_node():
    x = Stream(jnp.asarray(rng.standard_normal(1600).astype(np.float32)
                           + 0.5), sample_rate=16000.0)
    out = _run("signal-sample-normalization", x)
    d = np.asarray(out.data)
    assert abs(d.mean()) < 0.02 and abs((d ** 2).mean() - 1.0) < 0.05


def test_segment_clustering_node_two_speakers():
    f = Stream(jnp.asarray(np.concatenate(
        [rng.standard_normal((150, 4)),
         8 + rng.standard_normal((150, 4))]).astype(np.float32)),
        sample_rate=100.0)
    out = _run("signal-segment-clustering", f,
               {"min-segment-length": "50"})
    labels = np.asarray(out.data)
    assert labels.shape == (300,)
    assert len(np.unique(labels)) == 2
    assert len(np.unique(labels[:150])) == 1  # one speaker per half
    assert len(np.unique(labels[150:])) == 1


def test_mean_estimator_node(tmp_path):
    f = str(tmp_path / "mean.txt")
    x = Stream(jnp.asarray(rng.standard_normal((50, 4)).astype(np.float32)
                           + 3.0), sample_rate=100.0)
    _run("signal-mean-estimator", x, {"file": f})
    mean = np.loadtxt(f)
    np.testing.assert_allclose(mean, np.asarray(x.data).mean(0), atol=1e-5)


def test_kaiser_window():
    w = dsp.window_function("kaiser", 33)
    np.testing.assert_allclose(w, np.kaiser(33, 4.86), atol=1e-12)
    w2 = dsp.window_function("kaiser:8.0", 17)
    np.testing.assert_allclose(w2, np.kaiser(17, 8.0), atol=1e-12)
    assert w.max() <= 1.0 and w[0] < 0.1
