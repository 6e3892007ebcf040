"""PLP pipeline and VTLN warping tests: the reference plp.flow network
compiled end-to-end, component golden checks (Levinson, LPC cepstrum,
bark/trapeze filterbank, equal-loudness), analytic function declarations."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.flow import FlowPipeline, parse_network_string
from rasr_tpu.math.analytic import (AnalyticFunctionFactory, BarkWarping,
                                    EqualLoudnessPreemphasis, MelWarping,
                                    PiecewiseLinear2)
from rasr_tpu.signal.dsp import (ar_to_cepstrum, filterbank_matrix, levinson,
                                 plp_cepstrum)

# the reference plp.flow (same topology/parameters,
# src/Tools/FeatureExtraction/share/plp.flow)
PLP_FLOW = textwrap.dedent("""\
    <network name="plp">
      <in name="samples"/>
      <out name="features"/>
      <param name="nr-autocorrelation-coefficients"/>
      <param name="nr-cepstrum-coefficients"/>
      <node name="window" filter="signal-window"
            type="hamming" shift=".01" length="0.02"/>
      <link from="plp:samples" to="window"/>
      <node name="fft" filter="signal-real-fast-fourier-transform"
            maximum-input-size="0.02"/>
      <link from="window" to="fft"/>
      <node name="amp" filter="signal-vector-alternating-complex-f32-amplitude"/>
      <link from="fft" to="amp"/>
      <node name="power-spectrum" filter="generic-vector-f32-power" value="2"/>
      <link from="amp" to="power-spectrum"/>
      <node name="filterbank" filter="signal-filterbank"
            type="trapeze" filter-width="3.8" spacing="0.93853"
            boundary="include-boundary" warping-function="bark"/>
      <link from="power-spectrum" to="filterbank"/>
      <node name="split" filter="generic-vector-f32-split"/>
      <link from="filterbank" to="split"/>
      <node name="rsplit" filter="generic-vector-f32-split" reverse="true"/>
      <link from="filterbank" to="rsplit"/>
      <node name="copy-first-last" filter="generic-vector-f32-concat"/>
      <link from="split:0" to="copy-first-last:first"/>
      <link from="filterbank" to="copy-first-last:middle"/>
      <link from="rsplit:0" to="copy-first-last:last"/>
      <node name="equal-loudness" filter="signal-vector-f32-continuous-transform"
            f="nest(nest(disc-to-cont, invert(bark)), equal-loudness-preemphasis)"
            operation="multiplies"/>
      <link from="copy-first-last" to="equal-loudness"/>
      <node name="intensity-loudness" filter="generic-vector-f32-power"
            value="0.33"/>
      <link from="equal-loudness" to="intensity-loudness"/>
      <node name="autocorrelation" filter="signal-cosine-transform"
            nr-outputs="$(nr-autocorrelation-coefficients)"
            input-type="N-plus-one" normalize="true"/>
      <link from="intensity-loudness" to="autocorrelation"/>
      <node name="autoregression" filter="signal-autocorrelation-to-autoregression"/>
      <link from="autocorrelation" to="autoregression"/>
      <node name="cepstrum" filter="signal-autoregression-to-cepstrum"
            nr-outputs="$(nr-cepstrum-coefficients)"/>
      <link from="autoregression" to="cepstrum"/>
      <link from="cepstrum" to="plp:features"/>
    </network>
""")


class TestAnalyticFunctions:
    def test_bark(self):
        b = BarkWarping()
        np.testing.assert_allclose(b.value(8000.0), 6 * np.arcsinh(8000 / 600),
                                   rtol=1e-12)
        f = b.invert().value(b.value(1234.5))
        np.testing.assert_allclose(f, 1234.5, rtol=1e-10)

    def test_declaration_parser(self):
        # declaration semantics: nest(g, f)(x) = f(g(x)); after a filterbank
        # the stream rate is 1/spacing so disc-to-cont scales by spacing
        spacing = 0.93853
        factory = AnalyticFunctionFactory(sample_rate=1.0 / spacing)
        fn = factory.create(
            "nest(nest(disc-to-cont, invert(bark)), equal-loudness-preemphasis)")
        x = fn.value(np.asarray([10.0]))
        manual = EqualLoudnessPreemphasis().value(
            BarkWarping().invert().value(10.0 * spacing))
        np.testing.assert_allclose(x[0], manual, rtol=1e-10)

    def test_vtln_declaration(self):
        factory = AnalyticFunctionFactory(max_argument=8000.0)
        # reference VTLN declaration: inner linear-2 warp, then mel
        fn = factory.create("nest(linear-2(1.2, 0.875), mel)")
        # below the knee the axis stretches by 1.2 before mel
        np.testing.assert_allclose(fn.value(1000.0),
                                   MelWarping().value(1200.0), rtol=1e-12)
        # endpoint maps to itself
        np.testing.assert_allclose(fn.value(8000.0),
                                   MelWarping().value(8000.0), rtol=1e-12)


class TestLevinson:
    def test_recovers_ar_process(self):
        """Autocorrelation of a known AR(2) process recovers coefficients."""
        rng = np.random.default_rng(0)
        a_true = np.array([-0.6, 0.2])  # x[n] = 0.6 x[n-1] - 0.2 x[n-2] + e
        n = 200000
        x = np.zeros(n)
        e = rng.standard_normal(n)
        for t in range(2, n):
            x[t] = -a_true[0] * x[t - 1] - a_true[1] * x[t - 2] + e[t]
        r = np.array([np.dot(x[: n - k], x[k:]) / n for k in range(3)])
        a, gain = levinson(r[None, :])
        np.testing.assert_allclose(np.asarray(a)[0], a_true, atol=0.02)
        np.testing.assert_allclose(float(gain[0]), 1.0, atol=0.02)

    def test_cepstrum_recursion(self):
        # hand-check c2 for p=2: c2 = -(2 a1 + c1 a0)/2
        a = np.array([[0.5, 0.25]])
        gain = np.array([2.0])
        c = np.asarray(ar_to_cepstrum(gain, a, 3))
        assert abs(c[0, 0] - 2 * np.log(2.0)) < 1e-5
        assert abs(c[0, 1] - (-0.5)) < 1e-6
        expected_c2 = -(2 * 0.25 + c[0, 1] * 0.5) / 2
        assert abs(c[0, 2] - expected_c2) < 1e-6


class TestBarkFilterbank:
    def test_include_boundary_structure(self):
        # plp.flow: 8kHz -> 19.7089 bark, spacing 0.93853, width 3.8
        fb = filterbank_matrix(129, 8000.0 / 256.0, filter_width=3.8,
                               spacing=0.93853, boundary="include-boundary",
                               warping="bark", filter_type="trapeze")
        # nFilters = ceil((maxbark - (1-2.5/3.8)*3.8)/spacing) = ceil(19.62/0.9385)
        max_bark = 6 * np.arcsinh((128 * 8000 / 256) / 600)
        expected = int(np.ceil((max_bark - (1 - 2.5 / 3.8) * 3.8) / 0.93853))
        assert fb.shape[0] == expected
        assert np.all(fb >= 0)


class TestPlpPipeline:
    def test_flow_compiles_and_runs(self):
        rng = np.random.default_rng(1)
        sig = (rng.standard_normal(8000) * 1000).astype(np.float32)
        net = parse_network_string(PLP_FLOW)
        pipe = FlowPipeline(net, params={
            "nr-autocorrelation-coefficients": "14",
            "nr-cepstrum-coefficients": "13"})
        out = pipe(samples=sig, sample_rate=16000.0)
        feats = np.asarray(out["features"].data)
        T = feats.shape[0]
        assert feats.shape == (T, 13)
        assert np.isfinite(feats).all()

    def test_matches_reference_tail(self):
        """The flow tail (filterbank onward) matches the standalone
        plp_cepstrum helper."""
        rng = np.random.default_rng(2)
        sig = (rng.standard_normal(8000) * 1000).astype(np.float32)
        net = parse_network_string(PLP_FLOW)
        pipe = FlowPipeline(net, params={
            "nr-autocorrelation-coefficients": "14",
            "nr-cepstrum-coefficients": "13"})
        out = pipe(samples=sig, sample_rate=16000.0)
        feats = np.asarray(out["features"].data)

        # independent: window/fft/power/filterbank via dsp, then plp_cepstrum
        from rasr_tpu.signal import dsp
        x = sig.astype(np.float64)
        length, shift = 320, 160
        T = dsp.n_frames(8000, length, shift)
        frames = np.zeros((T, length))
        for i in range(T):
            c = x[i * shift:i * shift + length]
            frames[i, :len(c)] = c
        frames *= dsp.window_function("hamming", length)
        spec = np.abs(np.fft.rfft(frames, n=512, axis=-1)) / 16000.0
        power = spec ** 2
        fb = dsp.filterbank_matrix(257, 16000.0 / 512.0, filter_width=3.8,
                                   spacing=0.93853,
                                   boundary="include-boundary",
                                   warping="bark", filter_type="trapeze")
        filt = power @ fb.T
        expected = dsp.plp_cepstrum(filt, 14, 13, spacing=0.93853)
        np.testing.assert_allclose(feats, expected, atol=2e-3, rtol=1e-3)


class TestGammatone:
    def test_matrix_properties(self):
        from rasr_tpu.signal.dsp import erb_scale, gammatone_matrix
        gm = gammatone_matrix(257, 16000.0 / 512.0, n_filters=40)
        assert gm.shape == (40, 257)
        # every filter normalized; peaks monotonically increasing in freq
        np.testing.assert_allclose(gm.sum(1), 1.0, atol=1e-9)
        peaks = gm.argmax(1)
        assert (np.diff(peaks) >= 0).all()

    def test_flow_node(self):
        from rasr_tpu.flow import FlowPipeline, parse_network_string
        net = parse_network_string(textwrap.dedent("""\
            <network name="gt">
              <in name="samples"/>
              <out name="features"/>
              <node name="window" filter="signal-window" type="hamming"
                    shift=".01" length="0.025"/>
              <link from="gt:samples" to="window"/>
              <node name="fft" filter="signal-real-fast-fourier-transform"
                    maximum-input-size="0.025"/>
              <link from="window" to="fft"/>
              <node name="amp" filter="signal-vector-alternating-complex-f32-amplitude"/>
              <link from="fft" to="amp"/>
              <node name="gammatone" filter="signal-gammatone" nr-filters="40"/>
              <link from="amp" to="gammatone"/>
              <link from="gammatone" to="gt:features"/>
            </network>
        """))
        rng = np.random.default_rng(0)
        sig = (rng.standard_normal(4000) * 100).astype(np.float32)
        out = FlowPipeline(net)(samples=sig, sample_rate=16000.0)
        feats = np.asarray(out["features"].data)
        assert feats.shape[1] == 40
        assert np.isfinite(feats).all() and (feats >= 0).all()
