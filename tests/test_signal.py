"""Golden-value tests for the signal DSP layer.

Each expected value is computed by an independent float64 numpy
implementation of the reference C++ formulas (cited per test), then compared
against the fused JAX pipeline within the BASELINE 1e-4 tolerance.
"""

import math

import numpy as np
import pytest

from rasr_tpu.signal.dsp import (MfccPipeline, apply_matrix, apply_window,
                                 dct_matrix, fft_length_for, filterbank_matrix,
                                 frame_signal, log10, mel_warp, n_frames,
                                 normalize_segment, preemphasis,
                                 regression_delta, regression_deltadelta,
                                 rfft_amplitude, sliding_normalization,
                                 window_function)


def rng():
    return np.random.default_rng(1234)


class TestWindow:
    def test_hamming_symmetric(self):
        # src/Signal/WindowFunction.cc:92 — w[n] = .54-.46 cos(2 pi n/M), M=len-1
        w = window_function("hamming", 400)
        M = 399
        expected = 0.54 - 0.46 * np.cos(2 * np.pi * np.arange(400) / M)
        np.testing.assert_allclose(w, expected, rtol=0, atol=1e-12)
        np.testing.assert_allclose(w, w[::-1], atol=1e-12)

    def test_frame_count_rule(self):
        # src/Signal/WindowBuffer.cc get()/flush(): frame at each shift pos p
        # while N-p > length, plus one final frame
        assert n_frames(400, 400, 160) == 1
        assert n_frames(560, 400, 160) == 2
        assert n_frames(561, 400, 160) == 3
        assert n_frames(160, 400, 160) == 1
        assert n_frames(0, 400, 160) == 0
        assert n_frames(16000, 400, 160) == 99  # 1s at 16kHz

    def test_framing_values(self):
        x = np.arange(1000, dtype=np.float32)
        T = n_frames(1000, 400, 160)
        frames = np.asarray(frame_signal(x, 400, 160, T))
        assert frames.shape == (T, 400)
        np.testing.assert_array_equal(frames[1, :5], np.arange(160, 165))
        # final frame zero-padded past sample 999
        last_start = (T - 1) * 160
        valid = 1000 - last_start
        np.testing.assert_array_equal(frames[-1, valid:], 0.0)


class TestPreemphasis:
    def test_alpha_one(self):
        # src/Signal/Preemphasis.cc: previous_ initialized to x[0]
        x = np.array([3.0, 5.0, 2.0, 2.0], dtype=np.float32)
        y = np.asarray(preemphasis(x, 1.0))
        np.testing.assert_allclose(y, [0.0, 2.0, -3.0, 0.0], atol=1e-7)

    def test_alpha_custom(self):
        x = rng().standard_normal(100).astype(np.float32)
        y = np.asarray(preemphasis(x, 0.97))
        expected = x.copy()
        expected[0] = x[0] - 0.97 * x[0]
        expected[1:] = x[1:] - 0.97 * x[:-1]
        np.testing.assert_allclose(y, expected, atol=1e-6)


class TestFft:
    def test_fft_length(self):
        # src/Signal/FastFourierTransform.cc setLength: next pow2
        assert fft_length_for(400) == 512
        assert fft_length_for(512) == 512
        assert fft_length_for(513) == 1024

    def test_amplitude_scaling(self):
        # apply-scale=true multiplies by 1/sample-rate (estimateContinuous)
        x = rng().standard_normal((3, 400)).astype(np.float32)
        amp = np.asarray(rfft_amplitude(x, 512, 1.0 / 16000.0))
        expected = np.abs(np.fft.rfft(np.pad(x, ((0, 0), (0, 112))), axis=-1)) / 16000.0
        assert amp.shape == (3, 257)
        np.testing.assert_allclose(amp, expected, rtol=1e-4, atol=1e-9)


class TestFilterbank:
    def test_mel_16k_structure(self):
        # mfcc.flow: filter-width=268.258, stretch-to-cover, mel warping.
        # maxF = mel(8000 Hz) = 2840.0377; spacing=134.129
        # nFilters = floor((2840.04-268.258)/134.129 + 1) = 20
        fb = filterbank_matrix(257, 16000.0 / 512.0)
        assert fb.shape == (20, 257)
        assert np.all(fb >= 0)
        # after stretching, coverage is exact: last filter's right edge at maxF
        max_f = mel_warp(256 * 16000.0 / 512.0)
        coverage = (134.129 * 19 + 268.258) / max_f
        stretched_width = 268.258 / coverage
        # center of filter 0 at half width
        c0 = stretched_width / 2
        # filter 0 peak bin: where mel(bin*31.25) is closest to c0
        peak_bin = np.argmax(fb[0])
        freqs = mel_warp(np.arange(257) * 31.25)
        assert abs(freqs[peak_bin] - c0) <= abs(freqs[peak_bin + 1] - c0)
        assert abs(freqs[peak_bin] - c0) <= abs(freqs[peak_bin - 1] - c0)

    def test_derivative_weighting(self):
        # weights multiplied by d mel/df = 2595/ln10/(700+f)
        # (FilterBuilder::setWeights with warp-differential-unit=true)
        fb = filterbank_matrix(257, 31.25)
        fb_nodiff = filterbank_matrix(257, 31.25, warp_differential_unit=False)
        bins = np.nonzero(fb[5])[0]
        f_hz = bins * 31.25
        ratio = fb[5, bins] / fb_nodiff[5, bins]
        expected = 2595.0 / np.log(10.0) / (700.0 + f_hz)
        np.testing.assert_allclose(ratio, expected, rtol=1e-10)

    def test_golden_filter_construction(self):
        """Fully independent reconstruction of one filter."""
        n_bins, bin_to_hz = 257, 16000.0 / 512.0
        fb = filterbank_matrix(n_bins, bin_to_hz)
        max_f = 2595.0 * math.log10(1.0 + (256 * bin_to_hz) / 700.0)
        width, space = 268.258, 134.129
        nf = math.floor((max_f - width) / space + 1)
        coverage = (space * (nf - 1) + width) / max_f
        width, space = width / coverage, space / coverage
        fi = 7
        center = space * fi + 0.5 * width
        # start/end per FilterBuilder::setStart/setEnd
        def c2d(m):
            return (10 ** (m / 2595.0) - 1.0) * 700.0 / bin_to_hz
        start = c2d(max(center - 0.5 * width, 0.0))
        start = round(start) if abs(start - round(start)) < 1e-10 else math.ceil(start)
        end = c2d(min(center + 0.5 * width, max_f))
        end = round(end) + 1 if abs(end - round(end)) < 1e-10 else math.ceil(end)
        expected = np.zeros(n_bins)
        for b in range(int(start), int(end)):
            f_hz = b * bin_to_hz
            m = 2595.0 * math.log10(1.0 + f_hz / 700.0)
            tri = max(1.0 - abs(m - center) / (width / 2.0), 0.0)
            expected[b] = tri * 2595.0 / math.log(10.0) / (700.0 + f_hz)
        np.testing.assert_allclose(fb[fi], expected, rtol=1e-12, atol=1e-15)


class TestDct:
    def test_even_about_n_minus_half(self):
        # src/Signal/CosineTransform.cc initEvenAboutNminusHalf:
        # T[k][n] = cos(pi*(n+.5)/N * k), no normalization by default
        T = dct_matrix(16, 20)
        for k in [0, 1, 15]:
            expected = np.cos(np.pi * (np.arange(20) + 0.5) / 20 * k)
            np.testing.assert_allclose(T[k], expected, atol=1e-12)
        assert np.all(T[0] == 1.0)

    def test_n_plus_one(self):
        T = dct_matrix(4, 9, input_type="N-plus-one")  # N = 8
        assert T[1, 0] == 0.5 and T[1, 8] == -0.5
        np.testing.assert_allclose(T[2, 3], np.cos(np.pi * 3 / 8 * 2), atol=1e-12)


class TestMfccEndToEnd:
    def test_golden_mfcc(self):
        """Whole pipeline vs independent float64 numpy implementation."""
        sr = 16000
        t = np.arange(sr, dtype=np.float64) / sr
        sig = (0.5 * np.sin(2 * np.pi * 440 * t)
               + 0.2 * np.sin(2 * np.pi * 1333 * t)
               + 0.01 * rng().standard_normal(sr))
        sig32 = sig.astype(np.float32)

        pipe = MfccPipeline(sample_rate=sr, n_cepstra=16)
        got = np.asarray(pipe(sig32))

        # independent implementation (float64)
        x = sig.copy()
        x[1:] = sig[1:] - sig[:-1]
        x[0] = 0.0
        T = n_frames(sr, 400, 160)
        frames = np.zeros((T, 400))
        for i in range(T):
            chunk = x[i * 160:i * 160 + 400]
            frames[i, :len(chunk)] = chunk
        frames *= window_function("hamming", 400)
        spec = np.abs(np.fft.rfft(frames, n=512, axis=-1)) / sr
        fb = filterbank_matrix(257, sr / 512.0)
        mel = spec @ fb.T
        logmel = np.log10(mel)
        dct = dct_matrix(16, 20)
        expected = logmel @ dct.T

        assert got.shape == expected.shape == (T, 16)
        # BASELINE.json: features within 1e-4
        np.testing.assert_allclose(got, expected, atol=1e-4)

    def test_batched(self):
        sr = 16000
        sig = rng().standard_normal((4, 8000)).astype(np.float32)
        pipe = MfccPipeline(sample_rate=sr)
        feats = np.asarray(pipe(sig))
        single = np.asarray(pipe(sig[0]))
        assert feats.shape[0] == 4
        np.testing.assert_allclose(feats[0], single, atol=1e-5)


class TestNormalization:
    def test_segment_cmvn(self):
        x = rng().standard_normal((50, 16)).astype(np.float32) * 3 + 2
        y = np.asarray(normalize_segment(x))
        np.testing.assert_allclose(y.mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_allclose(y.std(axis=0), 1.0, atol=1e-3)

    def test_masked_cmvn(self):
        x = rng().standard_normal((2, 50, 8)).astype(np.float32)
        mask = np.zeros((2, 50), dtype=np.float32)
        mask[0, :30] = 1
        mask[1, :50] = 1
        y = np.asarray(normalize_segment(x, mask))
        np.testing.assert_allclose(y[0, :30].mean(axis=0), 0.0, atol=1e-5)
        np.testing.assert_array_equal(y[0, 30:], 0.0)

    def test_sliding_mean(self):
        x = rng().standard_normal((20, 4)).astype(np.float32)
        y = np.asarray(sliding_normalization(x, length=5, right=2))
        # interior point: window [t-2, t+2]
        expected = x[8] - x[6:11].mean(axis=0)
        np.testing.assert_allclose(y[8], expected, atol=1e-5)
        # boundary: clamped window [0, t+2]
        expected0 = x[0] - x[0:3].mean(axis=0)
        np.testing.assert_allclose(y[0], expected0, atol=1e-5)


class TestRegression:
    def test_delta_formula(self):
        # src/Signal/Regression.hh: y' = sum i*(f(i)-f(-i)) / (2*sum i^2)
        x = rng().standard_normal((30, 8)).astype(np.float32)
        d = np.asarray(regression_delta(x))
        t = 10
        expected = (1 * (x[t + 1] - x[t - 1]) + 2 * (x[t + 2] - x[t - 2])) / 10.0
        np.testing.assert_allclose(d[t], expected, atol=1e-6)

    def test_delta_edge_replication(self):
        # signal-delay copy margin: frames replicated at edges
        x = rng().standard_normal((10, 4)).astype(np.float32)
        d = np.asarray(regression_delta(x))
        expected0 = (1 * (x[1] - x[0]) + 2 * (x[2] - x[0])) / 10.0
        np.testing.assert_allclose(d[0], expected0, atol=1e-6)

    def test_deltadelta_is_iterated(self):
        x = rng().standard_normal((30, 8)).astype(np.float32)
        dd = np.asarray(regression_deltadelta(x))
        d1 = np.asarray(regression_delta(x))
        dd_expected = np.asarray(regression_delta(d1))
        np.testing.assert_allclose(dd, dd_expected, atol=1e-6)


class TestMrasta:
    def test_filter_bank_properties(self):
        from rasr_tpu.signal.dsp import mrasta_filters
        f = mrasta_filters(context=20, sigmas=(4.0, 8.0), derivatives=(1, 2))
        assert f.shape == (4, 41)
        np.testing.assert_allclose(np.linalg.norm(f, axis=1), 1.0, atol=1e-12)
        # first derivatives are odd, second derivatives sum to ~0 mean shape
        np.testing.assert_allclose(f[0], -f[0][::-1], atol=1e-12)

    def test_mrasta_output(self):
        from rasr_tpu.signal.dsp import mrasta
        x = rng().standard_normal((40, 6)).astype(np.float32)
        out = np.asarray(mrasta(x, context=10, sigmas=(4.0, 8.0),
                                derivatives=(1, 2)))
        assert out.shape == (40, 6 * 4)
        assert np.isfinite(out).all()
        # constant input: derivative filters respond ~0 in the interior
        const = np.ones((40, 2), np.float32)
        out_c = np.asarray(mrasta(const, context=10, sigmas=(4.0,),
                                  derivatives=(1,)))
        np.testing.assert_allclose(out_c[15:25], 0.0, atol=1e-4)


class TestHistogramNormalization:
    def test_gaussianizes(self):
        from rasr_tpu.signal.dsp import (apply_histogram_normalization,
                                         histogram_normalization_tables)
        r = rng()
        # skewed data: exponential
        train = r.exponential(2.0, size=(5000, 3)).astype(np.float32)
        qv, tg = histogram_normalization_tables(train, n_quantiles=64)
        out = np.asarray(apply_histogram_normalization(train[:1000], qv, tg))
        assert abs(out.mean()) < 0.1
        assert abs(out.std() - 1.0) < 0.15
        # monotone per dimension
        xs = np.sort(train[:100, 0])
        ys = np.asarray(apply_histogram_normalization(
            np.stack([xs] * 3, 1), qv, tg))[:, 0]
        assert (np.diff(ys) >= -1e-6).all()


class TestVoicedness:
    def test_periodic_vs_noise(self):
        from rasr_tpu.signal.dsp import voicedness, frame_signal, n_frames
        sr = 16000
        t = np.arange(sr // 2) / sr
        periodic = np.sin(2 * np.pi * 200 * t).astype(np.float32)
        noise = rng().standard_normal(sr // 2).astype(np.float32)
        T = n_frames(sr // 2, 400, 160)
        vf = np.asarray(voicedness(frame_signal(periodic, 400, 160, T)))
        nf = np.asarray(voicedness(frame_signal(noise, 400, 160, T)))
        # interior frames: periodic ~1.0, noise well below
        assert vf[2:-2].mean() > 0.9
        assert nf[2:-2].mean() < 0.6
        assert vf.shape == (T, 1)
