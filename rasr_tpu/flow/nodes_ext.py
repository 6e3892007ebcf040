"""Second tier of Flow filters: pitch analysis, TRAP, warping, quantile /
histogram equalization, integration, polynomial features, and frame
synchronization (reference registrations: src/Signal/Module.cc:85-172).

Same contract as flow/nodes.py — pure `apply()` over whole-segment
`Stream`s so the compiler fuses them into the surrounding XLA program.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..signal import dsp
from .data import Stream
from .nodes import Node, register


@register
class HarmonicSumNode(Node):
    """signal-harmonic-sum (src/Signal/HarmonicSum.cc:24-26): periodic
    harmonic sum; attrs `size` (continuous, seconds) and `H`."""
    filter_name = "signal-harmonic-sum"

    def apply(self, inputs):
        s = inputs[""]
        sr = s.meta.get("audio_sample_rate", s.sample_rate)
        cont = self.attr("size", 0.0, float)
        out_size = int(round(cont * sr)) + 1 if cont > 0 else 0
        H = self.attr("H", 0, lambda v: int(float(v)))
        return {"": s.with_data(dsp.harmonic_sum(s.data, out_size, H))}


@register
class HarmonicProductNode(Node):
    """signal-harmonic-product: energy-normalized harmonic product
    (src/Signal/HarmonicSum.hh:68-104)."""
    filter_name = "signal-harmonic-product"

    def apply(self, inputs):
        s = inputs[""]
        sr = s.meta.get("audio_sample_rate", s.sample_rate)
        cont = self.attr("size", 0.0, float)
        out_size = int(round(cont * sr)) + 1 if cont > 0 else 0
        H = self.attr("H", 0, lambda v: int(float(v)))
        return {"": s.with_data(dsp.harmonic_product(s.data, out_size, H))}


@register
class TemporalPatternNode(Node):
    """nn-temporal-pattern: TRAP features (src/Signal/TempoRAlPattern.hh —
    Hermansky & Sharma ICSLP'98); attrs context-length, dct-size, window."""
    filter_name = "nn-temporal-pattern"

    def apply(self, inputs):
        s = inputs[""]
        out = dsp.temporal_pattern(
            s.data,
            context_frames=self.attr("context-length", 101,
                                     lambda v: int(float(v))),
            dct_size=self.attr("dct-size", 8, lambda v: int(float(v))),
            window=self.attr("window", "hamming"))
        return {"": s.with_data(out)}


@register
class MrastaNode(Node):
    """mrasta-filtering: multi-resolution RASTA temporal filtering
    (src/Signal/Mrasta.hh)."""
    filter_name = "mrasta-filtering"

    def apply(self, inputs):
        s = inputs[""]
        out = dsp.mrasta(
            s.data,
            context=self.attr("context-length", 50,
                              lambda v: int(float(v))))
        return {"": s.with_data(out)}


@register
class QuantileEqualizationNode(Node):
    """signal-quantile-equalization (src/Signal/QuantileEqualization.hh):
    per-dimension piecewise-linear map of the segment's quantiles onto
    training quantiles.  `file` holds training quantiles (np .npy, (Q+1, D));
    without it the node self-normalizes to the segment's own quantiles
    (estimation mode writes them via `estimate-file`)."""
    filter_name = "signal-quantile-equalization"
    host_only = True

    def apply(self, inputs):
        s = inputs[""]
        n_q = self.attr("number-of-quantiles", 4, lambda v: int(float(v)))
        data = np.asarray(s.data, np.float32)
        current = dsp.estimate_quantiles(data, n_q)
        est_file = self.attr("estimate-file")
        if est_file:
            np.save(est_file, current)
        train_file = self.attr("file")
        if not train_file:
            return {"": s}
        train = np.load(train_file if train_file.endswith(".npy")
                        else train_file + ".npy")
        out = dsp.quantile_equalize(jnp.asarray(data), train, current)
        return {"": s.with_data(out)}


@register
class HistogramNormalizationNode(Node):
    """signal-histogram-normalization (src/Signal/HistogramNormalization.hh):
    map each dimension through test-CDF -> inverse training-CDF.  Uses the
    segment itself as the test histogram; training tables from `file`
    (npz with values/targets) or standard-normal targets when absent."""
    filter_name = "signal-histogram-normalization"
    host_only = True

    def apply(self, inputs):
        s = inputs[""]
        data = np.asarray(s.data, np.float32)
        n_q = self.attr("number-of-quantiles", 32, lambda v: int(float(v)))
        f = self.attr("file")
        if f:
            tbl = np.load(f)
            values, targets = tbl["values"], tbl["targets"]
        else:
            values, targets = dsp.histogram_normalization_tables(data, n_q)
        out = dsp.apply_histogram_normalization(jnp.asarray(data), values,
                                                targets)
        return {"": s.with_data(out)}


class _WarpingBase(Node):
    """Shared frequency-axis warping machinery (src/Signal/Warping.hh):
    subclasses provide warped positions; application is one fused matmul."""

    def _apply_positions(self, s: Stream, pos: np.ndarray) -> Stream:
        interp = self.attr("interpolation-type", "linear") != "keep-end"
        W = jnp.asarray(dsp.warping_matrix(int(s.data.shape[-1]), pos,
                                           interpolate=interp))
        return s.with_data(s.data.astype(jnp.float32) @ W.T)


@register
class LinearWarpingNode(_WarpingBase):
    """signal-linear-warping (src/Signal/LinearWarping.hh): two-piece
    linear VTLN warp; attrs warping-factor, break-point."""
    filter_name = "signal-linear-warping"

    def apply(self, inputs):
        s = inputs[""]
        alpha = self.attr("warping-factor", 1.0, float)
        bp = self.attr("break-point", 0.875, float)
        pos = dsp.linear_warping_positions(int(s.data.shape[-1]), alpha, bp)
        return {"": self._apply_positions(s, pos)}


@register
class GenericWarpingNode(_WarpingBase):
    """signal-warping (src/Signal/GenericWarping.hh): warping function given
    as an expression in x (input bin index, 0..size-1), e.g.
    `warping-function="x*0.9"`; evaluated with numpy only."""
    filter_name = "signal-warping"

    def apply(self, inputs):
        s = inputs[""]
        expr = self.attr("warping-function", "x")
        size = int(s.data.shape[-1])
        x = np.arange(size, dtype=np.float64)
        pos = eval(expr, {"__builtins__": {}},
                   {"x": x, "np": np, "size": size})  # config-authored expr
        pos = np.broadcast_to(np.asarray(pos, np.float64), (size,))
        return {"": self._apply_positions(s, pos)}


@register
class SpectralIntegrationNode(Node):
    """signal-spectralintegration (src/Signal/SpectralIntegration.hh):
    windowed reduction along the spectral axis."""
    filter_name = "signal-spectralintegration"

    def apply(self, inputs):
        s = inputs[""]
        out = dsp.spectral_integration(
            s.data,
            length=self.attr("length", 3, lambda v: int(float(v))),
            shift=self.attr("shift", 2, lambda v: int(float(v))),
            window=self.attr("window", "hamming"))
        return {"": s.with_data(out)}


@register
class TemporalIntegrationNode(Node):
    """signal-temporalintegration (src/Signal/TemporalIntegration.hh):
    windowed reduction along the time axis (length/shift in seconds)."""
    filter_name = "signal-temporalintegration"

    def apply(self, inputs):
        s = inputs[""]
        frames_per_s = 1.0 / s.shift
        length = max(int(round(self.attr("length", 0.025, float)
                               * frames_per_s)), 1)
        shift = max(int(round(self.attr("shift", 0.01, float)
                              * frames_per_s)), 1)
        out = dsp.temporal_integration(s.data, length, shift,
                                       self.attr("window", "hamming"))
        return {"": s.with_data(out, frame_shift=s.shift * shift)}


@register
class NthOrderFeaturesNode(Node):
    """signal-nth-order-features (src/Signal/NthOrderFeatures.hh):
    polynomial feature expansion; attr `order` like 'first+second'."""
    filter_name = "signal-nth-order-features"

    def apply(self, inputs):
        s = inputs[""]
        out = dsp.nth_order_features(s.data,
                                     self.attr("order", "first-and-second"))
        return {"": s.with_data(out)}


@register
class CrossCorrelationNode(Node):
    """signal-cross-correlation (src/Signal/CrossCorrelation.hh): windowed
    cross-correlation of two frame streams over a lag band; ports x, y."""
    filter_name = "signal-cross-correlation"
    in_ports = ("x", "y")

    def apply(self, inputs):
        x, y = inputs["x"], inputs["y"]
        sr = x.meta.get("audio_sample_rate", x.sample_rate)
        begin = self.attr("begin", 0.0, float)
        end = self.attr("end", 0.0, float)
        b = int(round(begin * sr))
        e = int(round(end * sr)) or int(x.data.shape[-1])
        out = dsp.cross_correlation(
            x.data, y.data, b, e,
            normalization=self.attr("normalization", "unbiased-estimate"))
        return {"": x.with_data(out)}


@register
class FramePredictionNode(Node):
    """signal-frame-prediction (src/Signal/FramePrediction.hh,
    RepeatingFramePrediction): resample the input stream at the `target`
    stream's frame times by repeating the latest frame."""
    filter_name = "signal-frame-prediction"
    in_ports = ("", "target")

    def apply(self, inputs):
        s, target = inputs[""], inputs["target"]
        times = jnp.asarray(s.timestamps()[0])
        tts = jnp.asarray(target.timestamps()[0])
        out = dsp.frame_predict(s.data, times, tts)
        return {"": target.with_data(out)}


@register
class FrameInterpolationNode(Node):
    """signal-frame-interpolation (src/Signal/FrameInterpolation.hh,
    PolinomialVectorInterpolation): resample the input stream at the
    `target` stream's frame times by order-`order` interpolation."""
    filter_name = "signal-frame-interpolation"
    in_ports = ("", "target")

    def apply(self, inputs):
        s, target = inputs[""], inputs["target"]
        times = jnp.asarray(s.timestamps()[0])
        tts = jnp.asarray(target.timestamps()[0])
        out = dsp.frame_interpolate(
            s.data, times, tts,
            order=self.attr("order", 1, lambda v: int(float(v))))
        return {"": target.with_data(out)}


@register
class LpcNode(Node):
    """signal-lpc (src/Signal/ArEstimator.hh): autocorrelation-method linear
    prediction coefficients per frame via Levinson-Durbin."""
    filter_name = "signal-lpc"

    def apply(self, inputs):
        s = inputs[""]
        order = self.attr("order", 12, lambda v: int(float(v)))
        x = s.data.astype(jnp.float32)
        L = x.shape[-1]
        # autocorrelation lags 0..order via matmul-shaped shifts
        ac = jnp.stack([jnp.sum(x[..., :L - k] * x[..., k:], axis=-1)
                        for k in range(order + 1)], axis=-1)
        a, err = dsp.levinson(ac)
        return {"": s.with_data(a), "error": s.with_data(err)}


@register
class AllPolesPowerSpectrumNode(Node):
    """signal-all-poles-power-spectrum (src/Signal/AllPolesPowerSpectrum.cc):
    power spectrum of the AR model err / |A(e^jw)|^2 on `size` bins."""
    filter_name = "signal-all-poles-power-spectrum"
    in_ports = ("", "error")

    def apply(self, inputs):
        s = inputs[""]
        a = s.data.astype(jnp.float32)          # (..., p) levinson alphas
        size = self.attr("size", 129, lambda v: int(float(v)))
        err = inputs.get("error")
        p = a.shape[-1]
        w = jnp.linspace(0.0, np.pi, size)
        k = jnp.arange(1, p + 1)
        e = jnp.exp(-1j * w[:, None] * k[None, :])   # (size, p)
        A = 1.0 + jnp.einsum("...k,wk->...w", a.astype(jnp.complex64), e)
        gain2 = (jnp.square(err.data.astype(jnp.float32))[..., None]
                 if err is not None else 1.0)
        spec = gain2 / jnp.maximum(jnp.abs(A) ** 2, 1e-12)
        return {"": s.with_data(spec)}


@register
class PeakDetectionNode(Node):
    """signal-peak-detection (src/Signal/PeakDetection.hh): maximal peak of
    each input vector in a position band; out ports: "" (position, in
    continuous units), value, confidence."""
    filter_name = "signal-peak-detection"
    out_ports = ("", "value", "confidence")
    host_only = True

    def apply(self, inputs):
        from ..signal.analysis import peak_detection
        s = inputs[""]
        sr = s.meta.get("audio_sample_rate", s.sample_rate)
        to_idx = lambda key: int(round(self.attr(key, 0.0, float) * sr))
        data = np.asarray(s.data, np.float32)
        if data.ndim == 1:
            data = data[None, :]
        pos, val, conf = [], [], []
        for row in data:
            p, v, c = peak_detection(
                row, min_pos=to_idx("min-position"),
                max_pos=to_idx("max-position"),
                height_average_width=to_idx("height-average-width"),
                max_width=to_idx("max-width"),
                width_height_factor=self.attr("width-height-factor", 0.5,
                                              float))
            pos.append(p / sr)
            val.append(v)
            conf.append(c)
        mk = lambda arr: s.with_data(jnp.asarray(np.asarray(arr,
                                                            np.float32)))
        return {"": mk(pos), "value": mk(val), "confidence": mk(conf)}


@register
class SilenceDetectionNode(Node):
    """signal-silence-detection (src/Signal/SilenceDetection.hh): drop
    silence frames from a feature/energy stream by an energy threshold with
    minimum speech/silence run lengths."""
    filter_name = "signal-silence-detection"
    host_only = True

    def apply(self, inputs):
        from ..signal.analysis import silence_detection
        s = inputs[""]
        data = np.asarray(s.data, np.float32)
        energies = (data ** 2).sum(-1) if data.ndim > 1 else data ** 2
        mask = silence_detection(
            energies,
            min_snr=self.attr("min-snr", 1.7, float),
            min_speech_length=self.attr("min-speech-length", 10,
                                        lambda v: int(float(v))),
            min_silence_length=self.attr("min-silence-length", 20,
                                         lambda v: int(float(v))))
        return {"": s.with_data(jnp.asarray(data[mask]))}


@register
class SilenceNormalizationNode(Node):
    """signal-silence-normalization (src/Signal/SilenceNormalization.hh):
    normalize the share of silence in the sample stream to
    `silence-fraction` via EM energy segmentation."""
    filter_name = "signal-silence-normalization"
    host_only = True

    def apply(self, inputs):
        from ..signal.analysis import silence_normalization
        s = inputs[""]
        out = silence_normalization(
            np.asarray(s.data, np.float32), s.sample_rate,
            silence_fraction=self.attr("silence-fraction", 0.1, float),
            block_size=self.attr("block-size", 0.01, float),
            min_surrounding_silence=self.attr("min-surrounding-silence",
                                              0.1, float),
            fill_up_silence=self.attr("fill-up-silence", False, bool))
        return {"": s.with_data(jnp.asarray(out))}


@register
class SampleNormalizationNode(Node):
    """signal-sample-normalization (src/Signal/SampleNormalization.hh):
    sliding mean (DC) removal and amplitude normalization of the raw
    sample stream; whole-segment realization over the Stream model."""
    filter_name = "signal-sample-normalization"

    def apply(self, inputs):
        s = inputs[""]
        x = s.data.astype(jnp.float32)
        length = self.attr("length", 0.0, float)
        if length > 0.0:
            win = max(int(round(length * s.sample_rate)), 1)
            k = jnp.ones((win,), jnp.float32) / win
            mean = jnp.convolve(x, k, mode="same") if x.ndim == 1 else x * 0
            x = x - mean
        else:
            x = x - jnp.mean(x, axis=-1, keepdims=True)
        rms = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))
        return {"": s.with_data(x / jnp.maximum(rms, 1e-10))}


@register
class MeanEstimatorNode(Node):
    """signal-mean-estimator (src/Signal/MeanEstimator.hh): accumulate the
    feature mean over every frame seen and write it to `file` (matrix
    text) at flush; the stream passes through unchanged."""
    filter_name = "signal-mean-estimator"
    host_only = True
    _sums: dict = {}

    def apply(self, inputs):
        s = inputs[""]
        f = self.attr("file")
        if f:
            data = np.asarray(s.data, np.float64)
            if data.ndim == 1:
                data = data[None, :]
            acc = MeanEstimatorNode._sums.setdefault(
                f, [np.zeros(data.shape[-1]), 0])
            acc[0] = acc[0] + data.sum(0)
            acc[1] += data.shape[0]
            mean = acc[0] / max(acc[1], 1)
            np.savetxt(f, mean[None, :], fmt="%.10g")
        return {"": s}


@register
class SegmentClusteringNode(Node):
    """signal-segment-clustering (src/Signal/SegmentClustering.hh): BIC
    Gaussian clustering of feature segments; emits per-frame cluster ids
    on the default port (speaker labels for adaptation)."""
    filter_name = "signal-segment-clustering"
    host_only = True

    def apply(self, inputs):
        from ..signal.analysis import cluster_segments
        s = inputs[""]
        data = np.asarray(s.data, np.float32)
        chunk = self.attr("min-segment-length", 100,
                          lambda v: int(float(v)))
        bounds = list(range(0, len(data), chunk))
        segments = [data[b:b + chunk] for b in bounds]
        labels = cluster_segments(
            segments, bic_lambda=self.attr("lambda", 1.0, float))
        per_frame = np.concatenate(
            [np.full(len(seg), lab, np.int32)
             for seg, lab in zip(segments, labels)])
        return {"": s.with_data(jnp.asarray(per_frame))}
