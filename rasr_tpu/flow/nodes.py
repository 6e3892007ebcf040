"""Flow filter implementations and registry.

Each reference Flow filter (registrations: src/Flow/Module.cc,
src/Signal/Module.cc:85-172) becomes a `Node` whose `apply()` is a pure
function over `Stream`s; a whole network of them is traced into ONE fused
XLA program by the compiler (flow/compiler.py) instead of the reference's
node-at-a-time pull execution — the TPU-native "north star" (SURVEY.md §2.5).

Ports: `apply` receives {port: Stream} and returns {port: Stream}; "" is the
default port.  Filters that change the time base (signal-window) set
frame_shift so downstream timestamps stay correct.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, Optional, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..signal import dsp
from .data import Stream

Registry: Dict[str, Type["Node"]] = {}


def register(cls: Type["Node"]) -> Type["Node"]:
    Registry[cls.filter_name] = cls
    return cls


class Node:
    filter_name = ""
    # ports this node consumes / produces ("" = default)
    in_ports = ("",)
    out_ports = ("",)
    host_only = False  # True: must run outside jit (file IO)

    def __init__(self, name: str, attrs: Dict[str, str]):
        self.name = name
        self.attrs = attrs

    def attr(self, key: str, default=None, typ=str):
        v = self.attrs.get(key)
        if v is None:
            return default
        if typ is bool:
            return v.strip().lower() in ("true", "yes", "on", "1")
        return typ(v)

    def apply(self, inputs: Dict[str, Stream]) -> Dict[str, Stream]:
        raise NotImplementedError

    # -- attribute negotiation (reference: configure() / putOutputAttributes,
    #    src/Flow/Node.hh) -----------------------------------------------------
    #: required input datatype ("" port), checked during Pipeline.configure()
    in_datatype: Optional[str] = None
    #: datatype this node emits (None: pass through)
    out_datatype: Optional[str] = None

    def configure(self, in_attrs):
        """Merge input attributes into output attributes (default Flow
        behavior).  Nodes that change datatype/rate override this or set
        `out_datatype`.  `in_attrs`: {port: Attributes}."""
        from .data import Attributes
        out = Attributes()
        for a in in_attrs.values():
            out.merge(a)
        if self.in_datatype is not None:
            for port, a in in_attrs.items():
                got = a.get("datatype")
                if got and got != self.in_datatype:
                    raise ValueError(
                        f"node {self.name}: port {port!r} carries datatype "
                        f"{got!r}, needs {self.in_datatype!r}")
        if self.out_datatype is not None:
            out.set("datatype", self.out_datatype)
        return {p: out for p in self.out_ports}


# --------------------------------------------------------------------------
# generic nodes (src/Flow/Module.cc registrations)
# --------------------------------------------------------------------------


@register
class VectorF32Log(Node):
    """generic-vector-f32-log — log10 (src/Flow/SimpleFunction.hh:43)."""
    filter_name = "generic-vector-f32-log"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(dsp.log10(s.data))}


@register
class VectorF32Ln(Node):
    filter_name = "generic-vector-f32-ln"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(dsp.accurate_log(s.data))}


@register
class VectorF32LogPlus(Node):
    """log10(x + value)."""
    filter_name = "generic-vector-f32-log-plus"

    def apply(self, inputs):
        s = inputs[""]
        v = self.attr("value", 0.0, float)
        return {"": s.with_data(jnp.log10(s.data + v))}


@register
class VectorF32Multiplication(Node):
    filter_name = "generic-vector-f32-multiplication"

    def apply(self, inputs):
        s = inputs[""]
        v = self.attr("value", 1.0, float)
        return {"": s.with_data(s.data * v)}


@register
class VectorF32Addition(Node):
    filter_name = "generic-vector-f32-addition"

    def apply(self, inputs):
        s = inputs[""]
        v = self.attr("value", 0.0, float)
        return {"": s.with_data(s.data + v)}


@register
class VectorF32Power(Node):
    filter_name = "generic-vector-f32-power"

    def apply(self, inputs):
        s = inputs[""]
        v = self.attr("value", 1.0, float)
        return {"": s.with_data(jnp.power(s.data, v))}


@register
class VectorF32Exp(Node):
    filter_name = "generic-vector-f32-exp"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(jnp.exp(s.data))}


@register
class VectorF32Quantize(Node):
    """Round to multiples of `value` (standard_system scaling+quantization)."""
    filter_name = "generic-vector-f32-quantize"

    def apply(self, inputs):
        s = inputs[""]
        v = self.attr("value", 1.0, float)
        return {"": s.with_data(jnp.round(s.data / v) * v)}


@register
class ConvertS16ToF32(Node):
    filter_name = "generic-convert-vector-s16-to-vector-f32"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(s.data.astype(jnp.float32))}


@register
class VectorS16Demultiplex(Node):
    """Select one track from interleaved multi-channel samples."""
    filter_name = "generic-vector-s16-demultiplex"

    def apply(self, inputs):
        s = inputs[""]
        track = self.attr("track", 0, lambda v: int(float(v)))
        n_tracks = int(s.meta.get("n_tracks", 1))
        if n_tracks <= 1:
            return {"": s}
        data = s.data.reshape(-1, n_tracks)[:, track]
        return {"": s.with_data(data, meta={**s.meta, "n_tracks": 1})}


@register
class VectorF32Concat(Node):
    """Concatenate feature streams along the feature axis.  Port order
    follows link declaration order (insertion order of the inputs dict),
    matching the reference's positional concatenation."""
    filter_name = "generic-vector-f32-concat"
    in_ports = ("*",)  # variadic

    def apply(self, inputs):
        ordered = list(inputs.values())
        data = jnp.concatenate([jnp.atleast_2d(s.data.T).T
                                if s.data.ndim < ordered[0].data.ndim
                                else s.data for s in ordered], axis=-1)
        return {"": ordered[0].with_data(data)}


@register
class VectorF32Split(Node):
    """generic-vector-f32-split: exposes single elements on numbered ports
    ('0', '1', ...); reverse=true indexes from the end."""
    filter_name = "generic-vector-f32-split"

    def apply(self, inputs):
        s = inputs[""]
        reverse = self.attr("reverse", False, bool)
        out = {}
        # lazily expose the first few elements; the compiler only consumes
        # linked ports, unused entries are dead code removed by XLA
        n_expose = 4
        for i in range(n_expose):
            idx = -(i + 1) if reverse else i
            out[str(i)] = s.with_data(s.data[..., idx:idx + 1]
                                      if idx != -1 else s.data[..., -1:])
        out[""] = s
        return out


# --------------------------------------------------------------------------
# signal nodes (src/Signal/Module.cc registrations)
# --------------------------------------------------------------------------


@register
class Preemphasis(Node):
    """src/Signal/Preemphasis.cc."""
    filter_name = "signal-preemphasis"

    def apply(self, inputs):
        s = inputs[""]
        alpha = self.attr("alpha", 1.0, float)
        return {"": s.with_data(dsp.preemphasis(s.data.astype(jnp.float32), alpha))}


@register
class Window(Node):
    """signal-window: framing + window function
    (src/Signal/Window.hh, WindowBuffer.cc)."""
    filter_name = "signal-window"

    def apply(self, inputs):
        s = inputs[""]
        sr = s.sample_rate
        length = int(round(self.attr("length", 0.025, float) * sr))
        shift = int(round(self.attr("shift", 0.01, float) * sr))
        kind = self.attr("type", "hamming")
        n = int(s.data.shape[-1])
        num_frames = dsp.n_frames(n, length, shift)
        frames = dsp.frame_signal(s.data, length, shift, num_frames)
        frames = dsp.apply_window(frames, kind)
        return {"": s.with_data(
            frames,
            sample_rate=sr / shift if shift else sr,
            frame_shift=shift / sr,
            meta={**s.meta, "window_length": length, "window_shift": shift,
                  "frame_duration": length / sr, "audio_sample_rate": sr})}


@register
class RealFastFourierTransform(Node):
    """signal-real-fast-fourier-transform
    (src/Signal/FastFourierTransform.hh:229): zero-pad to pow2 length,
    optional 1/sample-rate scaling; output stored as amplitude-ready complex.
    """
    filter_name = "signal-real-fast-fourier-transform"

    def apply(self, inputs):
        s = inputs[""]
        audio_sr = s.meta.get("audio_sample_rate", s.sample_rate)
        max_in = self.attr("maximum-input-size", 0.0, float)
        explicit_len = self.attr("length", 0, lambda v: int(float(v)))
        n_in = int(math.ceil(max_in * audio_sr)) if max_in else s.data.shape[-1]
        fft_len = explicit_len if explicit_len else dsp.fft_length_for(n_in)
        apply_scale = self.attr("apply-scale", True, bool)
        scale = (1.0 / audio_sr) if apply_scale else 1.0
        re, im = dsp.rdft(s.data, fft_len, scale)
        meta = {**s.meta, "fft_length": fft_len, "fft_scale": scale,
                # output "sample-rate" attribute = length/sample-rate
                # (FastFourierTransform outputSampleRate)
                "frequency_resolution": audio_sr / fft_len}
        return {"": s.with_data(jax.lax.complex(re, im), meta=meta)}


@register
class AlternatingComplexAmplitude(Node):
    """signal-vector-alternating-complex-f32-amplitude: |X_k|."""
    filter_name = "signal-vector-alternating-complex-f32-amplitude"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(jnp.abs(s.data).astype(jnp.float32))}


@register
class AlternatingComplexPower(Node):
    filter_name = "signal-vector-alternating-complex-f32-power"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data((jnp.real(s.data) ** 2
                                 + jnp.imag(s.data) ** 2).astype(jnp.float32))}


@register
class Filterbank(Node):
    """signal-filterbank (src/Signal/Filterbank.cc)."""
    filter_name = "signal-filterbank"

    def apply(self, inputs):
        s = inputs[""]
        n_bins = int(s.data.shape[-1])
        bin_to_hz = s.meta.get("frequency_resolution")
        if bin_to_hz is None:
            raise ValueError("signal-filterbank requires spectral input")
        spacing = self.attr("spacing", 0.0, float)
        matrix = dsp.filterbank_matrix(
            n_bins, bin_to_hz,
            filter_width=self.attr("filter-width", 268.258, float),
            spacing=spacing,
            boundary=self.attr("boundary", "stretch-to-cover"),
            warping=self.attr("warping-function", "mel"),
            filter_type=self.attr("type", "triangular"),
            minimum_frequency=self.attr("filtering-interval-start", 0.0, float),
            normalize_surface=self.attr("normalization", "none") == "surface",
            warp_differential_unit=self.attr("warp-differential-unit", True, bool))
        out = dsp.apply_matrix(s.data, matrix)
        # output sample-rate = 1/spacing in the warped domain (Boundary
        # outputSampleRate); downstream continuous transforms map index ->
        # warped position via this rate
        meta = {**s.meta, "n_filters": matrix.shape[0],
                "warped_spacing": spacing if spacing else None,
                "warping_function": self.attr("warping-function", "mel")}
        return {"": s.with_data(out, meta=meta)}


@register
class CosineTransform(Node):
    """signal-cosine-transform (src/Signal/CosineTransform.cc)."""
    filter_name = "signal-cosine-transform"

    def apply(self, inputs):
        s = inputs[""]
        n_out = self.attr("nr-outputs", 1, lambda v: int(float(v)))
        matrix = dsp.dct_matrix(
            n_out, int(s.data.shape[-1]),
            input_type=self.attr("input-type", "even-about-N-minus-half"),
            normalize=self.attr("normalize", False, bool))
        return {"": s.with_data(dsp.apply_matrix(s.data, matrix))}


@register
class Normalization(Node):
    """signal-normalization (src/Signal/Normalization.hh): mean /
    mean-and-variance, segment-wise (length=infinite/0) or sliding."""
    filter_name = "signal-normalization"

    def apply(self, inputs):
        s = inputs[""]
        typ = self.attr("type", "mean")
        length = self.attr("length", 0, lambda v: int(float(v)))
        right = self.attr("right", 0, lambda v: int(float(v)))
        variance = typ in ("mean-and-variance", "mean-and-variance-1D")
        if typ not in ("mean", "mean-and-variance", "mean-and-variance-1D"):
            raise NotImplementedError(f"normalization type {typ!r}")
        T = int(s.data.shape[-2])
        if length <= 0 or length >= T:
            out = dsp.normalize_segment(s.data, variance=variance)
        else:
            out = dsp.sliding_normalization(s.data, length, right, variance=variance)
        return {"": s.with_data(out)}


@register
class Delay(Node):
    """signal-delay (src/Signal/Delay.cc): exposes time-shifted copies of the
    input on ports named by relative offset ('-2'..'+2'); copy margin policy
    replicates edge frames."""
    filter_name = "signal-delay"

    def apply(self, inputs):
        s = inputs[""]
        max_size = self.attr("max-size", 1, lambda v: int(float(v)))
        right = self.attr("right", 0, lambda v: int(float(v)))
        left = max_size - 1 - right
        out = {}
        x = s.data
        first = x[..., :1, :]
        last = x[..., -1:, :]
        T = x.shape[-2]
        for off in range(-left, right + 1):
            if off == 0:
                shifted = x
            elif off > 0:  # look-ahead: x[t+off]
                shifted = jnp.concatenate(
                    [x[..., off:, :], jnp.repeat(last, off, axis=-2)], axis=-2)
            else:
                k = -off
                shifted = jnp.concatenate(
                    [jnp.repeat(first, k, axis=-2), x[..., :T - k, :]], axis=-2)
            port = f"+{off}" if off > 0 else str(off)
            out[port] = s.with_data(shifted)
        return out


@register
class Regression(Node):
    """signal-regression (src/Signal/Regression.hh): least-squares derivative
    over ports -k..+k; order 2 = regression of regressions."""
    filter_name = "signal-regression"
    in_ports = ("*",)

    def apply(self, inputs):
        order = self.attr("order", 1, lambda v: int(float(v)))
        offsets = sorted(int(p) for p in inputs.keys())
        k = max(offsets)
        denom = 2.0 * sum(i * i for i in range(1, k + 1))

        def regress(streams):
            out = None
            for i in range(1, k + 1):
                d = streams[i].data - streams[-i].data
                out = d * i if out is None else out + d * i
            return out / denom

        streams = {off: inputs[f"+{off}" if off > 0 else str(off)]
                   for off in offsets}
        first = regress(streams)
        if order == 1:
            return {"": streams[0].with_data(first)}
        # order 2: apply regression to the first-order deltas
        second = dsp.regression_delta(first, half_window=k)
        return {"": streams[0].with_data(second)}


@register
class SequenceConcatenation(Node):
    """signal-vector-f32-sequence-concatenation: stack a context window of
    consecutive frames into one vector (LDA input,
    src/Signal/VectorSequenceConcatenation.hh)."""
    filter_name = "signal-vector-f32-sequence-concatenation"

    def apply(self, inputs):
        s = inputs[""]
        size = self.attr("max-size", 1, lambda v: int(float(v)))
        right = self.attr("right", 0, lambda v: int(float(v)))
        left = size - 1 - right
        x = s.data
        T = x.shape[-2]
        first = x[..., :1, :]
        last = x[..., -1:, :]
        parts = []
        for off in range(-left, right + 1):
            if off == 0:
                parts.append(x)
            elif off > 0:
                parts.append(jnp.concatenate(
                    [x[..., off:, :], jnp.repeat(last, off, axis=-2)], axis=-2))
            else:
                k = -off
                parts.append(jnp.concatenate(
                    [jnp.repeat(first, k, axis=-2), x[..., :T - k, :]], axis=-2))
        return {"": s.with_data(jnp.concatenate(parts, axis=-1))}


@register
class MatrixMultiplication(Node):
    """signal-matrix-multiplication-f32: y = A x (LDA / linear transform,
    src/Signal/MatrixMult.hh).  The matrix is loaded from `file` (xml or
    binary via Math matrix formats) or provided programmatically."""
    filter_name = "signal-matrix-multiplication-f32"

    _matrix_cache: Dict[str, np.ndarray] = {}

    def apply(self, inputs):
        s = inputs[""]
        path = self.attr("file", "")
        matrix = self.attrs.get("_matrix")
        if matrix is None:
            if not path:
                raise ValueError("signal-matrix-multiplication-f32 needs a file")
            matrix = self._matrix_cache.get(path)
            if matrix is None:
                from ..math.matrix_io import read_matrix
                matrix = read_matrix(path)
                self._matrix_cache[path] = matrix
        return {"": s.with_data(dsp.apply_matrix(s.data, np.asarray(matrix)))}


@register
class ContinuousTransform(Node):
    """signal-vector-f32-continuous-transform: elementwise multiply (or
    other op) with an analytic function evaluated at each element's
    continuous position (reference StringExpressionNode + analytic
    functions; used for equal-loudness preemphasis in plp.flow)."""
    filter_name = "signal-vector-f32-continuous-transform"

    def apply(self, inputs):
        s = inputs[""]
        decl = self.attr("f", "identity")
        op = self.attr("operation", "multiplies")
        from ..math.analytic import AnalyticFunctionFactory
        # disc-to-cont divides by the stream's warped rate: index * spacing
        spacing = s.meta.get("warped_spacing") or 1.0
        factory = AnalyticFunctionFactory(sample_rate=1.0 / spacing)
        fn = factory.create(decl)
        n = int(s.data.shape[-1])
        weights = fn.value(np.arange(n, dtype=np.float64))
        w = jnp.asarray(weights, dtype=jnp.float32)
        if op == "multiplies":
            return {"": s.with_data(s.data * w)}
        if op == "plus":
            return {"": s.with_data(s.data + w)}
        if op == "divides":
            return {"": s.with_data(s.data / w)}
        raise ValueError(f"unknown operation {op!r}")


@register
class AutocorrelationToAutoregression(Node):
    """signal-autocorrelation-to-autoregression: Levinson-Durbin
    (src/Math/LevinsonLse.cc).  Output data: (..., p+1) with column 0 =
    gain and columns 1..p the prediction coefficients.  The order
    recursion unrolls inside the fused program (p ~ 13)."""
    filter_name = "signal-autocorrelation-to-autoregression"

    def apply(self, inputs):
        s = inputs[""]
        a, gain = dsp.levinson(s.data)
        data = jnp.concatenate([gain[..., None], a], axis=-1)
        return {"": s.with_data(data)}


@register
class AutoregressionToCepstrum(Node):
    """signal-autoregression-to-cepstrum (src/Signal/
    AutoregressionToCepstrum.cc)."""
    filter_name = "signal-autoregression-to-cepstrum"

    def apply(self, inputs):
        s = inputs[""]
        n_out = self.attr("nr-outputs", 1, lambda v: int(float(v)))
        c = dsp.ar_to_cepstrum(s.data[..., 0], s.data[..., 1:], n_out)
        return {"": s.with_data(c)}


@register
class VoicednessNode(Node):
    """signal-cross-correlation voicedness: normalized autocorrelation peak
    over the pitch range (reference CrossCorrelation + PeakDetection)."""
    filter_name = "signal-voicedness"

    def apply(self, inputs):
        s = inputs[""]
        sr = s.meta.get("audio_sample_rate", s.sample_rate)
        min_lag = self.attr("min-lag", int(round(sr / 500.0)),
                            lambda v: int(float(v)))
        max_lag = self.attr("max-lag", int(round(sr / 50.0)),
                            lambda v: int(float(v)))
        return {"": s.with_data(dsp.voicedness(s.data, min_lag, max_lag))}


@register
class GammatoneNode(Node):
    """signal-gammatone: gammatone critical-band energies from the
    amplitude spectrum (frequency-domain realization of
    src/Signal/GammaTone.hh; ERB-spaced 4th-order responses)."""
    filter_name = "signal-gammatone"

    def apply(self, inputs):
        s = inputs[""]
        bin_to_hz = s.meta.get("frequency_resolution")
        if bin_to_hz is None:
            raise ValueError("signal-gammatone requires spectral input")
        matrix = dsp.gammatone_matrix(
            int(s.data.shape[-1]), bin_to_hz,
            n_filters=self.attr("nr-filters", 68, lambda v: int(float(v))),
            f_min=self.attr("minimum-frequency", 100.0, float),
            f_max=self.attr("maximum-frequency", None,
                            lambda v: float(v)) or None)
        out = dsp.apply_matrix(jnp.abs(s.data) if jnp.iscomplexobj(s.data)
                               else s.data, matrix)
        return {"": s.with_data(out)}


@register
class EnergyNode(Node):
    """signal-energy: per-frame log energy from windowed frames."""
    filter_name = "signal-energy"

    def apply(self, inputs):
        s = inputs[""]
        e = jnp.sum(jnp.square(s.data), axis=-1, keepdims=True)
        return {"": s.with_data(e)}


@register
class DcDetection(Node):
    """signal-dc-detection: drop constant (DC) sample stretches
    (src/Signal/DcDetection.hh:26).  Sequential over samples, so this
    node runs on host (outside the fused XLA program); attributes
    max-dc-increment, min-dc-length (seconds), min-non-dc-segment-length
    (seconds) mirror the reference parameters."""
    filter_name = "signal-dc-detection"
    host_only = True

    def apply(self, inputs):
        from ..signal.analysis import dc_detection
        s = inputs[""]
        sr = s.sample_rate
        max_inc = self.attr("max-dc-increment", 1.0 / 32768.0, float)
        min_dc = self.attr("min-dc-length", 0.01, float)
        min_non_dc = self.attr("min-non-dc-segment-length", 0.0, float)
        x = np.asarray(s.data)
        if x.ndim != 1:
            return {"": s}  # batched/framed data: applied upstream
        cleaned, _ = dc_detection(x, max_inc,
                                  max(int(round(min_dc * sr)), 1),
                                  int(round(min_non_dc * sr)))
        return {"": s.with_data(jnp.asarray(cleaned))}


@register
class WarpTimeNode(Node):
    """warp-time: linear time-axis resampling of a feature sequence
    (reference warp-time filter); factor > 1 stretches."""
    filter_name = "warp-time"

    def apply(self, inputs):
        s = inputs[""]
        factor = self.attr("factor", 1.0, float)
        T = int(s.data.shape[-2])
        new_T = max(int(round(T * factor)), 1)
        src = jnp.clip((jnp.arange(new_T) / factor).astype(jnp.int32), 0, T - 1)
        return {"": s.with_data(jnp.take(s.data, src, axis=-2),
                                frame_shift=s.shift / factor)}


@register
class CutterNode(Node):
    """generic-cutter: keep a frame range, by index (``start``/``end``)
    or by time (``start-time``/``end-time`` in seconds, matching the
    reference src/Flow/Cutter.cc:24-26 parameter names: the first frame
    emitted is the first with start >= start-time, the last has
    start <= end-time)."""
    filter_name = "generic-cutter"

    def apply(self, inputs):
        s = inputs[""]
        T = int(s.data.shape[-2])
        if "start-time" in self.attrs or "end-time" in self.attrs:
            t0 = self.attr("start-time", 0.0, float)
            t1 = self.attr("end-time", None, float)
            start = max(0, int(math.ceil((t0 - s.start_time) / s.shift
                                         - 1e-9)))
            if t1 is None:
                end = T
            else:  # inclusive: frames whose start <= end-time
                end = min(T, int(math.floor((t1 - s.start_time) / s.shift
                                            + 1e-9)) + 1)
        else:
            start = self.attr("start", 0, lambda v: int(float(v)))
            end = self.attr("end", 0, lambda v: int(float(v)))
            end = end if end > 0 else T
        return {"": s.with_data(
            s.data[..., start:end, :],
            start_time=s.start_time + start * s.shift)}


@register
class SynchronizationNode(Node):
    """generic-synchronization (src/Flow/Synchronization.hh:23): drop
    input elements whose start-times do not occur in the ``target``
    stream, so the output matches the target's frame count and times.
    With this framework's uniform-timestamp streams the overlap is a
    contiguous frame range."""
    filter_name = "generic-synchronization"
    in_ports = ("", "target")
    out_ports = ("", "target")

    def apply(self, inputs):
        s = inputs[""]
        tgt = inputs["target"]
        offset = int(round((tgt.start_time - s.start_time) / s.shift))
        n = int(tgt.data.shape[-2])
        start = max(0, offset)
        out = s.data[..., start:start + n, :]
        return {"": s.with_data(out, start_time=tgt.start_time),
                "target": tgt}


@register
class TimestampCopyNode(Node):
    """timestamp-copy (src/Flow/Synchronization.hh:60): keep the input
    data but stamp it with the target stream's times."""
    filter_name = "timestamp-copy"
    in_ports = ("", "target")

    def apply(self, inputs):
        s = inputs[""]
        tgt = inputs["target"]
        return {"": s.with_data(s.data, start_time=tgt.start_time,
                                frame_shift=tgt.frame_shift,
                                sample_rate=tgt.sample_rate)}


@register
class RepeaterNode(Node):
    """generic-repeater: repeat each frame `count` times."""
    filter_name = "generic-repeater"

    def apply(self, inputs):
        s = inputs[""]
        count = self.attr("count", 1, lambda v: int(float(v)))
        return {"": s.with_data(jnp.repeat(s.data, count, axis=-2),
                                frame_shift=s.shift / count)}


@register
class CacheNode(Node):
    """generic-cache: archive-backed caching (src/Flow/Cache.hh).  In the
    compiled pipeline this is a pass-through marker; the feature-extraction
    driver handles archive reads/writes around the jitted program."""
    filter_name = "generic-cache"
    host_only = True

    def apply(self, inputs):
        return {"": inputs[""]}


@register
class AggregateNode(Node):
    """generic-aggregation-vector-f32: bundle multiple streams (multi-stream
    Flow::Aggregate).  Represented as a tuple in meta."""
    filter_name = "generic-aggregation-vector-f32"
    in_ports = ("*",)

    def apply(self, inputs):
        ordered = [inputs[k] for k in sorted(inputs.keys())]
        base = ordered[0]
        return {"": base.with_data(base.data,
                                   meta={**base.meta,
                                         "streams": tuple(s.data for s in ordered)})}
