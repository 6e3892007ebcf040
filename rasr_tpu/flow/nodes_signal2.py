"""Third tier of Signal Flow filters: the remaining registrations of
src/Signal/Module.cc — complex-spectrum part extraction and layout
conversion, inverse FFTs, per-vector normalizations, vector resize/cut,
IIR/FIR filtering, AR-to-spectrum, projection, random sources,
sequence aggregation, segmentwise formants, and Bayes classification.

Complex spectra are represented as native complex arrays (the forward
FFT node emits `jax.lax.complex`), so the reference's alternating
re/im-layout nodes become direct part extraction here.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from ..signal import dsp
from .data import Stream
from .nodes import Node, register
from .nodes import MatrixMultiplication


# --------------------------------------------------------------------------
# complex-spectrum parts and layout conversions
# (src/Signal/ComplexVectorFunction.hh)
# --------------------------------------------------------------------------


@register
class ComplexRealPart(Node):
    """signal-vector-alternating-complex-f32-real-part: Re(X_k)."""
    filter_name = "signal-vector-alternating-complex-f32-real-part"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(jnp.real(s.data).astype(jnp.float32))}


@register
class ComplexImaginaryPart(Node):
    """signal-vector-alternating-complex-f32-imaginary-part: Im(X_k)."""
    filter_name = "signal-vector-alternating-complex-f32-imaginary-part"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(jnp.imag(s.data).astype(jnp.float32))}


@register
class ComplexPhase(Node):
    """signal-vector-alternating-complex-f32-phase: arg(X_k)."""
    filter_name = "signal-vector-alternating-complex-f32-phase"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(jnp.angle(s.data).astype(jnp.float32))}


@register
class ComplexAbsoluteSquare(Node):
    """signal-vector-alternating-complex-f32-absolute-square: |X_k|^2
    (src/Signal/ComplexVectorFunction.hh alternatingComplexVectorAbsoluteSquare)."""
    filter_name = "signal-vector-alternating-complex-f32-absolute-square"

    def apply(self, inputs):
        s = inputs[""]
        x = s.data
        out = (jnp.real(x) ** 2 + jnp.imag(x) ** 2).astype(jnp.float32)
        return {"": s.with_data(out)}


@register
class VectorToComplex(Node):
    """signal-vector-f32-to-vector-alternating-complex-f32: real vector to
    complex spectrum layout with zero imaginary parts."""
    filter_name = "signal-vector-f32-to-vector-alternating-complex-f32"
    out_datatype = "vector-alternating-complex-f32"

    def apply(self, inputs):
        s = inputs[""]
        x = s.data.astype(jnp.float32)
        return {"": s.with_data(jax.lax.complex(x, jnp.zeros_like(x)))}


class _ComplexRelabel(Node):
    """Layout conversions between 'alternating' and 'complex' packing are
    identities here: both are native complex arrays."""

    def apply(self, inputs):
        return {"": inputs[""]}


@register
class AlternatingToComplex(_ComplexRelabel):
    filter_name = "signal-vector-alternating-complex-f32-to-vector-complex-f32"
    out_datatype = "vector-complex-f32"


@register
class ComplexToAlternating(_ComplexRelabel):
    filter_name = "signal-vector-complex-f32-to-vector-alternating-complex-f32"
    out_datatype = "vector-alternating-complex-f32"


# --------------------------------------------------------------------------
# inverse / complex FFT nodes (src/Signal/FastFourierTransform.hh:229;
# inverse continuous scaling 2/sample-rate at FastFourierTransform.cc:125-132)
# --------------------------------------------------------------------------


@register
class RealInverseFastFourierTransform(Node):
    """signal-real-inverse-fast-fourier-transform: complex half-spectrum
    (fft_len//2+1 bins) back to fft_len real samples.  Inverts the forward
    node exactly when `apply-scale` undoes the forward 1/sample-rate
    factor."""
    filter_name = "signal-real-inverse-fast-fourier-transform"

    def apply(self, inputs):
        s = inputs[""]
        fft_len = int(s.meta.get("fft_length",
                                 2 * (int(s.data.shape[-1]) - 1)))
        x = jnp.fft.irfft(s.data, n=fft_len, axis=-1)
        if self.attr("apply-scale", True, bool):
            scale = float(s.meta.get("fft_scale", 1.0))
            if scale != 1.0:
                x = x / scale
        meta = {k: v for k, v in s.meta.items()
                if k not in ("fft_length", "fft_scale")}
        return {"": s.with_data(x.astype(jnp.float32), meta=meta)}


@register
class ComplexFastFourierTransform(Node):
    """signal-complex-fast-fourier-transform: full complex DFT."""
    filter_name = "signal-complex-fast-fourier-transform"
    out_datatype = "vector-alternating-complex-f32"

    def apply(self, inputs):
        s = inputs[""]
        explicit_len = self.attr("length", 0, lambda v: int(float(v)))
        n = explicit_len or dsp.fft_length_for(int(s.data.shape[-1]))
        out = jnp.fft.fft(s.data, n=n, axis=-1)
        return {"": s.with_data(out, meta={**s.meta, "fft_length": n})}


@register
class ComplexInverseFastFourierTransform(Node):
    """signal-complex-inverse-fast-fourier-transform: full complex
    inverse DFT (unnormalized pair with the forward node, like the
    reference's FFT which folds 1/N into the inverse)."""
    filter_name = "signal-complex-inverse-fast-fourier-transform"
    out_datatype = "vector-alternating-complex-f32"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(jnp.fft.ifft(s.data, axis=-1))}


# --------------------------------------------------------------------------
# per-vector normalizations (src/Signal/VectorNormalization.hh) — each
# normalizes every frame independently along the feature axis
# --------------------------------------------------------------------------


def _vector_normalization(name, fn, doc):
    class _Norm(Node):
        __doc__ = doc
        filter_name = name

        def apply(self, inputs):
            s = inputs[""]
            return {"": s.with_data(fn(s.data))}

    _Norm.__name__ = "VectorNormalization_" + name
    return register(_Norm)


def _mean_norm(x):
    return x - jnp.mean(x, axis=-1, keepdims=True)


def _variance_norm(x):
    m = jnp.mean(x, axis=-1, keepdims=True)
    dev = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True) - m * m)
    return (x - m) / dev


def _energy_norm(x):
    e = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / e


def _mean_energy_norm(x):
    e = jnp.sqrt(jnp.mean(jnp.square(x), axis=-1, keepdims=True))
    return x / e


def _maximum_norm(x):
    return x / jnp.max(x, axis=-1, keepdims=True)


def _amp_spec_energy_norm(x):
    # half-spectrum energy: (x0^2 + xN^2 + 2*sum(middle^2)) / (2*(size-1))
    sq = jnp.square(x)
    mid = jnp.sum(sq[..., 1:-1], axis=-1, keepdims=True)
    e = (sq[..., :1] + sq[..., -1:] + 2.0 * mid) / (2.0 * (x.shape[-1] - 1))
    return x / jnp.sqrt(e)


_vector_normalization(
    "signal-vector-f32-mean-normalization", _mean_norm,
    "subtract the frame mean (MeanVectorNormalization).")
_vector_normalization(
    "signal-vector-f32-variance-normalization", _variance_norm,
    "zero-mean unit-variance per frame (VarianceVectorNormalization).")
_vector_normalization(
    "signal-vector-f32-energy-normalization", _energy_norm,
    "divide by sqrt of frame energy (EnergyVectorNormalization).")
_vector_normalization(
    "signal-vector-f32-mean-energy-normalization", _mean_energy_norm,
    "divide by sqrt of mean frame energy (MeanEnergyVectorNormalization).")
_vector_normalization(
    "signal-vector-f32-maximum-normalization", _maximum_norm,
    "divide by the frame maximum (MaximumVectorNormalization).")
_vector_normalization(
    "signal-vector-f32-amplitude-spectrum-energy-normalization",
    _amp_spec_energy_norm,
    "divide by half-spectrum frame energy "
    "(AmplitudeSpectrumEnergyVectorNormalization).")


# --------------------------------------------------------------------------
# resize / cut (src/Signal/VectorResize.hh, VectorCut.hh)
# --------------------------------------------------------------------------


@register
class VectorResize(Node):
    """signal-vector-f32-resize: pad/truncate each frame to a new size
    (attrs new-discrete-size | new-size [continuous, x sample rate],
    initial-value, change-front, relative-change)."""
    filter_name = "signal-vector-f32-resize"

    def apply(self, inputs):
        s = inputs[""]
        d = int(s.data.shape[-1])
        cont = self.attr("new-size", 0.0, float)
        sr = s.meta.get("audio_sample_rate", s.sample_rate)
        new = self.attr("new-discrete-size", 0, lambda v: int(float(v))) \
            or (int(round(cont * sr)) if cont else d)
        if self.attr("relative-change", False, bool):
            new = d + new
        fill = self.attr("initial-value", 0.0, float)
        front = self.attr("change-front", False, bool)
        x = s.data
        if new == d:
            return {"": s}
        if new < d:
            x = x[..., d - new:] if front else x[..., :new]
        else:
            pad = [(0, 0)] * (x.ndim - 1) + [(new - d, 0) if front
                                             else (0, new - d)]
            x = jnp.pad(x, pad, constant_values=fill)
        return {"": s.with_data(x)}


@register
class VectorCutLength(Node):
    """signal-vector-f32-cut-length: keep [first..last] (inclusive,
    continuous units x sample rate — src/Signal/VectorCut.hh)."""
    filter_name = "signal-vector-f32-cut-length"

    def _bounds(self, s: Stream):
        sr = s.meta.get("audio_sample_rate", s.sample_rate)
        d = int(s.data.shape[-1])
        f = int(round(self.attr("first", 0.0, float) * sr))
        l = min(int(round(self.attr("last", 0.0, float) * sr)), d - 1)
        return f, l

    def apply(self, inputs):
        s = inputs[""]
        f, l = self._bounds(s)
        return {"": s.with_data(s.data[..., f:l + 1])}


@register
class VectorCutRelativeLength(VectorCutLength):
    """signal-vector-f32-cut-relative-length: first/last as fractions of
    the input dimension (VectorCutRelativeLength)."""
    filter_name = "signal-vector-f32-cut-relative-length"

    def _bounds(self, s: Stream):
        d = int(s.data.shape[-1])
        f = int(round(self.attr("first", 0.0, float) * (d - 1)))
        l = min(int(round(self.attr("last", 1.0, float) * (d - 1))), d - 1)
        return f, l


@register
class VectorCutRelativeSurface(Node):
    """signal-vector-f32-cut-relative-surface: cut where the cumulative
    magnitude ("surface") of the segment-mean frame reaches the first/last
    fractions (VectorCutRelativeSurface; evaluated on the segment mean here
    so the cut is one static slice for the whole fused segment)."""
    filter_name = "signal-vector-f32-cut-relative-surface"
    host_only = True

    def apply(self, inputs):
        s = inputs[""]
        x = np.asarray(s.data)
        prof = np.abs(x).mean(axis=tuple(range(x.ndim - 1)))
        cum = np.cumsum(prof)
        total = cum[-1] if cum[-1] > 0 else 1.0
        f_frac = self.attr("first", 0.0, float)
        l_frac = self.attr("last", 1.0, float)
        f = int(np.searchsorted(cum, f_frac * total))
        l = min(int(np.searchsorted(cum, l_frac * total)), x.shape[-1] - 1)
        return {"": s.with_data(x[..., f:l + 1])}


# --------------------------------------------------------------------------
# linear (IIR) and windowing FIR filters (src/Signal/LinearFilter.hh,
# WindowingFirFilter.hh)
# --------------------------------------------------------------------------


def _parse_coeffs(spec: str):
    return [float(v) for v in spec.replace(",", " ").split()]


@register
class LinearFilter(Node):
    """signal-linear-filter: direct-form IIR y[n] = sum_j b[j]*x[n-j] -
    sum_i a[i]*y[n-i] along the time axis (src/Signal/LinearFilter.hh),
    realized as a lax.scan so it stays inside the fused program."""
    filter_name = "signal-linear-filter"

    def apply(self, inputs):
        s = inputs[""]
        b = jnp.asarray(_parse_coeffs(self.attr("b", "1.0")), jnp.float32)
        a = jnp.asarray(_parse_coeffs(self.attr("a", "")), jnp.float32) \
            if self.attr("a", "") else jnp.zeros((0,), jnp.float32)
        x = s.data.astype(jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        nb, na = int(b.shape[0]), int(a.shape[0])

        def step(carry, xt):
            u, y = carry  # u: (B, nb) past inputs, y: (B, na) past outputs
            u = jnp.concatenate([xt[:, None], u[:, :-1]], axis=1)
            yt = u @ b
            if na:
                yt = yt - y @ a
                y = jnp.concatenate([yt[:, None], y[:, :-1]], axis=1)
            return (u, y), yt

        B = x.shape[0]
        init = (jnp.zeros((B, nb), jnp.float32),
                jnp.zeros((B, max(na, 1)), jnp.float32))
        _, out = jax.lax.scan(step, init, x.T)
        out = out.T
        if squeeze:
            out = out[0]
        return {"": s.with_data(out)}


@register
class WindowingFirFilter(Node):
    """signal-windowing-fir-filter: FIR convolution over the sample
    stream with coefficients from attr `coefficients` or a file
    (src/Signal/WindowingFirFilter.hh); same-length output (delay
    compensated by (len-1)//2 like the reference's center alignment)."""
    filter_name = "signal-windowing-fir-filter"

    def apply(self, inputs):
        s = inputs[""]
        spec = self.attr("coefficients", "")
        if not spec and self.attr("file", ""):
            spec = open(self.attr("file")).read()
        h = np.asarray(_parse_coeffs(spec or "1.0"), np.float32)
        x = s.data.astype(jnp.float32)
        squeeze = x.ndim == 1
        if squeeze:
            x = x[None, :]
        k = len(h)
        lo = (k - 1) // 2
        xp = jnp.pad(x, [(0, 0), (lo, k - 1 - lo)])
        out = jax.lax.conv_general_dilated(
            xp[:, None, :], jnp.asarray(h[::-1].copy())[None, None, :],
            window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "IOH", "NCH"))[:, 0, :]
        if squeeze:
            out = out[0]
        return {"": s.with_data(out)}


# --------------------------------------------------------------------------
# AR-to-spectrum / projection / random source / aggregation
# --------------------------------------------------------------------------


@register
class AutoregressionToSpectrum(Node):
    """nn-autoregression-to-spectrum (src/Signal/AutoregressionToSpectrum.hh):
    input frames pack [gain, a_1..a_p]; output `nr-outputs` log-spectrum
    samples of the all-poles model on [0, pi]."""
    filter_name = "nn-autoregression-to-spectrum"

    def apply(self, inputs):
        s = inputs[""]
        n_out = self.attr("nr-outputs", 129, lambda v: int(float(v)))
        x = s.data
        gain, a = x[..., :1], x[..., 1:]
        p = int(a.shape[-1])
        omega = np.pi * np.arange(n_out) / max(n_out - 1, 1)
        j = np.arange(1, p + 1)
        cos_m = np.cos(np.outer(j, omega)).astype(np.float32)  # (p, n_out)
        sin_m = np.sin(np.outer(j, omega)).astype(np.float32)
        re = 1.0 + a @ jnp.asarray(cos_m)
        im = a @ jnp.asarray(sin_m)
        denom = jnp.maximum(re * re + im * im, 1e-20)
        spec = jnp.log(jnp.maximum(gain, 1e-20)) - jnp.log(denom)
        return {"": s.with_data(spec)}


@register
class ProjectionF32(Node):
    """projection-f32 (src/Signal/ProjectionNode.hh): reorder/discard
    components by a mapping file (line i = source component of output i,
    -1 discards) or attr `components` ("0 2 5...")."""
    filter_name = "projection-f32"

    _cache: Dict[str, np.ndarray] = {}

    def apply(self, inputs):
        s = inputs[""]
        spec = self.attr("components", "")
        if spec:
            comp = np.asarray([int(float(v)) for v in spec.split()], np.int32)
        else:
            path = self.attr("file", "")
            if not path:
                raise ValueError("projection-f32 needs components or file")
            comp = self._cache.get(path)
            if comp is None:
                comp = np.asarray(
                    [int(float(v)) for v in open(path).read().split()],
                    np.int32)
                self._cache[path] = comp
        keep = comp[comp >= 0]
        return {"": s.with_data(s.data[..., keep])}


@register
class RandomVectorF32(Node):
    """signal-random-vector-f32 (src/Signal/RandomVector.hh): source of
    pseudo-random vectors (attrs size, nr-outputs, sample-rate,
    frame-shift, seed); also usable as a sleeve adding noise is NOT
    reference behavior — it is a pure source, inputs are ignored."""
    filter_name = "signal-random-vector-f32"
    in_ports = ()

    def apply(self, inputs):
        size = self.attr("size", 1, lambda v: int(float(v)))
        n = self.attr("nr-outputs", 1, lambda v: int(float(v)))
        seed = self.attr("seed", 0, lambda v: int(float(v)))
        sr = self.attr("sample-rate", 1.0, float)
        shift = self.attr("frame-shift", 0.0, float) or 1.0 / sr
        data = jax.random.normal(jax.random.PRNGKey(seed), (n, size),
                                 jnp.float32)
        return {"": Stream(data=data, sample_rate=1.0 / shift,
                           start_time=self.attr("start-time", 0.0, float),
                           frame_shift=shift)}


@register
class VectorSequenceAggregation(Node):
    """signal-vector-f32-sequence-aggregation
    (src/Signal/VectorSequenceAggregation.hh): collect the frame sequence
    into one aggregate packet — whole-segment streams already are the
    aggregate, so this relabels the datatype (expand-timestamp covers the
    full segment span by construction)."""
    filter_name = "signal-vector-f32-sequence-aggregation"
    out_datatype = "aggregate-vector-f32"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(s.data, meta={**s.meta, "aggregate": True})}


# --------------------------------------------------------------------------
# segmentwise formants / Bayes classification (host analysis nodes)
# --------------------------------------------------------------------------


@register
class FormantSegmentwise(Node):
    """signal-formant-segmentwise (src/Signal/Formant.hh
    SegmentwiseFormantExtractionNode): per-frame formant frequencies
    (+bandwidths) via LPC root finding on the host."""
    filter_name = "signal-formant-segmentwise"
    host_only = True

    def apply(self, inputs):
        from ..signal.analysis import extract_formants
        s = inputs[""]
        sr = float(s.meta.get("audio_sample_rate", s.sample_rate))
        n_f = self.attr("nr-formants", 4, lambda v: int(float(v)))
        order = self.attr("order", 12, lambda v: int(float(v)))
        x = np.asarray(s.data)
        if x.ndim == 1:
            x = x[None, :]
        rows = []
        for frame in x:
            fs = extract_formants(frame, sr, order=order)[:n_f]
            row = [0.0] * (2 * n_f)
            for i, f in enumerate(fs):
                row[i] = f.frequency
                row[n_f + i] = f.bandwidth
            rows.append(row)
        return {"": s.with_data(np.asarray(rows, np.float32))}


class _BayesBase(Node):
    """Shared scoring: per-class -log likelihood accumulated over the
    segment's frames, uniform prior (src/Signal/BayesClassification.hh:
    argmin_k -log(p(k) p(x|k)), IndependentSequence likelihood).  Class
    models come from a mixture-set file (mixture index = class)."""
    host_only = True
    _cache: Dict[str, object] = {}

    def _scores(self, s: Stream) -> np.ndarray:
        path = self.attr("likelihood-function.file",
                         self.attr("class-model-file", ""))
        if not path:
            raise ValueError(f"node {self.name}: needs a class model "
                             "(likelihood-function.file)")
        scorer = self._cache.get(path)
        if scorer is None:
            from ..mm.mixture_set import MixtureSet
            from ..mm.scorer import GmmScorer
            scorer = GmmScorer(MixtureSet.read_pms(path))
            self._cache[path] = scorer
        x = np.asarray(s.data, np.float32)
        if x.ndim == 1:
            x = x[None, :]
        n_used = self.attr("number-of-used-features", 0,
                           lambda v: int(float(v)))
        if n_used:
            x = x[:n_used]
        return np.asarray(scorer.score(x)).sum(axis=0)  # (n_classes,)

    def _labels(self, n: int):
        path = self.attr("class-labels-file", "")
        if path:
            labels = [ln.strip() for ln in open(path) if ln.strip()]
            if len(labels) >= n:
                return labels[:n]
        return [f"class-{i}" for i in range(n)]


@register
class BayesClassification(_BayesBase):
    """signal-bayes-classification: segment-level Bayes decision — emits
    the winning class label as a string stream."""
    filter_name = "signal-bayes-classification"
    out_datatype = "string"

    def apply(self, inputs):
        s = inputs[""]
        scores = self._scores(s)
        label = self._labels(len(scores))[int(np.argmin(scores))]
        return {"": s.with_data([label])}


@register
class BayesClassificationScore(_BayesBase):
    """signal-bayes-classification-score: accumulated per-class scores as
    one vector (BayesClassificationScoreNode getScores path)."""
    filter_name = "signal-bayes-classification-score"

    def apply(self, inputs):
        s = inputs[""]
        scores = self._scores(s)
        return {"": s.with_data(scores[None, :].astype(np.float32))}


@register
class FastMatrixMultiplication(MatrixMultiplication):
    """signal-fast-matrix-multiplication-f32: same contract as
    signal-matrix-multiplication-f32 (the reference's variant only changes
    the CPU kernel; XLA GEMM serves both — src/Signal/MatrixMult.hh)."""
    filter_name = "signal-fast-matrix-multiplication-f32"
