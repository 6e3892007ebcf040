"""DSP primitives for the feature front-end, TPU-first.

Batched, jit-friendly JAX implementations of the reference Signal filters
with numerically faithful semantics:

  * preemphasis          — src/Signal/Preemphasis.cc (segment-initial sample
                           convention: previous := x[0])
  * framing / windowing  — src/Signal/WindowBuffer.cc (frame count rule:
                           frames at p=0,shift,... while N-p > length, plus
                           one final short frame), src/Signal/WindowFunction.cc
                           (symmetric windows, M = length-1)
  * real FFT             — src/Signal/FastFourierTransform.cc (length =
                           next pow2, right zero-padding, apply-scale
                           multiplies by 1/sample-rate)
  * amplitude spectrum   — signal-vector-alternating-complex-f32-amplitude
  * Mel filterbank       — src/Signal/Filterbank.cc (stretch-to-cover
                           boundary, triangular filters in the warped domain,
                           derivative-of-warping weighting)
  * log10                — generic-vector-f32-log is log10
                           (src/Flow/SimpleFunction.hh:43)
  * DCT                  — src/Signal/CosineTransform.cc
                           (even-about-N-minus-half input type)
  * CMVN                 — src/Signal/Normalization.hh (segment-wise and
                           sliding-window mean / mean+variance)
  * delta regression     — src/Signal/Regression.hh (least-squares derivative
                           over a ±k window, edge frames replicated per the
                           signal-delay copy margin policy)

Filter/DCT/window matrices are built on host in float64 (as the reference
does) and applied on device in float32.  All `apply`-style functions take
either (T, D) single segments or (B, T, D) batches.
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# ---------------------------------------------------------------------------
# window functions (reference: src/Signal/WindowFunction.cc)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def window_function(kind: str, length: int) -> np.ndarray:
    """Symmetric window coefficients, float64 host-side (M = length-1)."""
    if length <= 1:
        return np.ones((max(length, 1),), dtype=np.float64)
    M = length - 1
    n = np.arange(length, dtype=np.float64)
    if kind == "rectangular":
        w = np.ones((length,), dtype=np.float64)
    elif kind == "hamming":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / M)
    elif kind == "hanning":
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / M)
    elif kind == "periodic-hanning":
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / length)
    elif kind == "bartlett":
        w = 1.0 - np.abs(2.0 * n - M) / M
    elif kind == "blackman":
        w = (0.42 - 0.5 * np.cos(2.0 * np.pi * n / M)
             + 0.08 * np.cos(4.0 * np.pi * n / M))
    elif kind == "kaiser" or kind.startswith("kaiser:"):
        # src/Signal/KaiserWindowFunction.hh; default beta ~ 4.86 matches
        # the reference's default transition design; "kaiser:<beta>"
        # selects the shape parameter explicitly
        beta = float(kind.split(":", 1)[1]) if ":" in kind else 4.86
        w = np.kaiser(length, beta)
    else:
        raise ValueError(f"unknown window type {kind!r}")
    return w


def n_frames(n_samples: int, length: int, shift: int) -> int:
    """Frame count per reference WindowBuffer get()/flush() semantics:
    a frame at every shift position p while n - p > length, plus one final
    (possibly short) frame (src/Signal/WindowBuffer.cc)."""
    if n_samples <= 0:
        return 0
    if n_samples <= length:
        return 1
    return int(math.ceil((n_samples - length) / shift)) + 1


def preemphasis(x: jnp.ndarray, alpha: float = 1.0) -> jnp.ndarray:
    """y[t] = x[t] - alpha*x[t-1]; y[0] = x[0] - alpha*x[0]
    (reference initializes previous := first sample at segment start,
    src/Signal/Preemphasis.cc init)."""
    prev = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    return x - alpha * prev


def frame_signal(x: jnp.ndarray, length: int, shift: int,
                 num_frames: int) -> jnp.ndarray:
    """Slice (..., N) samples into (..., num_frames, length) frames with
    zero padding past the end.  `num_frames` must be static (use n_frames)."""
    n = x.shape[-1]
    pad_to = (num_frames - 1) * shift + length
    if pad_to > n:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, pad_to - n)]
        x = jnp.pad(x, pad)
    idx = jnp.arange(num_frames)[:, None] * shift + jnp.arange(length)[None, :]
    return x[..., idx]


def apply_window(frames: jnp.ndarray, kind: str = "hamming") -> jnp.ndarray:
    w = jnp.asarray(window_function(kind, frames.shape[-1]), dtype=frames.dtype)
    return frames * w


def fft_length_for(max_input_size: int) -> int:
    """FFT length = next power of two (src/Signal/FastFourierTransform.cc
    setLength)."""
    if max_input_size <= 0:
        return 0
    power = math.log2(float(max_input_size))
    power = round(power) if abs(power - round(power)) < 1e-9 else math.ceil(power)
    return 1 << int(power)


@lru_cache(maxsize=None)
def dft_matrices(length: int, fft_len: int) -> Tuple[np.ndarray, np.ndarray]:
    """(cos, sin) real-DFT matrices of shape (length, fft_len//2+1), float64.

    On TPU a 512-point transform is faster and *more accurate* as two MXU
    matmuls in Precision.HIGHEST than as the backend FFT (which costs ~1e-4
    absolute error on the log-mel chain); zero-padding beyond `length` is
    implicit since those rows are zero.
    """
    n_bins = fft_len // 2 + 1
    n = np.arange(length, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    angle = -2.0 * np.pi * n * k / fft_len
    return np.cos(angle), np.sin(angle)


def rdft(frames: jnp.ndarray, fft_len: int,
         scale: float = 1.0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Real DFT (re, im) of right-zero-padded frames via MXU matmuls.

    Matches the reference real FFT + unpack to fft_len//2+1 complex bins
    (src/Signal/FastFourierTransform.cc); `scale` is the apply-scale factor
    1/sample-rate (estimateContinuous)."""
    length = frames.shape[-1]
    if length > fft_len:
        frames = frames[..., :fft_len]
        length = fft_len
    cos_m, sin_m = dft_matrices(length, fft_len)
    x = frames.astype(jnp.float32)
    re = jnp.matmul(x, jnp.asarray(cos_m, jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.matmul(x, jnp.asarray(sin_m, jnp.float32),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
    s = jnp.asarray(scale, dtype=jnp.float32)
    return re * s, im * s


def rfft_amplitude(frames: jnp.ndarray, fft_len: int,
                   scale: float = 1.0) -> jnp.ndarray:
    """Amplitude spectrum of right-zero-padded real FFT (fft_len//2+1 bins)."""
    re, im = rdft(frames, fft_len, scale)
    return jnp.sqrt(re * re + im * im)


# ---------------------------------------------------------------------------
# Mel filterbank (reference: src/Signal/Filterbank.cc)
# ---------------------------------------------------------------------------

_MEL_SCALE = 2595.0
_LN10 = math.log(10.0)


def mel_warp(f):
    return _MEL_SCALE * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_unwarp(m):
    return (np.power(10.0, np.asarray(m, dtype=np.float64) / _MEL_SCALE) - 1.0) * 700.0


def mel_warp_derivative(f):
    return _MEL_SCALE / _LN10 / (700.0 + np.asarray(f, dtype=np.float64))


def _is_almost_integer(x: float, tol: float = 1e-10) -> bool:
    return abs(x - round(x)) < tol


def filterbank_matrix(n_bins: int,
                      bin_to_hz: float,
                      filter_width: float = 268.258,
                      spacing: float = 0.0,
                      boundary: str = "stretch-to-cover",
                      warping: str = "mel",
                      filter_type: str = "triangular",
                      minimum_frequency: float = 0.0,
                      maximum_frequency: Optional[float] = None,
                      normalize_surface: bool = False,
                      warp_differential_unit: bool = True,
                      ) -> np.ndarray:
    """(n_filters, n_bins) float64 filter matrix, built exactly as the
    reference FilterBank::init (triangular mel for mfcc.flow; trapeze bark
    with include-boundary for plp.flow; arbitrary warpings incl. VTLN via
    analytic-function declarations like 'nest(linear-2(1.2, 0.875), mel)').

    `bin_to_hz` is the discrete-to-continuous factor (sample_rate/fft_len);
    `filter_width`/`spacing` are in warped units.
    """
    if warping == "mel":
        warp, unwarp, dwarp = mel_warp, mel_unwarp, mel_warp_derivative
    elif warping == "bark":
        warp = lambda f: 6.0 * np.arcsinh(np.asarray(f, np.float64) / 600.0)
        unwarp = lambda b: 600.0 * np.sinh(np.asarray(b, np.float64) / 6.0)
        dwarp = lambda f: (6.0 / 600.0
                           / np.sqrt(1.0 + (np.asarray(f, np.float64) / 600.0) ** 2))
    elif warping in ("none", "identity", ""):
        warp = unwarp = lambda f: np.asarray(f, dtype=np.float64)
        dwarp = lambda f: np.ones_like(np.asarray(f, dtype=np.float64))
    else:
        # general declaration via the analytic-function factory
        from ..math.analytic import AnalyticFunctionFactory
        factory = AnalyticFunctionFactory(
            sample_rate=1.0, max_argument=(n_bins - 1) * bin_to_hz)
        fn = factory.create(warping)
        inv = fn.invert()
        der = fn.derive()
        if inv is None or der is None:
            raise ValueError(f"warping {warping!r} not invertible/derivable")
        warp, unwarp, dwarp = fn.value, inv.value, der.value

    def d2c(i):  # discrete index -> continuous Hz
        return np.asarray(i, dtype=np.float64) * bin_to_hz

    def c2d_warped(m):  # warped value -> discrete index
        return unwarp(m) / bin_to_hz

    if filter_type == "triangular":
        norm_center = 0.5
    elif filter_type in ("trapeze", "trapezeRasta"):
        # reference TrapezeFilterBuilder: flanks -2.5..+1.3 in warped units
        norm_center = 2.5 / 3.8
    else:
        raise ValueError(f"unknown filter type {filter_type!r}")
    max_f = float(warp(d2c(n_bins - 1))) if maximum_frequency is None \
        else float(maximum_frequency)
    min_f = float(minimum_frequency)
    width = float(filter_width)
    space = float(spacing) if spacing else norm_center * width

    if boundary == "stretch-to-cover":
        nf = (max_f - min_f - width) / space + 1.0
        nf = 1.0 if nf < 1 else (round(nf) if _is_almost_integer(nf) else nf)
        n_filters = int(math.floor(nf))
        coverage = (space * (n_filters - 1) + width) / (max_f - min_f)
        if not (n_filters == 1 and coverage > 1.0 + 1e-9):
            width /= coverage
            space /= coverage
        centers = [min_f + space * i + norm_center * width
                   for i in range(n_filters)]
    elif boundary == "include-boundary":
        nf = (max_f - (1.0 - norm_center) * width) / space
        nf = 1.0 if nf < 1 else (round(nf) if _is_almost_integer(nf) else nf)
        n_filters = int(math.ceil(nf))
        centers = [space * (i + 1) for i in range(n_filters)]
    elif boundary == "emphasize-boundary":
        nf = max_f / space + 1.0
        nf = 1.0 if nf < 1 else (round(nf) if _is_almost_integer(nf) else nf)
        n_filters = int(math.floor(nf))
        centers = [space * i for i in range(n_filters)]
    else:
        raise ValueError(f"unknown boundary type {boundary!r}")

    matrix = np.zeros((n_filters, n_bins), dtype=np.float64)
    for fi, center in enumerate(centers):
        start = c2d_warped(max(center - norm_center * width, min_f))
        start = round(start) if _is_almost_integer(start) else math.ceil(start)
        start = int(max(start, 0))
        end = c2d_warped(min(center + (1.0 - norm_center) * width, max_f))
        end = round(end) + 1 if _is_almost_integer(end) else math.ceil(end)
        end = int(min(end, n_bins))
        if end <= start:
            continue
        bins = np.arange(start, end, dtype=np.float64)
        warped = warp(d2c(bins))
        if filter_type == "triangular":
            w = np.maximum(1.0 - np.abs(warped - center) / (width / 2.0), 0.0)
        else:
            # trapeze (TrapezeFilterBuilder::weight): flat middle
            # +-0.5/3.8*width, 10^z rising left flank, 10^-2.5z falling right
            rel = warped - center
            mid = (0.5 / 3.8) * width
            w = np.where(rel < -mid, np.power(10.0, rel + mid),
                         np.where(rel <= mid, 1.0,
                                  np.power(10.0, -2.5 * (rel - mid))))
        if warp_differential_unit:
            w = w * dwarp(d2c(bins))
        matrix[fi, start:end] = w
    if normalize_surface:
        sums = matrix.sum(axis=1, keepdims=True)
        matrix = matrix / np.where(sums == 0, 1.0, sums)
    return matrix


# ---------------------------------------------------------------------------
# cosine transform (reference: src/Signal/CosineTransform.cc)
# ---------------------------------------------------------------------------


def dct_matrix(n_outputs: int, n_inputs: int,
               input_type: str = "even-about-N-minus-half",
               normalize: bool = False) -> np.ndarray:
    """(n_outputs, n_inputs) float64 cosine-transform matrix."""
    T = np.zeros((n_outputs, n_inputs), dtype=np.float64)
    if input_type == "even-about-N-minus-half":
        N = n_inputs
        for k in range(n_outputs):
            omega = np.pi * (np.arange(N) + 0.5) / N
            T[k] = np.cos(omega * k)
    elif input_type == "N-plus-one":
        N = n_inputs - 1
        for k in range(n_outputs):
            T[k, 0] = 0.5
            T[k, N] = 0.5 * ((-1.0) ** k)
            n = np.arange(1, N)
            T[k, 1:N] = np.cos(np.pi * n / N * k)
    else:
        raise ValueError(f"unknown DCT input type {input_type!r}")
    if normalize:
        T = T / float(n_inputs if input_type == "even-about-N-minus-half"
                      else n_inputs - 1)
    return T


def apply_matrix(x: jnp.ndarray, matrix: np.ndarray) -> jnp.ndarray:
    """x @ matrix.T in full f32 (filterbank / DCT / LDA apply).

    Precision.HIGHEST keeps the TPU MXU in f32 pass mode — these matrices are
    tiny (D<=512), so this costs nothing and preserves the 1e-4 feature
    parity target on TPU (BASELINE.json)."""
    m = jnp.asarray(matrix, dtype=jnp.float32)
    return jnp.matmul(x, m.T, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)


_INV_LN10 = 1.0 / _LN10


def accurate_log(x: jnp.ndarray) -> jnp.ndarray:
    """Natural log with one Newton refinement step.

    The TPU VPU log approximation carries ~4.5e-5 absolute error, which
    breaks the 1e-4 feature-parity budget once 20 log-mel channels sum into
    cepstrum c0.  One Newton iteration on exp ( y += x*exp(-y) - 1 ) brings
    it to ~2e-6 at the cost of a single fused exp.

    Guarded at x <= 0: log(0) must stay -inf (the Newton step would turn
    it into 0*inf = NaN, which convolutional front-ends then smear into
    valid frames of zero-padded batches)."""
    y = jnp.log(x)
    return jnp.where(jnp.isfinite(y), y + (x * jnp.exp(-y) - 1.0), y)


def log10(x: jnp.ndarray) -> jnp.ndarray:
    """generic-vector-f32-log IS log10 (src/Flow/SimpleFunction.hh:43)."""
    return accurate_log(x) * jnp.asarray(_INV_LN10, dtype=x.dtype)


# ---------------------------------------------------------------------------
# normalization (reference: src/Signal/Normalization.hh)
# ---------------------------------------------------------------------------


def normalize_segment(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
                      variance: bool = True, eps: float = 0.0) -> jnp.ndarray:
    """Segment-wise CMVN over the time axis (-2).  `mask` is (..., T) with 1
    for valid frames (batched padded segments)."""
    if mask is None:
        mean = jnp.mean(x, axis=-2, keepdims=True)
        if not variance:
            return x - mean
        var = jnp.mean(jnp.square(x - mean), axis=-2, keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + eps + 1e-12)
    m = mask[..., None].astype(x.dtype)
    count = jnp.maximum(jnp.sum(m, axis=-2, keepdims=True), 1.0)
    mean = jnp.sum(x * m, axis=-2, keepdims=True) / count
    if not variance:
        return (x - mean) * m
    var = jnp.sum(jnp.square(x - mean) * m, axis=-2, keepdims=True) / count
    return (x - mean) * jax.lax.rsqrt(var + eps + 1e-12) * m


def sliding_normalization(x: jnp.ndarray, length: int, right: int,
                          variance: bool = False) -> jnp.ndarray:
    """Sliding-window mean (and variance) normalization: the window covers
    [t-(length-right-1) .. t+right] clamped to the segment (reference
    Normalization sliding semantics, src/Signal/Normalization.hh:66-69)."""
    T = x.shape[-2]
    cum = jnp.cumsum(x, axis=-2)
    cum = jnp.concatenate([jnp.zeros_like(cum[..., :1, :]), cum], axis=-2)
    t = jnp.arange(T)
    lo = jnp.clip(t - (length - right - 1), 0, T)
    hi = jnp.clip(t + right + 1, 0, T)
    count = (hi - lo).astype(x.dtype)[..., None]
    mean = (jnp.take(cum, hi, axis=-2) - jnp.take(cum, lo, axis=-2)) / count
    if not variance:
        return x - mean
    cum2 = jnp.cumsum(jnp.square(x), axis=-2)
    cum2 = jnp.concatenate([jnp.zeros_like(cum2[..., :1, :]), cum2], axis=-2)
    ex2 = (jnp.take(cum2, hi, axis=-2) - jnp.take(cum2, lo, axis=-2)) / count
    var = jnp.maximum(ex2 - jnp.square(mean), 0.0)
    return (x - mean) * jax.lax.rsqrt(var + 1e-12)


# ---------------------------------------------------------------------------
# voicedness (reference: src/Signal/CrossCorrelation.hh + PeakDetection.hh:
# normalized autocorrelation peak in the pitch lag range)
# ---------------------------------------------------------------------------


def voicedness(frames: jnp.ndarray, min_lag: int = 32,
               max_lag: int = 320) -> jnp.ndarray:
    """(T, L) windowed sample frames -> (T, 1) voicedness in [0, 1]:
    the maximum normalized autocorrelation over the pitch lag range
    (~50-500 Hz at 16 kHz).  Batched matmul-free formulation via FFT-style
    shifts is unnecessary at these sizes; the lag loop unrolls."""
    x = frames.astype(jnp.float32)
    L = x.shape[-1]
    max_lag = min(max_lag, L - 1)
    energy = jnp.sum(x * x, axis=-1) + 1e-10
    peaks = jnp.zeros(x.shape[:-1], dtype=jnp.float32)
    for lag in range(min_lag, max_lag + 1, 4):  # stride-4 lag grid
        a = x[..., :L - lag]
        b = x[..., lag:]
        corr = jnp.sum(a * b, axis=-1)
        norm = jnp.sqrt(jnp.sum(a * a, axis=-1)
                        * jnp.sum(b * b, axis=-1)) + 1e-10
        peaks = jnp.maximum(peaks, corr / norm)
    return jnp.clip(peaks, 0.0, 1.0)[..., None]


# ---------------------------------------------------------------------------
# MRASTA temporal filtering (reference: src/Signal/Mrasta.hh — multi-
# resolution RASTA: Gaussian-derivative filters over a temporal context of
# critical-band energies)
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def mrasta_filters(context: int = 50,
                   sigmas: Tuple[float, ...] = (8.0, 16.0, 32.0, 64.0),
                   derivatives: Tuple[int, ...] = (1, 2)) -> np.ndarray:
    """(n_filters, 2*context+1) bank of first/second Gaussian-derivative
    temporal filters at multiple resolutions, each L2-normalized."""
    t = np.arange(-context, context + 1, dtype=np.float64)
    rows = []
    for sigma in sigmas:
        g = np.exp(-0.5 * (t / sigma) ** 2)
        d1 = -t / sigma ** 2 * g
        d2 = (t ** 2 / sigma ** 4 - 1.0 / sigma ** 2) * g
        for order in derivatives:
            f = d1 if order == 1 else d2
            rows.append(f / np.linalg.norm(f))
    return np.stack(rows)


def mrasta(features: jnp.ndarray, context: int = 50,
           sigmas: Tuple[float, ...] = (8.0, 16.0, 32.0, 64.0),
           derivatives: Tuple[int, ...] = (1, 2)) -> jnp.ndarray:
    """(T, D) critical-band energies -> (T, D*n_filters) MRASTA features:
    temporal convolution with edge replication realized as one matmul over
    the unfolded context window (MXU-friendly)."""
    filters = mrasta_filters(context, tuple(sigmas), tuple(derivatives))
    nf, W = filters.shape
    xp = _edge_replicate(features, context)          # (T+2c, D)
    T = features.shape[-2]
    idx = jnp.arange(T)[:, None] + jnp.arange(W)[None, :]
    windows = xp[idx]                                # (T, W, D)
    f = jnp.asarray(filters, jnp.float32)            # (nf, W)
    out = jnp.einsum("twd,fw->tdf", windows.astype(jnp.float32), f,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(T, -1)


# ---------------------------------------------------------------------------
# histogram normalization (reference: src/Signal/HistogramNormalization.hh —
# per-dimension quantile mapping to a target distribution)
# ---------------------------------------------------------------------------


def histogram_normalization_tables(data: np.ndarray, n_quantiles: int = 32
                                   ) -> Tuple[np.ndarray, np.ndarray]:
    """(quantile values (Q, D), target values (Q,)) estimated from training
    data; targets are standard-normal quantiles."""
    from math import sqrt
    qs = np.linspace(0.0, 1.0, n_quantiles)
    values = np.quantile(np.asarray(data, np.float64), qs, axis=0)  # (Q, D)
    # standard normal quantiles via the probit of the same grid (clipped)
    eps = 0.5 / max(len(data), 2)
    clipped = np.clip(qs, eps, 1 - eps)
    try:
        from statistics import NormalDist
        targets = np.asarray([NormalDist().inv_cdf(q) for q in clipped])
    except Exception:  # pragma: no cover
        targets = np.sqrt(2) * np.vectorize(_erfinv_approx)(2 * clipped - 1)
    return values.astype(np.float32), targets.astype(np.float32)


def _erfinv_approx(x):
    a = 0.147
    import math
    ln = math.log(1 - x * x)
    first = 2 / (math.pi * a) + ln / 2
    return math.copysign(math.sqrt(math.sqrt(first ** 2 - ln / a) - first), x)


def apply_histogram_normalization(features: jnp.ndarray,
                                  quantile_values: np.ndarray,
                                  targets: np.ndarray) -> jnp.ndarray:
    """Piecewise-linear per-dimension quantile mapping (vectorized
    interpolation on device)."""
    qv = jnp.asarray(quantile_values)      # (Q, D)
    tg = jnp.asarray(targets)              # (Q,)
    x = features.astype(jnp.float32)

    def per_dim(xd, qd):
        return jnp.interp(xd, qd, tg)

    return jax.vmap(per_dim, in_axes=(-1, -1), out_axes=-1)(x, qv)


# ---------------------------------------------------------------------------
# derivatives by linear regression (reference: src/Signal/Regression.hh)
# ---------------------------------------------------------------------------


def _edge_replicate(x: jnp.ndarray, k: int) -> jnp.ndarray:
    """Pad time axis (-2) by k frames of edge replication (signal-delay
    copy margin policy, src/Signal/Delay.cc)."""
    first = jnp.repeat(x[..., :1, :], k, axis=-2)
    last = jnp.repeat(x[..., -1:, :], k, axis=-2)
    return jnp.concatenate([first, x, last], axis=-2)


def regression_delta(x: jnp.ndarray, half_window: int = 2) -> jnp.ndarray:
    """First-order derivative: sum_i i*(f(t+i)-f(t-i)) / (2*sum_i i^2)."""
    k = half_window
    denom = 2.0 * sum(i * i for i in range(1, k + 1))
    xp = _edge_replicate(x, k)
    T = x.shape[-2]
    out = jnp.zeros_like(x)
    for i in range(1, k + 1):
        plus = jax.lax.dynamic_slice_in_dim(xp, k + i, T, axis=-2)
        minus = jax.lax.dynamic_slice_in_dim(xp, k - i, T, axis=-2)
        out = out + i * (plus - minus)
    return out / denom


def regression_deltadelta(x: jnp.ndarray, half_window: int = 2) -> jnp.ndarray:
    """Second derivative = regression applied to first-order deltas
    (derivationWithRegression.flow wiring)."""
    return regression_delta(regression_delta(x, half_window), half_window)


# ---------------------------------------------------------------------------
# gammatone filterbank (reference: src/Signal/GammaTone.hh — frequency-domain
# realization of the 4th-order gammatone magnitude response on the ERB scale)
# ---------------------------------------------------------------------------


def erb_scale(f):
    """ERB-rate scale: 21.4 log10(1 + 0.00437 f)."""
    return 21.4 * np.log10(1.0 + 0.00437 * np.asarray(f, np.float64))


def erb_bandwidth(fc):
    """Equivalent rectangular bandwidth at center frequency fc."""
    return 24.7 * (1.0 + 0.00437 * np.asarray(fc, np.float64))


def gammatone_matrix(n_bins: int, bin_to_hz: float, n_filters: int = 68,
                     f_min: float = 100.0, f_max: Optional[float] = None,
                     order: int = 4) -> np.ndarray:
    """(n_filters, n_bins) gammatone magnitude-response matrix, centers
    equidistant on the ERB-rate scale.  Applied to amplitude spectra it
    yields the gammatone critical-band energies that the reference computes
    by time-domain filtering + spectral integration (GammaTone.hh +
    SpectralIntegration); the frequency-domain form is the MXU-friendly
    realization."""
    if f_max is None:
        f_max = (n_bins - 1) * bin_to_hz
    e_lo, e_hi = erb_scale(f_min), erb_scale(f_max)
    centers_erb = np.linspace(e_lo, e_hi, n_filters)
    centers = (np.power(10.0, centers_erb / 21.4) - 1.0) / 0.00437
    freqs = np.arange(n_bins) * bin_to_hz
    out = np.zeros((n_filters, n_bins), dtype=np.float64)
    for i, fc in enumerate(centers):
        b = 1.019 * erb_bandwidth(fc)
        # |H(f)| of an order-n gammatone: (1 + ((f-fc)/b)^2)^(-n/2)
        out[i] = np.power(1.0 + ((freqs - fc) / b) ** 2, -order / 2.0)
        out[i] /= out[i].sum() or 1.0
    return out


# ---------------------------------------------------------------------------
# PLP: Levinson-Durbin and LPC cepstrum (reference: src/Math/LevinsonLse.cc,
# src/Signal/AutoregressionToCepstrum.cc)
# ---------------------------------------------------------------------------


def levinson(r) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Levinson-Durbin over autocorrelations r (..., p+1).

    Returns (a (..., p) prediction coefficients in the reference sign
    convention, gain (...,) = sqrt(final prediction error)).  Functional /
    traceable: the order recursion unrolls (p is small, ~13), batch axes
    vectorize on device."""
    r = jnp.asarray(r, dtype=jnp.float32)
    p = r.shape[-1] - 1
    eps = 1e-30
    # alpha: list indexed j=1..i of (batch,) arrays for the current order i
    k1 = -r[..., 1] / jnp.maximum(r[..., 0], eps)
    alpha = [k1]
    E = r[..., 0] + r[..., 1] * k1
    for i in range(2, p + 1):
        k = r[..., i]
        for j in range(1, i):
            k = k + alpha[j - 1] * r[..., i - j]
        k = -k / jnp.maximum(E, eps)
        new_alpha = [alpha[j - 1] + k * alpha[i - j - 1] for j in range(1, i)]
        new_alpha.append(k)
        alpha = new_alpha
        E = (1.0 - k * k) * E
    a = jnp.stack(alpha, axis=-1) if alpha else jnp.zeros(r.shape[:-1] + (0,))
    return a, jnp.sqrt(jnp.maximum(E, eps))


def ar_to_cepstrum(gain, a, n_out: int) -> jnp.ndarray:
    """LPC -> cepstrum recursion (autoregressionToCepstrum):
    c0 = 2 ln gain; c1 = -a0; cn = -(n a_{n-1} + sum (n-k) c_{n-k} a_{k-1})/n.
    Traceable: recursion unrolls over n_out."""
    gain = jnp.asarray(gain, dtype=jnp.float32)
    a = jnp.asarray(a, dtype=jnp.float32)
    p = a.shape[-1]
    c = [2.0 * accurate_log(jnp.maximum(gain, 1e-30))]
    if n_out > 1:
        c.append(-a[..., 0])
    for n in range(2, n_out):
        acc = n * a[..., n - 1] if n - 1 < p else jnp.zeros_like(gain)
        for k in range(1, n):
            if k - 1 < p:
                acc = acc + (n - k) * c[n - k] * a[..., k - 1]
        c.append(acc / (-n))
    return jnp.stack(c, axis=-1)


def plp_cepstrum(power_spectrum_filters: np.ndarray, n_autocorr: int,
                 n_cepstra: int, spacing: float = 0.93853) -> np.ndarray:
    """Critical-band power -> PLP cepstra (the plp.flow tail):
    boundary-filter duplication (copy-first-last), equal-loudness weighting
    at bark positions i*spacing, cube-root compression, IDFT (N-plus-one
    cosine transform, normalized) to autocorrelations, Levinson, LPC
    cepstrum."""
    from ..math.analytic import BarkWarping, EqualLoudnessPreemphasis
    x = np.asarray(power_spectrum_filters, dtype=np.float64)
    # duplicate boundary filters first (plp.flow copy-first-last), then
    # weight at warped positions 0, spacing, ... over the extended vector
    x = np.concatenate([x[..., :1], x, x[..., -1:]], axis=-1)
    bark_pos = np.arange(x.shape[-1], dtype=np.float64) * spacing
    hz = BarkWarping().invert().value(bark_pos)
    el = EqualLoudnessPreemphasis().value(hz)
    x = np.power(np.maximum(x * el, 1e-30), 0.33)
    T = dct_matrix(n_autocorr, x.shape[-1], input_type="N-plus-one",
                   normalize=True)
    r = x @ T.T
    a, gain = levinson(r)
    return np.asarray(ar_to_cepstrum(gain, a, n_cepstra))


class MfccPipeline:
    """The mfcc.flow network as one fused JAX program.

    Static configuration (sample rate, window, filterbank) is resolved on
    host; `__call__` is jit-compiled per padded-length bucket and maps
    (B, N) samples -> (B, T, n_ceps) features plus a frame-validity mask.
    """

    def __init__(self,
                 sample_rate: float = 16000.0,
                 preemphasis_alpha: float = 1.0,
                 window_type: str = "hamming",
                 window_length_s: float = 0.025,
                 window_shift_s: float = 0.01,
                 filter_width: float = 268.258,
                 n_cepstra: int = 16,
                 fft_apply_scale: bool = True):
        self.sample_rate = float(sample_rate)
        self.alpha = float(preemphasis_alpha)
        self.window_type = window_type
        self.length = int(round(window_length_s * sample_rate))
        self.shift = int(round(window_shift_s * sample_rate))
        self.fft_len = fft_length_for(self.length)
        self.n_bins = self.fft_len // 2 + 1
        self.fft_scale = 1.0 / sample_rate if fft_apply_scale else 1.0
        bin_to_hz = sample_rate / self.fft_len
        self.mel_matrix = filterbank_matrix(self.n_bins, bin_to_hz,
                                            filter_width=filter_width)
        self.n_filters = self.mel_matrix.shape[0]
        self.n_cepstra = n_cepstra
        self.dct = dct_matrix(n_cepstra, self.n_filters)
        self._jitted = {}

    def n_frames(self, n_samples: int) -> int:
        return n_frames(n_samples, self.length, self.shift)

    def _build(self, num_frames: int):
        length, shift, alpha = self.length, self.shift, self.alpha
        window_type, fft_len, scale = self.window_type, self.fft_len, self.fft_scale
        mel, dct = self.mel_matrix, self.dct

        def pipeline(samples: jnp.ndarray) -> jnp.ndarray:
            x = preemphasis(samples.astype(jnp.float32), alpha)
            frames = frame_signal(x, length, shift, num_frames)
            frames = apply_window(frames, window_type)
            amp = rfft_amplitude(frames, fft_len, scale)
            fb = apply_matrix(amp, mel)
            logfb = log10(fb)
            return apply_matrix(logfb, dct)

        return jax.jit(pipeline)

    def __call__(self, samples, n_samples: Optional[int] = None):
        """samples: (N,) or (B, N) array; n_samples: true length (defaults to
        full).  Returns (T, n_ceps) or (B, T, n_ceps) float32 features."""
        samples = jnp.asarray(samples)
        n = int(n_samples if n_samples is not None else samples.shape[-1])
        num_frames = self.n_frames(n)
        key = (num_frames, samples.shape)
        if key not in self._jitted:
            self._jitted[key] = self._build(num_frames)
        valid = samples if samples.shape[-1] == n else samples[..., :n]
        if valid.shape[-1] != n:
            raise ValueError("n_samples exceeds provided samples")
        return self._jitted[key](valid)


# ---------------------------------------------------------------------------
# harmonic sum / product (reference: src/Signal/HarmonicSum.hh — pitch
# analysis over one periodic buffer; s(n) = sum_h x[(n*h) mod T])
# ---------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _harmonic_index(T: int, N: int, H: int) -> np.ndarray:
    """(N, H) gather indices (n*h) mod T for h = 1..H."""
    n = np.arange(N, dtype=np.int64)[:, None]
    h = np.arange(1, H + 1, dtype=np.int64)[None, :]
    return ((n * h) % T).astype(np.int32)


def harmonic_sum(x: jnp.ndarray, out_size: int = 0, max_h: int = 0
                 ) -> jnp.ndarray:
    """s(n) = sum_{h=1..H} x[(n*h) mod T] over the trailing axis (periodic
    input of period T = x.shape[-1]); src/Signal/HarmonicSum.hh:41-54.
    Realized as one gather + reduction (no scalar loops)."""
    T = int(x.shape[-1])
    N = int(out_size) or T
    H = int(max_h) or T
    idx = jnp.asarray(_harmonic_index(T, N, H))       # (N, H)
    return jnp.sum(jnp.take(x, idx, axis=-1), axis=-1)


def harmonic_product(x: jnp.ndarray, out_size: int = 0, max_h: int = 0
                     ) -> jnp.ndarray:
    """Normalized harmonic product (src/Signal/HarmonicSum.hh:68-104):
    per harmonic h the running product is scaled by
    sqrt(2 * E_h * E_s) / T where E_h is the energy of the h-shrunken
    signal and E_s the energy of the current product."""
    T = int(x.shape[-1])
    N = int(out_size) or T
    H = int(max_h) or T
    idx_full = jnp.asarray(_harmonic_index(T, T, H))   # (T, H)
    shr = jnp.take(x, idx_full, axis=-1)               # (..., T, H)
    shr = jnp.moveaxis(shr, -1, 0)                     # (H, ..., T)

    def step(s, xh):
        energy = jnp.sum(xh * xh, axis=-1, keepdims=True)
        s_energy = jnp.sum(s * s, axis=-1, keepdims=True)
        norm = jnp.sqrt(2.0 * energy * s_energy) / T
        return s * xh / jnp.maximum(norm, 1e-20), None

    init = jnp.ones_like(x)
    out, _ = jax.lax.scan(step, init, shr)
    return out[..., :N]


# ---------------------------------------------------------------------------
# TRAP temporal pattern (reference: src/Signal/TempoRAlPattern.hh —
# Hermansky & Sharma ICSLP'98: per critical band, a long temporal window is
# windowed and DCT-compressed)
# ---------------------------------------------------------------------------


def temporal_pattern(features: jnp.ndarray, context_frames: int = 101,
                     dct_size: int = 8, window: str = "hamming"
                     ) -> jnp.ndarray:
    """(T, D) band energies -> (T, D*dct_size) TRAP features.

    Each band's +-(context//2)-frame context is windowed and reduced by a
    truncated DCT — a single unfold + einsum onto the MXU (contrast the
    reference's per-band scalar loops, TempoRAlPattern.cc)."""
    W = int(context_frames)
    half = W // 2
    xp = _edge_replicate(features, half)               # (T+2*half, D)
    T = features.shape[-2]
    idx = jnp.arange(T)[:, None] + jnp.arange(W)[None, :]
    windows = xp[idx]                                  # (T, W, D)
    win = jnp.asarray(window_function(window, W), jnp.float32)
    dct = jnp.asarray(dct_matrix(dct_size, W), jnp.float32)   # (K, W)
    basis = dct * win[None, :]                         # fold window into DCT
    out = jnp.einsum("twd,kw->tdk", windows.astype(jnp.float32), basis,
                     precision=jax.lax.Precision.HIGHEST)
    return out.reshape(T, -1)


# ---------------------------------------------------------------------------
# quantile equalization (reference: src/Signal/QuantileEqualization.hh —
# per-dimension piecewise-linear map from current onto training quantiles)
# ---------------------------------------------------------------------------


def estimate_quantiles(data, n_quantiles: int = 4) -> np.ndarray:
    """(Q+1, D) per-dimension quantiles at levels k/Q, k = 0..Q (the
    reference stores numberOfQuantiles+1 points incl. min and max)."""
    qs = np.linspace(0.0, 1.0, int(n_quantiles) + 1)
    return np.quantile(np.asarray(data, np.float64), qs, axis=0
                       ).astype(np.float32)


def quantile_equalize(x: jnp.ndarray, train_q: jnp.ndarray,
                      current_q: jnp.ndarray) -> jnp.ndarray:
    """Piecewise-linear per-dimension map sending current quantiles onto
    training quantiles (QuantileEqualization.hh:81-112 equalizeQuantiles,
    piecewise-linear branch), vectorized over (T, D) via a one-hot segment
    select instead of the reference's per-value scan."""
    tq = jnp.asarray(train_q, jnp.float32)             # (Q+1, D)
    cq = jnp.asarray(current_q, jnp.float32)
    Q = tq.shape[0] - 1
    xf = x.astype(jnp.float32)
    # segment index per value: count of interior knots below x, in [0, Q-1]
    below = (cq[1:Q, :][None, :, :] < xf[:, None, :])  # (T, Q-1, D)
    seg = jnp.sum(below, axis=1)                       # (T, D) int
    x1 = jnp.take_along_axis(cq.T, seg.T, axis=1).T    # cq[seg, d]
    x2 = jnp.take_along_axis(cq.T, (seg + 1).T, axis=1).T
    y1 = jnp.take_along_axis(tq.T, seg.T, axis=1).T
    y2 = jnp.take_along_axis(tq.T, (seg + 1).T, axis=1).T
    a = (y2 - y1) / jnp.maximum(x2 - x1, 1e-10)
    return (a * (xf - x1) + y1).astype(x.dtype)


# ---------------------------------------------------------------------------
# frequency warping (reference: src/Signal/Warping.hh, LinearWarping.hh,
# GenericWarping.hh — VTLN: remap spectral bins along a warping function)
# ---------------------------------------------------------------------------


def warping_matrix(size: int, warped_positions: np.ndarray,
                   interpolate: bool = True) -> np.ndarray:
    """(size, size) row-stochastic matrix W with out = W @ spectrum, where
    output bin i reads input position warped_positions[i].

    Mirrors Warping.hh's inverse-item semantics: a fractional position
    linearly interpolates its two neighbours (LinearInterpolationInverseItem)
    or copies the nearest bin (CopyInverseItem); positions spanning >1 bin
    take the arithmetic mean (AritmeticMeanInverseItem).  Dense-matrix
    formulation so warping fuses into the surrounding matmul chain."""
    pos = np.clip(np.asarray(warped_positions, np.float64), 0, size - 1)
    W = np.zeros((size, size), np.float32)
    # bin i covers [pos[i], pos[i+1]) — merge when wider than one bin
    for i in range(size):
        lo = pos[i]
        hi = pos[i + 1] if i + 1 < size else pos[i] + 1.0
        if hi - lo > 1.0 + 1e-6:          # merge: arithmetic mean over span
            b0, b1 = int(np.floor(lo)), min(int(np.ceil(hi)), size)
            W[i, b0:b1] = 1.0 / max(b1 - b0, 1)
        else:                              # copy / interpolate
            b = int(np.floor(lo))
            frac = lo - b
            if not interpolate or frac < 1e-9 or b + 1 >= size:
                W[i, min(int(round(lo)), size - 1)] = 1.0
            else:
                W[i, b] = 1.0 - frac
                W[i, b + 1] = frac
    return W


@lru_cache(maxsize=None)
def linear_warping_positions(size: int, warping_factor: float,
                             break_point: float = 0.875) -> np.ndarray:
    """Two-piece linear VTLN warp (src/Signal/LinearWarping.hh): slope
    1/warping_factor up to break_point*size (in warped coordinates), then a
    linear continuation pinned so size-1 maps to size-1."""
    a = 1.0 / float(warping_factor)
    edge = break_point * (size - 1) * min(a, 1.0 / a)
    out = np.arange(size, dtype=np.float64)
    lo = out * a
    x_edge = edge            # warped-axis break position
    src_edge = edge * a
    denom = max((size - 1) - x_edge, 1e-9)
    slope2 = ((size - 1) - src_edge) / denom
    hi = src_edge + (out - x_edge) * slope2
    return np.where(out <= x_edge, lo, hi)


# ---------------------------------------------------------------------------
# spectral / temporal integration (reference: src/Signal/
# SpectralIntegration.hh, TemporalIntegration.hh — windowed down-sampling
# of filterbank outputs along the spectral / temporal axis)
# ---------------------------------------------------------------------------


def _integration_matrix(n_in: int, length: int, shift: int,
                        window: str) -> np.ndarray:
    n_out = max(1 + (n_in - length) // shift, 1) if n_in >= length else 1
    win = window_function(window, min(length, n_in))
    M = np.zeros((n_out, n_in), np.float32)
    for i in range(n_out):
        s = i * shift
        w = win[:max(min(length, n_in - s), 0)]
        M[i, s:s + len(w)] = w
    return M


def spectral_integration(x: jnp.ndarray, length: int = 3, shift: int = 2,
                         window: str = "hamming") -> jnp.ndarray:
    """Windowed sum over the spectral (last) axis every `shift` channels."""
    M = jnp.asarray(_integration_matrix(int(x.shape[-1]), length, shift,
                                        window))
    return x.astype(jnp.float32) @ M.T


def temporal_integration(x: jnp.ndarray, length: int, shift: int,
                         window: str = "hamming") -> jnp.ndarray:
    """Windowed sum over the time (leading) axis every `shift` frames."""
    M = jnp.asarray(_integration_matrix(int(x.shape[-2]), length, shift,
                                        window))
    return jnp.einsum("ot,...td->...od", M, x.astype(jnp.float32))


# ---------------------------------------------------------------------------
# nth-order polynomial features (reference: src/Signal/NthOrderFeatures.hh)
# ---------------------------------------------------------------------------


def nth_order_features(x: jnp.ndarray, orders: str = "first-and-second"
                       ) -> jnp.ndarray:
    """(T, D) -> polynomial feature expansion per frame.

    orders: '+'-joined subset of {zeroth, first, second, diagonal-second,
    diagonal-third} matching the reference OrderType flags (second = upper
    triangle incl. diagonal of the outer product); 'first-and-second' is
    the common reference configuration."""
    if orders == "first-and-second":
        orders = "first+second"
    parts = []
    D = int(x.shape[-1])
    xf = x.astype(jnp.float32)
    for token in orders.split("+"):
        token = token.strip()
        if token == "zeroth":
            parts.append(jnp.ones(x.shape[:-1] + (1,), jnp.float32))
        elif token == "first":
            parts.append(xf)
        elif token == "second":
            iu, ju = np.triu_indices(D)
            outer = xf[..., :, None] * xf[..., None, :]
            parts.append(outer[..., iu, ju])
        elif token == "diagonal-second":
            parts.append(xf * xf)
        elif token == "diagonal-third":
            parts.append(xf ** 3)
        else:
            raise ValueError(f"unknown nth-order token {token!r}")
    return jnp.concatenate(parts, axis=-1)


# ---------------------------------------------------------------------------
# windowed cross-correlation (reference: src/Signal/CrossCorrelation.hh —
# similarity of two frames over a lag interval, several normalizations)
# ---------------------------------------------------------------------------


def cross_correlation(x: jnp.ndarray, y: jnp.ndarray,
                      begin: int, end: int,
                      normalization: str = "unbiased-estimate"
                      ) -> jnp.ndarray:
    """R_xy over lags [begin, end) of two equal-length frames (..., L).

    normalization: 'none', 'unbiased-estimate' (divide by #addends,
    normalizeCrossCorrelationEstimate), or 'upper-bound' (scale so
    |R| <= 1, normalizeCrossCorrelationUpperBound)."""
    L = int(x.shape[-1])
    lags = range(int(begin), int(end))
    outs = []
    ex = jnp.sum(x * x, axis=-1)
    ey = jnp.sum(y * y, axis=-1)
    for lag in lags:
        k = abs(int(lag))
        if k >= L:
            outs.append(jnp.zeros(x.shape[:-1], jnp.float32))
            continue
        a, b = (x[..., k:], y[..., :L - k]) if lag < 0 else \
               (x[..., :L - k], y[..., k:])
        r = jnp.sum(a * b, axis=-1)
        if normalization == "unbiased-estimate":
            r = r / (L - k)
        elif normalization == "upper-bound":
            r = r / jnp.maximum(jnp.sqrt(ex * ey), 1e-20)
        outs.append(r)
    return jnp.stack(outs, axis=-1)


# ---------------------------------------------------------------------------
# frame synchronization: prediction & interpolation (reference:
# src/Signal/FramePrediction.hh RepeatingFramePrediction,
# src/Signal/FrameInterpolation.hh PolinomialVectorInterpolation over
# Flow::SynchronizationNode target times)
# ---------------------------------------------------------------------------


def frame_predict(features: jnp.ndarray, times: jnp.ndarray,
                  target_times: jnp.ndarray) -> jnp.ndarray:
    """One output frame per target time: the latest input frame whose start
    time <= target (RepeatingFramePrediction).  times must be sorted."""
    idx = jnp.searchsorted(times, target_times, side="right") - 1
    idx = jnp.clip(idx, 0, features.shape[0] - 1)
    return jnp.take(features, idx, axis=0)


def frame_interpolate(features: jnp.ndarray, times: jnp.ndarray,
                      target_times: jnp.ndarray, order: int = 1
                      ) -> jnp.ndarray:
    """Interpolate frames at target times (PolinomialVectorInterpolation).
    order 0 = nearest, 1 = linear between the bracketing frames; higher
    orders fall back to linear (sufficient for feature streams)."""
    T = features.shape[0]
    hi = jnp.clip(jnp.searchsorted(times, target_times, side="left"), 1,
                  T - 1)
    lo = hi - 1
    t0 = jnp.take(times, lo)
    t1 = jnp.take(times, hi)
    f0 = jnp.take(features, lo, axis=0)
    f1 = jnp.take(features, hi, axis=0)
    if order == 0:
        nearest = jnp.where((target_times - t0) <= (t1 - target_times),
                            lo, hi)
        return jnp.take(features, nearest, axis=0)
    w = ((target_times - t0) / jnp.maximum(t1 - t0, 1e-10))[:, None]
    w = jnp.clip(w, 0.0, 1.0)
    return (1.0 - w) * f0 + w * f1
