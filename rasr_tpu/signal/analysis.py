"""Signal analysis: DC-segment removal, formant extraction, segment
clustering.

Reference:
  * src/Signal/DcDetection.hh:26 — samples whose difference to the last
    non-DC sample stays below ``max_dc_increment`` form a DC run; runs of
    at least ``min_dc_length`` are removed, and surviving non-DC segments
    shorter than ``min_non_dc_length`` are discarded.
  * src/Signal/Formant.hh:25 / SegmentwiseFormantExtraction.hh — per
    formant (frequency, amplitude, bandwidth, energy); realized here by
    LPC root solving (resonances = complex root angles, bandwidths from
    root radii) instead of the reference's cascaded second-order
    estimation — same quantities, standard numerical method.
  * src/Signal/SegmentClustering.hh:33 — agglomerative clustering of
    segment-level full-covariance Gaussians under GLR/BIC or symmetric
    KL (KL2) distances (DiagCov/FullCov MonoGaussianModel, computeGLR:
    glr = 0.5 (L_xy - L_x - L_y), L = n log|Sigma|).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

LN_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------------------
# DC detection
# --------------------------------------------------------------------------

def dc_detection(samples: np.ndarray, max_dc_increment: float = 1.0,
                 min_dc_length: int = 10, min_non_dc_length: int = 0
                 ) -> Tuple[np.ndarray, List[Tuple[int, int]]]:
    """Remove DC (near-constant) stretches from a waveform.

    Returns (cleaned samples, kept [start, end) ranges in the input).
    Sequential by nature (each sample compares against the last accepted
    non-DC sample) — runs on host over raw audio.
    """
    x = np.asarray(samples, dtype=np.float32)
    n = len(x)
    keep_ranges: List[Tuple[int, int]] = []
    seg_start = 0          # start of the current non-DC segment
    non_dc_end = 0         # exclusive end of accepted non-DC samples
    dc_run = 0
    in_dc = False          # inside an already-detected DC stretch
    for i in range(n):
        if in_dc:
            # DC stretch continues while consecutive samples stay flat
            if abs(float(x[i]) - float(x[i - 1])) >= max_dc_increment:
                in_dc = False
                seg_start = i
                non_dc_end = i + 1
                dc_run = 0
            continue
        if non_dc_end == seg_start:
            # first sample of a segment is always non-DC
            non_dc_end = i + 1
            continue
        if abs(float(x[i]) - float(x[non_dc_end - 1])) >= max_dc_increment:
            # non-DC: any pending short DC run joins the segment
            non_dc_end = i + 1
            dc_run = 0
        else:
            dc_run += 1
            if dc_run >= min_dc_length:
                # close the segment before the DC run
                if non_dc_end - seg_start >= min_non_dc_length:
                    keep_ranges.append((seg_start, non_dc_end))
                dc_run = 0
                in_dc = True
                seg_start = non_dc_end = i + 1
    if not in_dc:
        # pending DC samples shorter than min_dc_length join the segment
        tail_end = min(non_dc_end + dc_run, n)
        if tail_end - seg_start >= min_non_dc_length and tail_end > seg_start:
            keep_ranges.append((seg_start, tail_end))
    if not keep_ranges:
        return np.zeros((0,), np.float32), []
    return np.concatenate([x[a:b] for a, b in keep_ranges]), keep_ranges


# --------------------------------------------------------------------------
# formants
# --------------------------------------------------------------------------

@dataclass
class Formant:
    frequency: float
    amplitude: float
    bandwidth: float
    energy: float


def extract_formants(frame: np.ndarray, sample_rate: float,
                     max_formants: int = 4, lpc_order: Optional[int] = None,
                     max_bandwidth: float = 700.0,
                     min_frequency: float = 50.0) -> List[Formant]:
    """Formants of one (windowed) frame via LPC root solving.

    Complex LPC roots re^{i w}: frequency = w fs / 2pi, bandwidth =
    -fs/pi ln r; amplitude is the LPC spectrum magnitude at the
    resonance; energy is the frame energy.
    """
    x = np.asarray(frame, dtype=np.float64)
    order = lpc_order or 2 * max_formants + 2
    # autocorrelation method (Levinson)
    r = np.correlate(x, x, mode="full")[len(x) - 1:len(x) + order]
    if r[0] <= 0:
        return []
    a = np.zeros(order + 1)
    a[0] = 1.0
    err = r[0]
    for i in range(1, order + 1):
        acc = r[i] + np.dot(a[1:i], r[1:i][::-1])
        k = -acc / err
        a[1:i + 1] = np.concatenate([a[1:i] + k * a[1:i][::-1], [k]])
        err *= (1.0 - k * k)
        if err <= 0:
            break
    roots = np.roots(a)
    energy = float(np.sum(x * x))
    out: List[Formant] = []
    for root in roots:
        if np.imag(root) <= 0:
            continue
        radius = float(np.abs(root))
        if radius >= 1.0:
            radius = 1.0 - 1e-6
        w = float(np.angle(root))
        freq = w * sample_rate / (2.0 * math.pi)
        bw = -sample_rate / math.pi * math.log(radius)
        if freq < min_frequency or bw > max_bandwidth:
            continue
        # LPC spectrum amplitude at the resonance
        z = np.exp(1j * w)
        denom = np.polyval(a, 1.0 / z)
        amp = float(1.0 / max(abs(denom), 1e-12))
        out.append(Formant(freq, amp, bw, energy))
    out.sort(key=lambda f: f.frequency)
    return out[:max_formants]


# --------------------------------------------------------------------------
# segment clustering (BIC / KL2)
# --------------------------------------------------------------------------

class GaussianSegment:
    """Full-covariance Gaussian segment statistics
    (FullCovMonoGaussianModel)."""

    def __init__(self, features: np.ndarray):
        x = np.asarray(features, dtype=np.float64)
        self.n = x.shape[0]
        self.mean = x.mean(axis=0)
        d = x - self.mean
        self.cov = (d.T @ d) / self.n

    @property
    def dim(self) -> int:
        return len(self.mean)

    def log_likelihood(self) -> float:
        """L = n log|Sigma| (computeL)."""
        sign, logdet = np.linalg.slogdet(
            self.cov + 1e-9 * np.eye(self.dim))
        return float(self.n * logdet)

    def merged(self, other: "GaussianSegment") -> "GaussianSegment":
        out = GaussianSegment.__new__(GaussianSegment)
        n = self.n + other.n
        wx, wy = self.n / n, other.n / n
        mean = wx * self.mean + wy * other.mean
        dx = self.mean - mean
        dy = other.mean - mean
        out.n = n
        out.mean = mean
        out.cov = (wx * (self.cov + np.outer(dx, dx))
                   + wy * (other.cov + np.outer(dy, dy)))
        return out

    def glr(self, other: "GaussianSegment") -> float:
        """Generalized likelihood ratio / Gish distance (computeGLR)."""
        m = self.merged(other)
        return 0.5 * (m.log_likelihood() - self.log_likelihood()
                      - other.log_likelihood())

    def relative_likelihood(self, other: "GaussianSegment") -> float:
        """n/2 (-log|S_o| - tr(S_o^-1 S) - dm^T S_o^-1 dm - d ln 2pi)."""
        inv = np.linalg.inv(other.cov + 1e-9 * np.eye(self.dim))
        dm = self.mean - other.mean
        _, logdet = np.linalg.slogdet(other.cov + 1e-9 * np.eye(self.dim))
        val = -(logdet + np.trace(inv @ self.cov) + dm @ inv @ dm
                + self.dim * LN_2PI)
        return float(0.5 * self.n * val)

    def kl2(self, other: "GaussianSegment") -> float:
        """Symmetric KL distance (computeKL2): a + b - c - d."""
        return (self.relative_likelihood(self)
                + other.relative_likelihood(other)
                - self.relative_likelihood(other)
                - other.relative_likelihood(self))


def bic_penalty(dim: int, n_total: int, lam: float = 1.0) -> float:
    """lambda/2 (d + d(d+1)/2) ln N — the classic BIC stop penalty."""
    return 0.5 * lam * (dim + dim * (dim + 1) / 2.0) * math.log(n_total)


def cluster_segments(segment_features: Sequence[np.ndarray],
                     n_clusters: Optional[int] = None,
                     threshold: Optional[float] = None,
                     distance: str = "glr",
                     bic_lambda: Optional[float] = None) -> List[int]:
    """Agglomerative segment clustering (SegmentClusteringNode).

    Stops when ``n_clusters`` is reached, or when the smallest pairwise
    distance exceeds ``threshold`` (set from ``bic_lambda`` via
    bic_penalty when given).  Returns a cluster id per input segment.
    """
    models = [GaussianSegment(f) for f in segment_features]
    if not models:
        return []
    if n_clusters is None and threshold is None and bic_lambda is None:
        bic_lambda = 1.0  # default: BIC-stopped clustering
    if bic_lambda is not None:
        n_total = sum(m.n for m in models)
        threshold = bic_penalty(models[0].dim, n_total, bic_lambda)
    members: List[List[int]] = [[i] for i in range(len(models))]

    def dist(a: GaussianSegment, b: GaussianSegment) -> float:
        return a.glr(b) if distance == "glr" else a.kl2(b)

    while len(models) > 1:
        if n_clusters is not None and len(models) <= n_clusters:
            break
        best, bi, bj = math.inf, -1, -1
        for i in range(len(models)):
            for j in range(i + 1, len(models)):
                d = dist(models[i], models[j])
                if d < best:
                    best, bi, bj = d, i, j
        if threshold is not None and best > threshold:
            break
        models[bi] = models[bi].merged(models[bj])
        members[bi] += members[bj]
        del models[bj], members[bj]
    labels = [0] * sum(len(m) for m in members)
    for c, segs in enumerate(members):
        for s in segs:
            labels[s] = c
    return labels


# ---------------------------------------------------------------------------
# peak detection (reference: src/Signal/PeakDetection.hh — maximal peak of a
# spectrum/correlation vector in a position band, with height/width
# confidences)
# ---------------------------------------------------------------------------


def peak_detection(v: np.ndarray, min_pos: int = 0, max_pos: int = 0,
                   height_average_width: int = 0,
                   max_width: int = 0, width_height_factor: float = 0.5):
    """Maximal peak of `v` within [min_pos, max_pos).

    Returns (position, value, confidence) with the reference confidences:
    height confidence = min(peak/avg, 2) - 1 (PeakDetection.hh:75), width
    confidence = 1 - width/maxWidth where width is measured at
    avg + width_height_factor*(peak-avg)."""
    v = np.asarray(v, np.float64)
    n = len(v)
    max_pos = max_pos or n
    band = v[min_pos:max_pos]
    if band.size == 0:
        return 0, 0.0, 0.0
    peak = int(np.argmax(band)) + min_pos
    peak_val = float(v[peak])
    w = height_average_width or n
    lo, hi = max(peak - w // 2, 0), min(peak + w // 2 + 1, n)
    avg = float(np.mean(v[lo:hi])) if hi > lo else 0.0
    height_conf = min(peak_val / avg, 2.0) - 1.0 if avg > 0 else 0.0
    # width at widthHeight between average and peak
    width_height = avg + width_height_factor * (peak_val - avg)
    left = peak
    while left > 0 and v[left - 1] >= width_height:
        left -= 1
    right = peak
    while right + 1 < n and v[right + 1] >= width_height:
        right += 1
    width = right - left + 1
    mw = max_width or n
    width_conf = max(1.0 - width / mw, 0.0)
    return peak, peak_val, max(height_conf, 0.0) * width_conf


# ---------------------------------------------------------------------------
# silence detection (reference: src/Signal/SilenceDetection.hh — energy-
# histogram threshold with minimum speech/silence run lengths) and silence
# normalization (src/Signal/SilenceNormalization.hh — EM-like 2-class energy
# segmentation, then trim silence to a requested fraction)
# ---------------------------------------------------------------------------


def silence_detection(energies: np.ndarray, min_snr: float = 1.7,
                      min_speech_length: int = 10,
                      min_silence_length: int = 20,
                      threshold_interpolation: float = 0.5) -> np.ndarray:
    """(T,) frame energies -> (T,) bool speech mask.

    The decision threshold interpolates between the low and high modes of
    the energy distribution (histogram-buffer semantics collapsed to the
    whole segment); runs shorter than the minimum speech/silence lengths
    are merged into their surroundings."""
    e = np.asarray(energies, np.float64).reshape(-1)
    if e.size == 0:
        return np.zeros((0,), bool)
    loge = np.log(np.maximum(e, 1e-20))
    lo, hi = np.quantile(loge, 0.1), np.quantile(loge, 0.9)
    if hi - lo < np.log(max(min_snr, 1.0 + 1e-6)):
        return np.ones_like(e, dtype=bool)      # no usable SNR: all speech
    thr = lo + threshold_interpolation * (hi - lo)
    mask = loge > thr
    # enforce minimum run lengths: flip short runs (silence first, then
    # speech, mirroring the reference's delay-window smoothing)
    for target, min_len in ((False, min_silence_length),
                            (True, min_speech_length)):
        i = 0
        while i < len(mask):
            j = i
            while j < len(mask) and mask[j] == mask[i]:
                j += 1
            if mask[i] == target and (j - i) < min_len:
                mask[i:j] = not target
            i = j
    return mask


def silence_normalization(samples: np.ndarray, sample_rate: float,
                          silence_fraction: float = 0.1,
                          block_size: float = 0.01,
                          min_surrounding_silence: float = 0.1,
                          iterations: int = 3,
                          fill_up_silence: bool = False,
                          seed: int = 0) -> np.ndarray:
    """Return samples whose silence share is normalized to
    `silence_fraction` (SilenceNormalization.hh).

    Blocks of `block_size` seconds are split speech/silence by a 2-means
    EM on log block energy; excess silence blocks are removed (keeping
    `min_surrounding_silence` around speech), or silence is duplicated
    when the segment has too little and fill_up_silence is set."""
    x = np.asarray(samples, np.float32).reshape(-1)
    B = max(int(round(block_size * sample_rate)), 1)
    n_blocks = len(x) // B
    if n_blocks < 4:
        return x
    blocks = x[:n_blocks * B].reshape(n_blocks, B)
    loge = np.log(np.maximum(np.mean(blocks ** 2, axis=1), 1e-20))
    # 2-means EM init at the 1%/99% constraint quantiles
    c_sil, c_sp = np.quantile(loge, 0.01), np.quantile(loge, 0.99)
    for _ in range(max(iterations, 1)):
        assign = np.abs(loge - c_sil) > np.abs(loge - c_sp)  # True = speech
        if assign.all() or (~assign).all():
            break
        c_sil, c_sp = loge[~assign].mean(), loge[assign].mean()
    speech = np.abs(loge - c_sil) > np.abs(loge - c_sp)
    keep_ctx = max(int(round(min_surrounding_silence / block_size)), 0)
    protected = speech.copy()
    for k in range(1, keep_ctx + 1):
        protected[:-k] |= speech[k:]
        protected[k:] |= speech[:-k]
    n_speech = int(speech.sum())
    want_sil = int(round(silence_fraction / max(1.0 - silence_fraction, 1e-6)
                         * n_speech))
    sil_idx = np.flatnonzero(~protected)
    extra_ctx_sil = int((~speech).sum() - len(sil_idx))
    drop = len(sil_idx) - max(want_sil - extra_ctx_sil, 0)
    keep = np.ones(n_blocks, bool)
    if drop > 0:
        keep[sil_idx[:drop]] = False            # trim leading excess silence
    out = blocks[keep].reshape(-1)
    if fill_up_silence and drop < 0 and len(sil_idx):
        rng = np.random.default_rng(seed)
        extra = blocks[rng.choice(sil_idx, size=-drop)].reshape(-1)
        out = np.concatenate([out, extra])
    tail = x[n_blocks * B:]
    return np.concatenate([out, tail])
