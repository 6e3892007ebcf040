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
