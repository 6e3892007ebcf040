"""Mixture-set ML estimation: accumulate / combine / estimate / split.

Re-creates the reference accumulator workflow
(src/Mm/AbstractMixtureSetEstimator.hh:47,91-138 accumulate + combine,
src/Mm/MixtureSetSplitter.hh:23-45 splitting) with TPU-batched
accumulation: a whole segment of aligned frames is accumulated in one
segment_sum over mixture labels.  Accumulator files merge exactly like the
reference's `combine-mixture-set-estimators` action; when running sharded,
`psum_accumulator` merges across a device mesh instead of via files
(SURVEY.md §2.20).
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .mixture_set import Mixture, MixtureSet


@dataclass
class MixtureAccumulator:
    """Per-density sufficient statistics (weight, sum x, sum x^2)."""
    dim: int
    n_densities: int
    weight: np.ndarray      # (N,)
    sum_x: np.ndarray       # (N, D)
    sum_x2: np.ndarray      # (N, D)
    # topology: which mixture each density belongs to
    mixture_of: np.ndarray  # (N,)

    @classmethod
    def zeros(cls, dim: int, mixture_of: Sequence[int]) -> "MixtureAccumulator":
        mix_of = np.asarray(mixture_of, dtype=np.int32)
        n = len(mix_of)
        return cls(dim, n, np.zeros(n), np.zeros((n, dim)),
                   np.zeros((n, dim)), mix_of)

    # -- combine (the reference's distributed merge) -----------------------

    def combine(self, other: "MixtureAccumulator") -> "MixtureAccumulator":
        if (self.dim != other.dim or self.n_densities != other.n_densities
                or not np.array_equal(self.mixture_of, other.mixture_of)):
            raise ValueError("incompatible accumulators")
        return MixtureAccumulator(
            self.dim, self.n_densities,
            self.weight + other.weight,
            self.sum_x + other.sum_x,
            self.sum_x2 + other.sum_x2,
            self.mixture_of)

    # -- file IO (binary accumulator files) ---------------------------------

    def write(self, path: str) -> None:
        with open(path, "wb") as fh:
            pickle.dump({"dim": self.dim, "weight": self.weight,
                         "sum_x": self.sum_x, "sum_x2": self.sum_x2,
                         "mixture_of": self.mixture_of}, fh)

    @classmethod
    def read(cls, path: str) -> "MixtureAccumulator":
        with open(path, "rb") as fh:
            d = pickle.load(fh)
        return cls(d["dim"], len(d["mixture_of"]), d["weight"],
                   d["sum_x"], d["sum_x2"], d["mixture_of"])


def make_accumulate_fn(n_densities: int):
    """jit-compiled accumulation of one (padded) segment:
    features (T, D), density labels (T,) int32 (-1 = padding/unassigned),
    weights (T,) -> (weight (N,), sum_x (N,D), sum_x2 (N,D))."""

    @jax.jit
    def accumulate(features, labels, weights):
        x = features.astype(jnp.float32)
        w = jnp.where(labels >= 0, weights, 0.0).astype(jnp.float32)
        lab = jnp.where(labels >= 0, labels, 0)
        wx = x * w[:, None]
        acc_w = jax.ops.segment_sum(w, lab, num_segments=n_densities)
        acc_x = jax.ops.segment_sum(wx, lab, num_segments=n_densities)
        acc_x2 = jax.ops.segment_sum(wx * x, lab, num_segments=n_densities)
        return acc_w, acc_x, acc_x2

    return accumulate


class MixtureSetEstimator:
    """ML estimator over a fixed topology (densities grouped by mixture)."""

    def __init__(self, dim: int, mixture_of: Sequence[int],
                 minimum_observation_weight: float = 1.0,
                 variance_floor: float = 1e-8):
        self.acc = MixtureAccumulator.zeros(dim, mixture_of)
        self.min_obs = minimum_observation_weight
        self.var_floor = variance_floor
        self._accumulate = make_accumulate_fn(self.acc.n_densities)

    @classmethod
    def for_mixture_set(cls, ms: MixtureSet, **kw) -> "MixtureSetEstimator":
        _, _, _, mix_of = ms.packed()
        return cls(ms.dim, mix_of, **kw)

    def accumulate_segment(self, features, density_labels,
                           weights: Optional[np.ndarray] = None) -> None:
        """features (T, D); density_labels (T,) packed-density index
        (from a Viterbi alignment), -1 for padding."""
        features = np.asarray(features)
        if weights is None:
            weights = np.ones(features.shape[0], dtype=np.float32)
        w, sx, sx2 = self._accumulate(features,
                                      np.asarray(density_labels, np.int32),
                                      np.asarray(weights, np.float32))
        self.acc.weight += np.asarray(w, dtype=np.float64)
        self.acc.sum_x += np.asarray(sx, dtype=np.float64)
        self.acc.sum_x2 += np.asarray(sx2, dtype=np.float64)

    def combine_file(self, path: str) -> None:
        self.acc = self.acc.combine(MixtureAccumulator.read(path))

    def estimate(self, pooled_variance: bool = False) -> MixtureSet:
        """ML update: mean = sx/w, var = sx2/w - mean^2 (floored); mixture
        weights from density counts, dropping densities with too little
        mass (minimum-observation-weight, as in the reference estimator)."""
        acc = self.acc
        n = acc.n_densities
        w = acc.weight
        safe_w = np.maximum(w, 1e-20)
        means = acc.sum_x / safe_w[:, None]
        variances = acc.sum_x2 / safe_w[:, None] - means ** 2
        if pooled_variance:
            total = np.maximum(w.sum(), 1e-20)
            pooled = (acc.sum_x2.sum(0) - (means ** 2 * w[:, None]).sum(0)) / total
            variances = np.broadcast_to(pooled, variances.shape).copy()
        variances = np.maximum(variances, self.var_floor)

        densities = np.stack([np.arange(n), np.arange(n)], axis=1).astype(np.int32)
        n_mix = int(acc.mixture_of.max()) + 1 if n else 0
        mixtures: List[Mixture] = []
        for mi in range(n_mix):
            idxs = np.nonzero(acc.mixture_of == mi)[0]
            kept = [int(i) for i in idxs if w[i] >= self.min_obs]
            if not kept:  # keep the heaviest density to avoid empty mixtures
                kept = [int(idxs[np.argmax(w[idxs])])] if len(idxs) else []
            total = sum(w[i] for i in kept) or 1.0
            mixtures.append(Mixture(
                kept, [float(np.log(max(w[i] / total, 1e-300))) for i in kept]))
        return MixtureSet(acc.dim, means, variances, densities, mixtures)

    def split(self, epsilon: float = 0.001) -> "MixtureSetEstimator":
        """Mixture growth: split every density into two, perturbing the new
        means by +/- epsilon * stddev (reference MixtureSetSplitter)."""
        acc = self.acc
        n = acc.n_densities
        safe_w = np.maximum(acc.weight, 1e-20)
        means = acc.sum_x / safe_w[:, None]
        var = np.maximum(acc.sum_x2 / safe_w[:, None] - means ** 2, self.var_floor)
        std = np.sqrt(var)
        new_mix_of = np.repeat(acc.mixture_of, 2)
        est = MixtureSetEstimator(acc.dim, new_mix_of, self.min_obs,
                                  self.var_floor)
        half_w = np.repeat(acc.weight / 2.0, 2)
        new_means = np.empty((2 * n, acc.dim))
        new_means[0::2] = means + epsilon * std
        new_means[1::2] = means - epsilon * std
        est.acc.weight = half_w
        est.acc.sum_x = new_means * half_w[:, None]
        est.acc.sum_x2 = (np.repeat(var, 2, axis=0) + new_means ** 2) * half_w[:, None]
        return est


def psum_accumulator(weight, sum_x, sum_x2, axis_name: str = "data"):
    """In-mesh accumulator merge: the collective replacement for the
    reference's accumulator-file combine (SURVEY.md §2.20: psum over the
    data axis instead of file merges)."""
    return (jax.lax.psum(weight, axis_name),
            jax.lax.psum(sum_x, axis_name),
            jax.lax.psum(sum_x2, axis_name))
