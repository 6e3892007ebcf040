"""Linear discriminant analysis for feature transforms.

The reference estimates within/between-class scatter matrices from aligned
features (src/Speech/ScatterMatricesEstimator.cc) and solves the
generalized eigenproblem for the LDA transform applied by
signal-matrix-multiplication-f32 (share/lda.flow).  Accumulation here is
one segment_sum per segment on device; the eigensolve runs on host in f64.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class ScatterAccumulator:
    """Per-class first/second moments; enough for Sw/Sb."""
    dim: int
    n_classes: int
    count: np.ndarray          # (C,)
    sum_x: np.ndarray          # (C, D)
    sum_xxt: np.ndarray        # (D, D) global second moment
    per_class_outer: np.ndarray  # (C, D, D) optional exact within-class

    @classmethod
    def zeros(cls, dim: int, n_classes: int) -> "ScatterAccumulator":
        return cls(dim, n_classes, np.zeros(n_classes),
                   np.zeros((n_classes, dim)), np.zeros((dim, dim)),
                   np.zeros((0,)))

    def accumulate(self, features: np.ndarray, labels: np.ndarray) -> None:
        """features (T, D), labels (T,) class ids (-1 ignored)."""
        x = np.asarray(features, dtype=np.float64)
        lab = np.asarray(labels)
        ok = lab >= 0
        x, lab = x[ok], lab[ok]
        np.add.at(self.count, lab, 1.0)
        np.add.at(self.sum_x, lab, x)
        self.sum_xxt += x.T @ x

    def combine(self, other: "ScatterAccumulator") -> "ScatterAccumulator":
        return ScatterAccumulator(
            self.dim, self.n_classes,
            self.count + other.count, self.sum_x + other.sum_x,
            self.sum_xxt + other.sum_xxt, self.per_class_outer)

    def write(self, path: str) -> None:
        with open(path, "wb") as fh:
            pickle.dump(self.__dict__, fh)

    @classmethod
    def read(cls, path: str) -> "ScatterAccumulator":
        with open(path, "rb") as fh:
            d = pickle.load(fh)
        acc = cls.zeros(d["dim"], d["n_classes"])
        acc.__dict__.update(d)
        return acc

    # -- scatter matrices ---------------------------------------------------

    def scatter_matrices(self) -> Tuple[np.ndarray, np.ndarray]:
        """(within-class Sw, between-class Sb), both (D, D)."""
        total = self.count.sum()
        mean = self.sum_x.sum(0) / max(total, 1e-20)
        nonzero = self.count > 0
        class_means = np.zeros_like(self.sum_x)
        class_means[nonzero] = self.sum_x[nonzero] / self.count[nonzero, None]
        # total scatter St = E[xx^T] - mu mu^T  (times N)
        st = self.sum_xxt - total * np.outer(mean, mean)
        # between: sum_c n_c (mu_c - mu)(mu_c - mu)^T
        diff = class_means - mean
        sb = (diff.T * self.count) @ diff
        sw = st - sb
        return sw, sb


def lda_transform(sw: np.ndarray, sb: np.ndarray, n_outputs: int,
                  regularize: float = 1e-6) -> np.ndarray:
    """(n_outputs, D) LDA projection: top eigenvectors of Sw^-1 Sb solved
    via whitening + symmetric eigendecomposition (host, float64)."""
    d = sw.shape[0]
    sw = sw + regularize * np.trace(sw) / d * np.eye(d)
    evals, evecs = np.linalg.eigh(sw)
    w = evecs @ np.diag(1.0 / np.sqrt(np.maximum(evals, 1e-12))) @ evecs.T
    m = w @ sb @ w.T
    e2, v2 = np.linalg.eigh(m)
    order = np.argsort(e2)[::-1][:n_outputs]
    return (w.T @ v2[:, order]).T  # rows are projections


def estimate_lda(accumulator: ScatterAccumulator, n_outputs: int
                 ) -> np.ndarray:
    sw, sb = accumulator.scatter_matrices()
    return lda_transform(sw, sb, n_outputs)
