"""Gaussian mixture sets.

Data model for mixture-set acoustic models (reference:
src/Mm/MixtureSet.hh:140, GaussDensity.hh, MixtureSetTopology.hh) plus the
documented "PMS" text interchange format (doc/file_formats/mixture_file.rst):

    #Version: 1.0
    #CovarianceType: DiagonalCovariance
    dim nMixtures nDensities nMeans nCovariances
    <mixtures:   nDensities (densityId logWeight)...>
    <densities:  meanId covarianceId>
    <means:      dim m1 m2 ...>
    <covariances: dim c1 w1 c2 w2 ...>
"""

from __future__ import annotations

import gzip
import math
from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class Mixture:
    density_indices: List[int]
    log_weights: List[float]

    @property
    def n_densities(self) -> int:
        return len(self.density_indices)


@dataclass
class MixtureSet:
    dim: int
    means: np.ndarray                      # (nMeans, dim) f64
    covariances: np.ndarray                # (nCovariances, dim) f64 diagonal
    densities: np.ndarray                  # (nDensities, 2) [meanIdx, covIdx]
    mixtures: List[Mixture] = field(default_factory=list)

    @property
    def n_mixtures(self) -> int:
        return len(self.mixtures)

    @property
    def n_densities(self) -> int:
        return len(self.densities)

    # -- packed views for batched scoring ----------------------------------

    def packed(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Density-major packed arrays for the XLA scorer:
        returns (mean (N,D), var (N,D), minus2_log_weight (N,),
        mixture_of_density (N,)) with densities regrouped per mixture."""
        order: List[int] = []
        mix_of: List[int] = []
        m2lw: List[float] = []
        for mi, mix in enumerate(self.mixtures):
            for di, lw in zip(mix.density_indices, mix.log_weights):
                order.append(di)
                mix_of.append(mi)
                m2lw.append(-2.0 * lw)
        order_arr = np.asarray(order, dtype=np.int32)
        mean = self.means[self.densities[order_arr, 0]]
        var = self.covariances[self.densities[order_arr, 1]]
        return (mean, var, np.asarray(m2lw, dtype=np.float64),
                np.asarray(mix_of, dtype=np.int32))

    # -- PMS text format ------------------------------------------------------

    @classmethod
    def read_pms(cls, path: str) -> "MixtureSet":
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as fh:
            tokens: List[str] = []
            version = 1.0
            for line in fh:
                if line.startswith("#"):
                    if "Version" in line:
                        version = float(line.split(":")[1])
                    continue
                tokens.extend(line.split())
        it = iter(tokens)

        def ni() -> int:
            return int(next(it))

        def nf() -> float:
            return float(next(it))

        dim, n_mix, n_dns, n_means, n_covs = ni(), ni(), ni(), ni(), ni()
        mixtures = []
        for _ in range(n_mix):
            nd = ni()
            idxs, lws = [], []
            for _ in range(nd):
                idxs.append(ni())
                w = nf()
                # version >= 1.0 stores log-weights; older stores weights
                lws.append(w if version >= 1.0 else math.log(max(w, 1e-300)))
            mixtures.append(Mixture(idxs, lws))
        densities = np.zeros((n_dns, 2), dtype=np.int32)
        for i in range(n_dns):
            densities[i, 0] = ni()
            densities[i, 1] = ni()
        means = np.zeros((n_means, dim), dtype=np.float64)
        for i in range(n_means):
            d = ni()
            if d != dim:
                raise ValueError(f"mean {i}: dim {d} != {dim}")
            means[i] = [nf() for _ in range(dim)]
        covs = np.zeros((n_covs, dim), dtype=np.float64)
        for i in range(n_covs):
            d = ni()
            if d != dim:
                raise ValueError(f"covariance {i}: dim {d} != {dim}")
            vals = []
            for _ in range(dim):
                vals.append(nf())
                nf()  # interleaved weight, unused for scoring
            covs[i] = vals
        return cls(dim, means, covs, densities, mixtures)

    def write_pms(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "wt") as fh:
            fh.write("#Version: 1.0\n#CovarianceType: DiagonalCovariance\n")
            fh.write(f"{self.dim} {self.n_mixtures} {self.n_densities} "
                     f"{len(self.means)} {len(self.covariances)}\n")
            for mix in self.mixtures:
                parts = [str(mix.n_densities)]
                for di, lw in zip(mix.density_indices, mix.log_weights):
                    parts.append(f"{di} {float(lw)!r}")
                fh.write(" ".join(parts) + "\n")
            for d in self.densities:
                fh.write(f"{d[0]} {d[1]}\n")
            for m in self.means:
                fh.write(f"{self.dim} " + " ".join(repr(float(v)) for v in m) + "\n")
            for c in self.covariances:
                fh.write(f"{self.dim} "
                         + " ".join(f"{float(v)!r} 1.0" for v in c) + "\n")

    # -- construction helpers --------------------------------------------------

    @classmethod
    def single_gaussian(cls, means: np.ndarray, variances: np.ndarray) -> "MixtureSet":
        """One density per mixture (monophone init / after LDA)."""
        means = np.asarray(means, dtype=np.float64)
        variances = np.asarray(variances, dtype=np.float64)
        s, d = means.shape
        densities = np.stack([np.arange(s), np.arange(s)], axis=1).astype(np.int32)
        mixtures = [Mixture([i], [0.0]) for i in range(s)]
        return cls(d, means, variances, densities, mixtures)
