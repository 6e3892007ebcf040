"""Legacy binary mixture-set accumulator ("MIXSET") file IO.

Byte-exact re-creation of the reference accumulator files
(src/Mm/AbstractMixtureSetEstimator.cc:433 read / :481 write,
VectorAccumulator.hh:79 layout, version 2, little endian):

    8 bytes  magic "MIXSET" NUL-padded
    u32      version (2)
    u32      dimension
    u32      nMeans;       per mean:  u32 size, f64 sum[size], f64 weight
    u32      nCovariances; per covar: u32 size, f64 sum[size], f64 weight
    u32      nDensities;   per density: u32 meanIdx, u32 covarIdx
    u32      nMixtures;    per mixture: u32 nDens,
                           then per density: u32 densityIdx, f64 weight

Weight/Sum are f64 (src/Mm/Types.hh:30,40).  Covariance sums are sums of
squares (plusSquare accumulators).  The reader converts into the native
MixtureAccumulator (density-major weight/sum_x/sum_x2) so legacy
accumulators merge and estimate through the normal pipeline.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from typing import BinaryIO, List, Tuple, Union

import numpy as np

MAGIC = b"MIXSET\x00\x00"
VERSION = 2


@dataclass
class LegacyAccumulatorFile:
    dim: int
    mean_sums: np.ndarray        # (nMeans, D) f64
    mean_weights: np.ndarray     # (nMeans,) f64
    covar_sums: np.ndarray       # (nCov, D) sums of squares
    covar_weights: np.ndarray    # (nCov,) f64
    densities: np.ndarray        # (nDens, 2) [meanIdx, covarIdx]
    mixtures: List[List[Tuple[int, float]]]  # per mixture: (densityIdx, w)


def _open(f: Union[str, BinaryIO], mode: str):
    if isinstance(f, str):
        return open(f, mode), True
    return f, False


def read_legacy_accumulator(source: Union[str, BinaryIO]
                            ) -> LegacyAccumulatorFile:
    fh, close = _open(source, "rb")
    try:
        magic = fh.read(8)
        if magic[:6] != MAGIC[:6]:
            raise ValueError(f"bad accumulator magic {magic!r}")
        version, dim = struct.unpack("<II", fh.read(8))
        if version not in (1, 2):
            raise ValueError(f"unsupported accumulator version {version}")

        def read_vector_block(n):
            sums = np.zeros((n, dim), np.float64)
            weights = np.zeros(n, np.float64)
            for i in range(n):
                size, = struct.unpack("<I", fh.read(4))
                if size != dim:
                    raise ValueError("accumulator size != dimension")
                sums[i] = np.frombuffer(fh.read(8 * size), "<f8")
                weights[i], = struct.unpack("<d", fh.read(8))
            return sums, weights

        n_means, = struct.unpack("<I", fh.read(4))
        mean_sums, mean_weights = read_vector_block(n_means)
        n_cov, = struct.unpack("<I", fh.read(4))
        covar_sums, covar_weights = read_vector_block(n_cov)
        n_dens, = struct.unpack("<I", fh.read(4))
        densities = np.frombuffer(fh.read(8 * n_dens),
                                  "<u4").reshape(n_dens, 2).copy()
        n_mix, = struct.unpack("<I", fh.read(4))
        mixtures: List[List[Tuple[int, float]]] = []
        for _ in range(n_mix):
            nd, = struct.unpack("<I", fh.read(4))
            row: List[Tuple[int, float]] = []
            for _ in range(nd):
                di, = struct.unpack("<I", fh.read(4))
                w, = struct.unpack("<d", fh.read(8))
                row.append((int(di), float(w)))
            mixtures.append(row)
        return LegacyAccumulatorFile(dim, mean_sums, mean_weights,
                                     covar_sums, covar_weights,
                                     densities, mixtures)
    finally:
        if close:
            fh.close()


def write_legacy_accumulator(acc: LegacyAccumulatorFile,
                             sink: Union[str, BinaryIO]) -> None:
    fh, close = _open(sink, "wb")
    try:
        fh.write(MAGIC)
        fh.write(struct.pack("<II", VERSION, acc.dim))

        def write_vector_block(sums, weights):
            fh.write(struct.pack("<I", len(sums)))
            for s, w in zip(sums, weights):
                fh.write(struct.pack("<I", acc.dim))
                fh.write(np.asarray(s, "<f8").tobytes())
                fh.write(struct.pack("<d", float(w)))

        write_vector_block(acc.mean_sums, acc.mean_weights)
        write_vector_block(acc.covar_sums, acc.covar_weights)
        fh.write(struct.pack("<I", len(acc.densities)))
        fh.write(np.asarray(acc.densities, "<u4").tobytes())
        fh.write(struct.pack("<I", len(acc.mixtures)))
        for row in acc.mixtures:
            fh.write(struct.pack("<I", len(row)))
            for di, w in row:
                fh.write(struct.pack("<Id", di, w))
    finally:
        if close:
            fh.close()


def to_mixture_accumulator(legacy: LegacyAccumulatorFile):
    """Convert into the native density-major MixtureAccumulator.

    Legacy densities reference (mean, covariance) pools; covariance
    estimators may be SHARED across densities (pooled variance).  The
    native accumulator is density-major, so shared covariance statistics
    are divided proportionally to the density weights — combine +
    estimate then reproduce the pooled totals exactly.
    """
    from .estimator import MixtureAccumulator
    n_dens = len(legacy.densities)
    mixture_of = np.zeros(n_dens, np.int32)
    dens_weight = np.zeros(n_dens, np.float64)
    for mi, row in enumerate(legacy.mixtures):
        for di, w in row:
            mixture_of[di] = mi
            dens_weight[di] = w
    acc = MixtureAccumulator.zeros(legacy.dim, mixture_of)
    cov_total = np.zeros(len(legacy.covar_weights))
    for di in range(n_dens):
        cov_total[legacy.densities[di, 1]] += dens_weight[di]
    for di in range(n_dens):
        mean_i, cov_i = legacy.densities[di]
        acc.weight[di] = dens_weight[di]
        acc.sum_x[di] = legacy.mean_sums[mean_i]
        share = (dens_weight[di] / cov_total[cov_i]
                 if cov_total[cov_i] > 0 else 0.0)
        acc.sum_x2[di] = legacy.covar_sums[cov_i] * share
    return acc
