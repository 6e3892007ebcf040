"""Discriminative GMM estimation: MMI via extended Baum-Welch.

Reference: src/Mm/EbwDiscriminativeMixtureSetEstimator.hh (MODULE_MM_DT),
I-smoothing (src/Mm/ISmoothingMixtureSetEstimator.hh).  Numerator
statistics come from the forced alignment, denominator statistics from
recognition/lattice posteriors; the EBW update is

    mu' = (num_x - den_x + D_g mu) / (num_g - den_g + D_g)
    var' = (num_x2 - den_x2 + D_g (var + mu^2)) / (num_g - den_g + D_g)
           - mu'^2

with per-Gaussian D_g = max(E * den_gamma, D_min) chosen to keep variances
positive; I-smoothing interpolates toward the ML statistics with weight tau.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from .estimator import MixtureAccumulator
from .mixture_set import Mixture, MixtureSet


def ebw_update(numerator: MixtureAccumulator,
               denominator: MixtureAccumulator,
               prior_model: MixtureSet,
               e_constant: float = 2.0,
               d_min: float = 200.0,
               i_smoothing_tau: float = 0.0,
               variance_floor: float = 1e-8) -> MixtureSet:
    """Extended Baum-Welch re-estimation of means/variances + mixture
    weights from numerator/denominator accumulators."""
    if (numerator.n_densities != denominator.n_densities
            or numerator.dim != denominator.dim):
        raise ValueError("numerator/denominator accumulators incompatible")
    mean0, var0, _, mix_of = prior_model.packed()
    n = numerator.n_densities
    dim = numerator.dim

    num_g = numerator.weight.copy()
    num_x = numerator.sum_x.copy()
    num_x2 = numerator.sum_x2.copy()
    if i_smoothing_tau > 0:
        # I-smoothing: add tau pseudo-observations of the prior model
        num_g = num_g + i_smoothing_tau
        num_x = num_x + i_smoothing_tau * mean0
        num_x2 = num_x2 + i_smoothing_tau * (var0 + mean0 ** 2)

    den_g = denominator.weight
    den_x = denominator.sum_x
    den_x2 = denominator.sum_x2

    # per-Gaussian smoothing constant; grown until variances stay positive
    D = np.maximum(e_constant * den_g, d_min)
    means = np.zeros((n, dim))
    variances = np.zeros((n, dim))
    for _ in range(20):
        denom = (num_g - den_g + D)[:, None]
        means = (num_x - den_x + D[:, None] * mean0) / np.maximum(denom, 1e-20)
        variances = ((num_x2 - den_x2
                      + D[:, None] * (var0 + mean0 ** 2))
                     / np.maximum(denom, 1e-20) - means ** 2)
        bad = (variances <= variance_floor).any(axis=1) | (denom[:, 0] <= 0)
        if not bad.any():
            break
        D = np.where(bad, 2.0 * D, D)
    variances = np.maximum(variances, variance_floor)

    # weight update (per mixture): w' ~ w * (num_g/num_tot - den_g/den_tot + C)
    densities = np.stack([np.arange(n), np.arange(n)], axis=1).astype(np.int32)
    n_mix = prior_model.n_mixtures
    mixtures = []
    for mi in range(n_mix):
        idxs = np.nonzero(mix_of == mi)[0]
        # packed density order per mixture == density_indices order
        w0 = np.exp(np.asarray(prior_model.mixtures[mi].log_weights))
        num_tot = max(num_g[idxs].sum(), 1e-20)
        den_tot = max(den_g[idxs].sum(), 1e-20)
        ratio = num_g[idxs] / num_tot - den_g[idxs] / den_tot
        new_w = np.maximum(w0 * (1.0 + ratio), 1e-6)
        new_w = new_w / new_w.sum()
        mixtures.append(Mixture([int(i) for i in idxs],
                                list(np.log(new_w))))
    return MixtureSet(dim, means, variances, densities, mixtures)
