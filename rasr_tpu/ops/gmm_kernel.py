"""Pallas TPU kernel: fused GMM scoring.

The XLA path (mm/scorer.py) materializes the (T, N_densities) distance
matrix in HBM before the per-mixture min.  For production-size mixture sets
(N ~ 100k densities at 4k mixtures x 32 densities) that intermediate is
the dominant HBM traffic: T=1000 frames x 100k densities x 4B = 400 MB per
segment.  This kernel tiles frames x densities on the MXU and reduces the
per-mixture minimum on-chip, writing only the (T, S) result.

Requires densities grouped by mixture with equal-size padding
(mixture i owns densities [i*DPM, (i+1)*DPM) — pad with dummy densities of
+inf constant, as MixtureSet.packed_padded provides).

Grid: (T/TILE_T, N/TILE_N); the mixture axis tiles along N so each step
reduces TILE_N/DPM complete mixtures.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

BIG = 3.0e38  # padding constant (still finite in f32)


def _gmm_kernel(x2_ref, x_ref, a_ref, b_ref, c_ref, out_ref, *, dpm: int):
    """One (TILE_T, TILE_N) tile: d2 = x2 @ a + x @ b + c, then min over
    groups of `dpm` densities -> (TILE_T, TILE_N // dpm) mixture scores."""
    hp = jax.lax.Precision.HIGHEST
    d2 = jnp.dot(x2_ref[:], a_ref[:], precision=hp,
                 preferred_element_type=jnp.float32)
    d2 = d2 + jnp.dot(x_ref[:], b_ref[:], precision=hp,
                      preferred_element_type=jnp.float32)
    d2 = d2 + c_ref[:]
    tile_t, tile_n = d2.shape
    grouped = d2.reshape(tile_t, tile_n // dpm, dpm)
    out_ref[:] = 0.5 * jnp.min(grouped, axis=2)


def gmm_score_pallas(features: jnp.ndarray,
                     a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                     dpm: int,
                     tile_t: int = 128, tile_n: int = 512) -> jnp.ndarray:
    """features (T, D); a,b (D, N); c (N,); densities grouped per mixture
    with dpm densities each (N = S * dpm).  Returns (T, S) scores
    = 0.5 * min over each mixture's densities of the -2-log-likelihood."""
    T, D = features.shape
    N = a.shape[1]
    if N % dpm:
        raise ValueError("N must be a multiple of densities-per-mixture")
    S = N // dpm
    if tile_n % dpm:
        tile_n = dpm * max(tile_n // dpm, 1)
    # pad T and N to tile multiples
    Tp = -(-T // tile_t) * tile_t
    Np = -(-N // tile_n) * tile_n
    x = features.astype(jnp.float32)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    if Np != N:
        a = jnp.pad(a, ((0, 0), (0, Np - N)))
        b = jnp.pad(b, ((0, 0), (0, Np - N)))
        c = jnp.pad(c, (0, Np - N), constant_values=BIG)
    x2 = x * x
    Sp = Np // dpm
    tile_s = tile_n // dpm

    grid = (Tp // tile_t, Np // tile_n)
    out = pl.pallas_call(
        functools.partial(_gmm_kernel, dpm=dpm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_t, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, D), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_n), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, tile_s), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Sp), jnp.float32),
    )(x2, x, a, b, c.reshape(1, -1))
    return out[:T, :S]


class PallasGmmScorer:
    """Drop-in fused scorer over a MixtureSet with equal-size mixture
    padding.  Falls back to the XLA scorer where Pallas is unavailable."""

    def __init__(self, mixture_set, mixture_weight_scale: float = 1.0,
                 gaussian_scale: float = 1.0):
        mean, var, m2lw, mix_of = mixture_set.packed()
        self.n_mixtures = mixture_set.n_mixtures
        self.dim = mixture_set.dim
        # pad every mixture to the max densities-per-mixture
        counts = np.bincount(mix_of, minlength=self.n_mixtures)
        dpm = int(counts.max()) if len(counts) else 1
        N = self.n_mixtures * dpm
        inv_var = gaussian_scale / var
        const = (mixture_weight_scale * m2lw
                 + self.dim * math.log(2.0 * math.pi)
                 + np.sum(np.log(var), axis=1)
                 + np.sum(mean * mean * inv_var, axis=1))
        a = np.zeros((self.dim, N), np.float32)
        b = np.zeros((self.dim, N), np.float32)
        c = np.full((N,), BIG, np.float32)
        fill = np.zeros(self.n_mixtures, np.int64)
        for d, m in enumerate(mix_of):
            slot = m * dpm + fill[m]
            a[:, slot] = inv_var[d]
            b[:, slot] = -2.0 * mean[d] * inv_var[d]
            c[slot] = const[d]
            fill[m] += 1
        self.dpm = dpm
        self._a = jnp.asarray(a)
        self._b = jnp.asarray(b)
        self._c = jnp.asarray(c)
        self._jit = jax.jit(functools.partial(
            gmm_score_pallas, a=self._a, b=self._b, c=self._c, dpm=dpm))

    def score(self, features) -> jnp.ndarray:
        return self._jit(jnp.asarray(features, jnp.float32))

    def __call__(self, features) -> jnp.ndarray:
        return self.score(features)
