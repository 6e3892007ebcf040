"""Pallas TPU kernel: fused GMM scoring.

The XLA path (mm/scorer.py) materializes the (T, N_densities) distance
matrix in HBM before the per-mixture min.  For production-size mixture sets
(N ~ 100k densities at 4k mixtures x 32 densities) that intermediate is
the dominant HBM traffic: T=1000 frames x 100k densities x 4B = 400 MB per
segment.  This kernel tiles (frames x mixtures x density-slot) on the MXU
and accumulates the per-mixture minimum on-chip, writing only the (T, S)
result.

Layout: densities interleave k-major — density slot k of mixture m sits at
column k*S + m — so every (TILE_T, TILE_S) tile of the output is reduced
over the grid's k axis with a running elementwise minimum (no in-kernel
reshapes, Mosaic-friendly).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 3.0e38  # padding constant (still finite in f32)


def _gmm_kernel(x2_ref, x_ref, a_ref, b_ref, c_ref, out_ref):
    """Tile (TILE_T, TILE_S) for density slot k = program_id(2):
    d2 = x2 @ a + x @ b + c; out = min(out, 0.5 * d2) over k."""
    k = pl.program_id(2)
    hp = jax.lax.Precision.HIGHEST
    d2 = jnp.dot(x2_ref[:], a_ref[:], precision=hp,
                 preferred_element_type=jnp.float32)
    d2 = d2 + jnp.dot(x_ref[:], b_ref[:], precision=hp,
                      preferred_element_type=jnp.float32)
    d2 = 0.5 * (d2 + c_ref[:])

    @pl.when(k == 0)
    def _():
        out_ref[:] = d2

    @pl.when(k > 0)
    def _():
        out_ref[:] = jnp.minimum(out_ref[:], d2)


def gmm_score_pallas(features: jnp.ndarray,
                     a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray,
                     n_mixtures: int, dpm: int,
                     tile_t: int = 128, tile_s: int = 512) -> jnp.ndarray:
    """features (T, D); a, b (D, dpm*Sp); c (dpm*Sp,) in k-major interleaved
    layout (slot k of mixture m at column k*Sp + m, Sp = padded mixtures).
    Returns (T, n_mixtures) scores = 0.5 * min_k of the -2-log-likelihood."""
    T, D = features.shape
    Sp = a.shape[1] // dpm
    if Sp % tile_s:
        raise ValueError("padded mixture count must be a tile_s multiple")
    Tp = -(-T // tile_t) * tile_t
    x = features.astype(jnp.float32)
    if Tp != T:
        x = jnp.pad(x, ((0, Tp - T), (0, 0)))
    x2 = x * x

    s_tiles = Sp // tile_s
    grid = (Tp // tile_t, s_tiles, dpm)
    out = pl.pallas_call(
        _gmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_t, D), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_t, D), lambda i, j, k: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_s),
                         lambda i, j, k, st=s_tiles: (0, k * st + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, tile_s),
                         lambda i, j, k, st=s_tiles: (0, k * st + j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_s),
                         lambda i, j, k, st=s_tiles: (0, k * st + j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_t, tile_s), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Tp, Sp), jnp.float32),
    )(x2, x, a, b, c.reshape(1, -1))
    return out[:T, :n_mixtures]


class PallasGmmScorer:
    """Fused scorer over a MixtureSet: one kernel, no HBM intermediate."""

    def __init__(self, mixture_set, mixture_weight_scale: float = 1.0,
                 gaussian_scale: float = 1.0, tile_s: int = 512,
                 interpret: bool = False):
        mean, var, m2lw, mix_of = mixture_set.packed()
        self.n_mixtures = mixture_set.n_mixtures
        self.dim = mixture_set.dim
        counts = np.bincount(mix_of, minlength=self.n_mixtures)
        dpm = int(counts.max()) if len(counts) else 1
        Sp = -(-self.n_mixtures // tile_s) * tile_s
        N = dpm * Sp
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
            slot = int(fill[m]) * Sp + m   # k-major interleaved layout
            a[:, slot] = inv_var[d]
            b[:, slot] = -2.0 * mean[d] * inv_var[d]
            c[slot] = const[d]
            fill[m] += 1
        self.dpm = dpm
        self._a = jnp.asarray(a)
        self._b = jnp.asarray(b)
        self._c = jnp.asarray(c)
        self._jit = jax.jit(functools.partial(
            gmm_score_pallas, a=self._a, b=self._b, c=self._c,
            n_mixtures=self.n_mixtures, dpm=dpm, tile_s=tile_s))

    def score(self, features) -> jnp.ndarray:
        return self._jit(jnp.asarray(features, jnp.float32))

    def __call__(self, features) -> jnp.ndarray:
        return self.score(features)
