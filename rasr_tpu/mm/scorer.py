"""Batched GMM feature scorers on TPU.

The reference scores one feature vector at a time against one mixture with
runtime-emitted SIMD code (src/Mm/SimdFeatureScorer.hh:44,
GaussDiagonalMaximumFeatureScorer.cc) plus density-preselection tricks
(src/Mm/BatchFeatureScorer.hh:34).  On TPU all of that collapses into one
GEMM (SURVEY.md §2.8 "TPU mapping"):

    -2 log N(x | mu, var) = D log 2pi + sum log var + sum ((x-mu)^2 / var)
    score(x, mixture)     = 0.5 * min_d [ -2 log w_d  - 2 log N_d(x) ]
                                   (max approximation; 'sum' mode uses
                                    -logsumexp instead of min)

The quadratic form expands to an affine map of [x^2, x, 1]:

    sum (x-mu)^2/var  =  x^2 . (1/var)  -  2 x . (mu/var)  +  sum mu^2/var

so scoring T frames against N densities is a single (T, 2D+1) x (2D+1, N)
matmul, followed by a segment-min over each mixture's densities.  Scores are
identical in semantics to the reference scorer (0.5 * best -2-log-lik).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mixture_set import MixtureSet

_LOG_2PI = math.log(2.0 * math.pi)


class GmmScorer:
    """Batched scorer for a MixtureSet.

    score(features (T,D) or (B,T,D)) -> (T,S) / (B,T,S) negative
    log-likelihood scores, S = number of mixtures (emission classes).
    """

    def __init__(self, mixture_set: MixtureSet, mode: str = "max",
                 mixture_weight_scale: float = 1.0,
                 gaussian_scale: float = 1.0,
                 quantize: Optional[str] = None):
        """quantize='int8' scores through symmetric per-channel int8
        matmuls (int8 x int8 -> int32 on the MXU, 2-4x bf16 GEMM
        throughput); scores deviate <0.5% relative from the f32 path —
        below the pruning granularity of the search."""
        if mode not in ("max", "sum"):
            raise ValueError("mode must be 'max' or 'sum'")
        if quantize not in (None, "int8"):
            raise ValueError("quantize must be None or 'int8'")
        self.mode = mode
        self.quantize = quantize
        self.n_mixtures = mixture_set.n_mixtures
        self.dim = mixture_set.dim

        mean, var, m2lw, mix_of = mixture_set.packed()
        # gaussian-scale scales the inverse variance (reference scales the
        # inverse sqrt diag by sqrt(scale)); weight scale scales -2 log w
        inv_var = gaussian_scale / var
        m2lw = mixture_weight_scale * m2lw
        # per-density constant: -2logw + D log 2pi + sum log var
        const = (m2lw + self.dim * _LOG_2PI
                 + np.sum(np.log(var), axis=1))
        # affine expansion: score2(x) = x^2 . a + x . b + c
        self._a = jnp.asarray(inv_var.T, dtype=jnp.float32)           # (D, N)
        self._b = jnp.asarray((-2.0 * mean * inv_var).T, jnp.float32)  # (D, N)
        self._c = jnp.asarray(const + np.sum(mean * mean * inv_var, axis=1),
                              dtype=jnp.float32)                       # (N,)
        self._mix_of = jnp.asarray(mix_of, dtype=jnp.int32)           # (N,)
        if quantize == "int8":
            # stacked weight (2D, N): rows [a; b] so one int8 GEMM covers
            # both terms; symmetric per-output-channel scales
            w = np.concatenate([inv_var.T, (-2.0 * mean * inv_var).T], 0)
            col_scale = np.maximum(np.abs(w).max(axis=0), 1e-30) / 127.0
            self._w_q = jnp.asarray(
                np.clip(np.rint(w / col_scale[None, :]), -127, 127),
                jnp.int8)                                          # (2D, N)
            self._w_scale = jnp.asarray(col_scale, jnp.float32)    # (N,)
        self._scorer = jax.jit(self._score_impl)

    def _score_impl(self, features: jnp.ndarray) -> jnp.ndarray:
        x = features.astype(jnp.float32)
        hp = jax.lax.Precision.HIGHEST
        if self.quantize == "int8":
            z = jnp.concatenate([x * x, x], axis=-1)           # (..., 2D)
            row_scale = jnp.maximum(jnp.max(jnp.abs(z), axis=-1,
                                            keepdims=True), 1e-30) / 127.0
            z_q = jnp.clip(jnp.rint(z / row_scale), -127, 127
                           ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                z_q, self._w_q, (((z_q.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)              # (..., N)
            d2 = (acc.astype(jnp.float32) * row_scale
                  * self._w_scale + self._c)
        else:
            d2 = (jnp.matmul(x * x, self._a, precision=hp)
                  + jnp.matmul(x, self._b, precision=hp) + self._c)  # (..., N)
        if self.mode == "max":
            red = partial(jax.ops.segment_min, num_segments=self.n_mixtures)
            per_mix = _segment_reduce_lastaxis(d2, self._mix_of, red)
            return 0.5 * per_mix
        # full-sum: -2 log sum_d exp(-d2/2) = -2 logsumexp(-d2/2)
        neg_half = -0.5 * d2
        per_mix = _segment_logsumexp_lastaxis(neg_half, self._mix_of,
                                              self.n_mixtures)
        return -per_mix

    def score(self, features) -> jnp.ndarray:
        """Negative log-likelihood scores, lower = better (reference Score
        convention)."""
        return self._scorer(jnp.asarray(features))

    def __call__(self, features) -> jnp.ndarray:
        return self.score(features)

    def assign_densities(self, features, mixture_path) -> np.ndarray:
        """Best packed-density index per frame GIVEN an aligned mixture path
        (T,) — the assignment step of Viterbi accumulation (reference
        ScoreAndBestDensity, GaussDiagonalMaximumFeatureScorer)."""
        if not hasattr(self, "_dens_table"):
            mix_of = np.asarray(self._mix_of)
            max_d = int(np.max(np.bincount(mix_of, minlength=self.n_mixtures)))
            table = np.zeros((self.n_mixtures, max_d), dtype=np.int32)
            valid = np.zeros((self.n_mixtures, max_d), dtype=bool)
            fill = [0] * self.n_mixtures
            for d, m in enumerate(mix_of):
                table[m, fill[m]] = d
                valid[m, fill[m]] = True
                fill[m] += 1
            self._dens_table = jnp.asarray(table)
            self._dens_valid = jnp.asarray(valid)

        if not hasattr(self, "_assign_fn"):
            @jax.jit
            def assign(x, path):
                hp = jax.lax.Precision.HIGHEST
                d2 = (jnp.matmul(x * x, self._a, precision=hp)
                      + jnp.matmul(x, self._b, precision=hp) + self._c)
                idx = self._dens_table[path]          # (T, maxD)
                ok = self._dens_valid[path]
                cand = jnp.take_along_axis(d2, idx, axis=1)
                cand = jnp.where(ok, cand, jnp.inf)
                best = jnp.argmin(cand, axis=1)
                return jnp.take_along_axis(idx, best[:, None], axis=1)[:, 0]

            self._assign_fn = assign
        return np.asarray(self._assign_fn(
            jnp.asarray(features, jnp.float32),
            jnp.asarray(mixture_path, jnp.int32)))


def _segment_reduce_lastaxis(values: jnp.ndarray, segment_ids: jnp.ndarray,
                             reduce_fn) -> jnp.ndarray:
    """Apply a jax.ops.segment_* reduction along the LAST axis."""
    moved = jnp.moveaxis(values, -1, 0)          # (N, ...)
    out = reduce_fn(moved, segment_ids)           # (S, ...)
    return jnp.moveaxis(out, 0, -1)


def _segment_logsumexp_lastaxis(values: jnp.ndarray, segment_ids: jnp.ndarray,
                                num_segments: int) -> jnp.ndarray:
    moved = jnp.moveaxis(values, -1, 0)
    seg_max = jax.ops.segment_max(moved, segment_ids, num_segments=num_segments)
    exp = jnp.exp(moved - seg_max[segment_ids])
    seg_sum = jax.ops.segment_sum(exp, segment_ids, num_segments=num_segments)
    return jnp.moveaxis(jnp.log(seg_sum) + seg_max, 0, -1)


class CombinedScorer:
    """Multi-stream emission scoring (reference Mm::CombinedFeatureScorer,
    src/Mm/CombinedFeatureScorer.hh:24): emission e over feature streams
    x_1..x_M scores

        score(e) = sum_i scale_i * scorer_i(x_i)[mixture_index_table[e, i]]

    Each scorer sees its own stream (multi-stream acoustic front-ends via
    Flow aggregation); the table maps combined emissions to per-model
    mixture indices.
    """

    def __init__(self, scorers: Sequence, mixture_index_table,
                 scales: Optional[Sequence[float]] = None):
        self.scorers = list(scorers)
        self.table = np.asarray(mixture_index_table, dtype=np.int32)
        if self.table.ndim != 2 or self.table.shape[1] != len(self.scorers):
            raise ValueError("mixture index table must be (E, n_models)")
        self.scales = list(scales) if scales is not None \
            else [1.0] * len(self.scorers)
        for i, sc in enumerate(self.scorers):
            if self.table[:, i].max() >= sc.n_mixtures:
                raise ValueError(f"table column {i} exceeds model size")

    @property
    def n_mixtures(self) -> int:
        return self.table.shape[0]

    def score(self, streams: Sequence) -> jnp.ndarray:
        """streams: one (T, D_i) array per model -> (T, E) scores."""
        if len(streams) != len(self.scorers):
            raise ValueError("one feature stream per scorer required")
        out = None
        for i, (sc, x) in enumerate(zip(self.scorers, streams)):
            part = self.scales[i] * sc.score(x)[..., self.table[:, i]]
            out = part if out is None else out + part
        return out

    def __call__(self, streams) -> jnp.ndarray:
        return self.score(streams)
