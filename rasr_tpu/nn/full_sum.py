"""Full-sum (lattice-free) sequence training over allophone-state graphs.

The reference exports allophone-state FSAs for full-sum training
(src/Nn/AllophoneStateFsaExporter.hh; RETURNN consumes them).  Here the
loss is native: the Baum-Welch forward total over the segment's state
graph, differentiable through the emission gather — one lax.scan per
segment, batched over padded graphs.

loss(log_posteriors, graph) = -log sum over paths p(path | posteriors)
                            = forward total of (-log_post) emission scores.

Works with any (T, S) emission log-posterior matrix (hybrid NN-HMM outputs
tied-state posteriors; CTC-style topologies are just a special graph).
"""

from __future__ import annotations

from functools import partial
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..search.aligner import BIG, PackedGraph
from ..speech.allophone_graph import StateGraph


def _lse_min(x, axis):
    """-logsumexp(-x): log-space 'min-sum' collect for -log scores."""
    return -jax.nn.logsumexp(-x, axis=axis)


def forward_total(pred, pred_score, emissions, init_score, final_score,
                  scores, n_frames):
    """-log total path score of one graph over (T, S) emission scores
    (negative log posteriors); frames past n_frames are masked."""
    em = scores[:, emissions]                    # (T, N)
    T = scores.shape[0]

    def step(alpha, inputs):
        em_t, valid = inputs
        cand = alpha[pred] + pred_score          # (N, K)
        new_alpha = _lse_min(cand, 1) + em_t
        new_alpha = jnp.where(valid, new_alpha, alpha)
        return new_alpha, None

    alpha0 = init_score + em[0]
    valid = jnp.arange(1, T) < n_frames
    alpha, _ = jax.lax.scan(step, alpha0, (em[1:], valid))
    return _lse_min(alpha + final_score, 0)


def pad_graphs(graphs: Sequence[StateGraph]
               ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray,
                          np.ndarray]:
    """Stack graphs into padded batch arrays:
    (pred (B,N,K), pred_score (B,N,K), emissions (B,N),
    init_score (B,N), final_score (B,N))."""
    packed = [PackedGraph.from_graph(g) for g in graphs]
    N = max(p.n_states for p in packed)
    K = max(p.pred.shape[1] for p in packed)
    B = len(packed)
    pred = np.zeros((B, N, K), np.int32)
    score = np.full((B, N, K), BIG, np.float32)
    em = np.zeros((B, N), np.int32)
    init = np.full((B, N), BIG, np.float32)
    fin = np.full((B, N), BIG, np.float32)
    for i, p in enumerate(packed):
        n, k = p.pred.shape
        pred[i, :n, :k] = np.asarray(p.pred)
        score[i, :n, :k] = np.asarray(p.pred_score)
        em[i, :n] = np.asarray(p.emissions)
        init[i, :n] = np.asarray(p.initial_score)
        fin[i, :n] = np.asarray(p.final_score)
    return pred, score, em, init, fin


@jax.jit
def full_sum_loss(log_posteriors: jnp.ndarray, n_frames: jnp.ndarray,
                  pred, pred_score, emissions, init_score, final_score
                  ) -> jnp.ndarray:
    """Batched full-sum loss: (B,) -log p(orth graph | posteriors).

    log_posteriors (B, T, S); graph arrays from pad_graphs."""
    scores = -log_posteriors  # framework Score convention

    def one(sc, nf, pr, ps, em, ini, fin):
        return forward_total(pr, ps, em, ini, fin, sc, nf)

    return jax.vmap(one)(scores, n_frames, pred, pred_score, emissions,
                         init_score, final_score)
