"""Forced alignment on TPU: Viterbi and Baum-Welch over state graphs.

The reference aligner runs a pointer-based DP over an allophone-state FSA
frame by frame (src/Search/Aligner.hh:36,114).  Here the DP is a
`lax.scan` over time with the graph in dense per-state incoming-arc form:
each state has at most K predecessors (padded), so one scan step is a
(N, K) gather + min/logsumexp reduce + emission add — all fused by XLA.
The traceback also runs on device as a reverse scan over backpointers.

Scores are -log probabilities (lower = better), matching the reference's
Score convention; emission scores come from any (T, E) score matrix
(GmmScorer output or NN posteriors).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..speech.allophone_graph import StateGraph

BIG = 1e30


@dataclass
class PackedGraph:
    """Dense incoming-arc representation (host-built, device-resident)."""
    n_states: int
    pred: jnp.ndarray          # (N, K) predecessor state ids (0-padded)
    pred_score: jnp.ndarray    # (N, K) arc scores (BIG = absent)
    emissions: jnp.ndarray     # (N,) emission class per state
    labels: jnp.ndarray        # (N,)
    initial_score: jnp.ndarray  # (N,) 0/score for entry states, BIG otherwise
    final_score: jnp.ndarray    # (N,) exit score for final states, BIG otherwise

    @classmethod
    def from_graph(cls, g: StateGraph) -> "PackedGraph":
        n = g.n_states
        by_target: list = [[] for _ in range(n)]
        for f, t, s in zip(g.arcs_from, g.arcs_to, g.arcs_score):
            by_target[int(t)].append((int(f), float(s)))
        k = max((len(x) for x in by_target), default=1) or 1
        pred = np.zeros((n, k), dtype=np.int32)
        score = np.full((n, k), BIG, dtype=np.float32)
        for t, lst in enumerate(by_target):
            for j, (f, s) in enumerate(lst):
                pred[t, j] = f
                score[t, j] = s
        init = np.full((n,), BIG, dtype=np.float32)
        init[g.initial] = g.initial_score
        fin = np.full((n,), BIG, dtype=np.float32)
        fin[g.final] = g.final_score
        return cls(n, jnp.asarray(pred), jnp.asarray(score),
                   jnp.asarray(g.emissions), jnp.asarray(g.labels),
                   jnp.asarray(init), jnp.asarray(fin))


@partial(jax.jit, static_argnames=("return_labels",))
def _viterbi(pred, pred_score, emissions, labels, init_score, final_score,
             scores, return_labels=True):
    """scores: (T, E) emission score matrix (-log).  Returns
    (state_path (T,), label_path (T,), total_score)."""
    em = scores[:, emissions]                 # (T, N) per-state scores

    def step(alpha, em_t):
        cand = alpha[pred] + pred_score       # (N, K)
        best = jnp.min(cand, axis=1)
        back = jnp.argmin(cand, axis=1).astype(jnp.int32)
        new_alpha = best + em_t
        return new_alpha, back

    alpha0 = init_score + em[0]
    alpha_last, backs = jax.lax.scan(step, alpha0, em[1:])
    total = jnp.min(alpha_last + final_score)
    last_state = jnp.argmin(alpha_last + final_score).astype(jnp.int32)

    def back_step(state, back_t):
        prev = pred[state, back_t[state]]
        return prev, state

    first_state, rest = jax.lax.scan(back_step, last_state, backs,
                                     reverse=True)
    path = jnp.concatenate([first_state[None], rest])
    if return_labels:
        return path, labels[path], total
    return path, path, total


@jax.jit
def _forward_backward(pred, pred_score, emissions, n_states_arr, succ, succ_score,
                      init_score, final_score, scores):
    """Baum-Welch: returns (T, N) state posterior -log occupancy weights
    (gamma) and the total -log score."""
    em = scores[:, emissions]                  # (T, N)

    def lse(x, axis):
        return -jax.nn.logsumexp(-x, axis=axis)

    def fwd_step(alpha, em_t):
        cand = alpha[pred] + pred_score
        new_alpha = lse(cand, 1) + em_t
        return new_alpha, new_alpha

    alpha0 = init_score + em[0]
    _, alphas_rest = jax.lax.scan(fwd_step, alpha0, em[1:])
    alphas = jnp.concatenate([alpha0[None], alphas_rest])   # (T, N)
    total = lse(alphas[-1] + final_score, 0)

    def bwd_step(beta, em_t):
        # beta[i] = -log sum_j exp(-(w(i,j) + em_t[j] + beta[j]))
        cand = beta[succ] + succ_score + em_t[succ]
        new_beta = lse(cand, 1)
        return new_beta, new_beta

    beta_T = final_score
    _, betas_rest = jax.lax.scan(bwd_step, beta_T, em[1:], reverse=True)
    betas = jnp.concatenate([betas_rest, beta_T[None]])     # (T, N)

    gamma = alphas + betas - total                          # -log posterior
    return gamma, total


class Aligner:
    """Forced aligner over a StateGraph (Viterbi or Baum-Welch)."""

    def __init__(self, graph: StateGraph):
        self.graph = graph
        self.packed = PackedGraph.from_graph(graph)
        # successor packing for backward pass
        n = graph.n_states
        by_source: list = [[] for _ in range(n)]
        for f, t, s in zip(graph.arcs_from, graph.arcs_to, graph.arcs_score):
            by_source[int(f)].append((int(t), float(s)))
        k = max((len(x) for x in by_source), default=1) or 1
        succ = np.zeros((n, k), dtype=np.int32)
        succ_score = np.full((n, k), BIG, dtype=np.float32)
        for f, lst in enumerate(by_source):
            for j, (t, s) in enumerate(lst):
                succ[f, j] = t
                succ_score[f, j] = s
        self._succ = jnp.asarray(succ)
        self._succ_score = jnp.asarray(succ_score)

    def align(self, scores) -> Tuple[np.ndarray, np.ndarray, float]:
        """Viterbi: scores (T, E) -> (state path, allophone-state labels,
        total score)."""
        p = self.packed
        path, labels, total = _viterbi(p.pred, p.pred_score, p.emissions,
                                       p.labels, p.initial_score,
                                       p.final_score, jnp.asarray(scores))
        return np.asarray(path), np.asarray(labels), float(total)

    def emission_path(self, scores) -> np.ndarray:
        """Viterbi path mapped to emission indices (for accumulation)."""
        path, _, _ = self.align(scores)
        return np.asarray(self.graph.emissions)[path]

    def linear_path(self) -> np.ndarray:
        """Canonical loop-free state sequence: from the lowest entry state,
        follow the smallest-target non-loop arc until a final state."""
        g = self.graph
        succ: dict = {}
        for f, t, _ in zip(g.arcs_from, g.arcs_to, g.arcs_score):
            f, t = int(f), int(t)
            if t != f:
                succ.setdefault(f, []).append(t)
        finals = set(int(s) for s in g.final)
        state = int(min(g.initial))
        path = [state]
        seen = {state}
        while state not in finals:
            nxt = [t for t in succ.get(state, []) if t not in seen]
            if not nxt:
                break
            state = min(nxt)
            path.append(state)
            seen.add(state)
        return np.asarray(path, dtype=np.int32)

    def linear_alignment(self, n_frames: int) -> np.ndarray:
        """Uniform (linear-segmentation) alignment for flat starts:
        emission path spreading frames evenly over the canonical states."""
        path = self.linear_path()
        idx = np.minimum((np.arange(n_frames) * len(path)) // max(n_frames, 1),
                         len(path) - 1)
        return np.asarray(self.graph.emissions)[path[idx]]

    def posteriors(self, scores) -> Tuple[np.ndarray, float]:
        """Baum-Welch state posteriors: (T, N) probabilities, total score."""
        p = self.packed
        gamma, total = _forward_backward(
            p.pred, p.pred_score, p.emissions,
            jnp.asarray(p.n_states), self._succ, self._succ_score,
            p.initial_score, p.final_score, jnp.asarray(scores))
        return np.exp(-np.asarray(gamma)), float(total)


# ---------------------------------------------------------------------------
# batched alignment (many segments per device dispatch)
# ---------------------------------------------------------------------------

@jax.jit
def _viterbi_batch(pred, pred_score, emissions, init_score, final_score,
                   em, valid):
    """All inputs batched: pred (B,N,K), em (B,T,N), valid (B,T) —
    frames past a segment's length freeze the recursion (backpointer
    sentinel -1 = stay)."""

    def one(pred, pred_score, em, init, fin, valid):
        def step(alpha, inp):
            em_t, v = inp
            cand = alpha[pred] + pred_score          # (N, K)
            best = jnp.min(cand, axis=1)
            back = jnp.argmin(cand, axis=1).astype(jnp.int32)
            alpha = jnp.where(v, best + em_t, alpha)
            back = jnp.where(v, back, -1)
            return alpha, back

        alpha0 = init + em[0]
        alpha_last, backs = jax.lax.scan(step, alpha0,
                                         (em[1:], valid[1:]))
        total = jnp.min(alpha_last + fin)
        last = jnp.argmin(alpha_last + fin).astype(jnp.int32)

        def back_step(state, back_t):
            k = back_t[state]
            prev = jnp.where(k < 0, state,
                             pred[state, jnp.maximum(k, 0)])
            return prev, state

        first, rest = jax.lax.scan(back_step, last, backs, reverse=True)
        return jnp.concatenate([first[None], rest]), total

    return jax.vmap(one)(pred, pred_score, em, init_score, final_score,
                         valid)


def pack_graph_batch(graphs):
    """Pad a list of StateGraphs to common (N, K) stacked device arrays.
    Padding states are unreachable (BIG scores everywhere)."""
    packs = [PackedGraph.from_graph(g) for g in graphs]
    N = max(p.n_states for p in packs)
    K = max(p.pred.shape[1] for p in packs)
    B = len(packs)
    pred = np.zeros((B, N, K), np.int32)
    score = np.full((B, N, K), BIG, np.float32)
    emis = np.zeros((B, N), np.int32)
    labels = np.full((B, N), -1, np.int32)
    init = np.full((B, N), BIG, np.float32)
    fin = np.full((B, N), BIG, np.float32)
    for b, p in enumerate(packs):
        n, k = p.pred.shape
        pred[b, :n, :k] = np.asarray(p.pred)
        score[b, :n, :k] = np.asarray(p.pred_score)
        emis[b, :n] = np.asarray(p.emissions)
        labels[b, :n] = np.asarray(p.labels)
        init[b, :n] = np.asarray(p.initial_score)
        fin[b, :n] = np.asarray(p.final_score)
    return (jnp.asarray(pred), jnp.asarray(score), jnp.asarray(emis),
            jnp.asarray(labels), jnp.asarray(init), jnp.asarray(fin))


def align_batch(graphs, scores, lengths):
    """Batched forced alignment: one device dispatch for MANY segments
    (training throughput; the per-segment Aligner loop round-trips to the
    device once per utterance).

    graphs: list of B StateGraphs; scores (B, T, E) padded emission
    scores; lengths (B,).  Returns [(state_path, label_path, total)]
    per segment, paths cut to their lengths.
    """
    pred, score, emis, labels, init, fin = pack_graph_batch(graphs)
    scores = jnp.asarray(scores)
    B, T, E = scores.shape
    em = jnp.take_along_axis(scores, emis[:, None, :].repeat(T, 1), axis=2)
    valid = jnp.arange(T)[None, :] < jnp.asarray(lengths)[:, None]
    paths, totals = _viterbi_batch(pred, score, emis, init, fin, em, valid)
    paths = np.asarray(paths)
    labels_np = np.asarray(labels)
    out = []
    for b in range(B):
        L = int(lengths[b])
        sp = paths[b, :L]
        out.append((sp, labels_np[b][sp], float(totals[b])))
    return out
