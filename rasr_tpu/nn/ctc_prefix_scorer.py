"""CTC prefix scoring: label-synchronous scores over a time-sync CTC model.

Reference: src/Nn/LabelScorer/CtcPrefixLabelScorer.hh:78 ('ctc-prefix' in
the scorer registry) — lets label-synchronous searches (and joint
CTC/attention decoding) use a CTC model's outputs.

For a prefix g with per-time forward probabilities split by whether the
last emission was blank (pb) or the final label of g (pnb), the extension
with label v computes (Watanabe-style recursion, all in log space):

    pnb_v(t) = lp[t, v] + logaddexp(pnb_v(t-1), psi(t-1))
    psi(t)   = pb_g(t) + pnb_g(t) unless v == last(g) (then only pb_g)
    pb_v(t)  = lp[t, blank] + logaddexp(pb_v(t-1), pnb_v(t-1))
    score(g+v) = logaddexp(pb_v(T-1), pnb_v(T-1))

One device call scores ALL cached prefixes x ALL labels: the t-recursion is
a lax.scan, vmapped over (prefixes, labels).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


@jax.jit
def _extend_all(log_probs: jnp.ndarray, pb: jnp.ndarray, pnb: jnp.ndarray,
                last: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """log_probs (T, V); pb/pnb (B, T) prefix forward vars; last (B,).
    Returns (new_pb (B,V,T), new_pnb (B,V,T), prefix_sum (B,V)) where
    prefix_sum = log p(g+v is a prefix of the output)."""
    T, V = log_probs.shape
    lp_blank = log_probs[:, 0]

    def one(pb_g, pnb_g, last_g, v):
        lp_v = log_probs[:, v]
        psi = jnp.where(v == last_g, pb_g,
                        jnp.logaddexp(pb_g, pnb_g))         # (T,)
        # shift: at t, incoming is psi(t-1) / own pnb(t-1)
        def step(carry, x):
            pb_prev, pnb_prev = carry
            lp_v_t, lp_b_t, psi_prev = x
            pnb_t = lp_v_t + jnp.logaddexp(pnb_prev, psi_prev)
            pb_t = lp_b_t + jnp.logaddexp(pb_prev, pnb_prev)
            return (pb_t, pnb_t), (pb_t, pnb_t)

        # psi(-1): the empty prefix is "already complete" before t=0
        psi_init = jnp.where(last_g < 0, 0.0, NEG_INF)
        psi_shifted = jnp.concatenate([psi_init[None], psi[:-1]])
        (_, _), (pb_out, pnb_out) = jax.lax.scan(
            step, (jnp.float32(NEG_INF), jnp.float32(NEG_INF)),
            (lp_v, lp_blank, psi_shifted))
        # prefix-sum score: v's first emission at any t, anything after
        prefix_sum = jax.nn.logsumexp(psi_shifted + lp_v)
        return pb_out, pnb_out, prefix_sum

    labels = jnp.arange(V)
    fn = jax.vmap(jax.vmap(one, in_axes=(None, None, None, 0)),
                  in_axes=(0, 0, 0, None))
    return fn(pb, pnb, last, labels)


class CtcPrefixScorer:
    """Per-segment scorer over a fixed (T, V) log-posterior matrix with a
    prefix cache; blank index 0."""

    def __init__(self, log_probs: np.ndarray, blank: int = 0):
        if blank != 0:
            # move blank to column 0 for the kernel
            order = [blank] + [v for v in range(log_probs.shape[1])
                               if v != blank]
            log_probs = log_probs[:, order]
            self._relabel = np.argsort(order)
        else:
            self._relabel = None
        self.log_probs = jnp.asarray(log_probs, jnp.float32)
        self.T, self.V = log_probs.shape
        # empty prefix: pb(t) = cumulative blank, pnb = -inf
        pb0 = np.cumsum(np.asarray(log_probs)[:, 0])
        self._cache: Dict[Tuple[int, ...], Tuple[np.ndarray, np.ndarray]] = {
            (): (pb0.astype(np.float32),
                 np.full(self.T, NEG_INF, np.float32))}

    def _canonical(self, prefix: Sequence[int]) -> Tuple[int, ...]:
        if self._relabel is None:
            return tuple(int(v) for v in prefix)
        return tuple(int(self._relabel[v]) for v in prefix)

    def score_extensions(self, prefixes: Sequence[Sequence[int]]
                         ) -> np.ndarray:
        """(B, V) scores = -log p(prefix + v ...) in the ORIGINAL label
        space; also fills the cache for every (prefix + v)."""
        canon = [self._canonical(p) for p in prefixes]
        missing = [p for p in canon if p not in self._cache]
        for p in missing:
            # build ancestors bottom-up (normally cached already)
            for i in range(len(p)):
                if p[:i + 1] not in self._cache:
                    self._extend_and_cache([p[:i]])
        pb = jnp.asarray(np.stack([self._cache[p][0] for p in canon]))
        pnb = jnp.asarray(np.stack([self._cache[p][1] for p in canon]))
        last = jnp.asarray([p[-1] if p else -1 for p in canon], jnp.int32)
        new_pb, new_pnb, prefix_sum = _extend_all(self.log_probs, pb, pnb, last)
        new_pb = np.asarray(new_pb)
        new_pnb = np.asarray(new_pnb)
        for i, p in enumerate(canon):
            for v in range(1, self.V):
                self._cache[p + (v,)] = (new_pb[i, v], new_pnb[i, v])
        total = np.array(prefix_sum)
        # blank column = score of the unextended prefix ending here
        pb_l, pnb_l = np.asarray(pb)[:, -1], np.asarray(pnb)[:, -1]
        total[:, 0] = np.logaddexp(pb_l, pnb_l)
        if self._relabel is not None:
            inv = np.argsort(self._relabel)
            total = total[:, inv]
        return -total

    def _extend_and_cache(self, prefixes):
        self.score_extensions([list(p) for p in prefixes])

    def prefix_score(self, prefix: Sequence[int]) -> float:
        """-log p(prefix is a complete output)."""
        p = self._canonical(prefix)
        if p not in self._cache:
            self._extend_and_cache([p[:-1]]) if p else None
        pb, pnb = self._cache[p]
        return float(-np.logaddexp(pb[-1], pnb[-1]))
