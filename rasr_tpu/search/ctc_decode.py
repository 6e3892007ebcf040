"""Device-side CTC decoding: greedy and prefix beam search.

The reference's lexiconfree time-synchronous beam search
(src/Search/LexiconfreeTimesyncBeamSearch, doc/search_v2.rst:183-330)
extends hypotheses label-by-label on the host with scoring callbacks.  The
TPU-native fast path keeps the ENTIRE search on device: one `lax.scan` over
time carrying a fixed-width beam of prefixes, with top-k pruning per step —
no host round-trips, batched over utterances.

Semantics (matching the reference blank/loop handling,
src/Nn/LabelScorer/TransitionTypes.hh):
  * blank extends a prefix without emitting (BLANK_LOOP / LABEL_TO_BLANK),
  * repeating the last nonblank label without an intervening blank is a
    LABEL_LOOP (collapsed, stays on the same prefix),
  * a label after blank — or a different label — emits (LABEL_TO_LABEL).

Internally log-probabilities (higher = better); returned scores are
negative log-probs per framework convention.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
# pair of independent uint32 rolling hashes (x64 is disabled in JAX by
# default, so a single 64-bit hash is unavailable); collision probability
# per candidate pair ~2^-64
_H1_OFFSET = np.uint32(2166136261)
_H1_PRIME = np.uint32(16777619)
_H2_OFFSET = np.uint32(0x9E3779B9)
_H2_PRIME = np.uint32(0x85EBCA6B)


@jax.jit
def ctc_greedy(log_probs: jnp.ndarray, lengths: jnp.ndarray,
               blank: int = 0) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched greedy decode: (B, T, V) log-probs -> (B, T) label sequences
    with blanks/repeats collapsed (-1 padded), plus per-sequence lengths."""
    best = jnp.argmax(log_probs, axis=-1)                     # (B, T)
    T = best.shape[1]
    valid = jnp.arange(T)[None, :] < lengths[:, None]
    prev = jnp.concatenate([jnp.full_like(best[:, :1], -1), best[:, :-1]],
                           axis=1)
    emit = (best != blank) & (best != prev) & valid
    # stable-compact emitted labels to the front
    order = jnp.argsort(~emit, axis=1, stable=True)
    gathered = jnp.take_along_axis(best, order, axis=1)
    emitted = jnp.take_along_axis(emit, order, axis=1)
    labels = jnp.where(emitted, gathered, -1).astype(jnp.int32)
    return labels, jnp.sum(emit, axis=1).astype(jnp.int32)


def _masked_logsumexp(eq: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """Per-candidate logsumexp over its hash-equality class.

    eq (B, K, K) bool pairwise-equality matrix, scores (B, K).  Uses a
    per-row global max shift: classes more than ~80 nats below the row
    max underflow to NEG_INF, which cannot affect top-`beam` selection.
    Dense elementwise + reduction (no sorts/scatters) — the fast path on
    TPU for the small K = beam*(topk+1) pools used here.
    """
    c = jnp.max(scores, axis=1, keepdims=True)                  # (B, 1)
    e = jnp.exp(scores - c)                                     # (B, K)
    # batched matvec on the MXU (f32 accumulation; eq is exactly 0/1)
    s = jnp.einsum("bij,bj->bi", eq.astype(jnp.float32), e,
                   precision=jax.lax.Precision.HIGHEST)
    return jnp.where(s > 0, jnp.log(s) + c, NEG_INF)


@partial(jax.jit, static_argnames=("beam", "topk", "blank"))
def ctc_prefix_beam(log_probs: jnp.ndarray, lengths: jnp.ndarray,
                    beam: int = 8, topk: int = 16, blank: int = 0,
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched CTC prefix beam search, fully on device.

    log_probs: (B, T, V); lengths: (B,).  Keeps `beam` prefixes per
    utterance; per frame each prefix considers staying (blank/label-loop)
    plus extension by the frame's top-`topk` labels.  Duplicate prefixes
    recombine exactly (pb/pnb merged separately) via rolling content hashes.

    Returns (labels (B, beam, T) int32 -1-padded, lengths (B, beam),
    scores (B, beam) = -log p(prefix)), best first.
    """
    B, T, V = log_probs.shape
    topk = min(topk, V - 1)  # at most all nonblank labels
    K = beam + beam * topk   # candidate pool: stays + extends

    def init_state():
        n = jnp.zeros((B, beam), jnp.int32)
        last = jnp.full((B, beam), -1, jnp.int32)
        pb = jnp.full((B, beam), NEG_INF, jnp.float32).at[:, 0].set(0.0)
        pnb = jnp.full((B, beam), NEG_INF, jnp.float32)
        h1 = jnp.zeros((B, beam), jnp.uint32).at[:, 0].set(_H1_OFFSET)
        h2 = jnp.zeros((B, beam), jnp.uint32).at[:, 0].set(_H2_OFFSET)
        return n, last, pb, pnb, h1, h2

    def step(state, inputs):
        # O(beam) state only — prefixes are reconstructed from per-step
        # backpointers after the scan (a (B, beam, T) label carry would
        # move ~beam*T*4 bytes of HBM per frame and dominates runtime).
        # The per-frame top-k is PREcomputed over (B, T, V) outside the
        # scan (a top_k inside the sequential loop serializes badly).
        n, last, pb, pnb, h1, h2 = state
        lp_t, lp_blank_t, cand_lp, cand_v, t_valid = inputs
        total = jnp.logaddexp(pb, pnb)                 # (B, beam)

        # ---- stay candidates (one per beam): same prefix ------------------
        lp_blank = lp_blank_t[:, None]
        stay_pb = total + lp_blank                                  # blank
        onehot_last = jax.nn.one_hot(jnp.maximum(last, 0), lp_t.shape[1],
                                     dtype=lp_t.dtype)      # (B, beam, V)
        lp_last = jnp.einsum("bkv,bv->bk", onehot_last, lp_t,
                             precision=jax.lax.Precision.HIGHEST)
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)     # label loop

        # ---- extend candidates (beam x topk): prefix + v -------------------
        v_eq_last = cand_v[:, None, :] == last[:, :, None]          # (B,bm,tk)
        base = jnp.where(v_eq_last, pb[:, :, None], total[:, :, None])
        ext_pnb = base + cand_lp[:, None, :]                        # (B,bm,tk)

        # ---- candidate pool ------------------------------------------------
        cand_pb = jnp.concatenate(
            [stay_pb, jnp.full((B, beam * topk), NEG_INF)], axis=1)
        cand_pnb = jnp.concatenate(
            [stay_pnb, ext_pnb.reshape(B, -1)], axis=1)
        is_extend = jnp.concatenate(
            [jnp.zeros((B, beam), bool), jnp.ones((B, beam * topk), bool)],
            axis=1)
        src_beam = jnp.concatenate(
            [jnp.tile(jnp.arange(beam)[None, :], (B, 1)),
             jnp.tile(jnp.repeat(jnp.arange(beam), topk)[None, :], (B, 1))],
            axis=1)
        ext_label = cand_v[:, None, :].repeat(beam, 1).reshape(B, -1)
        new_label = jnp.concatenate(
            [jnp.full((B, beam), -1, jnp.int32), ext_label], axis=1)

        lab_u = new_label.astype(jnp.uint32) + jnp.uint32(1)
        # src_beam is a STATIC pattern (stays then beam*topk repeats):
        # build source hashes by repetition, no dynamic gather
        src_h1 = jnp.concatenate([h1, jnp.repeat(h1, topk, axis=1)], axis=1)
        src_h2 = jnp.concatenate([h2, jnp.repeat(h2, topk, axis=1)], axis=1)
        cand_h1 = jnp.where(is_extend, (src_h1 * _H1_PRIME) ^ lab_u, src_h1)
        cand_h2 = jnp.where(is_extend, (src_h2 * _H2_PRIME) ^ lab_u, src_h2)
        # NOTE: merging a dead (NEG_INF) candidate into a live run is
        # harmless (adds exp(NEG_INF) = 0), so no dead-marking needed.

        # ---- exact recombination: dense pairwise hash-equality merge ------
        # K = beam*(topk+1) is small, so an O(K^2) mask-merge is pure
        # VPU work and beats argsorts + vmapped segment scatters on TPU
        eq = ((cand_h1[:, :, None] == cand_h1[:, None, :]) &
              (cand_h2[:, :, None] == cand_h2[:, None, :]))         # (B,K,K)
        m_pb = _masked_logsumexp(eq, cand_pb)
        m_pnb = _masked_logsumexp(eq, cand_pnb)
        m_total = jnp.logaddexp(m_pb, m_pnb)
        # only the first member of each equality class survives:
        # no earlier j equals i  <=>  sum_j<i eq[i,j] == 0
        tril = jnp.tril(jnp.ones((K, K), jnp.float32), k=-1)
        before = jnp.einsum("bij,ij->bi", eq.astype(jnp.float32), tril,
                            precision=jax.lax.Precision.HIGHEST)
        m_total = jnp.where(before == 0, m_total, NEG_INF)

        # ---- prune to beam ---------------------------------------------------
        top_score, sel = jax.lax.top_k(m_total, beam)               # (B, beam)
        # selection via one-hot matmul (dynamic gathers serialize on TPU)
        oh = jax.nn.one_hot(sel, K, dtype=jnp.float32)              # (B,bm,K)
        hp = jax.lax.Precision.HIGHEST

        def pick_f(x):
            return jnp.einsum("bkc,bc->bk", oh, x, precision=hp)

        def pick_i(x):
            return jnp.einsum("bkc,bc->bk", oh, x.astype(jnp.float32),
                              precision=hp).astype(jnp.int32)

        sel_pb = pick_f(m_pb)
        sel_pnb = pick_f(m_pnb)
        sel_src = pick_i(src_beam)
        sel_ext = pick_i(is_extend.astype(jnp.int32)).astype(bool)
        sel_lab = pick_i(new_label)
        # uint32 hashes exceed f32 precision: split into two 16-bit halves
        def pick_u32(x):
            lo = pick_i((x & jnp.uint32(0xFFFF)).astype(jnp.int32))
            hi = pick_i((x >> jnp.uint32(16)).astype(jnp.int32))
            return (hi.astype(jnp.uint32) << jnp.uint32(16)) \
                | lo.astype(jnp.uint32)
        sel_h1 = pick_u32(cand_h1)
        sel_h2 = pick_u32(cand_h2)

        # ---- rebuild state ----------------------------------------------------
        oh_src = jax.nn.one_hot(sel_src, beam, dtype=jnp.float32)
        new_n = jnp.einsum("bkc,bc->bk", oh_src, n.astype(jnp.float32),
                           precision=hp).astype(jnp.int32)
        new_last = jnp.einsum("bkc,bc->bk", oh_src,
                              last.astype(jnp.float32),
                              precision=hp).astype(jnp.int32)
        new_n = jnp.where(sel_ext, new_n + 1, new_n)
        new_last = jnp.where(sel_ext, sel_lab, new_last)

        # ---- freeze past end of sequence --------------------------------------
        frozen = ~t_valid[:, None]
        identity = jnp.tile(jnp.arange(beam)[None, :], (B, 1))
        bp_src = jnp.where(frozen, identity, sel_src)
        bp_lab = jnp.where(frozen | ~sel_ext, -1, sel_lab)
        out = (jnp.where(frozen, n, new_n),
               jnp.where(frozen, last, new_last),
               jnp.where(frozen, pb, sel_pb),
               jnp.where(frozen, pnb, sel_pnb),
               jnp.where(frozen, h1, sel_h1),
               jnp.where(frozen, h2, sel_h2))
        return out, (bp_src.astype(jnp.int32), bp_lab.astype(jnp.int32))

    t_valid = (jnp.arange(T)[None, :] < lengths[:, None]).T        # (T, B)
    # hoist the per-frame top-k out of the sequential scan: one batched
    # top_k over (B, T, V), blank masked (blank never extends)
    lp_nonblank = log_probs.at[:, :, blank].set(NEG_INF)
    cand_lp_all, cand_v_all = jax.lax.top_k(lp_nonblank, topk)  # (B,T,topk)
    state, (bp_src, bp_lab) = jax.lax.scan(
        step, init_state(),
        (jnp.moveaxis(log_probs, 0, 1),
         jnp.moveaxis(log_probs[:, :, blank], 0, 1),
         jnp.moveaxis(cand_lp_all, 0, 1),
         jnp.moveaxis(cand_v_all, 0, 1),
         t_valid))
    n, last, pb, pnb, h1, h2 = state
    total = jnp.logaddexp(pb, pnb)
    order = jnp.argsort(-total, axis=1)
    n = jnp.take_along_axis(n, order, axis=1)
    total = jnp.take_along_axis(total, order, axis=1)

    # ---- backpointer traceback: reconstruct prefixes in reverse ------------
    def back_step(k_cur, xs):
        src_t, lab_t = xs                                # (B, beam) each
        lab = jnp.take_along_axis(lab_t, k_cur, axis=1)
        k_prev = jnp.take_along_axis(src_t, k_cur, axis=1)
        return k_prev, lab

    _, labs_rev = jax.lax.scan(back_step, order, (bp_src, bp_lab),
                               reverse=True)
    labs = labs_rev                                       # (T, B, beam)
    labs = jnp.moveaxis(labs, 0, 2)                       # (B, beam, T)
    # compact emitted labels (>=0) to the front, preserving order
    emit = labs >= 0
    pos = jnp.argsort(~emit, axis=2, stable=True)
    labels = jnp.where(jnp.take_along_axis(emit, pos, axis=2),
                       jnp.take_along_axis(labs, pos, axis=2), -1)
    return labels, n, -total
