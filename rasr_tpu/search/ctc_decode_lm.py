"""Device-side CTC prefix beam search with neural-LM shallow fusion.

The reference fuses LMs into search on the host: every word/label end
asks `Lm::LanguageModel::score` (src/Lm/LanguageModel.hh:297), and the
recurrent LM batches those requests on a background thread
(src/Lm/RecurrentLanguageModel.hh:183-196).  The TPU-native fast path
goes further: the WHOLE fused search — acoustic prefix beam AND the
LSTM LM's recurrence — runs inside one `lax.scan` on device.  Each beam
entry carries its LM hidden state; extensions add
`lm_scale * log p_lm(label | prefix)`; after pruning, extended entries
advance their LSTM state by one token (a handful of (B*beam, H) matmuls
per frame, MXU work instead of host round-trips).

Exactness: recombination merges prefixes by content hash, and equal
prefixes have equal LM states, so keeping the first member is exact —
the same invariant the acoustic-only beam relies on
(search/ctc_decode.py).

LM = lm.neural.LstmLmModel parameters (embed -> OptimizedLSTMCell stack
-> output dense), consumed directly from the param tree; the label
vocabulary must be the CTC vocabulary (blank never scored, BOS primes
the state).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ctc_decode import (NEG_INF, _H1_OFFSET, _H1_PRIME, _H2_OFFSET,
                         _H2_PRIME, _masked_logsumexp)


def _lstm_cell_step(p: Dict[str, Any], c, h, x):
    """One flax OptimizedLSTMCell step (same gate math/naming:
    i/f/g/o from input kernels i* (no bias) + hidden kernels h* (bias))."""
    def gate(name, act):
        z = x @ p["i" + name]["kernel"] + h @ p["h" + name]["kernel"] \
            + p["h" + name]["bias"]
        return act(z)

    i = gate("i", jax.nn.sigmoid)
    f = gate("f", jax.nn.sigmoid)
    g = gate("g", jnp.tanh)
    o = gate("o", jax.nn.sigmoid)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return c_new, h_new


def _lm_advance(lm_params: Dict[str, Any], n_layers: int,
                cs, hs, tokens):
    """Advance the LSTM stack by one token for a flat batch.

    cs/hs: lists of (N, H); tokens (N,) int32.  Returns (cs', hs',
    log-softmax next-token row (N, V))."""
    x = lm_params["embed"]["embedding"][tokens]
    new_cs, new_hs = [], []
    for i in range(n_layers):
        c, h = _lstm_cell_step(lm_params[f"OptimizedLSTMCell_{i}"],
                               cs[i], hs[i], x)
        new_cs.append(c)
        new_hs.append(h)
        x = h
    logits = x @ lm_params["output"]["kernel"] + lm_params["output"]["bias"]
    return new_cs, new_hs, jax.nn.log_softmax(logits, axis=-1)


@partial(jax.jit, static_argnames=("beam", "topk", "blank", "n_layers",
                                   "lm_scale"))
def ctc_prefix_beam_lm(log_probs: jnp.ndarray, lengths: jnp.ndarray,
                       lm_params: Dict[str, Any], bos_id: int,
                       n_layers: int = 1, lm_scale: float = 0.3,
                       beam: int = 8, topk: int = 16, blank: int = 0,
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LM-fused batched CTC prefix beam search, fully on device.

    log_probs (B, T, V) acoustic log-probs; lengths (B,); lm_params the
    LstmLmModel param tree (vocab == V, blank never predicted by the LM
    path because blank never extends a prefix).  Returns (labels
    (B, beam, T) -1-padded, lengths (B, beam), scores (B, beam) =
    -(log p_ac + lm_scale * log p_lm)), best first.
    """
    B, T, V = log_probs.shape
    topk = min(topk, V - 1)
    K = beam + beam * topk
    H = lm_params["OptimizedLSTMCell_0"]["hf"]["kernel"].shape[0]

    def flat(x):  # (B, beam, ...) -> (B*beam, ...)
        return x.reshape((B * beam,) + x.shape[2:])

    def unflat(x):
        return x.reshape((B, beam) + x.shape[1:])

    # prime every beam slot's LM with BOS (identical states; only slot 0
    # is live initially, the rest join via recombination/selection)
    cs0 = [jnp.zeros((B * beam, H), jnp.float32) for _ in range(n_layers)]
    hs0 = [jnp.zeros((B * beam, H), jnp.float32) for _ in range(n_layers)]
    bos = jnp.full((B * beam,), bos_id, jnp.int32)
    cs0, hs0, row0 = _lm_advance(lm_params, n_layers, cs0, hs0, bos)

    def init_state():
        n = jnp.zeros((B, beam), jnp.int32)
        last = jnp.full((B, beam), -1, jnp.int32)
        pb = jnp.full((B, beam), NEG_INF, jnp.float32).at[:, 0].set(0.0)
        pnb = jnp.full((B, beam), NEG_INF, jnp.float32)
        h1 = jnp.zeros((B, beam), jnp.uint32).at[:, 0].set(_H1_OFFSET)
        h2 = jnp.zeros((B, beam), jnp.uint32).at[:, 0].set(_H2_OFFSET)
        return (n, last, pb, pnb, h1, h2,
                tuple(unflat(c) for c in cs0),
                tuple(unflat(h) for h in hs0), unflat(row0))

    hp = jax.lax.Precision.HIGHEST

    def step(state, inputs):
        (n, last, pb, pnb, h1, h2, lm_c, lm_h, lm_row) = state
        lp_t, lp_blank_t, cand_lp, cand_v, t_valid = inputs
        total = jnp.logaddexp(pb, pnb)

        # stays: same prefix, no LM contribution
        lp_blank = lp_blank_t[:, None]
        stay_pb = total + lp_blank
        onehot_last = jax.nn.one_hot(jnp.maximum(last, 0), V,
                                     dtype=lp_t.dtype)
        lp_last = jnp.einsum("bkv,bv->bk", onehot_last, lp_t, precision=hp)
        stay_pnb = jnp.where(last >= 0, pnb + lp_last, NEG_INF)

        # extends: acoustic + lm_scale * log p_lm(v | prefix)
        v_eq_last = cand_v[:, None, :] == last[:, :, None]
        base = jnp.where(v_eq_last, pb[:, :, None], total[:, :, None])
        lm_add = jnp.take_along_axis(
            lm_row, jnp.broadcast_to(cand_v[:, None, :], (B, beam, topk)),
            axis=2)
        ext_pnb = base + cand_lp[:, None, :] + lm_scale * lm_add

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
        src_h1 = jnp.concatenate([h1, jnp.repeat(h1, topk, axis=1)], axis=1)
        src_h2 = jnp.concatenate([h2, jnp.repeat(h2, topk, axis=1)], axis=1)
        cand_h1 = jnp.where(is_extend, (src_h1 * _H1_PRIME) ^ lab_u, src_h1)
        cand_h2 = jnp.where(is_extend, (src_h2 * _H2_PRIME) ^ lab_u, src_h2)

        eq = ((cand_h1[:, :, None] == cand_h1[:, None, :]) &
              (cand_h2[:, :, None] == cand_h2[:, None, :]))
        m_pb = _masked_logsumexp(eq, cand_pb)
        m_pnb = _masked_logsumexp(eq, cand_pnb)
        m_total = jnp.logaddexp(m_pb, m_pnb)
        tril = jnp.tril(jnp.ones((K, K), jnp.float32), k=-1)
        before = jnp.einsum("bij,ij->bi", eq.astype(jnp.float32), tril,
                            precision=hp)
        m_total = jnp.where(before == 0, m_total, NEG_INF)

        top_score, sel = jax.lax.top_k(m_total, beam)
        oh = jax.nn.one_hot(sel, K, dtype=jnp.float32)

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

        def pick_u32(x):
            lo = pick_i((x & jnp.uint32(0xFFFF)).astype(jnp.int32))
            hi = pick_i((x >> jnp.uint32(16)).astype(jnp.int32))
            return (hi.astype(jnp.uint32) << jnp.uint32(16)) \
                | lo.astype(jnp.uint32)

        sel_h1 = pick_u32(cand_h1)
        sel_h2 = pick_u32(cand_h2)

        oh_src = jax.nn.one_hot(sel_src, beam, dtype=jnp.float32)
        new_n = jnp.einsum("bkc,bc->bk", oh_src, n.astype(jnp.float32),
                           precision=hp).astype(jnp.int32)
        new_last = jnp.einsum("bkc,bc->bk", oh_src,
                              last.astype(jnp.float32),
                              precision=hp).astype(jnp.int32)
        new_n = jnp.where(sel_ext, new_n + 1, new_n)
        new_last = jnp.where(sel_ext, sel_lab, new_last)

        # ---- LM recurrence: gather source state, advance extended ---------
        def gather_state(x):  # (B, beam, H) by src beam index
            return jnp.einsum("bkc,bch->bkh", oh_src, x, precision=hp)

        src_c = [gather_state(c) for c in lm_c]
        src_h = [gather_state(h) for h in lm_h]
        src_row = gather_state(lm_row)
        adv_c, adv_h, adv_row = _lm_advance(
            lm_params, n_layers,
            [flat(c) for c in src_c], [flat(h) for h in src_h],
            flat(jnp.maximum(sel_lab, 0)))
        ext3 = sel_ext[:, :, None]
        new_c = tuple(jnp.where(ext3, unflat(ac), sc)
                      for ac, sc in zip(adv_c, src_c))
        new_h = tuple(jnp.where(ext3, unflat(ah), sh)
                      for ah, sh in zip(adv_h, src_h))
        new_row = jnp.where(ext3, unflat(adv_row), src_row)

        frozen = ~t_valid[:, None]
        identity = jnp.tile(jnp.arange(beam)[None, :], (B, 1))
        bp_src = jnp.where(frozen, identity, sel_src)
        bp_lab = jnp.where(frozen | ~sel_ext, -1, sel_lab)
        f3 = frozen[:, :, None]
        out = (jnp.where(frozen, n, new_n),
               jnp.where(frozen, last, new_last),
               jnp.where(frozen, pb, sel_pb),
               jnp.where(frozen, pnb, sel_pnb),
               jnp.where(frozen, h1, sel_h1),
               jnp.where(frozen, h2, sel_h2),
               tuple(jnp.where(f3, o, nw) for o, nw in zip(lm_c, new_c)),
               tuple(jnp.where(f3, o, nw) for o, nw in zip(lm_h, new_h)),
               jnp.where(f3, lm_row, new_row))
        return out, (bp_src.astype(jnp.int32), bp_lab.astype(jnp.int32))

    t_valid = (jnp.arange(T)[None, :] < lengths[:, None]).T
    lp_nonblank = log_probs.at[:, :, blank].set(NEG_INF)
    cand_lp_all, cand_v_all = jax.lax.top_k(lp_nonblank, topk)
    state, (bp_src, bp_lab) = jax.lax.scan(
        step, init_state(),
        (jnp.moveaxis(log_probs, 0, 1),
         jnp.moveaxis(log_probs[:, :, blank], 0, 1),
         jnp.moveaxis(cand_lp_all, 0, 1),
         jnp.moveaxis(cand_v_all, 0, 1),
         t_valid))
    n, last, pb, pnb = state[0], state[1], state[2], state[3]
    total = jnp.logaddexp(pb, pnb)
    order = jnp.argsort(-total, axis=1)
    n = jnp.take_along_axis(n, order, axis=1)
    total = jnp.take_along_axis(total, order, axis=1)

    def back_step(k_cur, xs):
        src_t, lab_t = xs
        lab = jnp.take_along_axis(lab_t, k_cur, axis=1)
        k_prev = jnp.take_along_axis(src_t, k_cur, axis=1)
        return k_prev, lab

    _, labs_rev = jax.lax.scan(back_step, order, (bp_src, bp_lab),
                               reverse=True)
    labs = jnp.moveaxis(labs_rev, 0, 2)
    emit = labs >= 0
    pos = jnp.argsort(~emit, axis=2, stable=True)
    labels = jnp.where(jnp.take_along_axis(emit, pos, axis=2),
                       jnp.take_along_axis(labs, pos, axis=2), -1)
    return labels, n, -total
