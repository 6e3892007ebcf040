"""Device-side transducer (RNN-T) beam search.

The host TransducerBeamSearch (transducer_beam.py) makes one device call
per (frame, expansion round); over the remote-compile tunnel that is
hundreds of round trips per utterance.  This fast path keeps the ENTIRE
frame-synchronous beam on device — one `lax.scan` over encoder frames,
batched over utterances, with the prediction-network LSTM state carried
per hypothesis inside the scan (the stateful-scorer pattern the reference
realizes with per-hypothesis ONNX hidden states,
/root/reference/src/Nn/LabelScorer/StatefulOnnxLabelScorer.hh:92; the
monotonic frame-sync expansion mirrors its time-sync searches,
/root/reference/doc/search_v2.rst:183-330).

Beam semantics mirror the host search's two pools so neither evicts the
other (host: `next_beam` dict + `frontier` dict per frame):
  * a LIVE pool of `beam` hypotheses still expanding within the frame
    (per round: top-`topk` emit candidates per hypothesis, exact log-sum
    recombination of identical sequences via dual rolling content hashes
    — same scheme as search/ctc_decode.py — then pruned back to `beam`);
  * a FINISHER buffer collecting every blank candidate of the frame
    (`beam` per round, `beam*(max_symbols+1)` total) that is merged by
    log-sum and pruned to `beam` ONCE at frame end — exactly the host's
    next_beam dict, which never evicts finishers mid-frame.
After `max_symbols` rounds the remaining live hypotheses are forced to
take blank; the pruned finisher pool becomes the next frame's live pool.

Recombination here is exact log-sum on BOTH pools (the host search keeps
only the max-probability copy of duplicate emit candidates), so device
scores are >= host scores for the same sequence.

The encoder side of the joint network is projected ONCE for all frames
outside the scan; each round costs one pred-side projection + vocab
logits for (B, beam) hypotheses — pure MXU work.

Scores are log-probabilities inside the scan; returned scores are
negative log-probs per framework convention (best first).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
_H1_OFFSET = np.uint32(2166136261)
_H1_PRIME = np.uint32(16777619)
_H2_OFFSET = np.uint32(0x9E3779B9)
_H2_PRIME = np.uint32(0x85EBCA6B)
_HP = jax.lax.Precision.HIGHEST


def _masked_logsumexp(eq: jnp.ndarray, scores: jnp.ndarray) -> jnp.ndarray:
    """Per-candidate logsumexp over its equality class.

    Shifts by the PER-CLASS max (not the row max): a class far below the
    row's best would otherwise underflow exp() and collapse to NEG_INF,
    killing a live hypothesis instead of keeping its true score — the
    "exact log-sum recombination" contract requires full dynamic range.
    """
    cls_max = jnp.max(jnp.where(eq, scores[:, None, :], NEG_INF), axis=2)
    e = jnp.where(eq, jnp.exp(scores[:, None, :] - cls_max[:, :, None]), 0.0)
    s = jnp.sum(e, axis=2)
    return jnp.where(cls_max > NEG_INF / 2, jnp.log(s) + cls_max, NEG_INF)


def _merge_topk(score, h1, h2, k):
    """Merge equal-hash candidates by log-sum, then keep the best k.

    score/h1/h2: (B, C).  Returns (score (B,k), sel (B,k) candidate
    indices, one-hot (B,k,C)) — merged classes survive at their first
    member only.
    """
    C = score.shape[1]
    eq = ((h1[:, :, None] == h1[:, None, :])
          & (h2[:, :, None] == h2[:, None, :]))
    m = _masked_logsumexp(eq, score)
    tril = jnp.tril(jnp.ones((C, C), jnp.float32), k=-1)
    before = jnp.einsum("bij,ij->bi", eq.astype(jnp.float32), tril,
                        precision=_HP)
    m = jnp.where(before == 0, m, NEG_INF)
    top, sel = jax.lax.top_k(m, k)
    return top, sel, jax.nn.one_hot(sel, C, dtype=jnp.float32)


def _pick_i(oh, x):
    return jnp.einsum("bkc,bc->bk", oh, x.astype(jnp.float32),
                      precision=_HP).astype(jnp.int32)


def _pick_u32(oh, x):
    lo = _pick_i(oh, (x & jnp.uint32(0xFFFF)).astype(jnp.int32))
    hi = _pick_i(oh, (x >> jnp.uint32(16)).astype(jnp.int32))
    return ((hi.astype(jnp.uint32) << jnp.uint32(16))
            | lo.astype(jnp.uint32))


def make_transducer_beam(model, *, beam: int = 8, blank: int = 0,
                         max_symbols: int = 3, topk: int = 4,
                         max_labels: int = 128):
    """Build a jitted device beam `fn(params, enc, enc_lens)`.

    enc (B, T, E) encoder states, enc_lens (B,) valid frames.  Returns
    (labels (B, beam, max_labels) int32 0-padded, n_lab (B, beam),
    scores (B, beam) = -log p), best first.
    """
    K = beam
    topk_ = min(topk, model.vocab_size - 1)

    def pred_step(params, carry, tok):
        """carry leaves (B, K, H), tok (B, K) -> advanced (carry, out)."""
        B = tok.shape[0]
        flat = jax.tree_util.tree_map(
            lambda x: x.reshape((B * K,) + x.shape[2:]), carry)
        new, out = model.apply({"params": params}, flat,
                               tok.reshape(B * K),
                               method=model.predict_step)
        new = jax.tree_util.tree_map(
            lambda x: x.reshape((B, K) + x.shape[1:]), new)
        return new, out.reshape((B, K) + out.shape[1:])

    def gather_bk(oh, tree):
        """One-hot gather (B, k, C) applied to leaves (B, C, ...)."""
        def g(x):
            xf = x.reshape(x.shape[:2] + (-1,)).astype(jnp.float32)
            y = jnp.einsum("bkc,bch->bkh", oh, xf, precision=_HP)
            return y.reshape((x.shape[0], oh.shape[1]) + x.shape[2:]
                             ).astype(x.dtype)
        return jax.tree_util.tree_map(g, tree)

    @partial(jax.jit, static_argnames=("B",))
    def init(params, B: int):
        """Fresh beam state: one live empty hypothesis per utterance,
        prediction network seeded with BOS."""
        carry0 = model.apply({"params": params}, B * K,
                             method=model.predict_init)
        carry0, out0 = model.apply(
            {"params": params}, carry0,
            jnp.full((B * K,), blank, jnp.int32),
            method=model.predict_step)
        carry0 = jax.tree_util.tree_map(
            lambda x: x.reshape((B, K) + x.shape[1:]), carry0)
        pred0 = out0.reshape(B, K, -1)

        labels0 = jnp.zeros((B, K, max_labels), jnp.int32)
        n0 = jnp.zeros((B, K), jnp.int32)
        score0 = jnp.full((B, K), NEG_INF, jnp.float32).at[:, 0].set(0.0)
        h1_0 = jnp.zeros((B, K), jnp.uint32).at[:, 0].set(_H1_OFFSET)
        h2_0 = jnp.zeros((B, K), jnp.uint32).at[:, 0].set(_H2_OFFSET)
        return ((labels0, n0, score0, h1_0, h2_0), carry0, pred0)

    @jax.jit
    def advance(params, state, enc: jnp.ndarray, n_valid: jnp.ndarray):
        """Consume a chunk of encoder frames: enc (B, C, E), n_valid (B,)
        valid frames at the FRONT of the chunk.  Returns the advanced
        beam state — chunked advancing is exactly equivalent to one full
        pass (the beam state is the scan carry), which is what makes
        lossless streaming RNN-T decoding possible."""
        B, C, _E = enc.shape
        # encoder-side joint projection for the whole chunk, once
        e_proj = model.apply({"params": params}, enc,
                             method=model.joint_enc_proj)       # (B, C, J)

        def frame(state, xs):
            # the carried set is the live pool entering this frame
            live, carry, pred = state
            e_t, valid = xs                        # (B, J), (B,)

            # blank-finisher buffer: like the host search's next_beam
            # dict, finishers accumulate ALL frame long (K per round,
            # K*(max_symbols+1) total) and are merged + pruned ONCE at
            # frame end — round-level pruning of finishers would lose
            # recombination mass the host keeps
            bufs = []

            for rnd in range(max_symbols + 1):
                l_lab, l_n, l_sc, l_h1, l_h2 = live
                logits = model.apply({"params": params}, e_t, pred,
                                     method=model.joint_from_enc_proj)
                lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)

                # ---- blank candidates -> finisher buffer ---------------
                bufs.append((l_sc + lp[..., blank], l_h1, l_h2,
                             l_lab, l_n, carry, pred))

                if rnd == max_symbols:
                    break

                # ---- emit candidates -> next live pool (K*topk) -------
                lp_nb = lp.at[..., blank].set(NEG_INF)
                top_lp, top_v = jax.lax.top_k(lp_nb, topk_)   # (B,K,topk)
                emit_sc = l_sc[..., None] + top_lp
                emit_sc = jnp.where(l_n[..., None] >= max_labels,
                                    NEG_INF, emit_sc).reshape(B, -1)
                tok = top_v.reshape(B, -1)
                lab_u = tok.astype(jnp.uint32) + jnp.uint32(1)
                src_h1 = jnp.repeat(l_h1, topk_, axis=1)
                src_h2 = jnp.repeat(l_h2, topk_, axis=1)
                e_h1 = (src_h1 * _H1_PRIME) ^ lab_u
                e_h2 = (src_h2 * _H2_PRIME) ^ lab_u
                new_l_sc, sel, oh_e = _merge_topk(emit_sc, e_h1, e_h2, K)
                alive = new_l_sc > NEG_INF / 2
                # parent live slot of each selected emit (static layout:
                # candidate c came from live slot c // topk)
                src = jnp.broadcast_to(
                    (jnp.arange(K * topk_) // topk_)[None, :],
                    (B, K * topk_)).astype(jnp.int32)
                sel_src = _pick_i(oh_e, src)
                sel_tok = _pick_i(oh_e, tok)
                oh_src = jax.nn.one_hot(sel_src, K, dtype=jnp.float32)
                new_n = _pick_i(oh_src, l_n)
                new_lab = gather_bk(oh_src, l_lab)
                pos = (jnp.arange(max_labels)[None, None, :]
                       == new_n[..., None])
                new_lab = jnp.where(pos & alive[..., None],
                                    sel_tok[..., None], new_lab)
                new_n = new_n + alive.astype(jnp.int32)
                live = (new_lab, new_n, new_l_sc,
                        _pick_u32(oh_e, e_h1), _pick_u32(oh_e, e_h2))
                # advance prediction state for the emitted tokens
                g_carry = gather_bk(oh_src, carry)
                adv_carry, adv_out = pred_step(
                    params, g_carry, jnp.maximum(sel_tok, 0))
                carry = jax.tree_util.tree_map(
                    lambda a, o: jnp.where(
                        alive.reshape((B, K) + (1,) * (a.ndim - 2)), a, o),
                    adv_carry, g_carry)
                pred = jnp.where(alive[..., None], adv_out,
                                 gather_bk(oh_src, pred).astype(
                                     adv_out.dtype))

            # ---- frame end: merge + prune the finisher buffer ----------
            # pool size P = K*(max_symbols+1); exact log-sum merge over
            # identical sequences, then the best K become the live pool
            # of the next frame
            cat = lambda xs: jnp.concatenate(xs, axis=1)
            pool_sc = cat([b[0] for b in bufs])
            pool_h1 = cat([b[1] for b in bufs])
            pool_h2 = cat([b[2] for b in bufs])
            new_sc, _sel, oh = _merge_topk(pool_sc, pool_h1, pool_h2, K)
            frozen = (gather_bk(oh, cat([b[3] for b in bufs])),
                      _pick_i(oh, cat([b[4] for b in bufs])),
                      new_sc,
                      _pick_u32(oh, pool_h1),
                      _pick_u32(oh, pool_h2))
            f_carry = gather_bk(oh, jax.tree_util.tree_map(
                lambda *xs: cat(xs), *[b[5] for b in bufs]))
            f_pred = gather_bk(oh, cat([b[6] for b in bufs]))

            # frame consumed: frozen pool becomes next frame's live pool
            new_state = (frozen, f_carry, f_pred)

            def keep(new, old):
                vv = valid.reshape((B,) + (1,) * (new.ndim - 1))
                return jnp.where(vv, new, old)

            state = jax.tree_util.tree_map(keep, new_state, state)
            return state, None

        xs = (e_proj.transpose(1, 0, 2),
              (jnp.arange(C)[:, None] < n_valid[None, :]))
        state, _ = jax.lax.scan(frame, state, xs)
        return state

    @jax.jit
    def finalize(state) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Current beam, best first — non-destructive (usable for
        streaming partials)."""
        labels, n, score = state[0][0], state[0][1], state[0][2]
        fin_score, order = jax.lax.top_k(score, K)
        oh = jax.nn.one_hot(order, K, dtype=jnp.float32)
        out_labels = gather_bk(oh, labels)
        out_n = _pick_i(oh, n)
        return out_labels, out_n, -fin_score

    @jax.jit
    def _search(params, enc: jnp.ndarray, enc_lens: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        state = init(params, enc.shape[0])
        state = advance(params, state, enc, enc_lens)
        return finalize(state)

    def search(params, enc, enc_lens):
        """Whole-utterance decode (init -> advance -> finalize), one
        device program.  `search.init/advance/finalize` expose the
        chunked streaming API."""
        return _search(params, enc, enc_lens)

    search.init = init
    search.advance = advance
    search.finalize = finalize
    return search
