"""Device-side AED (attention encoder-decoder) label-synchronous beam.

The host CachedAedDecoder (aed_cached.py) makes two device calls per
emitted token (decode step + cache reorder); over the remote-compile
tunnel that is ~2x max-labels round trips per utterance.  This fast path
runs the WHOLE label-sync beam in one device program — a
`lax.while_loop` over decoder steps (stopping as soon as every beam of
every utterance has emitted EOS), batched over utterances, with the
flax KV caches threaded through the loop carry and reordered on device
via one-hot gathers.

Search semantics match the host decoder (and the reference's label-sync
beam, /root/reference/src/Search/LexiconfreeLabelsyncBeamSearch): per
step each live hypothesis proposes its top-`beam` tokens (EOS finishes a
hypothesis), finished hypotheses carry forward as single candidates, and
candidates are ranked by length-normalized score
(score / max(len, 1)^length_norm).  No recombination — label-sync
prefixes are unique per hypothesis by construction.

Scores accumulate as negative log-probs (framework convention), returned
best-first by normalized score.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
_HP = jax.lax.Precision.HIGHEST


def make_aed_beam(model, *, beam: int = 4, eos: int = 0,
                  max_labels: int = 200, length_norm: float = 1.0,
                  lm_model=None, lm_scale: float = 0.0):
    """Build a jitted device label-sync beam `fn(params, enc, enc_mask)`
    — or `fn(params, enc, enc_mask, lm_params)` when an LstmLmModel is
    fused.

    enc (B, T, E) encoder states, enc_mask (B, T) bool valid frames.
    Returns (labels (B, beam, max_labels) int32 0-padded, n_lab (B, beam),
    scores (B, beam) = summed fused -log p incl. EOS), best first by
    length-normalized score.

    Shallow fusion: per step the unit LM's per-hypothesis LSTM state is
    threaded through the while_loop (reorders with the same one-hot
    gathers as the KV caches) and non-EOS log-probs get
    + lm_scale * log p_lm (the EOS column stays pure acoustic — the
    unit LM never models sequence end)."""
    K = beam
    fuse = lm_model is not None and lm_scale != 0.0
    if fuse:
        from ..lm.neural import lstm_step_fns
        lm_init, lm_step = lstm_step_fns(lm_model)

    def pick_i(oh, x):
        return jnp.einsum("bkc,bc->bk", oh, x.astype(jnp.float32),
                          precision=_HP).astype(jnp.int32)

    def pick_f(oh, x):
        return jnp.einsum("bkc,bc->bk", oh, x, precision=_HP)

    def gather_beam(oh, tree, B):
        """oh (B, K, K) applied to cache leaves (B*K, ...)."""
        def g(x):
            if x.ndim == 0:          # flax cache_index scalars
                return x
            xf = x.reshape((B, K, -1)).astype(jnp.float32)
            y = jnp.einsum("bkc,bch->bkh", oh, xf, precision=_HP)
            return y.reshape(x.shape).astype(x.dtype)
        return jax.tree_util.tree_map(g, tree)

    def search_impl(params, enc: jnp.ndarray, enc_mask: jnp.ndarray,
                    lm_params=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        B, T, _E = enc.shape
        enc_b = jnp.repeat(enc, K, axis=0)               # (B*K, T, E)
        mask_b = jnp.repeat(enc_mask, K, axis=0)

        # prime the KV caches: flax sizes decode-mode buffers to the call
        # length, so run one init-mode pass over a max_labels block, then
        # zero everything (indices and contents)
        def prime(model, enc, enc_mask, tokens):
            y = model.embed(tokens).astype(model.dtype)
            cross = enc_mask[:, None, None, :]
            for block in model.blocks:
                y = block(y, enc, cross, None, deterministic=True,
                          decode=True)
            return y

        # eval_shape: the cache layout costs zero FLOPs to derive (the
        # host decoder pays a real max_labels-length forward for this)
        shapes = jax.eval_shape(
            lambda e, m, t: model.init(jax.random.PRNGKey(0), e, m, t,
                                       method=prime),
            enc_b, mask_b, jnp.zeros((B * K, max_labels), jnp.int32))
        cache0 = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes["cache"])

        labels0 = jnp.zeros((B, K, max_labels), jnp.int32)
        n0 = jnp.zeros((B, K), jnp.int32)
        score0 = jnp.full((B, K), -NEG_INF, jnp.float32).at[:, 0].set(0.0)
        fin0 = jnp.zeros((B, K), bool)
        tok0 = jnp.zeros((B, K), jnp.int32)              # BOS
        step0 = jnp.zeros((), jnp.int32)
        lm0 = lm_init(B * K) if fuse else ()

        def cond(state):
            _labels, _n, _score, fin, _tok, _cache, _lm, step = state
            return (step < max_labels) & jnp.any(~fin)

        def body(state):
            labels, n, score, fin, tok, cache, lm_carry, step = state
            lp, vars_out = model.apply(
                {"params": params, "cache": cache}, enc_b, mask_b,
                tok.reshape(B * K, 1),
                jnp.full((B * K,), step, jnp.int32),
                method=model.decode_step, mutable=["cache"])
            cache = vars_out["cache"]
            lp = jax.nn.log_softmax(lp.astype(jnp.float32), -1)
            lp = lp.reshape(B, K, -1)                    # (B, K, V)
            if fuse:
                lm_lp, lm_carry = lm_step(lm_params, lm_carry,
                                          tok.reshape(B * K))
                lm_lp = lm_lp.at[:, eos].set(0.0)
                lp = lp + lm_scale * lm_lp.reshape(B, K, -1)

            # ---- candidates: K stays (finished) + K*K extends ----------
            stay_sc = jnp.where(fin, score, -NEG_INF)
            top_lp, top_v = jax.lax.top_k(lp, K)         # (B, K, K)
            ext_sc = score[..., None] - top_lp           # -log p accumul.
            ext_sc = jnp.where(
                fin[..., None] | (n[..., None] >= max_labels),
                -NEG_INF, ext_sc)
            cand_sc = jnp.concatenate([stay_sc, ext_sc.reshape(B, -1)], 1)
            cand_tok = jnp.concatenate(
                [jnp.full((B, K), -1, jnp.int32), top_v.reshape(B, -1)], 1)
            cand_src = jnp.broadcast_to(jnp.concatenate(
                [jnp.arange(K), jnp.repeat(jnp.arange(K), K)])[None, :],
                (B, K + K * K)).astype(jnp.int32)
            src_n = jnp.concatenate([n, jnp.repeat(n, K, axis=1)], 1)
            emits = (cand_tok >= 0) & (cand_tok != eos)
            cand_n = src_n + emits.astype(jnp.int32)
            norm = cand_sc / jnp.maximum(cand_n, 1).astype(
                jnp.float32) ** length_norm
            # rank by -norm (lower normalized -log p = better); dead
            # candidates (score ~ +1e30) sink to NEG_INF
            norm = jnp.where(cand_sc > -NEG_INF / 2, NEG_INF, -norm)

            _best, sel = jax.lax.top_k(norm, K)          # by -norm: min
            oh = jax.nn.one_hot(sel, K + K * K, dtype=jnp.float32)
            new_score = pick_f(oh, cand_sc)
            new_tok = pick_i(oh, cand_tok)
            new_src = pick_i(oh, cand_src)
            new_n = pick_i(oh, cand_n)
            oh_src = jax.nn.one_hot(new_src, K, dtype=jnp.float32)
            new_fin = (new_tok == -1) | (new_tok == eos)
            new_labels = jnp.einsum("bkc,bcu->bku", oh_src,
                                    labels.astype(jnp.float32),
                                    precision=_HP).astype(jnp.int32)
            append = (~new_fin) & (new_score < -NEG_INF / 2)
            pos = (jnp.arange(max_labels)[None, None, :]
                   == pick_i(oh_src, n)[..., None])
            new_labels = jnp.where(pos & append[..., None],
                                   new_tok[..., None], new_labels)
            cache = gather_beam(oh_src, cache, B)
            if fuse:
                lm_carry = gather_beam(oh_src, lm_carry, B)
            feed = jnp.where(append, new_tok, 0)
            return (new_labels, new_n, new_score, new_fin, feed, cache,
                    lm_carry, step + 1)

        state = jax.lax.while_loop(
            cond, body,
            (labels0, n0, score0, fin0, tok0, cache0, lm0, step0))
        labels, n, score = state[0], state[1], state[2]

        norm = score / jnp.maximum(n, 1).astype(jnp.float32) ** length_norm
        _best, order = jax.lax.top_k(-norm, K)
        oh = jax.nn.one_hot(order, K, dtype=jnp.float32)
        out_labels = jnp.einsum("bkc,bcu->bku", oh,
                                labels.astype(jnp.float32),
                                precision=_HP).astype(jnp.int32)
        out_n = pick_i(oh, n)
        out_score = pick_f(oh, score)
        return out_labels, out_n, out_score

    if fuse:
        return jax.jit(search_impl)
    return jax.jit(lambda params, enc, enc_mask:
                   search_impl(params, enc, enc_mask))
