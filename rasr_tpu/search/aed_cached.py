"""KV-cached AED decoding.

The generic label-sync search re-scores full prefixes per step (O(L^2)
decoder work); this decoder keeps flax attention KV caches per hypothesis
and advances one token per device call — O(L) — managing cache gathers on
beam reordering itself (the stateful-scorer pattern the reference realizes
with per-hypothesis ONNX hidden states).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class CachedAedResult:
    labels: List[int]
    score: float


class CachedAedDecoder:
    """Greedy / beam decoding with per-step KV caches.

    model: AedModel; params: trained parameters; beams reorder the cache
    with a batched gather per step.
    """

    def __init__(self, model, params, beam_size: int = 4,
                 max_labels: int = 200, eos: int = 0,
                 length_norm_scale: float = 1.0, device_beam: bool = True,
                 lm_model=None, lm_params=None, lm_scale: float = 0.0):
        self.model = model
        # device-resident jit ARGUMENT, never a closure constant (the
        # remote-compile tunnel rejects flagship-size embedded literals)
        self.params = jax.device_put(params)
        self.beam_size = beam_size
        self.max_labels = max_labels
        self.eos = eos
        self.length_norm = length_norm_scale
        self.lm_scale = lm_scale
        self._device_search = None
        if device_beam:
            from .aed_device import make_aed_beam
            fn = make_aed_beam(
                model, beam=beam_size, eos=eos, max_labels=max_labels,
                length_norm=length_norm_scale,
                lm_model=lm_model, lm_scale=lm_scale)
            if lm_model is not None and lm_scale:
                lm_p = jax.device_put(lm_params)
                self._device_search = \
                    lambda p, e, m: fn(p, e, m, lm_p)
            else:
                self._device_search = fn
        elif lm_model is not None and lm_scale:
            raise ValueError(
                "shallow fusion (lm-scale/lm-checkpoint) requires the "
                "device beam; the host decode path does not fuse")

        _encode = jax.jit(
            lambda p, f, l: model.apply({"params": p}, f, l,
                                        method=model.encode))
        self._encode = lambda f, l: _encode(self.params, f, l)

        def step(p, cache, enc, enc_mask, tokens, position):
            logits, vars_out = model.apply(
                {"params": p, "cache": cache}, enc, enc_mask,
                tokens, position, method=model.decode_step,
                mutable=["cache"])
            return jax.nn.log_softmax(logits, -1), vars_out["cache"]

        _step = jax.jit(step)
        self._step = lambda *a: _step(self.params, *a)

        def reorder(cache, idx):
            return jax.tree_util.tree_map(
                lambda x: x[idx] if x.ndim >= 1 and x.shape[0] == idx.shape[0]
                else x, cache)

        self._reorder = jax.jit(reorder)

    def decode(self, features: np.ndarray, feat_len: int,
               feat_bucket: int = 128) -> List[CachedAedResult]:
        # pad the feature length to a bucket multiple: the encoder (the
        # expensive compile) builds once per bucket, not per utterance
        x = np.asarray(features)
        t = x.shape[0]
        t_pad = max(feat_bucket,
                    ((t + feat_bucket - 1) // feat_bucket) * feat_bucket)
        if t_pad != t:
            x = np.pad(x, ((0, t_pad - t), (0, 0)))
        enc, enc_mask = self._encode(jnp.asarray(x)[None],
                                     jnp.asarray([feat_len], jnp.int32))
        if self._device_search is not None:
            # fast path: whole label-sync beam in one device program
            # (search/aed_device.py)
            labels, n_lab, scores = self._device_search(self.params, enc,
                                                        enc_mask)
            labels, n_lab = np.asarray(labels), np.asarray(n_lab)
            scores = np.asarray(scores)
            return [CachedAedResult(
                        [int(u) for u in labels[0, k, :n_lab[0, k]]],
                        float(scores[0, k]))
                    for k in range(labels.shape[1])
                    if scores[0, k] < 1e29]
        B = self.beam_size
        enc_b = jnp.repeat(enc, B, axis=0)
        mask_b = jnp.repeat(enc_mask, B, axis=0)

        # prime the cache: flax sizes KV buffers to the call length, so
        # run one init-mode decode pass over a max_labels token block
        def prime(model, enc, enc_mask, tokens):
            y = model.embed(tokens).astype(model.dtype)
            cross = enc_mask[:, None, None, :]
            for block in model.blocks:
                y = block(y, enc, cross, None, deterministic=True,
                          decode=True)
            return y

        variables = self.model.init(
            jax.random.PRNGKey(0), enc_b, mask_b,
            jnp.zeros((B, self.max_labels), jnp.int32),
            method=prime)
        cache = variables["cache"]
        # reset cache indices to 0 (init consumed max_labels steps)
        cache = jax.tree_util.tree_map(
            lambda x: jnp.zeros_like(x) if x.ndim == 0 or x.dtype == jnp.int32
            else jnp.zeros_like(x), cache)

        scores = np.full((B,), np.inf, dtype=np.float64)
        scores[0] = 0.0
        labels = [[] for _ in range(B)]
        finished = [False] * B
        tokens = jnp.zeros((B, 1), jnp.int32)  # BOS
        position = jnp.zeros((B,), jnp.int32)

        for t in range(self.max_labels):
            lp, cache = self._step(cache, enc_b, mask_b, tokens, position)
            lp = np.asarray(lp)  # (B, V)
            # candidates
            cands = []
            for b in range(B):
                if finished[b]:
                    cands.append((scores[b], b, None))
                    continue
                if not np.isfinite(scores[b]):
                    continue
                row = scores[b] - lp[b]
                for v in np.argsort(row)[:self.beam_size]:
                    cands.append((float(row[int(v)]), b, int(v)))
            # rank by length-normalized score
            def norm(c):
                s, b, v = c
                n = len(labels[b]) + (0 if v in (None, self.eos) else 1)
                return s / max(n, 1) ** self.length_norm
            cands.sort(key=norm)
            cands = cands[:B]
            new_scores = np.full((B,), np.inf)
            new_labels: List[list] = [[] for _ in range(B)]
            new_finished = [True] * B
            src = np.zeros((B,), dtype=np.int32)
            next_tokens = np.zeros((B, 1), dtype=np.int32)
            any_active = False
            for slot, (s, b, v) in enumerate(cands):
                new_scores[slot] = s
                src[slot] = b
                if v is None or v == self.eos:
                    new_labels[slot] = list(labels[b])
                    new_finished[slot] = True
                else:
                    new_labels[slot] = labels[b] + [v]
                    new_finished[slot] = False
                    next_tokens[slot, 0] = v
                    any_active = True
            cache = self._reorder(cache, jnp.asarray(src))
            scores, labels, finished = new_scores, new_labels, new_finished
            tokens = jnp.asarray(next_tokens)
            position = position + 1
            if not any_active:
                break
        order = np.argsort([s / max(len(l), 1) ** self.length_norm
                            for s, l in zip(scores, labels)])
        return [CachedAedResult(labels[i], float(scores[i]))
                for i in order if np.isfinite(scores[i])]

    def recognize(self, features: np.ndarray, feat_len: int) -> List[int]:
        return self.decode(features, feat_len)[0].labels

    # -- segment api (SearchAlgorithmV2 facade protocol) ---------------------
    # so the decoder is config-constructible through api.SearchAlgorithm
    # like the reference's encoder-decoder scorers (built by Nn::Module
    # from config, /root/reference/src/Nn/Module.cc:132-218)

    def recognize_batch(self, features: np.ndarray, lengths: np.ndarray,
                        n_best: int = 1) -> List[List[CachedAedResult]]:
        """Corpus-batched label-sync decode: (B, T, D) features + (B,)
        lengths -> per-utterance result lists, best first.  One encoder
        program + one device beam program for the whole batch; the
        caller's time dimension passes through unchanged (re-padding
        would compile a different XLA program with different bf16
        rounding than a batched greedy baseline would see)."""
        if self._device_search is None:
            raise NotImplementedError("recognize_batch needs the device "
                                      "beam (device_beam=True)")
        x = np.asarray(features, np.float32)
        B = x.shape[0]
        enc, enc_mask = self._encode(jnp.asarray(x),
                                     jnp.asarray(lengths, jnp.int32))
        labels, n_lab, scores = self._device_search(self.params, enc,
                                                    enc_mask)
        labels, n_lab = np.asarray(labels), np.asarray(n_lab)
        scores = np.asarray(scores)
        return [[CachedAedResult(
                    [int(u) for u in labels[i, k, :n_lab[i, k]]],
                    float(scores[i, k]))
                 for k in range(min(n_best, labels.shape[1]))
                 if scores[i, k] < 1e29]
                for i in range(B)]

    def enter_segment(self) -> None:
        self._segment_result: List[int] = []
        self._segment_features: Optional[np.ndarray] = None
        self._segment_nbest: List[CachedAedResult] = []

    def put_features(self, features: np.ndarray) -> None:
        self._segment_features = np.asarray(features, np.float32)

    def put_feature(self, feature: np.ndarray) -> None:
        f = np.asarray(feature, np.float32)[None]
        if self._segment_features is None:
            self._segment_features = f
        else:
            self._segment_features = np.concatenate(
                [self._segment_features, f])

    def finish_segment(self) -> None:
        if self._segment_features is not None:
            feats = self._segment_features
            self._segment_nbest = self.decode(feats, feats.shape[0])
            self._segment_result = list(self._segment_nbest[0].labels)

    def decode_many_steps(self) -> int:
        return 0        # label-sync decode runs whole-segment at finish

    def get_current_best_labels(self) -> List[int]:
        return list(self._segment_result)

    def n_best(self, n: int):
        return list(getattr(self, "_segment_nbest", []))[:n]
