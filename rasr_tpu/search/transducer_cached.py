"""State-cached transducer decoding.

The generic TransducerBeamSearch re-runs the prediction network over the
full label prefix per expansion (O(U^2) recurrent work per utterance);
this decoder carries the LSTM state per hypothesis — one
prediction-network step per emitted label, the stateful-scorer pattern
the reference realizes with per-hypothesis ONNX hidden states
(src/Nn/LabelScorer/StatefulOnnxLabelScorer.hh:92).

Hypotheses' states live in a host cache keyed by label prefix; all
missing prefixes of a beam step are advanced in ONE batched device call.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .transducer_beam import TransducerBeamSearch, TransducerHypothesis

_DEAD_SCORE = 1e29     # device beam marks dead slots with -log p ~ 1e30


class CachedTransducerDecoder(TransducerBeamSearch):
    """Beam decoding with per-hypothesis prediction-network state.

    `max_labels` bounds the device beam's emitted-label buffer: the
    device search score-kills any emission past that many labels, so
    segments expected to exceed it need `search-algorithm.max-labels`
    raised (the host fallback, device_beam=False, has no cap)."""

    def __init__(self, model, params, blank: int = 0, beam_size: int = 8,
                 max_symbols_per_frame: int = 3, expansion_topk: int = 4,
                 device_beam: bool = True, max_labels: int = 128,
                 state_compression=None):
        self.model = model
        # device-resident jit ARGUMENT, never a closure constant (the
        # remote-compile tunnel rejects flagship-size embedded literals)
        self.params = jax.device_put(params)
        self._device_search = None
        if device_beam:
            from .transducer_device import make_transducer_beam
            self._device_search = make_transducer_beam(
                model, beam=beam_size, blank=blank,
                max_symbols=max_symbols_per_frame, topk=expansion_topk,
                max_labels=max_labels)

        _encode = jax.jit(
            lambda p, f, l: model.apply({"params": p}, f, l,
                                        method=model.encode))
        self._encode = lambda f, l: _encode(self.params, f, l)

        def pred_step(p, carry, tokens):
            return model.apply({"params": p}, carry, tokens,
                               method=model.predict_step)

        _pred_step = jax.jit(pred_step)
        self._pred_step = lambda carry, tokens: _pred_step(
            self.params, carry, tokens)

        def joint(p, enc_t, pred):
            logits = model.apply({"params": p}, enc_t, pred,
                                 method=model.joint_frame)
            return jax.nn.log_softmax(logits.astype(jnp.float32), -1)

        _joint = jax.jit(joint)

        def joint_fn(enc_t, pred):
            # STATIC SHAPES: the live-hypothesis count varies per step;
            # pad rows to the next power of two so jit compiles one
            # program per bucket, not per count
            pred = np.asarray(pred)
            n = pred.shape[0]
            n_pad = 1 << (n - 1).bit_length() if n > 1 else 1
            if n_pad != n:
                pred = np.concatenate(
                    [pred, np.zeros((n_pad - n,) + pred.shape[1:],
                                    pred.dtype)])
            out = _joint(self.params, jnp.asarray(enc_t),
                         jnp.asarray(pred))
            # the search expects log-probs: row = score - lp
            return np.asarray(out[:n])

        super().__init__(pred_fn=None, joint_fn=joint_fn, blank=blank,
                         beam_size=beam_size,
                         max_symbols_per_frame=max_symbols_per_frame,
                         expansion_topk=expansion_topk)
        # prefix -> (carry_c, carry_h, pred_out) host arrays; opt-in
        # int8 storage (reference per-hypothesis state compression,
        # src/Nn/CompressedVector.hh:52)
        from ..nn.compressed import StateCodec
        self._codec = StateCodec(state_compression)
        self._state_cache: Dict[Tuple[int, ...], tuple] = {}

    def _cache_put(self, key, c, h, o) -> None:
        enc = self._codec.encode
        self._state_cache[key] = (enc(c), enc(h), enc(o))

    def _cache_get(self, key):
        dec = self._codec.decode
        c, h, o = self._state_cache[key]
        return dec(c), dec(h), dec(o)

    def cache_bytes(self) -> int:
        nb = self._codec.nbytes
        return sum(nb(c) + nb(h) + nb(o)
                   for c, h, o in self._state_cache.values())

    def _seed_cache(self) -> None:
        self._state_cache.clear()
        carry = self.model.apply({"params": self.params}, 1,
                                 method=self.model.predict_init)
        carry, out = self._pred_step(carry,
                                     jnp.asarray([self.blank], jnp.int32))
        self._cache_put((), np.asarray(carry[0][0]),
                        np.asarray(carry[1][0]), np.asarray(out[0]))

    def _pred_batch(self, hyps: Sequence[TransducerHypothesis]) -> np.ndarray:
        if () not in self._state_cache:
            self._seed_cache()
        missing = [h.labels for h in hyps
                   if h.labels not in self._state_cache]
        missing = sorted(set(missing), key=len)
        if missing:
            # every parent prefix is cached (hypotheses grow one label
            # at a time), so one batched step fills all gaps; rows pad
            # to the next power of two for static jit shapes
            parents = [self._cache_get(m[:-1]) for m in missing]
            cs = np.stack([p[0] for p in parents])
            hs = np.stack([p[1] for p in parents])
            toks = np.asarray([m[-1] for m in missing], np.int32)
            n = len(missing)
            n_pad = 1 << (n - 1).bit_length() if n > 1 else 1
            if n_pad != n:
                pad = ((0, n_pad - n),)
                cs = np.pad(cs, pad + ((0, 0),) * (cs.ndim - 1))
                hs = np.pad(hs, pad + ((0, 0),) * (hs.ndim - 1))
                toks = np.pad(toks, (0, n_pad - n))
            carry, out = self._pred_step((jnp.asarray(cs), jnp.asarray(hs)),
                                         jnp.asarray(toks))
            c_np, h_np, o_np = (np.asarray(carry[0]), np.asarray(carry[1]),
                                np.asarray(out))
            for i, m in enumerate(missing):
                self._cache_put(m, c_np[i], h_np[i], o_np[i])
        return np.stack([self._cache_get(h.labels)[2] for h in hyps])

    def decode(self, enc: np.ndarray, enc_len: int
               ) -> List[TransducerHypothesis]:
        self._seed_cache()
        try:
            return super().decode(enc, enc_len)
        finally:
            self._state_cache.clear()

    # -- segment api (SearchAlgorithmV2 facade protocol) ---------------------
    # so the decoder is config-constructible through api.SearchAlgorithm
    # like the reference's stateful-scorer searches (built by Nn::Module
    # from config, /root/reference/src/Nn/Module.cc:132-218)

    def enter_segment(self) -> None:
        self._segment_result: List[int] = []
        self._segment_features = None
        self._segment_nbest: List[TransducerHypothesis] = []

    def put_features(self, features: np.ndarray) -> None:
        self._segment_features = np.asarray(features, np.float32)

    def put_feature(self, feature: np.ndarray) -> None:
        f = np.asarray(feature, np.float32)[None]
        if self._segment_features is None:
            self._segment_features = f
        else:
            self._segment_features = np.concatenate(
                [self._segment_features, f])

    def _decode_encoded(self, enc, out_lens) -> List[TransducerHypothesis]:
        """Beam decode one encoded segment: device fast path (whole beam
        in a lax.scan, search/transducer_device.py) or the host cached
        search."""
        if self._device_search is not None:
            labels, n_lab, scores = self._device_search(self.params, enc,
                                                        out_lens)
            labels, n_lab = np.asarray(labels), np.asarray(n_lab)
            scores = np.asarray(scores)
            return [TransducerHypothesis(
                        tuple(int(u) for u in labels[0, k, :n_lab[0, k]]),
                        float(scores[0, k]))
                    for k in range(labels.shape[1])
                    if scores[0, k] < _DEAD_SCORE]
        return self.decode(np.asarray(enc[0]), int(out_lens[0]))

    def finish_segment(self) -> None:
        if self._segment_features is not None:
            feats = self._segment_features
            x = np.asarray(feats)
            t = x.shape[0]
            t_pad = max(128, ((t + 127) // 128) * 128)
            if t_pad != t:
                x = np.pad(x, ((0, t_pad - t), (0, 0)))
            enc, out_lens = self._encode(
                jnp.asarray(x)[None], jnp.asarray([t], jnp.int32))
            self._segment_nbest = self._decode_encoded(enc, out_lens)
            self._segment_result = list(self._segment_nbest[0].labels)

    def recognize_batch(self, features: np.ndarray, lengths: np.ndarray,
                        n_best: int = 1
                        ) -> List[List[TransducerHypothesis]]:
        """Corpus-batched decode: (B, T, D) features + (B,) lengths ->
        per-utterance hypothesis lists, best first.  One encoder program
        + one device beam program for the whole batch, so every
        utterance decodes from the SAME padded encoder states a batched
        greedy pass would see (at bf16, per-utterance re-padding shifts
        encoder rounding enough to flip near-boundary tokens — batched
        evaluation removes that confound and amortizes device calls)."""
        x = np.asarray(features, np.float32)
        B = x.shape[0]
        # the caller's time dimension passes through UNCHANGED: any
        # re-padding compiles a different XLA program whose bf16
        # rounding can flip near-boundary tokens — the exact confound
        # recognize_batch exists to remove (greedy and beam must see
        # bit-identical encoder states)
        enc, out_lens = self._encode(
            jnp.asarray(x), jnp.asarray(lengths, jnp.int32))
        if self._device_search is not None:
            labels, n_lab, scores = self._device_search(self.params, enc,
                                                        out_lens)
            labels, n_lab = np.asarray(labels), np.asarray(n_lab)
            scores = np.asarray(scores)
            return [[TransducerHypothesis(
                        tuple(int(u) for u in labels[i, k, :n_lab[i, k]]),
                        float(scores[i, k]))
                     for k in range(min(n_best, labels.shape[1]))
                     if scores[i, k] < _DEAD_SCORE]
                    for i in range(B)]
        return [self.decode(np.asarray(enc[i]),
                            int(out_lens[i]))[:n_best] for i in range(B)]

    def decode_many_steps(self) -> int:
        return 0        # frame-sync decode runs whole-segment at finish

    def get_current_best_labels(self) -> List[int]:
        return list(self._segment_result)

    def n_best(self, n: int):
        return list(getattr(self, "_segment_nbest", []))[:n]

    def recognize_features(self, features: np.ndarray, feat_len: int,
                           feat_bucket: int = 128) -> List[int]:
        """Full pipeline: raw features -> encoder -> cached beam.  The
        feature length pads to a `feat_bucket` multiple so the encoder
        compiles once per bucket, not once per utterance length."""
        x = np.asarray(features)
        t = x.shape[0]
        t_pad = max(feat_bucket,
                    ((t + feat_bucket - 1) // feat_bucket) * feat_bucket)
        if t_pad != t:
            x = np.pad(x, ((0, t_pad - t), (0, 0)))
        enc, out_lens = self._encode(jnp.asarray(x)[None],
                                     jnp.asarray([feat_len], jnp.int32))
        return list(self._decode_encoded(enc, out_lens)[0].labels)
