"""Streaming RNN-T decoding session.

RNN-T is the natural streaming architecture (monotonic frame-sync
emission), and the device beam (transducer_device.py) exposes exactly
the state needed for lossless streaming: the beam state is the scan
carry, so advancing it chunk-by-chunk is mathematically identical to one
whole-utterance pass.  This session pairs that chunked beam with a
CAUSAL transducer encoder (TransducerModel(causal=True)) whose outputs
for already-seen frames never change as more audio arrives — the same
lossless-prefix property the CTC streaming path proves
(tests/test_online_recognizer.py), applied to the transducer family.

Contract (reference: bounded-latency streaming with stable partials,
/root/reference/doc/search_v2.rst:303-307; chunked encoders,
src/Onnx/OnnxEncoder.hh:80):

    sess = StreamingTransducerSession(model, params)   # causal model
    sess.start()
    for feats_chunk in stream:      # (c, feat_dim) frames
        sess.feed(feats_chunk)
        print(sess.partial())       # current best labels, non-destructive
    labels = sess.finish()

Per feed(): the feature prefix re-encodes in a bucketed jit (compiles
once per bucket, not per length — the causal encoder makes prefix
outputs reusable, only NEW encoder frames advance the beam), then the
device beam consumes the new frames in one device call.
"""

from __future__ import annotations

from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .transducer_device import make_transducer_beam


class StreamingTransducerSession:
    """Chunk-wise RNN-T decoding with carried device beam state."""

    def __init__(self, model, params, beam_size: int = 8, blank: int = 0,
                 max_symbols_per_frame: int = 3, expansion_topk: int = 4,
                 max_labels: int = 128, feat_bucket: int = 64,
                 enc_bucket: int = 16):
        if not getattr(model, "causal", False):
            raise ValueError(
                "streaming transducer decoding needs a causal encoder "
                "(TransducerModel(causal=True)); a bidirectional encoder "
                "rewrites past frames as context grows, so chunked "
                "decoding would not be lossless")
        self.model = model
        self.params = jax.device_put(params)
        self.feat_bucket = feat_bucket
        self.enc_bucket = enc_bucket
        self._beam = make_transducer_beam(
            model, beam=beam_size, blank=blank,
            max_symbols=max_symbols_per_frame, topk=expansion_topk,
            max_labels=max_labels)
        self._encode = jax.jit(
            lambda p, f, l: model.apply({"params": p}, f, l,
                                        method=model.encode))
        self.start()

    def start(self) -> None:
        self._feats: Optional[np.ndarray] = None
        self._enc_consumed = 0
        self._state = self._beam.init(self.params, 1)

    # -- streaming ------------------------------------------------------------

    def feed(self, feats_chunk: np.ndarray) -> int:
        """Append feature frames and advance the beam over the encoder
        frames they complete.  Returns the number of new encoder frames
        consumed."""
        f = np.asarray(feats_chunk, np.float32)
        self._feats = f if self._feats is None \
            else np.concatenate([self._feats, f])
        t = self._feats.shape[0]
        t_pad = max(self.feat_bucket,
                    -(-t // self.feat_bucket) * self.feat_bucket)
        x = np.pad(self._feats, ((0, t_pad - t), (0, 0)))
        enc, out_lens = self._encode(self.params, jnp.asarray(x)[None],
                                     jnp.asarray([t], jnp.int32))
        n_enc = int(out_lens[0])
        new = n_enc - self._enc_consumed
        if new <= 0:
            return 0
        # causal encoder: frames [consumed, n_enc) are final — advance
        # the beam over them (padded to a bucket for stable jit shapes)
        c_pad = max(self.enc_bucket, -(-new // self.enc_bucket)
                    * self.enc_bucket)
        chunk = jax.lax.dynamic_slice_in_dim(
            jnp.pad(enc, ((0, 0), (0, c_pad), (0, 0))),
            self._enc_consumed, c_pad, axis=1)
        self._state = self._beam.advance(
            self.params, self._state, chunk,
            jnp.asarray([new], jnp.int32))
        self._enc_consumed = n_enc
        return new

    def partial(self) -> List[int]:
        """Current best labels — non-destructive, callable any time."""
        labels, n, _ = self._beam.finalize(self._state)
        labels, n = np.asarray(labels), np.asarray(n)
        return [int(u) for u in labels[0, 0, :n[0, 0]]]

    def finish(self) -> List[int]:
        return self.partial()
