"""TPU emission scoring for the classic word-conditioned search.

The reference decouples NN forwarding from the host search with buffered
batch scorers (src/Mm/BatchFeatureScorer.hh:34: addFeature()/flush() fill
a device batch while feed() consumes the previous one;
src/Speech/Recognizer.cc:272-281 drives the loop).  The TPU-native
equivalent leans on JAX's async dispatch: `forward(utterance k+1)` is
enqueued on the device BEFORE the host search consumes utterance k's
already-materialized scores, so the chip computes posteriors strictly in
the shadow of the host beam search — the double-buffered emission-batch
design named as TPU target #2 in SURVEY.md §3.1.

Emission score convention (negative log, as the search expects):

    score[t, s] = -am_scale * (log p(s | x_t) - prior_scale * log p(s))

i.e. scaled-prior-divided posteriors, the reference's hybrid scorer
contract (src/Mm/Module.cc nn-precomputed-hybrid; prior estimation
src/Nn/Prior.hh).
"""

from __future__ import annotations

import time
from typing import Iterable, Iterator, List, Optional, Tuple

import numpy as np


class HybridEmissionScorer:
    """Batched, bucketed, double-buffered hybrid emission scoring."""

    def __init__(self, model, params, log_priors: Optional[np.ndarray],
                 prior_scale: float = 0.7, am_scale: float = 1.0,
                 feat_bucket: int = 256, frontend=None,
                 n_frames_fn=None, frame_samples: int = 160):
        """`frontend`, when given, fuses feature extraction into the
        device program: a traceable (samples (B, N), num_frames static,
        n_frames (B,)) -> (B, num_frames, D) feature function (the dsp
        log-mel chain), so `score`/`pipelined` take RAW AUDIO and the
        full front-end + AM forward runs as one XLA program per
        utterance.  `n_frames_fn(n_samples) -> frame count` supplies the
        window/shift frame convention (e.g. MfccPipeline.n_frames);
        audio is padded to `feat_bucket * frame_samples`-sample buckets
        so only a handful of program shapes compile."""
        import jax
        import jax.numpy as jnp

        self.model = model
        # device-resident jit ARGUMENT, never a closure constant (the
        # remote-compile tunnel rejects model-size embedded literals)
        self.params = jax.device_put(params)
        self.prior_scale = float(prior_scale)
        self.am_scale = float(am_scale)
        self.feat_bucket = int(feat_bucket)
        self.frame_samples = int(frame_samples)
        if log_priors is not None:
            lp = np.asarray(log_priors, np.float32)
            self._prior = jnp.asarray(prior_scale * lp)
        else:
            self._prior = jnp.zeros((model.n_classes,), jnp.float32)
        #: wall seconds the host spent BLOCKED on device results (the
        #: non-overlapped remainder; total forward time is larger but
        #: hidden under the search)
        self.blocked_seconds = 0.0
        self.utterances = 0

        def fwd(p, prior, feats, lens):
            logits, _ = model.apply({"params": p}, feats, lens,
                                    deterministic=True)
            post = jax.nn.log_softmax(logits, axis=-1)
            return -self.am_scale * (post - prior[None, None, :])

        if frontend is None:
            self._fwd = jax.jit(fwd)
        else:
            def fused(p, prior, samples, n_frames, num_frames):
                feats = frontend(samples, num_frames, n_frames)
                return fwd(p, prior, feats, n_frames)

            self._fwd = jax.jit(fused, static_argnums=(4,))
        self._frontend = frontend
        self._n_frames_fn = n_frames_fn or (lambda n: n // frame_samples)
        self._jnp = jnp

    # -- single utterance -----------------------------------------------------

    def _dispatch(self, feats: np.ndarray):
        """Enqueue one utterance's forward; returns (device array, T).
        With a fused frontend, `feats` is raw audio (N,) samples."""
        jnp = self._jnp
        x = np.asarray(feats, np.float32)
        if self._frontend is not None:
            n = x.shape[0]
            t = self._n_frames_fn(n)
            b = self.feat_bucket * self.frame_samples
            n_pad = max(b, ((n + b - 1) // b) * b)
            if n_pad != n:
                x = np.pad(x, (0, n_pad - n))
            t_pad = self._n_frames_fn(n_pad)
            t = min(t, t_pad)
            out = self._fwd(self.params, self._prior, jnp.asarray(x)[None],
                            jnp.asarray([t], jnp.int32), t_pad)
            return out, t
        t = x.shape[0]
        b = self.feat_bucket
        t_pad = max(b, ((t + b - 1) // b) * b)
        if t_pad != t:
            x = np.pad(x, ((0, t_pad - t), (0, 0)))
        out = self._fwd(self.params, self._prior, jnp.asarray(x)[None],
                        jnp.asarray([t], jnp.int32))
        return out, t

    def _fetch(self, out, t: int) -> np.ndarray:
        t0 = time.perf_counter()
        scores = np.asarray(out[0, :t])
        self.blocked_seconds += time.perf_counter() - t0
        self.utterances += 1
        return scores

    def score(self, feats: np.ndarray) -> np.ndarray:
        """(T, D) features -> (T, S) emission -log scores."""
        return self._fetch(*self._dispatch(feats))

    # -- pipelined corpus scoring ----------------------------------------------

    def pipelined(self, feats_iter: Iterable[np.ndarray]
                  ) -> Iterator[np.ndarray]:
        """Yield emission matrices with one-utterance device lookahead:
        while the caller (the host tree search) consumes utterance k,
        utterance k+1's forward already runs on the chip."""
        pending: Optional[Tuple[object, int]] = None
        for feats in feats_iter:
            nxt = self._dispatch(feats)
            if pending is not None:
                yield self._fetch(*pending)
            pending = nxt
        if pending is not None:
            yield self._fetch(*pending)

    def _dispatch_batch(self, batch: List[np.ndarray]):
        """Enqueue a bucket-padded multi-utterance forward (one device
        program for the whole batch — the reference's BatchFeatureScorer
        amortizes the NN call the same way, src/Mm/BatchFeatureScorer.hh:
        34; on a remote-tunneled device this also amortizes the per-call
        round-trip latency).  Returns (device array, lengths)."""
        jnp = self._jnp
        if self._frontend is not None:
            ns = [x.shape[0] for x in batch]
            ts = [self._n_frames_fn(n) for n in ns]
            b = self.feat_bucket * self.frame_samples
            n_pad = max(b, ((max(ns) + b - 1) // b) * b)
            x = np.zeros((len(batch), n_pad), np.float32)
            for i, a in enumerate(batch):
                x[i, :len(a)] = a
            t_pad = self._n_frames_fn(n_pad)
            ts = [min(t, t_pad) for t in ts]
            out = self._fwd(self.params, self._prior, jnp.asarray(x),
                            jnp.asarray(ts, jnp.int32), t_pad)
            return out, ts
        ts = [x.shape[0] for x in batch]
        bkt = self.feat_bucket
        t_pad = max(bkt, ((max(ts) + bkt - 1) // bkt) * bkt)
        x = np.zeros((len(batch), t_pad, batch[0].shape[1]), np.float32)
        for i, f in enumerate(batch):
            x[i, :len(f)] = f
        out = self._fwd(self.params, self._prior, jnp.asarray(x),
                        jnp.asarray(ts, jnp.int32))
        return out, ts

    def score_batch(self, inputs: List[np.ndarray], batch_size: int = 32,
                    max_in_flight: int = 2) -> Iterator[np.ndarray]:
        """Score a corpus with bucket-batched forwards dispatched ahead
        of the host search; yields per-utterance (T, S) matrices in the
        input order.  At most `max_in_flight` chunk outputs live on
        device at once (unbounded dispatch would hold every chunk's
        (B, T, S) posterior buffer simultaneously — an OOM at corpus
        scale); depth 2 keeps the chip one chunk ahead, the
        BatchFeatureScorer double-buffer discipline."""
        from collections import deque
        order = sorted(range(len(inputs)), key=lambda i: len(inputs[i]))
        chunks = [order[i:i + batch_size]
                  for i in range(0, len(order), batch_size)]
        results: dict = {}
        pos = 0
        pend: deque = deque()

        def drain_one():
            nonlocal pos
            idx, (out, ts) = pend.popleft()
            t0 = time.perf_counter()
            arr = np.asarray(out)
            self.blocked_seconds += time.perf_counter() - t0
            for j, i in enumerate(idx):
                results[i] = arr[j, :ts[j]]
                self.utterances += 1

        for idx in chunks:
            pend.append((idx,
                         self._dispatch_batch([inputs[i] for i in idx])))
            if len(pend) > max_in_flight:
                drain_one()
            while pos < len(inputs) and pos in results:
                yield results.pop(pos)
                pos += 1
        while pend:
            drain_one()
            while pos < len(inputs) and pos in results:
                yield results.pop(pos)
                pos += 1


class StreamingHybridScorer:
    """Chunked emission scoring for streaming classic recognition.

    The classic word-conditioned search consumes emissions strictly
    frame-by-frame (reference src/Speech/Recognizer.cc:272 feed loop),
    so streaming hybrid recognition only needs the EMISSIONS to arrive
    incrementally.  A bidirectional conformer AM needs right context:
    each chunk is scored from an overlapping window
    [chunk_start - left_context, chunk_end + right_context] and only
    the central chunk's rows are emitted — the standard chunked
    inference of non-causal encoders (the reference's chunked-onnx
    encoder contract, src/Onnx/OnnxEncoder.hh:80).  Emissions are not
    bit-identical to full-context scoring at chunk boundaries; the
    context sizes trade latency for that mismatch.

    feed(feats) -> (T_new, S) newly finalized emission rows (possibly
    empty); finish() flushes the tail."""

    def __init__(self, scorer: "HybridEmissionScorer", chunk: int = 64,
                 right_context: int = 32, left_context: int = 64):
        self._scorer = scorer
        self.chunk = int(chunk)
        self.right = int(right_context)
        self.left = int(left_context)
        self.reset()

    def reset(self) -> None:
        self._buf: Optional[np.ndarray] = None
        self._done = 0          # frames already emitted

    def _emit_ready(self, flush: bool = False) -> np.ndarray:
        out = []
        while True:
            have = 0 if self._buf is None else len(self._buf)
            end = self._done + self.chunk
            if end + (0 if flush else self.right) > have:
                if not flush or self._done >= have:
                    break
                end = have
            lo = max(0, self._done - self.left)
            hi = min(have, end + self.right)
            scores = self._scorer.score(self._buf[lo:hi])
            out.append(scores[self._done - lo:end - lo])
            self._done = end
        if not out:
            S = self._scorer._prior.shape[0]
            return np.zeros((0, S), np.float32)
        return np.concatenate(out)

    def feed(self, feats: np.ndarray) -> np.ndarray:
        f = np.asarray(feats, np.float32)
        if f.ndim == 1:
            f = f[None]
        self._buf = f if self._buf is None else \
            np.concatenate([self._buf, f])
        return self._emit_ready()

    def finish(self) -> np.ndarray:
        return self._emit_ready(flush=True)


def estimate_log_priors(labels: np.ndarray, frames: np.ndarray,
                        n_classes: int, floor: float = 1e-8) -> np.ndarray:
    """Log state priors from frame-label counts (src/Nn/Prior.hh's
    mean-posterior estimate, computed from the alignment instead)."""
    counts = np.full((n_classes,), floor, np.float64)
    for i in range(labels.shape[0]):
        t = int(frames[i])
        np.add.at(counts, labels[i, :t], 1.0)
    return np.log(counts / counts.sum()).astype(np.float32)
