"""Asynchronous double-buffered scoring.

The reference decouples neural forwarding from search with background
threads and promise queues (src/Lm/RecurrentLanguageModel.hh:183-196 async
forwarder; buffered feature scorers, src/Speech/Recognizer.cc:272-281).
Here the same pattern wraps any chunked encoder: a worker thread runs
device forwards for completed chunks while the host search consumes already
scored frames — device compute and host bookkeeping overlap.
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, List, Optional

import numpy as np

from .label_scorer import EncoderOnlyLabelScorer, LabelScorer, StepScoringContext


class AsyncChunkedEncoderScorer(LabelScorer):
    """Time-sync scorer whose encoder runs in a background thread per chunk.

    encode_fn: features (chunk+history, D) -> log-probs (chunk', V).
    Chunks are dispatched as soon as enough frames buffered; score_batch
    blocks only when the requested step is not yet scored.
    """

    def __init__(self, encode_fn: Callable[[np.ndarray], np.ndarray],
                 n_labels: int, chunk_frames: int = 64,
                 chunk_history: int = 16):
        self._encode = encode_fn
        self._n = n_labels
        self.chunk_frames = chunk_frames
        self.chunk_history = chunk_history
        self.reset()

    def reset(self):
        if getattr(self, "_worker", None) is not None:
            self._queue.put(None)
            self._worker.join()
        self._features: List[np.ndarray] = []
        self._outputs: List[np.ndarray] = []
        self._dispatched = 0
        self._inflight = 0        # chunks queued but not yet consumed here
        self._queue: "queue.Queue" = queue.Queue()
        self._results: "queue.Queue" = queue.Queue()
        self._segment_end = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def _run(self):
        while True:
            item = self._queue.get()
            if item is None:
                return
            chunk_idx, feats, n_new = item
            try:
                out = np.asarray(self._encode(feats))
            except BaseException as exc:  # re-raised on the host thread
                self._results.put((chunk_idx, exc))
                continue
            # keep only outputs for the new (non-history) frames
            self._results.put((chunk_idx, out[-n_new:] if n_new else out))

    def add_inputs(self, features):
        for f in np.asarray(features, dtype=np.float32):
            self._features.append(f)
        self._maybe_dispatch(final=False)

    def _maybe_dispatch(self, final: bool):
        while True:
            remaining = len(self._features) - self._dispatched
            if remaining <= 0:
                break
            if remaining < self.chunk_frames and not final:
                break
            n_new = min(self.chunk_frames, remaining)
            hist = max(self._dispatched - self.chunk_history, 0)
            feats = np.stack(self._features[hist:self._dispatched + n_new])
            self._queue.put((self._dispatched, feats, n_new))
            self._dispatched += n_new
            self._inflight += 1
            if final and remaining <= self.chunk_frames:
                break

    def signal_segment_end(self):
        self._segment_end = True
        self._maybe_dispatch(final=True)

    def _drain(self, until_step: int) -> None:
        """Consume worker results until `until_step` is scored.

        Blocks ONLY while a dispatched chunk is actually in flight — if
        the step isn't scored and nothing is pending (mid-stream, the
        next chunk hasn't buffered yet), return immediately so streaming
        decode loops never stall waiting for data that can't arrive.
        """
        scored = sum(len(o) for o in self._outputs)
        while scored <= until_step and self._inflight > 0:
            idx, out = self._results.get()
            self._inflight -= 1
            if isinstance(out, BaseException):
                raise out
            self._outputs.append(out)
            scored += len(out)

    def max_ready_step(self):
        return sum(len(o) for o in self._outputs)

    def get_initial_scoring_context(self):
        return StepScoringContext(0)

    def extended_scoring_context(self, context, label, transition):
        return StepScoringContext(context.step + 1)

    def score_batch(self, contexts):
        max_step = max(c.step for c in contexts)
        self._drain(max_step)
        flat = (np.concatenate(self._outputs)
                if self._outputs else np.zeros((0, self._n), np.float32))
        if max_step >= len(flat):
            return None
        steps = np.asarray([c.step for c in contexts])
        return -flat[steps]

    @property
    def n_labels(self):
        return self._n
