"""Online (streaming) recognition sessions.

The reference streams via the SearchAlgorithmV2 loop — put_feature per
frame, decode_more, getCurrentBestTraceback/getCommonPrefix mid-segment
with maximum-stable-delay bounded latency (doc/search_v2.rst:289-307,
src/Tools/LibRASR streaming usage).  OnlineRecognizer packages that loop
with INCREMENTAL feature extraction: audio arrives in arbitrary chunks,
full analysis windows are featurized as soon as they complete (bit-exact
with the offline MfccPipeline: same framing, preemphasis continued
across chunk boundaries), pushed into the search, and partial results
are the beam's stable common prefix.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..signal import dsp
from ..signal.dsp import MfccPipeline


class OnlineRecognizer:
    """Streaming session: feed_samples() -> partial() -> finish().

    feature_kind selects the front-end:
      * "mfcc" (default): the full MfccPipeline incl. DCT, bit-exact with
        the offline pipeline.
      * "logmel-cmvn": log-mel filterbank outputs (no DCT) with *causal*
        running mean/variance normalization — the streaming counterpart
        of the flagship's segment-CMVN log-mel front-end (running CMVN is
        the online analogue of the reference's sliding normalization,
        src/Signal/Normalization.hh:66-69).
    """

    def __init__(self, pipeline: MfccPipeline, search,
                 lexicon=None, decode_while_streaming: bool = True,
                 feature_kind: str = "mfcc"):
        if feature_kind not in ("mfcc", "logmel-cmvn"):
            raise ValueError(f"unknown feature_kind {feature_kind!r}")
        self.pipe = pipeline
        self.search = search
        self.lexicon = lexicon
        self.decode_while_streaming = decode_while_streaming
        self.feature_kind = feature_kind
        self._jitted = {}
        self.start()

    # -- session control ------------------------------------------------------

    def start(self) -> None:
        self._buffer = np.zeros((0,), dtype=np.float32)
        self._emitted = 0          # full frames already featurized
        self._cm_sum = 0.0
        self._cm_sumsq = 0.0
        self._cm_n = 0.0
        self.search.enter_segment()

    # -- incremental features ---------------------------------------------------

    def _n_full_frames(self, n: int) -> int:
        """Frames whose complete window is available (the final partial
        frame of the offline rule is only produced at finish)."""
        if n < self.pipe.length:
            return 0
        return (n - self.pipe.length) // self.pipe.shift + 1

    def _featurize(self, first: int, last: int) -> np.ndarray:
        """Features for frames [first, last) from the sample buffer,
        matching the offline pipeline exactly (preemphasis carries one
        sample of history across the slice boundary)."""
        length, shift = self.pipe.length, self.pipe.shift
        start = first * shift
        end = (last - 1) * shift + length
        if start == 0:
            region = self._buffer[:end]
            lead = 0
        else:
            region = self._buffer[start - 1:end]
            lead = 1
        n_frames = last - first
        key = (len(region), lead, n_frames)
        if key not in self._jitted:
            pipe, kind = self.pipe, self.feature_kind

            def fn(region):
                x = region.astype(jnp.float32)
                if lead:
                    y = (x[1:] - pipe.alpha * x[:-1])
                else:
                    y = dsp.preemphasis(x, pipe.alpha)
                frames = dsp.frame_signal(y, pipe.length, pipe.shift,
                                          n_frames)
                frames = dsp.apply_window(frames, pipe.window_type)
                amp = dsp.rfft_amplitude(frames, pipe.fft_len,
                                         pipe.fft_scale)
                fb = dsp.apply_matrix(amp, pipe.mel_matrix)
                if kind == "mfcc":
                    return dsp.apply_matrix(dsp.log10(fb), pipe.dct)
                return dsp.log10(jnp.maximum(fb, 1e-6))

            self._jitted[key] = jax.jit(fn)
        feats = np.asarray(self._jitted[key](jnp.asarray(region)))
        if self.feature_kind == "logmel-cmvn":
            feats = self._running_cmvn(feats)
        return feats

    def _running_cmvn(self, feats: np.ndarray) -> np.ndarray:
        """Causal CMVN: frame t is normalized by the statistics of frames
        [0..t] (streamable; converges to segment CMVN as t grows)."""
        cs = self._cm_sum + np.cumsum(feats.astype(np.float64), axis=0)
        cs2 = self._cm_sumsq + np.cumsum(
            np.square(feats.astype(np.float64)), axis=0)
        n = self._cm_n + np.arange(1, len(feats) + 1, dtype=np.float64
                                   )[:, None]
        mean = cs / n
        var = np.maximum(cs2 / n - np.square(mean), 0.0)
        out = (feats - mean) / np.sqrt(var + 1e-6)
        self._cm_sum = cs[-1]
        self._cm_sumsq = cs2[-1]
        self._cm_n = float(n[-1, 0])
        return out.astype(np.float32)

    def _offline_raw(self) -> np.ndarray:
        """Un-normalized features for ALL frames of the buffer (incl. the
        trailing partial frame of the offline framing rule)."""
        total = self.pipe.n_frames(len(self._buffer))
        key = ("offline", len(self._buffer))
        if key not in self._jitted:
            pipe, kind = self.pipe, self.feature_kind

            def fn(x):
                y = dsp.preemphasis(x.astype(jnp.float32), pipe.alpha)
                frames = dsp.frame_signal(y, pipe.length, pipe.shift,
                                          total)
                frames = dsp.apply_window(frames, pipe.window_type)
                amp = dsp.rfft_amplitude(frames, pipe.fft_len,
                                         pipe.fft_scale)
                fb = dsp.apply_matrix(amp, pipe.mel_matrix)
                if kind == "mfcc":
                    return dsp.apply_matrix(dsp.log10(fb), pipe.dct)
                return dsp.log10(jnp.maximum(fb, 1e-6))

            self._jitted[key] = jax.jit(fn)
        return np.asarray(self._jitted[key](jnp.asarray(self._buffer)))

    def feed_samples(self, samples: np.ndarray) -> int:
        """Append an audio chunk; featurize newly completed frames and
        push them into the search.  Returns frames emitted this call."""
        self._buffer = np.concatenate(
            [self._buffer, np.asarray(samples, dtype=np.float32)])
        ready = self._n_full_frames(len(self._buffer))
        new = ready - self._emitted
        if new > 0:
            feats = self._featurize(self._emitted, ready)
            self.search.put_features(feats)
            self._emitted = ready
            if self.decode_while_streaming:
                self.search.decode_many_steps()
        return max(new, 0)

    # -- results ----------------------------------------------------------------

    def partial(self) -> List[int]:
        """Stable (beam-agreed) label prefix so far."""
        if hasattr(self.search, "get_common_prefix"):
            return list(self.search.get_common_prefix())
        return list(self.search.get_current_best_labels())

    def finish(self) -> List[int]:
        """Flush trailing partial frames (offline framing rule), finish
        the segment, return the best labels."""
        total = self.pipe.n_frames(len(self._buffer))
        if total > self._emitted and len(self._buffer):
            feats = self._offline_raw()[self._emitted:]
            if self.feature_kind == "logmel-cmvn":
                feats = self._running_cmvn(feats)
            self.search.put_features(feats)
            self._emitted = total
        self.search.finish_segment()
        return list(self.search.get_current_best_labels())

    def finish_orth(self) -> str:
        labels = self.finish()
        if self.lexicon is None:
            return " ".join(str(l) for l in labels)
        words = []
        for l in labels:
            if 0 <= l < len(self.lexicon.lemmas) \
                    and not self.lexicon.lemmas[l].special:
                words.append(self.lexicon.lemmas[l].preferred_orth)
        return " ".join(words)
