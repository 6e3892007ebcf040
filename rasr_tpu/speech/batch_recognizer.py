"""Batched corpus recognition.

The reference decodes one segment at a time (Recognizer.cc feed loop);
the TPU-native throughput path batches MANY segments per device dispatch:
segments bucket by padded feature length, the encoder and the device-side
CTC prefix beam run once per bucket batch.  This is the configuration the
bench measures (thousands of times real-time per chip).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..bliss.evaluation import Evaluator
from ..bliss.lexicon import Lexicon
from ..search.ctc_decode import ctc_prefix_beam


@dataclass
class BatchResult:
    segment_name: str
    labels: List[int]
    orth: str
    score: float
    reference_orth: str = ""


class BatchedCtcRecognizer:
    """encode_fn(feats (B, T, D), lens (B,)) -> (log_probs (B, T', V),
    out_lens (B,)); decodes buckets with the device prefix beam."""

    def __init__(self, encode_fn: Callable, lexicon: Lexicon,
                 beam: int = 8, topk: int = 8,
                 batch_size: int = 64,
                 bucket_frames: int = 128,
                 evaluator: Optional[Evaluator] = None,
                 lm_params=None, lm_bos_id: int = 0,
                 lm_layers: int = 1, lm_scale: float = 0.0):
        """lm_params + lm_scale > 0 switch decoding to the LM-fused
        device beam (search.ctc_decode_lm): the LSTM LM's recurrence runs
        inside the search scan with per-beam hidden states."""
        self.encode_fn = encode_fn
        self.lexicon = lexicon
        self.beam = beam
        self.topk = topk
        self.batch_size = batch_size
        self.bucket_frames = bucket_frames
        self.evaluator = evaluator
        self.lm_params = lm_params
        self.lm_bos_id = lm_bos_id
        self.lm_layers = lm_layers
        self.lm_scale = lm_scale

    def _labels_to_orth(self, labels: Sequence[int]) -> str:
        words = []
        for l in labels:
            if 0 <= l < len(self.lexicon.lemmas):
                lemma = self.lexicon.lemmas[l]
                if not lemma.special and lemma.preferred_orth:
                    words.append(lemma.preferred_orth)
        return " ".join(words)

    def recognize(self, segments: Sequence[Tuple[str, np.ndarray, str]]
                  ) -> List[BatchResult]:
        """segments: (name, features (T, D), reference_orth) tuples."""
        # bucket by padded length so compilations are reused
        def bucket_len(T: int) -> int:
            return -(-T // self.bucket_frames) * self.bucket_frames

        buckets: Dict[int, List[int]] = {}
        for i, (_, feats, _) in enumerate(segments):
            buckets.setdefault(bucket_len(len(feats)), []).append(i)

        results: List[Optional[BatchResult]] = [None] * len(segments)
        # two-phase pipelined execution: phase 1 DISPATCHES encoder +
        # device beam for every batch without a host sync (log-probs stay
        # on device between the two — never transferred), so XLA's async
        # queue overlaps batch i+1's encode with batch i's beam; phase 2
        # pulls the (tiny) label/score outputs, which overlaps the
        # transfers with still-running compute of later batches
        pending: List[Tuple[List[int], object, object, object]] = []
        for pad_T, idxs in sorted(buckets.items()):
            for start in range(0, len(idxs), self.batch_size):
                chunk = idxs[start:start + self.batch_size]
                D = segments[chunk[0]][1].shape[1]
                feats = np.zeros((len(chunk), pad_T, D), np.float32)
                lens = np.zeros((len(chunk),), np.int32)
                for j, i in enumerate(chunk):
                    f = segments[i][1]
                    feats[j, :len(f)] = f
                    lens[j] = len(f)
                lp, out_lens = self.encode_fn(feats, lens)
                if self.lm_params is not None and self.lm_scale > 0:
                    from ..search.ctc_decode_lm import ctc_prefix_beam_lm
                    labels, n_lab, scores = ctc_prefix_beam_lm(
                        lp, out_lens, self.lm_params,
                        bos_id=self.lm_bos_id, n_layers=self.lm_layers,
                        lm_scale=self.lm_scale,
                        beam=self.beam, topk=self.topk)
                else:
                    labels, n_lab, scores = ctc_prefix_beam(
                        lp, out_lens, beam=self.beam, topk=self.topk)
                pending.append((chunk, labels, n_lab, scores))
        for chunk, labels, n_lab, scores in pending:
            labels = np.asarray(labels)
            n_lab = np.asarray(n_lab)
            scores = np.asarray(scores)
            for j, i in enumerate(chunk):
                name, _, ref = segments[i]
                labs = labels[j, 0, :int(n_lab[j, 0])].tolist()
                orth = self._labels_to_orth(labs)
                results[i] = BatchResult(name, labs, orth,
                                         float(scores[j, 0]), ref)
                if self.evaluator is not None and ref:
                    self.evaluator.evaluate(ref, orth)
        return [r for r in results if r is not None]
