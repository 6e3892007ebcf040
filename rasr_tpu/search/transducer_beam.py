"""Transducer (RNN-T) beam search.

Time-synchronous monotonic beam search over a transducer model: per frame,
hypotheses either consume the frame with blank or emit labels (bounded per
frame), recombining identical label sequences by log-sum.  The reference
decodes transducers through its label-sync searches with stateful ONNX
scorers; this native version batches prediction-network and joint calls
over the beam per step.

Interfaces:
    pred_fn(prefixes (B, U) int32 with leading blank) -> (B, U, P) states
        (the search gathers each hypothesis's state at its own prefix
        length — right-padded rows must not leak into shorter prefixes)
    joint_fn(enc_t (E,), pred (B, P)) -> (B, V) log-probs
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


@dataclass
class TransducerHypothesis:
    labels: Tuple[int, ...] = ()
    score: float = 0.0          # -log p

    def key(self):
        return self.labels


class TransducerBeamSearch:
    def __init__(self, pred_fn: Callable, joint_fn: Callable,
                 blank: int = 0, beam_size: int = 8,
                 max_symbols_per_frame: int = 3,
                 expansion_topk: int = 4):
        self.pred_fn = pred_fn
        self.joint_fn = joint_fn
        self.blank = blank
        self.beam_size = beam_size
        self.max_symbols = max_symbols_per_frame
        self.topk = expansion_topk

    def _pred_batch(self, hyps: Sequence[TransducerHypothesis]) -> np.ndarray:
        L = max(len(h.labels) for h in hyps) + 1
        batch = np.zeros((len(hyps), L), dtype=np.int32)
        for i, h in enumerate(hyps):
            batch[i, 1:1 + len(h.labels)] = h.labels
        states = np.asarray(self.pred_fn(batch))      # (B, L, P)
        idx = np.asarray([len(h.labels) for h in hyps])
        return states[np.arange(len(hyps)), idx]

    def decode(self, enc: np.ndarray, enc_len: int) -> List[TransducerHypothesis]:
        """enc (T, E) encoder states -> beam sorted best-first."""
        beam: Dict[Tuple, TransducerHypothesis] = {
            (): TransducerHypothesis()}
        for t in range(enc_len):
            # frame t: expand emits up to max_symbols, then all take blank
            frontier = dict(beam)
            next_beam: Dict[Tuple, TransducerHypothesis] = {}
            for _round in range(self.max_symbols + 1):
                if not frontier:
                    break
                hyps = list(frontier.values())
                pred = self._pred_batch(hyps)
                lp = np.asarray(self.joint_fn(enc[t], pred))   # (B, V)
                new_frontier: Dict[Tuple, TransducerHypothesis] = {}
                for i, h in enumerate(hyps):
                    row = h.score - lp[i]
                    # blank: finish this frame (recombine by log-sum)
                    b_sc = float(row[self.blank])
                    prev = next_beam.get(h.labels)
                    merged = b_sc if prev is None else float(
                        -np.logaddexp(-b_sc, -prev.score))
                    next_beam[h.labels] = TransducerHypothesis(
                        h.labels, merged)
                    # emits (only while under the per-frame bound)
                    if _round < self.max_symbols:
                        count = 0
                        for v in np.argsort(row):
                            v = int(v)
                            if v == self.blank:
                                continue
                            cand = TransducerHypothesis(
                                h.labels + (v,), float(row[v]))
                            old = new_frontier.get(cand.labels)
                            if old is None or cand.score < old.score:
                                new_frontier[cand.labels] = cand
                            count += 1
                            if count >= self.topk:
                                break
                # prune the emit frontier
                pruned = sorted(new_frontier.values(),
                                key=lambda h: h.score)[:self.beam_size]
                frontier = {h.labels: h for h in pruned}
            beam = dict(sorted(next_beam.items(),
                               key=lambda kv: kv[1].score)[:self.beam_size])
        return sorted(beam.values(), key=lambda h: h.score)

    def recognize(self, enc: np.ndarray, enc_len: int) -> List[int]:
        return list(self.decode(enc, enc_len)[0].labels)
