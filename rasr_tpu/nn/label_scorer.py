"""LabelScorer framework for search v2.

Re-creates the reference scoring abstraction
(src/Nn/LabelScorer/LabelScorer.hh:78-118: getInitialScoringContext /
extendedScoringContext / addInput(s) / getScoreAccessor / cleanupCaches;
ScoringContext.hh:33; TransitionTypes.hh) with a batch-first TPU design:
scorers return dense (n_contexts, n_labels) score matrices (negative
log-probs) so the search requests ONE device batch per decode step.

Registered scorer types mirror src/Nn/Module.cc:132-218: no-op, prior,
scaled, combine, encoder-only (jax/flax model instead of an ONNX session),
encoder-decoder hooks.
"""

from __future__ import annotations

import enum
import math
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np


class TransitionType(enum.IntEnum):
    """src/Nn/LabelScorer/TransitionTypes.hh (exposed in LibRASR,
    src/Tools/LibRASR/LabelScorer.cc:82-92)."""
    LABEL_TO_LABEL = 0
    LABEL_LOOP = 1
    LABEL_TO_BLANK = 2
    BLANK_TO_LABEL = 3
    BLANK_LOOP = 4
    INITIAL_LABEL = 5
    INITIAL_BLANK = 6
    LABEL_TO_SILENCE = 7
    SILENCE_TO_LABEL = 8
    SILENCE_LOOP = 9


@dataclass(frozen=True)
class ScoringContext:
    """Hashable per-hypothesis scorer state (reference ScoringContext)."""

    def is_final(self) -> bool:
        return False


@dataclass(frozen=True)
class StepScoringContext(ScoringContext):
    """Time-synchronous context: just the decode step (frame index)."""
    step: int = 0


@dataclass(frozen=True)
class HistoryScoringContext(ScoringContext):
    """Label-synchronous context: emitted label history (for AED/decoder)."""
    labels: Tuple[int, ...] = ()
    step: int = 0


class LabelScorer:
    """Base interface; scores are NEGATIVE log probabilities (add to
    combine, lower = better), the framework-wide Score convention."""

    def reset(self) -> None:
        """Start a new segment (reference: implicit via new scorer /
        cleanupCaches)."""

    def add_input(self, feature: np.ndarray) -> None:
        """Append one frame (D,) to the input buffer."""
        self.add_inputs(feature[None, :])

    def add_inputs(self, features: np.ndarray) -> None:
        raise NotImplementedError

    def signal_segment_end(self) -> None:
        """All inputs for the segment are in (enables full-context
        encoders)."""

    def get_initial_scoring_context(self) -> ScoringContext:
        return StepScoringContext(0)

    def extended_scoring_context(self, context: ScoringContext, label: int,
                                 transition: TransitionType) -> ScoringContext:
        raise NotImplementedError

    def score_batch(self, contexts: Sequence[ScoringContext]
                    ) -> Optional[np.ndarray]:
        """(n_contexts, n_labels) scores, or None if inputs are exhausted
        (end of segment for time-sync scorers)."""
        raise NotImplementedError

    @property
    def n_labels(self) -> int:
        raise NotImplementedError

    def max_ready_step(self) -> int:
        """Number of decode steps currently scorable (time-sync)."""
        return 0

    def cleanup_caches(self, keep: Sequence[ScoringContext]) -> None:
        pass


class NoOpLabelScorer(LabelScorer):
    """Passes through the current input frame as scores (reference no-op:
    inputs ARE the scores, e.g. externally computed posteriors)."""

    def __init__(self, n_labels: int, inputs_are_log_probs: bool = True):
        self._n = n_labels
        self._log_probs = inputs_are_log_probs
        self._buffer: List[np.ndarray] = []

    def reset(self):
        self._buffer = []

    def add_inputs(self, features):
        for f in np.asarray(features):
            self._buffer.append(f)

    def extended_scoring_context(self, context, label, transition):
        if transition in (TransitionType.LABEL_LOOP, TransitionType.BLANK_LOOP,
                          TransitionType.SILENCE_LOOP):
            pass
        return StepScoringContext(context.step + 1)

    def max_ready_step(self):
        return len(self._buffer)

    def score_batch(self, contexts):
        rows = []
        for c in contexts:
            if c.step >= len(self._buffer):
                return None
            v = self._buffer[c.step]
            rows.append(-v if self._log_probs else v)
        return np.stack(rows)

    def log_probs(self) -> Optional[np.ndarray]:
        """Full (T, V) log-posteriors (device fast path / static-graph
        decoders); None unless inputs are log-probs."""
        if not self._log_probs or not self._buffer:
            return None
        return np.stack(self._buffer)

    @property
    def n_labels(self):
        return self._n


class PriorLabelScorer(LabelScorer):
    """Static per-label scores (label prior subtraction,
    reference 'prior' scorer)."""

    def __init__(self, priors: np.ndarray, scale: float = 1.0):
        # priors: log p(label); score contribution = +scale * log p
        self._scores = scale * np.asarray(priors, dtype=np.float32)

    def add_inputs(self, features):
        pass

    def extended_scoring_context(self, context, label, transition):
        return context

    def max_ready_step(self):
        return 1 << 30

    def score_batch(self, contexts):
        return np.tile(self._scores[None, :], (len(contexts), 1))

    @property
    def n_labels(self):
        return len(self._scores)


class ScaledLabelScorer(LabelScorer):
    """Wraps a scorer with a scale (reference ScaledLabelScorer)."""

    def __init__(self, child: LabelScorer, scale: float):
        self.child = child
        self.scale = scale

    def reset(self):
        self.child.reset()

    def add_inputs(self, features):
        self.child.add_inputs(features)

    def signal_segment_end(self):
        self.child.signal_segment_end()

    def get_initial_scoring_context(self):
        return self.child.get_initial_scoring_context()

    def extended_scoring_context(self, context, label, transition):
        return self.child.extended_scoring_context(context, label, transition)

    def max_ready_step(self):
        return self.child.max_ready_step()

    def score_batch(self, contexts):
        s = self.child.score_batch(contexts)
        return None if s is None else self.scale * s

    @property
    def n_labels(self):
        return self.child.n_labels


@dataclass(frozen=True)
class CombineContext(ScoringContext):
    children: Tuple[ScoringContext, ...] = ()

    @property
    def step(self):
        return max((getattr(c, "step", 0) for c in self.children), default=0)


class CombineLabelScorer(LabelScorer):
    """Sum of child scorers (reference 'combine')."""

    def __init__(self, children: Sequence[LabelScorer]):
        self.children = list(children)

    def reset(self):
        for c in self.children:
            c.reset()

    def add_inputs(self, features):
        for c in self.children:
            c.add_inputs(features)

    def signal_segment_end(self):
        for c in self.children:
            c.signal_segment_end()

    def get_initial_scoring_context(self):
        return CombineContext(tuple(c.get_initial_scoring_context()
                                    for c in self.children))

    def extended_scoring_context(self, context, label, transition):
        return CombineContext(tuple(
            c.extended_scoring_context(cc, label, transition)
            for c, cc in zip(self.children, context.children)))

    def max_ready_step(self):
        return min(c.max_ready_step() for c in self.children)

    def score_batch(self, contexts):
        total = None
        for i, child in enumerate(self.children):
            s = child.score_batch([ctx.children[i] for ctx in contexts])
            if s is None:
                return None
            total = s if total is None else total + s
        return total

    @property
    def n_labels(self):
        return self.children[0].n_labels


class EncoderOnlyLabelScorer(LabelScorer):
    """Time-synchronous scorer over an encoder's (T, V) log-posterior output
    (reference 'encoder-only' with an ONNX session -> here any callable
    features (T, D) -> log_probs (T', V), e.g. a jitted flax model).

    The encoder runs once at segment end (full context) or in chunks
    (`chunk_frames`) for streaming, mirroring the chunked-onnx encoder
    (src/Onnx/OnnxEncoder.hh:80).
    """

    def __init__(self, encode_fn: Callable[[np.ndarray], np.ndarray],
                 n_labels: int, chunk_frames: Optional[int] = None,
                 chunk_history: int = 0):
        self._encode = encode_fn
        self._n = n_labels
        self.chunk_frames = chunk_frames
        self.chunk_history = chunk_history
        self.reset()

    def reset(self):
        self._features: List[np.ndarray] = []
        self._outputs: Optional[np.ndarray] = None
        self._segment_end = False

    def add_inputs(self, features):
        features = np.asarray(features)
        for f in features:
            self._features.append(f)
        if self.chunk_frames:
            self._maybe_encode_chunks()

    def _maybe_encode_chunks(self):
        done = 0 if self._outputs is None else self._encoded_inputs
        while len(self._features) - done >= self.chunk_frames:
            hist = max(done - self.chunk_history, 0)
            chunk = np.stack(self._features[hist:done + self.chunk_frames])
            out = np.asarray(self._encode(chunk))
            new = out[-(self.chunk_frames):] if self.chunk_history else out[
                done - hist:]
            self._outputs = new if self._outputs is None else np.concatenate(
                [self._outputs, new])
            done += self.chunk_frames
        self._encoded_inputs = done

    def signal_segment_end(self):
        self._segment_end = True
        if not self._features:
            self._outputs = np.zeros((0, self._n), dtype=np.float32)
            return
        feats = np.stack(self._features)
        self._outputs = np.asarray(self._encode(feats))

    def log_probs(self) -> Optional[np.ndarray]:
        """Full (T', V) log-posteriors (device fast path for CTC search)."""
        return None if self._outputs is None else self._outputs

    def extended_scoring_context(self, context, label, transition):
        return StepScoringContext(context.step + 1)

    def max_ready_step(self):
        return 0 if self._outputs is None else len(self._outputs)

    def score_batch(self, contexts):
        if self._outputs is None:
            return None
        steps = np.asarray([c.step for c in contexts])
        if (steps >= len(self._outputs)).any():
            return None
        return -self._outputs[steps]

    @property
    def n_labels(self):
        return self._n


# -- registry ---------------------------------------------------------------

_SCORER_TYPES: Dict[str, Callable] = {}


def register_label_scorer_type(name: str, factory: Callable) -> None:
    """User-extensible registry (reference LibRASR
    register_label_scorer_type, src/Tools/LibRASR/LabelScorer.cc:72-92)."""
    _SCORER_TYPES[name] = factory


def create_label_scorer(name: str, *args, **kwargs) -> LabelScorer:
    if name not in _SCORER_TYPES:
        raise KeyError(f"unknown label scorer type {name!r}; "
                       f"known: {sorted(_SCORER_TYPES)}")
    return _SCORER_TYPES[name](*args, **kwargs)


register_label_scorer_type("no-op", NoOpLabelScorer)
register_label_scorer_type("prior", PriorLabelScorer)
register_label_scorer_type("scaled", ScaledLabelScorer)
register_label_scorer_type("combine", CombineLabelScorer)
register_label_scorer_type("encoder-only", EncoderOnlyLabelScorer)
