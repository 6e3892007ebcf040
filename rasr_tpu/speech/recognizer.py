"""Recognition orchestration.

The reference OfflineRecognizer (src/Speech/Recognizer.hh:62, feed loop
Recognizer.cc:170-290) visits corpus segments, extracts features, feeds the
search, evaluates and logs per-segment RTF.  This rebuild batches where the
reference streams: features for a segment come from the fused Flow pipeline
in one device call, scores in one encoder call, and search either on device
(CTC fast path) or via the host beam search.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable, List, Optional, Sequence

import numpy as np

from ..bliss.corpus import CorpusDescription, Segment
from ..bliss.evaluation import Evaluator
from ..bliss.lexicon import Lexicon
from ..nn.label_scorer import EncoderOnlyLabelScorer
from ..search.ctc_decode import ctc_prefix_beam
from ..search.lexiconfree_timesync import LexiconfreeTimesyncBeamSearch


@dataclass
class RecognitionResult:
    segment_name: str
    labels: List[int]
    orth: str
    score: float
    duration: float       # audio seconds
    elapsed: float        # wall seconds
    reference_orth: str = ""

    @property
    def rtf(self) -> float:
        return self.elapsed / self.duration if self.duration else 0.0


class OfflineRecognizer:
    """Feature extractor + search over corpus segments.

    feature_fn: samples (N,) -> features (T, D)
    search: a SearchAlgorithmV2-style object (enter_segment/put_features/
            finish_segment/get_current_best_labels)
    """

    def __init__(self, feature_fn: Callable, search, lexicon: Lexicon,
                 audio_reader: Optional[Callable] = None,
                 evaluator: Optional[Evaluator] = None):
        self.feature_fn = feature_fn
        self.search = search
        self.lexicon = lexicon
        self.audio_reader = audio_reader
        self.evaluator = evaluator
        self.results: List[RecognitionResult] = []

    def labels_to_orth(self, labels: Sequence[int]) -> str:
        words = []
        for l in labels:
            lemma = self.lexicon.lemmas[l] if 0 <= l < len(self.lexicon.lemmas) else None
            if lemma is None or lemma.special:
                continue
            toks = lemma.evaluation_tokens
            if toks and toks[0]:
                words.extend(toks[0])
        return " ".join(words)

    def recognize_samples(self, samples: np.ndarray, name: str = "",
                          reference_orth: str = "",
                          sample_rate: float = 16000.0) -> RecognitionResult:
        t0 = time.perf_counter()
        feats = np.asarray(self.feature_fn(samples))
        self.search.enter_segment()
        self.search.put_features(feats)
        self.search.finish_segment()
        labels = self.search.get_current_best_labels()
        elapsed = time.perf_counter() - t0
        orth = self.labels_to_orth(labels)
        result = RecognitionResult(
            segment_name=name, labels=list(labels), orth=orth,
            score=getattr(self.search.best(), "score", 0.0),
            duration=len(samples) / sample_rate, elapsed=elapsed,
            reference_orth=reference_orth)
        self.results.append(result)
        if self.evaluator is not None and reference_orth:
            self.evaluator.evaluate(reference_orth, orth)
        return result

    def recognize_corpus(self, corpus: CorpusDescription) -> List[RecognitionResult]:
        if self.audio_reader is None:
            raise ValueError("corpus recognition needs an audio_reader")
        out = []
        for seg in corpus.segments():
            samples, sr = self.audio_reader(seg)
            out.append(self.recognize_samples(
                samples, name=seg.full_name, reference_orth=seg.orth,
                sample_rate=sr))
        return out
