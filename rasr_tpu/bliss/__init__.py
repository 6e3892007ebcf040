"""Bliss data model: corpus, lexicon, phonemes, evaluation
(reference: src/Bliss)."""

from .corpus import (AcousticCondition, CorpusDescription, CorpusVisitor,
                     Recording, Segment, Speaker, SpeechSegment)
from .evaluation import ErrorCounts, Evaluator, align, grapheme_counts
from .lexicon import (Lemma, LemmaPronunciation, Lexicon, Phoneme,
                      PhonemeInventory, Pronunciation)

__all__ = [
    "AcousticCondition", "CorpusDescription", "CorpusVisitor", "Recording",
    "Segment", "Speaker", "SpeechSegment",
    "ErrorCounts", "Evaluator", "align", "grapheme_counts",
    "Lemma", "LemmaPronunciation", "Lexicon", "Phoneme", "PhonemeInventory",
    "Pronunciation",
]
