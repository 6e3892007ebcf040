"""Lm layer: language models (reference: src/Lm)."""

from .arpa import (ArpaLm, CombineLm, LanguageModel, ScaledLanguageModel,
                   Zerogram, SENTENCE_BEGIN, SENTENCE_END, UNKNOWN)
from .class_lm import ClassArpaLm, ClassMapping
from .fsa_lm import INVALID_STATE, FsaLm

__all__ = ["ArpaLm", "CombineLm", "LanguageModel", "ScaledLanguageModel",
           "Zerogram", "SENTENCE_BEGIN", "SENTENCE_END", "UNKNOWN",
           "ClassArpaLm", "ClassMapping", "FsaLm", "INVALID_STATE"]
