"""Lm layer: language models (reference: src/Lm)."""

from .arpa import (ArpaLm, CombineLm, LanguageModel, ScaledLanguageModel,
                   Zerogram, SENTENCE_BEGIN, SENTENCE_END, UNKNOWN)

__all__ = ["ArpaLm", "CombineLm", "LanguageModel", "ScaledLanguageModel",
           "Zerogram", "SENTENCE_BEGIN", "SENTENCE_END", "UNKNOWN"]
