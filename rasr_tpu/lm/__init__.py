"""Lm layer: language models (reference: src/Lm)."""

from .arpa import (ArpaLm, CombineLm, LanguageModel, ScaledLanguageModel,
                   Zerogram, SENTENCE_BEGIN, SENTENCE_END, UNKNOWN)
from .class_lm import ClassArpaLm, ClassMapping
from .cheating import CheatingSegmentLm, SimpleHistoryLm
from .fsa_lm import INVALID_STATE, FsaLm
from .reverse_arpa import reverse_arpa, reverse_arpa_file, write_arpa

__all__ = ["ArpaLm", "CombineLm", "LanguageModel", "ScaledLanguageModel",
           "Zerogram", "SENTENCE_BEGIN", "SENTENCE_END", "UNKNOWN",
           "ClassArpaLm", "ClassMapping", "FsaLm", "INVALID_STATE",
           "CheatingSegmentLm", "SimpleHistoryLm", "reverse_arpa",
           "reverse_arpa_file", "write_arpa"]
