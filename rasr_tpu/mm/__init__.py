"""Mm layer: Gaussian mixture acoustic models — batched XLA scoring and
estimation (reference: src/Mm)."""

from .estimator import (MixtureAccumulator, MixtureSetEstimator,
                        make_accumulate_fn, psum_accumulator)
from .mixture_set import Mixture, MixtureSet
from .scorer import GmmScorer

__all__ = [
    "Mixture", "MixtureSet", "GmmScorer",
    "MixtureAccumulator", "MixtureSetEstimator", "make_accumulate_fn",
    "psum_accumulator",
]
