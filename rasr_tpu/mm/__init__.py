"""Mm layer: Gaussian mixture acoustic models — batched XLA scoring,
estimation, discriminative training, adaptation (reference: src/Mm)."""

from .adaptation import (AdaptationAccumulator, AdaptationTree,
                         TreeMllrEstimator, apply_feature_transform,
                         apply_mllr_mean_transform, estimate_cmllr_transform,
                         estimate_mllr_mean_transform)
from .discriminative import ebw_update
from .estimator import (MixtureAccumulator, MixtureSetEstimator,
                        make_accumulate_fn, psum_accumulator)
from .mixture_set import Mixture, MixtureSet
from .module import create_feature_scorer
from .scorer import CombinedScorer, GmmScorer

__all__ = [
    "Mixture", "MixtureSet", "GmmScorer", "CombinedScorer",
    "create_feature_scorer",
    "MixtureAccumulator", "MixtureSetEstimator", "make_accumulate_fn",
    "psum_accumulator", "ebw_update",
    "AdaptationAccumulator", "apply_feature_transform",
    "apply_mllr_mean_transform", "estimate_cmllr_transform",
    "estimate_mllr_mean_transform",
]
