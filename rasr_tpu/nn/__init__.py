"""Nn layer: label scorers, trainers, checkpoints (reference: src/Nn)."""

from .ctc_prefix_scorer import CtcPrefixScorer
from .label_scorer import (CombineLabelScorer, EncoderOnlyLabelScorer,
                           LabelScorer, NoOpLabelScorer, PriorLabelScorer,
                           ScaledLabelScorer, ScoringContext,
                           StepScoringContext, TransitionType,
                           create_label_scorer, register_label_scorer_type)

__all__ = [
    "CtcPrefixScorer", "CombineLabelScorer", "EncoderOnlyLabelScorer",
    "LabelScorer", "NoOpLabelScorer", "PriorLabelScorer",
    "ScaledLabelScorer", "ScoringContext", "StepScoringContext",
    "TransitionType", "create_label_scorer", "register_label_scorer_type",
]
from .sequence_training import (SequenceErrorSignal, expectation_posteriors,
                                frame_accuracies, minimum_error_signal,
                                mmi_error_signal, occupancies,
                                povey_arc_accuracies, surrogate_loss)
from .optim import RpropState, rprop
