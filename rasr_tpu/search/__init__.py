"""Search layer: decoders and alignment (reference: src/Search).

Families:
  * ctc_decode            — device-side CTC greedy + prefix beam (fast path)
  * lexiconfree_timesync  — generic time-sync beam over any LabelScorer
  * lexiconfree_labelsync — label-sync beam (AED / CTC-prefix scoring)
  * tree_timesync         — lexical prefix tree + word LM (CTC tree builder)
  * hmm_timesync          — word-conditioned HMM tree search (classic)
  * aligner               — Viterbi / Baum-Welch forced alignment
"""

from .aligner import Aligner, PackedGraph
from .ctc_decode import ctc_greedy, ctc_prefix_beam
from .hmm_timesync import HmmPrefixTree, WordConditionedTreeSearch
from .lexiconfree_labelsync import LexiconfreeLabelsyncBeamSearch
from .lexiconfree_timesync import (Hypothesis, LexiconfreeTimesyncBeamSearch,
                                   TracebackItem)
from .mbr import (MinimumBayesRiskAStarSearch,
                  MinimumBayesRiskNBestListNaiveSearch, nbest_from_fsa)
from .transducer_beam import TransducerBeamSearch
from .tree_labelsync import TreeLabelsyncBeamSearch
from .tree_timesync import LmLookahead, PrefixTree, TreeTimesyncBeamSearch
from .wfst import WfstDecoder, build_decoding_graph

__all__ = [
    "Aligner", "PackedGraph", "ctc_greedy", "ctc_prefix_beam",
    "HmmPrefixTree", "WordConditionedTreeSearch",
    "LexiconfreeLabelsyncBeamSearch", "Hypothesis",
    "LexiconfreeTimesyncBeamSearch", "TracebackItem", "PrefixTree",
    "TreeTimesyncBeamSearch", "TransducerBeamSearch",
    "TreeLabelsyncBeamSearch", "LmLookahead", "WfstDecoder",
    "build_decoding_graph", "MinimumBayesRiskAStarSearch",
    "MinimumBayesRiskNBestListNaiveSearch", "nbest_from_fsa",
]
