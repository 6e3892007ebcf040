"""librasr-compatible Python API.

Mirrors the reference pybind11 `librasr` module surface
(src/Tools/LibRASR/PybindModule.cc:17-53, Search.cc:118-186,
LabelScorer.cc:72-92, Lexicon.cc:24-39; python usage doc SURVEY.md §3.5):

    import rasr_tpu.api as librasr
    cfg = librasr.Configuration(); cfg.set_from_file("decode.config")
    algo = librasr.SearchAlgorithm(cfg)
    algo.enter_segment()
    algo.put_features(feature_matrix)
    algo.finish_segment()
    best = algo.get_current_best_traceback()
    text = algo.recognize_segment(feature_matrix)

plus `register_label_scorer_type` for user-defined scorers and the
TransitionType enum.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np

from .bliss.lexicon import Lexicon
from .core.configuration import Configuration
from .lm.arpa import ArpaLm, LanguageModel, ScaledLanguageModel, Zerogram
from .nn.label_scorer import (LabelScorer, TransitionType,
                              create_label_scorer, register_label_scorer_type)
from .search.lexiconfree_timesync import (LexiconfreeTimesyncBeamSearch,
                                          TracebackItem)
from .search.tree_timesync import TreeTimesyncBeamSearch

__all__ = [
    "AllophoneStateFsaBuilder", "Configuration", "Lexicon",
    "ModelCombination", "SearchAlgorithm", "TracebackItem", "TransitionType",
    "create_label_scorer", "register_label_scorer_type",
]


class AllophoneStateFsaBuilder:
    """Builds allophone-state graphs for full-sum/CTC training from
    orthographies (reference librasr AllophoneStateFsaBuilder,
    src/Tools/LibRASR/PybindModule.cc:49-53,
    src/Python/AllophoneStateFsaBuilder.cc)."""

    def __init__(self, config: Configuration):
        from .am.acoustic_model import AcousticModel
        from .speech.allophone_graph import StateGraphBuilder
        lexicon = Lexicon()
        lexicon.load(config.sub("lexicon").get("file"))
        am = AcousticModel.create(config.sub("acoustic-model"), lexicon)
        self._builder = StateGraphBuilder(am)

    def build_by_orthography(self, orth: str):
        """Returns (edges (4, E) [from, to, emission, -1], weights (E,),
        n_states) matching the reference's flat FSA export layout."""
        import numpy as np
        g = self._builder.build(orth)
        em_of_target = g.emissions[g.arcs_to]
        edges = np.stack([g.arcs_from, g.arcs_to, em_of_target,
                          np.full_like(g.arcs_from, -1)])
        return edges, g.arcs_score, g.n_states

    def build_graph(self, orth: str):
        """The full StateGraph (for the aligner / full-sum posteriors)."""
        return self._builder.build(orth)


@dataclass
class ModelCombination:
    """lexicon + label scorer + LM bundle with scales
    (reference Speech::ModelCombination, src/Speech/ModelCombination.hh:43)."""
    lexicon: Optional[Lexicon] = None
    label_scorer: Optional[LabelScorer] = None
    language_model: Optional[ScaledLanguageModel] = None

    @classmethod
    def create(cls, config: Configuration,
               label_scorer: Optional[LabelScorer] = None) -> "ModelCombination":
        lex_file = config.sub("lexicon").get("file")
        lexicon = None
        if lex_file:
            lexicon = Lexicon()
            lexicon.load(lex_file)
        lm_cfg = config.sub("lm")
        lm: Optional[ScaledLanguageModel] = None
        lm_type = lm_cfg.get("type")
        if not lm_type and lm_cfg.get("file"):
            lm_type = "ARPA"  # file given: default type (reference Module.cc)
        if lm_type:
            scale = float(lm_cfg.get("scale") or 1.0)
            if lm_type in ("ARPA", "arpa"):
                lm = ScaledLanguageModel(ArpaLm(lm_cfg.get("file")), scale)
            elif lm_type == "zerogram":
                vocab = [l.preferred_orth for l in lexicon.lemmas] if lexicon else []
                lm = ScaledLanguageModel(Zerogram(vocab), scale)
            elif lm_type == "class":
                from .lm import ClassArpaLm
                lm = ScaledLanguageModel(ClassArpaLm.load(
                    lm_cfg.get("file"), lm_cfg.get("classes")), scale)
            elif lm_type in ("neural-lstm", "tfrnn", "simple-recurrent"):
                # word-level recurrent LM, usable anywhere a LanguageModel
                # goes (reference src/Lm/Module.cc:66-73 lmTfrnn)
                from .lm.neural import NeuralLanguageModel
                lm = ScaledLanguageModel(NeuralLanguageModel.load(
                    lm_cfg.get("file"), lm_cfg.get("info"),
                    state_compression=lm_cfg.get("state-compression")
                    or None,
                    max_batch=int(lm_cfg.get("max-batch-size") or 64)),
                    scale)
            else:
                raise ValueError(f"unsupported lm type {lm_type!r}")
        if label_scorer is None and config.sub("label-scorer").get("type"):
            from .nn.scorer_factory import label_scorer_from_config
            label_scorer = label_scorer_from_config(config)
        return cls(lexicon=lexicon, label_scorer=label_scorer,
                   language_model=lm)


class SearchAlgorithm:
    """SearchAlgorithmV2 facade (reference librasr.SearchAlgorithm,
    src/Tools/LibRASR/Search.cc:118-186; impl src/Python/Search.hh:41)."""

    def __init__(self, config: Configuration,
                 label_scorer: Optional[LabelScorer] = None):
        self.config = config
        self.model_combination = ModelCombination.create(config, label_scorer)
        from .search.module import create_search_algorithm
        self._search = create_search_algorithm(config,
                                               self.model_combination)

    @property
    def statistics(self):
        """Search-space statistics of the underlying decoder (or None)."""
        return getattr(self._search, "statistics", None)

    def create_lattice(self):
        """Current word lattice (searches that produce one)."""
        if hasattr(self._search, "create_lattice"):
            return self._search.create_lattice()
        raise NotImplementedError(
            f"{type(self._search).__name__} produces no word lattice")

    # -- segment api -----------------------------------------------------------

    def enter_segment(self) -> None:
        self._search.enter_segment()

    def finish_segment(self) -> None:
        self._search.finish_segment()

    def put_feature(self, feature: np.ndarray) -> None:
        self._search.put_feature(np.asarray(feature))

    def put_features(self, features: np.ndarray) -> None:
        self._search.put_features(np.asarray(features))

    def decode_more(self) -> bool:
        return self._search.decode_many_steps() > 0

    # -- results -----------------------------------------------------------------

    def get_current_best_traceback(self) -> List[TracebackItem]:
        return self._search.get_current_best_traceback()

    def get_current_n_best_list(self, n: int):
        return self._search.n_best(n)

    def get_common_prefix(self) -> List[TracebackItem]:
        """Stable (beam-agreed) prefix mid-stream
        (SearchAlgorithmV2::getCommonPrefix, doc/search_v2.rst)."""
        if hasattr(self._search, "get_common_prefix"):
            return self._search.get_common_prefix()
        return self._search.get_current_best_traceback()

    def _labels_to_string(self, labels: Sequence[int]) -> str:
        lex = self.model_combination.lexicon
        if hasattr(self._search, "get_current_best_words"):
            return " ".join(self._search.get_current_best_words())
        if lex is None:
            return " ".join(str(l) for l in labels)
        words = []
        for l in labels:
            if 0 <= l < len(lex.lemmas) and not lex.lemmas[l].special:
                words.append(lex.lemmas[l].preferred_orth)
        return " ".join(words)

    def recognize_segment(self, features: np.ndarray) -> str:
        """Convenience one-shot recognition (Search.cc:173)."""
        self.enter_segment()
        self.put_features(np.asarray(features))
        self.finish_segment()
        return self._labels_to_string(self._search.get_current_best_labels())

    def recognize_segment_n_best(self, features: np.ndarray, n: int):
        self.enter_segment()
        self.put_features(np.asarray(features))
        self.finish_segment()
        out = []
        for h in self._search.n_best(n):
            labels = getattr(h, "labels", None)
            if labels is None and hasattr(h, "trace"):
                labels = self._search.arena.words(h.trace)
            out.append((self._labels_to_string(labels or ()), h.score))
        return out
