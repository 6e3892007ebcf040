"""Tree label-synchronous beam search (lexicon-constrained, AED family).

Re-creates the reference TreeLabelsyncBeamSearch (the 4th search_v2
algorithm, src/Search/TreeLabelsyncBeamSearch): hypotheses advance one
output label per step, constrained to paths through the lexical prefix
tree; word ends apply a word-level LM; search ends on the sentence-end
label (scored at word boundaries only) or max length.

Scoring conditions on the label history (attention decoder / CTC-prefix
scorer); one batched score call per step covers the beam.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field, replace
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from ..bliss.lexicon import Lexicon
from ..lm.arpa import LanguageModel
from .tree_timesync import PrefixTree


@dataclass
class TreeLabelsyncHypothesis:
    node: int
    labels: Tuple[int, ...] = ()
    words: Tuple[int, ...] = ()
    lm_history: tuple = ()
    score: float = 0.0
    finished: bool = False

    def normalized(self, scale: float) -> float:
        if scale <= 0:
            return self.score
        return self.score / max(len(self.labels) + 1, 1) ** scale


class TreeLabelsyncBeamSearch:
    """score_fn(histories (B, L) int32 with BOS) -> (B, V) -log p(next)."""

    def __init__(self, score_fn: Callable[[np.ndarray], np.ndarray],
                 lexicon: Lexicon,
                 lm: Optional[LanguageModel] = None,
                 lm_scale: float = 1.0,
                 sentence_end_index: int = 0,
                 bos_index: Optional[int] = None,
                 beam_size: int = 8,
                 word_end_beam_size: Optional[int] = None,
                 max_labels: int = 200,
                 length_norm_scale: float = 1.0,
                 token_of_phoneme=None):
        self.score_fn = score_fn
        self.lexicon = lexicon
        self.tree = PrefixTree(lexicon, token_of_phoneme=token_of_phoneme)
        self.lm = lm
        self.lm_scale = lm_scale
        self.eos = sentence_end_index
        self.bos = bos_index if bos_index is not None else sentence_end_index
        self.beam_size = beam_size
        self.word_end_beam = word_end_beam_size or beam_size
        self.max_labels = max_labels
        self.length_norm_scale = length_norm_scale
        self._orth = {l.id: l.preferred_orth for l in lexicon.lemmas}
        self.enter_segment()

    def enter_segment(self) -> None:
        h0 = TreeLabelsyncHypothesis(
            node=self.tree.root,
            lm_history=self.lm.initial_history() if self.lm else ())
        self._beam: List[TreeLabelsyncHypothesis] = [h0]

    # -- SearchAlgorithmV2 segment api (recognizer/librasr drivers) -----------

    def put_features(self, features: np.ndarray) -> None:
        feats = np.asarray(features, dtype=np.float32)
        # config-built scorers (nn.scorer_factory.AedPrefixScorer) run
        # their encoder once per segment from here
        if hasattr(self.score_fn, "set_features"):
            self.score_fn.set_features(feats)

    def finish_segment(self) -> None:
        self.decode_all()

    def _lm_score(self, history, lemma_id) -> Tuple[float, tuple]:
        if self.lm is None:
            return 0.0, history
        lemma = self.lexicon.lemmas[lemma_id]
        score, h = 0.0, history
        for tok in lemma.syntactic_tokens:
            score += self.lm_scale * self.lm.score(h, tok)
            h = self.lm.extended_history(h, tok)
        return score, h

    def decode_step(self) -> bool:
        active = [h for h in self._beam if not h.finished]
        if not active or all(len(h.labels) >= self.max_labels for h in active):
            return False
        L = max(len(h.labels) for h in active) + 1
        batch = np.full((len(active), L), self.bos, dtype=np.int32)
        for i, h in enumerate(active):
            batch[i, 1:1 + len(h.labels)] = h.labels
        scores = np.asarray(self.score_fn(batch))

        candidates: List[TreeLabelsyncHypothesis] = [
            h for h in self._beam if h.finished]
        for i, hyp in enumerate(active):
            row = scores[i]
            # sentence end: only legal at word boundaries (tree root)
            if hyp.node == self.tree.root and hyp.words:
                eos_score = hyp.score + float(row[self.eos])
                if self.lm is not None:
                    eos_score += self.lm_scale * self.lm.sentence_end_score(
                        hyp.lm_history)
                candidates.append(replace(hyp, score=eos_score, finished=True))
            # tree-constrained label extensions
            for token, child in self.tree.successors(hyp.node).items():
                new_score = hyp.score + float(row[token])
                advanced = TreeLabelsyncHypothesis(
                    node=child, labels=hyp.labels + (token,),
                    words=hyp.words, lm_history=hyp.lm_history,
                    score=new_score)
                candidates.append(advanced)
                for lemma_id, pron_score in self.tree.word_ends(child):
                    lm_s, nh = self._lm_score(hyp.lm_history, lemma_id)
                    candidates.append(replace(
                        advanced, node=self.tree.root,
                        words=hyp.words + (lemma_id,),
                        lm_history=nh,
                        score=new_score + pron_score + lm_s))

        candidates.sort(key=lambda h: h.normalized(self.length_norm_scale))
        word_end = [h for h in candidates
                    if h.finished or h.node == self.tree.root]
        in_word = [h for h in candidates
                   if not h.finished and h.node != self.tree.root]
        self._beam = sorted(word_end[:self.word_end_beam]
                            + in_word[:self.beam_size],
                            key=lambda h: h.normalized(self.length_norm_scale))
        return any(not h.finished for h in self._beam)

    def decode_all(self) -> None:
        while self.decode_step():
            pass

    def best(self) -> TreeLabelsyncHypothesis:
        finished = [h for h in self._beam if h.finished]
        pool = finished or [h for h in self._beam
                            if h.node == self.tree.root] or self._beam
        return min(pool, key=lambda h: h.normalized(self.length_norm_scale))

    def best_words(self) -> List[str]:
        return [self._orth[w] for w in self.best().words]

    def recognize(self, score_fn_ready: bool = True) -> List[str]:
        self.decode_all()
        return self.best_words()
