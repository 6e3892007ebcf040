"""acoustic-model-trainer tool.

The reference AcousticModelTrainer exposes ~30 actions (GMM accumulation,
combination, estimation, splitting, alignment, CART accumulation, LDA...;
src/Tools/AcousticModelTrainer/AcousticModelTrainer.cc:101-235).  This tool
provides the core GMM training workflow, TPU-batched:

    --action=accumulate-mixture-set-text-dependent
        corpus + feature cache + lexicon + AM -> Viterbi-align each segment
        on device, accumulate sufficient statistics, write accumulator file
    --action=combine-mixture-set-estimators   (merge N accumulator files)
    --action=estimate-mixture-set             (accumulator -> .pms model)
    --action=split-mixture-set                (density splitting)
    --action=show-mixture-set                 (dump text)

Config selectors follow the reference layout (corpus / lexicon /
acoustic-model / feature cache / mixture-set-trainer).
"""

from __future__ import annotations

import sys
from typing import List, Optional

import numpy as np

from ..am.acoustic_model import AcousticModel
from ..bliss.corpus import CorpusDescription
from ..bliss.lexicon import Lexicon
from ..core.application import Application
from ..core.parameter import ParameterString
from ..mm.estimator import MixtureAccumulator, MixtureSetEstimator
from ..mm.mixture_set import MixtureSet
from ..mm.scorer import GmmScorer
from ..search.aligner import Aligner
from ..speech.allophone_graph import StateGraphBuilder
from ..speech.feature_cache import FeatureCacheReader


class AcousticModelTrainerApp(Application):
    param_action = ParameterString("action", "what to do")

    def __init__(self, argv=None):
        super().__init__("acoustic-model-trainer", argv)

    # -- helpers ------------------------------------------------------------

    def _load_am(self) -> AcousticModel:
        lexicon = Lexicon(self.config.sub("lexicon"))
        return AcousticModel.create(self.config.sub("acoustic-model"), lexicon)

    def _trainer_config(self):
        return self.config.sub("mixture-set-trainer")

    # -- actions ----------------------------------------------------------------

    def action_accumulate(self) -> int:
        am = self._load_am()
        corpus = CorpusDescription(self.config.sub("corpus"))
        cache = FeatureCacheReader(
            self.config.sub("feature-cache").get("path")
            or self._trainer_config().get("feature-cache"))
        builder = StateGraphBuilder(am)
        tc = self._trainer_config()
        old_model = tc.get("old-mixture-set-file")
        n_classes = am.state_tying.n_classes
        first_feats = None
        segments = list(corpus.segments())
        if not segments:
            self.warning("no segments to process")
        # determine dim from the first cached segment
        dim = None
        for seg in segments:
            try:
                dim = cache.features(seg.full_name).shape[1]
                break
            except KeyError:
                continue
        if dim is None:
            raise ValueError("no cached features found for corpus segments")

        flat_start = not old_model
        if old_model:
            mixture_set = MixtureSet.read_pms(old_model)
        else:
            # flat start: one Gaussian per emission class; first pass uses
            # linear segmentation (scores are uninformative)
            mixture_set = MixtureSet.single_gaussian(
                np.zeros((n_classes, dim)), np.ones((n_classes, dim)))
        scorer = GmmScorer(mixture_set)
        est = MixtureSetEstimator.for_mixture_set(mixture_set)
        # packed-density emission -> packed density index of best density:
        # with single-density mixtures the emission index IS the density idx
        n_aligned = 0
        soft = (tc.get("accumulation") or "viterbi") == "baum-welch"
        for seg in segments:
            try:
                feats, _, _ = cache.read(seg.full_name)
            except KeyError:
                self.warning("segment %s has no cached features", seg.full_name)
                continue
            graph = builder.build(seg.orth)
            aligner = Aligner(graph)
            if flat_start:
                em_path = aligner.linear_alignment(len(feats))
                dens_path = scorer.assign_densities(feats, em_path)
                est.accumulate_segment(feats, dens_path.astype(np.int32))
            elif soft:
                # Baum-Welch: state posteriors weight every (frame, state)
                # pair; frames accumulate fractionally into all states
                # (reference accumulate with weights / full-sum EM)
                scores = np.asarray(scorer.score(feats))
                gamma, _ = aligner.posteriors(scores)      # (T, N)
                emissions = np.asarray(graph.emissions)
                T, N = gamma.shape
                # flatten (frame, state) pairs above a mass floor
                keep = gamma > 1e-4
                t_idx, s_idx = np.nonzero(keep)
                em_states = emissions[s_idx]
                dens = scorer.assign_densities(feats[t_idx],
                                               em_states.astype(np.int32))
                est.accumulate_segment(feats[t_idx], dens.astype(np.int32),
                                       weights=gamma[t_idx, s_idx])
            else:
                scores = np.asarray(scorer.score(feats))
                em_path = aligner.emission_path(scores)
                dens_path = scorer.assign_densities(feats, em_path)
                est.accumulate_segment(feats, dens_path.astype(np.int32))
            n_aligned += 1
        out = tc.get("new-accumulator-file") or "am.acc"
        est.acc.write(out)
        self.log("accumulated %d segments -> %s", n_aligned, out)
        return 0

    def action_combine(self) -> int:
        tc = self._trainer_config()
        files = (tc.get("accumulator-files") or "").split()
        if not files:
            raise ValueError("no accumulator-files configured")
        acc = MixtureAccumulator.read(files[0])
        for f in files[1:]:
            acc = acc.combine(MixtureAccumulator.read(f))
        out = tc.get("new-accumulator-file") or "combined.acc"
        acc.write(out)
        self.log("combined %d accumulators -> %s", len(files), out)
        return 0

    def action_estimate(self) -> int:
        tc = self._trainer_config()
        acc = MixtureAccumulator.read(tc.get("accumulator-file") or "am.acc")
        est = MixtureSetEstimator(acc.dim, acc.mixture_of,
                                  minimum_observation_weight=float(
                                      tc.get("minimum-observation-weight") or 1.0))
        est.acc = acc
        ms = est.estimate()
        out = tc.get("new-mixture-set-file") or "am.pms"
        ms.write_pms(out)
        self.log("estimated mixture set: %d mixtures, %d densities -> %s",
                 ms.n_mixtures, ms.n_densities, out)
        return 0

    def action_split(self) -> int:
        tc = self._trainer_config()
        acc = MixtureAccumulator.read(tc.get("accumulator-file") or "am.acc")
        est = MixtureSetEstimator(acc.dim, acc.mixture_of)
        est.acc = acc
        est2 = est.split()
        out = tc.get("new-accumulator-file") or "split.acc"
        est2.acc.write(out)
        self.log("split %d -> %d densities -> %s", acc.n_densities,
                 est2.acc.n_densities, out)
        return 0

    def action_show(self) -> int:
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        print(f"# dim={ms.dim} mixtures={ms.n_mixtures} "
              f"densities={ms.n_densities}")
        for i, mix in enumerate(ms.mixtures):
            print(f"mixture {i}: densities={mix.density_indices} "
                  f"logw={['%.3f' % w for w in mix.log_weights]}")
        return 0

    def action_align(self) -> int:
        """Viterbi-align the corpus and write an alignment cache
        (reference AligningFeatureExtractor / dump-alignment)."""
        am = self._load_am()
        corpus = CorpusDescription(self.config.sub("corpus"))
        cache = FeatureCacheReader(
            self.config.sub("feature-cache").get("path"))
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        scorer = GmmScorer(ms)
        builder = StateGraphBuilder(am)
        out_path = tc.get("alignment-cache") or "alignment.cache"
        from ..speech.alignment import Alignment, AlignmentCacheWriter
        n = 0
        with AlignmentCacheWriter(out_path) as out:
            for seg in corpus.segments():
                try:
                    feats, _, _ = cache.read(seg.full_name)
                except KeyError:
                    continue
                graph = builder.build(seg.orth)
                aligner = Aligner(graph)
                scores = np.asarray(scorer.score(feats))
                _, labels, _ = aligner.align(scores)
                out.write(seg.full_name, Alignment.from_viterbi(labels))
                n += 1
        self.log("aligned %d segments -> %s", n, out_path)
        return 0

    def action_accumulate_cart(self) -> int:
        """Accumulate CART examples: per (central, left, right, hmm-state)
        context, Gaussian sufficient statistics of the aligned frames
        (reference cart accumulation, AcousticModelTrainer cart actions +
        src/Cart/Example.hh)."""
        import pickle
        am = self._load_am()
        corpus = CorpusDescription(self.config.sub("corpus"))
        cache = FeatureCacheReader(self.config.sub("feature-cache").get("path"))
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        scorer = GmmScorer(ms)
        builder = StateGraphBuilder(am)
        inv = am.lexicon.phoneme_inventory

        stats: dict = {}
        n = 0
        for seg in corpus.segments():
            try:
                feats, _, _ = cache.read(seg.full_name)
            except KeyError:
                continue
            graph = builder.build(seg.orth)
            aligner = Aligner(graph)
            scores = np.asarray(scorer.score(feats))
            _, labels, _ = aligner.align(scores)
            for t, sid in enumerate(labels):
                allo_idx, state = am.alphabet.split_state_id(int(sid))
                allo = am.alphabet.allophone(allo_idx)
                def sym(pid):
                    return inv.by_id(pid).symbol if pid else "#"
                key = (sym(allo.central), sym(allo.left), sym(allo.right),
                       state)
                entry = stats.get(key)
                x = feats[t].astype(np.float64)
                if entry is None:
                    stats[key] = [1.0, x.copy(), x * x]
                else:
                    entry[0] += 1.0
                    entry[1] += x
                    entry[2] += x * x
            n += 1
        out = tc.get("cart-example-file") or "cart.examples"
        with open(out, "wb") as fh:
            pickle.dump(stats, fh)
        self.log("accumulated CART examples from %d segments "
                 "(%d contexts) -> %s", n, len(stats), out)
        return 0

    def action_estimate_cart(self) -> int:
        """Train the phonetic decision tree from accumulated examples and
        write the XML tree for CART state tying."""
        import pickle
        from ..cart.decision_tree import (DecisionTreeTrainer, Example,
                                          Question)
        tc = self._trainer_config()
        with open(tc.get("cart-example-file") or "cart.examples", "rb") as fh:
            stats = pickle.load(fh)
        examples = [Example(
            properties={"central": c, "history[0]": l, "future[0]": r,
                        "state": s},
            count=v[0], sum_x=v[1], sum_x2=v[2])
            for (c, l, r, s), v in stats.items()]
        # auto questions: singleton phoneme sets per position + state splits
        phonemes = sorted({p for ex in examples
                           for p in (ex.properties["central"],
                                     ex.properties["history[0]"],
                                     ex.properties["future[0]"])})
        questions = []
        for key in ("central", "history[0]", "future[0]"):
            for p in phonemes:
                questions.append(Question(key, values={p}))
        max_state = max(ex.properties["state"] for ex in examples)
        for s in range(max_state + 1):
            questions.append(Question("state", min_value=s, max_value=s))
        trainer = DecisionTreeTrainer(
            questions,
            min_examples=float(tc.get("cart-minimum-examples") or 100.0),
            max_leaves=int(tc.get("cart-maximum-leaves") or 1000))
        tree = trainer.train(examples)
        out = tc.get("cart-file") or "cart.tree.xml"
        tree.write_xml(out)
        self.log("CART: %d contexts -> %d tied classes -> %s",
                 len(examples), tree.n_classes, out)
        return 0

    def run(self) -> int:
        action = self.param_action(self.config)
        dispatch = {
            "accumulate-mixture-set-text-dependent": self.action_accumulate,
            "combine-mixture-set-estimators": self.action_combine,
            "estimate-mixture-set": self.action_estimate,
            "split-mixture-set": self.action_split,
            "show-mixture-set": self.action_show,
            "dump-alignment": self.action_align,
            "accumulate-cart-examples": self.action_accumulate_cart,
            "estimate-cart": self.action_estimate_cart,
        }
        if action not in dispatch:
            raise ValueError(f"unknown action {action!r}; "
                             f"known: {sorted(dispatch)}")
        return dispatch[action]()


def main(argv=None) -> int:
    return AcousticModelTrainerApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
