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
                                          phonetic_questions)
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
        max_state = max(ex.properties["state"] for ex in examples)
        questions = phonetic_questions(phonemes, n_states=max_state + 1)
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

    # -- aligned-frame iteration (shared by the scatter/adaptation/scoring
    # actions; reference AlignedFeatureProcessor sign-on) -----------------------

    def _aligned_frames(self, am=None, scorer=None):
        """Yield (segment, feats (T,D), emission classes (T,)) over the
        corpus: from the configured alignment cache when present, else by
        Viterbi alignment against the current mixture set."""
        am = am or self._load_am()
        corpus = CorpusDescription(self.config.sub("corpus"))
        cache = FeatureCacheReader(
            self.config.sub("feature-cache").get("path")
            or self._trainer_config().get("feature-cache"))
        tc = self._trainer_config()
        align_path = tc.get("alignment-cache")
        reader = None
        builder = None
        if align_path:
            from ..speech.alignment import AlignmentCacheReader
            reader = AlignmentCacheReader(align_path)
        else:
            if scorer is None:
                ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
                scorer = GmmScorer(ms)
            builder = StateGraphBuilder(am)
        # iterative SAT: an existing per-corpus-key transform set applied
        # to the features BEFORE alignment/accumulation (reference
        # AdaptedAcousticModel in training, src/Am/AdaptedAcousticModel
        # .hh:31) — a second CMLLR round then aligns with adapted
        # features instead of the raw distorted ones
        in_transforms = None
        in_path = self.config.sub("adaptation").get(
            "affine-transform-file")
        if in_path:
            from ..mm.adaptation import apply_feature_transform
            z = np.load(in_path)
            in_transforms = {k: z[k] for k in z.files}
            self.log("adaptation input: %d corpus-key transforms from %s",
                     len(in_transforms), in_path)
        for seg in corpus.segments():
            try:
                feats, _, _ = cache.read(seg.full_name)
            except KeyError:
                continue
            if in_transforms is not None:
                from ..mm.adaptation import apply_feature_transform
                w = in_transforms.get(self._corpus_key(seg))
                if w is not None:
                    feats = apply_feature_transform(
                        np.asarray(feats), w).astype(np.float32)
            if reader is not None:
                try:
                    ali = reader.read(seg.full_name)
                except KeyError:
                    continue
                # packed allophone-state ids index the WRITER's alphabet;
                # rebuild the segment's graph to recover the deterministic
                # label -> emission-class mapping in this process
                if builder is None:
                    builder = StateGraphBuilder(am)
                graph = builder.build(seg.orth)
                label_em = {int(l): int(e)
                            for l, e in zip(graph.labels, graph.emissions)}
                em = np.full(len(feats), -1, np.int64)
                for f, sid in zip(ali.frames, ali.state_ids):
                    cls = label_em.get(int(sid), -1)
                    if int(f) < len(feats):
                        em[int(f)] = cls
                keep = em >= 0
                yield seg, feats[keep], em[keep]
            else:
                graph = builder.build(seg.orth)
                aligner = Aligner(graph)
                scores = np.asarray(scorer.score(feats))
                em = aligner.emission_path(scores)
                yield seg, feats, np.asarray(em, np.int64)

    def _corpus_key(self, seg) -> str:
        """Grouping key for per-speaker estimation (reference
        Bliss::CorpusKey) — shared with the recognizer's transform
        lookup."""
        from ..bliss.corpus import corpus_key
        return corpus_key(seg)

    # -- score-features (reference src/Speech/FeatureScorer.cc) ---------------

    def action_score_features(self) -> int:
        """Average aligned emission score per segment and corpus key."""
        am = self._load_am()
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        scorer = GmmScorer(ms)
        per_key: dict = {}
        total = np.zeros(2)  # weighted sum, weight
        for seg, feats, em in self._aligned_frames(am, scorer):
            scores = np.asarray(scorer.score(feats))
            vals = scores[np.arange(len(em)), em]
            acc = per_key.setdefault(self._corpus_key(seg), np.zeros(2))
            acc += (vals.sum(), len(vals))
            total += (vals.sum(), len(vals))
            self.log("segment %s: average score %.6f", seg.full_name,
                     float(vals.mean()) if len(vals) else 0.0)
        out = tc.get("score-file")
        if out:
            with open(out, "w") as fh:
                for k, acc in sorted(per_key.items()):
                    fh.write(f"{k}\t{acc[0] / max(acc[1], 1):.10g}"
                             f"\t{acc[1]:.0f}\n")
        self.log("corpus average score %.6f over %d frames",
                 total[0] / max(total[1], 1), int(total[1]))
        return 0

    # -- scatter matrices / LDA (reference ScatterMatricesEstimator.cc) -------

    def _accumulate_scatter(self, text_dependent: bool):
        from ..speech.lda import ScatterAccumulator
        am = self._load_am()
        acc = None
        for _seg, feats, em in self._aligned_frames(am):
            labels = em if text_dependent else np.zeros(len(feats),
                                                        np.int64)
            if acc is None:
                n_cls = am.state_tying.n_classes if text_dependent else 1
                acc = ScatterAccumulator.zeros(feats.shape[1], n_cls)
            acc.accumulate(feats, labels)
        if acc is None:
            raise ValueError("no aligned features accumulated")
        return acc

    def action_estimate_scatter(self, text_dependent=True) -> int:
        tc = self._trainer_config()
        acc = self._accumulate_scatter(text_dependent)
        out = tc.get("scatter-matrix-accumulator-file") or "scatter.acc"
        acc.write(out)
        self.log("scatter accumulator (%d classes, dim %d) -> %s",
                 acc.n_classes, acc.dim, out)
        return 0

    def action_combine_scatter(self) -> int:
        from ..speech.lda import ScatterAccumulator
        tc = self._trainer_config()
        files = (tc.get("scatter-matrix-accumulator-files") or "").split()
        if not files:
            raise ValueError("no scatter-matrix-accumulator-files")
        acc = ScatterAccumulator.read(files[0])
        for f in files[1:]:
            acc = acc.combine(ScatterAccumulator.read(f))
        out = tc.get("scatter-matrix-accumulator-file") or "scatter.acc"
        acc.write(out)
        self.log("combined %d scatter accumulators -> %s", len(files), out)
        return 0

    def action_scatter_from_accumulator(self) -> int:
        from ..math.matrix_io import write_matrix
        from ..speech.lda import ScatterAccumulator
        tc = self._trainer_config()
        acc = ScatterAccumulator.read(
            tc.get("scatter-matrix-accumulator-file") or "scatter.acc")
        sw, sb = acc.scatter_matrices()
        w_out = tc.get("within-class-scatter-matrix-file") or "sw.xml"
        b_out = tc.get("between-class-scatter-matrix-file") or "sb.xml"
        write_matrix(w_out, sw)
        write_matrix(b_out, sb)
        self.log("scatter matrices -> %s / %s", w_out, b_out)
        return 0

    def action_estimate_lda(self, accumulate: Optional[bool] = None,
                            text_dependent: bool = True) -> int:
        from ..math.matrix_io import write_matrix
        from ..speech.lda import ScatterAccumulator, estimate_lda
        tc = self._trainer_config()
        if accumulate:
            acc = self._accumulate_scatter(text_dependent)
        else:
            acc = ScatterAccumulator.read(
                tc.get("scatter-matrix-accumulator-file") or "scatter.acc")
        n_out = int(tc.get("number-of-outputs") or min(acc.dim, 32))
        proj = estimate_lda(acc, n_out)
        out = tc.get("projector-matrix-file") or "lda.matrix"
        write_matrix(out, proj)
        self.log("LDA %dx%d -> %s", proj.shape[0], proj.shape[1], out)
        return 0

    # -- CMLLR / MLLR (reference AffineFeatureTransformEstimator.cc,
    # ModelTransformEstimator.cc; estimate-* accumulates statistics,
    # calculate-* solves the transform) ---------------------------------------

    def _accumulate_adaptation(self, scatter: bool = False):
        from ..mm.adaptation import AdaptationAccumulator
        am = self._load_am()
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        scorer = GmmScorer(ms)
        per_key: dict = {}
        for seg, feats, em in self._aligned_frames(am, scorer):
            dens = scorer.assign_densities(feats, em.astype(np.int32))
            key = self._corpus_key(seg)
            acc = per_key.get(key)
            if acc is None:
                acc = per_key[key] = AdaptationAccumulator.zeros(
                    feats.shape[1], ms.n_densities)
            acc.accumulate(feats, np.asarray(dens, np.int64))
            if scatter:
                acc.accumulate_scatter(feats, np.asarray(dens, np.int64))
        return ms, per_key

    @staticmethod
    def _write_adaptation_accumulators(path: str, per_key: dict) -> None:
        arrays = {}
        for k, acc in per_key.items():
            arrays[f"{k}::gamma"] = acc.gamma
            arrays[f"{k}::sum_x"] = acc.sum_x
            arrays[f"{k}::sum_x2"] = acc.sum_x2
            if acc.sum_xx is not None:
                arrays[f"{k}::sum_xx"] = acc.sum_xx
        np.savez_compressed(path, **arrays)

    @staticmethod
    def _read_adaptation_accumulators(path: str) -> dict:
        from ..mm.adaptation import AdaptationAccumulator
        z = np.load(path)
        per_key: dict = {}
        for name in z.files:
            key, field = name.rsplit("::", 1)
            acc = per_key.get(key)
            if acc is None:
                acc = per_key[key] = AdaptationAccumulator.__new__(
                    AdaptationAccumulator)
            setattr(acc, field, z[name])
        for acc in per_key.values():
            acc.n_densities, acc.dim = acc.sum_x.shape
            acc.G = None
            if not hasattr(acc, "sum_xx"):
                acc.sum_xx = None
        return per_key

    def action_estimate_affine_transform(self) -> int:
        tc = self._trainer_config()
        # full scatter: exact G_d second moments let CMLLR recover
        # rotational channels, not just near-diagonal ones
        _ms, per_key = self._accumulate_adaptation(scatter=True)
        out = tc.get("affine-transform-accumulator-file") or "cmllr.acc.npz"
        self._write_adaptation_accumulators(out, per_key)
        self.log("CMLLR statistics for %d keys -> %s", len(per_key), out)
        return 0

    def action_combine_affine_transform(self) -> int:
        tc = self._trainer_config()
        files = (tc.get("affine-transform-accumulator-files") or "").split()
        if not files:
            raise ValueError("no affine-transform-accumulator-files")
        merged: dict = {}
        for f in files:
            for k, acc in self._read_adaptation_accumulators(f).items():
                if k in merged:
                    m = merged[k]
                    m.gamma = m.gamma + acc.gamma
                    m.sum_x = m.sum_x + acc.sum_x
                    m.sum_x2 = m.sum_x2 + acc.sum_x2
                    # full scatter (estimate-affine-transform writes it);
                    # merging only the diagonal stats would silently
                    # corrupt the exact-moment CMLLR solve.  If one side
                    # lacks scatter, the merged exact moments would be
                    # inconsistent with gamma — drop to the diagonal
                    # approximation instead.
                    if m.sum_xx is not None and acc.sum_xx is not None:
                        m.sum_xx = m.sum_xx + acc.sum_xx
                    elif m.sum_xx is not None or acc.sum_xx is not None:
                        self.warning(
                            "key %s: scatter present in only one "
                            "accumulator; falling back to diagonal "
                            "second moments", k)
                        m.sum_xx = None
                else:
                    merged[k] = acc
        out = tc.get("affine-transform-accumulator-file") or "cmllr.acc.npz"
        self._write_adaptation_accumulators(out, merged)
        self.log("combined %d estimator files (%d keys) -> %s",
                 len(files), len(merged), out)
        return 0

    def action_calculate_affine_transform(self) -> int:
        from ..mm.adaptation import estimate_cmllr_transform
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        per_key = self._read_adaptation_accumulators(
            tc.get("affine-transform-accumulator-file") or "cmllr.acc.npz")
        # iterative SAT: when the statistics were accumulated over
        # ALREADY-ADAPTED features ([*.adaptation] affine-transform-file),
        # compose the new round onto the prior transform so the written
        # set always maps RAW features
        in_path = self.config.sub("adaptation").get(
            "affine-transform-file")
        prior = {}
        if in_path:
            z = np.load(in_path)
            prior = {k: z[k] for k in z.files}
        transforms = {}
        for k, acc in per_key.items():
            w2 = estimate_cmllr_transform(acc, ms)
            if w2 is None:
                continue
            w1 = prior.get(k)
            if w1 is not None:
                a = w2[:, 1:] @ w1[:, 1:]
                b = w2[:, 1:] @ w1[:, 0] + w2[:, 0]
                w2 = np.concatenate([b[:, None], a], axis=1)
            transforms[k] = w2
        out = tc.get("affine-transform-file") or "cmllr.npz"
        np.savez_compressed(out, **transforms)
        self.log("CMLLR transforms for %d keys -> %s", len(transforms), out)
        return 0

    def action_score_affine_transform(self) -> int:
        """Average aligned emission score with and without the CMLLR
        transform applied to the features."""
        from ..mm.adaptation import apply_feature_transform
        am = self._load_am()
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        scorer = GmmScorer(ms)
        z = np.load(tc.get("affine-transform-file") or "cmllr.npz")
        raw = np.zeros(2)
        adapted = np.zeros(2)
        for seg, feats, em in self._aligned_frames(am, scorer):
            key = self._corpus_key(seg)
            if key not in z.files:
                continue
            idx = np.arange(len(em))
            s0 = np.asarray(scorer.score(feats))[idx, em]
            s1 = np.asarray(scorer.score(
                apply_feature_transform(feats, z[key])))[idx, em]
            raw += (s0.sum(), len(s0))
            adapted += (s1.sum(), len(s1))
        self.log("score without transform %.6f, with transform %.6f",
                 raw[0] / max(raw[1], 1), adapted[0] / max(adapted[1], 1))
        return 0

    def action_estimate_adaptation(self) -> int:
        tc = self._trainer_config()
        _ms, per_key = self._accumulate_adaptation()
        out = tc.get("adaptation-accumulator-file") or "mllr.acc.npz"
        self._write_adaptation_accumulators(out, per_key)
        self.log("MLLR statistics for %d keys -> %s", len(per_key), out)
        return 0

    def action_calculate_band_adaptation(self) -> int:
        """Band-diagonal MLLR transforms from the MLLR statistics
        (reference BandMllrEstimator, src/Mm/BandMllrAdaptation.cc;
        `mllr-bands` param)."""
        from ..mm.adaptation import estimate_band_mllr_transform
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        per_key = self._read_adaptation_accumulators(
            tc.get("adaptation-accumulator-file") or "mllr.acc.npz")
        n_bands = int(tc.get("mllr-bands") or 1)
        min_obs = float(tc.get("min-observations") or 100.0)
        transforms = {k: estimate_band_mllr_transform(
            acc, ms, n_bands=n_bands, min_occupancy=min_obs)
            for k, acc in per_key.items()}
        out = tc.get("adaptation-file") or "band_mllr.npz"
        np.savez_compressed(out, **{k: v for k, v in transforms.items()
                                    if v is not None})
        self.log("band-MLLR (%d bands) transforms for %d keys -> %s",
                 n_bands, len(transforms), out)
        return 0

    def action_estimate_semi_tied(self) -> int:
        """Accumulate semi-tied covariance statistics (diagonal + full
        per-density scatter; reference SemiTiedEstimator,
        src/Mm/SemiTiedAdaptation.hh)."""
        tc = self._trainer_config()
        _ms, per_key = self._accumulate_adaptation(scatter=True)
        out = tc.get("adaptation-accumulator-file") or "semitied.acc.npz"
        self._write_adaptation_accumulators(out, per_key)
        self.log("semi-tied statistics for %d keys -> %s",
                 len(per_key), out)
        return 0

    def action_calculate_semi_tied(self) -> int:
        """Semi-tied covariance transforms + re-estimated diagonal
        variances from the scatter statistics (Gales 1999; reference
        src/Mm/SemiTiedAdaptation.cc)."""
        from ..mm.adaptation import (apply_semi_tied_transform,
                                     estimate_semi_tied_transform)
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        per_key = self._read_adaptation_accumulators(
            tc.get("adaptation-accumulator-file") or "semitied.acc.npz")
        arrays = {}
        applied = None
        apply_key = tc.get("apply-key")
        min_obs = float(tc.get("min-observations") or 100.0)
        for k, acc in per_key.items():
            res = estimate_semi_tied_transform(acc, ms,
                                               min_occupancy=min_obs)
            if res is None:
                continue
            A, new_vars = res
            arrays[f"{k}::A"] = A
            arrays[f"{k}::vars"] = new_vars
            if apply_key == k:
                applied = apply_semi_tied_transform(ms, A, new_vars)
        out = tc.get("adaptation-file") or "semitied.npz"
        np.savez_compressed(out, **arrays)
        if applied is not None:
            applied.write_pms(tc.get("new-mixture-set-file")
                              or "semitied.pms")
        self.log("semi-tied transforms for %d keys -> %s",
                 len(arrays) // 2, out)
        return 0

    def action_calculate_adaptation(self) -> int:
        from ..mm.adaptation import (apply_mllr_mean_transform,
                                     estimate_mllr_mean_transform)
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        per_key = self._read_adaptation_accumulators(
            tc.get("adaptation-accumulator-file") or "mllr.acc.npz")
        transforms = {k: estimate_mllr_mean_transform(acc, ms)
                      for k, acc in per_key.items()}
        out = tc.get("adaptation-file") or "mllr.npz"
        np.savez_compressed(out, **transforms)
        # optionally write a model adapted with one key's transform
        adapt_key = tc.get("apply-key")
        if adapt_key and adapt_key in transforms:
            adapted = apply_mllr_mean_transform(ms, transforms[adapt_key])
            adapted.write_pms(tc.get("new-mixture-set-file") or "adapted.pms")
        self.log("MLLR transforms for %d keys -> %s", len(transforms), out)
        return 0

    # -- mixture-set conversions (reference Mm::Module convert/map/combine) ---

    def action_convert_mixture_set(self) -> int:
        """Convert between the text .pms format and the reference's legacy
        binary MIXSET format (mm/legacy_io.py, byte-exact): a legacy file
        is read as equivalent accumulator statistics and re-estimated; a
        .pms is written as a legacy accumulator with nominal weights."""
        from ..mm import legacy_io
        tc = self._trainer_config()
        src = tc.get("old-mixture-set-file")
        dst = tc.get("new-mixture-set-file") or "converted.mix"
        fmt = (tc.get("format") or "").lower()
        if not fmt:
            fmt = "legacy" if dst.endswith((".mix", ".bin")) else "pms"
        if fmt == "pms":
            legacy = legacy_io.read_legacy_accumulator(src)
            acc = legacy_io.to_mixture_accumulator(legacy)
            est = MixtureSetEstimator(acc.dim, acc.mixture_of,
                                      minimum_observation_weight=0.0)
            est.acc = acc
            est.estimate().write_pms(dst)
        else:
            ms = MixtureSet.read_pms(src)
            total_w = float(tc.get("total-weight") or 1000.0)
            mean, var, _, _ = ms.packed()
            n = ms.n_densities
            dens_w = np.zeros(n)
            mixtures = []
            for mix in ms.mixtures:
                row = []
                for d, lw in zip(mix.density_indices, mix.log_weights):
                    dens_w[d] = float(np.exp(lw)) * total_w
                    row.append((int(d), dens_w[d]))
                mixtures.append(row)
            legacy = legacy_io.LegacyAccumulatorFile(
                dim=ms.dim,
                mean_sums=mean * dens_w[:, None],
                mean_weights=dens_w,
                covar_sums=(var + mean ** 2) * dens_w[:, None],
                covar_weights=dens_w,
                densities=np.stack([np.arange(n), np.arange(n)],
                                   axis=1).astype(np.uint32),
                mixtures=mixtures)
            legacy_io.write_legacy_accumulator(legacy, dst)
        self.log("converted %s -> %s (%s)", src, dst, fmt)
        return 0

    def action_convert_to_estimator(self) -> int:
        """Mixture set -> equivalent accumulator (reference
        convert-mixture-set-to-mixture-set-estimator): observation counts
        from the mixture weights times a nominal total weight."""
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        total_w = float(tc.get("total-weight") or 1000.0)
        mean, var, _, _ = ms.packed()          # density-major views
        mixture_of = np.zeros(ms.n_densities, np.int64)
        weight = np.zeros(ms.n_densities)
        sum_x = np.zeros((ms.n_densities, ms.dim))
        sum_x2 = np.zeros((ms.n_densities, ms.dim))
        for mi, mix in enumerate(ms.mixtures):
            for d, lw in zip(mix.density_indices, mix.log_weights):
                w = float(np.exp(lw)) * total_w
                mixture_of[d] = mi
                weight[d] = w
                sum_x[d] = mean[d] * w
                sum_x2[d] = (var[d] + mean[d] ** 2) * w
        acc = MixtureAccumulator.zeros(ms.dim, mixture_of)
        acc.weight = weight
        acc.sum_x = sum_x
        acc.sum_x2 = sum_x2
        out = tc.get("new-accumulator-file") or "converted.acc"
        acc.write(out)
        self.log("mixture set -> accumulator (%d densities) -> %s",
                 ms.n_densities, out)
        return 0

    def action_combine_mixture_sets(self) -> int:
        """Combine N mixture-set FILES (not estimators): each is converted
        to an equivalent accumulator, merged, re-estimated."""
        tc = self._trainer_config()
        files = (tc.get("mixture-set-files") or "").split()
        if not files:
            raise ValueError("no mixture-set-files configured")
        combined = None
        for f in files:
            ms = MixtureSet.read_pms(f)
            est = MixtureSetEstimator.for_mixture_set(ms)
            mean, var, _, _ = ms.packed()
            # unit-weight equivalent statistics
            for mi, mix in enumerate(ms.mixtures):
                for d, lw in zip(mix.density_indices, mix.log_weights):
                    w = float(np.exp(lw))
                    est.acc.weight[d] += w
                    est.acc.sum_x[d] += mean[d] * w
                    est.acc.sum_x2[d] += (var[d] + mean[d] ** 2) * w
            combined = est.acc if combined is None \
                else combined.combine(est.acc)
        est = MixtureSetEstimator(combined.dim, combined.mixture_of,
                                  minimum_observation_weight=0.0)
        est.acc = combined
        out_ms = est.estimate()
        out = tc.get("new-mixture-set-file") or "combined.pms"
        out_ms.write_pms(out)
        self.log("combined %d mixture sets -> %s", len(files), out)
        return 0

    def action_map_mixture_set(self) -> int:
        """Re-index mixtures by a mapping file: line i holds the OLD
        mixture index for NEW mixture i (reference map-mixture-set)."""
        from ..mm.mixture_set import Mixture
        tc = self._trainer_config()
        ms = MixtureSet.read_pms(tc.get("old-mixture-set-file"))
        mapping = [int(l.split()[-1])
                   for l in open(tc.get("mapping-file"))
                   if l.strip() and not l.startswith("#")]
        mixtures = [Mixture(list(ms.mixtures[old].density_indices),
                            list(ms.mixtures[old].log_weights))
                    for old in mapping]
        out_ms = MixtureSet(dim=ms.dim, means=ms.means,
                            covariances=ms.covariances,
                            densities=ms.densities, mixtures=mixtures)
        out = tc.get("new-mixture-set-file") or "mapped.pms"
        out_ms.write_pms(out)
        self.log("mapped %d -> %d mixtures -> %s", ms.n_mixtures,
                 len(mixtures), out)
        return 0

    # -- TDC sums (transition/duration counts; the reference registers the
    # action but ships no public implementation — this is the functional
    # equivalent: per-state-class loop/forward/exit counts from alignments
    # for TDP re-estimation) ---------------------------------------------------

    def action_accumulate_tdc_sum(self) -> int:
        am = self._load_am()
        counts = {"speech": np.zeros(3), "silence": np.zeros(3)}
        for _seg, _feats, em in self._aligned_frames(am):
            # loop = same class persists; forward = class changes
            same = em[1:] == em[:-1]
            sil_mask = np.asarray(
                [am.state_tying.is_silence_class(int(c))
                 if hasattr(am.state_tying, "is_silence_class") else False
                 for c in em[:-1]])
            for name, m in (("silence", sil_mask), ("speech", ~sil_mask)):
                counts[name][0] += int(np.sum(same & m))
                counts[name][1] += int(np.sum(~same & m))
            counts["speech"][2] += 1  # one exit per segment end
        tc = self._trainer_config()
        out = tc.get("tdc-sum-file") or "tdc.sum"
        with open(out, "w") as fh:
            for name, c in counts.items():
                fh.write(f"{name}\tloop={c[0]:.0f}\tforward={c[1]:.0f}"
                         f"\texit={c[2]:.0f}\n")
        self.log("TDC sums -> %s", out)
        return 0

    def action_combine_tdc_sum(self) -> int:
        tc = self._trainer_config()
        files = (tc.get("tdc-sum-files") or "").split()
        totals: dict = {}
        for f in files:
            for line in open(f):
                name, *fields = line.split()
                arr = totals.setdefault(name, np.zeros(len(fields)))
                arr += [float(x.split("=")[1]) for x in fields]
        out = tc.get("tdc-sum-file") or "tdc.sum"
        with open(out, "w") as fh:
            for name, c in totals.items():
                fh.write(f"{name}\tloop={c[0]:.0f}\tforward={c[1]:.0f}"
                         f"\texit={c[2]:.0f}\n")
        self.log("combined %d TDC sum files -> %s", len(files), out)
        return 0

    def action_merge_cart_examples(self) -> int:
        import pickle
        tc = self._trainer_config()
        files = (tc.get("cart-example-files") or "").split()
        if not files:
            raise ValueError("no cart-example-files configured")
        merged: dict = {}
        for f in files:
            with open(f, "rb") as fh:
                stats = pickle.load(fh)
            for key, v in stats.items():
                entry = merged.get(key)
                if entry is None:
                    merged[key] = [v[0], v[1].copy(), v[2].copy()]
                else:
                    entry[0] += v[0]
                    entry[1] += v[1]
                    entry[2] += v[2]
        out = tc.get("cart-example-file") or "cart.examples"
        with open(out, "wb") as fh:
            pickle.dump(merged, fh)
        self.log("merged %d example files (%d contexts) -> %s",
                 len(files), len(merged), out)
        return 0

    def action_create_model_acceptors(self) -> int:
        """Write each segment's allophone-state graph (the model acceptor
        used for alignment) to an FSA archive directory."""
        import os
        am = self._load_am()
        corpus = CorpusDescription(self.config.sub("corpus"))
        builder = StateGraphBuilder(am)
        out_dir = self._trainer_config().get("model-acceptor-archive") \
            or "acceptors"
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for seg in corpus.segments():
            graph = builder.build(seg.orth)
            path = os.path.join(out_dir,
                                seg.full_name.replace("/", "_") + ".att")
            with open(path, "w") as fh:
                for a_from, a_to, a_sc in zip(graph.arcs_from,
                                              graph.arcs_to,
                                              graph.arcs_score):
                    em = int(graph.emissions[a_to])
                    fh.write(f"{int(a_from)}\t{int(a_to)}\t{em}"
                             f"\t{float(a_sc):.6g}\n")
                for f, fs in zip(graph.final, graph.final_score):
                    fh.write(f"{int(f)}\t{float(fs):.6g}\n")
            n += 1
        self.log("wrote %d model acceptors -> %s", n, out_dir)
        return 0

    def action_dry(self) -> int:
        self.log("dry run: configuration ok")
        return 0

    def run(self) -> int:
        action = self.param_action(self.config)
        dispatch = {
            "dry": self.action_dry,
            "accumulate-mixture-set-text-dependent": self.action_accumulate,
            "accumulate-mixture-set-text-dependent-tied":
                self.action_accumulate,
            "combine-mixture-set-estimators": self.action_combine,
            "estimate-mixture-set": self.action_estimate,
            "split-mixture-set": self.action_split,
            "show-mixture-set": self.action_show,
            "dump-alignment": self.action_align,
            "accumulate-cart-examples": self.action_accumulate_cart,
            "merge-cart-examples": self.action_merge_cart_examples,
            "estimate-cart": self.action_estimate_cart,
            "score-features": self.action_score_features,
            "estimate-scatter-matrices-text-dependent":
                lambda: self.action_estimate_scatter(True),
            "estimate-scatter-matrices-text-independent":
                lambda: self.action_estimate_scatter(False),
            "combine-lda": self.action_combine_scatter,
            "combine-scatter-matrix-accumulators":
                self.action_combine_scatter,
            "estimate-scatter-matrices-from-accumulator":
                self.action_scatter_from_accumulator,
            "estimate-lda": lambda: self.action_estimate_lda(False),
            "estimate-lda-text-dependent":
                lambda: self.action_estimate_lda(True, True),
            "estimate-lda-text-independent":
                lambda: self.action_estimate_lda(True, False),
            "estimate-affine-feature-transform":
                self.action_estimate_affine_transform,
            "combine-affine-feature-transform-estimators":
                self.action_combine_affine_transform,
            "calculate-affine-feature-transform":
                self.action_calculate_affine_transform,
            "score-affine-feature-transform":
                self.action_score_affine_transform,
            "estimate-adaptation": self.action_estimate_adaptation,
            "calculate-adaptation": self.action_calculate_adaptation,
            "calculate-band-adaptation":
                self.action_calculate_band_adaptation,
            "estimate-semi-tied": self.action_estimate_semi_tied,
            "calculate-semi-tied": self.action_calculate_semi_tied,
            "convert-mixture-set": self.action_convert_mixture_set,
            "convert-mixture-set-to-mixture-set-estimator":
                self.action_convert_to_estimator,
            "combine-mixture-sets": self.action_combine_mixture_sets,
            "map-mixture-set": self.action_map_mixture_set,
            "accumulate-tdc-sum": self.action_accumulate_tdc_sum,
            "combine-tdc-sum": self.action_combine_tdc_sum,
            "create-model-acceptors": self.action_create_model_acceptors,
        }
        if action not in dispatch:
            raise ValueError(f"unknown action {action!r}; "
                             f"known: {sorted(dispatch)}")
        return dispatch[action]()


def main(argv=None) -> int:
    return AcousticModelTrainerApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
