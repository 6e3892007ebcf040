"""Search-algorithm factory: config name -> decoder instance.

Mirrors the reference Search::Module factory (src/Search/Module.cc:88-132):
every registered `search-algorithm.type` name constructs the matching
decoder from a ModelCombination + config, so the librasr API and the
speech-recognizer tool build identical searches from one .config.

Registered names (reference Module.hh:39-45 + SearchV2 types):
  v1: advanced-tree-search | word-conditioned-tree-search   (classic HMM)
      expanding-fsa-search | wfst-search                    (static graph)
      linear-search                                         (aligner-style)
  v2: lexiconfree-timesync-beam-search
      tree-timesync-beam-search
      lexiconfree-labelsync-beam-search
      tree-labelsync-beam-search
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np

from ..core.configuration import Configuration


def _pruning(sa: Configuration):
    beam = int(sa.get("max-beam-size") or sa.get("beam-size") or 16)
    blank = int(sa.get("blank-label-index") or 0)
    thr = sa.get("score-threshold")
    thr = float(thr) if thr else math.inf
    we_beam = sa.get("word-end-beam-size")
    we_beam = int(we_beam) if we_beam else None
    return beam, blank, thr, we_beam


class GmmWordRecognizer:
    """Classic word recognition behind the SearchAlgorithmV2-ish segment
    API: features buffer on put, the emission matrix is one device
    program at finish (GMM GEMM or hybrid NN forward), then the host
    word-conditioned search runs (the reference's AdvancedTreeSearch
    workflow, config 3).  `gmm` is any emission scorer with
    `score(feats (T, D)) -> (T, S)` -log scores (mm.GmmScorer or
    nn.hybrid_scorer.HybridEmissionScorer)."""

    def __init__(self, search, gmm, streaming_scorer=None):
        """`streaming_scorer` (nn.hybrid_scorer.StreamingHybridScorer)
        switches the segment API to STREAMING: put_features scores
        finalized chunks immediately and feeds the frame-synchronous
        search as emissions arrive (the reference classic decoder's
        frame-streamed feed loop, src/Speech/Recognizer.cc:170-290);
        finish_segment only flushes the tail.  Acoustic lookahead
        needs the full emission matrix and stays off in this mode."""
        self._search = search
        self._gmm = gmm
        self._stream = streaming_scorer
        self._feats: List[np.ndarray] = []
        self.statistics = search.statistics

    def enter_segment(self) -> None:
        self._feats = []
        self._search.reset()
        if self._stream is not None:
            self._stream.reset()
            if self._search.dynamic_beam is not None:
                self._search.dynamic_beam.reset()

    def _feed_scores(self, scores) -> None:
        for t in range(scores.shape[0]):
            self._search.feed(scores[t])

    def put_feature(self, feature) -> None:
        self.put_features(np.asarray(feature, np.float32)[None])

    def put_features(self, features) -> None:
        f = np.asarray(features, np.float32)
        if self._stream is not None:
            self._feed_scores(self._stream.feed(f))
            return
        self._feats.append(f)

    def finish_segment(self) -> None:
        if self._stream is not None:
            self._feed_scores(self._stream.finish())
            return
        if not self._feats:
            return
        feats = np.concatenate(self._feats)
        scores = np.asarray(self._gmm.score(feats))
        self._search.reset()
        self._search.set_lookahead_scores(scores)
        if self._search.dynamic_beam is not None:
            self._search.dynamic_beam.reset()
        self._feed_scores(scores)

    def decode_many_steps(self) -> int:
        return 0  # decoding happens at finish_segment

    def get_current_best_words(self) -> List[str]:
        return self._search.best_words()

    def get_current_best_labels(self) -> List[int]:
        words, _ = self._search.best()
        return words

    def get_current_best_traceback(self):
        from .lexiconfree_timesync import TracebackItem
        return [TracebackItem(lemma, score, t0, t1)
                for lemma, t0, t1, score in
                self._search.best_trace_items()]

    def n_best(self, n: int):
        return []

    def recognize_segment(self, features) -> str:
        self.enter_segment()
        self.put_features(features)
        self.finish_segment()
        return " ".join(self._search.best_words())

    def decode_pipelined(self, feats_iter):
        """Decode a corpus stream with emission forwarding OVERLAPPED:
        when the scorer supports `pipelined()` (the hybrid NN scorer),
        utterance k+1's TPU forward runs while the host search consumes
        utterance k — the reference's buffered-scorer feed loop
        (src/Speech/Recognizer.cc:272-281).  Yields best-word lists."""
        if hasattr(self._gmm, "pipelined"):
            src = self._gmm.pipelined(feats_iter)
        else:
            src = (self._gmm.score(np.asarray(f, np.float32))
                   for f in feats_iter)
        for scores in src:
            scores = np.asarray(scores)
            self._search.reset()
            self._search.set_lookahead_scores(scores)
            if self._search.dynamic_beam is not None:
                self._search.dynamic_beam.reset()
            for t in range(scores.shape[0]):
                self._search.feed(scores[t])
            yield self._search.best_words()

    def create_lattice(self):
        return self._search.create_lattice()


def _hybrid_emission_scorer(config: Configuration):
    """HybridEmissionScorer from [model]: type=hybrid, checkpoint,
    n-classes, d-model, n-layers, n-heads, feature-dim, priors-file,
    prior-scale, am-scale — the NN acoustic model of BASELINE config 3
    (reference hybrid scorers src/Nn/Module.cc:110-129)."""
    import jax
    import jax.numpy as jnp

    from ..models.hybrid import HybridConformerAm
    from ..nn.checkpoint import load_params
    from ..nn.hybrid_scorer import HybridEmissionScorer
    mc = config.sub("model")
    ckpt = mc.get("checkpoint")
    n_classes = int(mc.get("n-classes") or 0)
    if not (ckpt and n_classes):
        raise ValueError("model.checkpoint and model.n-classes required "
                         "for the hybrid acoustic model")
    model = HybridConformerAm(
        n_classes=n_classes,
        d_model=int(mc.get("d-model") or 384),
        n_layers=int(mc.get("n-layers") or 8),
        n_heads=int(mc.get("n-heads") or 4),
        dtype=jnp.float32 if (mc.get("dtype") or "") == "float32"
        else jnp.bfloat16)
    dim = int(mc.get("feature-dim") or 80)
    template = model.init(jax.random.PRNGKey(0),
                          jnp.zeros((1, 8, dim)),
                          jnp.asarray([8]))["params"]
    params, _ = load_params(ckpt, template)
    params = jax.tree_util.tree_map(
        lambda x: jnp.asarray(x, jnp.bfloat16)
        if np.asarray(x).dtype == np.float16 else x, params)
    pf = mc.get("priors-file")
    log_priors = np.loadtxt(pf, dtype=np.float32) if pf else None
    return HybridEmissionScorer(
        model, params, log_priors,
        prior_scale=float(mc.get("prior-scale") or 0.7),
        am_scale=float(mc.get("am-scale") or 1.0),
        feat_bucket=int(mc.get("feature-bucket") or 256))


def _gmm_word_recognizer(config: Configuration, model_combination):
    from ..am.acoustic_model import AcousticModel
    from .hmm_timesync import WordConditionedTreeSearch
    lexicon = model_combination.lexicon
    if lexicon is None:
        raise ValueError("lexicon required for word-conditioned search")
    am = AcousticModel.create(config.sub("acoustic-model"), lexicon)
    ms_cfg = config.sub("mixture-set")
    ms_path = ms_cfg.get("file")
    if (config.sub("model").get("type") or "").lower() == "hybrid":
        # hybrid NN-HMM: TPU conformer posteriors feed the same search
        gmm = _hybrid_emission_scorer(config)
    elif ms_path:
        from ..mm import GmmScorer, MixtureSet
        gmm = GmmScorer(MixtureSet.read_pms(ms_path),
                        mode=ms_cfg.get("mode") or "max")
    else:
        raise ValueError("word-conditioned-tree-search needs an emission "
                         "scorer: mixture-set.file (GMM) or [model] "
                         "type=hybrid + checkpoint (NN)")
    sa = config.sub("search-algorithm")
    beam, _blank, thr, we_beam = _pruning(sa)
    lm = model_combination.language_model
    la_frames = int(sa.get("acoustic-lookahead") or 0)
    la_scale = float(sa.get("acoustic-lookahead-scale") or 0.5)
    dyn = None
    if (sa.get("dynamic-beam") or "").lower() in ("true", "yes", "1"):
        from .hmm_timesync import DynamicBeamStrategy
        dyn = DynamicBeamStrategy(
            base_threshold=thr if math.isfinite(thr) else 1e6,
            min_active=int(sa.get("dynamic-beam-min-active") or 256),
            max_active=int(sa.get("dynamic-beam-max-active") or 4096))
    search = WordConditionedTreeSearch(
        am, lm=lm.lm if lm else None,
        lm_scale=lm.scale if lm else 1.0,
        beam_size=beam, word_end_beam_size=we_beam, score_threshold=thr,
        across_word=(sa.get("across-word") or "").lower()
        in ("true", "yes", "1"),
        tree_image=sa.get("tree-image") or None,
        acoustic_lookahead=la_frames, acoustic_lookahead_scale=la_scale,
        dynamic_beam=dyn)
    stream = None
    if (sa.get("streaming") or "").lower() in ("true", "yes", "1"):
        from ..nn.hybrid_scorer import StreamingHybridScorer
        stream = StreamingHybridScorer(
            gmm, chunk=int(sa.get("streaming-chunk") or 64),
            right_context=int(sa.get("streaming-right-context") or 32),
            left_context=int(sa.get("streaming-left-context") or 64))
    return GmmWordRecognizer(search, gmm, streaming_scorer=stream)


class WfstRecognizer:
    """Static-graph decoder behind the segment API: the label scorer
    buffers features / runs the encoder, the composed L∘G graph decodes
    the dense (T, V) log-posteriors at segment end."""

    def __init__(self, decoder, scorer, lexicon):
        self._decoder = decoder
        self._scorer = scorer
        self._lexicon = lexicon
        self._words: List[str] = []

    def enter_segment(self) -> None:
        self._scorer.reset()
        self._words = []

    def put_feature(self, feature) -> None:
        self._scorer.add_input(np.asarray(feature, np.float32))

    def put_features(self, features) -> None:
        self._scorer.add_inputs(np.asarray(features, np.float32))

    def finish_segment(self) -> None:
        self._scorer.signal_segment_end()
        lp = self._scorer.log_probs() \
            if hasattr(self._scorer, "log_probs") else None
        if lp is None:
            raise ValueError("wfst search needs a dense-posterior scorer "
                             "(no-op or encoder-only)")
        self._words = self._decoder.recognize(lp, self._lexicon)

    def decode_many_steps(self) -> int:
        return 0

    def get_current_best_words(self) -> List[str]:
        return self._words

    def get_current_best_labels(self) -> List[int]:
        out = []
        for w in self._words:
            lemma = self._lexicon.lemma_by_orth(w)
            if lemma is not None:
                out.append(lemma.id)
        return out

    def get_current_best_traceback(self):
        return []

    def n_best(self, n: int):
        return []

    def recognize_segment(self, features) -> str:
        self.enter_segment()
        self.put_features(features)
        self.finish_segment()
        return " ".join(self._words)


def _wfst_search(config: Configuration, model_combination, scorer):
    from .wfst import WfstDecoder, build_decoding_graph
    sa = config.sub("search-algorithm")
    beam, blank, thr, _we = _pruning(sa)
    lm = model_combination.language_model
    graph = build_decoding_graph(
        model_combination.lexicon,
        lm=lm.lm if lm else None,
        lm_scale=lm.scale if lm else 1.0,
        cache_path=sa.get("graph-cache") or None)
    decoder = WfstDecoder(graph, blank=blank, beam_size=beam,
                          score_threshold=thr)
    return WfstRecognizer(decoder, scorer, model_combination.lexicon)


class WfstHmmRecognizer:
    """Segment facade over the static C o L o G HMM decoders (the
    reference's expanding-fsa-search, src/Search/Module.cc:39-132):
    features buffer on put, the emission matrix comes from the
    configured scorer (GMM / hybrid NN) — or the features ARE
    precomputed emission scores when no scorer is configured
    (nn-precomputed-hybrid mode) — and the graph Viterbi runs at
    finish."""

    def __init__(self, decoder, scorer, lexicon,
                 lattice_threshold: float = 20.0):
        self._decoder = decoder
        self._scorer = scorer
        self._lexicon = lexicon
        self._lattice_threshold = lattice_threshold
        self._feats = None
        self._scores = None
        self._result: List[str] = []

    def enter_segment(self) -> None:
        self._feats = None
        self._result = []

    def put_features(self, features) -> None:
        f = np.asarray(features, np.float32)
        self._feats = f if self._feats is None else             np.concatenate([self._feats, f])

    def put_feature(self, feature) -> None:
        self.put_features(np.asarray(feature, np.float32)[None])

    def finish_segment(self) -> None:
        if self._feats is None:
            return
        self._scores = (self._scorer.score(self._feats)
                        if self._scorer is not None else self._feats)
        self._result = [w for w in self._decoder.recognize(
            self._scores, self._lexicon)]

    def best_words(self) -> List[str]:
        return list(self._result)

    def create_lattice(self):
        """Word lattice of the last segment (pruned-trellis lattice,
        search.wfst.hmm_wfst_lattice); static-graph decoders only.
        Lattice labels use the graph output space (lemma id + 1) so
        lemma 0 never collides with epsilon."""
        from .wfst import HmmWfstDecoder, hmm_wfst_lattice
        if not isinstance(self._decoder, HmmWfstDecoder):
            raise NotImplementedError(
                "lattice output needs the static-graph decoder "
                "(lm-composition=static)")
        if getattr(self, "_scores", None) is None:
            raise ValueError("create_lattice before finish_segment: "
                             "no decoded segment buffered")
        lat = hmm_wfst_lattice(self._decoder, self._scores,
                               lattice_threshold=self._lattice_threshold)
        lat.words = {l.id + 1: l.preferred_orth
                     for l in self._lexicon.lemmas}
        return lat

    def recognize_segment(self, features) -> str:
        self.enter_segment()
        self.put_features(features)
        self.finish_segment()
        return " ".join(self._result)


def _wfst_hmm_search(config: Configuration, model_combination):
    """expanding-fsa-search: triphone C o L o G build + H-level TDP
    expansion + static-graph Viterbi; `lm-composition = dynamic` keeps
    the graph LM-free and composes the LM on the fly
    (reference src/Search/Wfst, DynamicLmFst.cc)."""
    from ..am.acoustic_model import AcousticModel
    from .wfst import (DynamicLmWfstDecoder, HmmWfstDecoder, build_clg,
                       expand_hmm)
    lexicon = model_combination.lexicon
    if lexicon is None:
        raise ValueError("expanding-fsa-search requires a lexicon")
    am = AcousticModel.create(config.sub("acoustic-model"), lexicon)
    sa = config.sub("search-algorithm")
    beam, _blank, thr, _we = _pruning(sa)
    lm = model_combination.language_model
    dynamic = (sa.get("lm-composition") or "static").lower() == "dynamic"
    if lm is not None and dynamic:
        graph = expand_hmm(build_clg(am, None), am)
        decoder = DynamicLmWfstDecoder(graph, lm.lm, lexicon,
                                       lm_scale=lm.scale,
                                       beam_size=beam,
                                       score_threshold=thr)
    else:
        graph = expand_hmm(build_clg(
            am, lm.lm if lm else None,
            lm_scale=lm.scale if lm else 1.0), am)
        decoder = HmmWfstDecoder(graph, beam_size=beam,
                                 score_threshold=thr)
    scorer = None
    if (config.sub("model").get("type") or "").lower() == "hybrid":
        scorer = _hybrid_emission_scorer(config)
    elif config.sub("mixture-set").get("file"):
        from ..mm import GmmScorer, MixtureSet
        scorer = GmmScorer(
            MixtureSet.read_pms(config.sub("mixture-set").get("file")),
            mode=config.sub("mixture-set").get("mode") or "max")
    return WfstHmmRecognizer(
        decoder, scorer, lexicon,
        lattice_threshold=float(sa.get("lattice-threshold") or 20.0))


def create_search_algorithm(config: Configuration, model_combination):
    """Construct the decoder named by search-algorithm.type."""
    sa = config.sub("search-algorithm")
    search_type = sa.get("type") or "lexiconfree-timesync-beam-search"
    beam, blank, thr, we_beam = _pruning(sa)
    scorer = model_combination.label_scorer
    lm = model_combination.language_model

    if search_type in ("advanced-tree-search",
                       "word-conditioned-tree-search"):
        return _gmm_word_recognizer(config, model_combination)

    if search_type == "expanding-fsa-search":
        return _wfst_hmm_search(config, model_combination)

    if search_type in ("wfst-search", "wfst"):
        return _wfst_search(config, model_combination, scorer)

    if search_type in ("linear-search", "linear"):
        from ..am.acoustic_model import AcousticModel
        from .linear import LinearSearch
        am = AcousticModel.create(config.sub("acoustic-model"),
                                  model_combination.lexicon)
        return LinearSearch(am)

    # the frame-sync transducer beam builds its whole model from
    # [model] (type=transducer + checkpoint + dims) — the reference's
    # stateful-scorer search family (src/Nn/Module.cc:132-218)
    if search_type in ("transducer-framesync", "framesync-transducer",
                       "transducer"):
        from ..nn.scorer_factory import transducer_decoder_from_config
        dec = transducer_decoder_from_config(config)
        dec.enter_segment()
        return dec

    # label-sync searches can build their autoregressive score_fn from
    # [model] alone, so they come before the label-scorer requirement
    if search_type in ("lexiconfree-labelsync-beam-search",
                       "lexiconfree-labelsync",
                       "tree-labelsync-beam-search", "tree-labelsync"):
        return _labelsync_search(config, model_combination, scorer,
                                 search_type, sa, beam, we_beam, thr, lm)

    if scorer is None:
        raise ValueError("a label scorer is required (configure "
                         "[label-scorer] or pass one programmatically)")

    if search_type in ("lexiconfree-timesync-beam-search",
                       "lexiconfree-timesync"):
        from .lexiconfree_timesync import LexiconfreeTimesyncBeamSearch
        hist = int(sa.get("histogram-pruning-bins") or 0)
        return LexiconfreeTimesyncBeamSearch(
            scorer, beam_size=beam, blank_index=blank,
            score_threshold=thr, histogram_bins=hist)

    if search_type in ("tree-timesync-beam-search", "tree-timesync"):
        from .tree_timesync import TreeTimesyncBeamSearch
        return TreeTimesyncBeamSearch(
            scorer, model_combination.lexicon,
            lm=lm.lm if lm else None,
            lm_scale=lm.scale if lm else 1.0,
            beam_size=beam, word_end_beam_size=we_beam, blank_index=blank,
            score_threshold=thr,
            lm_lookahead=(sa.get("lm-lookahead") or "").lower()
            in ("true", "yes", "1"))

    raise ValueError(f"unknown search-algorithm.type {search_type!r}")


def _labelsync_search(config, model_combination, scorer, search_type,
                      sa, beam, we_beam, thr, lm):
    if search_type in ("lexiconfree-labelsync-beam-search",
                       "lexiconfree-labelsync"):
        # device fast path: an AED built from [model] decodes with the
        # whole label-sync beam in ONE device program
        # (search/aed_device.py) instead of per-step scoring callbacks.
        # score-threshold pruning is a host-search-only feature, so a
        # configured threshold keeps the host path (same pruning
        # contract as the reference's per-stage descriptors,
        # doc/search_v2.rst:183-330).
        model_type = (config.sub("model").get("type") or "").lower()
        device = (sa.get("device-beam") or "true").lower() \
            not in ("false", "no", "0")
        if (device and not callable(scorer) and not math.isfinite(thr)
                and model_type in ("aed", "attention", "encoder-decoder")
                and config.sub("model").get("checkpoint")):
            from ..nn.scorer_factory import aed_decoder_from_config
            # only pass an EXPLICIT beam: _pruning's fallback default
            # (16) must not silently override the device decoder's own
            # documented default (8)
            explicit = (sa.get("max-beam-size") or sa.get("beam-size"))
            return aed_decoder_from_config(
                config, beam_size=beam if explicit else None)
        score_fn, n_labels = _labelsync_score_fn(config, scorer)
        from .lexiconfree_labelsync import LexiconfreeLabelsyncBeamSearch
        return LexiconfreeLabelsyncBeamSearch(
            score_fn, n_labels,
            sentence_end_index=int(sa.get("sentence-end-index") or 0),
            beam_size=beam,
            max_labels=int(sa.get("max-labels") or 200),
            length_norm_scale=float(sa.get("length-norm-scale") or 1.0),
            score_threshold=thr)
    score_fn, n_labels = _labelsync_score_fn(config, scorer)
    from .tree_labelsync import TreeLabelsyncBeamSearch
    return TreeLabelsyncBeamSearch(
        score_fn, model_combination.lexicon,
        lm=lm.lm if lm else None,
        lm_scale=lm.scale if lm else 1.0,
        sentence_end_index=int(sa.get("sentence-end-index") or 0),
        beam_size=beam, word_end_beam_size=we_beam,
        length_norm_scale=float(sa.get("length-norm-scale") or 1.0))


def _labelsync_score_fn(config: Configuration, scorer):
    """Label-synchronous searches need an autoregressive
    score_fn(label_prefix_batch) -> (B, V) scores.  Three sources, in
    order: a callable passed programmatically; an AedPrefixScorer built
    from [model] config (type=aed + checkpoint + dims — the reference
    builds encoder-decoder scorers entirely from config,
    src/Nn/Module.cc:132-218); otherwise an error naming both options."""
    if callable(scorer) and not hasattr(scorer, "score_batch"):
        n = int(config.sub("search-algorithm").get("n-labels") or 0) \
            or getattr(scorer, "n_labels", 0)
        if not n:
            raise ValueError("search-algorithm.n-labels required when "
                             "passing a raw score_fn")
        return scorer, n
    model_type = (config.sub("model").get("type") or "").lower()
    if model_type in ("aed", "attention", "encoder-decoder") \
            or (not model_type and config.sub("model").get("checkpoint")):
        from ..nn.scorer_factory import aed_prefix_scorer_from_config
        fn = aed_prefix_scorer_from_config(config)
        return fn, fn.n_labels
    raise ValueError(
        "label-synchronous searches need an autoregressive decoder "
        "score_fn: configure [model] type=aed with a checkpoint, or pass "
        "a callable programmatically (AED/transducer decoders: "
        "rasr_tpu.search.aed_cached / transducer_cached)")
