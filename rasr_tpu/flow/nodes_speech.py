"""Speech-layer Flow filters (reference registrations:
src/Speech/Module.cc:62-114) — alignment streams, lattice streams, and
model-backed scoring inside Flow networks.

Payloads: alignment streams carry `speech.alignment.Alignment` objects,
lattice streams carry `lattice.word_lattice.WordLattice` objects (one per
segment, matching the whole-segment Stream model).  All nodes here are
host-side (`host_only`): they are pointer-heavy bookkeeping, not TPU
compute — emission scoring (`feature-scorer`) hands the frames to the
batched GmmScorer, which is an XLA GEMM under the hood.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

from ..speech.alignment import Alignment, AlignmentCacheReader, \
    AlignmentCacheWriter
from .data import Stream
from .nodes import Node, register

ALIGN_DT = "flow-alignment"
LATTICE_DT = "flow-lattice"


class _SpeechNode(Node):
    host_only = True


def _segment_key(s: Stream) -> str:
    return str(s.meta.get("corpus_key", s.meta.get("id", "")))


# --------------------------------------------------------------------------
# alignment source / sink (src/Speech/AlignmentNode.cc AlignmentNode,
# AlignmentDumpNode)
# --------------------------------------------------------------------------


@register
class AlignmentNode(_SpeechNode):
    """speech-alignment: provide the current segment's alignment — read
    from an `alignment-cache` archive keyed by segment name, or computed
    by a programmatically injected aligner callable `_aligner(stream)`
    (the trainer tools pass the model-backed aligner this way; reference
    AlignmentNode computes via AlignmentGeneratorNode)."""
    filter_name = "speech-alignment"
    out_datatype = ALIGN_DT
    _readers: Dict[str, AlignmentCacheReader] = {}

    def apply(self, inputs):
        s = inputs.get("", next(iter(inputs.values())))
        aligner = self.attrs.get("_aligner")
        if aligner is not None:
            ali = aligner(s)
        else:
            path = self.attr("alignment-cache", self.attr("cache", ""))
            if not path:
                raise ValueError(f"node {self.name}: needs alignment-cache "
                                 "or a programmatic _aligner")
            reader = self._readers.get(path)
            if reader is None:
                reader = AlignmentCacheReader(path)
                self._readers[path] = reader
            ali = reader.read(_segment_key(s))
        return {"": s.with_data(ali)}


@register
class AlignmentDumpNode(_SpeechNode):
    """speech-alignment-dump: append the alignment as XML to attr `file`
    and pass it through (AlignmentDumpNode)."""
    filter_name = "speech-alignment-dump"

    def apply(self, inputs):
        s = inputs[""]
        path = self.attr("file", "")
        if path:
            with open(path, "a") as fh:
                fh.write(f'<segment name="{_segment_key(s)}">\n')
                s.data.write_xml(fh)
                fh.write("</segment>\n")
        return {"": s}


@register
class AlignedFeatureCacheWriterNode(_SpeechNode):
    """speech-aligned-feature-cache-writer: store (features, alignment)
    per segment into an alignment cache + feature cache pair
    (reference AlignedFeatureCache.cc)."""
    filter_name = "speech-aligned-feature-cache-writer"
    in_ports = ("", "alignment")
    _writers: Dict[str, AlignmentCacheWriter] = {}

    def apply(self, inputs):
        s = inputs[""]
        ali = inputs["alignment"].data
        path = self.attr("path", self.attr("file", "aligned.cache"))
        w = self._writers.get(path)
        if w is None:
            w = AlignmentCacheWriter(path)
            self._writers[path] = w
        w.write(_segment_key(s), ali)
        return {"": s}


@register
class AlignedFeatureCacheReaderNode(_SpeechNode):
    """speech-aligned-feature-cache-reader: emit the cached alignment for
    the incoming segment's features."""
    filter_name = "speech-aligned-feature-cache-reader"
    out_ports = ("", "alignment")
    out_datatype = None
    _readers: Dict[str, AlignmentCacheReader] = {}

    def apply(self, inputs):
        s = inputs[""]
        path = self.attr("path", self.attr("file", "aligned.cache"))
        r = self._readers.get(path)
        if r is None:
            r = AlignmentCacheReader(path)
            self._readers[path] = r
        ali = r.read(_segment_key(s))
        return {"": s, "alignment": s.with_data(ali)}


# --------------------------------------------------------------------------
# alignment transforms (src/Speech/AlignmentTransformNode.hh;
# weight math at src/Speech/Alignment.cc:455-560)
# --------------------------------------------------------------------------


def _copy(ali: Alignment) -> Alignment:
    return Alignment(ali.frames.copy(), ali.state_ids.copy(),
                     ali.weights.copy())


def _align_transform(name, doc):
    def deco(fn):
        class _T(_SpeechNode):
            __doc__ = doc
            filter_name = name
            out_datatype = ALIGN_DT

            def apply(self, inputs):
                s = inputs[""]
                return {"": s.with_data(fn(self, _copy(s.data)))}

        _T.__name__ = "AlignTransform_" + name
        register(_T)
        return fn
    return deco


@_align_transform("speech-alignment-add-weight",
                  "add attr `weight` to every item "
                  "(Alignment::addWeight, Alignment.cc:481).")
def _add_weight(node, ali):
    ali.weights += node.attr("weight", 0.0, float)
    return ali


@_align_transform("speech-alignment-multiply-weights",
                  "scale every weight by attr `factor` "
                  "(Alignment::multiplyWeights, Alignment.cc:519).")
def _mul_weights(node, ali):
    ali.weights *= node.attr("factor", node.attr("weight", 1.0, float),
                             float)
    return ali


@_align_transform("speech-alignment-clip-weights",
                  "clamp weights into [minimum-weight, maximum-weight] "
                  "(Alignment::clipWeights).")
def _clip_weights(node, ali):
    lo = node.attr("minimum-weight", 0.0, float)
    hi = node.attr("maximum-weight", 1.0, float)
    ali.weights = np.clip(ali.weights, lo, hi)
    return ali


@_align_transform("speech-alignment-filter-weights",
                  "drop items whose weight lies outside "
                  "[minimum-weight, maximum-weight] "
                  "(Alignment::filterWeights, Alignment.cc:487).")
def _filter_weights(node, ali):
    lo = node.attr("minimum-weight", 0.0, float)
    hi = node.attr("maximum-weight", np.inf, float)
    keep = (ali.weights >= lo) & (ali.weights <= hi)
    return Alignment(ali.frames[keep], ali.state_ids[keep],
                     ali.weights[keep])


@_align_transform("speech-alignment-reset-weights",
                  "set every weight to 1 (AlignmentResetWeightsNode).")
def _reset_weights(node, ali):
    ali.weights[:] = 1.0
    return ali


@_align_transform("speech-alignment-expm",
                  "weight <- exp(-weight), inf -> 0: -log scores to "
                  "probabilities (Alignment::expm, Alignment.cc:475).")
def _expm(node, ali):
    w = ali.weights.astype(np.float64)
    ali.weights = np.where(np.isinf(w), 0.0, np.exp(-w)).astype(np.float32)
    return ali


@_align_transform("speech-alignment-gamma-correction",
                  "weight <- weight^exponent for nonzero weights, "
                  "optionally renormalized per frame "
                  "(Alignment::gammaCorrection, Alignment.cc:509).")
def _gamma(node, ali):
    g = node.attr("exponent", 1.0, float)
    nz = ali.weights != 0.0
    ali.weights[nz] = np.exp(g * np.log(ali.weights[nz]))
    if node.attr("normalize", False, bool):
        _normalize_per_frame(ali)
    return ali


def _normalize_per_frame(ali: Alignment) -> None:
    """Per-frame weight normalization (Alignment::normalizeWeights)."""
    totals = np.zeros(int(ali.frames.max()) + 1 if len(ali) else 1,
                      np.float64)
    np.add.at(totals, ali.frames, ali.weights)
    totals[totals == 0.0] = 1.0
    ali.weights = (ali.weights / totals[ali.frames]).astype(np.float32)


@_align_transform("speech-alignment-combine-items",
                  "merge duplicate (frame, state) items, collecting "
                  "weights with `semiring-type` probability (sum) or "
                  "tropical (max) (Alignment::combineItems, "
                  "Alignment.cc:455).")
def _combine_items(node, ali):
    mode = node.attr("semiring-type", "probability")
    key = {}
    frames, states, weights = [], [], []
    for f, st, w in zip(ali.frames, ali.state_ids, ali.weights):
        k = (int(f), int(st))
        if k in key:
            i = key[k]
            if mode == "tropical":
                weights[i] = min(weights[i], w)
            else:
                weights[i] += w
        else:
            key[k] = len(frames)
            frames.append(f)
            states.append(st)
            weights.append(float(w))
    return Alignment(np.asarray(frames, np.uint32),
                     np.asarray(states, np.uint32),
                     np.asarray(weights, np.float32))


@register
class AlignmentMultiplyAlignmentsNode(_SpeechNode):
    """speech-alignment-multiply-alignments: intersect the input
    alignments, multiplying the weights of shared (frame, state) items
    (AlignmentMultiplyAlignmentsNode)."""
    filter_name = "speech-alignment-multiply-alignments"
    in_ports = ("*",)
    out_datatype = ALIGN_DT

    def apply(self, inputs):
        streams = list(inputs.values())
        tables = []
        for s in streams:
            a = s.data
            tables.append({(int(f), int(st)): float(w) for f, st, w
                           in zip(a.frames, a.state_ids, a.weights)})
        shared = set(tables[0])
        for t in tables[1:]:
            shared &= set(t)
        items = sorted(shared)
        w = [np.prod([t[k] for t in tables]) for k in items]
        return {"": streams[0].with_data(Alignment(
            np.asarray([k[0] for k in items], np.uint32),
            np.asarray([k[1] for k in items], np.uint32),
            np.asarray(w, np.float32)))}


@register
class AlignmentMapAlphabetNode(_SpeechNode):
    """speech-alignment-map-alphabet: map state ids through a mapping
    file of "<from> <to>" lines (AlignmentMapAlphabet; the reference maps
    between allophone-state alphabets of two acoustic models)."""
    filter_name = "speech-alignment-map-alphabet"
    out_datatype = ALIGN_DT
    _cache: Dict[str, Dict[int, int]] = {}

    def apply(self, inputs):
        s = inputs[""]
        path = self.attr("map-file", self.attr("file", ""))
        if not path:
            return {"": s}
        table = self._cache.get(path)
        if table is None:
            table = {}
            for line in open(path):
                parts = line.split()
                if len(parts) >= 2:
                    table[int(parts[0])] = int(parts[1])
            self._cache[path] = table
        ali = _copy(s.data)
        ali.state_ids = np.asarray(
            [table.get(int(x), int(x)) for x in ali.state_ids], np.uint32)
        return {"": s.with_data(ali)}


@register
class SetWeightsByTiedStateNode(_SpeechNode):
    """alignment-weights-by-tied-state-alignment-weights: overwrite each
    item's weight with the weight the `weights` input alignment assigns
    to the same (frame, state); missing pairs get attr `default-weight`
    (SetAlignmentWeightsByTiedStateAlignmentWeightsNode)."""
    filter_name = "alignment-weights-by-tied-state-alignment-weights"
    in_ports = ("", "weights")
    out_datatype = ALIGN_DT

    def apply(self, inputs):
        s = inputs[""]
        src = inputs["weights"].data
        table = {(int(f), int(st)): float(w) for f, st, w
                 in zip(src.frames, src.state_ids, src.weights)}
        default = self.attr("default-weight", 0.0, float)
        ali = _copy(s.data)
        ali.weights = np.asarray(
            [table.get((int(f), int(st)), default)
             for f, st in zip(ali.frames, ali.state_ids)], np.float32)
        return {"": s.with_data(ali)}


@register
class AlignmentToSequenceSelectionNode(_SpeechNode):
    """speech-alignment-to-sequence-selection: boolean per-frame selection
    marking frames whose aligned state is NOT in the discard class (attr
    `discard-states`: ids, e.g. silence states) — feeds
    generic-sequence-filter (AlignmentToSequenceSelectionNode)."""
    filter_name = "speech-alignment-to-sequence-selection"
    out_datatype = "vector-bool"

    def apply(self, inputs):
        s = inputs[""]
        ali = s.data
        discard = {int(float(v)) for v in
                   self.attr("discard-states", "").split()}
        n = int(ali.frames.max()) + 1 if len(ali) else 0
        sel = np.zeros(n, bool)
        for f, st in zip(ali.frames, ali.state_ids):
            if int(st) not in discard:
                sel[int(f)] = True
        return {"": s.with_data(sel)}


@register
class LinearSegmentationNode(_SpeechNode):
    """speech-linear-segmentation: uniform alignment of the segment's
    frames over a state path of attr `states` ("id id id ...") or
    `n-states` equal classes (reference LinearSegmenter)."""
    filter_name = "speech-linear-segmentation"
    out_datatype = ALIGN_DT

    def apply(self, inputs):
        s = inputs[""]
        T = int(np.asarray(s.data).shape[0])
        spec = self.attr("states", "")
        if spec:
            states = [int(float(v)) for v in spec.split()]
        else:
            states = list(range(self.attr("n-states", 1,
                                          lambda v: int(float(v)))))
        idx = np.minimum((np.arange(T) * len(states)) // max(T, 1),
                         len(states) - 1)
        ali = Alignment(np.arange(T),
                        np.asarray([states[i] for i in idx], np.uint32))
        return {"": s.with_data(ali)}


@register
class SegmentwiseFeaturesNode(_SpeechNode):
    """speech-segmentwise-features: collect the segment's features into
    one aggregate packet — whole-segment streams already are; relabels
    the datatype (SegmentwiseFeaturesNode)."""
    filter_name = "speech-segmentwise-features"
    out_datatype = "aggregate-vector-f32"

    def apply(self, inputs):
        s = inputs[""]
        return {"": s.with_data(s.data, meta={**s.meta, "aggregate": True})}


@register
class FeatureShiftAdaptorNode(_SpeechNode):
    """speech-feature-shift-adaptor: subtract a per-corpus-key bias
    vector read from a matrix file directory (attr `shift-path`/`file`;
    key resolved from stream meta — reference FeatureShiftAdaptor applies
    speaker-dependent shifts)."""
    filter_name = "speech-feature-shift-adaptor"
    _cache: Dict[str, np.ndarray] = {}

    def apply(self, inputs):
        s = inputs[""]
        base = self.attr("shift-path", self.attr("file", ""))
        if not base:
            return {"": s}
        key = _segment_key(s)
        path = base if os.path.isfile(base) else os.path.join(
            base, key.replace("/", "_") + ".xml")
        shift = self._cache.get(path)
        if shift is None:
            from ..math.matrix_io import read_vector
            shift = np.asarray(read_vector(path), np.float32)
            self._cache[path] = shift
        return {"": s.with_data(np.asarray(s.data) - shift[None, :])}


# --------------------------------------------------------------------------
# model-backed scoring (src/Speech/FeatureScorerNode.cc,
# src/Mm/StatePosteriorFeatureScorer.hh)
# --------------------------------------------------------------------------


class _ScorerBackedNode(_SpeechNode):
    _cache: Dict[str, object] = {}

    def _scorer(self):
        scorer = self.attrs.get("_scorer")
        if scorer is not None:
            return scorer
        path = self.attr("mixture-set.file", self.attr("file", ""))
        if not path:
            raise ValueError(f"node {self.name}: needs mixture-set.file "
                             "or a programmatic _scorer")
        scorer = self._cache.get(path)
        if scorer is None:
            from ..mm.mixture_set import MixtureSet
            from ..mm.scorer import GmmScorer
            scorer = GmmScorer(MixtureSet.read_pms(path))
            self._cache[path] = scorer
        return scorer


@register
class FeatureScorerNode(_ScorerBackedNode):
    """feature-scorer: per-frame -log emission likelihoods of every
    mixture/class as a vector stream (FeatureScorerNode; batched XLA
    GEMM under the hood instead of the reference's per-frame scorer)."""
    filter_name = "feature-scorer"

    def apply(self, inputs):
        s = inputs[""]
        scores = np.asarray(self._scorer().score(
            np.asarray(s.data, np.float32)))
        return {"": s.with_data(scores.astype(np.float32))}


@register
class StatePosteriorFeatureScorerNode(_ScorerBackedNode):
    """state-posterior-feature-scorer: per-frame class posteriors
    p(c|x) = softmax(-scale * score) (StatePosteriorFeatureScorer)."""
    filter_name = "state-posterior-feature-scorer"

    def apply(self, inputs):
        s = inputs[""]
        scores = np.asarray(self._scorer().score(
            np.asarray(s.data, np.float32)), np.float64)
        scale = self.attr("scale", 1.0, float)
        z = -scale * scores
        z -= z.max(axis=-1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=-1, keepdims=True)
        return {"": s.with_data(p.astype(np.float32))}


@register
class ModelCombinationNode(_SpeechNode):
    """model-combination: attach a lexicon+AM+LM bundle to the stream
    meta for downstream model-backed nodes (ModelCombinationNode; built
    from config by the tools, or injected programmatically as
    `_model_combination`)."""
    filter_name = "model-combination"

    def apply(self, inputs):
        s = inputs[""]
        mc = self.attrs.get("_model_combination")
        return {"": s.with_data(s.data,
                                meta={**s.meta, "model_combination": mc})}


# --------------------------------------------------------------------------
# lattice nodes (src/Speech/LatticeNodes.cc, LatticeRescorerNodes.cc)
# --------------------------------------------------------------------------


@register
class LatticeReadNode(_SpeechNode):
    """lattice-read: read the current segment's word lattice from an Flf
    archive (attr `archive`) or an HTK SLF directory (attr `slf-dir`)."""
    filter_name = "lattice-read"
    out_datatype = LATTICE_DT
    _readers: Dict[str, object] = {}

    def apply(self, inputs):
        s = inputs[""]
        key = _segment_key(s)
        slf_dir = self.attr("slf-dir", "")
        if slf_dir:
            from ..lattice.word_lattice import WordLattice
            lat = WordLattice.read_htk_slf(
                os.path.join(slf_dir, key.replace("/", "_") + ".lat"))
        else:
            path = self.attr("archive", self.attr("file", ""))
            if not path:
                raise ValueError(f"node {self.name}: needs archive/slf-dir")
            r = self._readers.get(path)
            if r is None:
                from ..flf.io import FlfArchiveReader
                r = FlfArchiveReader(path)
                self._readers[path] = r
            lat = r.read(key).to_word_lattice()
        return {"": s.with_data(lat)}


@register
class LatticeWriteNode(_SpeechNode):
    """lattice-write: write the lattice into an Flf archive or HTK SLF
    directory and pass it through."""
    filter_name = "lattice-write"
    _writers: Dict[str, object] = {}

    def apply(self, inputs):
        s = inputs[""]
        key = _segment_key(s)
        slf_dir = self.attr("slf-dir", "")
        if slf_dir:
            os.makedirs(slf_dir, exist_ok=True)
            s.data.write_htk_slf(
                os.path.join(slf_dir, key.replace("/", "_") + ".lat"))
        else:
            path = self.attr("archive", self.attr("file", "lattice.cache"))
            w = self._writers.get(path)
            if w is None:
                from ..flf.io import FlfArchiveWriter
                w = FlfArchiveWriter(path)
                self._writers[path] = w
            from ..flf.lattice import FlfLattice
            w.write(key, FlfLattice.from_word_lattice(s.data))
        return {"": s}


@register
class LatticeCacheNode(LatticeWriteNode):
    """lattice-cache: write-through lattice cache (LatticeCacheNode)."""
    filter_name = "lattice-cache"


@register
class LatticeCopyNode(_SpeechNode):
    """lattice-copy: deep-copy the lattice (LatticeCopyNode)."""
    filter_name = "lattice-copy"
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        import copy
        s = inputs[""]
        return {"": s.with_data(copy.deepcopy(s.data))}


@register
class LatticeSemiringNode(_SpeechNode):
    """lattice-semiring: rescale the (am, lm) score dimensions by attrs
    `am-scale` / `lm-scale` (LatticeSemiringNode sets semiring scales)."""
    filter_name = "lattice-semiring"
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        import copy
        s = inputs[""]
        lat = copy.deepcopy(s.data)
        am = self.attr("am-scale", 1.0, float)
        lm = self.attr("lm-scale", 1.0, float)
        for arcs in lat.arcs:
            for a in arcs:
                a.am_score *= am
                a.lm_score *= lm
        return {"": s.with_data(lat)}


@register
class LatticeSimpleModificationNode(_SpeechNode):
    """lattice-simple-modification: per-arc affine score edit
    (score <- scale*score + offset on the chosen `part`: am|lm)."""
    filter_name = "lattice-simple-modification"
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        import copy
        s = inputs[""]
        lat = copy.deepcopy(s.data)
        part = self.attr("part", "am")
        scale = self.attr("scale", 1.0, float)
        offset = self.attr("offset", 0.0, float)
        for arcs in lat.arcs:
            for a in arcs:
                if part == "am":
                    a.am_score = scale * a.am_score + offset
                else:
                    a.lm_score = scale * a.lm_score + offset
        return {"": s.with_data(lat)}


@register
class LatticeExpmNode(_SpeechNode):
    """lattice-expm: arc scores -log -> probability domain
    (exp(-score), inf -> 0; LatticeExpmNode)."""
    filter_name = "lattice-expm"
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        import copy
        s = inputs[""]
        lat = copy.deepcopy(s.data)

        def expm(v):
            return 0.0 if np.isinf(v) else float(np.exp(-v))

        for arcs in lat.arcs:
            for a in arcs:
                a.am_score = expm(a.am_score)
                a.lm_score = expm(a.lm_score)
        return {"": s.with_data(lat)}


@register
class LatticeWordPosteriorNode(_SpeechNode):
    """lattice-word-posterior: replace arc am-scores with forward-backward
    arc posteriors (LatticeWordPosteriorNode over Lattice::Posterior)."""
    filter_name = "lattice-word-posterior"
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        import copy
        s = inputs[""]
        lat = copy.deepcopy(s.data)
        post = lat.arc_posteriors(self.attr("am-scale", 1.0, float),
                                  self.attr("lm-scale", 1.0, float))
        for arcs, row in zip(lat.arcs, post):
            for a, p in zip(arcs, row):
                a.am_score = float(p)
                a.lm_score = 0.0
        return {"": s.with_data(lat)}


@register
class LatticeNBestNode(_SpeechNode):
    """lattice-nbest: reduce the lattice to its n best paths
    (LatticeNBestNode)."""
    filter_name = "lattice-nbest"
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        s = inputs[""]
        n = self.attr("n", 1, lambda v: int(float(v)))
        from ..lattice.word_lattice import lattice_from_nbest
        hyps = s.data.n_best(n, self.attr("am-scale", 1.0, float),
                             self.attr("lm-scale", 1.0, float))
        entries = [(words, score, 0.0) for words, score in hyps]
        out = lattice_from_nbest(entries)
        out.words = s.data.words
        return {"": s.with_data(out)}


@register
class LatticeDumpCtmNode(_SpeechNode):
    """lattice-dump-ctm: append the best path as CTM lines
    (conversation channel start duration word) to attr `file`
    (LatticeDumpCtmNode)."""
    filter_name = "lattice-dump-ctm"

    def apply(self, inputs):
        s = inputs[""]
        path = self.attr("file", "")
        if not path:
            return {"": s}
        lat = s.data
        shift = self.attr("frame-shift", 0.01, float)
        # exact arc-level best path: topological DP with arc backpointers
        # (word lattices are acyclic); a greedy label walk would pick the
        # wrong arc when a state emits the same word twice
        n = lat.n_states
        INF = float("inf")
        dist = [INF] * n
        back = [None] * n  # (prev_state, arc)
        dist[lat.initial] = 0.0
        indeg = [0] * n
        for src in range(n):
            for a in lat.arcs[src]:
                indeg[a.target] += 1
        order = []
        seen = {lat.initial}
        # Kahn order restricted to states reachable from initial
        from collections import deque
        dq = deque([lat.initial])
        while dq:
            u = dq.popleft()
            order.append(u)
            for a in lat.arcs[u]:
                indeg[a.target] -= 1
                if indeg[a.target] <= 0 and a.target not in seen:
                    seen.add(a.target)
                    dq.append(a.target)
        for u in order:
            if dist[u] == INF:
                continue
            for a in lat.arcs[u]:
                w = dist[u] + a.am_score + a.lm_score
                if w < dist[a.target]:
                    dist[a.target] = w
                    back[a.target] = (u, a)
        best_final, best = None, INF
        for st, fw in lat.final.items():
            if dist[st] + fw < best:
                best, best_final = dist[st] + fw, st
        lines = []
        st = best_final
        rev = []
        while st is not None and back[st] is not None:
            u, a = back[st]
            rev.append((u, a))
            st = u
        for u, a in reversed(rev):
            if a.word == 0:
                continue
            t0, t1 = lat.boundaries[u], lat.boundaries[a.target]
            word = (lat.words or {}).get(a.word, str(a.word))
            lines.append(f"{_segment_key(s)} 1 {t0 * shift:.2f} "
                         f"{(t1 - t0) * shift:.2f} {word}\n")
        with open(path, "a") as fh:
            fh.writelines(lines)
        return {"": s}


@register
class LatticeExpectationPosteriorNode(_SpeechNode):
    """lattice-expectation-posterior: emit per-frame expected arc
    posterior mass as a vector stream (LatticeExpectationPosteriorNode;
    uses the same FB quantities as nn.sequence_training)."""
    filter_name = "lattice-expectation-posterior"

    def apply(self, inputs):
        s = inputs[""]
        lat = s.data
        post = lat.arc_posteriors(self.attr("am-scale", 1.0, float),
                                  self.attr("lm-scale", 1.0, float))
        T = max(lat.boundaries) if lat.boundaries else 0
        acc = np.zeros(max(T, 1), np.float64)
        for src in range(lat.n_states):
            for a, p in zip(lat.arcs[src], post[src]):
                t0, t1 = lat.boundaries[src], lat.boundaries[a.target]
                if t1 > t0:
                    acc[t0:t1] += p
        return {"": s.with_data(acc[:, None].astype(np.float32))}


class _AccuracyRescorerNode(_SpeechNode):
    """Shared shape of the accuracy rescorer family: write per-arc
    accuracies into the am-score dimension (the reference stores
    accuracies as a rescored lattice part for discriminative training,
    src/Speech/LatticeRescorerNodes.cc)."""
    in_ports = ("", "reference")
    out_datatype = LATTICE_DT

    def _accuracies(self, lat, ref_stream, inputs=None):
        raise NotImplementedError

    def apply(self, inputs):
        import copy
        s = inputs[""]
        lat = copy.deepcopy(s.data)
        acc = self._accuracies(lat, inputs.get("reference"), inputs)
        for si in range(lat.n_states):
            for ai, a in enumerate(lat.arcs[si]):
                a.am_score = float(acc.get((si, ai), 0.0))
                a.lm_score = 0.0
        return {"": s.with_data(lat)}


@register
class ApproximatePhoneAccuracyNode(_AccuracyRescorerNode):
    """lattice-approximate-phone-accuracy: Povey MPE arc accuracies
    against the reference alignment intervals on the `reference` port
    (data: list of (word, start_frame, end_frame))."""
    filter_name = "lattice-approximate-phone-accuracy"

    def _accuracies(self, lat, ref_stream, inputs=None):
        from ..nn.sequence_training import povey_arc_accuracies
        return povey_arc_accuracies(lat, list(ref_stream.data))


@register
class FramePhoneAccuracyNode(_AccuracyRescorerNode):
    """lattice-frame-phone-accuracy: allophone-STATE-level frame-match
    accuracies (sMBR) against a numerator alignment on the `reference`
    port (reference src/Lattice/Accuracy.cc computes state-level frame
    accuracies).  Arc state paths come from stream meta
    `arc_alignments` when present; otherwise they are Viterbi-aligned
    on the fly from the `features` port + the node's mixture-set /
    state-map configuration (the _ArcRescorerBase plumbing).  Only when
    NEITHER source exists does the node fall back to word-granular
    frame counting (documented coarse approximation)."""
    filter_name = "lattice-frame-phone-accuracy"
    in_ports = ("", "reference", "features")

    def _accuracies(self, lat, ref_stream, inputs=None):
        ali = np.asarray(ref_stream.data)
        arc_alis = (ref_stream.meta or {}).get("arc_alignments")
        if arc_alis is None and inputs is not None \
                and inputs.get("features") is not None \
                and (self.attrs.get("_arc_states")
                     or self.attr("state-map", "")):
            arc_alis = _generate_arc_alignments(self, lat,
                                                inputs["features"])
        if arc_alis is not None:
            from ..nn.sequence_training import frame_accuracies
            return frame_accuracies(ali, lat, arc_alis)
        # word-granular fallback: counts frames whose aligned WORD id
        # matches (coarser than the reference's state accuracies)
        out = {}
        for si in range(lat.n_states):
            t0 = lat.boundaries[si]
            for ai, a in enumerate(lat.arcs[si]):
                t1 = lat.boundaries[a.target]
                seg = ali[t0:t1]
                out[(si, ai)] = float(np.sum(seg == a.word))
        return out


@register
class SoftFramePhoneAccuracyNode(FramePhoneAccuracyNode):
    """lattice-soft-frame-phone-accuracy: frame accuracies weighted by
    the reference's per-frame posterior weights (`reference` meta
    `frame_weights`; uniform when absent)."""
    filter_name = "lattice-soft-frame-phone-accuracy"

    def _accuracies(self, lat, ref_stream, inputs=None):
        acc = super()._accuracies(lat, ref_stream, inputs)
        w = (ref_stream.meta or {}).get("frame_weights")
        if w is None:
            return acc
        # scale each arc's accuracy by the mean reference frame weight
        # over its span (soft frame weighting on top of the exact
        # state-level accuracies)
        w = np.asarray(w, np.float64)
        out = {}
        for si in range(lat.n_states):
            t0 = lat.boundaries[si]
            for ai, a in enumerate(lat.arcs[si]):
                t1 = lat.boundaries[a.target]
                span = w[t0:t1]
                mean_w = float(span.mean()) if len(span) else 1.0
                out[(si, ai)] = acc.get((si, ai), 0.0) * mean_w
        return out


@register
class WeightedFramePhoneAccuracyNode(SoftFramePhoneAccuracyNode):
    """lattice-weighted-frame-phone-accuracy: soft frame accuracies
    scaled by attr `weight` (WeightedFramePhoneAccuracyLatticeRescorer)."""
    filter_name = "lattice-weighted-frame-phone-accuracy"

    def _accuracies(self, lat, ref_stream, inputs=None):
        acc = super()._accuracies(lat, ref_stream, inputs)
        w = self.attr("weight", 1.0, float)
        return {k: v * w for k, v in acc.items()}


@register
class NumeratorFromDenominatorNode(_SpeechNode):
    """lattice-numerator-from-denominator: extract the sub-lattice whose
    word sequence matches the reference transcription on the `reference`
    port (list of word ids) — the numerator lattice for MMI
    (NumeratorFromDenominatorNode)."""
    filter_name = "lattice-numerator-from-denominator"
    in_ports = ("", "reference")
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        s = inputs[""]
        lat = s.data
        ref = [int(w) for w in np.asarray(inputs["reference"].data).ravel()]
        from ..lattice.word_lattice import WordLattice
        out = WordLattice(words=lat.words)
        # states indexed by (lattice state, #ref words consumed)
        idx = {}

        def state_for(ls, k):
            if (ls, k) not in idx:
                idx[(ls, k)] = out.add_state(lat.boundaries[ls])
            return idx[(ls, k)]

        out.initial = state_for(lat.initial, 0)
        stack = [(lat.initial, 0)]
        seen = {(lat.initial, 0)}
        while stack:
            ls, k = stack.pop()
            for a in lat.arcs[ls]:
                if a.word == 0:  # epsilon: no word consumed
                    nk = k
                elif k < len(ref) and a.word == ref[k]:
                    nk = k + 1
                else:
                    continue
                out.add_arc(state_for(ls, k), state_for(a.target, nk),
                            a.word, a.am_score, a.lm_score)
                if (a.target, nk) not in seen:
                    seen.add((a.target, nk))
                    stack.append((a.target, nk))
        for ls, w in lat.final.items():
            if (ls, len(ref)) in idx:
                out.set_final(idx[(ls, len(ref))], w)
        return {"": s.with_data(out)}


@register
class LatticeArcAccumulatorNode(_SpeechNode):
    """lattice-arc-accumulator: accumulate the segment's features into a
    programmatically injected estimator (`_accumulator(features, lattice,
    posteriors)`), weighting frames by arc posteriors — the discriminative
    accumulation step (LatticeArcAccumulatorNode)."""
    filter_name = "lattice-arc-accumulator"
    in_ports = ("", "lattice")

    def apply(self, inputs):
        s = inputs[""]
        lat = inputs["lattice"].data
        acc = self.attrs.get("_accumulator")
        if acc is not None:
            post = lat.arc_posteriors()
            acc(np.asarray(s.data), lat, post)
        return {"": s}


@register
class AlignmentFromLatticeNode(_SpeechNode):
    """speech-alignment-from-lattice: per-frame alignment whose weights
    are summed arc posteriors of arcs covering the frame with the arc's
    word id as state (AlignmentFromLatticeNode; exact per-state
    posteriors require the arcs' inner state paths, which live in the
    generator — word granularity here)."""
    filter_name = "speech-alignment-from-lattice"
    out_datatype = ALIGN_DT

    def apply(self, inputs):
        s = inputs[""]
        lat = s.data
        post = lat.arc_posteriors()
        frames, states, weights = [], [], []
        for si in range(lat.n_states):
            t0 = lat.boundaries[si]
            for a, p in zip(lat.arcs[si], post[si]):
                t1 = lat.boundaries[a.target]
                for t in range(t0, t1):
                    frames.append(t)
                    states.append(max(a.word, 0))
                    weights.append(p)
        ali = Alignment(np.asarray(frames, np.uint32),
                        np.asarray(states, np.uint32),
                        np.asarray(weights, np.float32))
        return {"": s.with_data(ali)}


# --------------------------------------------------------------------------
# acoustic arc rescoring + arc alignment generation
# (src/Speech/LatticeRescorerNodes.cc AcousticLatticeRescorerNode,
# AlignmentAcousticLatticeRescorerNode; SegmentwiseAlignmentGenerator)
# --------------------------------------------------------------------------


def _viterbi_span(scores: np.ndarray, states) -> Tuple[float, np.ndarray]:
    """Left-to-right Viterbi of a state sequence over a frame span.
    scores: (T, S_emissions) -log emission scores; states: emission ids.
    Each state consumes >=1 frame (self-loops free).  Returns (score,
    per-frame state path)."""
    T = scores.shape[0]
    J = len(states)
    if T == 0 or J == 0 or J > T:
        return float(scores[:, states[0]].sum()) if (T and J) else 0.0, \
            np.full(T, states[0] if J else 0, np.int64)
    INF = np.inf
    D = np.full((T, J), INF)
    B = np.zeros((T, J), np.int8)  # 1 = advanced from j-1
    D[0, 0] = scores[0, states[0]]
    for t in range(1, T):
        emit = scores[t]
        stay = D[t - 1]
        adv = np.concatenate([[INF], D[t - 1, :-1]])
        take_adv = adv < stay
        D[t] = np.where(take_adv, adv, stay) + emit[list(states)]
        B[t] = take_adv
    j = J - 1
    path = np.zeros(T, np.int64)
    for t in range(T - 1, -1, -1):
        path[t] = states[j]
        if t and B[t, j]:
            j -= 1
    return float(D[T - 1, J - 1]), path


from typing import Tuple  # noqa: E402  (used by the helpers above)


class _ArcRescorerBase(_SpeechNode):
    """Shared plumbing: per-arc emission scores from a mixture set (attr
    `mixture-set.file` / programmatic `_scorer`) and a word -> emission
    state sequence map (programmatic `_arc_states(word)` or a text file
    `state-map` of "<word-id> <state> <state> ..." lines)."""
    in_ports = ("", "features")
    _scorer_cache: Dict[str, object] = {}
    _map_cache: Dict[str, Dict[int, list]] = {}

    def _scorer(self):
        scorer = self.attrs.get("_scorer")
        if scorer is not None:
            return scorer
        path = self.attr("mixture-set.file", self.attr("file", ""))
        if not path:
            raise ValueError(f"node {self.name}: needs mixture-set.file "
                             "or a programmatic _scorer")
        s = self._scorer_cache.get(path)
        if s is None:
            from ..mm.mixture_set import MixtureSet
            from ..mm.scorer import GmmScorer
            s = GmmScorer(MixtureSet.read_pms(path))
            self._scorer_cache[path] = s
        return s

    def _states_of(self, word: int):
        fn = self.attrs.get("_arc_states")
        if fn is not None:
            return fn(word)
        path = self.attr("state-map", "")
        if not path:
            return [0]
        table = self._map_cache.get(path)
        if table is None:
            table = {}
            for line in open(path):
                parts = line.split()
                if len(parts) >= 2:
                    table[int(parts[0])] = [int(v) for v in parts[1:]]
            self._map_cache[path] = table
        return table.get(word, [0])

    def _frame_scores(self, feat_stream) -> np.ndarray:
        return np.asarray(self._scorer().score(
            np.asarray(feat_stream.data, np.float32)))


def _generate_arc_alignments(node, lat, feat_stream):
    """Viterbi-align every arc's word-state sequence over its frame span
    (the SegmentwiseAlignmentGenerator the aligner stack uses), giving
    FramePhoneAccuracyNode exact state-level paths when the lattice
    carries none.  `node` supplies the same attrs _ArcRescorerBase
    reads (mixture-set / state-map / programmatic hooks)."""
    scorer = node.attrs.get("_scorer")
    if scorer is None:
        path = node.attr("mixture-set.file", node.attr("file", ""))
        scorer = _ArcRescorerBase._scorer_cache.get(path)
        if scorer is None:
            from ..mm.mixture_set import MixtureSet
            from ..mm.scorer import GmmScorer
            scorer = GmmScorer(MixtureSet.read_pms(path))
            _ArcRescorerBase._scorer_cache[path] = scorer
    states_fn = node.attrs.get("_arc_states")
    if states_fn is None:
        map_path = node.attr("state-map", "")
        table = _ArcRescorerBase._map_cache.get(map_path)
        if table is None:
            table = {}
            for line in open(map_path):
                parts = line.split()
                if len(parts) >= 2:
                    table[int(parts[0])] = [int(v) for v in parts[1:]]
            _ArcRescorerBase._map_cache[map_path] = table
        states_fn = lambda w: table.get(w, [0])  # noqa: E731
    scores = np.asarray(scorer.score(
        np.asarray(feat_stream.data, np.float32)))
    out = {}
    for src_state in range(lat.n_states):
        t0 = lat.boundaries[src_state]
        for ai, a in enumerate(lat.arcs[src_state]):
            t1 = lat.boundaries[a.target]
            span = scores[t0:t1]
            if len(span) == 0:
                out[(src_state, ai)] = []
                continue
            _, path = _viterbi_span(span, states_fn(a.word))
            out[(src_state, ai)] = path.tolist()
    return out


@register
class AcousticArcRescoringNode(_ArcRescorerBase):
    """lattice-acoustic-arc-rescoring: replace each word arc's am-score
    with the Viterbi alignment score of the word's emission-state
    sequence over the arc's frame span (AcousticLatticeRescorerNode —
    exact arc-level re-scoring against the acoustic model)."""
    filter_name = "lattice-acoustic-arc-rescoring"
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        import copy
        s = inputs[""]
        scores = self._frame_scores(inputs["features"])
        lat = copy.deepcopy(s.data)
        for src in range(lat.n_states):
            t0 = lat.boundaries[src]
            for a in lat.arcs[src]:
                if a.word == 0:
                    continue
                t1 = lat.boundaries[a.target]
                span = scores[t0:t1]
                sc, _ = _viterbi_span(span, self._states_of(a.word))
                a.am_score = sc
        return {"": s.with_data(lat)}


@register
class AlignmentAcousticRescoringNode(_ArcRescorerBase):
    """lattice-alignment-acoustic: arc am-scores summed along a GIVEN
    alignment's states within each arc span (port `alignment` —
    AlignmentAcousticLatticeRescorerNode scores against a fixed
    alignment instead of realigning)."""
    filter_name = "lattice-alignment-acoustic"
    in_ports = ("", "features", "alignment")
    out_datatype = LATTICE_DT

    def apply(self, inputs):
        import copy
        s = inputs[""]
        scores = self._frame_scores(inputs["features"])
        ali = inputs["alignment"].data
        state_of = {}
        for f, st, w in zip(ali.frames, ali.state_ids, ali.weights):
            state_of[int(f)] = int(st)
        lat = copy.deepcopy(s.data)
        for src in range(lat.n_states):
            t0 = lat.boundaries[src]
            for a in lat.arcs[src]:
                if a.word == 0:
                    continue
                t1 = lat.boundaries[a.target]
                total = 0.0
                for t in range(t0, min(t1, scores.shape[0])):
                    total += float(scores[t, state_of.get(t, 0)])
                a.am_score = total
        return {"": s.with_data(lat)}


@register
class LatticeAlignmentGeneratorNode(_ArcRescorerBase):
    """speech-lattice-alignment-generator: Viterbi-align the lattice's
    best path arc by arc and emit the per-frame state Alignment
    (SegmentwiseAlignmentGenerator over lattice arcs)."""
    filter_name = "speech-lattice-alignment-generator"
    in_ports = ("", "features")
    out_datatype = ALIGN_DT

    def apply(self, inputs):
        s = inputs[""]
        scores = self._frame_scores(inputs["features"])
        lat = s.data
        # best path arcs (same DP as lattice-dump-ctm)
        n = lat.n_states
        INF = float("inf")
        dist = [INF] * n
        back = [None] * n
        dist[lat.initial] = 0.0
        from collections import deque
        indeg = [0] * n
        for src in range(n):
            for a in lat.arcs[src]:
                indeg[a.target] += 1
        dq = deque([lat.initial])
        order, seen = [], {lat.initial}
        while dq:
            u = dq.popleft()
            order.append(u)
            for a in lat.arcs[u]:
                indeg[a.target] -= 1
                if indeg[a.target] <= 0 and a.target not in seen:
                    seen.add(a.target)
                    dq.append(a.target)
        for u in order:
            if dist[u] == INF:
                continue
            for a in lat.arcs[u]:
                w = dist[u] + a.am_score + a.lm_score
                if w < dist[a.target]:
                    dist[a.target] = w
                    back[a.target] = (u, a)
        best_final, best = None, INF
        for st, fw in lat.final.items():
            if dist[st] + fw < best:
                best, best_final = dist[st] + fw, st
        rev, st = [], best_final
        while st is not None and back[st] is not None:
            u, a = back[st]
            rev.append((u, a))
            st = u
        frames, states = [], []
        for u, a in reversed(rev):
            if a.word == 0:
                continue
            t0, t1 = lat.boundaries[u], min(lat.boundaries[a.target],
                                            scores.shape[0])
            if t1 <= t0:
                continue
            _, path = _viterbi_span(scores[t0:t1], self._states_of(a.word))
            frames.extend(range(t0, t1))
            states.extend(int(v) for v in path)
        return {"": s.with_data(Alignment(
            np.asarray(frames, np.uint32), np.asarray(states, np.uint32)))}
