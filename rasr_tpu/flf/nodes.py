"""Extended Flf node registry.

The reference registers ~80 lattice-processing node types
(src/Flf/NodeRegistration.hh; user doc doc/flf_nodes.rst).  This module
adds the second tier beyond processor.py's core workflow nodes: score
arithmetic over the multi-dimensional semiring, structure algorithms
(determinize/minimize/eps-removal/union/intersection/difference),
non-word closure filters, confidence computation, push-forward LM
rescoring, time-frame confusion networks + combination, oracle
alignment (lattice WER), IO helpers and dump/draw sinks.

Every node is config-constructed; lattices flow as FlfLattice (multi-dim
scores) or legacy WordLattice and are normalized by the base-class
helpers (processor.FlfNode.pull_lattice / pull_word_lattice).
"""

from __future__ import annotations

import math
import os
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from ..fsa.automaton import EPS
from ..lattice.word_lattice import WordLattice, lattice_from_nbest
from .lattice import FlfLattice
from .processor import FlfNode, register_node
from .semiring import FlfSemiring


def _floats(s: Optional[str]) -> List[float]:
    return [float(x) for x in s.split()] if s else []


# ---------------------------------------------------------------------------
# plumbing
# ---------------------------------------------------------------------------


@register_node("copy")
class CopyNode(FlfNode):
    """Pass-through (reference copy node)."""

    def work(self):
        return self.source(0).pull()


@register_node("cache")
@register_node("buffer")
class CacheNode(FlfNode):
    """Explicit caching pass-through; the per-segment pull cache already
    memoizes, this node exists for config parity (reference cache/buffer
    nodes)."""

    def work(self):
        return self.source(0).pull()


@register_node("dummy")
class DummyNode(FlfNode):
    """Empty lattice source (reference dummy node)."""

    def work(self) -> FlfLattice:
        lat = FlfLattice(semiring=FlfSemiring(), n_states=1)
        lat.final_states = np.asarray([0], np.int32)
        lat.final_scores = np.zeros((1, lat.semiring.n))
        return lat


@register_node("info")
@register_node("properties")
class InfoNode(FlfNode):
    """Logs lattice statistics and passes the lattice through
    (reference info/properties nodes)."""

    def work(self):
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        name = seg.full_name if seg is not None else "?"
        print(f"<info node=\"{self.name}\" segment=\"{name}\" "
              f"states={lat.n_states} arcs={lat.n_arcs} "
              f"semiring=\"{lat.semiring.describe()}\"/>")
        return self.source(0).pull()


# ---------------------------------------------------------------------------
# score arithmetic (multi-dim semiring)
# ---------------------------------------------------------------------------


class _DimOpNode(FlfNode):
    def _dim(self, lat: FlfLattice) -> int:
        key = self.config.get("key") or self.config.get("dim") or \
            lat.semiring.keys[0]
        return lat.semiring.id_of(key)


@register_node("add")
class AddNode(_DimOpNode):
    """Adds a constant to one score dimension (reference add node)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        lat.scores[:, self._dim(lat)] += float(self.config.get("value")
                                               or 0.0)
        return lat


@register_node("multiply")
class MultiplyNode(_DimOpNode):
    """Multiplies one score dimension by a constant (reference multiply)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        lat.scores[:, self._dim(lat)] *= float(self.config.get("value")
                                               or 1.0)
        return lat


@register_node("exp")
class ExpNode(_DimOpNode):
    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        d = self._dim(lat)
        lat.scores[:, d] = np.exp(lat.scores[:, d])
        return lat


@register_node("log")
class LogNode(_DimOpNode):
    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        d = self._dim(lat)
        with np.errstate(divide="ignore"):
            lat.scores[:, d] = np.log(lat.scores[:, d])
        return lat


@register_node("rescale")
class RescaleNode(FlfNode):
    """Changes dimension scales: `scales = <v0> <v1> ...` or per-key
    `<key>-scale = v` params (reference rescale node — O(1), scales live
    on the semiring)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        scales = _floats(self.config.get("scales"))
        sr = lat.semiring
        if scales:
            sr = sr.with_scales(scales)
        for key in sr.keys:
            v = self.config.get(f"{key}-scale")
            if v is not None:
                sr = sr.with_scale(key, float(v))
        out = lat.copy()
        out.semiring = sr
        return out


@register_node("change-semiring")
class ChangeSemiringNode(FlfNode):
    """Re-keys the score block onto a config-defined semiring
    (reference change-semiring node): `semiring.keys`,
    `semiring.scales`, `semiring.type`."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        sr = FlfSemiring.from_config(self.config.sub("semiring"),
                                     default=lat.semiring)
        return lat.change_semiring(sr)


@register_node("project")
class ProjectNode(FlfNode):
    """Keeps only the named score dimensions (`keys = am lm`)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        keys = (self.config.get("keys") or "").split()
        return lat.project_dims(keys or list(lat.semiring.keys))


@register_node("reduce")
class ReduceNode(FlfNode):
    """Collapses all (scaled) dimensions into a single `total` dimension
    (reference reduce node)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        total = lat.semiring.project(lat.scores)
        ftotal = lat.semiring.project(lat.final_scores)
        sr = FlfSemiring(("total",), (1.0,), lat.semiring.stype)
        return FlfLattice(
            semiring=sr, n_states=lat.n_states,
            sources=lat.sources.copy(), targets=lat.targets.copy(),
            labels=lat.labels.copy(),
            scores=np.asarray(total).reshape(-1, 1),
            boundaries=lat.boundaries.copy(), initial=lat.initial,
            final_states=lat.final_states.copy(),
            final_scores=np.atleast_1d(ftotal).reshape(-1, 1),
            words=lat.words)


@register_node("extend-by-penalty")
class ExtendByPenaltyNode(FlfNode):
    """Adds a word/arc penalty dimension: every non-eps arc gets
    `penalty` (reference extend-by-penalty node)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        penalty = float(self.config.get("penalty") or 0.0)
        key = self.config.get("key") or "penalty"
        scale = float(self.config.get("scale") or 1.0)
        vals = np.where(lat.labels != EPS, penalty, 0.0)
        return lat.extend_dim(key, arc_values=vals, scale=scale)


@register_node("extend-by-pronunciation-score")
class ExtendByPronunciationNode(FlfNode):
    """Adds a pronunciation-score dimension from the lexicon
    (reference extend-by-pronunciation-score; LemmaPronunciation scores
    are -log weights, src/Bliss/Lexicon.hh)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        lexicon = self.network.context.get("lexicon")
        key = self.config.get("key") or "pronunciation"
        scale = float(self.config.get("scale") or 1.0)
        words = lat.words or {}
        score_of: Dict[int, float] = {}
        for lab in np.unique(lat.labels):
            lab = int(lab)
            if lab == EPS:
                continue
            orth = words.get(lab)
            lemmas = (lexicon.lemmas_by_orth(orth)
                      if (lexicon and orth) else [])
            if lemmas and lemmas[0].pronunciations:
                score_of[lab] = min(p.score
                                    for p in lemmas[0].pronunciations)
            else:
                score_of[lab] = 0.0
        vals = np.asarray([score_of.get(int(l), 0.0) for l in lat.labels])
        return lat.extend_dim(key, arc_values=vals, scale=scale)


@register_node("extend-by-acoustic-score")
class ExtendByAcousticNode(FlfNode):
    """Adds per-arc acoustic scores provided through the network context
    key `arc-acoustic-scores` (a callable lattice -> (A,) array) or a
    constant; reference extend-by-acoustic-score rescores arcs against
    an acoustic model."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        key = self.config.get("key") or "am"
        scale = float(self.config.get("scale") or 1.0)
        fn = self.network.context.get("arc-acoustic-scores")
        vals = (np.asarray(fn(lat), np.float64) if callable(fn)
                else np.full(lat.n_arcs,
                             float(self.config.get("value") or 0.0)))
        return lat.extend_dim(key, arc_values=vals, scale=scale)


@register_node("map-labels")
class MapLabelsNode(FlfNode):
    """Relabels words via a mapping file of `from to` lines (empty `to`
    maps to eps) or `lower=true` case folding (reference map-alphabet /
    map-labels nodes)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.mapping: Dict[str, str] = {}
        path = self.config.get("mapping-file")
        if path:
            with open(path, "r", encoding="utf-8") as fh:
                for line in fh:
                    parts = line.split()
                    if parts:
                        self.mapping[parts[0]] = \
                            parts[1] if len(parts) > 1 else ""
        self.lower = (self.config.get("lower") or "").lower() == "true"

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        words = dict(lat.words or {})
        rev = {w: i for i, w in words.items()}

        def target_id(orth: str) -> int:
            if orth == "":
                return EPS
            if orth not in rev:
                nid = max(words, default=0) + 1
                words[nid] = orth
                rev[orth] = nid
            return rev[orth]

        relabel: Dict[int, int] = {}
        for lab in np.unique(lat.labels):
            lab = int(lab)
            if lab == EPS:
                continue
            orth = words.get(lab, f"w{lab}")
            new = self.mapping.get(orth, orth)
            if self.lower:
                new = new.lower()
            relabel[lab] = target_id(new) if new != orth else lab
        lat.labels = np.asarray([relabel.get(int(l), int(l))
                                 for l in lat.labels], np.int32)
        lat.words = words
        return lat


# ---------------------------------------------------------------------------
# structure algorithms
# ---------------------------------------------------------------------------


@register_node("remove-epsilons")
@register_node("remove-null-arcs")
class RemoveEpsilonsNode(FlfNode):
    def work(self) -> FlfLattice:
        return self.pull_lattice(0).remove_epsilons()


@register_node("determinize")
class DeterminizeNode(FlfNode):
    def work(self) -> WordLattice:
        from ..lattice.transform import determinize_lattice
        return determinize_lattice(self.pull_word_lattice(0))


@register_node("minimize")
class MinimizeNode(FlfNode):
    def work(self) -> WordLattice:
        from ..lattice.transform import minimize_lattice
        return minimize_lattice(self.pull_word_lattice(0))


@register_node("unite")
class UniteNode(FlfNode):
    """Union of all inputs (reference unite node)."""

    def work(self) -> FlfLattice:
        out = self.pull_lattice(0)
        for i in range(1, len(self.links)):
            out = out.union(self.pull_lattice(i))
        return out


@register_node("intersection")
class IntersectionNode(FlfNode):
    def work(self) -> FlfLattice:
        out = self.pull_lattice(0)
        for i in range(1, len(self.links)):
            out = out.intersection(self.pull_lattice(i))
        return out


@register_node("difference")
class DifferenceNode(FlfNode):
    def work(self) -> FlfLattice:
        return self.pull_lattice(0).difference(self.pull_lattice(1))


@register_node("concatenate-lattices")
class ConcatenateNode(FlfNode):
    def work(self) -> FlfLattice:
        out = self.pull_lattice(0)
        for i in range(1, len(self.links)):
            out = out.concatenate(self.pull_lattice(i))
        return out


@register_node("mesh")
class MeshNode(FlfNode):
    """Time-conditioned lattice: states merged by word boundary
    (reference mesh node / Lattice time conditioning)."""

    def work(self) -> WordLattice:
        from ..lattice.transform import time_conditioned
        return time_conditioned(self.pull_word_lattice(0))


@register_node("fit")
class FitNode(FlfNode):
    """Makes boundaries monotone along arcs and trims unreachable states
    (reference fit node normalizes lattice geometry to the segment)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        order = lat.topological()
        out_order = np.argsort(lat.sources, kind="stable")
        out_ptr = np.searchsorted(lat.sources[out_order],
                                  np.arange(lat.n_states + 1))
        for s in order:
            for k in out_order[out_ptr[s]:out_ptr[s + 1]]:
                t = int(lat.targets[k])
                if lat.boundaries[t] < lat.boundaries[s]:
                    lat.boundaries[t] = lat.boundaries[s]
        return lat.connect()


@register_node("redundancy-removal")
class RedundancyRemovalNode(FlfNode):
    """Collapses duplicate arcs (same source/target/label), keeping the
    semiring-better score vector (reference redundancy-removal)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        best: Dict[Tuple[int, int, int], int] = {}
        w = lat.semiring.project(lat.scores)
        for k in range(lat.n_arcs):
            key = (int(lat.sources[k]), int(lat.targets[k]),
                   int(lat.labels[k]))
            if key not in best or w[k] < w[best[key]]:
                best[key] = k
        keep = np.zeros(lat.n_arcs, bool)
        keep[list(best.values())] = True
        out = lat.copy()
        out.sources = out.sources[keep]
        out.targets = out.targets[keep]
        out.labels = out.labels[keep]
        out.scores = out.scores[keep]
        return out


# ---------------------------------------------------------------------------
# non-word closure filters
# ---------------------------------------------------------------------------


class _NonWordBase(FlfNode):
    def _non_word_ids(self, lat: FlfLattice) -> set:
        """Arcs counted as non-words: eps plus configured orths (default:
        bracketed tokens like [SILENCE], matching the reference's
        non-word lemma convention)."""
        extra = set((self.config.get("non-words") or "").split())
        ids = {EPS}
        for i, w in (lat.words or {}).items():
            if w in extra or (not extra and w.startswith("[")
                              and w.endswith("]")):
                ids.add(i)
        return ids


@register_node("non-word-closure-filter")
@register_node("non-word-closure-removal-filter")
class NonWordRemovalNode(_NonWordBase):
    """Maps non-word arcs to eps and eliminates them, folding their
    scores into adjacent word arcs (reference non-word closure filters,
    src/Flf/NonWordFilter.cc)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        ids = self._non_word_ids(lat)
        lat.labels = np.asarray([EPS if int(l) in ids else int(l)
                                 for l in lat.labels], np.int32)
        return lat.remove_epsilons()


@register_node("non-word-closure-normalization-filter")
@register_node("non-word-closure-weak-determinization-filter")
@register_node("non-word-closure-strong-determinization-filter")
class NonWordNormalizationNode(_NonWordBase):
    """Removes non-word arcs then deduplicates resulting parallel arcs."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        ids = self._non_word_ids(lat)
        lat.labels = np.asarray([EPS if int(l) in ids else int(l)
                                 for l in lat.labels], np.int32)
        lat = lat.remove_epsilons()
        best: Dict[Tuple[int, int, int], int] = {}
        w = lat.semiring.project(lat.scores)
        for k in range(lat.n_arcs):
            key = (int(lat.sources[k]), int(lat.targets[k]),
                   int(lat.labels[k]))
            if key not in best or w[k] < w[best[key]]:
                best[key] = k
        keep = np.zeros(lat.n_arcs, bool)
        if len(best):
            keep[list(best.values())] = True
        out = lat.copy()
        out.sources = out.sources[keep]
        out.targets = out.targets[keep]
        out.labels = out.labels[keep]
        out.scores = out.scores[keep]
        return out


# ---------------------------------------------------------------------------
# confidence / posteriors
# ---------------------------------------------------------------------------


@register_node("add-word-confidence")
class AddWordConfidenceNode(FlfNode):
    """Adds a `confidence` dimension = arc posterior (reference
    add-word-confidence over FwdBwd posteriors)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        key = self.config.get("key") or "confidence"
        post = lat.posteriors()
        # confidence stored as probability; scale 0 => does not affect
        # the projected weight unless the user asks for it
        return lat.extend_dim(key, arc_values=post,
                              scale=float(self.config.get("scale") or 0.0))


# ---------------------------------------------------------------------------
# LM rescoring
# ---------------------------------------------------------------------------


@register_node("push-forward-rescoring")
class PushForwardRescoringNode(FlfNode):
    """k-best push-forward LM rescoring (reference
    src/Flf/PushForwardRescoring.cc): extract n best by current scores,
    re-rank with exact LM sequence scores, emit the rescored n-best
    lattice."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        lm = self.network.context.get("lm")
        n = int(self.config.get("n") or 64)
        scale = float(self.config.get("scale") or 1.0)
        mode = self.config.get("mode") or "push-forward"
        if mode == "n-best":
            from ..lattice.rescore import nbest_rescore
            rescored = nbest_rescore(lattice, lm, n=n, scale=scale)
        else:
            # per-state history beam (the reference algorithm) — works
            # with unbounded-history LMs, e.g. the neural LM
            from ..lattice.rescore import push_forward_rescore
            rescored = push_forward_rescore(
                lattice, lm, scale=scale,
                k=int(self.config.get("history-beam") or 16), n_out=n)
        return lattice_from_nbest(
            [(labels, score, 0.0) for labels, score in rescored],
            words=lattice.words)


@register_node("decode-rescore-lm")
class DecodeRescoreLmNode(FlfNode):
    """compose-with-lm + best in one node (reference decode-rescore-lm)."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        lm = self.network.context.get("lm")
        scale = float(self.config.get("scale") or 1.0)
        from ..lattice.rescore import compose_with_lm
        composed = compose_with_lm(lattice, lm, scale=scale)
        labels, score = composed.best()
        out = WordLattice(words=lattice.words)
        s = out.add_state(0)
        out.initial = s
        for i, lab in enumerate(labels):
            t = out.add_state(i + 1)
            out.add_arc(s, t, lab, score / max(len(labels), 1), 0.0)
            s = t
        out.set_final(s)
        return out


# ---------------------------------------------------------------------------
# confusion networks / combination / evaluation
# ---------------------------------------------------------------------------


@register_node("time-frame-confusion-network")
class TimeframeCnNode(FlfNode):
    """Builds the fCN and decodes it (min-fWER) into a linear
    time-stamped lattice (reference TimeframeConfusionNetwork nodes)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        from .timeframe_cn import build_timeframe_cn
        cn = build_timeframe_cn(lat).normalized()
        self.network.context.setdefault("fcn", {})[self.name] = cn
        return _linear_from_decode(cn, lat)


@register_node("fcn-combination")
class FcnCombinationNode(FlfNode):
    """Posterior-level system combination: builds fCNs for every input
    lattice, frame-averages them (weights = `weights` config), decodes
    the combined fCN (reference fCN combination)."""

    def work(self) -> FlfLattice:
        from .timeframe_cn import build_timeframe_cn, combine_timeframe_cns
        cns = [build_timeframe_cn(self.pull_lattice(i)).normalized()
               for i in range(len(self.links))]
        weights = _floats(self.config.get("weights")) or None
        combined = combine_timeframe_cns(cns, weights)
        self.network.context.setdefault("fcn", {})[self.name] = combined
        return _linear_from_decode(combined, self.pull_lattice(0))


def _linear_from_decode(cn, ref_lat: FlfLattice) -> FlfLattice:
    labels, bounds, confs = cn.decode()
    sr = FlfSemiring(("confidence",), (1.0,))
    arcs = []
    state_bounds = [bounds[0][0] if bounds else 0]
    for i, (lab, (t0, t1), c) in enumerate(zip(labels, bounds, confs)):
        arcs.append((i, i + 1, lab, (-math.log(max(c, 1e-10)),)))
        state_bounds.append(t1)
    return FlfLattice.build(sr, len(labels) + 1, arcs,
                            boundaries=state_bounds, initial=0,
                            finals={len(labels): (0.0,)},
                            words=cn.words or ref_lat.words)


@register_node("oracle-alignment")
class OracleAlignmentNode(FlfNode):
    """Aligns the lattice against the segment orthography and logs the
    oracle (lattice) WER; emits the oracle path as a linear lattice
    (reference oracle-alignment node; 'lattice' evaluation mode of
    src/Bliss/Evaluation.hh:31)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.total_errors = 0
        self.total_ref = 0

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        from .evaluate import oracle_alignment
        res = oracle_alignment(lat, (seg.orth or "").split())
        self.total_errors += res.errors
        self.total_ref += res.ref_len
        print(f"<oracle segment=\"{seg.full_name}\" errors={res.errors} "
              f"ref={res.ref_len} wer={100.0 * res.wer:.2f}%/>")
        sr = lat.semiring
        arcs = []
        for i, k in enumerate(res.arc_path):
            arcs.append((i, i + 1, int(lat.labels[k]),
                         tuple(lat.scores[k])))
        bounds = [0] + [int(lat.boundaries[lat.targets[k]])
                        for k in res.arc_path]
        return FlfLattice.build(sr, len(res.arc_path) + 1, arcs,
                                boundaries=bounds, initial=0,
                                finals={len(res.arc_path):
                                        (0.0,) * sr.n},
                                words=lat.words)

    def finalize(self):
        wer = self.total_errors / max(self.total_ref, 1)
        print(f"<oracle-summary errors={self.total_errors} "
              f"ref={self.total_ref} lattice-wer={100.0 * wer:.2f}%/>")


# ---------------------------------------------------------------------------
# IO / sinks
# ---------------------------------------------------------------------------


@register_node("reader")
class ReaderNode(FlfNode):
    """Reads Flf-native lattices: `path` is a directory of
    <segment>.flf descriptors or a lattice archive (reference reader
    node over FlfIo)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or "."
        self._archive = None
        if os.path.isfile(self.path) or self.path.endswith(".cache"):
            from .io import FlfArchiveReader
            self._archive = FlfArchiveReader(self.path)

    def work(self) -> FlfLattice:
        seg = self.network.current_segment
        if self._archive is not None:
            return self._archive.read(seg.full_name)
        from .io import read_flf_file
        return read_flf_file(os.path.join(
            self.path, seg.full_name.replace("/", "_") + ".flf"))


@register_node("writer")
class WriterNode(FlfNode):
    """Writes Flf-native lattices (descriptor + binary parts) to a
    directory or archive (reference writer node)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or "."
        self._archive = None
        if self.path.endswith(".cache"):
            from .io import FlfArchiveWriter
            self._archive = FlfArchiveWriter(self.path)
        else:
            os.makedirs(self.path, exist_ok=True)

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        if self._archive is not None:
            self._archive.write(seg.full_name, lat)
        else:
            from .io import write_flf_file
            write_flf_file(lat, os.path.join(
                self.path, seg.full_name.replace("/", "_") + ".flf"))
        return lat

    def finalize(self):
        if self._archive is not None:
            self._archive.close()


@register_node("ctm-reader")
class CtmReaderNode(FlfNode):
    """Builds linear lattices from a CTM file keyed by recording name
    (reference ctm-reader node)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.frame_shift = float(self.config.get("frame-shift") or 0.01)
        self.entries: Dict[str, List[Tuple[float, float, str, float]]] = {}
        path = self.config.get("path") or ""
        with open(path, "r", encoding="utf-8") as fh:
            for line in fh:
                parts = line.split()
                if len(parts) < 5 or line.startswith(";;"):
                    continue
                rec, _ch, start, dur, word = parts[:5]
                conf = float(parts[5]) if len(parts) > 5 else 1.0
                self.entries.setdefault(rec, []).append(
                    (float(start), float(dur), word, conf))

    def work(self) -> FlfLattice:
        seg = self.network.current_segment
        rows = [r for r in self.entries.get(seg.recording.name, [])
                if seg.start <= r[0] < (seg.end or float("inf"))]
        rows.sort()
        words: Dict[int, str] = {}
        rev: Dict[str, int] = {}
        sr = FlfSemiring(("confidence",), (1.0,))
        arcs = []
        bounds = [int(round((rows[0][0] - seg.start) / self.frame_shift))
                  if rows else 0]
        for i, (start, dur, word, conf) in enumerate(rows):
            if word not in rev:
                rev[word] = len(rev) + 1
                words[rev[word]] = word
            arcs.append((i, i + 1, rev[word],
                         (-math.log(max(conf, 1e-10)),)))
            bounds.append(int(round((start + dur - seg.start)
                                    / self.frame_shift)))
        return FlfLattice.build(sr, len(rows) + 1, arcs, boundaries=bounds,
                                initial=0, finals={len(rows): (0.0,)},
                                words=words)


@register_node("string-to-lattice")
class StringToLatticeNode(FlfNode):
    """Linear lattice from the segment orthography (reference
    string-to-lattice node)."""

    def work(self) -> FlfLattice:
        seg = self.network.current_segment
        tokens = (seg.orth or "").split()
        words = {i + 1: w for i, w in enumerate(dict.fromkeys(tokens))}
        rev = {w: i for i, w in words.items()}
        sr = FlfSemiring(("am", "lm"))
        arcs = [(i, i + 1, rev[w], (0.0, 0.0))
                for i, w in enumerate(tokens)]
        return FlfLattice.build(sr, len(tokens) + 1, arcs,
                                boundaries=list(range(len(tokens) + 1)),
                                initial=0,
                                finals={len(tokens): (0.0, 0.0)},
                                words=words)


@register_node("fsa-reader")
class FsaReaderNode(FlfNode):
    """Reads an AT&T acceptor per segment from `path` (reference
    fsa-reader node)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or "."

    def work(self) -> FlfLattice:
        from ..fsa.io import read_att
        seg = self.network.current_segment
        fsa = read_att(os.path.join(
            self.path, seg.full_name.replace("/", "_") + ".fsa"))
        sr = FlfSemiring(("total",), (1.0,))
        arcs = []
        for s in range(fsa.n_states):
            for a in fsa.arcs[s]:
                arcs.append((s, a.target, a.ilabel, (a.weight,)))
        finals = {s: (w,) for s, w in fsa.final.items()}
        return FlfLattice.build(sr, fsa.n_states, arcs,
                                boundaries=[0] * fsa.n_states,
                                initial=fsa.initial, finals=finals)


@register_node("select-n-best")
class SelectNBestNode(FlfNode):
    """Selects the k-th (or a range of) hypotheses from an n-best view
    (reference select-n-best)."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        first = int(self.config.get("first") or 0)
        count = int(self.config.get("n") or 1)
        hyps = lattice.n_best(first + count)
        hyps = hyps[first:first + count]
        return lattice_from_nbest([(labels, score, 0.0)
                                   for labels, score in hyps],
                                  words=lattice.words)


@register_node("dump-n-best")
class DumpNBestNode(FlfNode):
    """Writes n-best text per segment (reference dump-n-best)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.n = int(self.config.get("n") or 10)
        self.path = self.config.get("path") or ""
        self.lines: List[str] = []

    def work(self):
        lattice = self.pull_word_lattice(0)
        seg = self.network.current_segment
        words = lattice.words or {}
        for rank, (labels, score) in enumerate(lattice.n_best(self.n)):
            text = " ".join(words.get(l, str(l)) for l in labels
                            if l != EPS)
            self.lines.append(
                f"{seg.full_name} {rank} {score:.4f} {text}")
        return self.source(0).pull()

    def finalize(self):
        if self.path:
            with open(self.path, "w", encoding="utf-8") as fh:
                fh.write("\n".join(self.lines) + "\n")
        else:
            for line in self.lines:
                print(line)


@register_node("dump-traceback")
class DumpTracebackNode(FlfNode):
    """Writes the best path with word boundaries as text (reference
    dump-traceback)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or ""
        self.frame_shift = float(self.config.get("frame-shift") or 0.01)
        self.lines: List[str] = []

    def work(self):
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        labels, score, path = lat.best()
        for k in path:
            if int(lat.labels[k]) == EPS:
                continue
            t0 = int(lat.boundaries[lat.sources[k]]) * self.frame_shift
            t1 = int(lat.boundaries[lat.targets[k]]) * self.frame_shift
            self.lines.append(f"{seg.full_name} {t0:.2f} {t1:.2f} "
                              f"{lat.word_of(int(lat.labels[k]))}")
        return self.source(0).pull()

    def finalize(self):
        if self.path:
            with open(self.path, "w", encoding="utf-8") as fh:
                fh.write("\n".join(self.lines) + "\n")


@register_node("dump-vocab")
class DumpVocabNode(FlfNode):
    """Collects the vocabulary over all lattices (reference dump-vocab)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.vocab: set = set()
        self.path = self.config.get("path") or ""

    def work(self):
        lat = self.pull_lattice(0)
        for lab in np.unique(lat.labels):
            if int(lab) != EPS:
                self.vocab.add(lat.word_of(int(lab)))
        return self.source(0).pull()

    def finalize(self):
        text = "\n".join(sorted(self.vocab)) + "\n"
        if self.path:
            with open(self.path, "w", encoding="utf-8") as fh:
                fh.write(text)
        else:
            print(text, end="")


@register_node("drawer")
class DrawerNode(FlfNode):
    """Graphviz dot output per segment (reference drawer node)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or "."
        os.makedirs(self.path, exist_ok=True)

    def work(self):
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        out = [f'digraph "{seg.full_name}" {{', "rankdir=LR;"]
        for i, s in enumerate(lat.final_states):
            out.append(f"n{int(s)} [shape=doublecircle];")
        w = lat.semiring.project(lat.scores)
        for k in range(lat.n_arcs):
            out.append(
                f"n{int(lat.sources[k])} -> n{int(lat.targets[k])} "
                f'[label="{lat.word_of(int(lat.labels[k]))}/{w[k]:.2f}"];')
        out.append("}")
        fn = os.path.join(self.path,
                          seg.full_name.replace("/", "_") + ".dot")
        with open(fn, "w", encoding="utf-8") as fh:
            fh.write("\n".join(out) + "\n")
        return self.source(0).pull()


# ---------------------------------------------------------------------------
# third tier: structure/compose/decode/alignment nodes
# (reference NodeRegistration.hh: append, filter, clean-up, map-alphabet,
# compose-with-fsa, dump-all-pairs-best, local-cost-decoder,
# forced-alignment, segment-builder)
# ---------------------------------------------------------------------------


@register_node("append")
class AppendNode(FlfNode):
    """Sequential concatenation of two lattices (reference append node):
    every path of lattice 0 followed by every path of lattice 1."""

    def work(self):
        return self.pull_lattice(0).concatenate(self.pull_lattice(1))


@register_node("filter")
class FilterNode(FlfNode):
    """Segment gate (reference filter node): pass the lattice only for
    segments matching `segment-list` (file of full names) and/or with at
    least `min-arcs` arcs; otherwise emit an empty lattice."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.allowed = None
        seg_list = self.config.get("segment-list")
        if seg_list:
            with open(seg_list) as fh:
                self.allowed = {l.strip() for l in fh if l.strip()}
        self.min_arcs = int(self.config.get("min-arcs") or 0)

    def work(self):
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        ok = (self.allowed is None or seg.full_name in self.allowed) \
            and lat.n_arcs >= self.min_arcs
        if ok:
            return lat
        empty = FlfLattice(semiring=lat.semiring, n_states=1,
                           words=lat.words)
        empty.final_states = np.asarray([0], np.int32)
        empty.final_scores = np.zeros((1, lat.semiring.n))
        return empty


@register_node("clean-up")
class CleanUpNode(FlfNode):
    """Trim + normalize (reference clean-up): drop states off accepting
    paths and remove epsilon arcs."""

    def work(self):
        return self.pull_lattice(0).connect().remove_epsilons()


@register_node("map-alphabet")
class MapAlphabetNode(FlfNode):
    """Relabel arcs through a mapping file of `from to` word pairs
    (reference map-alphabet); unmapped labels pass through; mapping to
    `<eps>` erases the label."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.mapping: Dict[str, str] = {}
        path = self.config.get("mapping-file")
        if path:
            with open(path, encoding="utf-8") as fh:
                for line in fh:
                    parts = line.split()
                    if len(parts) == 2:
                        self.mapping[parts[0]] = parts[1]

    def work(self):
        lat = self.pull_lattice(0).copy()
        words = dict(lat.words or {})
        rev = {w: i for i, w in words.items()}
        labels = lat.labels.copy()
        for k in range(lat.n_arcs):
            lab = int(labels[k])
            if lab == EPS:
                continue
            word = words.get(lab, "")
            to = self.mapping.get(word)
            if to is None:
                continue
            if to == "<eps>":
                labels[k] = EPS
            else:
                if to not in rev:
                    new_id = max(words) + 1 if words else 1
                    words[new_id] = to
                    rev[to] = new_id
                labels[k] = rev[to]
        lat.labels = labels
        lat.words = words
        return lat


@register_node("compose-with-fsa")
@register_node("compose")
class ComposeWithFsaNode(FlfNode):
    """Compose the lattice's acceptor view with an AT&T FSA from `file`
    (reference compose-with-fsa / compose-matching): constrains paths and
    adds the automaton's weights into dimension `key` (default: the
    semiring's lm dimension, else 0)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        from ..fsa.io import read_att
        path = self.config.get("file")
        self.fsa = read_att(path) if path else None
        self.key = self.config.get("key") or None

    def work(self):
        from ..fsa.automaton import compose as fsa_compose
        lat = self.pull_lattice(0)
        if self.fsa is None:
            return lat
        # relabel the constraint automaton's symbols into lattice ids
        rev = {w: i for i, w in (lat.words or {}).items()}
        g = self.fsa
        relabeled = type(g)(semiring=g.semiring)
        for _ in range(g.n_states):
            relabeled.add_state()
        relabeled.initial = g.initial
        relabeled.final = dict(g.final)
        sym = g.input_alphabet or {}
        for s in range(g.n_states):
            for arc in g.arcs[s]:
                word = sym.get(arc.ilabel, str(arc.ilabel))
                lab = EPS if arc.ilabel == EPS else rev.get(word, -1)
                if lab >= 0:
                    relabeled.add_arc(s, arc.target, lab, lab, arc.weight)
        composed = fsa_compose(lat.to_automaton(), relabeled)
        dim = (lat.semiring.id_of(self.key)
               if self.key else lat.semiring.n - 1)
        out = FlfLattice(semiring=lat.semiring,
                         n_states=composed.n_states, words=lat.words)
        src, tgt, labs, scores = [], [], [], []
        for s in range(composed.n_states):
            for arc in composed.arcs[s]:
                src.append(s)
                tgt.append(arc.target)
                labs.append(arc.ilabel)
                vec = np.zeros(lat.semiring.n)
                vec[dim] = arc.weight
                scores.append(vec)
        out.sources = np.asarray(src, np.int32)
        out.targets = np.asarray(tgt, np.int32)
        out.labels = np.asarray(labs, np.int32)
        out.scores = np.asarray(scores).reshape(len(src), lat.semiring.n)
        out.final_states = np.asarray(sorted(composed.final), np.int32)
        out.final_scores = np.zeros((len(composed.final), lat.semiring.n))
        for i, s in enumerate(out.final_states):
            out.final_scores[i, dim] = composed.final[int(s)]
        out.boundaries = np.zeros(out.n_states, np.int32)
        return out.connect()


@register_node("dump-all-pairs-best")
class DumpAllPairsBestNode(FlfNode):
    """Best score between every state pair (reference dump-all-pairs-best;
    used to inspect lattice connectivity): tropical all-pairs shortest
    distance dumped to `path` (gzip text when .gz)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or ""

    def work(self):
        lat = self.pull_lattice(0)
        n = lat.n_states
        w = lat.semiring.project(lat.scores)
        INF = math.inf
        dist = np.full((n, n), INF)
        np.fill_diagonal(dist, 0.0)
        for k in range(lat.n_arcs):
            s, t = int(lat.sources[k]), int(lat.targets[k])
            dist[s, t] = min(dist[s, t], float(w[k]))
        order = lat.topological()
        # DAG relaxation in topological order (lattices are acyclic)
        for u in order:
            row = dist[:, u][:, None] + dist[u][None, :]
            np.minimum(dist, row, out=dist)
        lines = [f"{i} {j} {dist[i, j]:.6f}"
                 for i in range(n) for j in range(n)
                 if np.isfinite(dist[i, j])]
        text = "\n".join(lines) + "\n"
        if self.path:
            import gzip
            opener = gzip.open if self.path.endswith(".gz") else open
            with opener(self.path, "at", encoding="utf-8") as fh:
                fh.write(f"# {self.network.current_segment.full_name}\n")
                fh.write(text)
        return self.source(0).pull()


@register_node("local-cost-decoder")
class LocalCostDecoderNode(FlfNode):
    """Minimum-local-cost decoding (reference local-cost-decoder):
    replace each arc's weight by -log of its posterior and take the best
    path — approximates the MAP word sequence under local costs."""

    def work(self):
        lat = self.pull_lattice(0)
        post = lat.posteriors()
        out = lat.copy()
        weights = np.zeros_like(out.scores)
        weights[:, 0] = -np.log(np.maximum(post, 1e-30))
        out.scores = weights
        return out


@register_node("forced-alignment")
class ForcedAlignmentNode(FlfNode):
    """Constrain the lattice to the segment's reference orthography and
    take the best path (reference forced-alignment): yields reference
    word time boundaries from the lattice."""

    def work(self):
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        ref = (seg.orth or "").split()
        rev = {w: i for i, w in (lat.words or {}).items()}
        ref_ids = [rev.get(w, -1) for w in ref]
        if any(i < 0 for i in ref_ids):
            return lat  # reference word missing from lattice: pass through
        # direct product DP over (lattice state, reference position):
        # preserves full score vectors AND state time boundaries (a
        # composition through the acceptor view would lose both)
        R = len(ref_ids)
        ids: Dict[Tuple[int, int], int] = {}
        bounds: List[int] = []

        def sid(state: int, pos: int) -> int:
            key = (state, pos)
            if key not in ids:
                ids[key] = len(ids)
                bounds.append(int(lat.boundaries[state])
                              if state < len(lat.boundaries) else 0)
            return ids[key]

        by_src: Dict[int, List[int]] = {}
        for k in range(lat.n_arcs):
            by_src.setdefault(int(lat.sources[k]), []).append(k)
        src, tgt, labs, scores = [], [], [], []
        stack = [(int(lat.initial), 0)]
        seen = set()
        while stack:
            state, pos = stack.pop()
            if (state, pos) in seen:
                continue
            seen.add((state, pos))
            for k in by_src.get(state, ()):
                lab = int(lat.labels[k])
                nxts = []
                if lab == EPS:
                    nxts.append(pos)
                elif pos < R and lab == ref_ids[pos]:
                    nxts.append(pos + 1)
                for npos in nxts:
                    src.append(sid(state, pos))
                    tgt.append(sid(int(lat.targets[k]), npos))
                    labs.append(lab)
                    scores.append(lat.scores[k])
                    stack.append((int(lat.targets[k]), npos))
        D = lat.semiring.n
        finals = [sid(int(s), R) for s in lat.final_states
                  if (int(s), R) in ids]
        out = FlfLattice(semiring=lat.semiring, n_states=max(len(ids), 1),
                         words=lat.words)
        out.sources = np.asarray(src, np.int32)
        out.targets = np.asarray(tgt, np.int32)
        out.labels = np.asarray(labs, np.int32)
        out.scores = (np.asarray(scores).reshape(len(src), D)
                      if src else np.zeros((0, D)))
        out.boundaries = np.asarray(bounds or [0], np.int32)
        out.final_states = np.asarray(finals, np.int32)
        out.final_scores = np.zeros((len(finals), D))
        out = out.connect()
        if not len(out.final_states) or out.n_states == 0:
            # reference sequence unreachable in this lattice
            return FlfLattice(semiring=lat.semiring, n_states=1,
                              words=lat.words)
        return out


@register_node("segment-builder")
class SegmentBuilderNode(FlfNode):
    """Write per-word sub-segments from the best path's time boundaries
    (reference segment-builder): `path` receives
    `full-name start end word` lines usable as a corpus segment list."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or ""
        self.frame_shift = float(self.config.get("frame-shift") or 0.01)
        self._lines: List[str] = []

    def work(self):
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        _labels, _score, path = lat.best()   # path = arc indices
        i = 0
        for k in path:
            lab = int(lat.labels[k])
            if lab == EPS:
                continue
            t0 = float(lat.boundaries[int(lat.sources[k])]) \
                * self.frame_shift
            t1 = float(lat.boundaries[int(lat.targets[k])]) \
                * self.frame_shift
            self._lines.append(
                f"{seg.full_name}/{i} {t0:.2f} {t1:.2f} "
                f"{lat.word_of(lab)}")
            i += 1
        return self.source(0).pull()

    def finalize(self):
        if self.path:
            with open(self.path, "w", encoding="utf-8") as fh:
                fh.write("\n".join(self._lines) + "\n")


# aliases: the reference's matching/sequencing composition filters are
# both realized by the epsilon-filter compose in fsa.automaton
register_node("compose-matching")(ComposeWithFsaNode)
register_node("compose-sequencing")(ComposeWithFsaNode)


@register_node("approximated-risk-scorer")
class ApproximatedRiskScorerNode(FlfNode):
    """Adds an approximate Bayes-risk dimension: risk(arc) = 1 - posterior
    (reference approximated-risk-scorer; the local-cost approximation of
    the MBR arc risk)."""

    def work(self):
        lat = self.pull_lattice(0)
        post = lat.posteriors()
        key = self.config.get("key") or "risk"
        return lat.extend_dim(key, arc_values=1.0 - post,
                              scale=float(self.config.get("scale") or 1.0))


@register_node("dump-conditional-posteriors")
class DumpConditionalPosteriorsNode(FlfNode):
    """Per-arc posterior dump: `source target word posterior` lines per
    segment to `path` (reference dump-conditional-posteriors)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or ""

    def work(self):
        lat = self.pull_lattice(0)
        post = lat.posteriors()
        lines = [f"{int(lat.sources[k])} {int(lat.targets[k])} "
                 f"{lat.word_of(int(lat.labels[k]))} {post[k]:.6f}"
                 for k in range(lat.n_arcs)]
        text = "\n".join(lines) + "\n"
        if self.path:
            with open(self.path, "at", encoding="utf-8") as fh:
                fh.write(f"# {self.network.current_segment.full_name}\n")
                fh.write(text)
        else:
            print(text, end="")
        return self.source(0).pull()


@register_node("lattice-union-decoder")
@register_node("lattice-decoder")
class LatticeUnionDecoderNode(FlfNode):
    """System combination by union (reference lattice-union-decoder /
    lattice-decoder): union all connected inputs, decode the best path of
    the combined posterior mass."""

    def work(self):
        lat = self.pull_lattice(0)
        i = 1
        while True:
            try:
                other = self.pull_lattice(i)
            except (IndexError, KeyError):
                break
            lat = lat.union(other)
            i += 1
        return lat


@register_node("lattice-intersection-decoder")
class LatticeIntersectionDecoderNode(FlfNode):
    """System combination by intersection (reference
    lattice-intersection-decoder): keep word sequences accepted by every
    input system."""

    def work(self):
        lat = self.pull_lattice(0)
        i = 1
        while True:
            try:
                other = self.pull_lattice(i)
            except (IndexError, KeyError):
                break
            lat = lat.intersection(other)
            i += 1
        return lat


@register_node("aligner")
class AlignerNode(FlfNode):
    """Word-level alignment lattice (reference aligner node): constrain
    the input lattice to the segment's reference orthography and emit the
    best path as a linear lattice with time boundaries."""

    def work(self):
        fa = ForcedAlignmentNode(self.name + "-fa", self.config,
                                 self.network)
        fa.links = self.links
        fa.source = self.source
        constrained = fa.work()
        _labels, score, path = constrained.best()   # path = arc indices
        words = [(int(constrained.labels[k]),
                  int(constrained.boundaries[int(constrained.sources[k])]),
                  int(constrained.boundaries[int(constrained.targets[k])]))
                 for k in path if int(constrained.labels[k]) != EPS]
        n = len(words)
        out = FlfLattice(semiring=constrained.semiring, n_states=n + 1,
                         words=constrained.words)
        out.sources = np.arange(n, dtype=np.int32)
        out.targets = np.arange(1, n + 1, dtype=np.int32)
        out.labels = np.asarray([lab for lab, _t0, _t1 in words], np.int32)
        out.scores = np.zeros((n, constrained.semiring.n))
        if n:
            out.scores[0, 0] = score
        out.boundaries = np.asarray(
            [t0 for _lab, t0, _t1 in words]
            + [words[-1][2] if words else 0], np.int32)
        out.final_states = np.asarray([n], np.int32)
        out.final_scores = np.zeros((1, constrained.semiring.n))
        return out


# ---------------------------------------------------------------------------
# batch source, transit expansion, forced arc alignment
# (the last three reference registrations: NodeRegistration.hh:98 "batch",
# :867 "expand-transits", :2303 "forced-arc-alignment")
# ---------------------------------------------------------------------------


@register_node("batch")
class BatchNode(FlfNode):
    """Argument-list source: reads `file` (one whitespace-separated
    argument list per line, `encoding` honored) or inline `args`; the
    current segment index selects the line, `pull_argument(x)` / config
    `port` selects the column (reference batch node reads argument lists
    either from command line or file)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        path = self.config.get("file") or ""
        enc = self.config.get("encoding") or "utf-8"
        if path:
            with open(path, encoding=enc) as fh:
                self.lines = [ln.split() for ln in fh
                              if ln.strip() and not ln.startswith("#")]
            if not self.lines:
                raise ValueError(
                    f"batch node {self.name}: {path} holds no argument "
                    "lines (only blanks/comments)")
        else:
            self.lines = [(self.config.get("args") or "").split()]
        self.port = int(self.config.get("port") or 0)

    def pull_argument(self, x: int):
        args = self.lines[self.network.segment_counter % len(self.lines)]
        return args[x] if x < len(args) else ""

    def work(self):
        return self.pull_argument(self.port)


@register_node("expand-transits")
class ExpandTransitsNode(FlfNode):
    """Splits states so every state has a unique entering word — each
    transit (word boundary) gets its own state, repairing word boundary
    times that a decoder merged (reference expand-transits expands
    coarticulated-phoneme transits; word granularity here, which is the
    level our lattices carry)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        # group arcs by (target, label): each distinct entering label gets
        # its own copy of the target state
        state_of: Dict[Tuple[int, int], int] = {}
        n_new = 0
        boundaries: List[int] = []

        def new_state(orig: int, lab: int) -> int:
            nonlocal n_new
            key = (orig, lab)
            if key not in state_of:
                state_of[key] = n_new
                boundaries.append(int(lat.boundaries[orig]))
                n_new += 1
            return state_of[key]

        init = new_state(lat.initial, -1)
        arcs: List[Tuple[int, int, int, np.ndarray]] = []
        # source copies: every copy of a source state emits all its
        # outgoing arcs; targets keyed by the arc's own label
        out_of: Dict[int, List[int]] = {}
        for k in range(lat.n_arcs):
            out_of.setdefault(int(lat.sources[k]), []).append(k)
        # BFS over (orig state, entering label) copies
        stack = [(int(lat.initial), -1)]
        seen = {(int(lat.initial), -1)}
        while stack:
            orig, lab = stack.pop()
            src = state_of[(orig, lab)]
            for k in out_of.get(orig, ()):  # expand outgoing arcs
                albl = int(lat.labels[k])
                tgt_orig = int(lat.targets[k])
                tgt = new_state(tgt_orig, albl)
                arcs.append((src, tgt, albl, lat.scores[k]))
                if (tgt_orig, albl) not in seen:
                    seen.add((tgt_orig, albl))
                    stack.append((tgt_orig, albl))
        finals: Dict[int, np.ndarray] = {}
        fin_score = {int(s): lat.final_scores[i]
                     for i, s in enumerate(lat.final_states)}
        for (orig, lab), s in state_of.items():
            if orig in fin_score:
                finals[s] = fin_score[orig]
        return FlfLattice.build(lat.semiring, n_new, arcs,
                                boundaries=boundaries, initial=init,
                                finals=finals, words=lat.words)


@register_node("forced-arc-alignment")
class ForcedArcAlignmentNode(FlfNode):
    """Splits every word arc into its pronunciation's phoneme sub-arcs.
    With an aligner in the network context (`arc-aligner`: callable
    (lattice, arc_index, phonemes) -> frame counts) the split is
    acoustic; otherwise the arc's frame span is divided evenly across
    the phonemes (reference forced-arc-alignment aligns arcs acoustically
    to phoneme or subword units; the lexicon provides pronunciations)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        lexicon = self.network.context.get("lexicon")
        aligner = self.network.context.get("arc-aligner")
        words = lat.words or {}
        # phoneme label ids live above the word ids
        next_label = (int(max(words)) + 1) if words else 1
        phon_label: Dict[str, int] = {}
        out_words = dict(words)

        def label_for(ph: str) -> int:
            nonlocal next_label
            if ph not in phon_label:
                phon_label[ph] = next_label
                out_words[next_label] = ph
                next_label += 1
            return phon_label[ph]

        def phonemes_of(lab: int) -> List[str]:
            orth = words.get(lab)
            if lexicon is not None and orth:
                lemmas = lexicon.lemmas_by_orth(orth)
                if lemmas and lemmas[0].pronunciations:
                    return list(lemmas[0].pronunciations[0].phonemes)
            return [words.get(lab, f"w{lab}")]

        D = lat.semiring.n
        arcs: List[Tuple[int, int, int, np.ndarray]] = []
        boundaries = [int(b) for b in lat.boundaries]
        n_states = lat.n_states

        for k in range(lat.n_arcs):
            src, tgt = int(lat.sources[k]), int(lat.targets[k])
            lab = int(lat.labels[k])
            if lab == EPS:
                arcs.append((src, tgt, lab, lat.scores[k]))
                continue
            phones = phonemes_of(lab)
            t0, t1 = boundaries[src], boundaries[tgt]
            if len(phones) <= 1:
                arcs.append((src, tgt, label_for(phones[0]) if phones
                             else lab, lat.scores[k]))
                continue
            if callable(aligner):
                durs = list(aligner(lat, k, phones))
            else:
                span = max(t1 - t0, 0)
                base = span // len(phones)
                durs = [base] * len(phones)
                for i in range(span - base * len(phones)):
                    durs[i] += 1
            per = lat.scores[k] / len(phones)
            prev, t = src, t0
            for i, ph in enumerate(phones):
                last = i == len(phones) - 1
                t = t1 if last else t + int(durs[i])
                if last:
                    nxt = tgt
                else:
                    nxt = n_states
                    n_states += 1
                    boundaries.append(t)
                arcs.append((prev, nxt, label_for(ph), per))
                prev = nxt

        finals = {int(s): lat.final_scores[i]
                  for i, s in enumerate(lat.final_states)}
        return FlfLattice.build(lat.semiring, n_states, arcs,
                                boundaries=boundaries, initial=lat.initial,
                                finals=finals, words=out_words)
