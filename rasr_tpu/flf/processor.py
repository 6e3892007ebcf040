"""Flf lattice processing framework: processor networks.

The reference Flf library (src/Flf, 55k LoC) runs config-defined networks
of lattice-processing nodes over corpus segments (Network/Node/
NetworkCrawler, src/Flf/Network.hh:36-166; ~80 node types,
src/Flf/NodeRegistration.hh; tool src/Tools/Flf/FlfTool.cc).

This runtime keeps the same model: nodes declared under
``[*.network.<name>]`` with ``type`` and ``links``, pulled once per segment
from the sinks.  The node set covers the core workflow: speech-segment
source, archive reader/writer, best/n-best, prune-posterior, LM rescoring,
evaluator, CTM dump, sink.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional, Sequence

from ..bliss.corpus import CorpusDescription, Segment
from ..bliss.evaluation import Evaluator
from ..core.configuration import Configuration
from ..lattice.word_lattice import WordLattice

NodeFactory: Dict[str, Callable[..., "FlfNode"]] = {}


def register_node(name: str):
    def deco(cls):
        NodeFactory[name] = cls
        return cls
    return deco


class FlfNode:
    """One processor node; pull-based: request(port) computes per segment."""

    def __init__(self, name: str, config: Configuration, network: "FlfNetwork"):
        self.name = name
        self.config = config
        self.network = network
        self.links: List[str] = []
        self._cache: Dict[int, Any] = {}

    def source(self, index: int = 0) -> "FlfNode":
        return self.network.node(self.links[index])

    # lattices flow through the network either as legacy WordLattice
    # (am, lm pairs — what the recognizers emit) or as multi-dim
    # FlfLattice; every node normalizes its input to the view it needs.

    def pull_lattice(self, index: int = 0):
        """Input `index` as a multi-dim FlfLattice."""
        from .lattice import FlfLattice
        x = self.source(index).pull()
        if isinstance(x, FlfLattice):
            return x
        if isinstance(x, WordLattice):
            return FlfLattice.from_word_lattice(x)
        raise TypeError(f"node {self.name}: input {index} is "
                        f"{type(x).__name__}, not a lattice")

    def pull_word_lattice(self, index: int = 0) -> WordLattice:
        """Input `index` as a legacy (am, lm) WordLattice."""
        from .lattice import FlfLattice
        x = self.source(index).pull()
        if isinstance(x, FlfLattice):
            return x.to_word_lattice()
        if isinstance(x, WordLattice):
            return x
        raise TypeError(f"node {self.name}: input {index} is "
                        f"{type(x).__name__}, not a lattice")

    def pull(self) -> Any:
        seg_id = self.network.segment_counter
        if seg_id not in self._cache:
            self._cache.clear()
            self._cache[seg_id] = self.work()
        return self._cache[seg_id]

    def work(self) -> Any:
        raise NotImplementedError

    def finalize(self) -> None:
        pass


@register_node("speech-segment")
class SpeechSegmentNode(FlfNode):
    """Source: provides the current Bliss segment
    (reference speech-segment node, doc/flf_nodes.rst:3122)."""

    def work(self) -> Segment:
        return self.network.current_segment


@register_node("archive-reader")
class ArchiveReaderNode(FlfNode):
    """Reads lattices keyed by segment name: `format = slf` (default, a
    directory of HTK SLF files) or `format = flf` (Flf-native archive or
    directory, src/Flf/FlfIo.cc)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or ""
        self.format = (self.config.get("format") or "slf").lower()
        self._flf_archive = None
        if self.format == "flf" and (os.path.isfile(self.path)
                                     or self.path.endswith(".cache")):
            from .io import FlfArchiveReader
            self._flf_archive = FlfArchiveReader(self.path)

    def work(self):
        seg = self.network.current_segment
        if self.format == "flf":
            if self._flf_archive is not None:
                return self._flf_archive.read(seg.full_name)
            from .io import read_flf_file
            return read_flf_file(os.path.join(
                self.path, seg.full_name.replace("/", "_") + ".flf"))
        slf = os.path.join(self.path, seg.full_name.replace("/", "_") + ".slf")
        return WordLattice.read_htk_slf(slf)


@register_node("archive-writer")
class ArchiveWriterNode(FlfNode):
    """Writes lattices keyed by segment name; `format = slf` (default)
    or `format = flf` (native descriptor + binary parts)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.path = self.config.get("path") or "."
        self.format = (self.config.get("format") or "slf").lower()
        self._flf_archive = None
        if self.format == "flf" and self.path.endswith(".cache"):
            from .io import FlfArchiveWriter
            self._flf_archive = FlfArchiveWriter(self.path)
        else:
            os.makedirs(self.path, exist_ok=True)

    def work(self):
        seg = self.network.current_segment
        if self.format == "flf":
            lat = self.pull_lattice(0)
            if self._flf_archive is not None:
                self._flf_archive.write(seg.full_name, lat)
            else:
                from .io import write_flf_file
                write_flf_file(lat, os.path.join(
                    self.path, seg.full_name.replace("/", "_") + ".flf"))
            return lat
        lattice = self.pull_word_lattice(0)
        slf = os.path.join(self.path, seg.full_name.replace("/", "_") + ".slf")
        lattice.write_htk_slf(slf)
        return lattice

    def finalize(self):
        if self._flf_archive is not None:
            self._flf_archive.close()


@register_node("recognizer-v2")
@register_node("recognizer")
@register_node("incremental-recognizer")
class RecognizerNode(FlfNode):
    """Runs a SearchAlgorithmV2 over the segment's features and emits the
    result lattice (reference RecognizerNodeV2, src/Flf/RecognizerV2.cc:43;
    also registered as "recognizer" — the v1 classic word-conditioned
    recognizer satisfies the same segment protocol).
    Features come from a feature cache; the search object is injected via
    network context (built from config otherwise)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._search = self.network.context.get("search")
        self._feature_cache = None
        cache_path = self.config.get("feature-cache")
        if cache_path:
            from ..speech.feature_cache import FeatureCacheReader
            self._feature_cache = FeatureCacheReader(cache_path)

    def work(self) -> WordLattice:
        seg = self.source(0).pull()
        feats = self.network.context.get("features")
        if feats is None and self._feature_cache is not None:
            feats = self._feature_cache.features(seg.full_name)
        search = self._search
        search.enter_segment()
        chunk = int(self.config.get("chunk-frames") or 0)
        if chunk > 0:
            # incremental mode (reference IncrementalRecognizer): feed
            # fixed-size feature chunks, decoding between chunks so
            # partial results are available during the segment
            for t0 in range(0, len(feats), chunk):
                search.put_features(feats[t0:t0 + chunk])
                if hasattr(search, "decode_many_steps"):
                    search.decode_many_steps()
        else:
            search.put_features(feats)
        search.finish_segment()
        if hasattr(search, "create_lattice"):
            return search.create_lattice()
        from ..lattice.word_lattice import lattice_from_nbest
        hyps = search.n_best(getattr(search, "beam_size", 8))
        return lattice_from_nbest(
            [(h.labels, h.score, 0.0) for h in hyps],
            words=self.network.context.get("words"))


@register_node("best")
class BestNode(FlfNode):
    """Extracts the best path as a single-path lattice (reference best node)."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        labels, score = lattice.best()
        out = WordLattice(words=lattice.words)
        s = out.add_state(0)
        out.initial = s
        for i, lab in enumerate(labels):
            t = out.add_state(i + 1)
            out.add_arc(s, t, lab, score / max(len(labels), 1), 0.0)
            s = t
        out.set_final(s)
        return out


@register_node("prune-posterior")
class PrunePosteriorNode(FlfNode):
    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        threshold = float(self.config.get("threshold") or 10.0)
        return lattice.prune_posterior(threshold)


@register_node("rescore-lm")
class RescoreLmNode(FlfNode):
    """Replaces arc LM scores using an LM over word labels
    (reference compose-with-lm / rescore nodes, best-context approximation:
    each arc scored with the best single history reaching it)."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        lm = self.network.context.get("lm")
        scale = float(self.config.get("scale") or 1.0)
        words = lattice.words or {}
        out = WordLattice(words=lattice.words)
        for s in range(lattice.n_states):
            out.add_state(lattice.boundaries[s])
        out.initial = lattice.initial
        out.final = dict(lattice.final)
        # propagate one best history per state (Viterbi approximation)
        hist: Dict[int, Any] = {lattice.initial: lm.initial_history()}
        order = list(range(lattice.n_states))
        for s in order:
            h = hist.get(s)
            for arc in lattice.arcs[s]:
                if h is not None and arc.word in words:
                    tok = words[arc.word]
                    lm_score = scale * lm.score(h, tok)
                    nh = lm.extended_history(h, tok)
                else:
                    lm_score = arc.lm_score
                    nh = h
                out.add_arc(s, arc.target, arc.word, arc.am_score, lm_score)
                if arc.target not in hist and nh is not None:
                    hist[arc.target] = nh
        return out


@register_node("n-best")
class NBestNode(FlfNode):
    """n-best extraction into a prefix-merged lattice (reference n-best
    node, src/Flf/NBest.cc)."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        n = int(self.config.get("n") or 10)
        from .word_lattice_helpers import nbest_lattice
        return nbest_lattice(lattice, n)


@register_node("compose-with-lm")
class ComposeWithLmNode(FlfNode):
    """Exact LM composition (reference compose-with-lm,
    src/Flf/Compose.cc); LM from network context."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        from ..lattice.rescore import compose_with_lm
        lm = self.network.context.get("lm")
        scale = float(self.config.get("scale") or 1.0)
        return compose_with_lm(lattice, lm, scale=scale)


@register_node("confusion-network")
class ConfusionNetworkNode(FlfNode):
    """CN construction + MBR decode into a linear lattice (reference CN
    builder nodes, src/Flf/ConfusionNetwork.cc)."""

    def work(self) -> WordLattice:
        lattice = self.pull_word_lattice(0)
        from ..lattice.confusion_network import build_confusion_network
        cn = build_confusion_network(lattice)
        words, confs = cn.decode()
        out = WordLattice(words=lattice.words)
        s = out.add_state(0)
        out.initial = s
        import math
        for i, (w, c) in enumerate(zip(words, confs)):
            t = out.add_state(i + 1)
            out.add_arc(s, t, w, -math.log(max(c, 1e-10)), 0.0)
            s = t
        out.set_final(s)
        return out


@register_node("evaluator")
class EvaluatorNode(FlfNode):
    """WER evaluation of the best path vs the segment orth; with
    `lattice-evaluation = true` additionally reports the oracle
    (lattice) WER (reference evaluator node; "single best" and
    "lattice" modes of src/Bliss/Evaluation.hh:31)."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.evaluator = Evaluator(self.name)
        self.lattice_eval = (self.config.get("lattice-evaluation")
                             or "").lower() == "true"
        self.oracle_errors = 0
        self.oracle_ref = 0

    def work(self):
        lattice = self.pull_word_lattice(0)
        seg = self.network.current_segment
        labels, _ = lattice.best()
        words = lattice.words or {}
        hyp = " ".join(words.get(l, str(l)) for l in labels)
        self.evaluator.evaluate(seg.orth, hyp)
        if self.lattice_eval:
            from .evaluate import oracle_alignment
            from .lattice import FlfLattice
            res = oracle_alignment(FlfLattice.from_word_lattice(lattice),
                                   (seg.orth or "").split())
            self.oracle_errors += res.errors
            self.oracle_ref += res.ref_len
        return lattice

    def finalize(self):
        print(self.evaluator.report())
        if self.lattice_eval:
            wer = self.oracle_errors / max(self.oracle_ref, 1)
            print(f"<lattice-evaluation errors={self.oracle_errors} "
                  f"ref={self.oracle_ref} "
                  f"lattice-wer={100.0 * wer:.2f}%/>")


@register_node("dump-ctm")
class DumpCtmNode(FlfNode):
    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.lines: List[str] = []
        self.path = self.config.get("path") or ""

    def work(self):
        lattice = self.pull_word_lattice(0)
        seg = self.network.current_segment
        labels, _ = lattice.best()
        words = lattice.words or {}
        for i, lab in enumerate(labels):
            self.lines.append(f"{seg.recording.name} 1 "
                              f"{seg.start + 0.01 * i:.2f} 0.01 "
                              f"{words.get(lab, str(lab))}")
        return lattice

    def finalize(self):
        if self.path:
            with open(self.path, "w", encoding="utf-8") as fh:
                fh.write("\n".join(self.lines) + "\n")


@register_node("sink")
class SinkNode(FlfNode):
    def work(self):
        results = [self.source(i).pull() for i in range(len(self.links))]
        return results[0] if results else None


class FlfNetwork:
    """Config-driven network + segment loop (reference Flf::Processor /
    NetworkCrawler run loop, src/Flf/Processor.hh:28)."""

    def __init__(self, config: Configuration,
                 context: Optional[Dict[str, Any]] = None):
        self.config = config
        self.context = context or {}
        self._populate_context_from_config(config)
        self.current_segment: Optional[Segment] = None
        self.segment_counter = 0
        self._nodes: Dict[str, FlfNode] = {}
        net_cfg = config.sub("network")
        node_names = (net_cfg.get("nodes") or "").split()
        for name in node_names:
            ncfg = net_cfg.sub(name)
            typ = ncfg.get("type")
            if typ not in NodeFactory:
                raise ValueError(f"unknown flf node type {typ!r} "
                                 f"(node {name}); known: {sorted(NodeFactory)}")
            node = NodeFactory[typ](name, ncfg, self)
            node.links = (ncfg.get("links") or "").split()
            self._nodes[name] = node
        self._sinks = [n for n in self._nodes.values()
                       if isinstance(n, SinkNode)]
        if not self._sinks:
            raise ValueError("flf network has no sink node")

    def _populate_context_from_config(self, config: Configuration) -> None:
        """Config-alone operation: lexicon / LM / search built from the
        same [lexicon] / [lm] / [label-scorer] sections the recognizer
        tools use (reference Flf nodes pull models from ModelCombination
        config) when not injected programmatically."""
        needs_models = (config.sub("lm").get("type")
                        or config.sub("lm").get("file")
                        or config.sub("lexicon").get("file"))
        if not needs_models:
            return
        if ("lm" in self.context and "lexicon" in self.context
                and "search" in self.context):
            return
        from ..api import ModelCombination
        mc = ModelCombination.create(config)
        if mc.language_model is not None:
            self.context.setdefault("lm", mc.language_model)
        if mc.lexicon is not None:
            self.context.setdefault("lexicon", mc.lexicon)
        if ("search" not in self.context and mc.label_scorer is not None
                and config.sub("search-algorithm").get("type")):
            from ..search.module import create_search_algorithm
            self.context["search"] = create_search_algorithm(config, mc)

    def node(self, name: str) -> FlfNode:
        return self._nodes[name]

    def run(self, corpus: CorpusDescription) -> int:
        n = 0
        for seg in corpus.segments():
            self.current_segment = seg
            self.segment_counter += 1
            for sink in self._sinks:
                sink.pull()
            n += 1
        for node in self._nodes.values():
            node.finalize()
        return n


# extended node tier (registration side effects; import last to avoid a
# circular import — nodes.py uses register_node/FlfNode defined above)
from . import nodes  # noqa: E402,F401
from . import nodes_lp  # noqa: E402,F401
