"""Lattice-processor action nodes.

The reference's lattice-processor tool drives the legacy
sequence-training lattice pipelines as a chain of ~30 config-selected
actions (src/Tools/LatticeProcessor/LatticeProcessor.cc:46-92); the
heavy lifting lives in Speech::LatticeSetProcessor subclasses
(src/Speech/LatticeExtractor.cc, LatticeSetProcessor.cc).  Here each
action is one more Flf node — registered in the same NodeFactory the
flf-tool uses, so both tools share one implementation, and the
lattice-processor tool (tools/lattice_processor.py) merely translates
the reference's `actions = a,b,c` / `selections = sa,sb,sc` chain
config into a linear Flf network.

Nodes that need a SECOND lattice stream (merge, unite-archive,
spoken-and-competing, timeframe-error, rescore with distance
rescorers) read it per segment from their own
`numerator-lattice-archive.{path,format}` sub-config — exactly the
reference's parameterization (LatticeProcessor.cc:133-147).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..fsa.automaton import EPS
from ..lattice.word_lattice import WordLattice
from .lattice import FlfLattice
from .processor import FlfNode, register_node
from .semiring import FlfSemiring

#: orths treated as non-words by the silence/noise actions (the
#: reference consults lexicon special lemmata; these cover the repo's
#: archives + HTK conventions)
NONWORD_ORTHS = {"[SILENCE]", "!NULL", "<sil>", "[NOISE]", "[silence]"}


def _nonword_ids(lat: FlfLattice, extra: Optional[str] = None) -> set:
    bad = set(NONWORD_ORTHS)
    if extra:
        bad |= set(extra.split())
    return {i for i, w in (lat.words or {}).items() if w in bad}


class _AuxArchive:
    """Per-segment secondary lattice source from
    `<prefix>-lattice-archive.{path,format}` config (reference
    numerator-lattice-archive)."""

    def __init__(self, config, prefix: str = "numerator"):
        sub = config.sub(f"{prefix}-lattice-archive")
        self.path = sub.get("path") or ""
        self.format = (sub.get("format") or "flf").lower()
        self._flf = None
        if self.format == "flf" and (os.path.isfile(self.path)
                                     or self.path.endswith(".cache")):
            from .io import FlfArchiveReader
            self._flf = FlfArchiveReader(self.path)

    @property
    def configured(self) -> bool:
        return bool(self.path)

    def read(self, segment_name: str) -> FlfLattice:
        key = segment_name.replace("/", "_")
        if self.format == "flf":
            if self._flf is not None:
                return self._flf.read(segment_name)
            from .io import read_flf_file
            return read_flf_file(os.path.join(self.path, key + ".flf"))
        wl = WordLattice.read_htk_slf(os.path.join(self.path, key + ".slf"))
        return FlfLattice.from_word_lattice(wl)


class _LpNode(FlfNode):
    """Base: main input = link 0; optional numerator from link 1 or the
    node's own numerator-lattice-archive config."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._aux = _AuxArchive(self.config)

    def numerator(self) -> Optional[FlfLattice]:
        if len(self.links) > 1:
            return self.pull_lattice(1)
        if self._aux.configured:
            return self._aux.read(self.network.current_segment.full_name)
        return None


def _word_intervals(lat: FlfLattice) -> List[Tuple[int, int, int]]:
    """(label, start_frame, end_frame) along the best path."""
    _labels, _score, arcs = lat.best()
    out = []
    for k in arcs:
        lab = int(lat.labels[k])
        if lab == EPS:
            continue
        out.append((lab, int(lat.boundaries[lat.sources[k]]),
                    int(lat.boundaries[lat.targets[k]])))
    return out


def _contains_sequence(lat: FlfLattice, seq: List[int],
                       ignore: set) -> bool:
    """True iff some lattice path spells `seq` (eps/non-words skipped)."""
    by_src: Dict[int, List[int]] = {}
    for k in range(lat.n_arcs):
        by_src.setdefault(int(lat.sources[k]), []).append(k)
    finals = set(int(s) for s in lat.final_states)
    stack = [(int(lat.initial), 0)]
    seen = set()
    while stack:
        state, pos = stack.pop()
        if (state, pos) in seen:
            continue
        seen.add((state, pos))
        if state in finals and pos == len(seq):
            return True
        for k in by_src.get(state, ()):
            lab = int(lat.labels[k])
            if lab == EPS or lab in ignore:
                stack.append((int(lat.targets[k]), pos))
            elif pos < len(seq) and lab == seq[pos]:
                stack.append((int(lat.targets[k]), pos + 1))
    return False


# ---------------------------------------------------------------------------
# numerator / denominator machinery (discriminative-training pipelines)
# ---------------------------------------------------------------------------


@register_node("numerator-from-denominator")
class NumeratorFromDenominatorNode(_LpNode):
    """Constrain the denominator lattice to paths whose word sequence is
    the segment orthography, keeping scores and time boundaries
    (reference NumeratorFromDenominatorExtractor,
    src/Speech/LatticeExtractor.cc).  Non-word arcs (silence/noise)
    pass through freely, as the reference's lemma-pron view does."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        ref = (seg.orth or "").split()
        rev = {w: i for i, w in (lat.words or {}).items()}
        ref_ids = [rev.get(w, -1) for w in ref]
        ignore = _nonword_ids(lat, self.config.get("non-word-orths"))
        if any(i < 0 for i in ref_ids):
            # spoken words missing from the lattice: empty numerator
            return FlfLattice(semiring=lat.semiring, n_states=1,
                              words=lat.words)
        R = len(ref_ids)
        ids: Dict[Tuple[int, int], int] = {}
        bounds: List[int] = []

        def sid(state: int, pos: int) -> int:
            key = (state, pos)
            if key not in ids:
                ids[key] = len(ids)
                bounds.append(int(lat.boundaries[state]))
            return ids[key]

        by_src: Dict[int, List[int]] = {}
        for k in range(lat.n_arcs):
            by_src.setdefault(int(lat.sources[k]), []).append(k)
        src, tgt, labs, scores = [], [], [], []
        sid(int(lat.initial), 0)
        stack = [(int(lat.initial), 0)]
        seen = {(int(lat.initial), 0)}
        while stack:
            state, pos = stack.pop()
            for k in by_src.get(state, ()):
                lab = int(lat.labels[k])
                if lab == EPS or lab in ignore:
                    npos = pos
                elif pos < R and lab == ref_ids[pos]:
                    npos = pos + 1
                else:
                    continue
                src.append(sid(state, pos))
                tgt.append(sid(int(lat.targets[k]), npos))
                labs.append(lab)
                scores.append(lat.scores[k])
                if (int(lat.targets[k]), npos) not in seen:
                    seen.add((int(lat.targets[k]), npos))
                    stack.append((int(lat.targets[k]), npos))
        D = lat.semiring.n
        af = {int(s): lat.final_scores[i]
              for i, s in enumerate(lat.final_states)}
        finals = {sid(s, R): af[s] for s in af if (s, R) in ids}
        out = FlfLattice(semiring=lat.semiring, n_states=max(len(ids), 1),
                         words=lat.words)
        out.sources = np.asarray(src, np.int32)
        out.targets = np.asarray(tgt, np.int32)
        out.labels = np.asarray(labs, np.int32)
        out.scores = (np.asarray(scores).reshape(len(src), D)
                      if src else np.zeros((0, D)))
        out.boundaries = np.asarray(bounds or [0], np.int32)
        out.final_states = np.asarray(sorted(finals), np.int32)
        out.final_scores = (np.stack([finals[s] for s in sorted(finals)])
                            if finals else np.zeros((0, D)))
        out.initial = 0
        out = out.connect()
        if not len(out.final_states) or out.n_states == 0:
            return FlfLattice(semiring=lat.semiring, n_states=1,
                              words=lat.words)
        return out


@register_node("merge-numerator")
class MergeNumeratorNode(_LpNode):
    """Merge the numerator into the denominator lattice — reference
    `merge` action (Speech::WordLatticeMerger): with
    `merge-only-if-spoken-not-in-lattice = true` (default, as in the
    MMI recipes) the union happens only when no denominator path
    spells the spoken words."""

    def work(self) -> FlfLattice:
        den = self.pull_lattice(0)
        num = self.numerator()
        if num is None:
            return den
        num = num.change_semiring(den.semiring)
        only_if = (self.config.get("merge-only-if-spoken-not-in-lattice")
                   or "true").lower() != "false"
        if only_if:
            seg = self.network.current_segment
            rev = {w: i for i, w in (den.words or {}).items()}
            seq = [rev.get(w, -1) for w in (seg.orth or "").split()]
            ignore = _nonword_ids(den, self.config.get("non-word-orths"))
            if all(i >= 0 for i in seq) \
                    and _contains_sequence(den, seq, ignore):
                return den
        return den.union(num)


@register_node("unite-archive")
class UniteArchiveNode(_LpNode):
    """Unite the input with a second lattice read per segment from
    `numerator-lattice-archive` (reference `unite` action,
    Speech::WordLatticeUnion)."""

    def work(self) -> FlfLattice:
        den = self.pull_lattice(0)
        num = self.numerator()
        return den if num is None else den.union(num)


@register_node("spoken-and-competing")
class SpokenAndCompetingNode(_LpNode):
    """Spoken (numerator) path united with the top competing
    hypotheses of the denominator — the reference's n-best-style MCE
    lattice (`spoken-and-competing` action).  `competing-count` caps
    the competitors; the spoken sequence itself is not duplicated."""

    def work(self) -> FlfLattice:
        den = self.pull_lattice(0)
        seg = self.network.current_segment
        n = int(self.config.get("competing-count") or 8)
        num = self.numerator()
        if num is None:
            # derive the numerator from the denominator + orthography
            num = NumeratorFromDenominatorNode(
                self.name + ".num", self.config, self.network)
            num.links = list(self.links[:1])
            num = num.work()
        rev = {w: i for i, w in (den.words or {}).items()}
        spoken = [rev.get(w, -1) for w in (seg.orth or "").split()]
        ignore = _nonword_ids(den, self.config.get("non-word-orths"))
        out = num
        kept = 0
        seen_seqs = {tuple(spoken)}
        # over-request: spoken variants (differing only in silences)
        # occupy top slots and are skipped below
        for labels, score in den.n_best(2 * n + 8):
            toks = [l for l in labels if l != EPS and l not in ignore]
            if tuple(toks) in seen_seqs:
                continue
            if kept >= n:
                break
            seen_seqs.add(tuple(toks))
            kept += 1
            sr = den.semiring
            arcs = [(i, i + 1, lab,
                     tuple(score / max(len(labels), 1)
                           if j == 0 else 0.0 for j in range(sr.n)))
                    for i, lab in enumerate(labels)]
            hyp = FlfLattice.build(
                sr, len(labels) + 1, arcs,
                boundaries=list(range(len(labels) + 1)), initial=0,
                finals={len(labels): (0.0,) * sr.n}, words=den.words)
            out = out.union(hyp)
        return out


# ---------------------------------------------------------------------------
# alphabet / structure mappings
# ---------------------------------------------------------------------------


@register_node("word-to-phoneme")
class WordToPhonemeNode(_LpNode):
    """Expand each word arc into its pronunciation phonemes (reference
    `word-to-phoneme` action, Speech::WordToPhonemeLatticeBuilder).
    The lexicon comes from network context or [lexicon] config; arc
    scores ride on the FIRST phoneme arc; intermediate states
    interpolate the time boundaries."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        lex = self.network.context.get("lexicon")
        if lex is None:
            raise ValueError(f"node {self.name}: word-to-phoneme needs a "
                             "lexicon ([lexicon] file= in config)")
        inv = lex.phoneme_inventory
        by_orth = {}
        for lemma in lex.lemmas:
            for orth in lemma.orths:
                if lemma.pronunciations:
                    by_orth[orth] = [
                        inv.by_id(p).symbol for p in
                        lemma.pronunciations[0].pronunciation.phonemes]
        phone_ids: Dict[str, int] = {}
        words: Dict[int, str] = {}

        def pid(ph: str) -> int:
            if ph not in phone_ids:
                phone_ids[ph] = len(phone_ids) + 1
                words[phone_ids[ph]] = ph
            return phone_ids[ph]

        D = lat.semiring.n
        n_states = lat.n_states
        arcs: List[Tuple[int, int, int, np.ndarray]] = []
        bounds = list(int(b) for b in lat.boundaries)
        for k in range(lat.n_arcs):
            s, t = int(lat.sources[k]), int(lat.targets[k])
            lab = int(lat.labels[k])
            orth = (lat.words or {}).get(lab, "")
            phones = by_orth.get(orth)
            if lab == EPS or not phones:
                arcs.append((s, t, EPS, lat.scores[k]))
                continue
            t0, t1 = bounds[s], bounds[t]
            cur = s
            for i, ph in enumerate(phones):
                last = i == len(phones) - 1
                nxt = t if last else n_states
                if not last:
                    bounds.append(t0 + (t1 - t0) * (i + 1) // len(phones))
                    n_states += 1
                sc = lat.scores[k] if i == 0 else np.zeros(D)
                arcs.append((cur, nxt, pid(ph), sc))
                cur = nxt
        finals = {int(s): lat.final_scores[i]
                  for i, s in enumerate(lat.final_states)}
        return FlfLattice.build(lat.semiring, n_states, arcs,
                                boundaries=bounds, initial=lat.initial,
                                finals=finals, words=words)


@register_node("remove-silences-and-noises")
class RemoveSilencesNode(_LpNode):
    """Relabel silence/noise arcs to epsilon (reference
    actionRemoveSilencesAndNoises); `redundant = true` additionally
    collapses the resulting duplicate eps paths (the
    remove-redundant-silences-and-noises action)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0).copy()
        ignore = _nonword_ids(lat, self.config.get("non-word-orths"))
        if ignore:
            mask = np.isin(lat.labels, list(ignore))
            lat.labels = np.where(mask, EPS, lat.labels)
        if (self.config.get("redundant") or "").lower() == "true":
            lat = lat.remove_epsilons()
        return lat


@register_node("time-conditioned")
class TimeConditionedNode(_LpNode):
    """Time-conditioned lattice: states merged on (word boundary time)
    (reference actionTimeConditioned over the legacy word lattice)."""

    def work(self) -> WordLattice:
        from ..lattice.transform import time_conditioned
        return time_conditioned(self.pull_word_lattice(0))


@register_node("linear-combination")
class LinearCombinationNode(_LpNode):
    """Project the score dimensions onto named outputs with per-output
    scale vectors (reference LinearCombinationLatticeProcessorNode):
    `outputs = total accuracy`, `total.scales = 1.0 0.3`, ..."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        outputs = (self.config.get("outputs") or "total").split()
        D = lat.semiring.n
        mats = []
        for name in outputs:
            scales = [float(x) for x in
                      (self.config.sub(name).get("scales") or "").split()]
            if not scales:
                scales = list(lat.semiring.scales)
            scales = (scales + [0.0] * D)[:D]
            mats.append(scales)
        M = np.asarray(mats)                      # (O, D)
        out = lat.copy()
        out.semiring = FlfSemiring(tuple(outputs), (1.0,) * len(outputs),
                                   lat.semiring.stype)
        out.scores = lat.scores @ M.T
        out.final_scores = lat.final_scores @ M.T
        return out


# ---------------------------------------------------------------------------
# statistics / error actions
# ---------------------------------------------------------------------------


@register_node("density")
class DensityNode(_LpNode):
    """Lattice density statistics (reference
    DensityLatticeProcessorNode): arcs per spoken word and arcs per
    timeframe, logged per segment and aggregated."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.arcs = 0
        self.words = 0
        self.frames = 0

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        n_words = len((seg.orth or "").split())
        n_frames = int(lat.boundaries.max()) if lat.n_states else 0
        self.arcs += lat.n_arcs
        self.words += n_words
        self.frames += n_frames
        print(f"<density segment=\"{seg.full_name}\" arcs={lat.n_arcs} "
              f"per-word={lat.n_arcs / max(n_words, 1):.1f} "
              f"per-frame={lat.n_arcs / max(n_frames, 1):.2f}/>")
        return lat

    def finalize(self):
        print(f"<density-summary arcs={self.arcs} "
              f"per-word={self.arcs / max(self.words, 1):.1f} "
              f"per-frame={self.arcs / max(self.frames, 1):.2f}/>")


@register_node("graph-error-rate")
class GraphErrorRateNode(_LpNode):
    """Oracle (graph) error rate vs the segment orthography, logged;
    the lattice passes through unchanged (reference actionGer).  The
    oracle-alignment node gives the oracle PATH instead."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.errors = 0
        self.ref = 0

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        from .evaluate import oracle_alignment
        res = oracle_alignment(lat, (seg.orth or "").split())
        self.errors += res.errors
        self.ref += res.ref_len
        print(f"<ger segment=\"{seg.full_name}\" errors={res.errors} "
              f"ref={res.ref_len} ger={100.0 * res.wer:.2f}%/>")
        return lat

    def finalize(self):
        ger = self.errors / max(self.ref, 1)
        print(f"<ger-summary errors={self.errors} ref={self.ref} "
              f"ger={100.0 * ger:.2f}%/>")


@register_node("timeframe-error")
class TimeframeErrorNode(_LpNode):
    """Expected time-frame error of the lattice against the numerator's
    word intervals (reference actionTimeframeError over the fCN): per
    frame, sum arc posteriors of arcs whose word differs from the
    reference word active at that frame.  Needs a time-aligned
    numerator (second link or numerator-lattice-archive); falls back
    to the lattice's own forced-alignment vs the orthography."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.err = 0.0
        self.frames = 0

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        num = self.numerator()
        if num is None:
            nfd = NumeratorFromDenominatorNode(
                self.name + ".num", self.config, self.network)
            nfd.links = list(self.links[:1])
            num = nfd.work()
        ref = _word_intervals(num)
        T = int(lat.boundaries.max()) if lat.n_states else 0
        ref_word = np.zeros(max(T, 1), np.int64)       # 0 = eps/silence
        for lab, t0, t1 in ref:
            ref_word[t0:min(t1, len(ref_word))] = lab
        post = lat.posteriors()
        err = np.zeros(max(T, 1), np.float64)
        for k in range(lat.n_arcs):
            t0 = int(lat.boundaries[lat.sources[k]])
            t1 = int(lat.boundaries[lat.targets[k]])
            if t1 <= t0:
                continue
            lab = int(lat.labels[k])
            seg_ref = ref_word[t0:t1]
            err[t0:t1] += post[k] * (seg_ref != lab)
        tf_err = float(err[:T].sum())
        self.err += tf_err
        self.frames += T
        seg = self.network.current_segment
        print(f"<timeframe-error segment=\"{seg.full_name}\" "
              f"expected-errors={tf_err:.1f} frames={T} "
              f"rate={tf_err / max(T, 1):.4f}/>")
        return lat

    def finalize(self):
        print(f"<timeframe-error-summary expected-errors={self.err:.1f} "
              f"frames={self.frames} "
              f"rate={self.err / max(self.frames, 1):.4f}/>")


@register_node("dump-word-boundaries")
class DumpWordBoundariesNode(_LpNode):
    """Log the best path's word boundaries (reference
    actionDumpWordBoundaries)."""

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        seg = self.network.current_segment
        for lab, t0, t1 in _word_intervals(lat):
            print(f"{seg.full_name} {t0} {t1} {lat.word_of(lab)}")
        return lat


# ---------------------------------------------------------------------------
# rescoring (reference LatticeSetGenerator `rescore` action)
# ---------------------------------------------------------------------------


@register_node("rescore-chain")
class RescoreChainNode(_LpNode):
    """The `rescore` action: annotate the lattice topology with new
    scores (reference Speech::LatticeSetGenerator).  Supported rescorer
    groups, each a comma-separated list of selection names:

      lm-rescorers        — replace/extend the `lm` dimension with LM
                            scores along arcs ([<sel>] scale=);
      tdp-rescorers       — per-arc time-distortion penalty
                            (frames * [<sel>] penalty-per-frame);
      pronunciation-rescorers — per-arc pronunciation score from the
                            lexicon ([<sel>] scale=);
      distance-rescorers  — approximate word accuracies vs the
                            numerator intervals (Povey MPE/MWE;
                            [<sel>] distance-type =
                            approximate-word-accuracy | frame-word-
                            accuracy), written to dimension `accuracy`.
    """

    def work(self) -> FlfLattice:
        lat = self.pull_lattice(0)
        for sel in self._names("lm-rescorers"):
            lat = self._rescore_lm(lat, self.config.sub(sel))
        for sel in self._names("tdp-rescorers"):
            lat = self._rescore_tdp(lat, self.config.sub(sel))
        for sel in self._names("pronunciation-rescorers"):
            lat = self._rescore_pron(lat, self.config.sub(sel))
        for sel in self._names("distance-rescorers"):
            lat = self._rescore_distance(lat, self.config.sub(sel))
        return lat

    def _names(self, key: str) -> List[str]:
        v = self.config.get(key)
        return [s.strip() for s in v.split(",") if s.strip()] if v else []

    def _rescore_lm(self, lat: FlfLattice, cfg) -> FlfLattice:
        lm = self.network.context.get("lm")
        if lm is None:
            raise ValueError("rescore: lm-rescorers need [lm] config")
        # the LM composition runs on the legacy (am, lm) view, so any
        # extra score dimensions would fold into am and vanish; within
        # one rescore action lm-rescorers run FIRST (before tdp/pron/
        # distance add dims) — warn when an upstream action already
        # extended the semiring
        extra = [k for k in lat.semiring.keys if k not in ("am", "lm")]
        if extra:
            print(f"<warning node=\"{self.name}\"> lm-rescorers fold "
                  f"extra score dimensions {extra} into am; run the lm "
                  f"rescore before dimension-adding actions</warning>")
        wl = lat.to_word_lattice()
        from ..lattice.rescore import compose_with_lm
        out = compose_with_lm(wl, lm,
                              lm_scale=float(cfg.get("scale") or 1.0))
        return FlfLattice.from_word_lattice(out)

    def _rescore_tdp(self, lat: FlfLattice, cfg) -> FlfLattice:
        per_frame = float(cfg.get("penalty-per-frame") or 0.0)
        frames = (lat.boundaries[lat.targets]
                  - lat.boundaries[lat.sources]).astype(np.float64)
        return lat.extend_dim("tdp", arc_values=per_frame * frames,
                              scale=float(cfg.get("scale") or 1.0))

    def _rescore_pron(self, lat: FlfLattice, cfg) -> FlfLattice:
        lex = self.network.context.get("lexicon")
        if lex is None:
            raise ValueError("rescore: pronunciation-rescorers need "
                             "[lexicon] config")
        score_of: Dict[str, float] = {}
        for lemma in lex.lemmas:
            for orth in lemma.orths:
                if lemma.pronunciations:
                    score_of[orth] = float(
                        lemma.pronunciations[0].score)
        vals = np.asarray([score_of.get((lat.words or {}).get(
            int(l), ""), 0.0) for l in lat.labels])
        return lat.extend_dim("pron", arc_values=vals,
                              scale=float(cfg.get("scale") or 1.0))

    def _rescore_distance(self, lat: FlfLattice, cfg) -> FlfLattice:
        num = self.numerator()
        if num is None:
            nfd = NumeratorFromDenominatorNode(
                self.name + ".num", self.config, self.network)
            nfd.links = list(self.links[:1])
            num = nfd.work()
        ref = _word_intervals(num)
        dtype = cfg.get("distance-type") or "approximate-word-accuracy"
        if dtype == "frame-word-accuracy":
            T = int(lat.boundaries.max()) if lat.n_states else 0
            ref_word = np.zeros(max(T, 1), np.int64)
            for lab, t0, t1 in ref:
                ref_word[t0:min(t1, len(ref_word))] = lab
            vals = np.zeros(lat.n_arcs)
            for k in range(lat.n_arcs):
                t0 = int(lat.boundaries[lat.sources[k]])
                t1 = int(lat.boundaries[lat.targets[k]])
                if t1 > t0:
                    vals[k] = float((ref_word[t0:t1]
                                     == int(lat.labels[k])).sum())
        else:
            # Povey (2002) approximate accuracies over the flat arcs
            # (same formula as nn.sequence_training.povey_arc_accuracies)
            vals = np.full(lat.n_arcs, -1.0)
            for k in range(lat.n_arcs):
                t0 = int(lat.boundaries[lat.sources[k]])
                t1 = int(lat.boundaries[lat.targets[k]])
                lab = int(lat.labels[k])
                best = -1.0
                for word, r0, r1 in ref:
                    dur = max(r1 - r0, 1)
                    ov = max(0, min(t1, r1) - max(t0, r0)) / dur
                    best = max(best, -1.0 + (2.0 * ov if word == lab
                                             else ov))
                vals[k] = best
        return lat.extend_dim("accuracy", arc_values=vals,
                              scale=float(cfg.get("scale") or 1.0))
