"""lattice-processor: config-driven lattice action chains.

The reference tool (src/Tools/LatticeProcessor/LatticeProcessor.cc:46-92)
runs a comma-separated `actions = read,...,write` chain over corpus
segments, each action configured by the matching entry of
`selections = sa,...,sz` (a config section under [lattice-processor]).
It drives the legacy sequence-training lattice pipelines: numerator /
denominator generation, merging, accuracy rescoring, pruning, error
statistics.

This tool keeps that exact surface and translates the chain onto the
Flf node registry (flf/processor.py + flf/nodes.py + flf/nodes_lp.py),
so flf-tool networks and lattice-processor chains share one
implementation.

Config-driven usage:

    python -m rasr_tpu.tools.lattice_processor --config=mmi.config

    [lattice-processor]
    actions    = read,numerator-from-denominator,write
    selections = read,num,write
    [lattice-processor.read.lattice-archive]
    path = denominators.cache
    format = flf
    [lattice-processor.write.lattice-archive]
    path = numerators.cache
    format = flf
    [corpus]
    file = corpus.xml

Supported actions (reference name -> shared Flf node):
    read write info copy cache prune determinization remove-epsilon
    change-semiring multiply linear-combination single-best-legacy
    extract-n-best-list generate-numerator numerator-from-denominator
    merge unite spoken-and-competing word-to-phoneme
    remove-silences-and-noises remove-redundant-silences-and-noises
    time-conditioned rescore timeframe-error density graph-error-rate
    dump-word-boundaries word-posterior-confidence
    search-minimum-bayes-risk skip-empty

The legacy positional HTK-SLF commands (info/best/prune/...) remain
available for quick file surgery.
"""

from __future__ import annotations

import sys
from typing import Dict, List, Optional

from ..core.configuration import Configuration
from ..fsa.automaton import EPS
from ..lattice import WordLattice, determinize_lattice, time_conditioned

from ..flf.nodes_lp import NONWORD_ORTHS as SILENCE_ORTHS

#: reference action name -> Flf node type
ACTION_NODES = {
    "read": "archive-reader",
    "write": "archive-writer",
    "info": "info",
    "copy": "copy",
    "cache": "cache",
    "prune": "prune-posterior",
    "determinization": "determinize",
    "remove-epsilon": "remove-epsilons",
    "change-semiring": "change-semiring",
    "multiply": "multiply",
    "linear-combination": "linear-combination",
    "single-best-legacy": "best",
    "extract-n-best-list": "n-best",
    "generate-numerator": "forced-alignment",
    "numerator-from-denominator": "numerator-from-denominator",
    "merge": "merge-numerator",
    "unite": "unite-archive",
    "spoken-and-competing": "spoken-and-competing",
    "word-to-phoneme": "word-to-phoneme",
    "remove-silences-and-noises": "remove-silences-and-noises",
    "remove-redundant-silences-and-noises": "remove-silences-and-noises",
    "time-conditioned": "time-conditioned",
    "rescore": "rescore-chain",
    "timeframe-error": "timeframe-error",
    "density": "density",
    "graph-error-rate": "graph-error-rate",
    "dump-word-boundaries": "dump-word-boundaries",
    "word-posterior-confidence": "add-word-confidence",
    "search-minimum-bayes-risk": "local-cost-decoder",
    "skip-empty": "filter",
}


class _Chain:
    """Minimal network shim for a linear action chain: provides the
    FlfNode protocol surface (node lookup, current segment, context)."""

    def __init__(self, context: Optional[Dict] = None):
        self.context = context or {}
        self.current_segment = None
        self.segment_counter = 0
        self._nodes: Dict[str, object] = {}

    def node(self, name: str):
        return self._nodes[name]


def _build_context(config: Configuration) -> Dict:
    """lexicon / lm from [lexicon] / [lm] (as FlfNetwork does)."""
    context: Dict = {}
    needs = (config.sub("lm").get("type") or config.sub("lm").get("file")
             or config.sub("lexicon").get("file"))
    if needs:
        from ..api import ModelCombination
        mc = ModelCombination.create(config)
        if mc.language_model is not None:
            context["lm"] = mc.language_model
        if mc.lexicon is not None:
            context["lexicon"] = mc.lexicon
    return context


def run_config(config: Configuration) -> int:
    """Run the [lattice-processor] action chain over the corpus."""
    from ..bliss.corpus import CorpusDescription
    from ..flf.processor import NodeFactory  # registers all node types

    lp = config.sub("lattice-processor")
    actions = [a.strip() for a in (lp.get("actions") or "").split(",")
               if a.strip()]
    selections = [s.strip() for s in (lp.get("selections") or "").split(",")
                  if s.strip()]
    if not actions:
        raise ValueError("[lattice-processor] actions is empty")
    if not selections:
        selections = list(actions)
    if len(selections) != len(actions):
        raise ValueError(f"{len(actions)} actions but {len(selections)} "
                         "selections")

    chain = _Chain(_build_context(config))
    prev: Optional[str] = None
    order: List[str] = []
    for action, sel in zip(actions, selections):
        if action not in ACTION_NODES:
            raise ValueError(f"unknown lattice-processor action {action!r}; "
                             f"known: {sorted(ACTION_NODES)}")
        ncfg = lp.sub(sel)
        # reference nests archive params as <sel>.lattice-archive.*
        if action in ("read", "write") \
                and ncfg.sub("lattice-archive").get("path"):
            ncfg = ncfg.sub("lattice-archive")
        if action == "remove-redundant-silences-and-noises" \
                and not ncfg.get("redundant"):
            ncfg.set(f"{ncfg.selection}.redundant", "true")
        node = NodeFactory[ACTION_NODES[action]](sel, ncfg, chain)
        node.links = [prev] if prev else []
        if sel in chain._nodes:
            raise ValueError(f"duplicate selection name {sel!r}")
        chain._nodes[sel] = node
        order.append(sel)
        prev = sel

    corpus = CorpusDescription(config.sub("corpus"))
    n = 0
    for seg in corpus.segments():
        chain.current_segment = seg
        chain.segment_counter += 1
        chain._nodes[order[-1]].pull()
        n += 1
    for name in order:
        chain._nodes[name].finalize()
    print(f"<lattice-processor segments={n} actions={len(order)}/>")
    return 0


# ---------------------------------------------------------------------------
# legacy positional HTK-SLF commands
# ---------------------------------------------------------------------------


def remove_silences(lat: WordLattice) -> WordLattice:
    """Relabel silence/noise arcs to epsilon
    (actionRemoveSilencesAndNoises)."""
    out = WordLattice(words=dict(lat.words or {}))
    for s in range(lat.n_states):
        out.add_state(lat.boundaries[s])
    out.initial = lat.initial
    for s in range(lat.n_states):
        for arc in lat.arcs[s]:
            orth = (lat.words or {}).get(arc.word, "")
            word = EPS if orth in SILENCE_ORTHS else arc.word
            out.add_arc(s, arc.target, word, arc.am_score, arc.lm_score)
    out.final = dict(lat.final)
    return out


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1

    if any(a.startswith("--config") for a in argv) \
            or any(a.startswith("--lattice-processor.") for a in argv):
        config = Configuration()
        config.set_from_command_line(argv)
        return run_config(config)

    cmd, args = argv[0], argv[1:]

    def load(path: str) -> WordLattice:
        return WordLattice.read_htk_slf(path)

    def save(lat: WordLattice, path: str) -> None:
        lat.write_htk_slf(path)

    if cmd == "info":
        lat = load(args[0])
        print(f"states: {lat.n_states}")
        print(f"arcs: {lat.n_arcs}")
        print(f"final states: {len(lat.final)}")
        print(f"last frame: {max(lat.boundaries, default=0)}")
    elif cmd == "best":
        lat = load(args[0])
        labels, score = lat.best()
        words = lat.words or {}
        print(f"{score:.4f}\t" + " ".join(
            words.get(l, str(l)) for l in labels if l != EPS))
    elif cmd == "extract-n-best-list":
        lat = load(args[1])
        words = lat.words or {}
        for labels, score in lat.n_best(int(args[0])):
            print(f"{score:.4f}\t" + " ".join(
                words.get(l, str(l)) for l in labels if l != EPS))
    elif cmd == "prune":
        save(load(args[1]).prune_posterior(float(args[0])), args[2])
    elif cmd == "time-conditioned":
        save(time_conditioned(load(args[0])), args[1])
    elif cmd == "determinize":
        save(determinize_lattice(load(args[0])), args[1])
    elif cmd == "remove-silences":
        save(remove_silences(load(args[0])), args[1])
    elif cmd == "copy":
        save(load(args[0]), args[1])
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
