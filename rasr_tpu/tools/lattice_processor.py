"""lattice-processor: operate on word-lattice files
(reference: src/Tools/LatticeProcessor/LatticeProcessor.cc action
chains: info / prune / time-conditioned / extract-n-best-list /
remove-silences-and-noises / copy).  Lattices are HTK SLF files
(`WordLattice.read_htk_slf` / `write_htk_slf`).

Usage:
    python -m rasr_tpu.tools.lattice_processor info <in.slf>
    python -m rasr_tpu.tools.lattice_processor best <in.slf>
    python -m rasr_tpu.tools.lattice_processor extract-n-best-list <n> <in.slf>
    python -m rasr_tpu.tools.lattice_processor prune <threshold> <in.slf> <out.slf>
    python -m rasr_tpu.tools.lattice_processor time-conditioned <in.slf> <out.slf>
    python -m rasr_tpu.tools.lattice_processor determinize <in.slf> <out.slf>
    python -m rasr_tpu.tools.lattice_processor remove-silences <in.slf> <out.slf>
    python -m rasr_tpu.tools.lattice_processor copy <in.slf> <out.slf>
"""

from __future__ import annotations

import sys
from typing import List, Optional

from ..fsa.automaton import EPS
from ..lattice import (WordLattice, determinize_lattice, time_conditioned)

SILENCE_ORTHS = {"[SILENCE]", "!NULL", "<sil>", "[NOISE]"}


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
