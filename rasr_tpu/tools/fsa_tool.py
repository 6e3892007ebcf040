"""fsa tool: inspect and transform automata in AT&T text format
(reference: src/Tools/Fsa/Main.cc operation pipeline).

Usage:
    python -m rasr_tpu.tools.fsa_tool info <in.fsa>
    python -m rasr_tpu.tools.fsa_tool best <in.fsa> [--symbols tbl]
    python -m rasr_tpu.tools.fsa_tool n-best <n> <in.fsa>
    python -m rasr_tpu.tools.fsa_tool determinize <in.fsa> <out.fsa>
    python -m rasr_tpu.tools.fsa_tool minimize <in.fsa> <out.fsa>
    python -m rasr_tpu.tools.fsa_tool remove-epsilons <in.fsa> <out.fsa>
    python -m rasr_tpu.tools.fsa_tool connect <in.fsa> <out.fsa>
    python -m rasr_tpu.tools.fsa_tool prune <threshold> <in.fsa> <out.fsa>
    python -m rasr_tpu.tools.fsa_tool compose <a.fsa> <b.fsa> <out.fsa>
    python -m rasr_tpu.tools.fsa_tool draw <in.fsa> <out.dot>

``--symbols <file>`` resolves labels against an OpenFst-style symbol
table for reading/printing; ``--acceptor`` reads/writes acceptor lines.
"""

from __future__ import annotations

import sys
from typing import List, Optional

from ..fsa import (best_path, compose, connect, determinize, minimize,
                   n_best, prune, remove_epsilons)
from ..fsa.io import read_att, read_symbols, write_att, write_dot


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    symbols = None
    acceptor = False
    if "--symbols" in argv:
        i = argv.index("--symbols")
        symbols = read_symbols(argv[i + 1])
        del argv[i:i + 2]
    if "--acceptor" in argv:
        argv.remove("--acceptor")
        acceptor = True
    if not argv:
        print(__doc__)
        return 1
    cmd, args = argv[0], argv[1:]

    def load(path: str):
        return read_att(path, isymbols=symbols,
                        acceptor=True if acceptor else None)

    def save(fsa, path: str) -> None:
        write_att(fsa, path, isymbols=symbols, acceptor=acceptor)

    def fmt(labels: List[int]) -> str:
        if symbols:
            inv = {v: k for k, v in symbols.items()}
            return " ".join(inv.get(x, str(x)) for x in labels)
        return " ".join(str(x) for x in labels)

    if cmd == "info":
        f = load(args[0])
        print(f"states: {f.n_states}")
        print(f"arcs: {f.n_arcs}")
        print(f"initial: {f.initial}")
        print(f"final states: {len(f.final)}")
        print(f"semiring: {f.semiring.name}")
    elif cmd == "best":
        ilabels, olabels, score = best_path(load(args[0]))
        print(f"{score:.6f}\t{fmt([x for x in ilabels if x])}")
    elif cmd == "n-best":
        for labels, score in n_best(load(args[1]), int(args[0])):
            print(f"{score:.6f}\t{fmt([x for x in labels if x])}")
    elif cmd == "determinize":
        save(determinize(load(args[0])), args[1])
    elif cmd == "minimize":
        save(minimize(load(args[0])), args[1])
    elif cmd == "remove-epsilons":
        save(remove_epsilons(load(args[0])), args[1])
    elif cmd == "connect":
        save(connect(load(args[0])), args[1])
    elif cmd == "prune":
        save(prune(load(args[1]), float(args[0])), args[2])
    elif cmd == "compose":
        save(compose(load(args[0]), load(args[1])), args[2])
    elif cmd == "draw":
        write_dot(load(args[0]), args[1], isymbols=symbols)
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
