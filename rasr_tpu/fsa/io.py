"""FSA text IO: AT&T (OpenFst-compatible) format and Graphviz drawing.

Reference: src/Fsa/Input.hh readAtt / tOutput.hh writeAtt (AT&T arc
lists) and tDraw.hh (dot output).  Format, one arc per line:

    <src> <dst> <ilabel> [<olabel>] [<weight>]
    <final-state> [<weight>]

Labels are symbol strings resolved against optional symbol tables
(id 0 = epsilon by framework convention) or plain integer ids.  The
initial state is the source of the first line, per AT&T convention.
"""

from __future__ import annotations

from typing import Dict, List, Optional, TextIO, Tuple, Union

from .automaton import EPS, Automaton

SymbolTable = Dict[str, int]


def _resolve(token: str, table: Optional[SymbolTable]) -> int:
    if table is not None and token in table:
        return table[token]
    return int(token)


def read_att(source: Union[str, TextIO],
             isymbols: Optional[SymbolTable] = None,
             osymbols: Optional[SymbolTable] = None,
             acceptor: Optional[bool] = None) -> Automaton:
    """Parse AT&T arc-list text into an Automaton.

    acceptor=None auto-detects: 5-field lines are transducers, 4-field
    lines are acceptors with weights (ambiguous 4-field lines resolve as
    transducer only when the 4th field parses as a label, matching
    OpenFst's --acceptor flag semantics is the caller's job via the
    explicit argument).
    """
    close = False
    if isinstance(source, str):
        fh: TextIO = open(source, "r", encoding="utf-8")
        close = True
    else:
        fh = source
    try:
        arcs: List[Tuple[int, int, str, Optional[str], float]] = []
        finals: List[Tuple[int, float]] = []
        initial: Optional[int] = None
        for line in fh:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            if len(parts) == 1:
                finals.append((int(parts[0]), 0.0))
            elif len(parts) == 2:
                finals.append((int(parts[0]), float(parts[1])))
            else:
                src, dst = int(parts[0]), int(parts[1])
                if initial is None:
                    initial = src
                if len(parts) == 3:
                    arcs.append((src, dst, parts[2], None, 0.0))
                elif len(parts) == 4:
                    if acceptor is False:
                        arcs.append((src, dst, parts[2], parts[3], 0.0))
                    else:
                        arcs.append((src, dst, parts[2], None,
                                     float(parts[3])))
                else:
                    arcs.append((src, dst, parts[2], parts[3],
                                 float(parts[4])))
    finally:
        if close:
            fh.close()

    n = 0
    for src, dst, *_ in arcs:
        n = max(n, src + 1, dst + 1)
    for s, _ in finals:
        n = max(n, s + 1)
    fsa = Automaton()
    for _ in range(n):
        fsa.add_state()
    if initial is not None:
        fsa.initial = initial
    for src, dst, ilab, olab, w in arcs:
        i = _resolve(ilab, isymbols)
        o = i if olab is None else _resolve(olab, osymbols or isymbols)
        fsa.add_arc(src, dst, i, o, w)
    for s, w in finals:
        fsa.set_final(s, w)
    return fsa


def _fmt_weight(w: float) -> str:
    return f"{w:g}"


def write_att(fsa: Automaton, sink: Union[str, TextIO],
              isymbols: Optional[SymbolTable] = None,
              osymbols: Optional[SymbolTable] = None,
              acceptor: bool = False) -> None:
    """Write AT&T arc-list text; initial state's arcs come first."""
    inv_i = {v: k for k, v in (isymbols or {}).items()}
    inv_o = {v: k for k, v in (osymbols or isymbols or {}).items()}

    def ilab(x: int) -> str:
        return inv_i.get(x, str(x))

    def olab(x: int) -> str:
        return inv_o.get(x, str(x))

    close = False
    if isinstance(sink, str):
        fh: TextIO = open(sink, "w", encoding="utf-8")
        close = True
    else:
        fh = sink
    try:
        order = [fsa.initial] + [s for s in range(fsa.n_states)
                                 if s != fsa.initial]
        for s in order:
            for a in fsa.arcs[s]:
                if acceptor:
                    fh.write(f"{s}\t{a.target}\t{ilab(a.ilabel)}"
                             f"\t{_fmt_weight(a.weight)}\n")
                else:
                    fh.write(f"{s}\t{a.target}\t{ilab(a.ilabel)}"
                             f"\t{olab(a.olabel)}"
                             f"\t{_fmt_weight(a.weight)}\n")
        for s in order:
            if fsa.is_final(s):
                fh.write(f"{s}\t{_fmt_weight(fsa.final[s])}\n")
    finally:
        if close:
            fh.close()


def write_dot(fsa: Automaton, sink: Union[str, TextIO],
              isymbols: Optional[SymbolTable] = None,
              osymbols: Optional[SymbolTable] = None,
              title: str = "fsa") -> None:
    """Graphviz dot rendering (reference src/Fsa/tDraw.hh): initial
    state bold, final states double circles, arcs labeled
    ``in[:out][/weight]``."""
    inv_i = {v: k for k, v in (isymbols or {}).items()}
    inv_o = {v: k for k, v in (osymbols or isymbols or {}).items()}

    def sym(inv: Dict[int, str], x: int) -> str:
        if x == EPS:
            return inv.get(x, "<eps>")
        return inv.get(x, str(x))

    close = False
    if isinstance(sink, str):
        fh: TextIO = open(sink, "w", encoding="utf-8")
        close = True
    else:
        fh = sink
    try:
        fh.write(f"digraph \"{title}\" {{\nrankdir=LR;\n")
        for s in range(fsa.n_states):
            shape = "doublecircle" if fsa.is_final(s) else "circle"
            extra = ", style=bold" if s == fsa.initial else ""
            label = str(s)
            if fsa.is_final(s) and fsa.final[s] != 0.0:
                label = f"{s}/{_fmt_weight(fsa.final[s])}"
            fh.write(f"n{s} [label=\"{label}\", shape={shape}{extra}];\n")
        for s in range(fsa.n_states):
            for a in fsa.arcs[s]:
                lab = sym(inv_i, a.ilabel)
                if a.olabel != a.ilabel:
                    lab += f":{sym(inv_o, a.olabel)}"
                if a.weight != 0.0:
                    lab += f"/{_fmt_weight(a.weight)}"
                fh.write(f"n{s} -> n{a.target} [label=\"{lab}\"];\n")
        fh.write("}\n")
    finally:
        if close:
            fh.close()


def read_symbols(path: str) -> SymbolTable:
    """OpenFst-style symbol table: ``<symbol> <id>`` per line."""
    table: SymbolTable = {}
    with open(path, "r", encoding="utf-8") as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                table[parts[0]] = int(parts[1])
    return table


def write_symbols(table: SymbolTable, path: str) -> None:
    with open(path, "w", encoding="utf-8") as fh:
        for sym, idx in sorted(table.items(), key=lambda kv: kv[1]):
            fh.write(f"{sym}\t{idx}\n")
