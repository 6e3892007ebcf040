"""Fsa layer: weighted automata and core algorithms (reference: src/Fsa)."""

from .automaton import (EPS, INF, LOG, TROPICAL, Arc, Automaton, LogSemiring,
                        Semiring, TropicalSemiring, best_path, compose,
                        connect, determinize, linear_automaton, logadd,
                        minimize, n_best, prune, remove_epsilons, reverse,
                        sssp)
from .io import (read_att, read_symbols, write_att, write_dot,
                 write_symbols)

__all__ = ["EPS", "INF", "LOG", "TROPICAL", "Arc", "Automaton", "LogSemiring",
           "Semiring", "TropicalSemiring", "best_path", "compose", "connect",
           "determinize", "linear_automaton", "logadd", "minimize", "n_best",
           "prune", "remove_epsilons", "reverse", "sssp",
           "read_att", "read_symbols", "write_att", "write_dot",
           "write_symbols"]
