"""Fsa layer: weighted automata and core algorithms (reference: src/Fsa)."""

from .automaton import (EPS, INF, LOG, TROPICAL, Arc, Automaton, LogSemiring,
                        Semiring, TropicalSemiring, best_path, compose,
                        connect, determinize, linear_automaton, logadd,
                        minimize, n_best, prune, remove_epsilons, reverse,
                        sssp)

__all__ = ["EPS", "INF", "LOG", "TROPICAL", "Arc", "Automaton", "LogSemiring",
           "Semiring", "TropicalSemiring", "best_path", "compose", "connect",
           "determinize", "linear_automaton", "logadd", "minimize", "n_best",
           "prune", "remove_epsilons", "reverse", "sssp"]
