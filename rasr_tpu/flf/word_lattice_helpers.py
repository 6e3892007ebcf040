"""Lattice helper transforms for Flf nodes."""

from __future__ import annotations

from ..lattice.word_lattice import WordLattice, lattice_from_nbest


def nbest_lattice(lattice: WordLattice, n: int) -> WordLattice:
    """Prefix-merged lattice of the n best paths."""
    paths = lattice.n_best(n)
    return lattice_from_nbest([(labels, score, 0.0)
                               for labels, score in paths],
                              words=lattice.words)
