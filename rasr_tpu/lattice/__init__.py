"""Lattice layer: word lattices, confusion networks, MBR
(reference: src/Lattice, parts of src/Flf)."""

from .confusion_network import (ConfusionNetwork, Slot,
                                build_confusion_network, mbr_decode)
from .word_lattice import LatticeArc, WordLattice, lattice_from_nbest

__all__ = ["ConfusionNetwork", "Slot", "build_confusion_network",
           "mbr_decode", "LatticeArc", "WordLattice", "lattice_from_nbest"]
