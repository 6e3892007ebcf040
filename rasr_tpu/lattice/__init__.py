"""Lattice layer: word lattices, confusion networks, MBR, LM rescoring
(reference: src/Lattice, parts of src/Flf)."""

from .confusion_network import (ConfusionNetwork, Slot,
                                build_confusion_network,
                                build_confusion_network_arc_cluster,
                                mbr_decode)
from .rescore import compose_with_lm, nbest_rescore
from .transform import (determinize_lattice, minimize_lattice,
                        time_conditioned)
from .word_lattice import LatticeArc, WordLattice, lattice_from_nbest

__all__ = ["ConfusionNetwork", "Slot", "build_confusion_network",
           "build_confusion_network_arc_cluster", "mbr_decode",
           "compose_with_lm", "nbest_rescore", "determinize_lattice",
           "minimize_lattice", "time_conditioned",
           "LatticeArc", "WordLattice", "lattice_from_nbest"]
