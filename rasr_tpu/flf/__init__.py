"""Flf layer: lattice processing framework (reference: src/Flf)."""

from .processor import FlfNetwork, FlfNode, NodeFactory, register_node

__all__ = ["FlfNetwork", "FlfNode", "NodeFactory", "register_node"]
