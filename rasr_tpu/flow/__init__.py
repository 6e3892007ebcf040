"""Flow dataflow layer: network parser, filter registry, and the compiler
that fuses whole networks into single XLA programs (reference: src/Flow)."""

from .compiler import FlowError, FlowPipeline, compile_network
from .data import Stream
from .network import NetworkDef, NodeDef, LinkDef, parse_network, parse_network_string
from .nodes import Node, Registry, register

__all__ = [
    "FlowError", "FlowPipeline", "compile_network",
    "Stream",
    "NetworkDef", "NodeDef", "LinkDef", "parse_network", "parse_network_string",
    "Node", "Registry", "register",
]
