"""Flow dataflow layer: network parser, filter registry, and the compiler
that fuses whole networks into single XLA programs (reference: src/Flow)."""

from .compiler import FlowError, FlowPipeline, compile_network
from .data import (Attributes, END_OF_STREAM, OUT_OF_DATA, Stream,
                   is_sentinel)
from .network import NetworkDef, NodeDef, LinkDef, parse_network, parse_network_string
from .nodes import Node, Registry, register
from . import nodes_ext  # noqa: F401  (second-tier filter registrations)
from . import nodes_generic  # noqa: F401  (third tier: generic Flow filters)
from . import nodes_signal2  # noqa: F401  (third tier: Signal filters)
from . import nodes_speech  # noqa: F401  (Speech-layer filters)

__all__ = [
    "FlowError", "FlowPipeline", "compile_network",
    "Stream", "Attributes", "END_OF_STREAM", "OUT_OF_DATA", "is_sentinel",
    "NetworkDef", "NodeDef", "LinkDef", "parse_network", "parse_network_string",
    "Node", "Registry", "register",
]
