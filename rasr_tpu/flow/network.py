"""Flow network XML parser.

Parses the reference .flow network format (src/Flow/NetworkParser.hh:103,
doc/architecture.rst:430-445):

    <network name="mfcc">
      <in name="samples"/>
      <out name="features"/>
      <param name="nr-cepstrum-coefficients"/>
      <node name="cepstrum" filter="signal-cosine-transform"
            nr-outputs="$(nr-cepstrum-coefficients)"/>
      <link from="mfcc:samples" to="preemphasis"/>
      <link from="cepstrum" to="mfcc:features"/>
    </network>

`$(param)` placeholders in node attributes are substituted at instantiation
time from the parameters passed by the embedding network / tool config.
A node whose `filter` ends in ".flow" instantiates a subnetwork.
"""

from __future__ import annotations

import os
import re
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

_PARAM_RE = re.compile(r"\$\(([^)]+)\)")


@dataclass
class NodeDef:
    name: str
    filter: str
    attrs: Dict[str, str] = field(default_factory=dict)


@dataclass
class LinkDef:
    from_node: str
    from_port: str
    to_node: str
    to_port: str


@dataclass
class NetworkDef:
    name: str
    inputs: List[str] = field(default_factory=list)
    outputs: List[str] = field(default_factory=list)
    params: List[str] = field(default_factory=list)
    nodes: Dict[str, NodeDef] = field(default_factory=dict)
    links: List[LinkDef] = field(default_factory=list)
    base_dir: str = ""

    def substituted(self, params: Dict[str, str]) -> "NetworkDef":
        """Return a copy with $(param) placeholders replaced in node attrs."""
        def sub(text: str) -> str:
            def repl(m):
                key = m.group(1)
                if key in params:
                    return str(params[key])
                return m.group(0)
            return _PARAM_RE.sub(repl, text)

        nodes = {n: NodeDef(d.name, d.filter, {k: sub(v) for k, v in d.attrs.items()})
                 for n, d in self.nodes.items()}
        return NetworkDef(self.name, list(self.inputs), list(self.outputs),
                          list(self.params), nodes, list(self.links), self.base_dir)


def _split_endpoint(ep: str, network_name: str, default_port: str = "") -> Tuple[str, str]:
    """'node:port' -> (node, port); the network's own name refers to its
    external in/out ports."""
    if ":" in ep:
        node, port = ep.split(":", 1)
    else:
        node, port = ep, default_port
    return node, port


def parse_network(source, base_dir: str = "") -> NetworkDef:
    """Parse a .flow file (path or file-like) into a NetworkDef."""
    if isinstance(source, str):
        base_dir = base_dir or os.path.dirname(os.path.abspath(source))
        tree = ET.parse(source)
    else:
        tree = ET.parse(source)
    root = tree.getroot()
    if root.tag != "network":
        raise ValueError(f"flow file root must be <network>, got <{root.tag}>")
    net = NetworkDef(name=root.get("name", "network"), base_dir=base_dir)
    for elem in root:
        if elem.tag == "in":
            net.inputs.append(elem.get("name", ""))
        elif elem.tag == "out":
            net.outputs.append(elem.get("name", ""))
        elif elem.tag == "param":
            net.params.append(elem.get("name", ""))
        elif elem.tag == "node":
            attrs = {k: v for k, v in elem.attrib.items()
                     if k not in ("name", "filter")}
            node = NodeDef(name=elem.get("name", ""),
                           filter=elem.get("filter", ""), attrs=attrs)
            if not node.name or not node.filter:
                raise ValueError("flow <node> requires name and filter")
            net.nodes[node.name] = node
        elif elem.tag == "link":
            frm = elem.get("from", "")
            to = elem.get("to", "")
            fn, fp = _split_endpoint(frm, net.name)
            tn, tp = _split_endpoint(to, net.name)
            net.links.append(LinkDef(fn, fp, tn, tp))
    return net


def parse_network_string(text: str, base_dir: str = "") -> NetworkDef:
    import io
    return parse_network(io.StringIO(text), base_dir=base_dir)
