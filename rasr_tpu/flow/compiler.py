"""Flow network compiler: lowers a network DAG to one fused JAX program.

The reference executes networks by node-at-a-time pulls through data queues
(src/Flow/AbstractNode.hh:38 work()).  Here the whole network is traced once
per input-shape bucket and compiled by XLA into a single fused program —
windowing, FFT, filterbank and DCT all end up in one kernel launch
(SURVEY.md §2.5 "TPU mapping").

Subnetworks (`filter="mfcc.flow"`) are inlined at build time with their
parameters substituted, so nesting carries no runtime cost.
"""

from __future__ import annotations

import os
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .data import Stream
from .network import LinkDef, NetworkDef, NodeDef, parse_network
from .nodes import Node, Registry


class FlowError(Exception):
    pass


def _flatten(net: NetworkDef, prefix: str = "") -> NetworkDef:
    """Inline subnetwork nodes (filter ends with .flow) recursively."""
    flat = NetworkDef(net.name, list(net.inputs), list(net.outputs),
                      list(net.params), {}, [], net.base_dir)
    # port rewiring maps for inlined subnets: (node, port) -> (node, port)
    rewire_in: Dict[Tuple[str, str], Tuple[str, str]] = {}
    rewire_out: Dict[Tuple[str, str], Tuple[str, str]] = {}

    for name, node in net.nodes.items():
        if node.filter.endswith(".flow"):
            sub_path = node.filter if os.path.isabs(node.filter) else \
                os.path.join(net.base_dir, node.filter)
            sub = parse_network(sub_path).substituted(node.attrs)
            sub = _flatten(sub, prefix=f"{name}/")
            for sname, snode in sub.nodes.items():
                flat.nodes[f"{name}/{sname}"] = NodeDef(
                    f"{name}/{sname}", snode.filter, dict(snode.attrs))
            # subnet's internal links
            for link in sub.links:
                fn = link.from_node if link.from_node == sub.name else f"{name}/{link.from_node}"
                tn = link.to_node if link.to_node == sub.name else f"{name}/{link.to_node}"
                if link.from_node == sub.name:
                    # consumed below via rewire_in once outer link is known
                    rewire_in[(name, link.from_port)] = (tn, link.to_port)
                elif link.to_node == sub.name:
                    rewire_out[(name, link.to_port)] = (fn, link.from_port)
                else:
                    flat.links.append(LinkDef(fn, link.from_port, tn, link.to_port))
        else:
            flat.nodes[name] = NodeDef(name, node.filter, dict(node.attrs))

    for link in net.links:
        frm = (link.from_node, link.from_port)
        to = (link.to_node, link.to_port)
        # outer link into a subnet input port
        if to in rewire_in:
            to = rewire_in[to]
        # outer link from a subnet output port
        if frm in rewire_out:
            frm = rewire_out[frm]
        flat.links.append(LinkDef(frm[0], frm[1], to[0], to[1]))
    return flat


class FlowPipeline:
    """Executable compiled Flow network."""

    def __init__(self, net: NetworkDef, params: Optional[Dict[str, str]] = None,
                 jit: bool = True):
        self.net = _flatten(net.substituted(params or {}))
        self.jit = jit
        self._nodes: Dict[str, Node] = {}
        for name, nd in self.net.nodes.items():
            cls = Registry.get(nd.filter)
            if cls is None:
                raise FlowError(f"unknown flow filter {nd.filter!r} (node {name})")
            self._nodes[name] = cls(name, nd.attrs)
        self._topo = self._toposort()
        self._compiled: Dict[Any, Callable] = {}

    # -- graph helpers -------------------------------------------------------

    def _toposort(self) -> List[str]:
        # edges between real nodes (network-name endpoints are IO)
        net_name = self.net.name
        deps: Dict[str, set] = {n: set() for n in self._nodes}
        for link in self.net.links:
            if link.from_node != net_name and link.to_node != net_name:
                if link.to_node in deps and link.from_node in deps:
                    deps[link.to_node].add(link.from_node)
        order, seen, temp = [], set(), set()

        def visit(n):
            if n in seen:
                return
            if n in temp:
                raise FlowError(f"cycle in flow network at {n}")
            temp.add(n)
            for d in deps[n]:
                visit(d)
            temp.discard(n)
            seen.add(n)
            order.append(n)

        for n in self._nodes:
            visit(n)
        return order

    # -- attribute negotiation -------------------------------------------------

    def configure(self, **input_attrs) -> Dict[str, "Attributes"]:
        """Propagate Flow attributes through the network before data flows
        (reference: Flow::Node::configure / putOutputAttributes chains,
        src/Flow/Attributes.hh).  `input_attrs` maps network input names to
        Attributes (or plain dicts).  Returns attributes at each network
        output; raises FlowError on datatype mismatches."""
        from .data import Attributes
        net_name = self.net.name
        values: Dict[Tuple[str, str], Attributes] = {}
        for name, attrs in input_attrs.items():
            if not isinstance(attrs, Attributes):
                attrs = Attributes(attrs)
            values[(net_name, name)] = attrs
        in_links: Dict[str, List[LinkDef]] = {n: [] for n in self._nodes}
        for link in self.net.links:
            if link.to_node in in_links:
                in_links[link.to_node].append(link)
        for node_name in self._topo:
            node = self._nodes[node_name]
            node_in = {
                link.to_port: values[(link.from_node, link.from_port)]
                for link in in_links[node_name]
                if (link.from_node, link.from_port) in values}
            try:
                outs = node.configure(node_in)
            except ValueError as e:
                raise FlowError(str(e)) from e
            for port, attrs in outs.items():
                values[(node_name, port)] = attrs
        outputs: Dict[str, Attributes] = {}
        for link in self.net.links:
            if link.to_node == net_name and \
                    (link.from_node, link.from_port) in values:
                outputs[link.to_port] = values[(link.from_node, link.from_port)]
        return outputs

    # -- execution -------------------------------------------------------------

    def _trace(self, inputs: Dict[str, Stream]) -> Dict[str, Stream]:
        """Run the network once (trace-time): returns network outputs."""
        net_name = self.net.name
        # values[(node, out_port)] = Stream
        values: Dict[Tuple[str, str], Stream] = {}
        for in_name, stream in inputs.items():
            values[(net_name, in_name)] = stream

        # incoming links per node
        in_links: Dict[str, List[LinkDef]] = {n: [] for n in self._nodes}
        for link in self.net.links:
            if link.to_node in in_links:
                in_links[link.to_node].append(link)

        for node_name in self._topo:
            node = self._nodes[node_name]
            node_inputs: Dict[str, Stream] = {}
            for link in in_links[node_name]:
                src = (link.from_node, link.from_port)
                if src not in values:
                    raise FlowError(
                        f"node {node_name}: input {src} not produced "
                        f"(missing network input or upstream port)")
                node_inputs[link.to_port] = values[src]
            if not node_inputs and node_name != net_name:
                # source node without network input (e.g. audio file reader)
                node_inputs = {}
            outs = node.apply(node_inputs)
            for port, stream in outs.items():
                values[(node_name, port)] = stream

        # collect network outputs
        outputs: Dict[str, Stream] = {}
        for link in self.net.links:
            if link.to_node == net_name:
                outputs[link.to_port] = values[(link.from_node, link.from_port)]
        missing = [o for o in self.net.outputs if o not in outputs]
        if missing:
            raise FlowError(f"network outputs not linked: {missing}")
        return outputs

    def __call__(self, **inputs) -> Dict[str, Stream]:
        """Run the network on named input arrays (or Streams).

        Array inputs are wrapped with sample_rate from the 'sample_rate'
        keyword (default 16 kHz).  The compute graph is jit-compiled per
        (input names, shapes, dtypes) signature.
        """
        sample_rate = float(inputs.pop("sample_rate", 16000.0))
        start_time = float(inputs.pop("start_time", 0.0))
        streams: Dict[str, Stream] = {}
        for k, v in inputs.items():
            if isinstance(v, Stream):
                start_time = v.start_time or start_time
                # trace with zero start; the offset is re-applied per call
                streams[k] = v.with_data(v.data, start_time=0.0)
            else:
                arr = jnp.asarray(v)
                streams[k] = Stream(arr, sample_rate=sample_rate,
                                    start_time=0.0)
        if not self.jit:
            return self._trace(streams)
        if any(n.host_only for n in self._nodes.values()):
            # mixed network: host-only nodes (file IO, dynamic shapes,
            # python objects) run eagerly; each maximal run of device
            # nodes between them is jitted as one fused program
            return self._staged_call(streams, start_time)

        key = tuple(sorted((k, tuple(s.data.shape), str(s.data.dtype),
                            s.sample_rate) for k, s in streams.items()))
        if key not in self._compiled:
            meta_out: Dict[str, Stream] = {}

            def fn(data_dict):
                local = {k: streams[k].with_data(v) for k, v in data_dict.items()}
                outs = self._trace(local)
                meta_out.update(outs)
                return {k: s.data for k, s in outs.items()}

            jitted = jax.jit(fn)
            # trace once to capture output metadata
            _ = jitted.lower({k: s.data for k, s in streams.items()})
            self._compiled[key] = (jitted, dict(meta_out))
        jitted, meta = self._compiled[key]
        arrays = jitted({k: s.data for k, s in streams.items()})
        return {k: meta[k].with_data(
            arrays[k], start_time=meta[k].start_time + start_time)
            for k in arrays}

    # -- staged execution (mixed host/device networks) ------------------------

    def _staged_call(self, inputs: Dict[str, Stream], start_time: float
                     ) -> Dict[str, Stream]:
        """Execute the network in stages: host-only nodes eagerly, each
        maximal contiguous run of device nodes as one jitted program
        (cached per run + input-shape signature)."""
        net_name = self.net.name
        values: Dict[Tuple[str, str], Stream] = {
            (net_name, k): s for k, s in inputs.items()}
        in_links: Dict[str, List[LinkDef]] = {n: [] for n in self._nodes}
        for link in self.net.links:
            if link.to_node in in_links:
                in_links[link.to_node].append(link)

        def gather(node_name):
            out = {}
            for link in in_links[node_name]:
                src = (link.from_node, link.from_port)
                if src not in values:
                    raise FlowError(
                        f"node {node_name}: input {src} not produced")
                out[link.to_port] = values[src]
            return out

        i = 0
        while i < len(self._topo):
            name = self._topo[i]
            if self._nodes[name].host_only:
                for port, stream in self._nodes[name].apply(
                        gather(name)).items():
                    values[(name, port)] = stream
                i += 1
                continue
            run = [name]
            j = i + 1
            while j < len(self._topo) and \
                    not self._nodes[self._topo[j]].host_only:
                run.append(self._topo[j])
                j += 1
            self._run_device_stage(run, values, gather)
            i = j

        outputs: Dict[str, Stream] = {}
        for link in self.net.links:
            if link.to_node == net_name:
                s = values[(link.from_node, link.from_port)]
                outputs[link.to_port] = s.with_data(
                    s.data, start_time=s.start_time + start_time)
        missing = [o for o in self.net.outputs if o not in outputs]
        if missing:
            raise FlowError(f"network outputs not linked: {missing}")
        return outputs

    def _run_device_stage(self, run, values, gather) -> None:
        """jit one contiguous run of device nodes as a single program."""
        run_set = set(run)
        # stage inputs: every (src, port) a run node reads that was
        # produced outside the run
        needed: List[Tuple[str, str]] = []
        for name in run:
            for link in self.net.links:
                if link.to_node == name and link.from_node not in run_set:
                    src = (link.from_node, link.from_port)
                    if src not in needed:
                        needed.append(src)
        in_streams = {src: values[src] for src in needed}

        def run_nodes(local):
            for name in run:
                node_in = {}
                for link in self.net.links:
                    if link.to_node == name:
                        node_in[link.to_port] = local[
                            (link.from_node, link.from_port)]
                for port, stream in self._nodes[name].apply(
                        node_in).items():
                    local[(name, port)] = stream
            return {(n, p): s for (n, p), s in local.items() if n in run_set}

        def is_array(x):
            return hasattr(x, "shape") and hasattr(x, "dtype")

        if not all(is_array(s.data) for s in in_streams.values()):
            # a python-object payload feeds this run: execute eagerly
            values.update(run_nodes(dict(in_streams)))
            return

        def scalar_meta(s):
            return tuple(sorted(
                (k, v) for k, v in s.meta.items()
                if isinstance(v, (int, float, str, bool))))

        # sample_rate / frame_shift / scalar meta (fft_length, ...) are
        # baked into the traced program as constants, so they must key the
        # cache like the whole-network path does
        key = (tuple(run), tuple(
            (src, tuple(s.data.shape), str(s.data.dtype), s.sample_rate,
             s.frame_shift, scalar_meta(s))
            for src, s in in_streams.items()))

        # metadata (start_time, non-scalar meta objects) is host-level and
        # not part of the cache key, so it must be re-derived per call; the
        # closure captures the *current* in_streams each time
        meta_out: Dict[Tuple[str, str], Stream] = {}

        def fn(data):
            local = {src: in_streams[src].with_data(arr)
                     for src, arr in data.items()}
            outs = run_nodes(local)
            meta_out.update(outs)
            return {np_: s.data for np_, s in outs.items()}

        data_in = {src: s.data for src, s in in_streams.items()}
        jitted = self._compiled.get(key)
        if jitted is None:
            # first call: jit traces fn once (populating meta_out) and
            # compiles; no separate lower() pass
            jitted = jax.jit(fn)
            self._compiled[key] = jitted
            arrays = jitted(data_in)
        else:
            # cache hit: abstract trace only (no compile, no compute) to
            # propagate the current call's metadata through the nodes
            jax.eval_shape(fn, data_in)
            arrays = jitted(data_in)
        for np_, arr in arrays.items():
            values[np_] = meta_out[np_].with_data(arr)


def compile_network(path_or_def, params: Optional[Dict[str, str]] = None,
                    jit: bool = True) -> FlowPipeline:
    net = path_or_def if isinstance(path_or_def, NetworkDef) else parse_network(path_or_def)
    return FlowPipeline(net, params=params, jit=jit)
