"""Third tier of Flow filters: the remaining generic registrations of the
reference's Flow module (src/Flow/Module.cc) — the SimpleFunction family,
vector<->scalar maps, malformed-data policies, stream mergers/selectors,
type converters, dump sinks, and sequence filtering.

Same contract as flow/nodes.py: pure `apply()` over whole-segment
`Stream`s, fused into one XLA program by flow/compiler.py.  Nodes whose
reference semantics are inherently dynamic-shape (dismiss-malformed,
sequence-filter, cutters) are `host_only` and operate on numpy.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .data import Stream
from .nodes import Node, register

# --------------------------------------------------------------------------
# SimpleFunction family (src/Flow/SimpleFunction.hh).  The reference
# registers each function twice: over Vector<f32> packets
# ("generic-vector-f32-X") and over scalar DataAdaptor<f32> packets
# ("generic-f32-X").  Streams carry whole segments either way ((T, D) or
# (T, 1)), so one elementwise implementation serves both names.
# --------------------------------------------------------------------------

_TINY = 1.175494e-38  # VectorLnFunctionSave's additive guard


def _simple(names, fn, doc):
    """Register one elementwise SimpleFunction under each reference name."""

    class _SimpleFunctionNode(Node):
        __doc__ = doc
        filter_name = names[0]

        def apply(self, inputs):
            s = inputs[""]
            v = self.attr("value", 0.0, float)
            return {"": s.with_data(fn(s.data, v))}

    _SimpleFunctionNode.__name__ = "SimpleFunction_" + names[0]
    for n in names:
        cls = type(_SimpleFunctionNode.__name__ + "_" + n,
                   (_SimpleFunctionNode,), {"filter_name": n})
        register(cls)
    return _SimpleFunctionNode


_simple(["generic-vector-f32-sqrt", "generic-f32-sqrt"],
        lambda x, v: jnp.sqrt(x),
        "sqrt per component (src/Flow/SimpleFunction.hh VectorSqrtFunction).")
_simple(["generic-vector-f32-cos", "generic-f32-cos"],
        lambda x, v: jnp.cos(x),
        "cos per component (src/Flow/SimpleFunction.hh VectorCosFunction).")
_simple(["generic-vector-f32-abs", "generic-f32-abs"],
        lambda x, v: jnp.abs(x),
        "absolute value (src/Flow/SimpleFunction.hh "
        "VectorAbsoluteValueFunction).")
_simple(["generic-vector-f32-minimum", "generic-f32-minimum"],
        lambda x, v: jnp.minimum(x, v),
        "min(x, value) per component (VectorMinimumFunction).")
_simple(["generic-vector-f32-maximum", "generic-f32-maximum"],
        lambda x, v: jnp.maximum(x, v),
        "max(x, value) per component (VectorMaximumFunction).")
_simple(["generic-vector-f32-ln-save"],
        lambda x, v: jnp.log(x + _TINY),
        "ln(x + tiny): -inf-safe natural log (VectorLnFunctionSave).")
_simple(["generic-vector-f32-linear"],
        lambda x, v: x,
        "identity activation (VectorLinearFunction).")
_simple(["generic-vector-f32-sigmoid"],
        lambda x, v: jax_sigmoid(x),
        "logistic sigmoid activation (VectorSigmoidFunction).")
_simple(["generic-vector-f32-tanh"],
        lambda x, v: jnp.tanh(x),
        "tanh activation (VectorTanhFunction).")


def jax_sigmoid(x):
    import jax
    return jax.nn.sigmoid(x)


@register
class VectorSoftmax(Node):
    """generic-vector-f32-softmax: max-shifted softmax over the feature
    axis of each frame (src/Flow/SimpleFunction.hh VectorSoftmaxFunction)."""
    filter_name = "generic-vector-f32-softmax"

    def apply(self, inputs):
        import jax
        s = inputs[""]
        return {"": s.with_data(jax.nn.softmax(s.data, axis=-1))}


@register
class VectorAdjacentDifference(Node):
    """generic-vector-f32-adjacent-difference: x[i] - x[i-1] along the
    feature axis, first component zeroed (the reference uses
    std::adjacent_difference then overwrites the front —
    src/Flow/SimpleFunction.hh AdjacentDifference)."""
    filter_name = "generic-vector-f32-adjacent-difference"

    def apply(self, inputs):
        s = inputs[""]
        d = jnp.diff(s.data, axis=-1, prepend=s.data[..., :1])
        d = d.at[..., 0].set(0.0)
        return {"": s.with_data(d)}


# --------------------------------------------------------------------------
# vector -> scalar maps (src/Flow/VectorScalarFunction.hh)
# --------------------------------------------------------------------------


@register
class VectorNorm(Node):
    """generic-vector-f32-norm: `value`-th norm per frame
    (sum_i |x_i|^p)^(1/p); p >= f64-max means max-norm
    (src/Flow/VectorScalarFunction.hh NormFunction)."""
    filter_name = "generic-vector-f32-norm"

    def apply(self, inputs):
        s = inputs[""]
        p = self.attr("value", 2.0, float)
        a = jnp.abs(s.data)
        if p >= np.finfo(np.float64).max:
            out = jnp.max(a, axis=-1, keepdims=True)
        elif p == 1.0:
            out = jnp.sum(a, axis=-1, keepdims=True)
        elif p == 2.0:
            out = jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True))
        else:
            out = jnp.power(jnp.sum(jnp.power(a, p), axis=-1, keepdims=True),
                            1.0 / p)
        return {"": s.with_data(out)}


@register
class VectorEnergy(Node):
    """generic-vector-f32-energy: sum of squares per frame
    (src/Flow/VectorScalarFunction.hh EnergyFunction)."""
    filter_name = "generic-vector-f32-energy"

    def apply(self, inputs):
        s = inputs[""]
        e = jnp.sum(jnp.square(s.data), axis=-1, keepdims=True)
        return {"": s.with_data(e)}


# --------------------------------------------------------------------------
# malformed-data policies (src/Flow/VectorMalformed.hh).  A frame is
# malformed when any component is non-finite (Core::isMalformed).
# --------------------------------------------------------------------------


def _finite_rows(x):
    return jnp.all(jnp.isfinite(x), axis=-1)


@register
class KeepMalformed(Node):
    """generic-vector-f32-keep-malformed: pass malformed frames through
    unchanged (KeepMalformedPolicy)."""
    filter_name = "generic-vector-f32-keep-malformed"

    def apply(self, inputs):
        return {"": inputs[""]}


@register
class FloorMalformed(Node):
    """generic-vector-f32-floor-malformed: replace non-finite components
    with attr `value` (FloorMalformedPolicy)."""
    filter_name = "generic-vector-f32-floor-malformed"

    def apply(self, inputs):
        s = inputs[""]
        v = self.attr("value", 0.0, float)
        return {"": s.with_data(jnp.where(jnp.isfinite(s.data), s.data, v))}


@register
class CopyMalformed(Node):
    """generic-vector-f32-copy-malformed: replace a malformed frame with
    the most recent well-formed one (CopyMalformedPolicy keeps the last
    good vector).  Realized as a prefix gather: each frame indexes the
    latest finite row at or before it (cummax over masked indices).
    Leading malformed frames — which the reference drops because no
    predecessor exists — are backward-filled with the first good frame
    so the fused program keeps a static shape."""
    filter_name = "generic-vector-f32-copy-malformed"

    def apply(self, inputs):
        s = inputs[""]
        x = s.data
        ok = _finite_rows(x)
        idx = jnp.where(ok, jnp.arange(x.shape[0]), -1)
        src = jax_cummax(idx)
        first_ok = jnp.argmax(ok)  # 0 if none are finite (then passthrough)
        src = jnp.where(src < 0, first_ok, src)
        out = jnp.where(ok[:, None], x, x[src])
        return {"": s.with_data(out)}


def jax_cummax(x):
    import jax
    return jax.lax.associative_scan(jnp.maximum, x)


@register
class DismissMalformed(Node):
    """generic-vector-f32-dismiss-malformed: drop malformed frames from
    the stream (DismissMalformedPolicy) — dynamic shape, host side."""
    filter_name = "generic-vector-f32-dismiss-malformed"
    host_only = True

    def apply(self, inputs):
        s = inputs[""]
        x = np.asarray(s.data)
        keep = np.isfinite(x).all(axis=-1)
        return {"": s.with_data(x[keep])}


# --------------------------------------------------------------------------
# mergers / selectors (src/Flow/VectorInterleave.hh, VectorSum.hh,
# VectorSelect.hh, VectorSequence.hh)
# --------------------------------------------------------------------------


@register
class VectorInterleave(Node):
    """generic-vector-f32-interleave: component-interleave the frames of
    all input ports ((a0,b0,a1,b1,...) per frame), truncating to the
    smallest input dimension (src/Flow/VectorInterleave.hh)."""
    filter_name = "generic-vector-f32-interleave"
    in_ports = ("*",)

    def apply(self, inputs):
        streams = list(inputs.values())
        d = min(int(s.data.shape[-1]) for s in streams)
        parts = [s.data[..., :d] for s in streams]
        out = jnp.stack(parts, axis=-1).reshape(
            parts[0].shape[:-1] + (d * len(parts),))
        return {"": streams[0].with_data(out)}


@register
class VectorSum(Node):
    """generic-vector-f32-sum: elementwise sum of all input ports
    (src/Flow/VectorSum.hh; inputs padded to the largest dimension with
    zeros, mirroring the reference's resize-on-accumulate)."""
    filter_name = "generic-vector-f32-sum"
    in_ports = ("*",)

    def apply(self, inputs):
        streams = list(inputs.values())
        d = max(int(s.data.shape[-1]) for s in streams)
        acc = None
        for s in streams:
            x = s.data
            if int(x.shape[-1]) < d:
                x = jnp.pad(x, [(0, 0)] * (x.ndim - 1)
                            + [(0, d - int(x.shape[-1]))])
            acc = x if acc is None else acc + x
        return {"": streams[0].with_data(acc)}


def _parse_ranges(spec: str):
    """'0-12,24,30-32' -> index list (reference VectorSelect ranges)."""
    idx = []
    for part in spec.replace(" ", "").split(","):
        if not part:
            continue
        if "-" in part[1:]:  # allow no negatives; ranges are inclusive
            lo, hi = part.split("-", 1)
            idx.extend(range(int(lo), int(hi) + 1))
        else:
            idx.append(int(part))
    return idx


@register
class VectorSelect(Node):
    """generic-vector-f32-select: keep the components named by attr
    `select` ("first-last" ranges / comma lists, inclusive —
    src/Flow/VectorSelect.hh)."""
    filter_name = "generic-vector-f32-select"

    def apply(self, inputs):
        s = inputs[""]
        spec = self.attr("select", "")
        if not spec:
            return {"": s}
        idx = np.asarray(_parse_ranges(spec), np.int32)
        return {"": s.with_data(s.data[..., idx])}


@register
class VectorSequence(Node):
    """generic-vector-f32-sequence: concatenate the whole segment's frames
    into one long vector, optionally reversed (src/Flow/VectorSequence.hh
    CollectorNode semantics on whole-segment streams)."""
    filter_name = "generic-vector-f32-sequence"

    def apply(self, inputs):
        s = inputs[""]
        x = s.data
        if self.attr("reverse", False, bool):
            x = x[::-1]
        return {"": s.with_data(x.reshape(1, -1))}


# --------------------------------------------------------------------------
# type converters (src/Flow/TypeConverter.hh): the payload stays a Stream
# array; conversion changes dtype and the negotiated datatype attribute.
# --------------------------------------------------------------------------


def _converter(name, out_dtype, dt_name, doc):
    class _Converter(Node):
        __doc__ = doc
        filter_name = name
        out_datatype = dt_name

        def apply(self, inputs):
            s = inputs[""]
            return {"": s.with_data(s.data.astype(out_dtype))}

    _Converter.__name__ = "Convert_" + name
    return register(_Converter)


_converter("generic-convert-vector-s8-to-vector-f32", jnp.float32,
           "vector-f32", "s8 samples to f32 (TypeConverter.hh).")
_converter("generic-convert-vector-f32-to-vector-s16", jnp.int16,
           "vector-s16", "f32 samples to s16 (truncating, TypeConverter.hh).")
_converter("generic-convert-vector-f32-to-vector-f64", jnp.float64,
           "vector-f64", "f32 to f64 (TypeConverter.hh).")
_converter("generic-convert-vector-f64-to-vector-f32", jnp.float32,
           "vector-f32", "f64 to f32 (TypeConverter.hh).")
_converter("generic-convert-f32-to-f64", jnp.float64, "f64",
           "scalar f32 to f64 (TypeConverter.hh).")


@register
class VectorToScalar(Node):
    """generic-convert-vector-f32-to-f32: single-component vectors become
    scalars (src/Flow/TypeConverter.hh VectorToScalarConverter — requires
    size-1 input)."""
    filter_name = "generic-convert-vector-f32-to-f32"
    out_datatype = "f32"

    def apply(self, inputs):
        s = inputs[""]
        if int(s.data.shape[-1]) != 1:
            raise ValueError(
                f"node {self.name}: vector-to-scalar needs 1-component "
                f"vectors, got dimension {int(s.data.shape[-1])}")
        return {"": s}


@register
class ScalarToVector(Node):
    """generic-convert-f32-to-vector-f32: wrap each scalar as a
    1-component vector (ScalarToVectorConverter)."""
    filter_name = "generic-convert-f32-to-vector-f32"
    out_datatype = "vector-f32"

    def apply(self, inputs):
        s = inputs[""]
        x = s.data
        if x.ndim == 1:
            x = x[:, None]
        return {"": s.with_data(x)}


@register
class StringToScalar(Node):
    """generic-convert-string-to-f32 (StringConverter): parse string
    packets to scalars; whole-segment streams carry python lists for
    string data, so this runs on host."""
    filter_name = "generic-convert-string-to-f32"
    host_only = True
    out_datatype = "f32"
    np_dtype = np.float32

    def apply(self, inputs):
        s = inputs[""]
        vals = np.asarray([float(v) for v in s.data],
                          self.np_dtype)[:, None]
        return {"": s.with_data(vals)}


@register
class ScalarToString(Node):
    """generic-convert-f32-to-string (ScalarToStringConverter)."""
    filter_name = "generic-convert-f32-to-string"
    host_only = True
    out_datatype = "string"

    def apply(self, inputs):
        s = inputs[""]
        flat = np.asarray(s.data).reshape(-1)
        return {"": s.with_data([repr(float(v)) for v in flat])}


@register
class VectorS8Demultiplex(Node):
    """generic-vector-s8-demultiplex: select one track from interleaved
    multi-channel s8 samples (src/Flow/VectorDemultiplex.hh)."""
    filter_name = "generic-vector-s8-demultiplex"

    def apply(self, inputs):
        s = inputs[""]
        track = self.attr("track", 0, lambda v: int(float(v)))
        n_tracks = int(s.meta.get("n_tracks", 1))
        if n_tracks <= 1:
            return {"": s}
        data = s.data.reshape(-1, n_tracks)[:, track]
        return {"": s.with_data(data, meta={**s.meta, "n_tracks": 1})}


# --------------------------------------------------------------------------
# dump sinks (src/Flow/Dump.hh) — host file IO
# --------------------------------------------------------------------------


class _DumpBase(Node):
    host_only = True

    def _write(self, s: Stream, values) -> None:
        fname = self.attr("file", "")
        if not fname:
            return
        starts, ends = s.timestamps()
        with open(fname, "a") as fh:
            fh.write(f'<dump node="{self.name}">\n')
            for i, row in enumerate(values):
                fh.write(f'  <vector-f32 start="{starts[i]:.6f}" '
                         f'end="{ends[i]:.6f}"> '
                         + " ".join(repr(float(v)) for v in np.atleast_1d(row))
                         + " </vector-f32>\n")
            fh.write("</dump>\n")


@register
class DumpNode(_DumpBase):
    """generic-dump: append incoming packets to attr `file` as XML and
    pass them through unchanged (src/Flow/Dump.hh DumpNode)."""
    filter_name = "generic-dump"

    def apply(self, inputs):
        s = inputs[""]
        self._write(s, np.asarray(s.data))
        return {"": s}


@register
class VectorAbsDump(_DumpBase):
    """generic-vector-f32-abs-dump: like generic-dump but dumps component
    magnitudes (src/Flow/Dump.hh VectorAbsValDumpNode)."""
    filter_name = "generic-vector-f32-abs-dump"

    def apply(self, inputs):
        s = inputs[""]
        self._write(s, np.abs(np.asarray(s.data)))
        return {"": s}


# --------------------------------------------------------------------------
# sequence filtering / corpus key mapping
# --------------------------------------------------------------------------


@register
class SequenceFilter(Node):
    """generic-sequence-filter: drop frames whose entry in the boolean
    `selection` input is false (src/Flow/SequenceFilter.hh).  Dynamic
    output length -> host side."""
    filter_name = "generic-sequence-filter"
    in_ports = ("", "selection")
    host_only = True

    def apply(self, inputs):
        s = inputs[""]
        sel = np.asarray(inputs["selection"].data).reshape(-1).astype(bool)
        x = np.asarray(s.data)
        if len(sel) < x.shape[0]:
            # frames past the selection's coverage are kept (the reference
            # requires full coverage; trailing unaligned frames must not
            # vanish silently)
            sel = np.concatenate(
                [sel, np.ones(x.shape[0] - len(sel), bool)])
        return {"": s.with_data(x[sel[:x.shape[0]]])}


@register
class CorpusKeyMap(Node):
    """generic-coprus-key-map (reference name, typo preserved —
    src/Flow/CorpusKeyMap.hh via Module.cc): map the segment's corpus key
    through a key file ("<key> <value>" lines or XML <map-item>) and store
    it in stream meta for downstream per-key caches (CMVN, adaptation)."""
    filter_name = "generic-coprus-key-map"
    host_only = True
    _cache: dict = {}

    def apply(self, inputs):
        s = inputs[""]
        path = self.attr("map-file", self.attr("file", ""))
        key = str(s.meta.get("corpus_key", s.meta.get("id", "")))
        mapped = key
        if path:
            table = self._cache.get(path)
            if table is None:
                table = self._load(path)
                self._cache[path] = table
            mapped = table.get(key, self.attr("default-output", key))
        return {"": s.with_data(s.data,
                                meta={**s.meta, "corpus_key": mapped})}

    @staticmethod
    def _load(path):
        table = {}
        text = open(path).read()
        if "<" in text:  # XML map-item format
            import xml.etree.ElementTree as ET
            root = ET.fromstring(text)
            for item in root.iter("map-item"):
                table[item.get("key")] = item.get("value")
        else:
            for line in text.splitlines():
                parts = line.split(None, 1)
                if len(parts) == 2:
                    table[parts[0]] = parts[1].strip()
        return table


# --------------------------------------------------------------------------
# f64 variants (the reference registers a few nodes for Vector<f64> too:
# MatrixMultiplicationNode<f64>, VectorAbsValDumpNode<f64>, the f64
# scalar/string converters — src/Flow/Module.cc, src/Signal/Module.cc)
# --------------------------------------------------------------------------


def _alias(name, base_name, doc):
    from .nodes import Registry as _R
    base = _R[base_name]
    cls = type("Alias_" + name.replace("-", "_"), (base,),
               {"filter_name": name, "__doc__": doc})
    return register(cls)


def _register_f64_aliases():
    _alias("signal-matrix-multiplication-f64",
           "signal-matrix-multiplication-f32",
           "f64 matrix multiplication (same XLA GEMM).")
    _alias("generic-vector-f64-abs-dump", "generic-vector-f32-abs-dump",
           "f64 magnitude dump sink.")
    f64_conv = _alias("generic-convert-string-to-f64",
                      "generic-convert-string-to-f32",
                      "string to f64 scalars.")
    f64_conv.out_datatype = "f64"
    f64_conv.np_dtype = np.float64
    _alias("generic-convert-f64-to-string", "generic-convert-f32-to-string",
           "f64 scalars to strings.")


_register_f64_aliases()
