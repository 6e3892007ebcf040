"""Third-tier Flow/Signal filter tests (flow/nodes_generic.py,
flow/nodes_signal2.py): the remaining reference registrations —
SimpleFunction family, vector<->scalar maps, malformed policies,
mergers/selectors, converters, inverse FFT round-trip, per-vector
normalizations, resize/cut, IIR/FIR filters, projection, and a fused
network using the new filters end to end."""

import textwrap

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from rasr_tpu.flow import compile_network, parse_network_string
from rasr_tpu.flow.data import Stream
from rasr_tpu.flow.nodes import Registry


def S(x, sr=100.0, **meta):
    return Stream(data=jnp.asarray(x), sample_rate=sr, meta=meta)


def run(name, data, attrs=None, extra=None):
    node = Registry[name](name, attrs or {})
    inp = {"": S(data)}
    if extra:
        inp.update(extra)
    return np.asarray(node.apply(inp)[""].data)


@pytest.fixture(scope="module")
def x():
    return np.random.RandomState(0).randn(5, 8).astype(np.float32)


def test_simple_function_family(x):
    assert np.allclose(run("generic-vector-f32-sqrt", np.abs(x)),
                       np.sqrt(np.abs(x)), atol=1e-6)
    assert np.allclose(run("generic-vector-f32-cos", x), np.cos(x),
                       atol=1e-6)
    assert np.allclose(run("generic-vector-f32-abs", x), np.abs(x))
    assert np.allclose(
        run("generic-vector-f32-minimum", x, {"value": "0.1"}),
        np.minimum(x, 0.1))
    assert np.allclose(
        run("generic-vector-f32-maximum", x, {"value": "0.1"}),
        np.maximum(x, 0.1))
    assert np.allclose(run("generic-vector-f32-tanh", x), np.tanh(x),
                       atol=1e-6)
    assert np.allclose(run("generic-vector-f32-linear", x), x)
    sig = run("generic-vector-f32-sigmoid", x)
    assert np.allclose(sig, 1.0 / (1.0 + np.exp(-x)), atol=1e-6)
    # scalar stream names resolve to the same elementwise semantics
    assert np.allclose(run("generic-f32-sqrt", np.abs(x[:, :1])),
                       np.sqrt(np.abs(x[:, :1])), atol=1e-6)


def test_softmax_and_adjacent_difference(x):
    sm = run("generic-vector-f32-softmax", x)
    assert np.allclose(sm.sum(-1), 1.0, atol=1e-5)
    ad = run("generic-vector-f32-adjacent-difference", x)
    assert np.allclose(ad[:, 0], 0.0)
    assert np.allclose(ad[:, 1:], np.diff(x, axis=-1), atol=1e-6)


def test_norm_and_energy(x):
    n2 = run("generic-vector-f32-norm", x, {"value": "2"})
    assert np.allclose(n2[:, 0], np.linalg.norm(x, axis=-1), atol=1e-5)
    n1 = run("generic-vector-f32-norm", x, {"value": "1"})
    assert np.allclose(n1[:, 0], np.abs(x).sum(-1), atol=1e-5)
    ninf = run("generic-vector-f32-norm", x, {"value": "1e999"})
    assert np.allclose(ninf[:, 0], np.abs(x).max(-1), atol=1e-6)
    e = run("generic-vector-f32-energy", x)
    assert np.allclose(e[:, 0], (x * x).sum(-1), atol=1e-5)


def test_malformed_policies(x):
    bad = x.copy()
    bad[2, 3] = np.nan
    bad[0, 1] = np.inf
    cm = run("generic-vector-f32-copy-malformed", bad)
    assert np.isfinite(cm).all()
    assert np.allclose(cm[2], cm[1])  # copied previous good frame
    assert np.allclose(cm[0], x[1])   # leading malformed: backward fill
    dm = run("generic-vector-f32-dismiss-malformed", bad)
    assert dm.shape[0] == 3
    fl = run("generic-vector-f32-floor-malformed", bad, {"value": "-1"})
    assert fl[2, 3] == -1 and fl[0, 1] == -1
    kp = run("generic-vector-f32-keep-malformed", bad)
    assert np.isnan(kp[2, 3])


def test_select_interleave_sum_sequence(x):
    sel = run("generic-vector-f32-select", x, {"select": "0-2,5"})
    assert sel.shape == (5, 4) and np.allclose(sel[:, 3], x[:, 5])
    il = Registry["generic-vector-f32-interleave"]("il", {}).apply(
        {"a": S(x), "b": S(2 * x)})[""].data
    il = np.asarray(il)
    assert il.shape == (5, 16)
    assert np.allclose(il[:, 0::2], x) and np.allclose(il[:, 1::2], 2 * x)
    tot = Registry["generic-vector-f32-sum"]("s", {}).apply(
        {"a": S(x), "b": S(x)})[""].data
    assert np.allclose(np.asarray(tot), 2 * x, atol=1e-6)
    seq = run("generic-vector-f32-sequence", x)
    assert seq.shape == (1, 40)
    rev = run("generic-vector-f32-sequence", x, {"reverse": "true"})
    assert np.allclose(rev[0, :8], x[-1])


def test_converters(x):
    s16 = run("generic-convert-vector-f32-to-vector-s16", 100 * x)
    assert s16.dtype == np.int16
    f32 = run("generic-convert-vector-s8-to-vector-f32",
              (10 * x).astype(np.int8))
    assert f32.dtype == np.float32
    v = run("generic-convert-f32-to-vector-f32", x[:, 0])
    assert v.shape == (5, 1)
    sc = run("generic-convert-vector-f32-to-f32", x[:, :1])
    assert sc.shape == (5, 1)
    with pytest.raises(ValueError):
        run("generic-convert-vector-f32-to-f32", x)


def test_sequence_filter_and_dump(tmp_path, x):
    sel = S(np.array([1, 0, 1, 0, 1], bool))
    out = Registry["generic-sequence-filter"]("f", {}).apply(
        {"": S(x), "selection": sel})[""].data
    assert np.asarray(out).shape[0] == 3
    f = tmp_path / "dump.xml"
    Registry["generic-dump"]("d", {"file": str(f)}).apply({"": S(x)})
    text = f.read_text()
    assert "<dump" in text and "vector-f32" in text


def test_corpus_key_map(tmp_path, x):
    f = tmp_path / "map.txt"
    f.write_text("seg-1 speakerA\nseg-2 speakerB\n")
    node = Registry["generic-coprus-key-map"]("m", {"map-file": str(f)})
    out = node.apply({"": S(x, corpus_key="seg-2")})[""]
    assert out.meta["corpus_key"] == "speakerB"


# -- signal tier -----------------------------------------------------------


def test_ifft_roundtrip(x):
    from rasr_tpu.signal import dsp
    re, im = dsp.rdft(jnp.asarray(x), 16, 1.0)
    spec = jax.lax.complex(re, im)
    s = Stream(data=spec, sample_rate=100.0,
               meta={"fft_length": 16, "fft_scale": 1.0})
    rec = np.asarray(Registry["signal-real-inverse-fast-fourier-transform"](
        "i", {}).apply({"": s})[""].data)
    assert np.allclose(rec[:, :8], x, atol=1e-4)
    # complex forward/inverse pair
    c = Registry["signal-complex-fast-fourier-transform"]("c", {}).apply(
        {"": S(x)})[""]
    back = Registry["signal-complex-inverse-fast-fourier-transform"](
        "ci", {}).apply({"": c})[""].data
    assert np.allclose(np.asarray(back).real[:, :8], x, atol=1e-4)


def test_complex_parts(x):
    from rasr_tpu.signal import dsp
    re, im = dsp.rdft(jnp.asarray(x), 16, 1.0)
    spec = jax.lax.complex(re, im)
    s = Stream(data=spec, sample_rate=100.0)
    parts = {}
    for part in ("real-part", "imaginary-part", "phase", "absolute-square"):
        parts[part] = np.asarray(Registry[
            f"signal-vector-alternating-complex-f32-{part}"](
            part, {}).apply({"": s})[""].data)
    sp = np.asarray(spec)
    assert np.allclose(parts["real-part"], sp.real, atol=1e-5)
    assert np.allclose(parts["imaginary-part"], sp.imag, atol=1e-5)
    assert np.allclose(parts["phase"], np.angle(sp), atol=1e-5)
    assert np.allclose(parts["absolute-square"], np.abs(sp) ** 2, atol=1e-4)
    # real -> complex -> real-part roundtrip
    cx = Registry["signal-vector-f32-to-vector-alternating-complex-f32"](
        "v", {}).apply({"": S(x)})[""].data
    assert np.allclose(np.asarray(cx).real, x) and np.allclose(
        np.asarray(cx).imag, 0.0)


def test_vector_normalizations(x):
    vn = run("signal-vector-f32-variance-normalization", x)
    assert np.allclose(vn.mean(-1), 0, atol=1e-5)
    assert np.allclose(vn.std(-1), 1, atol=1e-3)
    mn = run("signal-vector-f32-mean-normalization", x)
    assert np.allclose(mn.mean(-1), 0, atol=1e-6)
    en = run("signal-vector-f32-energy-normalization", x)
    assert np.allclose((en * en).sum(-1), 1.0, atol=1e-5)
    men = run("signal-vector-f32-mean-energy-normalization", x)
    assert np.allclose((men * men).mean(-1), 1.0, atol=1e-5)
    mx = run("signal-vector-f32-maximum-normalization", x)
    assert np.allclose(mx.max(-1), 1.0, atol=1e-6)
    an = run("signal-vector-f32-amplitude-spectrum-energy-normalization",
             np.abs(x) + 0.1)
    assert np.isfinite(an).all()


def test_resize_and_cut(x):
    rz = run("signal-vector-f32-resize", x,
             {"new-discrete-size": "12", "initial-value": "7"})
    assert rz.shape == (5, 12) and rz[0, 11] == 7
    rz2 = run("signal-vector-f32-resize", x,
              {"new-discrete-size": "4", "change-front": "true"})
    assert rz2.shape == (5, 4) and np.allclose(rz2, x[:, 4:])
    ct = run("signal-vector-f32-cut-relative-length", x,
             {"first": "0.25", "last": "0.75"})
    assert 0 < ct.shape[1] < 8
    cl = run("signal-vector-f32-cut-length", x,
             {"first": "0.01", "last": "0.05"})  # x sr 100 -> idx 1..5
    assert cl.shape == (5, 5) and np.allclose(cl, x[:, 1:6])
    cs = run("signal-vector-f32-cut-relative-surface", np.abs(x),
             {"first": "0.0", "last": "0.5"})
    assert 0 < cs.shape[1] <= 8


def test_linear_and_fir_filters(x):
    # IIR impulse response of y[n] = x[n] + 0.5 y[n-1]
    imp = np.array([1, 0, 0, 0], np.float32)
    lf = run("signal-linear-filter", imp, {"b": "1", "a": "-0.5"})
    assert np.allclose(lf, [1, 0.5, 0.25, 0.125], atol=1e-5)
    # FIR-only path matches numpy convolution
    h = [0.25, 0.5, 0.25]
    ff = run("signal-windowing-fir-filter", x[0],
             {"coefficients": " ".join(map(str, h))})
    ref = np.convolve(x[0], h, mode="same")
    assert np.allclose(ff, ref, atol=1e-5)


def test_projection_and_ar_spectrum(x):
    pr = run("projection-f32", x, {"components": "3 1 -1 0"})
    assert pr.shape == (5, 3) and np.allclose(pr[:, 0], x[:, 3])
    ar = run("nn-autoregression-to-spectrum",
             np.hstack([np.ones((5, 1), np.float32), 0.1 * x[:, :4]]),
             {"nr-outputs": "17"})
    assert ar.shape == (5, 17) and np.isfinite(ar).all()


def test_random_vector_source():
    node = Registry["signal-random-vector-f32"](
        "r", {"size": "4", "nr-outputs": "3", "seed": "1"})
    out = node.apply({})[""]
    assert np.asarray(out.data).shape == (3, 4)


def test_fused_network_with_new_filters(x):
    """A network chaining tier-3 filters compiles into one fused program."""
    net = parse_network_string(textwrap.dedent("""\
        <network name="t3">
          <in name="feat"/>
          <out name="out"/>
          <node name="absn" filter="generic-vector-f32-abs"/>
          <link from="t3:feat" to="absn"/>
          <node name="sqrtn" filter="generic-vector-f32-sqrt"/>
          <link from="absn" to="sqrtn"/>
          <node name="sel" filter="generic-vector-f32-select" select="0-3"/>
          <link from="sqrtn" to="sel"/>
          <node name="norm" filter="signal-vector-f32-mean-normalization"/>
          <link from="sel" to="norm"/>
          <link from="norm" to="t3:out"/>
        </network>
    """))
    pipe = compile_network(net)
    out = pipe(feat=S(x))["out"]
    ref = np.sqrt(np.abs(x))[:, :4]
    ref = ref - ref.mean(-1, keepdims=True)
    assert np.allclose(np.asarray(out.data), ref, atol=1e-5)
