"""Flow network tests: XML parsing, subnetwork inlining, and end-to-end
compilation of the reference mfcc.flow network into one fused program,
checked against the standalone MfccPipeline."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.flow import FlowPipeline, compile_network, parse_network_string
from rasr_tpu.signal.dsp import MfccPipeline

# the reference mfcc.flow network (same topology/parameters as
# src/Tools/FeatureExtraction/share/mfcc.flow)
MFCC_FLOW = textwrap.dedent("""\
    <?xml version="1.0" encoding="ISO-8859-1"?>
    <network name="mfcc">
      <in name="samples"/>
      <out name="features"/>
      <param name="nr-cepstrum-coefficients"/>

      <node name="preemphasis" filter="signal-preemphasis" alpha="1.00"/>
      <link from="mfcc:samples" to="preemphasis"/>

      <node name="window" filter="signal-window"
            type="hamming" shift=".01" length="0.025"/>
      <link from="preemphasis" to="window"/>

      <node name="fast-fourier-transform" filter="signal-real-fast-fourier-transform"
            maximum-input-size="0.025"/>
      <link from="window" to="fast-fourier-transform"/>

      <node name="amplitude-spectrum" filter="signal-vector-alternating-complex-f32-amplitude"/>
      <link from="fast-fourier-transform" to="amplitude-spectrum"/>

      <node name="filterbank" filter="signal-filterbank"
            warping-function="mel" filter-width="268.258"/>
      <link from="amplitude-spectrum" to="filterbank"/>

      <node name="nonlinear" filter="generic-vector-f32-log"/>
      <link from="filterbank" to="nonlinear"/>

      <node name="cepstrum" filter="signal-cosine-transform"
            nr-outputs="$(nr-cepstrum-coefficients)"/>
      <link from="nonlinear" to="cepstrum"/>

      <link from="cepstrum" to="mfcc:features"/>
    </network>
""")

DERIV_FLOW = textwrap.dedent("""\
    <network name="deriv">
      <in name="in"/>
      <out name="delta"/>
      <out name="deltadelta"/>
      <node name="window" filter="signal-delay"
            max-size="5" right="2" margin-condition="present-not-empty"/>
      <link from="deriv:in" to="window"/>
      <node name="delta" filter="signal-regression" order="1"/>
      <link from="window:-2" to="delta:-2"/>
      <link from="window:-1" to="delta:-1"/>
      <link from="window:0" to="delta:0"/>
      <link from="window:+1" to="delta:+1"/>
      <link from="window:+2" to="delta:+2"/>
      <link from="delta" to="deriv:delta"/>
      <node name="deltadelta" filter="signal-regression" order="2"/>
      <link from="window:-2" to="deltadelta:-2"/>
      <link from="window:-1" to="deltadelta:-1"/>
      <link from="window:0" to="deltadelta:0"/>
      <link from="window:+1" to="deltadelta:+1"/>
      <link from="window:+2" to="deltadelta:+2"/>
      <link from="deltadelta" to="deriv:deltadelta"/>
    </network>
""")


class TestParser:
    def test_parse(self):
        net = parse_network_string(MFCC_FLOW)
        assert net.name == "mfcc"
        assert net.inputs == ["samples"]
        assert net.outputs == ["features"]
        assert net.params == ["nr-cepstrum-coefficients"]
        assert net.nodes["window"].attrs["type"] == "hamming"
        assert len(net.links) == 8

    def test_param_substitution(self):
        net = parse_network_string(MFCC_FLOW)
        sub = net.substituted({"nr-cepstrum-coefficients": "16"})
        assert sub.nodes["cepstrum"].attrs["nr-outputs"] == "16"
        # original untouched
        assert "$(" in net.nodes["cepstrum"].attrs["nr-outputs"]


class TestCompiledMfcc:
    def test_matches_standalone_pipeline(self):
        rng = np.random.default_rng(7)
        sig = rng.standard_normal(8000).astype(np.float32)
        net = parse_network_string(MFCC_FLOW)
        pipe = FlowPipeline(net, params={"nr-cepstrum-coefficients": "16"})
        out = pipe(samples=sig, sample_rate=16000.0)
        feats = np.asarray(out["features"].data)

        ref = MfccPipeline(sample_rate=16000.0, n_cepstra=16)
        expected = np.asarray(ref(sig))
        assert feats.shape == expected.shape
        np.testing.assert_allclose(feats, expected, atol=1e-5)
        # frame timestamps from windowing
        starts, ends = out["features"].timestamps()
        assert abs(starts[1] - 0.01) < 1e-9
        assert abs(ends[0] - 0.025) < 1e-9

    def test_jit_cache_reused(self):
        net = parse_network_string(MFCC_FLOW)
        pipe = FlowPipeline(net, params={"nr-cepstrum-coefficients": "16"})
        sig = np.zeros(4000, dtype=np.float32)
        pipe(samples=sig)
        assert len(pipe._compiled) == 1
        pipe(samples=sig)
        assert len(pipe._compiled) == 1
        pipe(samples=np.zeros(4800, dtype=np.float32))
        assert len(pipe._compiled) == 2


class TestSubnetworkInlining:
    def test_nested_network(self, tmp_path):
        (tmp_path / "mfcc.flow").write_text(MFCC_FLOW)
        main = tmp_path / "main.flow"
        main.write_text(textwrap.dedent("""\
            <network name="main">
              <in name="audio"/>
              <out name="features"/>
              <node name="mfcc" filter="mfcc.flow" nr-cepstrum-coefficients="12"/>
              <link from="main:audio" to="mfcc:samples"/>
              <node name="scaling" filter="generic-vector-f32-multiplication" value="2"/>
              <link from="mfcc:features" to="scaling"/>
              <link from="scaling" to="main:features"/>
            </network>
        """))
        pipe = compile_network(str(main))
        sig = np.random.default_rng(0).standard_normal(4000).astype(np.float32)
        out = pipe(audio=sig)
        feats = np.asarray(out["features"].data)
        ref = MfccPipeline(sample_rate=16000.0, n_cepstra=12)
        np.testing.assert_allclose(feats, 2 * np.asarray(ref(sig)), atol=1e-5)


class TestDerivatives:
    def test_delay_regression_network(self):
        from rasr_tpu.signal.dsp import regression_delta, regression_deltadelta
        rng = np.random.default_rng(3)
        feats = rng.standard_normal((40, 16)).astype(np.float32)
        net = parse_network_string(DERIV_FLOW)
        pipe = FlowPipeline(net)
        from rasr_tpu.flow import Stream
        out = pipe(**{"in": Stream(feats, sample_rate=100.0)})
        np.testing.assert_allclose(np.asarray(out["delta"].data),
                                   np.asarray(regression_delta(feats)), atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["deltadelta"].data),
                                   np.asarray(regression_deltadelta(feats)),
                                   atol=1e-6)


class TestUtilityNodes:
    def test_warp_cutter_repeater(self):
        from rasr_tpu.flow import Stream
        from rasr_tpu.flow.nodes import Registry
        feats = np.arange(40, dtype=np.float32).reshape(10, 4)
        s = Stream(feats, sample_rate=100.0, frame_shift=0.01)
        warp = Registry["warp-time"]("w", {"factor": "2.0"})
        out = warp.apply({"": s})[""]
        assert out.data.shape == (20, 4)
        np.testing.assert_array_equal(np.asarray(out.data[0]),
                                      np.asarray(out.data[1]))
        cut = Registry["generic-cutter"]("c", {"start": "2", "end": "5"})
        out = cut.apply({"": s})[""]
        assert out.data.shape == (3, 4)
        assert abs(out.start_time - 0.02) < 1e-9
        rep = Registry["generic-repeater"]("r", {"count": "3"})
        out = rep.apply({"": s})[""]
        assert out.data.shape == (30, 4)

    def test_cutter_by_time(self):
        from rasr_tpu.flow import Stream
        from rasr_tpu.flow.nodes import Registry
        feats = np.arange(40, dtype=np.float32).reshape(10, 4)
        s = Stream(feats, sample_rate=100.0, frame_shift=0.01,
                   start_time=1.0)
        # frames start at 1.00, 1.01, ..., 1.09
        cut = Registry["generic-cutter"](
            "c", {"start-time": "1.025", "end-time": "1.06"})
        out = cut.apply({"": s})[""]
        # first frame with start >= 1.025 is index 3; last with <= 1.06 is 6
        assert out.data.shape == (4, 4)
        assert abs(out.start_time - 1.03) < 1e-9
        np.testing.assert_array_equal(np.asarray(out.data[0]), feats[3])

    def test_synchronization_and_timestamp_copy(self):
        from rasr_tpu.flow import Stream
        from rasr_tpu.flow.nodes import Registry
        feats = np.arange(40, dtype=np.float32).reshape(10, 4)
        s = Stream(feats, sample_rate=100.0, frame_shift=0.01,
                   start_time=0.0)
        tgt = Stream(np.zeros((5, 2), np.float32), sample_rate=100.0,
                     frame_shift=0.01, start_time=0.03)
        sync = Registry["generic-synchronization"]("s", {})
        out = sync.apply({"": s, "target": tgt})
        assert out[""].data.shape == (5, 4)
        assert abs(out[""].start_time - 0.03) < 1e-9
        np.testing.assert_array_equal(np.asarray(out[""].data[0]), feats[3])
        assert out["target"] is tgt
        tc = Registry["timestamp-copy"]("t", {})
        out = tc.apply({"": s, "target": tgt})[""]
        assert abs(out.start_time - 0.03) < 1e-9
        assert out.data.shape == (10, 4)  # data untouched


class TestDistributedHelpers:
    def test_single_process_noop_and_partition(self):
        from rasr_tpu.core.configuration import Configuration
        from rasr_tpu.parallel.distributed import (
            corpus_partition_for_process, initialize_distributed)
        pid, n = initialize_distributed()
        assert (pid, n) == (0, 1)
        cfg = Configuration(name="t")
        corpus_partition_for_process(cfg, process_id=2, num_processes=4)
        # explicit multi-process mapping sets the reference knobs
        assert cfg.resources().get("*.corpus.partition") == "4"
        assert cfg.resources().get("*.corpus.select-partition") == "2"
