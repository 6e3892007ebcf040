"""DC detection, formant extraction, BIC segment clustering."""

import math

import numpy as np
import pytest

from rasr_tpu.signal.analysis import (Formant, GaussianSegment,
                                      cluster_segments, dc_detection,
                                      extract_formants)


class TestDcDetection:
    def test_removes_long_constant_run(self):
        rng = np.random.default_rng(0)
        speech1 = rng.uniform(-1, 1, 200).astype(np.float32)
        dc = np.full(50, 0.25, np.float32)
        speech2 = rng.uniform(-1, 1, 150).astype(np.float32)
        x = np.concatenate([speech1, dc, speech2])
        cleaned, ranges = dc_detection(x, max_dc_increment=0.05,
                                       min_dc_length=10)
        assert len(cleaned) < len(x)
        assert len(cleaned) >= 350  # both speech parts kept
        assert len(ranges) == 2

    def test_keeps_clean_signal(self):
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, 300).astype(np.float32)
        cleaned, ranges = dc_detection(x, max_dc_increment=0.05,
                                       min_dc_length=10)
        assert len(cleaned) == 300
        assert ranges == [(0, 300)]

    def test_short_dc_run_survives(self):
        rng = np.random.default_rng(2)
        a = rng.uniform(-1, 1, 100).astype(np.float32)
        short_dc = np.full(5, 0.5, np.float32)
        b = rng.uniform(-1, 1, 100).astype(np.float32)
        x = np.concatenate([a, short_dc, b])
        cleaned, _ = dc_detection(x, max_dc_increment=0.05,
                                  min_dc_length=10)
        assert len(cleaned) == len(x)

    def test_min_non_dc_discard(self):
        rng = np.random.default_rng(3)
        burst = rng.uniform(-1, 1, 8).astype(np.float32)
        dc = np.zeros(50, np.float32)
        speech = rng.uniform(-1, 1, 200).astype(np.float32)
        x = np.concatenate([burst, dc, speech])
        cleaned, ranges = dc_detection(x, max_dc_increment=0.05,
                                       min_dc_length=10,
                                       min_non_dc_length=20)
        assert len(ranges) == 1  # the 8-sample burst was discarded
        assert len(cleaned) == pytest.approx(200, abs=15)


class TestFormants:
    def test_finds_synthetic_resonances(self):
        sr = 16000.0
        t = np.arange(1024) / sr
        # two damped resonances at 500 and 1500 Hz
        x = (np.exp(-t * 80) * np.sin(2 * np.pi * 500 * t)
             + 0.7 * np.exp(-t * 120) * np.sin(2 * np.pi * 1500 * t))
        formants = extract_formants(x, sr, max_formants=3)
        freqs = [f.frequency for f in formants]
        assert any(abs(f - 500) < 60 for f in freqs), freqs
        assert any(abs(f - 1500) < 100 for f in freqs), freqs
        for f in formants:
            assert f.bandwidth > 0 and f.energy > 0

    def test_sorted_by_frequency(self):
        sr = 8000.0
        rng = np.random.default_rng(0)
        x = rng.standard_normal(512)
        formants = extract_formants(x, sr, max_formants=4)
        freqs = [f.frequency for f in formants]
        assert freqs == sorted(freqs)


class TestSegmentClustering:
    def make_segments(self):
        rng = np.random.default_rng(4)
        # two speakers: distinct means
        a = [rng.standard_normal((60, 3)) + np.array([3.0, 0, 0])
             for _ in range(3)]
        b = [rng.standard_normal((60, 3)) - np.array([3.0, 0, 0])
             for _ in range(3)]
        return a + b

    def test_two_speakers_n_clusters(self):
        segs = self.make_segments()
        labels = cluster_segments(segs, n_clusters=2)
        assert len(set(labels)) == 2
        assert labels[0] == labels[1] == labels[2]
        assert labels[3] == labels[4] == labels[5]
        assert labels[0] != labels[3]

    def test_bic_stop(self):
        segs = self.make_segments()
        labels = cluster_segments(segs, bic_lambda=2.0)
        # same-speaker segments merge; speakers stay apart
        assert labels[0] == labels[1] == labels[2]
        assert labels[0] != labels[3]

    def test_glr_symmetric_and_positive(self):
        segs = self.make_segments()
        x, y = GaussianSegment(segs[0]), GaussianSegment(segs[3])
        assert x.glr(y) == pytest.approx(y.glr(x), rel=1e-9)
        same = GaussianSegment(segs[1])
        assert x.glr(y) > x.glr(same)

    def test_kl2_distance(self):
        segs = self.make_segments()
        labels = cluster_segments(segs, n_clusters=2, distance="kl2")
        assert labels[0] == labels[1] == labels[2]
        assert labels[0] != labels[3]


class TestFlowNode:
    def test_dc_node(self):
        from rasr_tpu.flow import Stream
        from rasr_tpu.flow.nodes import Registry
        rng = np.random.default_rng(5)
        x = np.concatenate([rng.uniform(-1, 1, 200),
                            np.zeros(100),
                            rng.uniform(-1, 1, 200)]).astype(np.float32)
        node = Registry["signal-dc-detection"](
            "dc", {"max-dc-increment": "0.05", "min-dc-length": "0.002"})
        out = node.apply({"": Stream(x, sample_rate=16000.0)})[""]
        assert out.data.shape[0] < 500
        assert out.data.shape[0] >= 400
