"""The shipped share/*.flow networks compile end to end into fused
programs (living documentation for the second-tier filters;
reference: src/Tools/FeatureExtraction/share/)."""

import os

import numpy as np
import pytest

from rasr_tpu import flow

SHARE = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "share")

rng = np.random.default_rng(0)
SAMPLES = rng.standard_normal(16000).astype(np.float32)


@pytest.mark.parametrize("name,params,min_dim", [
    ("mfcc.flow", {"nr-cepstrum-coefficients": "16"}, 16),
    ("trap.flow", {"context-length": "21", "dct-size": "6"}, 90),
    ("mrasta.flow", {}, 120),
    ("vtln-mfcc.flow", {"warping-factor": "1.1",
                        "nr-cepstrum-coefficients": "16"}, 16),
    ("logmel.flow", {}, 60),
])
def test_share_flow_compiles_and_runs(name, params, min_dim):
    pipe = flow.compile_network(os.path.join(SHARE, name), params=params)
    out = pipe(samples=SAMPLES, sample_rate=16000.0)
    feats = np.asarray(out["features"].data)
    assert feats.ndim == 2 and feats.shape[0] == 99
    assert feats.shape[1] >= min_dim
    assert np.isfinite(feats).all()
