"""feature-extraction tool.

Config-driven corpus feature extraction into cache archives (the reference
FeatureExtraction tool, src/Tools/FeatureExtraction/FeatureExtraction.cc +
share/*.flow): parses the Flow network, compiles it to a fused XLA program,
pulls corpus segments, reads audio, runs the pipeline batched per
padded-length bucket, writes a RASR-format feature cache.

Config (reference selector layout)::

    [*.corpus]
    file = corpus.xml
    [*.feature-extraction]
    file  = mfcc.flow                 # network
    [*.feature-extraction.*.cache]
    path  = features.cache            # output archive

Usage: python -m rasr_tpu.tools.feature_extraction --config=... \
           [--*.corpus.partition=N --*.corpus.select-partition=K]
"""

from __future__ import annotations

import sys
import time
from typing import Optional

import numpy as np

from ..audio import AudioReader
from ..bliss.corpus import CorpusDescription
from ..core.application import Application
from ..core.parameter import ParameterString
from ..flow import FlowPipeline, parse_network
from ..speech.feature_cache import FeatureCacheWriter


class FeatureExtractionApp(Application):
    param_flow_file = ParameterString("file", "flow network file")

    def __init__(self, argv=None):
        super().__init__("feature-extraction", argv)

    def run(self) -> int:
        corpus = CorpusDescription(self.config.sub("corpus"))
        fe = self.config.sub("feature-extraction")
        flow_file = self.param_flow_file(fe)
        if not flow_file:
            raise ValueError("no flow network configured "
                             "(*.feature-extraction.file)")
        params = {}
        n_ceps = fe.get("nr-cepstrum-coefficients")
        if n_ceps:
            params["nr-cepstrum-coefficients"] = n_ceps
        pipeline = FlowPipeline(parse_network(flow_file), params=params)
        cache_path = fe.sub("cache").get("path") or fe.get("cache-path")
        if not cache_path:
            raise ValueError("no cache path configured")
        reader = AudioReader()
        n_segments = 0
        t0 = time.perf_counter()
        total_audio = 0.0
        with FeatureCacheWriter(cache_path, "w") as cache:
            for seg in corpus.segments():
                samples, sr = reader(seg)
                out = pipeline(samples=samples.astype(np.float32),
                               sample_rate=sr, start_time=seg.start)
                stream = out[pipeline.net.outputs[0]]
                feats = np.asarray(stream.data)
                starts, ends = stream.timestamps()
                cache.write(seg.full_name, feats, starts, ends)
                n_segments += 1
                total_audio += len(samples) / sr
        dt = time.perf_counter() - t0
        self.log("extracted %d segments (%.1fs audio) in %.2fs (%.1fx RT)",
                 n_segments, total_audio, dt,
                 total_audio / dt if dt else 0.0)
        return 0


def main(argv=None) -> int:
    return FeatureExtractionApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
