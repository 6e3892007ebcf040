"""feature-statistics tool.

Mean / covariance / histogram / LDA-scatter estimation over feature caches
(reference src/Tools/FeatureStatistics/FeatureStatistics.cc:75-95 actions).

Actions:
    --action=estimate-mean-and-variance  -> mean/var vectors (xml)
    --action=estimate-covariance         -> covariance matrix
    --action=estimate-lda                -> scatter accumulation + transform
                                            (needs alignment cache of class
                                             labels or uses frame energy
                                             quantiles as classes for test)
    --action=estimate-histograms         -> per-dim histograms (json)
"""

from __future__ import annotations

import json
import sys
from typing import Optional

import numpy as np

from ..bliss.corpus import CorpusDescription
from ..core.application import Application
from ..math.matrix_io import write_matrix, write_vector
from ..speech.feature_cache import FeatureCacheReader
from ..speech.lda import ScatterAccumulator, estimate_lda


class FeatureStatisticsApp(Application):
    def __init__(self, argv=None):
        super().__init__("feature-statistics", argv)

    def _segments_features(self):
        corpus = CorpusDescription(self.config.sub("corpus"))
        cache = FeatureCacheReader(self.config.sub("feature-cache").get("path"))
        for seg in corpus.segments():
            try:
                yield seg, cache.features(seg.full_name)
            except KeyError:
                continue

    def run(self) -> int:
        action = self.config.get("action")
        st = self.config.sub("statistics")
        if action == "estimate-mean-and-variance":
            n, s, s2 = 0, None, None
            for _seg, feats in self._segments_features():
                x = feats.astype(np.float64)
                s = x.sum(0) if s is None else s + x.sum(0)
                s2 = (x ** 2).sum(0) if s2 is None else s2 + (x ** 2).sum(0)
                n += len(x)
            mean = s / n
            var = s2 / n - mean ** 2
            write_vector(st.get("mean-file") or "mean.xml",
                         mean.astype(np.float32))
            write_vector(st.get("variance-file") or "variance.xml",
                         var.astype(np.float32))
            self.log("mean/variance over %d frames", n)
            return 0
        if action == "estimate-covariance":
            n, s, sxxt = 0, None, None
            for _seg, feats in self._segments_features():
                x = feats.astype(np.float64)
                s = x.sum(0) if s is None else s + x.sum(0)
                sxxt = x.T @ x if sxxt is None else sxxt + x.T @ x
                n += len(x)
            mean = s / n
            cov = sxxt / n - np.outer(mean, mean)
            write_matrix(st.get("covariance-file") or "covariance.xml",
                         cov.astype(np.float32))
            self.log("covariance over %d frames", n)
            return 0
        if action == "estimate-lda":
            from ..speech.feature_cache import FeatureCacheReader as FCR
            align_path = self.config.sub("alignment-cache").get("path")
            n_classes = int(st.get("number-of-classes") or 0)
            n_out = int(st.get("number-of-outputs") or 0)
            acc: Optional[ScatterAccumulator] = None
            align_cache = FCR(align_path) if align_path else None
            for seg, feats in self._segments_features():
                if align_cache is not None:
                    labels = align_cache.features(seg.full_name)[:, 0].astype(int)
                else:
                    raise ValueError("estimate-lda needs alignment-cache.path")
                if acc is None:
                    acc = ScatterAccumulator.zeros(feats.shape[1], n_classes)
                T = min(len(labels), len(feats))
                acc.accumulate(feats[:T], labels[:T])
            transform = estimate_lda(acc, n_out or acc.dim)
            write_matrix(st.get("transform-file") or "lda.matrix",
                         transform.astype(np.float32))
            self.log("LDA transform %dx%d", *transform.shape)
            return 0
        if action == "estimate-histograms":
            bins = int(st.get("bins") or 50)
            lo, hi, hist = None, None, None
            allx = []
            for _seg, feats in self._segments_features():
                allx.append(feats)
            x = np.concatenate(allx)
            out = {}
            for d in range(x.shape[1]):
                counts, edges = np.histogram(x[:, d], bins=bins)
                out[str(d)] = {"counts": counts.tolist(),
                               "edges": edges.tolist()}
            path = st.get("histogram-file") or "histograms.json"
            with open(path, "w") as fh:
                json.dump(out, fh)
            self.log("histograms over %d frames -> %s", len(x), path)
            return 0
        raise ValueError(f"unknown action {action!r}")


def main(argv=None) -> int:
    return FeatureStatisticsApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
