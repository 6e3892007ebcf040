"""speech-recognizer tool.

Corpus recognition CLI (reference src/Tools/SpeechRecognizer/
SpeechRecognizer.cc:38,107-149): loads corpus + lexicon + models, runs the
configured search over every segment, logs per-segment results with WER and
RTF (the reference's flf-recognizer-time/-rtf channels), writes CTM output
and an aggregate report parseable by the analog tool.

Minimal config::

    [*.corpus]          file = corpus.xml
    [*.lexicon]         file = vocab-text:labels.txt
    [*.search-algorithm] type = lexiconfree-timesync-beam-search
    [*.feature-cache]   path = features.cache   # or feature-extraction.file
    [*.model]           checkpoint = model.msgpack  vocab-size = 1024 ...
"""

from __future__ import annotations

import json
import sys
import time
from typing import List, Optional

import numpy as np

from ..api import SearchAlgorithm
from ..bliss.corpus import CorpusDescription
from ..bliss.evaluation import Evaluator
from ..core.application import Application
from ..core.channel import Channel
from ..speech.feature_cache import FeatureCacheReader


class SpeechRecognizerApp(Application):
    def __init__(self, argv=None, label_scorer=None):
        super().__init__("speech-recognizer", argv)
        self._label_scorer = label_scorer

    def run(self) -> int:
        corpus = CorpusDescription(self.config.sub("corpus"))
        # all search types + scorers construct through the shared factories
        # (search.module / nn.scorer_factory) — identical to the librasr API
        algo = SearchAlgorithm(self.config, self._label_scorer)
        cache_path = self.config.sub("feature-cache").get("path")
        if not cache_path:
            raise ValueError("feature-cache.path required")
        cache = FeatureCacheReader(cache_path)
        # per-speaker ADAPTED recognition (reference AdaptedAcousticModel,
        # src/Am/AdaptedAcousticModel.hh:31): CMLLR feature transforms
        # keyed by corpus key (speaker when present, else recording) are
        # selected per segment and applied to the features before
        # scoring.  [*.adaptation] affine-transform-file = cmllr.npz
        # (the acoustic-model-trainer's calculate-affine-feature-
        # transform output).
        transforms = None
        adapt_path = self.config.sub("adaptation").get(
            "affine-transform-file")
        if adapt_path:
            z = np.load(adapt_path)
            transforms = {k: z[k] for k in z.files}
            self.log("adaptation: %d corpus-key transforms from %s",
                     len(transforms), adapt_path)

        from ..bliss.corpus import corpus_key

        evaluator = Evaluator("recognition")
        ctm_channel = Channel(self.config.sub("recognizer"), "ctm",
                              default="nil")
        # reference-format XML log (doc/channel.rst schema, parseable by
        # the reference analog tool): [*.recognizer] xml-log = <file>
        xml_channel = Channel(self.config.sub("recognizer"), "xml-log",
                              default="nil")
        xml_log = None
        if xml_channel.is_open():
            from ..core.xml_log import RecognitionXmlLog
            xml_log = RecognitionXmlLog(xml_channel)
        rtf_values: List[float] = []
        n = 0
        for seg in corpus.segments():
            try:
                feats, starts, ends = cache.read(seg.full_name)
            except KeyError:
                self.warning("no features for %s", seg.full_name)
                continue
            t0 = time.perf_counter()
            if transforms is not None:
                w = transforms.get(corpus_key(seg))
                if w is not None:
                    from ..mm.adaptation import apply_feature_transform
                    feats = apply_feature_transform(
                        np.asarray(feats), w).astype(np.float32)
            hyp = algo.recognize_segment(feats)
            elapsed = time.perf_counter() - t0
            duration = max(seg.duration, 1e-9) if seg.duration else \
                (ends[-1] - starts[0] if len(starts) else 1e-9)
            rtf = elapsed / duration
            rtf_values.append(rtf)
            counts = evaluator.evaluate(seg.orth, hyp) if seg.orth else None
            # per-segment log line (analog-parseable)
            record = {
                "segment": seg.full_name, "hyp": hyp, "ref": seg.orth,
                "time": round(elapsed, 4), "duration": round(duration, 3),
                "rtf": round(rtf, 5),
                "errors": counts.errors if counts else None,
                "ref-len": counts.ref_len if counts else None}
            stats = getattr(algo, "statistics", None)
            if stats is not None and stats.summary():
                record["search-space-statistics"] = {
                    k: {kk: round(vv, 2) for kk, vv in v.items()}
                    for k, v in stats.summary().items()}
            self.log(json.dumps(record))
            if xml_log is not None:
                from ..bliss.evaluation import align
                xml_log.open_segment(seg)
                if seg.orth:
                    xml_log.orth("reference", seg.orth)
                xml_log.orth("recognized", hyp)
                if counts is not None:
                    _, pairs = align(seg.orth.split(), hyp.split())
                    xml_log.evaluation(counts, pairs)
                xml_log.timing(elapsed, rtf)
                if stats is not None and stats.summary():
                    xml_log.search_space_statistics(stats.summary())
                xml_log.close_segment()
            if ctm_channel.is_open():
                for i, word in enumerate(hyp.split()):
                    ctm_channel.write(
                        f"{seg.recording.name} 1 "
                        f"{seg.start + i * 0.01:.2f} 0.01 {word}\n")
            n += 1
        if xml_log is not None:
            xml_log.close()
        summary = {
            "segments": n,
            "wer": round(100.0 * evaluator.wer, 2),
            "errors": evaluator.total.errors,
            "ref-words": evaluator.total.ref_len,
            "mean-rtf": round(float(np.mean(rtf_values)), 5) if rtf_values else None,
        }
        self.log("RECOGNITION SUMMARY " + json.dumps(summary))
        return 0


def main(argv=None, label_scorer=None) -> int:
    return SpeechRecognizerApp(argv, label_scorer=label_scorer).main()


if __name__ == "__main__":
    sys.exit(main())
