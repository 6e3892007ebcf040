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
from ..nn.label_scorer import EncoderOnlyLabelScorer, NoOpLabelScorer
from ..speech.feature_cache import FeatureCacheReader


class SpeechRecognizerApp(Application):
    def __init__(self, argv=None, label_scorer=None):
        super().__init__("speech-recognizer", argv)
        self._label_scorer = label_scorer

    def _make_label_scorer(self):
        if self._label_scorer is not None:
            return self._label_scorer
        ls = self.config.sub("label-scorer")
        typ = ls.get("type") or "no-op"
        if typ == "no-op":
            n = int(ls.get("n-labels") or 0)
            if not n:
                raise ValueError("label-scorer.n-labels required for no-op")
            return NoOpLabelScorer(n)
        if typ == "encoder-only":
            model_cfg = self.config.sub("model")
            ckpt = model_cfg.get("checkpoint")
            vocab = int(model_cfg.get("vocab-size") or 0)
            if not (ckpt and vocab):
                raise ValueError("model.checkpoint and model.vocab-size "
                                 "required for encoder-only")
            import jax
            import jax.numpy as jnp
            from ..models import ConformerCtc
            from ..nn.checkpoint import load_params
            model = ConformerCtc(
                vocab_size=vocab,
                d_model=int(model_cfg.get("d-model") or 256),
                n_layers=int(model_cfg.get("n-layers") or 12),
                n_heads=int(model_cfg.get("n-heads") or 4))
            dummy_d = int(model_cfg.get("feature-dim") or 80)
            template = model.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 8, dummy_d)),
                                  jnp.asarray([8]))["params"]
            params, _ = load_params(ckpt, template)

            @jax.jit
            def fwd(feats, lens):
                logits, out_lens, _ = model.apply(
                    {"params": params}, feats, lens, deterministic=True)
                return jax.nn.log_softmax(logits, -1), out_lens

            def encode(x):
                lp, n = fwd(jnp.asarray(x)[None],
                            jnp.asarray([x.shape[0]], jnp.int32))
                return np.asarray(lp[0, :int(n[0])])

            return EncoderOnlyLabelScorer(encode, n_labels=vocab)
        raise ValueError(f"unknown label-scorer type {typ!r}")

    def _make_gmm_word_recognizer(self):
        """Classic GMM-HMM word recognition (config-3 style): mixture-set
        scorer + word-conditioned tree search (the reference's
        AdvancedTreeSearch workflow)."""
        import numpy as np
        from ..am.acoustic_model import AcousticModel
        from ..bliss.lexicon import Lexicon
        from ..lm import ArpaLm
        from ..mm import GmmScorer, MixtureSet
        from ..search.hmm_timesync import WordConditionedTreeSearch
        lexicon = Lexicon(self.config.sub("lexicon"))
        am = AcousticModel.create(self.config.sub("acoustic-model"), lexicon)
        ms_path = self.config.sub("mixture-set").get("file")
        if not ms_path:
            raise ValueError("mixture-set.file required for "
                             "word-conditioned-tree-search")
        gmm = GmmScorer(MixtureSet.read_pms(ms_path),
                        mode=self.config.sub("mixture-set").get("mode")
                        or "max")
        sa = self.config.sub("search-algorithm")
        lm_file = self.config.sub("lm").get("file")
        lm = ArpaLm(lm_file) if lm_file else None
        lm_scale = float(self.config.sub("lm").get("scale") or 1.0)
        search = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=lm_scale,
            beam_size=int(sa.get("max-beam-size") or sa.get("beam-size")
                          or 64))

        class _Adapter:
            statistics = search.statistics

            def recognize_segment(self, feats):
                scores = np.asarray(gmm.score(np.asarray(feats)))
                return " ".join(search.recognize(scores))

        return _Adapter()

    def run(self) -> int:
        corpus = CorpusDescription(self.config.sub("corpus"))
        search_type = self.config.sub("search-algorithm").get("type") or ""
        if search_type in ("word-conditioned-tree-search",
                           "advanced-tree-search"):
            algo = self._make_gmm_word_recognizer()
        else:
            algo = SearchAlgorithm(self.config, self._make_label_scorer())
        cache_path = self.config.sub("feature-cache").get("path")
        if not cache_path:
            raise ValueError("feature-cache.path required")
        cache = FeatureCacheReader(cache_path)
        evaluator = Evaluator("recognition")
        ctm_channel = Channel(self.config.sub("recognizer"), "ctm",
                              default="nil")
        rtf_values: List[float] = []
        n = 0
        for seg in corpus.segments():
            try:
                feats, starts, ends = cache.read(seg.full_name)
            except KeyError:
                self.warning("no features for %s", seg.full_name)
                continue
            t0 = time.perf_counter()
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
            if ctm_channel.is_open():
                for i, word in enumerate(hyp.split()):
                    ctm_channel.write(
                        f"{seg.recording.name} 1 "
                        f"{seg.start + i * 0.01:.2f} 0.01 {word}\n")
            n += 1
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
