"""speech-recognizer tool + analog integration: corpus + feature cache of
posteriors -> recognition log -> analog aggregation."""

import json
import textwrap

import numpy as np
import pytest

from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.tools.analog import analyze, parse_log
from rasr_tpu.tools.speech_recognizer import main as rec_main


@pytest.fixture
def setup(tmp_path):
    # vocab: blank + A,B,C ; posteriors as "features" with a no-op scorer
    vocab = tmp_path / "labels.txt"
    vocab.write_text("<blank>\nA\nB\nC\n")
    V = 4

    def posteriors(seq, frames_per=2, p=0.9):
        rows = []
        for t in seq:
            for _ in range(frames_per):
                r = np.full(V, (1 - p) / (V - 1))
                r[t] = p
                rows.append(r)
        return np.log(np.asarray(rows, dtype=np.float32))

    with FeatureCacheWriter(str(tmp_path / "post.cache")) as cache:
        cache.write("c/r/s0", posteriors([1, 2]))       # A B
        cache.write("c/r/s1", posteriors([3, 0, 3]))    # C C
    (tmp_path / "corpus.xml").write_text(textwrap.dedent("""\
        <corpus name="c">
          <recording name="r" audio="none.wav">
            <segment name="s0" start="0" end="0.04"><orth>A B</orth></segment>
            <segment name="s1" start="0.04" end="0.1"><orth>C C C</orth></segment>
          </recording>
        </corpus>
    """))
    log_path = tmp_path / "rec.log"
    config = tmp_path / "rec.config"
    config.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/corpus.xml
        [*.lexicon]
        file = vocab-text:{vocab}
        [*.feature-cache]
        path = {tmp_path}/post.cache
        [*.label-scorer]
        type = no-op
        n-labels = 4
        [*.search-algorithm]
        type = lexiconfree-timesync-beam-search
        blank-label-index = 0
        [*.log]
        channel = {log_path}
    """))
    return tmp_path, config, log_path


class TestSpeechRecognizer:
    def test_recognition_and_analog(self, setup):
        tmp_path, config, log_path = setup
        status = rec_main([f"--config={config}"])
        assert status == 0
        records = parse_log(str(log_path))
        assert len(records) == 2
        by_seg = {r["segment"]: r for r in records}
        assert by_seg["c/r/s0"]["hyp"] == "A B"
        assert by_seg["c/r/s0"]["errors"] == 0
        # s1: posteriors say "C C" but ref is "C C C" -> 1 deletion
        assert by_seg["c/r/s1"]["errors"] == 1
        stats = analyze(records)
        assert stats["segments"] == 2
        assert stats["ref-words"] == 5
        assert abs(stats["wer"] - 20.0) < 1e-9
        assert stats["overall-rtf"] > 0


class TestBatchedRecognizer:
    def test_bucketing_matches_single(self, tmp_path):
        """Batched bucketed decoding == per-segment decoding, across
        different segment lengths."""
        from rasr_tpu.bliss.evaluation import Evaluator
        from rasr_tpu.bliss.lexicon import Lexicon
        from rasr_tpu.speech.batch_recognizer import BatchedCtcRecognizer

        vocab = tmp_path / "labels.txt"
        vocab.write_text("<blank>\nA\nB\nC\n")
        lex = Lexicon()
        lex.load(f"vocab-text:{vocab}")
        lex.lemmas[0].special = "blank"
        V, p = 4, 0.9

        def posterior_feats(seq, frames_per):
            rows = []
            for t in seq:
                for _ in range(frames_per):
                    r = np.full(V, (1 - p) / (V - 1))
                    r[t] = p
                    rows.append(r)
            return np.log(np.asarray(rows, dtype=np.float32))

        def encode_fn(feats, lens):
            # identity "encoder": features already log-posteriors; padding
            # rows are near-uniform logs and get masked by lens
            return feats, lens

        segs = [
            ("s0", posterior_feats([1, 2], 3), "A B"),
            ("s1", posterior_feats([3], 2), "C"),
            ("s2", posterior_feats([2, 0, 2], 4), "B B"),
            ("s3", posterior_feats([1, 3, 2], 8), "A C B"),  # other bucket
        ]
        ev = Evaluator()
        rec = BatchedCtcRecognizer(encode_fn, lex, batch_size=2,
                                   bucket_frames=16, evaluator=ev)
        results = rec.recognize(segs)
        assert [r.orth for r in results] == ["A B", "C", "B B", "A C B"]
        assert ev.wer == 0.0
        # consistency with unbatched decode
        from rasr_tpu.search.ctc_decode import ctc_prefix_beam
        for name, feats, ref in segs:
            lab, n, sc = ctc_prefix_beam(feats[None],
                                         np.array([len(feats)]), beam=8,
                                         topk=8)
            single = lab[0, 0, :int(n[0, 0])].tolist()
            batched = next(r for r in results if r.segment_name == name)
            assert batched.labels == single
