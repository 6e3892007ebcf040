"""Async chunked encoder scorer + exact lattice LM composition tests."""

import time

import numpy as np
import pytest

from rasr_tpu.lattice.rescore import compose_with_lm, nbest_rescore
from rasr_tpu.lattice.word_lattice import lattice_from_nbest
from rasr_tpu.lm import ArpaLm
from rasr_tpu.nn.async_scorer import AsyncChunkedEncoderScorer
from rasr_tpu.search.lexiconfree_timesync import LexiconfreeTimesyncBeamSearch


class TestAsyncScorer:
    def test_streaming_scores_match_sync(self):
        """Async chunked scoring produces the same results as direct."""
        rng = np.random.default_rng(0)
        V, T = 6, 100

        def encode(x):
            # fake 'encoder': deterministic function of the features
            return np.tanh(x @ rng_matrix)[:, :V]

        rng_matrix = rng.standard_normal((8, V)).astype(np.float32)
        feats = rng.standard_normal((T, 8)).astype(np.float32)

        scorer = AsyncChunkedEncoderScorer(encode, n_labels=V,
                                           chunk_frames=16, chunk_history=0)
        scorer.add_inputs(feats[:50])
        scorer.add_inputs(feats[50:])
        scorer.signal_segment_end()
        rows = scorer.score_batch(
            [type("C", (), {"step": t})() for t in range(T)])
        expected = -encode(feats)
        np.testing.assert_allclose(rows, expected, atol=1e-5)

    def test_overlaps_with_search(self):
        """The async scorer drives the standard time-sync beam search."""
        V = 4
        p = 0.95

        def encode(x):
            # posterior-like rows from a class-indicator feature
            out = np.full((len(x), V), np.log((1 - p) / (V - 1)),
                          dtype=np.float32)
            out[np.arange(len(x)), x[:, 0].astype(int)] = np.log(p)
            return out

        seq = [1, 1, 0, 2, 2, 3]
        feats = np.asarray([[v] for v in seq], dtype=np.float32)
        scorer = AsyncChunkedEncoderScorer(encode, n_labels=V, chunk_frames=2,
                                           chunk_history=0)
        search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=4,
                                               blank_index=0)
        search.put_features(feats)
        search.finish_segment()
        assert search.get_current_best_labels() == [1, 2, 3]


class TestExactLmComposition:
    def make_lm(self, tmp_path):
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=4\nngram 2=2\n\n\\1-grams:\n"
            "-0.4\t</s>\n-99\t<s>\t-0.2\n-0.5\tA\t-0.3\n-0.6\tB\t-0.3\n\n"
            "\\2-grams:\n-0.1\tA B\n-1.5\tB A\n\n\\end\\\n")
        return ArpaLm(str(arpa))

    def test_compose_scores_exact(self, tmp_path):
        lm = self.make_lm(tmp_path)
        lat = lattice_from_nbest([
            ((1, 2), 1.0, 0.0),   # A B
            ((2, 1), 1.0, 0.0),   # B A
        ], words={1: "A", 2: "B"})
        composed = compose_with_lm(lat, lm, scale=1.0)
        labels, total = composed.best()
        # exact: am (1.0) + lm sequence score incl. </s>
        s_ab = 1.0 + lm.sequence_score(["A", "B"])
        s_ba = 1.0 + lm.sequence_score(["B", "A"])
        assert labels == [1, 2]  # bigram A B much more likely
        np.testing.assert_allclose(total, min(s_ab, s_ba), atol=1e-5)

    def test_nbest_rescore_matches_composition(self, tmp_path):
        lm = self.make_lm(tmp_path)
        lat = lattice_from_nbest([
            ((1, 2), 1.0, 0.0),
            ((2, 1), 1.0, 0.0),
        ], words={1: "A", 2: "B"})
        rescored = nbest_rescore(lat, lm, n=10)
        composed = compose_with_lm(lat, lm)
        _, best_comp = composed.best()
        np.testing.assert_allclose(rescored[0][1], best_comp, atol=1e-5)


class TestChunkedEncoderScorer:
    def test_chunked_encoding_then_full_context_finish(self):
        from rasr_tpu.nn.label_scorer import EncoderOnlyLabelScorer
        calls = []

        def encode(x):
            calls.append(len(x))
            return x * 2.0

        s = EncoderOnlyLabelScorer(encode, n_labels=4, chunk_frames=8,
                                   chunk_history=2)
        feats = np.arange(40, dtype=np.float32).reshape(10, 4)
        s.add_inputs(feats[:6])
        assert s.max_ready_step() == 0          # below chunk size
        s.add_inputs(feats[6:])
        assert s.max_ready_step() == 8          # one chunk scored
        assert calls == [8]
        s.signal_segment_end()                  # full-context re-encode
        assert s.max_ready_step() == 10
        np.testing.assert_allclose(s.log_probs(), feats * 2.0)
