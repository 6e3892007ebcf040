"""CTC prefix scorer tests: prefix probabilities match exhaustive path
enumeration, and label-sync search over the scorer agrees with the
device time-sync prefix beam."""

import numpy as np
import pytest

from rasr_tpu.nn.ctc_prefix_scorer import CtcPrefixScorer
from rasr_tpu.search.ctc_decode import ctc_prefix_beam
from rasr_tpu.search.lexiconfree_labelsync import LexiconfreeLabelsyncBeamSearch

from test_ctc_decode import brute_force_best_prefix


@pytest.fixture
def lp():
    rng = np.random.default_rng(4)
    T, V = 5, 4
    return np.log(rng.dirichlet(np.ones(V), size=(T,))).astype(np.float32)


class TestCtcPrefixScorer:
    def test_prefix_scores_match_brute_force(self, lp):
        _, _, all_scores = brute_force_best_prefix(lp)
        scorer = CtcPrefixScorer(lp)
        for prefix, exact in all_scores.items():
            if len(prefix) > 3 or exact < -15:
                continue
            scorer.score_extensions([list(prefix[:-1])] if prefix else [[]])
            got = scorer.prefix_score(list(prefix))
            np.testing.assert_allclose(got, -exact, atol=1e-3,
                                       err_msg=str(prefix))

    def test_extension_matrix_partition(self, lp):
        """Extensions partition the probability mass: p(empty complete) +
        sum_v p(v-prefix) = 1, and similarly for deeper prefixes."""
        scorer = CtcPrefixScorer(lp)
        ext = scorer.score_extensions([[]])
        total = np.exp(-ext[0]).sum()
        np.testing.assert_allclose(total, 1.0, atol=1e-4)
        ext2 = scorer.score_extensions([[2]])
        base = np.exp(-ext2[0]).sum()
        # = p(prefix (2,) ...) overall
        _, _, alls = brute_force_best_prefix(lp)
        p2_prefix = sum(np.exp(s) for pre, s in alls.items()
                        if pre[:1] == (2,))
        np.testing.assert_allclose(base, p2_prefix, atol=1e-4)

    def test_labelsync_search_matches_timesync_beam(self, lp):
        """Label-sync decoding over the CTC prefix scorer finds the same
        best output as the device time-sync prefix beam."""
        T = lp.shape[0]
        labels, n, scores = ctc_prefix_beam(lp[None], np.array([T]),
                                            beam=128, topk=3)
        best_timesync = labels[0, 0, :int(n[0, 0])].tolist()

        scorer = CtcPrefixScorer(lp)

        def score_fn(histories):
            # histories (B, L) with BOS=0 prefix; strip BOS and zeros tail.
            # the scorer returns ABSOLUTE prefix scores; the labelsync
            # search accumulates, so convert to increments
            prefixes = []
            for row in histories:
                toks = [int(v) for v in row[1:] if v > 0]
                prefixes.append(toks)
            rows = scorer.score_extensions(prefixes)
            # -log p(prefix ...) as a prefix (sum over continuations):
            base = np.array([
                -np.logaddexp.reduce([-rows_i[v] for v in range(1, 4)]
                                     + [-rows_i[0]])
                for rows_i in rows])
            return rows - base[:, None]

        search = LexiconfreeLabelsyncBeamSearch(
            score_fn, n_labels=4, sentence_end_index=0, beam_size=16,
            max_labels=T, length_norm_scale=0.0)
        got = search.recognize_segment(np.zeros((T, 1), np.float32))
        assert got == best_timesync
