"""librasr-compatible API tests."""

import textwrap

import numpy as np
import pytest

from rasr_tpu import api as librasr
from rasr_tpu.nn.label_scorer import NoOpLabelScorer


@pytest.fixture
def config(tmp_path):
    vocab = tmp_path / "labels.txt"
    vocab.write_text("<blank>\nA\nB\nC\n")
    cfg_file = tmp_path / "decode.config"
    cfg_file.write_text(textwrap.dedent(f"""\
        [*.lexicon]
        file = vocab-text:{vocab}
        [*.search-algorithm]
        type = lexiconfree-timesync-beam-search
        max-beam-size = 8
        blank-label-index = 0
    """))
    cfg = librasr.Configuration(name="librasr")
    cfg.set_from_file(str(cfg_file))
    return cfg


def posteriors(seq, V=4, p=0.9, frames_per=2):
    rows = []
    for t in seq:
        for _ in range(frames_per):
            r = np.full(V, (1 - p) / (V - 1))
            r[t] = p
            rows.append(r)
    return np.log(np.asarray(rows, dtype=np.float32))


class TestSearchAlgorithm:
    def test_recognize_segment(self, config):
        algo = librasr.SearchAlgorithm(config,
                                       label_scorer=NoOpLabelScorer(4))
        # A B 0 A -> "A B A"
        feats = posteriors([1, 2, 0, 1])
        assert algo.recognize_segment(feats) == "A B A"

    def test_streaming_api(self, config):
        algo = librasr.SearchAlgorithm(config,
                                       label_scorer=NoOpLabelScorer(4))
        feats = posteriors([1, 2])
        algo.enter_segment()
        for f in feats:
            algo.put_feature(f)
        algo.decode_more()
        mid = algo.get_current_best_traceback()
        assert [t.label for t in mid] == [1, 2]
        algo.finish_segment()
        assert [t.label for t in algo.get_current_best_traceback()] == [1, 2]

    def test_n_best(self, config):
        algo = librasr.SearchAlgorithm(config,
                                       label_scorer=NoOpLabelScorer(4))
        result = algo.recognize_segment_n_best(posteriors([1]), 3)
        assert result[0][0] == "A"
        assert result[0][1] <= result[-1][1]

    def test_model_combination_exposed(self, config):
        algo = librasr.SearchAlgorithm(config,
                                       label_scorer=NoOpLabelScorer(4))
        assert algo.model_combination.lexicon is not None
        assert len(algo.model_combination.lexicon.lemmas) == 4

    def test_register_label_scorer_type(self):
        created = {}

        class MyScorer(NoOpLabelScorer):
            pass

        librasr.register_label_scorer_type("my-scorer", MyScorer)
        s = librasr.create_label_scorer("my-scorer", 4)
        assert isinstance(s, MyScorer)

    def test_transition_type_enum(self):
        assert librasr.TransitionType.LABEL_TO_LABEL == 0
        assert librasr.TransitionType.BLANK_LOOP.name == "BLANK_LOOP"


class TestStreaming:
    def test_common_prefix_and_stable_delay(self, config):
        from rasr_tpu.nn.label_scorer import NoOpLabelScorer
        from rasr_tpu.search import LexiconfreeTimesyncBeamSearch
        search = LexiconfreeTimesyncBeamSearch(
            NoOpLabelScorer(4), beam_size=2, blank_index=0)
        feats = posteriors([1, 2, 3], p=0.97)
        search.put_features(feats[:4])
        search.decode_many_steps()
        cp = search.get_common_prefix()
        # with a narrow beam the first label is stable across hypotheses
        assert cp[:1] == [1]
        search.prune_stable_delay(2)
        assert len(search._beam) >= 1
        search.put_features(feats[4:])
        search.finish_segment()
        assert list(search.get_current_best_labels()) == [1, 2, 3]


class TestFsaBuilder:
    def test_build_by_orthography(self, tmp_path):
        lex = tmp_path / "lex.xml"
        lex.write_text(
            "<lexicon><phoneme-inventory>"
            "<phoneme><symbol>a</symbol></phoneme>"
            "<phoneme><symbol>si</symbol><variation>none</variation></phoneme>"
            "</phoneme-inventory>"
            '<lemma special="silence"><orth>[SI]</orth><phon>si</phon></lemma>'
            "<lemma><orth>A</orth><phon>a</phon></lemma></lexicon>")
        cfg = librasr.Configuration(name="fsa")
        cfg.set("*.lexicon.file", str(lex))
        builder = librasr.AllophoneStateFsaBuilder(cfg)
        edges, weights, n_states = builder.build_by_orthography("A")
        assert edges.shape[0] == 4
        assert n_states > 0 and edges.shape[1] == len(weights)
        g = builder.build_graph("A A")
        assert g.n_states > n_states


class TestHistogramPruning:
    def test_histogram_pruning_keeps_result(self, config):
        from rasr_tpu.search import LexiconfreeTimesyncBeamSearch
        search = LexiconfreeTimesyncBeamSearch(
            NoOpLabelScorer(4), beam_size=4, blank_index=0,
            score_threshold=50.0, histogram_bins=32)
        feats = posteriors([1, 2, 3])
        search.put_features(feats)
        search.finish_segment()
        assert search.get_current_best_labels() == [1, 2, 3]
