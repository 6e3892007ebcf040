"""Native beam kernel (native/rasr_beam.cpp via search/native_beam.py):
the C++ expansion step produces bit-identical beams and transcripts to
the vectorized numpy implementation."""

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        MonophoneStateTying,
                                        TransitionModel, Tdp)
from rasr_tpu.am.allophone import AllophoneAlphabet
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch


@pytest.fixture(scope="module")
def am():
    rng = np.random.default_rng(1)
    phones = [f"p{i}" for i in range(12)]
    lex = Lexicon()
    for ph in phones + ["si"]:
        lex.phoneme_inventory.add(ph, ph != "si")
    si = lex.new_lemma(special="silence")
    si.orths = ["[SILENCE]"]
    lex.add_pronunciation(si, ["si"])
    lex._index(si)
    seen = set()
    while len(seen) < 300:
        L = int(rng.integers(2, 6))
        pron = tuple(phones[i] for i in rng.integers(0, 12, L))
        if pron in seen:
            continue
        seen.add(pron)
        lemma = lex.new_lemma()
        lemma.orths = [f"w{len(seen):03d}"]
        lex.add_pronunciation(lemma, list(pron))
        lex._index(lemma)
    return AcousticModel(
        lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
        HmmTopology(3, 1, 1), MonophoneStateTying(3, 3),
        TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                        Tdp(0.0, 2.0, float("inf"), 4.0)))


def _decode_pair(am, **kw):
    rng = np.random.default_rng(7)
    scores = rng.uniform(0, 10, size=(200, 13 * 3))
    nat = WordConditionedTreeSearch(am, **kw)
    if nat._native is None:
        pytest.skip("native toolchain unavailable")
    py = WordConditionedTreeSearch(am, use_native=False, **kw)
    nat.set_lookahead_scores(scores)
    py.set_lookahead_scores(scores)
    for t in range(len(scores)):
        nat.feed(scores[t])
        py.feed(scores[t])
    return nat, py


def _assert_beams_equal(nat, py):
    bn = np.lexsort((nat._b_hist, nat._b_state))
    bp = np.lexsort((py._b_hist, py._b_state))
    np.testing.assert_array_equal(nat._b_state[bn], py._b_state[bp])
    np.testing.assert_array_equal(nat._b_hist[bn], py._b_hist[bp])
    np.testing.assert_allclose(nat._b_score[bn], py._b_score[bp],
                               rtol=1e-12)
    assert nat.best_words() == py.best_words()


def test_native_matches_numpy(am):
    nat, py = _decode_pair(am, beam_size=256, score_threshold=80.0)
    _assert_beams_equal(nat, py)


def test_native_matches_numpy_with_lookahead(am):
    nat, py = _decode_pair(am, beam_size=128, score_threshold=60.0,
                           acoustic_lookahead=4)
    _assert_beams_equal(nat, py)


def test_native_statistics_track(am):
    """Search-space statistics agree between the paths up to histogram
    tie-breaking (argpartition vs nth_element pick different equal-score
    hypotheses at the beam cut, which perturbs later frame counts by a
    handful of states)."""
    nat, py = _decode_pair(am, beam_size=256, score_threshold=80.0)
    for key in ("states before pruning", "states after pruning",
                "trees after pruning"):
        a = np.asarray(nat.statistics.values(key), np.float64)
        b = np.asarray(py.statistics.values(key), np.float64)
        assert len(a) == len(b), key
        assert abs(a.sum() - b.sum()) <= 0.01 * b.sum(), key
