"""Scale check for the SoA word-conditioned tree search: a 10k-word
lexicon decodes 1000 frames in seconds (the round-1 review's acceptance
criterion for the vectorized host beam; reference AdvancedTreeSearch
scale behavior)."""

import time

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        MonophoneStateTying,
                                        TransitionModel, Tdp)
from rasr_tpu.am.allophone import AllophoneAlphabet
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch


@pytest.mark.slow
def test_10k_word_lexicon_decodes_1000_frames_fast():
    rng = np.random.default_rng(0)
    phones = [f"p{i}" for i in range(40)]
    lex = Lexicon()
    for ph in phones + ["si"]:
        lex.phoneme_inventory.add(ph, ph != "si")
    si = lex.new_lemma(special="silence")
    si.orths = ["[SILENCE]"]
    lex.add_pronunciation(si, ["si"])
    lex._index(si)
    seen = set()
    while len(seen) < 10_000:
        L = int(rng.integers(3, 9))
        pron = tuple(phones[i] for i in rng.integers(0, 40, L))
        if pron in seen:
            continue
        seen.add(pron)
        lemma = lex.new_lemma()
        lemma.orths = [f"w{len(seen):05d}"]
        lex.add_pronunciation(lemma, list(pron))
        lex._index(lemma)

    am = AcousticModel(lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
                       HmmTopology(3, 1, 1), MonophoneStateTying(3, 3),
                       TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                                       Tdp(0.0, 2.0, float("inf"), 4.0)))
    t0 = time.time()
    search = WordConditionedTreeSearch(am, beam_size=2048,
                                       score_threshold=150.0)
    build_s = time.time() - t0
    assert build_s < 30.0, f"tree build took {build_s:.1f}s"
    assert len(search.net.emis) > 50_000  # real 10k-word state network

    scores = rng.uniform(0, 10, size=(1000, 41 * 3))
    t0 = time.time()
    search.reset()
    for t in range(1000):
        search.feed(scores[t])
    decode_s = time.time() - t0
    # 4.9 s measured on the CI box; generous bound for slower machines
    assert decode_s < 60.0, f"decode took {decode_s:.1f}s"
    # beam stayed bounded (recombination works at scale)
    assert len(search._b_state) <= 2048
