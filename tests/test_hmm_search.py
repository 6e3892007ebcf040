"""Word-conditioned HMM tree search tests: GMM-scored recognition over the
same synthetic task as the GMM training test (config-3-style hybrid/GMM
recognition E2E)."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        MonophoneStateTying, Tdp,
                                        TransitionModel)
from rasr_tpu.am.allophone import AllophoneAlphabet
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.lm import ArpaLm
from rasr_tpu.mm import GmmScorer, MixtureSet
from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch

LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
        <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
      </phoneme-inventory>
      <lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon></lemma>
      <lemma><orth>AB</orth><phon>a b</phon></lemma>
      <lemma><orth>BA</orth><phon>b a</phon></lemma>
    </lexicon>
""")

DIM = 4
N_CLASSES = 9  # monophone x 3 states (a:0-2, b:3-5, si:6)


@pytest.fixture
def am(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    return AcousticModel(
        lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
        HmmTopology(3, 1, 1), MonophoneStateTying(3, 3),
        TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                        Tdp(0.0, 2.0, float("inf"), 4.0)))


@pytest.fixture
def scorer_and_means():
    rng = np.random.default_rng(7)
    means = rng.standard_normal((N_CLASSES, DIM)) * 4.0
    ms = MixtureSet.single_gaussian(means, np.ones((N_CLASSES, DIM)))
    return GmmScorer(ms), means


def synth_features(means, classes, frames_per=4, noise=0.3, seed=0):
    rng = np.random.default_rng(seed)
    frames = []
    for c in classes:
        frames.append(means[c] + noise * rng.standard_normal((frames_per, DIM)))
    return np.concatenate(frames).astype(np.float32)


class TestHmmSearch:
    def test_single_word(self, am, scorer_and_means):
        scorer, means = scorer_and_means
        # AB = phonemes a(0,1,2) b(3,4,5), leading/trailing silence(6)
        feats = synth_features(means, [6, 0, 1, 2, 3, 4, 5, 6])
        scores = np.asarray(scorer.score(feats))
        search = WordConditionedTreeSearch(am, beam_size=64)
        assert search.recognize(scores) == ["AB"]

    def test_two_words(self, am, scorer_and_means):
        scorer, means = scorer_and_means
        feats = synth_features(means, [0, 1, 2, 3, 4, 5,    # AB
                                       3, 4, 5, 0, 1, 2])   # BA
        scores = np.asarray(scorer.score(feats))
        search = WordConditionedTreeSearch(am, beam_size=128)
        assert search.recognize(scores) == ["AB", "BA"]

    def test_silence_between_words(self, am, scorer_and_means):
        scorer, means = scorer_and_means
        feats = synth_features(means, [0, 1, 2, 3, 4, 5, 6, 6,
                                       3, 4, 5, 0, 1, 2])
        scores = np.asarray(scorer.score(feats))
        search = WordConditionedTreeSearch(am, beam_size=128)
        assert search.recognize(scores) == ["AB", "BA"]

    def test_lm_word_conditioning(self, am, scorer_and_means, tmp_path):
        """With acoustically indifferent scores, the LM decides the word."""
        # uniform emission scores: every class equally likely
        scores = np.zeros((6, N_CLASSES), dtype=np.float32)
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=4\n\n\\1-grams:\n-0.3\t</s>\n-99\t<s>\n"
            "-2.5\tAB\n-0.05\tBA\n\n\\end\\\n")
        lm = ArpaLm(str(arpa))
        with_lm = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=5.0, beam_size=64).recognize(scores)
        assert with_lm == ["BA"]
        # and a preference for AB flips it
        arpa2 = tmp_path / "lm2.arpa"
        arpa2.write_text(
            "\\data\\\nngram 1=4\n\n\\1-grams:\n-0.3\t</s>\n-99\t<s>\n"
            "-0.05\tAB\n-2.5\tBA\n\n\\end\\\n")
        with_lm2 = WordConditionedTreeSearch(
            am, lm=ArpaLm(str(arpa2)), lm_scale=5.0,
            beam_size=64).recognize(scores)
        assert with_lm2 == ["AB"]


class TestWordConditionedLattice:
    def test_lattice_with_boundaries(self, am, scorer_and_means):
        scorer, means = scorer_and_means
        feats = synth_features(means, [0, 1, 2, 3, 4, 5,    # AB
                                       3, 4, 5, 0, 1, 2])   # BA
        scores = np.asarray(scorer.score(feats))
        search = WordConditionedTreeSearch(am, beam_size=128)
        words = search.recognize(scores)
        assert words == ["AB", "BA"]
        lat = search.create_lattice()
        assert lat.n_states > 0 and lat.n_arcs > 0
        # best lattice path = search result (ignoring silence lemmas)
        labels, _ = lat.best(1.0, 1.0)
        orths = [lat.words[l] for l in labels
                 if not am.lexicon.lemmas[l].special]
        assert orths == ["AB", "BA"]
        # state boundaries are increasing frame indices within the span
        T = scores.shape[0]
        assert all(0 <= b <= T for b in lat.boundaries)
        # the first word's span ends roughly mid-utterance
        first_arcs = [(s, a) for s in range(lat.n_states)
                      for a in lat.arcs[s] if lat.words.get(a.word) == "AB"]
        assert first_arcs
        s0, a0 = first_arcs[0]
        assert lat.boundaries[s0] < lat.boundaries[a0.target] <= T

    def test_lattice_feeds_sequence_training(self, am, scorer_and_means):
        """E2E: word-conditioned lattice -> occupancy accumulation (the
        lattice-based MMI input path)."""
        from rasr_tpu.nn.sequence_training import occupancies
        scorer, means = scorer_and_means
        feats = synth_features(means, [0, 1, 2, 3, 4, 5])
        scores = np.asarray(scorer.score(feats))
        search = WordConditionedTreeSearch(am, beam_size=64)
        search.recognize(scores)
        lat = search.create_lattice()
        # trivial per-arc alignments: constant class per frame span
        aligns = {}
        for s in range(lat.n_states):
            for i, arc in enumerate(lat.arcs[s]):
                span = lat.boundaries[arc.target] - lat.boundaries[s]
                aligns[(s, i)] = [0] * span
        T = scores.shape[0]
        gamma, total = occupancies(lat, aligns, T, 2)
        assert np.isfinite(total)
        assert (gamma >= 0).all() and gamma.sum() > 0
