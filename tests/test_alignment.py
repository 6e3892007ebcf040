"""Milestone B tests: allophone-state graph building + TPU Viterbi /
Baum-Welch alignment, checked against a brute-force numpy DP."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        MonophoneStateTying, Tdp,
                                        TransitionModel)
from rasr_tpu.am.allophone import AllophoneAlphabet
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.search.aligner import Aligner
from rasr_tpu.speech.allophone_graph import StateGraphBuilder

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


@pytest.fixture
def am(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    alphabet = AllophoneAlphabet(lex.phoneme_inventory, n_contexts=1)
    topo = HmmTopology(states_per_phone=3, silence_states=1)
    tying = MonophoneStateTying(len(lex.phoneme_inventory), 3)
    trans = TransitionModel(default=Tdp(3.0, 0.0, 30.0, 0.0),
                            silence=Tdp(0.0, 3.0, float("inf"), 6.0))
    return AcousticModel(lex, alphabet, topo, tying, trans)


def brute_force_viterbi(graph, scores):
    """Reference DP in plain numpy over the arc list."""
    N, T = graph.n_states, scores.shape[0]
    BIG = 1e30
    em = scores[:, graph.emissions]
    alpha = np.full(N, BIG)
    alpha[graph.initial] = graph.initial_score
    alpha += em[0]
    back = np.zeros((T - 1, N), dtype=np.int64)
    for t in range(1, T):
        new = np.full(N, BIG)
        src = np.full(N, -1, dtype=np.int64)
        for f, to, s in zip(graph.arcs_from, graph.arcs_to, graph.arcs_score):
            cand = alpha[f] + s
            if cand < new[to]:
                new[to] = cand
                src[to] = f
        alpha = new + em[t]
        back[t - 1] = src
    final = alpha.copy()
    final[graph.final] += graph.final_score
    mask = np.full(N, BIG)
    mask[graph.final] = 0
    total = np.min(final + mask)
    state = int(np.argmin(final + mask))
    path = [state]
    for t in range(T - 2, -1, -1):
        state = int(back[t][state])
        path.append(state)
    return np.asarray(path[::-1]), total


class TestGraphBuilder:
    def test_graph_structure(self, am):
        g = StateGraphBuilder(am).build("AB")
        # a(3) + b(3) states 0..5, leading sil = 6, trailing sil = 7
        assert g.n_states == 8
        # entry: leading silence or word start
        assert set(g.initial.tolist()) == {0, 6}
        # monophone tying: 'a' states -> classes 0..2, 'b' -> 3..5, si -> 6
        assert g.emissions[0] == 0 and g.emissions[3] == 3
        assert g.emissions[6] == 6 and g.emissions[7] == 6

    def test_silence_between_words(self, am):
        g = StateGraphBuilder(am).build("AB BA")
        # sil + 6 + sil + 6 + sil
        assert g.n_states == 15


class TestViterbi:
    def test_matches_brute_force(self, am):
        rng = np.random.default_rng(0)
        g = StateGraphBuilder(am).build("AB")
        T, E = 20, 7
        scores = rng.uniform(0, 10, size=(T, E)).astype(np.float32)
        aligner = Aligner(g)
        path, labels, total = aligner.align(scores)
        ref_path, ref_total = brute_force_viterbi(g, scores)
        assert abs(total - ref_total) < 1e-3
        np.testing.assert_array_equal(path, ref_path)

    def test_alignment_follows_emissions(self, am):
        """Make each state's own emission cheap in its time span: the path
        must walk through all states in order."""
        g = StateGraphBuilder(am).build("AB")
        T = 16
        scores = np.full((T, 7), 10.0, dtype=np.float32)
        # frames 0-1 silence, then two frames per 'a'/'b' state, final silence
        spans = [(0, 2, 6), (2, 4, 0), (4, 6, 1), (6, 8, 2),
                 (8, 10, 3), (10, 12, 4), (12, 14, 5), (14, 16, 6)]
        for lo, hi, em in spans:
            scores[lo:hi, em] = 0.0
        aligner = Aligner(g)
        path, labels, total = aligner.align(scores)
        em_path = np.asarray(g.emissions)[path]
        np.testing.assert_array_equal(
            em_path, [6, 6, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5, 6, 6])

    def test_emission_path_for_accumulation(self, am):
        g = StateGraphBuilder(am).build("BA")
        rng = np.random.default_rng(1)
        scores = rng.uniform(0, 5, size=(12, 7)).astype(np.float32)
        em_path = Aligner(g).emission_path(scores)
        assert em_path.shape == (12,)
        assert em_path.max() < 7


class TestBaumWelch:
    def test_posteriors_sum_to_one(self, am):
        rng = np.random.default_rng(2)
        g = StateGraphBuilder(am).build("AB")
        scores = rng.uniform(0, 3, size=(15, 7)).astype(np.float32)
        gamma, total = Aligner(g).posteriors(scores)
        assert gamma.shape == (15, g.n_states)
        np.testing.assert_allclose(gamma.sum(axis=1), 1.0, atol=1e-4)

    def test_viterbi_upper_bounds_full_sum(self, am):
        rng = np.random.default_rng(3)
        g = StateGraphBuilder(am).build("AB")
        scores = rng.uniform(0, 3, size=(15, 7)).astype(np.float32)
        aligner = Aligner(g)
        _, _, vit = aligner.align(scores)
        _, fs = aligner.posteriors(scores)
        assert fs <= vit + 1e-4


class TestBatchedAlignment:
    def test_matches_single_segment_aligner(self, am):
        from rasr_tpu.search.aligner import align_batch
        rng = np.random.default_rng(3)
        orths = ["AB", "BA", "AB BA"]
        graphs = [StateGraphBuilder(am).build(o) for o in orths]
        lengths = [14, 20, 26]
        T, E = max(lengths), 7
        scores = np.zeros((len(orths), T, E), np.float32)
        singles = []
        for b, (g, L) in enumerate(zip(graphs, lengths)):
            s = rng.uniform(0, 10, size=(L, E)).astype(np.float32)
            scores[b, :L] = s
            singles.append(Aligner(g).align(s))
        batched = align_batch(graphs, scores, lengths)
        for b in range(len(orths)):
            sp, lp, total = batched[b]
            ref_sp, ref_lp, ref_total = singles[b]
            assert abs(total - ref_total) < 1e-2, b
            np.testing.assert_array_equal(sp, ref_sp)
            np.testing.assert_array_equal(lp, ref_lp)


class TestLinearSearch:
    def test_word_boundaries(self, am):
        """Emission scores drive each word's states in its own time span;
        the linear search recovers the word boundaries."""
        from rasr_tpu.search.linear import LinearSearch
        # monophone tying: a->0..2, b->3..5, si->6; "AB" = a b ; "BA" = b a
        T, E = 24, 7
        scores = np.full((T, E), 8.0, np.float32)
        # si(0:4), a(4:10), b(10:16), then b(16:20), a(20:24)?? "AB BA"
        spans = [(0, 4, [6]), (4, 8, [0, 1, 2]), (8, 12, [3, 4, 5]),
                 (12, 14, [6]), (14, 18, [3, 4, 5]), (18, 22, [0, 1, 2]),
                 (22, 24, [6])]
        for (t0, t1, classes) in spans:
            for t in range(t0, t1):
                for c in classes:
                    scores[t, c] = 0.5
        search = LinearSearch(am)
        bounds, path, total = search.recognize("AB BA", scores)
        assert [b.word for b in bounds] == ["AB", "BA"]
        ab, ba = bounds
        assert ab.lemma_index == 0 and ba.lemma_index == 1
        # boundaries near the constructed spans
        assert abs(ab.start_frame - 4) <= 1
        assert abs(ab.end_frame - 12) <= 2
        assert abs(ba.start_frame - 14) <= 2
        assert ba.end_frame <= 23
        assert bounds[0].end_frame <= bounds[1].start_frame
