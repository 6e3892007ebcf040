"""Context-dependency WFST decoding: C o L o G build + HMM expansion +
static-graph Viterbi, parity-checked against the word-conditioned tree
search on the SAME triphone acoustic model (reference
src/Search/Wfst/ContextTransducerBuilder.cc; VERDICT r3 item 7)."""

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        LutStateTying, Tdp,
                                        TransitionModel)
from rasr_tpu.am.allophone import (AllophoneAlphabet,
                                   allophones_of_pronunciation)
from rasr_tpu.data.synth_lm import MarkovLanguage, count_ngrams, \
    make_lexicon, write_arpa
from rasr_tpu.lm.arpa import ArpaLm
from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
from rasr_tpu.search.wfst import HmmWfstDecoder, build_clg, expand_hmm

N_WORDS, N_PHONES = 30, 6


def triphone_am(lex):
    """Triphone AM: LUT tying distinguishing (central, left, right,
    state) for every within-word allophone in the lexicon."""
    alphabet = AllophoneAlphabet(lex.phoneme_inventory, n_contexts=1)
    inv = lex.phoneme_inventory
    table = {}

    def add(allo, n_states):
        for s in range(n_states):
            key = f"{allo.format(inv)}.{s}"
            if key not in table:
                table[key] = len(table)

    topo = HmmTopology(3, 1, 1)
    for lemma in lex.lemmas:
        for lp in lemma.pronunciations:
            phones = list(lp.pronunciation.phonemes)
            allos = allophones_of_pronunciation(phones, alphabet)
            for pid, allo in zip(phones, allos):
                is_sil = (lemma.special == "silence")
                add(allo, topo.n_states(is_sil))
    tying = LutStateTying(alphabet, table)
    tm = TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                         Tdp(0.0, 2.0, float("inf"), 4.0))
    return AcousticModel(lex, alphabet, topo, tying, tm)


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("clg")
    lex, _mono_am, prons = make_lexicon(N_WORDS, n_phonemes=N_PHONES,
                                        seed=11, min_len=2, max_len=4)
    am = triphone_am(lex)
    lang = MarkovLanguage(N_WORDS, branching=6, seed=12)
    sents = lang.sample_corpus(60_000, seed=13)
    nd = count_ngrams(sents, 3, N_WORDS)
    arpa = str(tmp / "lm.arpa")
    write_arpa(arpa, nd, N_WORDS)
    return lex, am, prons, ArpaLm(arpa), lang


def synth_triphone_emissions(word_ids, prons, am, rng,
                             frames_per_state=(2, 4),
                             true_score=0.5, noise_score=6.0):
    """(T, n_classes) -log emission scores whose cheap track follows the
    triphone classes of the word sequence."""
    S = am.state_tying.n_classes
    rows = []
    n_states = am.topology.n_states(False)
    for w in word_ids:
        # make_lexicon prons are 0-based; inventory ids are 1-based
        phones = [int(p) + 1 for p in prons[int(w)] if p >= 0]
        allos = allophones_of_pronunciation(phones, am.alphabet)
        for allo in allos:
            for st in range(n_states):
                cls = am.state_tying.emission_index(allo, st)
                for _ in range(int(rng.integers(*frames_per_state))):
                    row = np.full(S, noise_score)
                    row += rng.uniform(0, 0.4, S)
                    row[cls] = true_score + rng.uniform(0, 0.2)
                    rows.append(row)
    return np.asarray(rows)


class TestClgStructure:
    def test_clg_inputs_are_triphone_allophones(self, setup):
        lex, am, _prons, lm, _lang = setup
        clg = build_clg(am, lm, lm_scale=1.0)
        n_allo = len(am.alphabet)
        labels = {a.ilabel for s in range(clg.n_states)
                  for a in clg.arcs[s] if a.ilabel != 0}
        assert labels, "empty C o L o G"
        assert max(labels) <= n_allo
        # context diversity: some phoneme occurs with >1 distinct
        # (left, right) context pair
        by_central = {}
        for lab in labels:
            allo = am.alphabet.allophone(lab - 1)
            by_central.setdefault(allo.central, set()).add(
                (allo.left, allo.right))
        assert max(len(v) for v in by_central.values()) > 1

    def test_hmm_expansion_has_tdp_loops(self, setup):
        _lex, am, _prons, lm, _lang = setup
        h = expand_hmm(build_clg(am, lm), am)
        loops = [a for s in range(h.n_states) for a in h.arcs[s]
                 if a.target == s and a.ilabel != 0]
        assert loops
        weights = {round(a.weight, 6) for a in loops}
        # speech loop tdp 2.0; silence loop tdp 0.0
        assert weights == {2.0, 0.0}


class TestParityWithTreeSearch:
    def test_wfst_matches_tree_search(self, setup):
        """On identical triphone emissions + LM, the static C o L o G
        Viterbi and the dynamic word-conditioned tree search must
        produce the same word sequences (VERDICT: WFST decode WER ==
        tree-search WER on a triphone AM)."""
        lex, am, prons, lm, lang = setup
        lm_scale = 2.0
        tree = WordConditionedTreeSearch(am, lm=lm, lm_scale=lm_scale,
                                         beam_size=2048,
                                         word_end_beam_size=256)
        graph = expand_hmm(build_clg(am, lm, lm_scale=lm_scale), am)
        dec = HmmWfstDecoder(graph, beam_size=4096)
        rng = np.random.default_rng(21)
        agree = total = 0
        for _ in range(6):
            ws = lang.sample_sentence(rng, 3, 6)
            scores = synth_triphone_emissions(ws, prons, am, rng)
            hyp_tree = [w for w in tree.recognize(scores)
                        if w != "[SILENCE]"]
            hyp_wfst = [w for w in dec.recognize(scores, lex)
                        if w != "[SILENCE]"]
            ref = [f"w{int(w)}" for w in ws]
            total += 1
            if hyp_tree == hyp_wfst:
                agree += 1
            # both decoders must nail the easy synthetic acoustics
            assert hyp_wfst == ref, (hyp_wfst, ref)
            assert hyp_tree == ref, (hyp_tree, ref)
        assert agree == total

    def test_wfst_without_lm(self, setup):
        lex, am, prons, _lm, lang = setup
        graph = expand_hmm(build_clg(am, None), am)
        dec = HmmWfstDecoder(graph, beam_size=4096)
        rng = np.random.default_rng(22)
        ws = lang.sample_sentence(rng, 3, 5)
        scores = synth_triphone_emissions(ws, prons, am, rng)
        hyp = [w for w in dec.recognize(scores, lex) if w != "[SILENCE]"]
        assert hyp == [f"w{int(w)}" for w in ws]


class TestDynamicLm:
    def test_dynamic_lm_matches_static_g(self, setup):
        """On-the-fly LM composition over C o L must equal the static
        C o L o G decode (reference DynamicLmFst)."""
        from rasr_tpu.search.wfst import DynamicLmWfstDecoder
        lex, am, prons, lm, lang = setup
        lm_scale = 2.0
        static_dec = HmmWfstDecoder(
            expand_hmm(build_clg(am, lm, lm_scale=lm_scale), am),
            beam_size=4096)
        dyn_dec = DynamicLmWfstDecoder(
            expand_hmm(build_clg(am, None), am), lm, lex,
            lm_scale=lm_scale, beam_size=4096)
        rng = np.random.default_rng(31)
        for _ in range(4):
            ws = lang.sample_sentence(rng, 3, 5)
            scores = synth_triphone_emissions(ws, prons, am, rng)
            w_static, s_static = static_dec.decode(scores)
            w_dyn, s_dyn = dyn_dec.decode(scores)
            assert w_static == w_dyn
            assert abs(s_static - s_dyn) < 1e-6


class TestExpandingFsaFromConfig:
    def test_config_built_hmm_wfst(self, setup, tmp_path):
        """expanding-fsa-search from .config (static and dynamic LM
        composition) decodes precomputed emissions like the direct
        decoders (reference Search::Module factory,
        src/Search/Module.cc:39-132)."""
        import textwrap
        from rasr_tpu.api import ModelCombination
        from rasr_tpu.core.configuration import Configuration
        from rasr_tpu.lm import ArpaLm as _A, ScaledLanguageModel
        from rasr_tpu.search.module import create_search_algorithm
        lex, am, prons, lm, lang = setup
        for comp in ("static", "dynamic"):
            conf_path = str(tmp_path / f"wfst_{comp}.config")
            with open(conf_path, "w") as fh:
                fh.write(textwrap.dedent(f"""\
                    [acoustic-model.state-tying]
                    type = monophone
                    [acoustic-model.tdp.*]
                    loop = 2.0
                    forward = 0.0
                    skip = 20.0
                    exit = 0.0
                    [acoustic-model.tdp.silence]
                    loop = 0.0
                    forward = 2.0
                    skip = infinity
                    exit = 4.0
                    [search-algorithm]
                    type = expanding-fsa-search
                    max-beam-size = 4096
                    lm-composition = {comp}
                """))
            config = Configuration()
            config.set_from_file(conf_path)
            mc = ModelCombination(
                lexicon=lex,
                language_model=ScaledLanguageModel(lm, 2.0))
            algo = create_search_algorithm(config, mc)
            rng = np.random.default_rng(41)
            ws = lang.sample_sentence(rng, 3, 5)
            # config AM is monophone; use a monophone-consistent
            # emission track (classes via the config-built AM's tying)
            from rasr_tpu.am.acoustic_model import AcousticModel
            am_cfg = AcousticModel.create(
                config.sub("acoustic-model"), lex)
            scores = synth_triphone_emissions(ws, prons, am_cfg, rng)
            out = algo.recognize_segment(scores)
            hyp = [w for w in out.split() if w != "[SILENCE]"]
            assert hyp == [f"w{int(w)}" for w in ws], (comp, hyp)


class TestWfstLattice:
    def test_trellis_lattice_contains_best_and_alternatives(self, setup):
        from rasr_tpu.search.wfst import hmm_wfst_lattice
        lex, am, prons, lm, lang = setup
        graph = expand_hmm(build_clg(am, lm, lm_scale=2.0), am)
        dec = HmmWfstDecoder(graph, beam_size=4096)
        rng = np.random.default_rng(51)
        ws = lang.sample_sentence(rng, 3, 5)
        scores = synth_triphone_emissions(ws, prons, am, rng)
        words, total = dec.decode(scores)
        lat = hmm_wfst_lattice(dec, scores, lattice_threshold=25.0)
        assert lat.n_arcs > 0
        # the lattice's Viterbi best equals the decoder's best (float32
        # potential planes: millinat tolerance); labels live in the
        # graph output space (lemma id + 1)
        labels, lat_score = lat.best()
        assert abs(lat_score - total) < 1e-2, (lat_score, total)
        assert [l - 1 for l in labels] == words
        # alternatives survive: more arcs than the single best path
        best_arcs = len(labels) + scores.shape[0]
        assert lat.n_arcs > best_arcs

    def test_tight_threshold_shrinks_lattice(self, setup):
        from rasr_tpu.search.wfst import hmm_wfst_lattice
        lex, am, prons, lm, lang = setup
        graph = expand_hmm(build_clg(am, lm, lm_scale=2.0), am)
        dec = HmmWfstDecoder(graph, beam_size=4096)
        rng = np.random.default_rng(52)
        ws = lang.sample_sentence(rng, 3, 4)
        scores = synth_triphone_emissions(ws, prons, am, rng)
        wide = hmm_wfst_lattice(dec, scores, lattice_threshold=30.0)
        tight = hmm_wfst_lattice(dec, scores, lattice_threshold=1.0)
        assert tight.n_arcs < wide.n_arcs
        labels, _sc = tight.best()
        assert [l - 1 for l in labels] == dec.decode(scores)[0]


    def test_config_recognizer_lattice(self, setup, tmp_path):
        """create_lattice through the config-built recognizer."""
        import textwrap
        from rasr_tpu.api import ModelCombination
        from rasr_tpu.core.configuration import Configuration
        from rasr_tpu.lm import ScaledLanguageModel
        from rasr_tpu.search.module import create_search_algorithm
        lex, am, prons, lm, lang = setup
        conf_path = str(tmp_path / "wl.config")
        with open(conf_path, "w") as fh:
            fh.write(textwrap.dedent("""\
                [acoustic-model.state-tying]
                type = monophone
                [acoustic-model.tdp.*]
                loop = 2.0
                forward = 0.0
                skip = 20.0
                exit = 0.0
                [acoustic-model.tdp.silence]
                loop = 0.0
                forward = 2.0
                skip = infinity
                exit = 4.0
                [search-algorithm]
                type = expanding-fsa-search
                max-beam-size = 4096
            """))
        config = Configuration()
        config.set_from_file(conf_path)
        mc = ModelCombination(lexicon=lex,
                              language_model=ScaledLanguageModel(lm, 2.0))
        algo = create_search_algorithm(config, mc)
        from rasr_tpu.am.acoustic_model import AcousticModel
        am_cfg = AcousticModel.create(config.sub("acoustic-model"), lex)
        rng = np.random.default_rng(53)
        ws = lang.sample_sentence(rng, 3, 4)
        scores = synth_triphone_emissions(ws, prons, am_cfg, rng)
        algo.recognize_segment(scores)
        lat = algo.create_lattice()
        assert lat.n_arcs > 0
        labels, _sc = lat.best()
        hyp = [lat.words[l] for l in labels if lat.words.get(l)
               and lat.words[l] != "[SILENCE]"]  # words keyed lemma+1
        assert hyp == [f"w{int(w)}" for w in ws]


class TestBatchedDynamicLm:
    def test_batched_matches_dict_decoder(self, setup):
        """The SoA vocabulary-scale decoder must reproduce the
        per-hypothesis dict decoder (same dynamic-composition
        semantics) on the toy C o L o G setup."""
        from rasr_tpu.search.wfst import (BatchedDynamicLmDecoder,
                                          DynamicLmWfstDecoder)
        lex, am, prons, lm, lang = setup
        lm_scale = 2.0
        graph = expand_hmm(build_clg(am, None), am)
        dict_dec = DynamicLmWfstDecoder(graph, lm, lex,
                                        lm_scale=lm_scale,
                                        beam_size=4096)
        soa_dec = BatchedDynamicLmDecoder(graph, lm, lex,
                                          lm_scale=lm_scale,
                                          beam_size=4096)
        rng = np.random.default_rng(77)
        for _ in range(4):
            ws = lang.sample_sentence(rng, 3, 5)
            scores = synth_triphone_emissions(ws, prons, am, rng)
            w_d, s_d = dict_dec.decode(scores)
            w_b, s_b = soa_dec.decode(scores)
            assert w_d == w_b
            assert abs(s_d - s_b) < 1e-6

    def test_prunes_and_still_decodes(self, setup):
        from rasr_tpu.search.wfst import BatchedDynamicLmDecoder
        lex, am, prons, lm, lang = setup
        graph = expand_hmm(build_clg(am, None), am)
        dec = BatchedDynamicLmDecoder(graph, lm, lex, lm_scale=2.0,
                                      beam_size=64,
                                      score_threshold=30.0)
        rng = np.random.default_rng(5)
        ws = lang.sample_sentence(rng, 3, 5)
        scores = synth_triphone_emissions(ws, prons, am, rng)
        hyp = dec.recognize(scores, lex)
        assert hyp == [f"w{int(w)}" for w in ws]
