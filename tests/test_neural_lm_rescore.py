"""Word-level neural LM driven through the framework surfaces the
reference exposes for its RecurrentLanguageModel
(src/Lm/RecurrentLanguageModel.hh:89, src/Lm/Module.cc:66-73,
src/Flf/PushForwardRescoring.cc): beamed push-forward lattice rescoring,
the flf rescoring nodes, FIRST-PASS tree search via dense rows, config
registration, and int8 cached-row compression."""

import json
import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.lattice.rescore import push_forward_rescore
from rasr_tpu.lattice.word_lattice import WordLattice
from rasr_tpu.lm.neural import LstmLmModel, NeuralLanguageModel

VOCAB = ["<s>", "</s>", "<unk>", "a", "b", "c", "x"]
A, B, C, X = 3, 4, 5, 6


def _train(vocab, sequences, steps=300, seed=0):
    model = LstmLmModel(vocab_size=len(vocab), embed_dim=16, hidden_dim=32)
    toks = jnp.asarray([s[:-1] for s in sequences], jnp.int32)
    tgts = jnp.asarray([s[1:] for s in sequences], jnp.int32)
    params = model.init(jax.random.PRNGKey(seed), toks)["params"]
    opt = optax.adam(1e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            lp = jax.nn.log_softmax(model.apply({"params": p}, toks), -1)
            return -jnp.mean(jnp.take_along_axis(
                lp, tgts[..., None], -1))
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = opt.update(g, o)
        return optax.apply_updates(p, up), o, loss

    for _ in range(steps):
        params, opt_state, _ = step(params, opt_state)
    return model, params


@pytest.fixture(scope="module")
def trained():
    # the language is always "a b c": after 'a' the LM strongly prefers
    # 'b' over 'x'
    model, params = _train(VOCAB, [[0, A, B, C, 1]])
    return model, params


@pytest.fixture(scope="module")
def lm(trained):
    model, params = trained
    return NeuralLanguageModel(model, params, VOCAB)


def ambiguous_lattice():
    """Two paths 'a b c' vs 'a x c'; acoustics slightly favor x."""
    words = {1: "a", 2: "b", 3: "c", 4: "x"}
    lat = WordLattice(words=words)
    s = [lat.add_state(t) for t in range(4)]
    lat.initial = s[0]
    lat.add_arc(s[0], s[1], 1, am_score=1.0)
    lat.add_arc(s[1], s[2], 2, am_score=1.3)   # b: acoustically worse
    lat.add_arc(s[1], s[2], 4, am_score=1.0)   # x: acoustically better
    lat.add_arc(s[2], s[3], 3, am_score=1.0)
    lat.set_final(s[3], 0.0)
    return lat


class TestPushForward:
    def test_neural_lm_overrides_acoustics(self, lm):
        lat = ambiguous_lattice()
        labels, _ = lat.best()
        assert [lat.words[l] for l in labels if l in lat.words] \
            == ["a", "x", "c"]
        out = push_forward_rescore(lat, lm, scale=2.0, k=8, n_out=2)
        assert [lat.words[l] for l in out[0][0]] == ["a", "b", "c"]
        assert len(out) == 2
        assert out[0][1] <= out[1][1]

    def test_matches_exhaustive_on_small_lattice(self, lm):
        """Push-forward with a wide beam equals brute-force path scores."""
        lat = ambiguous_lattice()
        out = push_forward_rescore(lat, lm, scale=1.0, k=64, n_out=4)
        for labels, score in out:
            toks = [lat.words[l] for l in labels]
            am = 1.0 + (1.3 if "b" in toks else 1.0) + 1.0
            want = am + lm.sequence_score(toks)
            assert abs(score - want) < 1e-4


class TestFlfNodes:
    def test_push_forward_node_with_neural_lm(self, tmp_path, lm):
        import test_flf_nodes as h
        from rasr_tpu.flf.semiring import FlfSemiring
        from rasr_tpu.flf.lattice import FlfLattice
        sr = FlfSemiring(("am", "lm"))
        words = {1: "a", 2: "b", 3: "c", 4: "x"}
        flat = FlfLattice.build(
            sr, 4,
            [(0, 1, 1, (1.0, 0.0)),
             (1, 2, 2, (1.3, 0.0)), (1, 2, 4, (1.0, 0.0)),
             (2, 3, 3, (1.0, 0.0))],
            boundaries=[0, 1, 2, 3], initial=0,
            finals={3: (0.0, 0.0)}, words=words)
        out = h.run_chain(
            tmp_path,
            [{"type": "push-forward-rescoring", "scale": 2.0,
              "history-beam": 8, "n": 2},
             {"type": "best"}],
            flat, context={"lm": lm})
        got = out[0]
        labels = [a.word for s in range(got.n_states)
                  for a in got.arcs[s] if a.word in words]
        assert [words[l] for l in labels] == ["a", "b", "c"]

    def test_decode_rescore_lm_node_with_neural_lm(self, tmp_path, lm):
        import test_flf_nodes as h
        from rasr_tpu.flf.semiring import FlfSemiring
        from rasr_tpu.flf.lattice import FlfLattice
        sr = FlfSemiring(("am", "lm"))
        words = {1: "a", 2: "b", 3: "c", 4: "x"}
        flat = FlfLattice.build(
            sr, 4,
            [(0, 1, 1, (1.0, 0.0)),
             (1, 2, 2, (1.3, 0.0)), (1, 2, 4, (1.0, 0.0)),
             (2, 3, 3, (1.0, 0.0))],
            boundaries=[0, 1, 2, 3], initial=0,
            finals={3: (0.0, 0.0)}, words=words)
        out = h.run_chain(
            tmp_path,
            [{"type": "decode-rescore-lm", "scale": 2.0}],
            flat, context={"lm": lm})
        got = out[0]
        labels = [a.word for s in range(got.n_states)
                  for a in got.arcs[s] if a.word in words]
        assert [words[l] for l in labels] == ["a", "b", "c"]


LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>pa</symbol></phoneme>
        <phoneme><symbol>pb</symbol></phoneme>
        <phoneme><symbol>pc</symbol></phoneme>
        <phoneme><symbol>px</symbol></phoneme>
        <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
      </phoneme-inventory>
      <lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon></lemma>
      <lemma><orth>a</orth><phon>pa</phon></lemma>
      <lemma><orth>b</orth><phon>pb</phon></lemma>
      <lemma><orth>c</orth><phon>pc</phon></lemma>
      <lemma><orth>x</orth><phon>px</phon></lemma>
    </lexicon>
""")


class TestFirstPass:
    def test_neural_lm_first_pass_tree_search(self, tmp_path, lm):
        """The neural LM drives the word-conditioned search directly
        (dense word-end rows + LM lookahead), resolving acoustically
        ambiguous b/x toward the LM's preference."""
        from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                                MonophoneStateTying, Tdp,
                                                TransitionModel)
        from rasr_tpu.am.allophone import AllophoneAlphabet
        from rasr_tpu.bliss.lexicon import Lexicon
        from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch

        p = tmp_path / "lex.xml"
        p.write_text(LEXICON_XML)
        lex = Lexicon()
        lex.load(str(p))
        am = AcousticModel(
            lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
            HmmTopology(3, 1, 1), MonophoneStateTying(5, 3),
            TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                            Tdp(0.0, 2.0, float("inf"), 4.0)))
        search = WordConditionedTreeSearch(
            am, lm=lm, lm_scale=3.0, beam_size=64, lm_lookahead=True)
        assert search._lm_dense_ok
        # emissions: 'pa pb pc' track, but pb frames are slightly MORE
        # expensive than px (acoustic ambiguity)
        T = 9
        S = 15
        scores = np.full((T, S), 8.0)
        track_a = [0, 1, 2]
        track_b = [3, 4, 5]
        track_x = [9, 10, 11]
        track_c = [6, 7, 8]
        for t, cls in enumerate(track_a + track_b + track_c):
            scores[t, cls] = 1.0
        for t, cls in enumerate(track_x, start=3):
            scores[t, cls] = 0.8   # x acoustically cheaper than b
        hyp = search.recognize(scores)
        assert hyp == ["a", "b", "c"]

    def test_arpa_vs_neural_first_pass_same_machinery(self, lm):
        """score_dense row must agree with scalar score() per token."""
        h = lm.initial_history()
        h = lm.extended_history(h, "a")
        dense = lm.score_dense(h)
        for tok in ["b", "x", "c"]:
            assert abs(dense[lm.token_id(tok)] - lm.score(h, tok)) < 1e-6


class TestConfigRegistration:
    def test_neural_lstm_lm_type(self, tmp_path, trained, lm):
        from rasr_tpu.api import ModelCombination
        from rasr_tpu.core.configuration import Configuration
        from rasr_tpu.nn.checkpoint import save_params
        model, params = trained
        ckpt = tmp_path / "wordlm.msgpack"
        info = tmp_path / "wordlm.json"
        save_params(str(ckpt), jax.device_get(params))
        info.write_text(json.dumps({
            "model": {"vocab_size": len(VOCAB), "embed_dim": 16,
                      "hidden_dim": 32},
            "vocab": VOCAB}))
        cfg = Configuration()
        cfg.set("lm.type", "neural-lstm")
        cfg.set("lm.file", str(ckpt))
        cfg.set("lm.info", str(info))
        cfg.set("lm.scale", "2.0")
        mc = ModelCombination.create(cfg)
        got = mc.language_model
        h = got.initial_history()
        want = 2.0 * lm.score(lm.initial_history(), "a")
        assert abs(got.score(h, "a") - want) < 1e-5
        # the unwrapped LM keeps the dense-row contract for first-pass use
        assert hasattr(got.lm, "score_dense")

    def test_state_compression_config(self, tmp_path, trained):
        from rasr_tpu.api import ModelCombination
        from rasr_tpu.core.configuration import Configuration
        from rasr_tpu.nn.checkpoint import save_params
        model, params = trained
        ckpt = tmp_path / "wordlm.msgpack"
        info = tmp_path / "wordlm.json"
        save_params(str(ckpt), jax.device_get(params))
        info.write_text(json.dumps({
            "model": {"vocab_size": len(VOCAB), "embed_dim": 16,
                      "hidden_dim": 32},
            "vocab": VOCAB}))
        cfg = Configuration()
        cfg.set("lm.type", "neural-lstm")
        cfg.set("lm.file", str(ckpt))
        cfg.set("lm.info", str(info))
        cfg.set("lm.state-compression", "int8")
        mc = ModelCombination.create(cfg)
        assert mc.language_model.lm.state_compression == "int8"


class TestStateCompression:
    def test_int8_rows_close_and_4x_smaller(self, trained):
        model, params = trained
        raw = NeuralLanguageModel(model, params, VOCAB)
        comp = NeuralLanguageModel(model, params, VOCAB,
                                   state_compression="int8")
        hists = [raw.initial_history()]
        for t in ["a", "b", "c"]:
            hists.append(raw.extended_history(hists[-1], t))
        for h in hists:
            for tok in VOCAB:
                a = raw.score(h, tok)
                b = comp.score(h, tok)
                assert abs(a - b) <= max(0.15, 0.02 * abs(a)), (h, tok)
        # per-row: V bytes + 8 (scale/offset) vs 4V raw; the tiny test
        # vocab makes the constant overhead visible
        n_rows = len(comp._cache)
        assert comp.cache_bytes() <= 0.25 * raw.cache_bytes() + 9 * n_rows

    def test_unknown_compression_rejected(self, trained):
        model, params = trained
        with pytest.raises(ValueError):
            NeuralLanguageModel(model, params, VOCAB,
                                state_compression="fp4")


class TestSearchSpaceAware:
    def test_search_feeds_stats_to_lm(self, tmp_path, lm):
        """The tree search passes per-frame hypothesis statistics to
        LMs that override set_search_space_info (reference
        src/Lm/SearchSpaceAwareLanguageModel.hh:38)."""
        from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                                MonophoneStateTying, Tdp,
                                                TransitionModel)
        from rasr_tpu.am.allophone import AllophoneAlphabet
        from rasr_tpu.bliss.lexicon import Lexicon
        from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
        p = tmp_path / "lex.xml"
        p.write_text(LEXICON_XML)
        lex = Lexicon()
        lex.load(str(p))
        am = AcousticModel(
            lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
            HmmTopology(3, 1, 1), MonophoneStateTying(5, 3),
            TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                            Tdp(0.0, 2.0, float("inf"), 4.0)))
        search = WordConditionedTreeSearch(am, lm=lm, lm_scale=3.0,
                                           beam_size=64)
        assert search._lm_aware
        scores = np.full((9, 15), 8.0)
        for t, cls in enumerate([0, 1, 2, 3, 4, 5, 6, 7, 8]):
            scores[t, cls] = 1.0
        search.recognize(scores)
        info = lm.search_space_info
        assert info["active_states"] >= 1
        assert info["active_histories"] >= 1
        assert 0 < info["frame"] <= 9


class TestQuantizedLattice:
    def _decode(self, tmp_path, orth_classes):
        from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                                MonophoneStateTying, Tdp,
                                                TransitionModel)
        from rasr_tpu.am.allophone import AllophoneAlphabet
        from rasr_tpu.bliss.lexicon import Lexicon
        from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
        p = tmp_path / "lexq.xml"
        p.write_text(LEXICON_XML)
        lex = Lexicon()
        lex.load(str(p))
        am = AcousticModel(
            lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
            HmmTopology(3, 1, 1), MonophoneStateTying(5, 3),
            TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                            Tdp(0.0, 2.0, float("inf"), 4.0)))
        search = WordConditionedTreeSearch(am, lm=None, beam_size=128)
        T = len(orth_classes)
        scores = np.full((T, 15), 8.0)
        for t, cls in enumerate(orth_classes):
            scores[t, cls] = 0.5
        search.recognize(scores)
        return search

    def test_repeated_word_survives_quantization(self, tmp_path):
        """q>1 must keep both occurrences of a repeated word even when
        their boundaries fold into one time bucket."""
        # 'a a b': tracks 0-2 twice then 3-5
        classes = [0, 1, 2, 0, 1, 2, 3, 4, 5]
        search = self._decode(tmp_path, classes)
        for q in (1, 4, 8):
            lat = search.create_lattice(time_quantum=q)
            labels, _ = lat.best()
            words = [lat.words[l] for l in labels if l in lat.words]
            assert words == ["a", "a", "b"], (q, words)

    def test_quantized_lattice_is_acyclic(self, tmp_path):
        classes = [0, 1, 2, 3, 4, 5, 0, 1, 2, 6, 7, 8]
        search = self._decode(tmp_path, classes)
        for q in (2, 4, 16):
            lat = search.create_lattice(time_quantum=q)
            # Kahn over the reachable subgraph must drain every state
            reach = {lat.initial}
            stack = [lat.initial]
            while stack:
                s = stack.pop()
                for arc in lat.arcs[s]:
                    if arc.target not in reach:
                        reach.add(arc.target)
                        stack.append(arc.target)
            indeg = {s: 0 for s in reach}
            for s in reach:
                for arc in lat.arcs[s]:
                    indeg[arc.target] += 1
            frontier = [s for s in reach if indeg[s] == 0]
            drained = 0
            while frontier:
                s = frontier.pop()
                drained += 1
                for arc in lat.arcs[s]:
                    indeg[arc.target] -= 1
                    if indeg[arc.target] == 0:
                        frontier.append(arc.target)
            assert drained == len(reach), f"cycle at q={q}"
