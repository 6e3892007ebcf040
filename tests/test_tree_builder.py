"""Minimized state tree: across-word triphone expansion, suffix sharing,
persistent image cache (reference MinimizedTreeBuilder /
PersistentStateTree / ClassicTransducerBuilder)."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        MonophoneStateTying, StateTying,
                                        Tdp, TransitionModel)
from rasr_tpu.am.allophone import AllophoneAlphabet
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.mm import GmmScorer, MixtureSet
from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
from rasr_tpu.search.tree_builder import (MinimizedTreeBuilder, build_tree,
                                          load_image, save_image,
                                          tree_image_key)

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


class TriphoneTying(StateTying):
    """Exact triphone tying: every (central, left, right, state) gets its
    own emission class (what a fully-split CART would produce)."""

    def __init__(self, n_phones=3, states=3, silence_id=3):
        self.n = n_phones
        self.states = states
        self.sil = silence_id

    def emission_index(self, allo, state: int) -> int:
        c = ((allo.central - 1) * (self.n + 1) + allo.left) \
            * (self.n + 1) + allo.right
        return c * self.states + state

    def n_classes(self) -> int:
        return self.n * (self.n + 1) * (self.n + 1) * self.states


def make_am(tmp_path, tying=None):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    return AcousticModel(
        lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
        HmmTopology(3, 1, 1),
        tying or MonophoneStateTying(3, 3),
        TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                        Tdp(0.0, 2.0, float("inf"), 4.0)))


# phoneme ids in the lexicon: a=1, b=2, si=3
A, B, SI = 1, 2, 3


class TestBuilder:
    def test_monophone_mode_matches_legacy_tree(self, tmp_path):
        am = make_am(tmp_path)
        tree = MinimizedTreeBuilder(am, across_word=False).build()
        # 2 two-phone words + silence: after minimization the tree has
        # root + first nodes (a, b, si) + final nodes (b, a)
        assert len(tree.nodes) == 6
        ends = [w for nd in tree.nodes for w in nd.word_ends]
        assert len(ends) == 3
        assert all(close for (_l, _p, _g, close) in ends)
        assert all(g == 0 for (_l, _p, g, _c) in ends)

    def test_across_word_entry_groups(self, tmp_path):
        am = make_am(tmp_path, TriphoneTying())
        tree = MinimizedTreeBuilder(am, across_word=True).build()
        # every non-closing word end re-enters a group whose nodes all
        # start with the coarticulated right-context phoneme
        checked = 0
        for nd in tree.nodes:
            for (_l, _p, grp, close) in nd.word_ends:
                entries = tree.entry_groups[grp]
                assert entries, "empty re-entry group"
                if not close:
                    ci = {n for n in entries
                          if tree.nodes[n].phoneme == SI}
                    centrals = {tree.nodes[n].phoneme
                                for n in entries if n not in ci}
                    assert len(centrals) == 1
                    checked += 1
        assert checked > 0

    def test_suffix_sharing_across_left_contexts(self, tmp_path):
        am = make_am(tmp_path, TriphoneTying())
        builder = MinimizedTreeBuilder(am, across_word=True)
        tree = builder.build()
        # AB exists with left contexts {0, a, b}: three 'a' first nodes,
        # all pointing into the SAME final-b fan nodes (suffix shared)
        a_firsts = [i for i in tree.entry_groups[0]
                    if tree.nodes[i].phoneme == A]
        child_sets = [frozenset(tree.nodes[i].children.values())
                      for i in a_firsts]
        assert len(set(child_sets)) == 1

    def test_image_cache_roundtrip(self, tmp_path):
        am = make_am(tmp_path, TriphoneTying())
        img = str(tmp_path / "cache" / "tree.npz")
        key = tree_image_key(am, True)
        tree = MinimizedTreeBuilder(am, across_word=True).build()
        save_image(tree, img, key)
        back = load_image(img, key)
        assert back is not None
        assert len(back.nodes) == len(tree.nodes)
        assert back.entry_groups == tree.entry_groups
        for n1, n2 in zip(tree.nodes, back.nodes):
            assert n1.emissions == n2.emissions
            assert sorted(n1.children.values()) == \
                sorted(n2.children.values())
            assert n1.word_ends == n2.word_ends
        # stale key rejects
        assert load_image(img, "0" * 16) is None

    def test_build_tree_amortizes_via_image(self, tmp_path, monkeypatch):
        am = make_am(tmp_path, TriphoneTying())
        img = str(tmp_path / "tree.npz")
        build_tree(am, across_word=True, image_path=img)

        def boom(self):
            raise AssertionError("rebuilt despite image")

        monkeypatch.setattr(MinimizedTreeBuilder, "build", boom)
        tree = build_tree(am, across_word=True, image_path=img)
        assert len(tree.nodes) > 1


def synth_scores(am, tying, allophone_states, frames_per=4, noise=0.3,
                 seed=0, dim=6):
    """Emission-score matrix realizing an exact allophone-state path."""
    rng = np.random.default_rng(7)
    means = rng.standard_normal((tying.n_classes(), dim)) * 4.0
    ms = MixtureSet.single_gaussian(means,
                                    np.ones((tying.n_classes(), dim)))
    scorer = GmmScorer(ms)
    rng = np.random.default_rng(seed)
    frames = []
    for cls in allophone_states:
        frames.append(means[cls]
                      + noise * rng.standard_normal((frames_per, dim)))
    feats = np.concatenate(frames).astype(np.float32)
    return np.asarray(scorer.score(feats))


class TestAcrossWordDecoding:
    def test_coarticulated_utterance_decodes(self, tmp_path):
        tying = TriphoneTying()
        am = make_am(tmp_path, tying)

        def cls(c, l, r, s):
            from rasr_tpu.am.allophone import Allophone
            return tying.emission_index(Allophone(c, l, r), s)

        # "AB BA" realized with true across-word coarticulation:
        #   a{0+b} b{a+b} | b{b+a} a{b+0}
        path = []
        for c, l, r in [(A, 0, B), (B, A, B), (B, B, A), (A, B, 0)]:
            path.extend(cls(c, l, r, s) for s in range(3))
        scores = synth_scores(am, tying, path)

        xw = WordConditionedTreeSearch(am, beam_size=256,
                                       across_word=True)
        assert xw.recognize(scores) == ["AB", "BA"]

        # the within-word tree models the boundary allophones as
        # b{a+0} / b{0+a}: its best score on the coarticulated audio
        # must be worse than the across-word model's
        ww = WordConditionedTreeSearch(am, beam_size=256,
                                       across_word=False)
        ww.recognize(scores)
        _, score_ww = ww.best()
        _, score_xw = xw.best()
        assert score_xw < score_ww

    def test_across_word_with_silence_break(self, tmp_path):
        tying = TriphoneTying()
        am = make_am(tmp_path, tying)

        def cls(c, l, r, s):
            from rasr_tpu.am.allophone import Allophone
            return tying.emission_index(Allophone(c, l, r), s)

        # "AB [sil] BA": silence breaks the context — AB's final b has
        # open right context, BA starts with left context 0
        sil_cls = cls(SI, 0, 0, 0)
        path = [cls(A, 0, B, s) for s in range(3)] + \
               [cls(B, A, 0, s) for s in range(3)] + \
               [sil_cls] * 3 + \
               [cls(B, 0, A, s) for s in range(3)] + \
               [cls(A, B, 0, s) for s in range(3)]
        scores = synth_scores(am, tying, path)
        xw = WordConditionedTreeSearch(am, beam_size=256,
                                       across_word=True)
        assert xw.recognize(scores) == ["AB", "BA"]


class CoarseRightTying(StateTying):
    """Triphone tying that distinguishes right context only as
    {a-or-b} vs {other} for the FINAL phoneme — forces the builder's
    emission-variant dedup and merged re-entry groups."""

    def __init__(self, n_phones=3, states=3):
        self.n = n_phones
        self.states = states

    def emission_index(self, allo, state: int) -> int:
        rgrp = 1 if allo.right in (A, B) else 0
        c = ((allo.central - 1) * (self.n + 1) + allo.left) * 2 + rgrp
        return c * self.states + state

    def n_classes(self) -> int:
        return self.n * (self.n + 1) * 2 * self.states


class TestMergedEntryGroups:
    def test_variants_dedup_and_group_union(self, tmp_path):
        am = make_am(tmp_path, CoarseRightTying())
        tree = MinimizedTreeBuilder(am, across_word=True).build()
        # word-final fan: rhos {a, b} share emissions -> ONE node whose
        # word end re-enters the union group {a-starting, b-starting}
        found_union = False
        for nd in tree.nodes:
            if nd.phoneme == SI:
                continue
            for (_l, _p, grp, close) in nd.word_ends:
                entries = tree.entry_groups[grp]
                centrals = {tree.nodes[n].phoneme for n in entries
                            if tree.nodes[n].phoneme != SI}
                if centrals == {A, B}:
                    found_union = True
                    assert not close   # rho=0 lives in its own variant
        assert found_union

    def test_merged_decode_equals_fullfan_decode(self, tmp_path):
        """The merged-group tree must decode identically to the fully
        split one when the tying itself is fully split (no merging
        happens), and correctly under the coarse tying."""
        tying = CoarseRightTying()
        am = make_am(tmp_path, tying)

        def cls(c, l, r, s):
            from rasr_tpu.am.allophone import Allophone
            return tying.emission_index(Allophone(c, l, r), s)

        # "AB BA" fluent: a{0+b} b{a+b} | b{b+a} a{b+0}
        path = []
        for c, l, r in [(A, 0, B), (B, A, B), (B, B, A), (A, B, 0)]:
            path.extend(cls(c, l, r, s) for s in range(3))
        scores = synth_scores(am, tying, path)
        xw = WordConditionedTreeSearch(am, beam_size=256,
                                       across_word=True)
        assert xw.recognize(scores) == ["AB", "BA"]


class TestSinglePhoneAcrossWord:
    def test_one_phoneme_word_builds_and_decodes(self, tmp_path):
        """Regression: wend_group's non-CI branch must return
        (group, close) — single-phoneme context-dependent words
        tuple-concatenate it in across-word mode."""
        p = tmp_path / "lex1.xml"
        p.write_text(textwrap.dedent("""\
            <lexicon>
              <phoneme-inventory>
                <phoneme><symbol>a</symbol></phoneme>
                <phoneme><symbol>b</symbol></phoneme>
                <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
              </phoneme-inventory>
              <lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon></lemma>
              <lemma><orth>A</orth><phon>a</phon></lemma>
              <lemma><orth>BA</orth><phon>b a</phon></lemma>
            </lexicon>
        """))
        from rasr_tpu.bliss.lexicon import Lexicon
        lex = Lexicon()
        lex.load(str(p))
        from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                                Tdp, TransitionModel)
        from rasr_tpu.am.allophone import AllophoneAlphabet
        am = AcousticModel(
            lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
            HmmTopology(3, 1, 1), TriphoneTying(),
            TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                            Tdp(0.0, 2.0, float("inf"), 4.0)))
        tree = MinimizedTreeBuilder(am, across_word=True).build()
        assert len(tree.nodes) > 1
        ends = [w for nd in tree.nodes for w in nd.word_ends]
        assert any(not c for (_l, _p, _g, c) in ends)
