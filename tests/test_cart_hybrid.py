"""CART-tied triphone hybrid pipeline at test scale: coarticulated
rendering -> allophone-state accumulation -> CART -> tied-label AM
training -> across-word decode (the round-5 HYBRID_BENCH composition;
reference src/Am/ClassicStateTying.hh:223 + AdvancedTreeSearch)."""

import dataclasses

import numpy as np
import pytest

from rasr_tpu.am.acoustic_model import CartStateTying
from rasr_tpu.cart.decision_tree import (DecisionTreeTrainer, Example,
                                         phonetic_questions)
from rasr_tpu.data.synth_hybrid import HybridSynthTask
from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch


@pytest.fixture(scope="module")
def task():
    return HybridSynthTask(n_words=30, n_phonemes=8, branching=5,
                           coarticulation=0.4, min_pron=3, max_pron=5)


def accumulate_cart(task, n_utts=48, dim=13):
    """Allophone-state Gaussian stats over cheap spectral features
    (host-computed log-mel-ish frames are overkill at test scale: use
    windowed FFT magnitudes)."""
    index, keys = {}, []

    def intern(c, l, r, s, _b):
        k = (c, l, r, s)
        if k not in index:
            index[k] = len(keys)
            keys.append(k)
        return index[k]

    task.label_fn = intern
    counts = sx = sx2 = None
    for i in range(n_utts):
        rng = np.random.default_rng(50_000 + i)
        audio, _orth, lab = task.utterance(rng, 3, 5)
        t = len(lab)
        frames = audio[:t * task.frame_samples].reshape(t, -1)
        spec = np.abs(np.fft.rfft(frames, axis=1))[:, 1:dim + 1]
        feats = np.log1p(spec)
        n = len(keys)
        if counts is None or n > len(counts):
            grow = lambda a, w: np.concatenate(
                [a, np.zeros((n - len(a),) + a.shape[1:])]) \
                if a is not None else np.zeros((n,) + w)
            counts = grow(counts, ())
            sx = grow(sx, (dim,))
            sx2 = grow(sx2, (dim,))
        ids = np.asarray(lab, np.int64)
        counts += np.bincount(ids, minlength=n)
        for d in range(dim):
            sx[:, d] += np.bincount(ids, weights=feats[:, d],
                                    minlength=n)
            sx2[:, d] += np.bincount(ids, weights=feats[:, d] ** 2,
                                     minlength=n)
    task.label_fn = None
    inv = task.am.lexicon.phoneme_inventory

    def sym(pid):
        return inv.by_id(pid).symbol if pid else "#"

    examples = [Example(
        properties={"central": sym(c), "history[0]": sym(l),
                    "future[0]": sym(r), "state": s},
        count=float(counts[i]), sum_x=sx[i], sum_x2=sx2[i])
        for i, (c, l, r, s) in enumerate(keys)]
    symbols = [inv.by_id(i).symbol for i in range(1, len(inv) + 1)]
    return examples, phonetic_questions(symbols)


class TestCartHybridPipeline:
    def test_cart_ties_and_across_word_decodes(self, task):
        examples, questions = accumulate_cart(task)
        trainer = DecisionTreeTrainer(questions, min_examples=20,
                                      max_leaves=40)
        tree = trainer.train(examples)
        assert 25 <= tree.n_classes <= 40
        tying = CartStateTying(tree, task.am.alphabet)
        am = dataclasses.replace(task.am, state_tying=tying)
        # silence must have its own class, distinct from speech
        sil = tying.emission_index(
            __import__("rasr_tpu.am.allophone", fromlist=["Allophone"]
                       ).Allophone(task.sil_lex_id, 0, 0, 3), 0)
        table = tying._table
        speech_classes = set(
            int(x) for x in table[1:task.n_phonemes + 1].ravel())
        assert sil not in speech_classes or len(speech_classes) > 1

        # across-word tree over the tied inventory builds and decodes
        # ORACLE emissions (true tied class cheap per frame)
        search = WordConditionedTreeSearch(
            am, lm=None, beam_size=512, across_word=True)
        table = tying._table
        task.label_fn = lambda c, l, r, s, b: int(table[c, l, r, s,
                                                        b & 3])
        rng = np.random.default_rng(123)
        _audio, orth, lab = task.utterance(rng, 3, 4)
        task.label_fn = None
        T = len(lab)
        scores = np.full((T, tree.n_classes), 8.0)
        scores[np.arange(T), np.asarray(lab)] = 0.5
        hyp = search.recognize(scores)
        assert hyp == orth.split(), (hyp, orth)
