"""Full-sum sequence training tests: the loss equals the aligner's
Baum-Welch total, gradients flow, and training a small network with the
full-sum criterion learns frame classification without frame labels."""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                        MonophoneStateTying, Tdp,
                                        TransitionModel)
from rasr_tpu.am.allophone import AllophoneAlphabet
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.nn.full_sum import full_sum_loss, pad_graphs
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

N_CLASSES = 9
DIM = 6


@pytest.fixture
def am(tmp_path):
    p = tmp_path / "lex.xml"
    p.write_text(LEXICON_XML)
    lex = Lexicon()
    lex.load(str(p))
    return AcousticModel(
        lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
        HmmTopology(3, 1, 1), MonophoneStateTying(3, 3),
        # silence loops cost: otherwise full-sum training collapses into
        # the all-silence alignment (the classic flat-start degeneracy)
        TransitionModel(Tdp(2.0, 0.0, float("inf"), 0.0),
                        Tdp(3.0, 2.0, float("inf"), 2.0)))


class TestFullSumLoss:
    def test_matches_aligner_total(self, am):
        rng = np.random.default_rng(0)
        builder = StateGraphBuilder(am)
        g = builder.build("AB")
        T = 18
        log_post = np.log(rng.dirichlet(np.ones(N_CLASSES), size=T)
                          ).astype(np.float32)
        pred, ps, em, ini, fin = pad_graphs([g])
        loss = full_sum_loss(jnp.asarray(log_post)[None],
                             jnp.asarray([T]), pred, ps, em, ini, fin)
        _, total = Aligner(g).posteriors(-log_post)
        np.testing.assert_allclose(float(loss[0]), total, atol=1e-3)

    def test_gradients_finite(self, am):
        rng = np.random.default_rng(1)
        builder = StateGraphBuilder(am)
        graphs = [builder.build("AB"), builder.build("BA")]
        pred, ps, em, ini, fin = pad_graphs(graphs)
        T = 18
        lp = np.log(rng.dirichlet(np.ones(N_CLASSES), size=(2, T))
                    ).astype(np.float32)

        def loss_fn(x):
            return jnp.mean(full_sum_loss(
                jax.nn.log_softmax(x, -1), jnp.asarray([T, T]),
                pred, ps, em, ini, fin))

        g = jax.grad(loss_fn)(jnp.asarray(lp))
        assert np.isfinite(np.asarray(g)).all()

    def test_full_sum_training_learns_classes(self, am):
        """Train a linear classifier with ONLY orthography supervision:
        full-sum over the 'AB'/'BA' graphs; afterwards Viterbi alignment
        recovers the true class segmentation."""
        rng = np.random.default_rng(2)
        class_means = rng.standard_normal((7, DIM)) * 3.0
        builder = StateGraphBuilder(am)
        # synthetic utterances: sil a0 a1 a2 b0 b1 b2 sil / reverse order
        seqs = {
            "AB": [6, 0, 1, 2, 3, 4, 5, 6],
            "BA": [6, 3, 4, 5, 0, 1, 2, 6],
        }
        frames_per = 3
        utts, graphs, true_paths = [], [], []
        for orth, classes in seqs.items():
            feats = np.concatenate([
                class_means[c] + 0.2 * rng.standard_normal((frames_per, DIM))
                for c in classes]).astype(np.float32)
            utts.append(feats)
            graphs.append(builder.build(orth))
            true_paths.append(np.repeat(classes, frames_per))
        feats = np.stack(utts)
        T = feats.shape[1]
        pred, ps, em, ini, fin = pad_graphs(graphs)

        W = jnp.zeros((DIM, N_CLASSES))
        b = jnp.zeros((N_CLASSES,))
        opt = optax.adam(0.1)
        opt_state = opt.init((W, b))

        @jax.jit
        def step(params, opt_state):
            def loss_fn(p):
                W, b = p
                logits = feats @ W + b
                return jnp.mean(full_sum_loss(
                    jax.nn.log_softmax(logits, -1),
                    jnp.asarray([T, T]), pred, ps, em, ini, fin))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, new_opt = opt.update(grads, opt_state)
            return optax.apply_updates(params, updates), new_opt, loss

        params = (W, b)
        losses = []
        for _ in range(150):
            params, opt_state, loss = step(params, opt_state)
            losses.append(float(loss))
        assert losses[-1] < losses[0] - 1.0, losses[-5:]

        # Viterbi alignment with the trained classifier ~ true segmentation
        # (scored on non-silence frames; boundary frames may shift)
        W, b = params
        logits = np.asarray(feats @ W + b)
        log_post = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), -1))
        correct = total = 0
        for i, g in enumerate(graphs):
            path, _, _ = Aligner(g).align(-log_post[i])
            em_path = np.asarray(g.emissions)[path]
            mask = true_paths[i] != 6
            correct += (em_path[mask] == true_paths[i][mask]).sum()
            total += mask.sum()
        assert correct / total > 0.6, f"alignment accuracy {correct/total}"
