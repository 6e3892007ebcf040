"""Lattice-based MMI / MPE sequence training: error signals verified
against finite differences of the exactly-enumerated criteria."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rasr_tpu.lattice.word_lattice import WordLattice
from rasr_tpu.nn.sequence_training import (expectation_posteriors,
                                           frame_accuracies,
                                           minimum_error_signal,
                                           mmi_error_signal, occupancies,
                                           povey_arc_accuracies,
                                           surrogate_loss)

T, S = 6, 4
AM, LM = 0.7, 1.3  # deliberately non-unit scales


def build_den(lp):
    """Two-word lattice: frames [0,3) word A or B, frames [3,6) word C
    or D, with per-arc alignments (emission class per frame)."""
    lat = WordLattice()
    s0 = lat.add_state(0)
    s1 = lat.add_state(3)
    s2 = lat.add_state(6)
    aligns = {}
    arcs = [
        (s0, s1, 1, [0, 0, 1], 0.2),   # A
        (s0, s1, 2, [2, 2, 2], 0.4),   # B
        (s1, s2, 3, [3, 3, 1], 0.1),   # C
        (s1, s2, 4, [1, 2, 3], 0.3),   # D
    ]
    for src, dst, word, states, lm in arcs:
        t0 = lat.boundaries[src]
        am = -sum(float(lp[t0 + dt, c]) for dt, c in enumerate(states))
        i = len(lat.arcs[src])
        lat.add_arc(src, dst, word, am_score=am, lm_score=lm)
        aligns[(src, i)] = states
    lat.set_final(s2, 0.15)
    return lat, aligns, arcs


def build_num(lp):
    lat = WordLattice()
    s0 = lat.add_state(0)
    s1 = lat.add_state(3)
    s2 = lat.add_state(6)
    states1, states2 = [0, 0, 1], [3, 3, 1]
    am1 = -sum(float(lp[dt, c]) for dt, c in enumerate(states1))
    am2 = -sum(float(lp[3 + dt, c]) for dt, c in enumerate(states2))
    lat.add_arc(s0, s1, 1, am_score=am1, lm_score=0.2)
    lat.add_arc(s1, s2, 3, am_score=am2, lm_score=0.1)
    lat.set_final(s2, 0.15)
    return lat, {(s0, 0): states1, (s1, 0): states2}


def enumerate_paths(lp):
    """All 4 den paths: (cost, acc helper data)."""
    _, _, arcs = build_den(lp)
    paths = []
    for first in (0, 1):
        for second in (2, 3):
            cost = 0.15  # final weight
            states = []
            words = []
            for idx in (first, second):
                src, dst, word, st, lm = arcs[idx]
                am = -sum(float(lp[(0 if idx < 2 else 3) + dt, c])
                          for dt, c in enumerate(st))
                cost += AM * am + LM * lm
                states += st
                words.append((idx, word))
            paths.append((cost, states, (first, second)))
    return paths


def logZ_den(lp):
    costs = [c for c, _, _ in enumerate_paths(lp)]
    return -math.log(sum(math.exp(-c) for c in costs))  # -ln Z


def logZ_num(lp):
    cost = (AM * (-sum(float(lp[dt, c])
                       for dt, c in enumerate([0, 0, 1]))
                  - sum(float(lp[3 + dt, c])
                        for dt, c in enumerate([3, 3, 1])))
            + LM * (0.2 + 0.1) + 0.15)
    return cost


@pytest.fixture()
def lp():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((T, S))
    # float64 so the finite-difference step is not quantized away
    x = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    return x.astype(np.float64)


class TestOccupancies:
    def test_gamma_matches_enumeration(self, lp):
        lat, aligns, _ = build_den(lp)
        gamma, total = occupancies(lat, aligns, T, S, AM, LM)
        paths = enumerate_paths(lp)
        Z = sum(math.exp(-c) for c, _, _ in paths)
        assert abs(total - (-math.log(Z))) < 1e-9
        want = np.zeros((T, S))
        for c, states, _ in paths:
            p = math.exp(-c) / Z
            for t, cls in enumerate(states):
                want[t, cls] += p
        np.testing.assert_allclose(gamma, want, atol=1e-10)


class TestMmi:
    def test_error_is_fd_gradient(self, lp):
        def neg_F(x):
            # -F = -(ln p_num - ln p_den) = (-ln num) - (-ln den)
            return logZ_num(x) - logZ_den(x)

        lat_d, al_d, _ = build_den(lp)
        lat_n, al_n = build_num(lp)
        sig = mmi_error_signal(lat_d, al_d, lat_n, al_n, T, S, AM, LM)
        assert abs(sig.objective - (logZ_den(lp) - logZ_num(lp))) < 1e-9
        eps = 1e-6
        for t in range(T):
            for s in range(S):
                x1, x2 = lp.copy(), lp.copy()
                x1[t, s] += eps
                x2[t, s] -= eps
                fd = (neg_F(x1) - neg_F(x2)) / (2 * eps)
                assert abs(sig.error[t, s] - fd) < 1e-5, (t, s)

    def test_frame_rejection(self, lp):
        lat_d, al_d, _ = build_den(lp)
        lat_n, al_n = build_num(lp)
        sig = mmi_error_signal(lat_d, al_d, lat_n, al_n, T, S, AM, LM,
                               frame_rejection_threshold=2.0,  # > any gamma
                               numerator_alignment=[0, 0, 1, 3, 3, 1])
        assert sig.n_rejected == T
        assert sig.weights.sum() == 0


class TestMinimumError:
    def test_expected_accuracy_matches_enumeration(self, lp):
        lat, aligns, arcs = build_den(lp)
        ref_align = [0, 0, 1, 3, 3, 1]
        accs = frame_accuracies(ref_align, lat, aligns)
        _, c_avg = expectation_posteriors(lat, accs, AM, LM)
        paths = enumerate_paths(lp)
        Z = sum(math.exp(-c) for c, _, _ in paths)
        want = sum(math.exp(-c) / Z
                   * sum(1.0 for t, cls in enumerate(states)
                         if ref_align[t] == cls)
                   for c, states, _ in paths)
        assert abs(c_avg - want) < 1e-9

    def test_error_is_fd_gradient(self, lp):
        lat, aligns, _ = build_den(lp)
        ref_align = [0, 0, 1, 3, 3, 1]

        def neg_C(x):
            lat2, al2, _ = build_den(x)
            accs = frame_accuracies(ref_align, lat2, al2)
            _, c = expectation_posteriors(lat2, accs, AM, LM)
            return -c

        accs = frame_accuracies(ref_align, lat, aligns)
        sig = minimum_error_signal(lat, aligns, accs, T, S, AM, LM)
        eps = 1e-6
        for t in range(T):
            for s in range(S):
                x1, x2 = lp.copy(), lp.copy()
                x1[t, s] += eps
                x2[t, s] -= eps
                fd = (neg_C(x1) - neg_C(x2)) / (2 * eps)
                assert abs(sig.error[t, s] - fd) < 1e-5, (t, s)

    def test_povey_accuracies(self, lp):
        lat, _, _ = build_den(lp)
        ref = [(1, 0, 3), (3, 3, 6)]  # words A then C with spans
        accs = povey_arc_accuracies(lat, ref)
        assert abs(accs[(0, 0)] - 1.0) < 1e-9   # exact match word 1
        assert abs(accs[(0, 1)] - 0.0) < 1e-9   # full overlap, wrong word
        assert abs(accs[(1, 0)] - 1.0) < 1e-9   # exact match word 3


class TestSurrogate:
    def test_gradient_equals_signal(self, lp):
        lat_d, al_d, _ = build_den(lp)
        lat_n, al_n = build_num(lp)
        sig = mmi_error_signal(lat_d, al_d, lat_n, al_n, T, S, AM, LM)
        logits = jnp.asarray(np.random.default_rng(1)
                             .standard_normal((T, S)).astype(np.float32))

        def loss(z):
            return surrogate_loss(jax.nn.log_softmax(z, -1), sig.error,
                                  sig.weights)

        g = jax.grad(loss)(logits)
        # chain rule through log_softmax: g = E - softmax * sum(E, -1)
        lsm = jax.nn.log_softmax(logits, -1)
        E = jnp.asarray(sig.error, jnp.float32)
        want = E - jnp.exp(lsm) * jnp.sum(E, -1, keepdims=True)
        np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                   atol=1e-5)


class TestE2eMmiPipeline:
    """Full lattice-based MMI pipeline: hybrid NN emissions -> word-
    conditioned decoding -> time-stamped denominator lattice -> per-arc
    forced alignments -> MMI error signal -> surrogate-loss gradient
    steps increase the MMI objective."""

    def setup_am(self, tmp_path):
        import textwrap
        from rasr_tpu.am.acoustic_model import (AcousticModel, HmmTopology,
                                                MonophoneStateTying, Tdp,
                                                TransitionModel)
        from rasr_tpu.am.allophone import AllophoneAlphabet
        from rasr_tpu.bliss.lexicon import Lexicon
        p = tmp_path / "lex.xml"
        p.write_text(textwrap.dedent("""\
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
        """))
        lex = Lexicon()
        lex.load(str(p))
        return AcousticModel(
            lex, AllophoneAlphabet(lex.phoneme_inventory, 1),
            HmmTopology(3, 1, 1), MonophoneStateTying(3, 3),
            TransitionModel(Tdp(2.0, 0.0, 20.0, 0.0),
                            Tdp(0.0, 2.0, float("inf"), 4.0)))

    def arc_alignment(self, am, lat, scores_np):
        """Forced per-arc alignments over each arc's frame span."""
        from rasr_tpu.search.aligner import Aligner
        from rasr_tpu.speech.allophone_graph import StateGraphBuilder
        builder = StateGraphBuilder(am, silence_at_boundaries=False,
                                    silence_between_words=False)
        aligns = {}
        for s in range(lat.n_states):
            for i, arc in enumerate(lat.arcs[s]):
                t0, t1 = lat.boundaries[s], lat.boundaries[arc.target]
                if t1 <= t0:
                    continue
                orth = lat.words[arc.word]
                if am.lexicon.lemmas[arc.word].special:
                    aligns[(s, i)] = [6] * (t1 - t0)  # silence class
                    continue
                g = builder.build(orth)
                _, _, _ = 0, 0, 0
                path, _, _tot = Aligner(g).align(scores_np[t0:t1])
                aligns[(s, i)] = list(np.asarray(g.emissions)[path])
        return aligns

    def test_mmi_improves_objective(self, tmp_path):
        import optax
        from rasr_tpu.nn.sequence_training import (mmi_error_signal,
                                                   surrogate_loss)
        from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
        from rasr_tpu.search.linear import LinearSearch
        from rasr_tpu.lattice.word_lattice import WordLattice
        am = self.setup_am(tmp_path)
        S, D, T = 9, 4, 12
        rng = np.random.default_rng(0)
        class_means = rng.standard_normal((7, D)) * 3.0
        truth_classes = [0, 1, 2, 3, 4, 5, 3, 4, 5, 0, 1, 2]  # AB BA
        feats = np.stack([class_means[c % 7]
                          + 0.4 * rng.standard_normal(D)
                          for c in truth_classes]).astype(np.float32)

        # tiny hybrid NN emission model
        w = jnp.asarray(0.1 * rng.standard_normal((D, S)), jnp.float32)
        b = jnp.zeros((S,), jnp.float32)

        def log_post(params, x):
            return jax.nn.log_softmax(x @ params["w"] + params["b"], -1)

        params = {"w": w, "b": b}

        def emission_scores(params):
            return -np.asarray(log_post(params, jnp.asarray(feats)))

        scores = emission_scores(params)
        # denominator: decode + lattice
        search = WordConditionedTreeSearch(am, beam_size=128)
        search.recognize(scores)
        den_lat = search.create_lattice()
        den_al = self.arc_alignment(am, den_lat, scores)
        # numerator: forced alignment of the truth
        lin = LinearSearch(am, silence_between_words=False)
        bounds, path, _ = lin.recognize("AB BA", scores)
        g = lin.builder.build("AB BA")
        num_align = list(np.asarray(g.emissions)[path])
        num_lat = WordLattice(words=dict(den_lat.words))
        s0 = num_lat.add_state(0)
        s1 = num_lat.add_state(T)
        am_num = float(sum(scores[t, c] for t, c in enumerate(num_align)))
        ab = am.lexicon.lemma_by_orth("AB").id
        num_lat.add_arc(s0, s1, ab, am_score=am_num, lm_score=0.0)
        num_lat.set_final(s1)
        num_al = {(s0, 0): num_align}

        def signal(params):
            sc = emission_scores(params)
            # recompute lattice arc am scores from the (fixed) alignments
            def rescored(lat, aligns):
                out = WordLattice(words=dict(lat.words or {}))
                for s in range(lat.n_states):
                    out.add_state(lat.boundaries[s])
                out.initial = lat.initial
                for s in range(lat.n_states):
                    for i, arc in enumerate(lat.arcs[s]):
                        states = aligns.get((s, i), [])
                        t0 = lat.boundaries[s]
                        am_s = float(sum(sc[t0 + dt, c]
                                         for dt, c in enumerate(states)))
                        out.add_arc(s, arc.target, arc.word, am_s,
                                    arc.lm_score)
                out.final = dict(lat.final)
                return out
            dl = rescored(den_lat, den_al)
            nl = rescored(num_lat, num_al)
            return mmi_error_signal(dl, den_al, nl, num_al, T, S)

        sig0 = signal(params)
        opt = optax.adam(0.1)
        opt_state = opt.init(params)

        for _ in range(8):
            sig = signal(params)

            def loss(p):
                return surrogate_loss(log_post(p, jnp.asarray(feats)),
                                      sig.error, sig.weights)

            grads = jax.grad(loss)(params)
            updates, opt_state = opt.update(grads, opt_state)
            params = optax.apply_updates(params, updates)

        sig1 = signal(params)
        # MMI objective = ln p(num)/p(den) must increase
        assert sig1.objective > sig0.objective + 0.1, \
            (sig0.objective, sig1.objective)
