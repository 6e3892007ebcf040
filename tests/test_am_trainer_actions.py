"""Round-3 acoustic-model-trainer action parity: every action the
reference registers (src/Tools/AcousticModelTrainer/AcousticModelTrainer.cc:67-98)
runs from a .config, wired onto the existing library code."""

import os
import pickle
import textwrap

import numpy as np
import pytest

from rasr_tpu.mm.mixture_set import MixtureSet
from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.tools.acoustic_model_trainer import main as amt_main

pytestmark = pytest.mark.fast

LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
        <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
      </phoneme-inventory>
      <lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon></lemma>
      <lemma><orth>AB</orth><phon>a b</phon></lemma>
    </lexicon>
""")

DIM = 4
N_CLASSES = 9
N_USED = 7


@pytest.fixture
def setup(tmp_path):
    """Corpus + features + a trained mixture set + alignment cache."""
    rng = np.random.default_rng(0)
    class_means = rng.standard_normal((N_USED, DIM)) * 4.0
    lex = tmp_path / "lex.xml"
    lex.write_text(LEXICON_XML)
    corpus_lines = ['<corpus name="c">',
                    '<recording name="r" audio="x.wav">']
    with FeatureCacheWriter(str(tmp_path / "features.cache")) as cache:
        for i in range(4):
            frames = []
            for cls, reps in [(6, 4), (0, 6), (1, 6), (2, 6),
                              (3, 6), (4, 6), (5, 6), (6, 4)]:
                frames.append(class_means[cls]
                              + 0.3 * rng.standard_normal((reps, DIM)))
            cache.write(f"c/r/s{i}",
                        np.concatenate(frames).astype(np.float32))
            corpus_lines.append(
                f'<segment name="s{i}" start="{i}" end="{i + 1}">'
                f'<orth>AB</orth></segment>')
    corpus_lines += ["</recording>", "</corpus>"]
    (tmp_path / "corpus.xml").write_text("\n".join(corpus_lines))
    config = tmp_path / "amt.config"
    config.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/corpus.xml
        [*.lexicon]
        file = {lex}
        [*.feature-cache]
        path = {tmp_path}/features.cache
        [*.acoustic-model.state-tying]
        type = monophone
        [*.acoustic-model.tdp.*]
        loop = 3.0
        forward = 0.0
        skip = infinity
        exit = 0.0
        [*.acoustic-model.tdp.silence]
        loop = 0.0
        forward = 3.0
        skip = infinity
        exit = 6.0
    """))
    # train a model: flat-start accumulate + estimate
    amt_main([f"--config={config}",
              "--*.action=accumulate-mixture-set-text-dependent",
              f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/a.acc"])
    amt_main([f"--config={config}", "--*.action=estimate-mixture-set",
              f"--*.mixture-set-trainer.accumulator-file={tmp_path}/a.acc",
              f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/m.pms"])
    return tmp_path, config


def run(config, action, **kv):
    args = [f"--config={config}", f"--*.action={action}"]
    args += [f"--*.mixture-set-trainer.{k.replace('_', '-')}={v}"
             for k, v in kv.items()]
    return amt_main(args)


class TestScoreAndScatter:
    def test_score_features(self, setup):
        tmp_path, config = setup
        out = tmp_path / "scores.txt"
        assert run(config, "score-features",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   score_file=out) == 0
        lines = out.read_text().splitlines()
        assert len(lines) == 1          # one corpus key (recording c/r)
        key, avg, n = lines[0].split("\t")
        assert key == "c/r" and float(n) > 0 and np.isfinite(float(avg))

    def test_scatter_lda_pipeline(self, setup):
        tmp_path, config = setup
        assert run(config, "estimate-scatter-matrices-text-dependent",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   scatter_matrix_accumulator_file=f"{tmp_path}/s1.acc") == 0
        assert run(config, "combine-scatter-matrix-accumulators",
                   scatter_matrix_accumulator_files=f"{tmp_path}/s1.acc "
                                                    f"{tmp_path}/s1.acc",
                   scatter_matrix_accumulator_file=f"{tmp_path}/s.acc") == 0
        assert run(config, "estimate-scatter-matrices-from-accumulator",
                   scatter_matrix_accumulator_file=f"{tmp_path}/s.acc",
                   within_class_scatter_matrix_file=f"{tmp_path}/sw.xml",
                   between_class_scatter_matrix_file=f"{tmp_path}/sb.xml"
                   ) == 0
        from rasr_tpu.math.matrix_io import read_matrix
        sw = read_matrix(f"{tmp_path}/sw.xml")
        sb = read_matrix(f"{tmp_path}/sb.xml")
        assert sw.shape == (DIM, DIM) and sb.shape == (DIM, DIM)
        # doubling every count must not change the scatter matrices
        assert run(config, "estimate-lda",
                   scatter_matrix_accumulator_file=f"{tmp_path}/s.acc",
                   number_of_outputs=2,
                   projector_matrix_file=f"{tmp_path}/lda.mat") == 0
        proj = read_matrix(f"{tmp_path}/lda.mat")
        assert proj.shape == (2, DIM)

    def test_estimate_lda_one_shot(self, setup):
        tmp_path, config = setup
        assert run(config, "estimate-lda-text-dependent",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   number_of_outputs=3,
                   projector_matrix_file=f"{tmp_path}/lda2.mat") == 0
        from rasr_tpu.math.matrix_io import read_matrix
        assert read_matrix(f"{tmp_path}/lda2.mat").shape == (3, DIM)

    def test_scatter_text_independent(self, setup):
        tmp_path, config = setup
        assert run(config, "estimate-scatter-matrices-text-independent",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   scatter_matrix_accumulator_file=f"{tmp_path}/ti.acc") == 0
        from rasr_tpu.speech.lda import ScatterAccumulator
        acc = ScatterAccumulator.read(f"{tmp_path}/ti.acc")
        assert acc.n_classes == 1


class TestAdaptation:
    def test_cmllr_pipeline(self, setup):
        tmp_path, config = setup
        assert run(config, "estimate-affine-feature-transform",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   affine_transform_accumulator_file=f"{tmp_path}/c.npz"
                   ) == 0
        assert run(config, "combine-affine-feature-transform-estimators",
                   affine_transform_accumulator_files=f"{tmp_path}/c.npz "
                                                      f"{tmp_path}/c.npz",
                   affine_transform_accumulator_file=f"{tmp_path}/cc.npz"
                   ) == 0
        assert run(config, "calculate-affine-feature-transform",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   affine_transform_accumulator_file=f"{tmp_path}/cc.npz",
                   affine_transform_file=f"{tmp_path}/cmllr.npz") == 0
        z = np.load(f"{tmp_path}/cmllr.npz")
        assert len(z.files) == 1
        W = z[z.files[0]]
        assert W.shape == (DIM, DIM + 1)
        assert run(config, "score-affine-feature-transform",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   affine_transform_file=f"{tmp_path}/cmllr.npz") == 0

    def test_band_mllr_pipeline(self, setup):
        tmp_path, config = setup
        assert run(config, "estimate-adaptation",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   adaptation_accumulator_file=f"{tmp_path}/m.npz") == 0
        assert run(config, "calculate-band-adaptation",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   adaptation_accumulator_file=f"{tmp_path}/m.npz",
                   adaptation_file=f"{tmp_path}/band.npz",
                   mllr_bands=1, min_observations=10) == 0
        z = np.load(f"{tmp_path}/band.npz")
        W = z[z.files[0]]
        assert W.shape == (DIM, DIM + 1)
        # band structure: zero outside bias + tri-diagonal band
        for d in range(DIM):
            for j in range(DIM):
                if abs(j - d) > 1:
                    assert W[d, j + 1] == 0.0

    def test_semi_tied_pipeline(self, setup):
        tmp_path, config = setup
        assert run(config, "estimate-semi-tied",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   adaptation_accumulator_file=f"{tmp_path}/st.npz") == 0
        assert run(config, "calculate-semi-tied",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   adaptation_accumulator_file=f"{tmp_path}/st.npz",
                   adaptation_file=f"{tmp_path}/semitied.npz",
                   min_observations=10) == 0
        z = np.load(f"{tmp_path}/semitied.npz")
        a_keys = [k for k in z.files if k.endswith("::A")]
        assert a_keys
        A = z[a_keys[0]]
        assert A.shape == (DIM, DIM)
        assert np.linalg.det(A) != 0

    def test_mllr_pipeline(self, setup):
        tmp_path, config = setup
        assert run(config, "estimate-adaptation",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   adaptation_accumulator_file=f"{tmp_path}/m.npz") == 0
        assert run(config, "calculate-adaptation",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   adaptation_accumulator_file=f"{tmp_path}/m.npz",
                   adaptation_file=f"{tmp_path}/mllr.npz") == 0
        z = np.load(f"{tmp_path}/mllr.npz")
        W = z[z.files[0]]
        assert W.shape == (DIM, DIM + 1)


class TestMixtureSetOps:
    def test_convert_roundtrip(self, setup):
        tmp_path, config = setup
        assert run(config, "convert-mixture-set",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   new_mixture_set_file=f"{tmp_path}/m.mix",
                   format="legacy") == 0
        assert run(config, "convert-mixture-set",
                   old_mixture_set_file=f"{tmp_path}/m.mix",
                   new_mixture_set_file=f"{tmp_path}/m2.pms",
                   format="pms") == 0
        a = MixtureSet.read_pms(f"{tmp_path}/m.pms")
        b = MixtureSet.read_pms(f"{tmp_path}/m2.pms")
        np.testing.assert_allclose(b.packed()[0], a.packed()[0], atol=1e-8)
        np.testing.assert_allclose(b.packed()[1], a.packed()[1], atol=1e-6)

    def test_convert_to_estimator_and_back(self, setup):
        tmp_path, config = setup
        assert run(config, "convert-mixture-set-to-mixture-set-estimator",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   new_accumulator_file=f"{tmp_path}/conv.acc") == 0
        assert run(config, "estimate-mixture-set",
                   accumulator_file=f"{tmp_path}/conv.acc",
                   new_mixture_set_file=f"{tmp_path}/back.pms",
                   minimum_observation_weight=0.0) == 0
        a = MixtureSet.read_pms(f"{tmp_path}/m.pms")
        b = MixtureSet.read_pms(f"{tmp_path}/back.pms")
        np.testing.assert_allclose(b.packed()[0], a.packed()[0], atol=1e-8)

    def test_combine_mixture_sets(self, setup):
        tmp_path, config = setup
        assert run(config, "combine-mixture-sets",
                   mixture_set_files=f"{tmp_path}/m.pms {tmp_path}/m.pms",
                   new_mixture_set_file=f"{tmp_path}/comb.pms") == 0
        a = MixtureSet.read_pms(f"{tmp_path}/m.pms")
        b = MixtureSet.read_pms(f"{tmp_path}/comb.pms")
        # combining a set with itself reproduces the means
        np.testing.assert_allclose(b.packed()[0], a.packed()[0], atol=1e-8)

    def test_map_mixture_set(self, setup):
        tmp_path, config = setup
        mapping = tmp_path / "map.txt"
        # new mixture i <- old mixture (reversal)
        mapping.write_text("\n".join(str(N_CLASSES - 1 - i)
                                     for i in range(N_CLASSES)))
        assert run(config, "map-mixture-set",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   mapping_file=mapping,
                   new_mixture_set_file=f"{tmp_path}/mapped.pms") == 0
        a = MixtureSet.read_pms(f"{tmp_path}/m.pms")
        b = MixtureSet.read_pms(f"{tmp_path}/mapped.pms")
        assert b.mixtures[0].density_indices == \
            a.mixtures[N_CLASSES - 1].density_indices


class TestTdcAndCartAndAcceptors:
    def test_tdc_sum(self, setup):
        tmp_path, config = setup
        assert run(config, "accumulate-tdc-sum",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   tdc_sum_file=f"{tmp_path}/t1.sum") == 0
        assert run(config, "combine-tdc-sum",
                   tdc_sum_files=f"{tmp_path}/t1.sum {tmp_path}/t1.sum",
                   tdc_sum_file=f"{tmp_path}/t.sum") == 0
        text = (tmp_path / "t.sum").read_text()
        assert "loop=" in text and "forward=" in text
        # combined counts are twice the single-pass counts
        one = dict(l.split("\t", 1) for l in
                   (tmp_path / "t1.sum").read_text().splitlines())
        two = dict(l.split("\t", 1) for l in text.splitlines())
        v1 = int(one["speech"].split("\t")[0].split("=")[1])
        v2 = int(two["speech"].split("\t")[0].split("=")[1])
        assert v2 == 2 * v1

    def test_merge_cart_examples(self, setup):
        tmp_path, config = setup
        assert run(config, "accumulate-cart-examples",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   cart_example_file=f"{tmp_path}/e1.pkl") == 0
        assert run(config, "merge-cart-examples",
                   cart_example_files=f"{tmp_path}/e1.pkl {tmp_path}/e1.pkl",
                   cart_example_file=f"{tmp_path}/merged.pkl") == 0
        with open(f"{tmp_path}/e1.pkl", "rb") as fh:
            one = pickle.load(fh)
        with open(f"{tmp_path}/merged.pkl", "rb") as fh:
            merged = pickle.load(fh)
        assert set(merged) == set(one)
        k = next(iter(one))
        assert merged[k][0] == 2 * one[k][0]

    def test_create_model_acceptors(self, setup):
        tmp_path, config = setup
        out = tmp_path / "acceptors"
        assert run(config, "create-model-acceptors",
                   model_acceptor_archive=out) == 0
        files = os.listdir(out)
        assert len(files) == 4
        text = (out / files[0]).read_text()
        assert len(text.splitlines()) > 3

    def test_dry(self, setup):
        _tmp_path, config = setup
        assert run(config, "dry") == 0

    def test_unknown_action_fails(self, setup):
        _tmp_path, config = setup
        assert run(config, "no-such-action") != 0


class TestAlignmentCacheDriven:
    def test_actions_consume_alignment_cache(self, setup):
        """The aligned-frame iterator prefers a configured alignment
        cache over re-alignment (reference cached-alignment training)."""
        tmp_path, config = setup
        assert run(config, "dump-alignment",
                   old_mixture_set_file=f"{tmp_path}/m.pms",
                   alignment_cache=f"{tmp_path}/ali.cache") == 0
        assert run(config, "estimate-scatter-matrices-text-dependent",
                   alignment_cache=f"{tmp_path}/ali.cache",
                   scatter_matrix_accumulator_file=f"{tmp_path}/sc.acc"
                   ) == 0
        from rasr_tpu.speech.lda import ScatterAccumulator
        acc = ScatterAccumulator.read(f"{tmp_path}/sc.acc")
        assert acc.count.sum() > 0
