"""nn-trainer + feature-statistics + LDA tests."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.speech.lda import ScatterAccumulator, estimate_lda
from rasr_tpu.tools.feature_statistics import main as fs_main
from rasr_tpu.tools.nn_trainer import main as nn_main


class TestLda:
    def test_lda_separates_classes(self):
        """Classes differ along one direction; LDA's top axis must align."""
        rng = np.random.default_rng(0)
        dim, n_classes = 6, 3
        direction = np.zeros(dim)
        direction[2] = 1.0
        acc = ScatterAccumulator.zeros(dim, n_classes)
        for c in range(n_classes):
            x = (c * 5.0) * direction + rng.standard_normal((500, dim))
            acc.accumulate(x, np.full(500, c))
        transform = estimate_lda(acc, 2)
        assert transform.shape == (2, dim)
        # top LDA direction dominated by dim 2
        top = np.abs(transform[0])
        assert np.argmax(top) == 2

    def test_combine(self):
        rng = np.random.default_rng(1)
        a = ScatterAccumulator.zeros(3, 2)
        b = ScatterAccumulator.zeros(3, 2)
        joint = ScatterAccumulator.zeros(3, 2)
        x = rng.standard_normal((100, 3))
        lab = rng.integers(0, 2, 100)
        a.accumulate(x[:50], lab[:50])
        b.accumulate(x[50:], lab[50:])
        joint.accumulate(x, lab)
        c = a.combine(b)
        np.testing.assert_allclose(c.sum_xxt, joint.sum_xxt, rtol=1e-12)
        np.testing.assert_allclose(c.count, joint.count)


@pytest.fixture
def corpus_with_features(tmp_path):
    rng = np.random.default_rng(2)
    vocab = tmp_path / "labels.txt"
    vocab.write_text("<blank>\nA\nB\nC\n")
    lines = ['<corpus name="c">', '<recording name="r" audio="x.wav">']
    with FeatureCacheWriter(str(tmp_path / "f.cache")) as cache:
        for i in range(4):
            feats = rng.standard_normal((40, 8)).astype(np.float32)
            cache.write(f"c/r/s{i}", feats)
            orth = ["A B", "B C", "A C", "C"][i]
            lines.append(f'<segment name="s{i}" start="{i}" end="{i + 1}">'
                         f'<orth>{orth}</orth></segment>')
    lines += ["</recording>", "</corpus>"]
    (tmp_path / "corpus.xml").write_text("\n".join(lines))
    cfg = tmp_path / "t.config"
    cfg.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/corpus.xml
        [*.lexicon]
        file = vocab-text:{vocab}
        [*.feature-cache]
        path = {tmp_path}/f.cache
        [*.model]
        d-model = 32
        n-layers = 1
        n-heads = 2
        dtype = float32
        [*.trainer]
        data-parallel = 2
        batch-size = 2
        epochs = 1
        learning-rate = 0.001
        warmup-steps = 10
        checkpoint = {tmp_path}/model.msgpack
    """))
    return tmp_path, cfg


class TestNnTrainerTool:
    def test_supervised_training_and_priors(self, corpus_with_features):
        tmp_path, cfg = corpus_with_features
        status = nn_main([f"--config={cfg}", "--*.action=supervised-training"])
        assert status == 0
        assert (tmp_path / "model.msgpack").exists()
        status = nn_main([f"--config={cfg}", "--*.action=compute-priors",
                          f"--*.trainer.prior-file={tmp_path}/priors.xml"])
        assert status == 0
        from rasr_tpu.math.matrix_io import read_vector
        priors = read_vector(f"xml:{tmp_path}/priors.xml")
        assert priors.shape == (4,)
        np.testing.assert_allclose(np.exp(priors).sum(), 1.0, atol=1e-3)


class TestFeatureStatisticsTool:
    def test_mean_variance(self, corpus_with_features):
        tmp_path, cfg = corpus_with_features
        status = fs_main([
            f"--config={cfg}", "--*.action=estimate-mean-and-variance",
            f"--*.statistics.mean-file={tmp_path}/mean.xml",
            f"--*.statistics.variance-file={tmp_path}/var.xml"])
        assert status == 0
        from rasr_tpu.math.matrix_io import read_vector
        mean = read_vector(f"xml:{tmp_path}/mean.xml")
        var = read_vector(f"xml:{tmp_path}/var.xml")
        assert mean.shape == (8,)
        assert np.all(var > 0)

    def test_covariance(self, corpus_with_features):
        tmp_path, cfg = corpus_with_features
        status = fs_main([
            f"--config={cfg}", "--*.action=estimate-covariance",
            f"--*.statistics.covariance-file={tmp_path}/cov.xml"])
        assert status == 0
        from rasr_tpu.math.matrix_io import read_matrix
        cov = read_matrix(f"xml:{tmp_path}/cov.xml")
        assert cov.shape == (8, 8)
        np.testing.assert_allclose(cov, cov.T, atol=1e-5)


class TestNnTrainerRound3Actions:
    """combine-statistics / priors-from-mixture-set / mean-std /
    show-statistics (reference src/Tools/NnTrainer/NnTrainer.cc:53-169)."""

    def test_combine_statistics(self, corpus_with_features):
        tmp_path, cfg = corpus_with_features
        nn_main([f"--config={cfg}", "--*.action=supervised-training"])
        # two partitioned prior-statistics passes
        for part in range(2):
            status = nn_main([
                f"--config={cfg}", "--*.action=compute-priors",
                "--*.corpus.partition=2",
                f"--*.corpus.select-partition={part}",
                f"--*.trainer.statistics-file={tmp_path}/p{part}.npz",
                f"--*.trainer.prior-file={tmp_path}/pp{part}.xml"])
            assert status == 0
        status = nn_main([
            f"--config={cfg}", "--*.action=combine-statistics",
            f"--*.trainer.statistics-files={tmp_path}/p0.npz {tmp_path}/p1.npz",
            f"--*.trainer.statistics-file={tmp_path}/all.npz",
            f"--*.trainer.prior-file={tmp_path}/priors2.xml"])
        assert status == 0
        # combined priors == single-job priors over the whole corpus
        status = nn_main([f"--config={cfg}", "--*.action=compute-priors",
                          f"--*.trainer.prior-file={tmp_path}/priors1.xml"])
        assert status == 0
        from rasr_tpu.math.matrix_io import read_vector
        a = read_vector(f"xml:{tmp_path}/priors1.xml")
        b = read_vector(f"xml:{tmp_path}/priors2.xml")
        np.testing.assert_allclose(b, a, atol=1e-5)
        status = nn_main([
            f"--config={cfg}", "--*.action=show-statistics",
            f"--*.trainer.statistics-file={tmp_path}/all.npz"])
        assert status == 0

    def test_log_prior_from_mixture_set(self, corpus_with_features, tmp_path):
        _t, cfg = corpus_with_features
        from rasr_tpu.mm.mixture_set import MixtureSet
        ms = MixtureSet.single_gaussian(np.zeros((3, 4)), np.ones((3, 4)))
        ms.write_pms(str(tmp_path / "m.pms"))
        status = nn_main([
            f"--config={cfg}", "--*.action=get-log-prior-from-mixture-set",
            f"--*.trainer.mixture-set-file={tmp_path}/m.pms",
            f"--*.trainer.prior-file={tmp_path}/mp.xml"])
        assert status == 0
        from rasr_tpu.math.matrix_io import read_vector
        priors = read_vector(f"xml:{tmp_path}/mp.xml")
        np.testing.assert_allclose(np.exp(priors), 1.0 / 3, atol=1e-5)

    def test_estimate_mean_and_std(self, corpus_with_features):
        tmp_path, cfg = corpus_with_features
        status = nn_main([
            f"--config={cfg}",
            "--*.action=estimate-mean-and-standard-deviation",
            f"--*.trainer.mean-file={tmp_path}/nm.xml",
            f"--*.trainer.standard-deviation-file={tmp_path}/ns.xml"])
        assert status == 0
        from rasr_tpu.math.matrix_io import read_vector
        mean = read_vector(f"xml:{tmp_path}/nm.xml")
        std = read_vector(f"xml:{tmp_path}/ns.xml")
        assert mean.shape == (8,) and std.shape == (8,)
        assert (std > 0).all()

    def test_init_network_alias(self, corpus_with_features):
        tmp_path, cfg = corpus_with_features
        status = nn_main([f"--config={cfg}", "--*.action=init-network",
                          f"--*.trainer.checkpoint={tmp_path}/init.msgpack"])
        assert status == 0
        assert (tmp_path / "init.msgpack").exists()
