"""nn-trainer segmentwise actions: supervised-segmentwise-training
(lattice-based MMI via nn.segmentwise_trainer), batch-estimation, and
unsupervised (pseudo-label) training — the reference's remaining
NnTrainer actions (src/Tools/NnTrainer/NnTrainer.cc:54-63,133-144)."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.tools.nn_trainer import main as nn_main

LEXICON = textwrap.dedent("""\
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

DIM, S = 4, 9          # 3 phonemes x 3 states


def truth_classes(orth):
    # phoneme a -> states 0..2, b -> 3..5 (2 frames per state)
    seq = {"AB": [0, 1, 2, 3, 4, 5], "BA": [3, 4, 5, 0, 1, 2]}
    out = []
    for w in orth.split():
        out.extend(c for c in seq[w] for _ in range(2))
    return out


@pytest.fixture
def setup(tmp_path):
    rng = np.random.default_rng(0)
    class_means = rng.standard_normal((S, DIM)) * 3.0
    (tmp_path / "lexicon.xml").write_text(LEXICON)
    orths = ["AB", "BA", "AB BA"]
    lines = ['<corpus name="c">', '<recording name="r" audio="x.wav">']
    with FeatureCacheWriter(str(tmp_path / "f.cache")) as cache:
        for i, orth in enumerate(orths):
            cls = truth_classes(orth)
            feats = np.stack([
                class_means[c] + 0.4 * rng.standard_normal(DIM)
                for c in cls]).astype(np.float32)
            cache.write(f"c/r/s{i}", feats)
            lines.append(f'<segment name="s{i}" start="{i}" end="{i + 1}">'
                         f'<orth>{orth}</orth></segment>')
    lines += ["</recording>", "</corpus>"]
    (tmp_path / "corpus.xml").write_text("\n".join(lines))
    cfg = tmp_path / "seq.config"
    cfg.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/corpus.xml
        [*.lexicon]
        file = {tmp_path}/lexicon.xml
        [*.feature-cache]
        path = {tmp_path}/f.cache
        [*.acoustic-model.hmm]
        states-per-phone = 3
        [*.acoustic-model.tdp.*]
        loop = 2.0
        forward = 0.0
        skip = 20.0
        exit = 0.0
        [*.acoustic-model.tdp.silence]
        loop = 0.0
        forward = 2.0
        skip = infinity
        exit = 4.0
        [*.model]
        type = linear
        n-classes = {S}
        [*.sequence-training]
        criterion = mmi
        am-scale = 1.0
        lm-scale = 1.0
        denominator-beam-size = 64
        [*.optimizer]
        type = adam
        learning-rate = 0.1
        [*.trainer]
        epochs = 6
        checkpoint = {tmp_path}/seq.msgpack
    """))
    return tmp_path, cfg, class_means


def _decode_and_ce(tmp_path, params_path):
    """(segments decoded correctly, mean frame CE to the truth classes)
    with the given (or seed-initial) linear params."""
    import jax
    import jax.numpy as jnp
    from rasr_tpu.am.acoustic_model import AcousticModel
    from rasr_tpu.bliss.lexicon import Lexicon
    from rasr_tpu.core.configuration import Configuration
    from rasr_tpu.nn.checkpoint import load_params
    from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
    from rasr_tpu.speech.feature_cache import FeatureCacheReader

    config = Configuration()
    config.set_from_file(str(tmp_path / "seq.config"))
    lex = Lexicon()
    lex.load(str(tmp_path / "lexicon.xml"))
    am = AcousticModel.create(config.sub("*").sub("acoustic-model"), lex)
    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(
        0.1 * rng.standard_normal((DIM, S)), jnp.float32),
        "b": jnp.zeros((S,), jnp.float32)}
    if params_path:
        params, _ = load_params(params_path, params)
    search = WordConditionedTreeSearch(am, beam_size=64)
    cache = FeatureCacheReader(str(tmp_path / "f.cache"))
    correct = 0
    ces = []
    for i, orth in enumerate(["AB", "BA", "AB BA"]):
        feats = cache.features(f"c/r/s{i}")
        lp = np.asarray(jax.nn.log_softmax(
            jnp.asarray(feats) @ params["w"] + params["b"], -1))
        hyp = search.recognize(-lp)
        if " ".join(w for w in hyp if w != "[SILENCE]") == orth:
            correct += 1
        ces.append(-np.mean(lp[np.arange(len(lp)), truth_classes(orth)]))
    return correct, float(np.mean(ces))


class TestSegmentwiseActions:
    def test_supervised_segmentwise_improves_decode(self, setup):
        tmp_path, cfg, _cm = setup
        assert nn_main([
            f"--config={cfg}",
            "--*.action=supervised-segmentwise-training"]) == 0
        assert (tmp_path / "seq.msgpack").exists()
        correct0, _ = _decode_and_ce(tmp_path, None)
        correct, _ce = _decode_and_ce(tmp_path,
                                      str(tmp_path / "seq.msgpack"))
        # discriminative training must teach the search the truth
        # (the per-frame CE along MY uniform 2-frames-per-state guess is
        # NOT monotone — the forced alignment picks its own durations)
        assert correct == 3, "trained model fails to decode the corpus"
        assert correct >= correct0

    def test_batch_estimation_updates_params(self, setup):
        tmp_path, cfg, _cm = setup
        assert nn_main([
            f"--config={cfg}", "--*.action=batch-estimation",
            f"--*.trainer.checkpoint={tmp_path}/batch.msgpack",
            "--*.trainer.epochs=1"]) == 0
        # the single accumulated estimation step must have moved params
        import jax.numpy as jnp
        from rasr_tpu.nn.checkpoint import load_params
        rng = np.random.default_rng(0)
        init = {"w": jnp.asarray(
            0.1 * rng.standard_normal((DIM, S)), jnp.float32),
            "b": jnp.zeros((S,), jnp.float32)}
        loaded, _ = load_params(str(tmp_path / "batch.msgpack"), init)
        delta = float(np.abs(np.asarray(loaded["w"])
                             - np.asarray(init["w"])).max())
        assert delta > 1e-4, "batch estimation left params untouched"

    def test_smbr_criterion_runs(self, setup):
        tmp_path, cfg, _cm = setup
        assert nn_main([
            f"--config={cfg}",
            "--*.action=supervised-segmentwise-training",
            "--*.sequence-training.criterion=smbr",
            f"--*.trainer.checkpoint={tmp_path}/smbr.msgpack",
            "--*.trainer.epochs=2"]) == 0
        assert (tmp_path / "smbr.msgpack").exists()


@pytest.fixture
def ctc_corpus(tmp_path):
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
        batch-size = 2
        epochs = 1
        learning-rate = 0.001
        warmup-steps = 10
        checkpoint = {tmp_path}/model.msgpack
    """))
    return tmp_path, cfg


class TestUnsupervised:
    def test_unsupervised_self_training(self, ctc_corpus):
        tmp_path, cfg = ctc_corpus
        # supervised warmup gives the pseudo-labeler a non-degenerate net
        assert nn_main([f"--config={cfg}",
                        "--*.action=supervised-training"]) == 0
        assert nn_main([
            f"--config={cfg}", "--*.action=unsupervised-training",
            f"--*.trainer.resume={tmp_path}/model.msgpack",
            f"--*.trainer.checkpoint={tmp_path}/unsup.msgpack"]) == 0
        assert (tmp_path / "unsup.msgpack").exists()
