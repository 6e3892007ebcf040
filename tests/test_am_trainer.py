"""GMM training workflow integration test (acoustic-model-trainer tool):
flat start -> align -> accumulate (2 partitions) -> combine -> estimate ->
split -> re-estimate, on synthetic class-separable features."""

import os
import textwrap

import numpy as np
import pytest

from rasr_tpu.mm.mixture_set import MixtureSet
from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.tools.acoustic_model_trainer import main as amt_main

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
# monophone tying allocates states_per_phone classes per phoneme:
# a -> 0-2, b -> 3-5, si -> 6 (7, 8 unused: silence has 1 HMM state)
N_CLASSES = 9
N_USED = 7


@pytest.fixture
def setup(tmp_path):
    rng = np.random.default_rng(0)
    class_means = rng.standard_normal((N_USED, DIM)) * 4.0

    lex = tmp_path / "lex.xml"
    lex.write_text(LEXICON_XML)

    seg_names = []
    corpus_lines = ['<corpus name="c">', '<recording name="r" audio="x.wav">']
    with FeatureCacheWriter(str(tmp_path / "features.cache")) as cache:
        for i in range(6):
            # synth: 4 frames silence, 6 per 'a' state, 6 per 'b' state, 4 sil
            frames = []
            for cls, reps in [(6, 4), (0, 6), (1, 6), (2, 6),
                              (3, 6), (4, 6), (5, 6), (6, 4)]:
                frames.append(class_means[cls]
                              + 0.3 * rng.standard_normal((reps, DIM)))
            feats = np.concatenate(frames).astype(np.float32)
            name = f"c/r/s{i}"
            seg_names.append(name)
            cache.write(name, feats)
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
    return tmp_path, config, class_means


class TestGmmWorkflow:
    def test_full_workflow(self, setup):
        tmp_path, config, class_means = setup
        # accumulate in two partitions (the reference distributed pattern)
        for part in range(2):
            status = amt_main([
                f"--config={config}",
                "--*.action=accumulate-mixture-set-text-dependent",
                "--*.corpus.partition=2",
                f"--*.corpus.select-partition={part}",
                f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/p{part}.acc",
            ])
            assert status == 0
        status = amt_main([
            f"--config={config}",
            "--*.action=combine-mixture-set-estimators",
            f"--*.mixture-set-trainer.accumulator-files={tmp_path}/p0.acc {tmp_path}/p1.acc",
            f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/all.acc",
        ])
        assert status == 0
        status = amt_main([
            f"--config={config}",
            "--*.action=estimate-mixture-set",
            f"--*.mixture-set-trainer.accumulator-file={tmp_path}/all.acc",
            f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/am.pms",
        ])
        assert status == 0
        ms = MixtureSet.read_pms(str(tmp_path / "am.pms"))
        assert ms.n_mixtures == N_CLASSES

        # EM iterations: realign with the previous model, re-estimate
        prev = f"{tmp_path}/am.pms"
        for it in range(3):
            amt_main([
                f"--config={config}",
                "--*.action=accumulate-mixture-set-text-dependent",
                f"--*.mixture-set-trainer.old-mixture-set-file={prev}",
                f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/em{it}.acc"])
            amt_main([
                f"--config={config}",
                "--*.action=estimate-mixture-set",
                f"--*.mixture-set-trainer.accumulator-file={tmp_path}/em{it}.acc",
                f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/em{it}.pms",
                "--*.mixture-set-trainer.minimum-observation-weight=0.5"])
            prev = f"{tmp_path}/em{it}.pms"
        ms = MixtureSet.read_pms(prev)
        err = np.abs(ms.means[:N_USED] - class_means).mean()
        assert err < 1.0, f"mean recovery error after EM: {err}"
        # non-silence classes got roughly equal mass
        # (36 frames per class across 6 segments, boundaries may shift)

        # split then re-estimate: twice the densities
        status = amt_main([
            f"--config={config}",
            "--*.action=split-mixture-set",
            f"--*.mixture-set-trainer.accumulator-file={tmp_path}/all.acc",
            f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/split.acc",
        ])
        assert status == 0
        status = amt_main([
            f"--config={config}",
            "--*.action=estimate-mixture-set",
            f"--*.mixture-set-trainer.accumulator-file={tmp_path}/split.acc",
            f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/am2.pms",
            "--*.mixture-set-trainer.minimum-observation-weight=0.5",
        ])
        assert status == 0
        ms2 = MixtureSet.read_pms(str(tmp_path / "am2.pms"))
        assert ms2.n_densities == 2 * ms.n_densities
        assert ms2.n_mixtures == N_CLASSES
        # second accumulation pass against the split model exercises
        # multi-density assignment
        status = amt_main([
            f"--config={config}",
            "--*.action=accumulate-mixture-set-text-dependent",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp_path}/am2.pms",
            f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/pass2.acc",
        ])
        assert status == 0


class TestAlignmentCache:
    def test_pack_roundtrip(self, tmp_path):
        from rasr_tpu.speech.alignment import (Alignment, AlignmentCacheReader,
                                               AlignmentCacheWriter)
        align = Alignment.from_viterbi(np.array([64, 64, 65, 66, 70]))
        p = str(tmp_path / "a.cache")
        with AlignmentCacheWriter(p) as w:
            w.write("c/r/s", align)
        with AlignmentCacheReader(p) as r:
            back = r.read("c/r/s")
            np.testing.assert_array_equal(back.state_ids, align.state_ids)
            np.testing.assert_array_equal(back.frames, np.arange(5))
            np.testing.assert_allclose(back.weights, 1.0)

    def test_dump_alignment_action(self, setup):
        tmp_path, config, class_means = setup
        # need a model first: flat-start accumulate + estimate
        amt_main([f"--config={config}",
                  "--*.action=accumulate-mixture-set-text-dependent",
                  f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/a.acc"])
        amt_main([f"--config={config}", "--*.action=estimate-mixture-set",
                  f"--*.mixture-set-trainer.accumulator-file={tmp_path}/a.acc",
                  f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/m.pms"])
        status = amt_main([
            f"--config={config}", "--*.action=dump-alignment",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp_path}/m.pms",
            f"--*.mixture-set-trainer.alignment-cache={tmp_path}/align.cache"])
        assert status == 0
        from rasr_tpu.speech.alignment import AlignmentCacheReader
        with AlignmentCacheReader(str(tmp_path / "align.cache")) as r:
            keys = r.keys()
            assert len(keys) == 6
            a = r.read(keys[0])
            assert len(a) == 44  # frames per synthetic segment (4+6*6+4)
            # labels are packed allophone-state ids
            assert a.state_ids.max() > 0


class TestCartWorkflow:
    def test_cart_accumulate_estimate_and_tying(self, setup):
        tmp_path, config, class_means = setup
        amt_main([f"--config={config}",
                  "--*.action=accumulate-mixture-set-text-dependent",
                  f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/c.acc"])
        amt_main([f"--config={config}", "--*.action=estimate-mixture-set",
                  f"--*.mixture-set-trainer.accumulator-file={tmp_path}/c.acc",
                  f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/c.pms"])
        status = amt_main([
            f"--config={config}", "--*.action=accumulate-cart-examples",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp_path}/c.pms",
            f"--*.mixture-set-trainer.cart-example-file={tmp_path}/cart.ex"])
        assert status == 0
        status = amt_main([
            f"--config={config}", "--*.action=estimate-cart",
            f"--*.mixture-set-trainer.cart-example-file={tmp_path}/cart.ex",
            f"--*.mixture-set-trainer.cart-file={tmp_path}/cart.xml",
            "--*.mixture-set-trainer.cart-minimum-examples=10"])
        assert status == 0
        # use the tree as CART state tying in a fresh acoustic model
        from rasr_tpu.am.acoustic_model import AcousticModel
        from rasr_tpu.bliss.lexicon import Lexicon
        from rasr_tpu.core.configuration import Configuration
        cfg = Configuration(name="t")
        cfg.set("*.lexicon.file", str(tmp_path / "lex.xml"))
        cfg.set("*.acoustic-model.state-tying.type", "cart")
        cfg.set("*.acoustic-model.state-tying.file", str(tmp_path / "cart.xml"))
        lex = Lexicon(cfg.sub("lexicon"))
        am = AcousticModel.create(cfg.sub("acoustic-model"), lex)
        # distinct central phonemes/states land in valid tied classes
        from rasr_tpu.am.allophone import Allophone
        n = am.state_tying.n_classes
        assert n >= 3
        a_id = lex.phoneme_inventory.phoneme("a").id
        b_id = lex.phoneme_inventory.phoneme("b").id
        cls_a = am.state_tying.emission_index(Allophone(a_id), 0)
        cls_b = am.state_tying.emission_index(Allophone(b_id), 0)
        assert 0 <= cls_a < n and 0 <= cls_b < n
        assert cls_a != cls_b  # strongly separated synthetic classes


class TestBaumWelchAccumulation:
    def test_soft_em_improves_means(self, setup):
        tmp_path, config, class_means = setup
        # flat start + estimate
        amt_main([f"--config={config}",
                  "--*.action=accumulate-mixture-set-text-dependent",
                  f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/bw0.acc"])
        amt_main([f"--config={config}", "--*.action=estimate-mixture-set",
                  f"--*.mixture-set-trainer.accumulator-file={tmp_path}/bw0.acc",
                  f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/bw0.pms"])
        # soft EM iterations
        prev = f"{tmp_path}/bw0.pms"
        for it in range(3):
            status = amt_main([
                f"--config={config}",
                "--*.action=accumulate-mixture-set-text-dependent",
                "--*.mixture-set-trainer.accumulation=baum-welch",
                f"--*.mixture-set-trainer.old-mixture-set-file={prev}",
                f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/bw{it+1}.acc"])
            assert status == 0
            amt_main([
                f"--config={config}", "--*.action=estimate-mixture-set",
                f"--*.mixture-set-trainer.accumulator-file={tmp_path}/bw{it+1}.acc",
                f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/bw{it+1}.pms",
                "--*.mixture-set-trainer.minimum-observation-weight=0.5"])
            prev = f"{tmp_path}/bw{it+1}.pms"
        ms = MixtureSet.read_pms(prev)
        err = np.abs(ms.means[:N_USED] - class_means).mean()
        assert err < 1.0, f"soft-EM mean recovery error {err}"
