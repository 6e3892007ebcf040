"""Full config-driven GMM recipe, tools only (the reference config-3
workflow): feature cache -> acoustic-model-trainer (accumulate /
estimate / EM) -> speech-recognizer with the word-conditioned tree
search over the trained mixtures -> WER 0 -> analog aggregation."""

import json
import textwrap

import numpy as np
import pytest

from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.tools.acoustic_model_trainer import main as amt_main
from rasr_tpu.tools.analog import analyze, parse_log
from rasr_tpu.tools.speech_recognizer import main as rec_main

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

DIM = 4


@pytest.fixture
def recipe(tmp_path):
    rng = np.random.default_rng(1)
    class_means = rng.standard_normal((7, DIM)) * 4.0
    lex = tmp_path / "lex.xml"
    lex.write_text(LEXICON_XML)

    def spans_for(orth):
        seqs = {"AB": [0, 1, 2, 3, 4, 5], "BA": [3, 4, 5, 0, 1, 2]}
        classes = [6, 6] + seqs[orth] + [6, 6]
        reps = [3, 3] + [5] * 6 + [3, 3]
        return classes, reps

    orths = ["AB", "BA", "AB", "BA"]
    corpus_lines = ['<corpus name="c">',
                    '<recording name="r" audio="x.wav">']
    with FeatureCacheWriter(str(tmp_path / "features.cache")) as cache:
        for i, orth in enumerate(orths):
            classes, reps = spans_for(orth)
            frames = [class_means[c] + 0.3 * rng.standard_normal((n, DIM))
                      for c, n in zip(classes, reps)]
            cache.write(f"c/r/s{i}",
                        np.concatenate(frames).astype(np.float32))
            corpus_lines.append(
                f'<segment name="s{i}" start="{i}" end="{i + 1}">'
                f'<orth>{orth}</orth></segment>')
    corpus_lines += ["</recording>", "</corpus>"]
    (tmp_path / "corpus.xml").write_text("\n".join(corpus_lines))

    config = tmp_path / "recipe.config"
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
        [*.mixture-set]
        file = {tmp_path}/am.pms
        [*.search-algorithm]
        type = word-conditioned-tree-search
        max-beam-size = 128
        [*.log]
        channel = {tmp_path}/recognition.log
    """))
    return tmp_path, config


class TestFullRecipe:
    def test_train_then_recognize(self, recipe):
        tmp_path, config = recipe
        # 1. GMM flat-start accumulate + estimate
        assert amt_main([
            f"--config={config}",
            "--*.action=accumulate-mixture-set-text-dependent",
            f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/r0.acc",
        ]) == 0
        assert amt_main([
            f"--config={config}",
            "--*.action=estimate-mixture-set",
            f"--*.mixture-set-trainer.accumulator-file={tmp_path}/r0.acc",
            f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/am0.pms",
        ]) == 0
        # 2. one EM realignment pass
        assert amt_main([
            f"--config={config}",
            "--*.action=accumulate-mixture-set-text-dependent",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp_path}/am0.pms",
            f"--*.mixture-set-trainer.new-accumulator-file={tmp_path}/r1.acc",
        ]) == 0
        assert amt_main([
            f"--config={config}",
            "--*.action=estimate-mixture-set",
            f"--*.mixture-set-trainer.accumulator-file={tmp_path}/r1.acc",
            f"--*.mixture-set-trainer.new-mixture-set-file={tmp_path}/am.pms",
            "--*.mixture-set-trainer.minimum-observation-weight=0.5",
        ]) == 0
        # 3. recognition with the trained mixtures (word-conditioned)
        assert rec_main([f"--config={config}"]) == 0
        # 4. analog on the recognition log
        records = parse_log(str(tmp_path / "recognition.log"))
        assert len(records) == 4
        summary = analyze(records)
        assert summary["wer"] == 0.0, summary
        assert "search-space" in summary
        for rec in records:
            assert rec["hyp"] == rec["ref"]
