"""Speaker-adapted recognition (the SAT decode loop): per-speaker CMLLR
transforms estimated by the trainer are selected PER SEGMENT during
corpus recognition and must repair a speaker's systematic feature
distortion (reference AdaptedAcousticModel,
/root/reference/src/Am/AdaptedAcousticModel.hh:31; corpus-key-driven
feature transforms)."""

import textwrap

import numpy as np
import pytest

from rasr_tpu.speech.feature_cache import FeatureCacheWriter
from rasr_tpu.tools.acoustic_model_trainer import main as amt_main
from rasr_tpu.tools.analog import parse_log
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


def spans_for(orth):
    seqs = {"AB": [0, 1, 2, 3, 4, 5], "BA": [3, 4, 5, 0, 1, 2]}
    classes = [6, 6] + seqs[orth] + [6, 6]
    reps = [3, 3] + [5] * 6 + [3, 3]
    return classes, reps


@pytest.fixture
def sat_setup(tmp_path):
    rng = np.random.default_rng(1)
    class_means = rng.standard_normal((7, DIM)) * 4.0
    # speaker 2's channel: a strong affine feature distortion (exactly
    # the model CMLLR assumes)
    # moderate channel: enough to break unadapted DECODING while forced
    # alignment (which knows the orth) still works -- the regime CMLLR
    # estimation needs
    q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
    gamma = 0.3
    a2 = (1 - gamma) * np.eye(DIM) + gamma * 1.2 * q
    b2 = rng.standard_normal(DIM) * 0.8

    def render(orth, speaker, rr):
        classes, reps = spans_for(orth)
        frames = [class_means[c] + 0.3 * rr.standard_normal((n, DIM))
                  for c, n in zip(classes, reps)]
        x = np.concatenate(frames).astype(np.float32)
        if speaker == "spk2":
            x = (x @ a2.T + b2).astype(np.float32)
        return x

    lex = tmp_path / "lex.xml"
    lex.write_text(LEXICON_XML)
    train_orths = ["AB", "BA", "AB", "BA", "AB", "BA"]
    test_orths = ["AB", "BA", "BA", "AB"]

    def corpus_xml(name, orths_of_speaker, speakers=("spk1", "spk2")):
        lines = [f'<corpus name="{name}">']
        for spk in speakers:
            lines.append(f'<speaker-description name="{spk}">'
                         f'</speaker-description>')
        for spk in speakers:
            lines.append(f'<recording name="r_{spk}" audio="x.wav">')
            lines.append(f'<speaker name="{spk}"/>')
            for i, orth in enumerate(orths_of_speaker):
                lines.append(
                    f'<segment name="s{i}" start="{i}" end="{i + 1}">'
                    f'<orth>{orth}</orth></segment>')
            lines.append('</recording>')
        lines.append('</corpus>')
        return "\n".join(lines)

    (tmp_path / "train.xml").write_text(corpus_xml("c", train_orths))
    # canonical-model corpus: the clean speaker only (the classic SAT
    # setup: SI model from well-matched data, CMLLR maps every other
    # speaker onto it)
    (tmp_path / "am_train.xml").write_text(
        corpus_xml("c", train_orths, speakers=("spk1",)))
    (tmp_path / "test.xml").write_text(corpus_xml("c", test_orths))
    rr = np.random.default_rng(77)
    with FeatureCacheWriter(str(tmp_path / "train.cache")) as cache:
        for spk in ("spk1", "spk2"):
            for i, orth in enumerate(train_orths):
                cache.write(f"c/r_{spk}/s{i}", render(orth, spk, rr))
    with FeatureCacheWriter(str(tmp_path / "test.cache")) as cache:
        for spk in ("spk1", "spk2"):
            for i, orth in enumerate(test_orths):
                cache.write(f"c/r_{spk}/s{i}", render(orth, spk, rr))

    base = textwrap.dedent(f"""\
        [*.lexicon]
        file = {lex}
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
    """)
    (tmp_path / "train.config").write_text(base + textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/train.xml
        [*.feature-cache]
        path = {tmp_path}/train.cache
    """))
    (tmp_path / "am_train.config").write_text(base + textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/am_train.xml
        [*.feature-cache]
        path = {tmp_path}/train.cache
    """))
    (tmp_path / "test.config").write_text(base + textwrap.dedent(f"""\
        [*.corpus]
        file = {tmp_path}/test.xml
        [*.feature-cache]
        path = {tmp_path}/test.cache
        [*.log]
        channel = {tmp_path}/recognition.log
    """))
    return tmp_path


def _wer_from_log(path):
    records = parse_log(str(path))
    err = sum(r["errors"] for r in records)
    ref = sum(r["ref-len"] for r in records)
    return err / max(ref, 1), len(records)


class TestSatRecognition:
    def test_per_speaker_cmllr_repairs_distorted_speaker(self, sat_setup):
        tmp = sat_setup
        train_cfg = tmp / "train.config"
        am_cfg = tmp / "am_train.config"
        test_cfg = tmp / "test.config"
        # 1. canonical GMM from the clean speaker
        assert amt_main([
            f"--config={am_cfg}",
            "--*.action=accumulate-mixture-set-text-dependent",
            f"--*.mixture-set-trainer.new-accumulator-file={tmp}/r0.acc",
        ]) == 0
        assert amt_main([
            f"--config={am_cfg}",
            "--*.action=estimate-mixture-set",
            f"--*.mixture-set-trainer.accumulator-file={tmp}/r0.acc",
            f"--*.mixture-set-trainer.new-mixture-set-file={tmp}/am0.pms",
        ]) == 0
        # one EM realignment pass on the canonical speaker
        assert amt_main([
            f"--config={am_cfg}",
            "--*.action=accumulate-mixture-set-text-dependent",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am0.pms",
            f"--*.mixture-set-trainer.new-accumulator-file={tmp}/r1.acc",
        ]) == 0
        assert amt_main([
            f"--config={am_cfg}",
            "--*.action=estimate-mixture-set",
            f"--*.mixture-set-trainer.accumulator-file={tmp}/r1.acc",
            f"--*.mixture-set-trainer.new-mixture-set-file={tmp}/am.pms",
            "--*.mixture-set-trainer.minimum-observation-weight=0.5",
        ]) == 0
        # 2. per-speaker CMLLR statistics + transforms (keys = speakers)
        assert amt_main([
            f"--config={train_cfg}",
            "--*.action=estimate-affine-feature-transform",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
            f"--*.mixture-set-trainer.affine-transform-accumulator-file="
            f"{tmp}/cmllr.acc.npz",
        ]) == 0
        assert amt_main([
            f"--config={train_cfg}",
            "--*.action=calculate-affine-feature-transform",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
            f"--*.mixture-set-trainer.affine-transform-accumulator-file="
            f"{tmp}/cmllr.acc.npz",
            f"--*.mixture-set-trainer.affine-transform-file="
            f"{tmp}/cmllr.npz",
        ]) == 0
        z = np.load(tmp / "cmllr.npz")
        assert sorted(z.files) == ["spk1", "spk2"]
        # 2b. second SAT round: re-align with round-1-adapted features,
        # composed transforms map raw features
        assert amt_main([
            f"--config={train_cfg}",
            "--*.action=estimate-affine-feature-transform",
            f"--*.adaptation.affine-transform-file={tmp}/cmllr.npz",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
            f"--*.mixture-set-trainer.affine-transform-accumulator-file="
            f"{tmp}/cmllr2.acc.npz",
        ]) == 0
        assert amt_main([
            f"--config={train_cfg}",
            "--*.action=calculate-affine-feature-transform",
            f"--*.adaptation.affine-transform-file={tmp}/cmllr.npz",
            f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
            f"--*.mixture-set-trainer.affine-transform-accumulator-file="
            f"{tmp}/cmllr2.acc.npz",
            f"--*.mixture-set-trainer.affine-transform-file="
            f"{tmp}/cmllr2.npz",
        ]) == 0
        # 3. unadapted recognition of held-out utterances
        assert rec_main([f"--config={test_cfg}"]) == 0
        unadapted_wer, n = _wer_from_log(tmp / "recognition.log")
        assert n == 8
        # 4. per-speaker ADAPTED recognition (transforms selected by
        # corpus key per segment); separate log file — channels are
        # process-wide singletons keyed by path
        assert rec_main([
            f"--config={test_cfg}",
            f"--*.adaptation.affine-transform-file={tmp}/cmllr2.npz",
            f"--*.log.channel={tmp}/adapted.log",
        ]) == 0
        sat_wer, n = _wer_from_log(tmp / "adapted.log")
        assert n == 8
        # the distorted speaker breaks the SI model; CMLLR must repair it
        assert unadapted_wer > 0.0, "distortion too weak to matter"
        assert sat_wer < unadapted_wer, (sat_wer, unadapted_wer)
        assert sat_wer == 0.0, sat_wer
