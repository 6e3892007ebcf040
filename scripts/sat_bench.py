"""Speaker-adapted recognition artifact (SAT_BENCH.json).

Per-speaker CMLLR over a speaker-distorted synthetic corpus, applied
per segment during config-driven corpus recognition (reference
AdaptedAcousticModel, /root/reference/src/Am/AdaptedAcousticModel.hh:31):

  * N speakers, each with a random affine feature channel (rotation +
    scale + bias) of realistic strength; one canonical clean speaker
    trains the SI model;
  * two CMLLR rounds per speaker via the acoustic-model-trainer actions
    (round 2 aligns with round-1-adapted features, transforms compose);
  * held-out utterances recognized unadapted vs adapted (the
    speech-recognizer tool selects each segment's transform by corpus
    key).

Writes SAT_BENCH.json {unadapted_wer, sat_wer, ...}.  CPU-only.
Run: python scripts/sat_bench.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import textwrap

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# CPU-only workload; sitecustomize pre-imports jax (TPU tunnel), so the
# platform must be pinned via the config API before any backend touch
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from rasr_tpu.speech.feature_cache import FeatureCacheWriter  # noqa: E402
from rasr_tpu.tools.acoustic_model_trainer import main as amt_main  # noqa: E402
from rasr_tpu.tools.analog import parse_log  # noqa: E402
from rasr_tpu.tools.speech_recognizer import main as rec_main  # noqa: E402

LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
        <phoneme><symbol>c</symbol></phoneme>
        <phoneme><symbol>si</symbol><variation>none</variation></phoneme>
      </phoneme-inventory>
      <lemma special="silence"><orth>[SILENCE]</orth><phon>si</phon></lemma>
      <lemma><orth>AB</orth><phon>a b</phon></lemma>
      <lemma><orth>BA</orth><phon>b a</phon></lemma>
      <lemma><orth>CA</orth><phon>c a</phon></lemma>
      <lemma><orth>BC</orth><phon>b c</phon></lemma>
    </lexicon>
""")

DIM = 6
N_SPEAKERS = 6
WORDS = ["AB", "BA", "CA", "BC"]
SEQ = {"a": [0, 1, 2], "b": [3, 4, 5], "c": [6, 7, 8]}


def spans_for(orth):
    classes = [9, 9]
    for ph in orth.lower():
        classes += SEQ[ph]
    classes += [9, 9]
    reps = [3, 3] + [5] * (len(classes) - 4) + [3, 3]
    return classes, reps


def main() -> int:
    rng = np.random.default_rng(1)
    class_means = rng.standard_normal((10, DIM)) * 4.0
    speakers = ["canon"] + [f"spk{i}" for i in range(1, N_SPEAKERS)]
    channels = {"canon": (np.eye(DIM), np.zeros(DIM))}
    for s in speakers[1:]:
        q, _ = np.linalg.qr(rng.standard_normal((DIM, DIM)))
        g = rng.uniform(0.25, 0.45)
        a = (1 - g) * np.eye(DIM) + g * 1.2 * q
        b = rng.standard_normal(DIM) * 0.8
        channels[s] = (a, b)

    srng = np.random.default_rng(7)
    train_orths = [WORDS[srng.integers(len(WORDS))] for _ in range(10)]
    test_orths = [WORDS[srng.integers(len(WORDS))] for _ in range(10)]

    def render(orth, spk, rr):
        classes, reps = spans_for(orth)
        frames = [class_means[cl] + 0.3 * rr.standard_normal((n, DIM))
                  for cl, n in zip(classes, reps)]
        x = np.concatenate(frames).astype(np.float32)
        a, b = channels[spk]
        return (x @ a.T + b).astype(np.float32)

    tmp = tempfile.mkdtemp(prefix="sat_bench_")
    (lex := os.path.join(tmp, "lex.xml"))
    with open(lex, "w") as fh:
        fh.write(LEXICON_XML)

    def corpus_xml(orths, spks):
        lines = ['<corpus name="c">']
        for s in spks:
            lines.append(f'<speaker-description name="{s}">'
                         f'</speaker-description>')
        for s in spks:
            lines.append(f'<recording name="r_{s}" audio="x.wav">')
            lines.append(f'<speaker name="{s}"/>')
            for i, o in enumerate(orths):
                lines.append(
                    f'<segment name="s{i}" start="{i}" end="{i + 1}">'
                    f'<orth>{o}</orth></segment>')
            lines.append('</recording>')
        lines.append('</corpus>')
        return "\n".join(lines)

    for name, orths, spks in [
            ("am_train", train_orths, ["canon"]),
            ("train", train_orths, speakers),
            ("test", test_orths, speakers)]:
        with open(os.path.join(tmp, name + ".xml"), "w") as fh:
            fh.write(corpus_xml(orths, spks))
    rr = np.random.default_rng(77)
    with FeatureCacheWriter(os.path.join(tmp, "train.cache")) as cache:
        for s in speakers:
            for i, o in enumerate(train_orths):
                cache.write(f"c/r_{s}/s{i}", render(o, s, rr))
    with FeatureCacheWriter(os.path.join(tmp, "test.cache")) as cache:
        for s in speakers:
            for i, o in enumerate(test_orths):
                cache.write(f"c/r_{s}/s{i}", render(o, s, rr))

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
        file = {tmp}/am.pms
        [*.search-algorithm]
        type = word-conditioned-tree-search
        max-beam-size = 256
    """)
    for name in ("am_train", "train", "test"):
        extra = f"""[*.corpus]
file = {tmp}/{name}.xml
[*.feature-cache]
path = {tmp}/{"train" if name != "test" else "test"}.cache
"""
        if name == "test":
            extra += f"[*.log]\nchannel = {tmp}/recognition.log\n"
        with open(os.path.join(tmp, name + ".config"), "w") as fh:
            fh.write(base + extra)

    am_cfg = os.path.join(tmp, "am_train.config")
    train_cfg = os.path.join(tmp, "train.config")
    test_cfg = os.path.join(tmp, "test.config")

    def amt(cfg, *args):
        assert amt_main([f"--config={cfg}", *args]) == 0

    # canonical SI model (flat start + one EM pass)
    amt(am_cfg, "--*.action=accumulate-mixture-set-text-dependent",
        f"--*.mixture-set-trainer.new-accumulator-file={tmp}/r0.acc")
    amt(am_cfg, "--*.action=estimate-mixture-set",
        f"--*.mixture-set-trainer.accumulator-file={tmp}/r0.acc",
        f"--*.mixture-set-trainer.new-mixture-set-file={tmp}/am0.pms")
    amt(am_cfg, "--*.action=accumulate-mixture-set-text-dependent",
        f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am0.pms",
        f"--*.mixture-set-trainer.new-accumulator-file={tmp}/r1.acc")
    amt(am_cfg, "--*.action=estimate-mixture-set",
        f"--*.mixture-set-trainer.accumulator-file={tmp}/r1.acc",
        f"--*.mixture-set-trainer.new-mixture-set-file={tmp}/am.pms",
        "--*.mixture-set-trainer.minimum-observation-weight=0.5")
    # two CMLLR rounds per speaker
    amt(train_cfg, "--*.action=estimate-affine-feature-transform",
        f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
        f"--*.mixture-set-trainer.affine-transform-accumulator-file="
        f"{tmp}/c1.acc.npz")
    amt(train_cfg, "--*.action=calculate-affine-feature-transform",
        f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
        f"--*.mixture-set-trainer.affine-transform-accumulator-file="
        f"{tmp}/c1.acc.npz",
        f"--*.mixture-set-trainer.affine-transform-file={tmp}/cmllr1.npz")
    amt(train_cfg, "--*.action=estimate-affine-feature-transform",
        f"--*.adaptation.affine-transform-file={tmp}/cmllr1.npz",
        f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
        f"--*.mixture-set-trainer.affine-transform-accumulator-file="
        f"{tmp}/c2.acc.npz")
    amt(train_cfg, "--*.action=calculate-affine-feature-transform",
        f"--*.adaptation.affine-transform-file={tmp}/cmllr1.npz",
        f"--*.mixture-set-trainer.old-mixture-set-file={tmp}/am.pms",
        f"--*.mixture-set-trainer.affine-transform-accumulator-file="
        f"{tmp}/c2.acc.npz",
        f"--*.mixture-set-trainer.affine-transform-file={tmp}/cmllr2.npz")

    def wer_of(log):
        records = parse_log(log)
        err = sum(r["errors"] for r in records)
        ref = sum(r["ref-len"] for r in records)
        return err / max(ref, 1), len(records)

    assert rec_main([f"--config={test_cfg}"]) == 0
    unadapted_wer, n1 = wer_of(os.path.join(tmp, "recognition.log"))
    assert rec_main([
        f"--config={test_cfg}",
        f"--*.adaptation.affine-transform-file={tmp}/cmllr2.npz",
        f"--*.log.channel={tmp}/adapted.log",
    ]) == 0
    sat_wer, n2 = wer_of(os.path.join(tmp, "adapted.log"))
    result = {
        "task": "per-speaker adapted recognition (SAT decode loop)",
        "speakers": N_SPEAKERS,
        "canonical_speaker": "canon",
        "cmllr_rounds": 2,
        "test_segments": n2,
        "unadapted_wer": round(unadapted_wer, 4),
        "sat_wer": round(sat_wer, 4),
        "adaptation_path": "acoustic-model-trainer estimate/calculate-"
                           "affine-feature-transform (per corpus key) -> "
                           "speech-recognizer [*.adaptation]",
    }
    with open(os.path.join(REPO, "SAT_BENCH.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
