"""Train the flagship LibriSpeech-class ConformerCtc (12 x d512, BPE-1k
unit inventory) on the deterministic synthetic speech task and store the
checkpoint under assets/flagship/ for the WER-anchored bench.

Run:  python scripts/train_flagship.py [--steps N] [--resume]

The task is fixed by its seed (rasr_tpu.data.SynthSpeechTask defaults);
training streams fresh utterances per step (no memorisable finite set) —
eval uses a disjoint seed stream.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ASSET_DIR = os.path.join(REPO, "assets", "flagship")

MODEL_CFG = dict(vocab_size=1024, d_model=512, n_layers=12, n_heads=8)
SAMPLE_RATE = 16000
TRAIN_SECONDS = 8.0     # fixed padded train-batch length (static shapes)
BATCH = 24
FEAT_DIM = 80


def feature_pipeline():
    """80-dim log-mel filterbank, fused on device (no DCT — the standard
    conformer front-end; uses the same dsp primitives as mfcc.flow)."""
    import jax
    import jax.numpy as jnp

    from rasr_tpu.signal import dsp
    from rasr_tpu.signal.dsp import MfccPipeline
    pipe = MfccPipeline(sample_rate=SAMPLE_RATE, filter_width=70.0)
    assert pipe.n_filters == FEAT_DIM, pipe.n_filters

    def feats_of(samples: "jnp.ndarray", num_frames: int):
        x = dsp.preemphasis(samples.astype(jnp.float32), 1.0)
        frames = dsp.frame_signal(x, pipe.length, pipe.shift, num_frames)
        frames = dsp.apply_window(frames, "hamming")
        amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
        fb = dsp.apply_matrix(amp, pipe.mel_matrix)
        # floor: zero-padded tail frames have exactly-0 mel energy; keep
        # the log finite so the conv front-end cannot smear inf into the
        # valid region (silence floor = -6)
        logfb = dsp.log10(jnp.maximum(fb, 1e-6))
        # segment-wise CMVN (signal-normalization node semantics): the
        # raw log-mels sit around [-6, -2]; unnormalized they stall CTC
        return dsp.normalize_segment(logfb)

    return pipe, feats_of


def greedy_wer(task, log_probs, out_lens, orths) -> float:
    from rasr_tpu.bliss.evaluation import Evaluator
    ev = Evaluator("eval")
    hyp_units = np.asarray(log_probs.argmax(-1))
    total_err, total_ref = 0, 0
    for i, orth in enumerate(orths):
        seq = hyp_units[i, :int(out_lens[i])]
        collapsed = []
        prev = 0
        for u in seq:
            if u != 0 and u != prev:
                collapsed.append(int(u))
            prev = u
        counts = ev.evaluate(orth, task.units_to_orth(collapsed))
        total_err += counts.errors
        total_ref += counts.ref_len
    return total_err / max(total_ref, 1)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--eval-every", type=int, default=200)
    ap.add_argument("--target-wer", type=float, default=0.02)
    ap.add_argument("--lr", type=float, default=8e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rasr_tpu.data import SynthSpeechTask
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.nn.checkpoint import CheckpointManager
    from rasr_tpu.nn.training import CtcTrainer, make_optimizer
    from rasr_tpu.parallel import make_mesh

    os.makedirs(ASSET_DIR, exist_ok=True)
    task = SynthSpeechTask()
    mesh = make_mesh(n_devices=len(jax.devices()),
                     data_parallel=len(jax.devices()))
    model = ConformerCtc(**MODEL_CFG)
    pipe, feats_of = feature_pipeline()
    N = int(TRAIN_SECONDS * SAMPLE_RATE)
    T_feat = pipe.n_frames(N)
    trainer = CtcTrainer(model, mesh,
                         optimizer=make_optimizer(args.lr, warmup_steps=400),
                         example_shape=(BATCH, T_feat, FEAT_DIM))
    ckpt = CheckpointManager(ASSET_DIR, max_to_keep=1)
    start = ckpt.latest_step()
    if start is not None:
        trainer.params, _, _ = ckpt.restore(trainer.params)
        trainer.step = start
        print(f"resumed at step {start}", flush=True)

    feats_jit = jax.jit(lambda s: feats_of(s, T_feat))

    def frames_of(n_samples):
        return np.asarray([min(pipe.n_frames(int(n)), T_feat)
                           for n in n_samples], np.int32)

    # held-out eval batch (seed stream disjoint from training seeds)
    ev_audio, ev_ns, _el, _ell, ev_orths = task.batch(
        seed=10_000_000, batch_size=16, max_seconds=TRAIN_SECONDS,
        min_words=8, max_words=14)
    ev_pad = np.zeros((16, N), np.float32)
    ev_pad[:, :ev_audio.shape[1]] = ev_audio[:, :N]
    ev_feats = feats_jit(jnp.asarray(ev_pad))
    ev_flens = frames_of(ev_ns)
    lp_fn = trainer.log_probs_fn()

    L_MAX = 48  # 14 words x 3 units + margin; fixed => one XLA program
    t_report = time.time()
    for step in range(trainer.step, args.steps):
        audio, ns, labels, lens, _orths = task.batch(
            seed=step + 1, batch_size=BATCH, max_seconds=TRAIN_SECONDS,
            min_words=8, max_words=14)
        pad = np.zeros((BATCH, N), np.float32)
        pad[:, :audio.shape[1]] = audio[:, :N]
        feats = feats_jit(jnp.asarray(pad))
        lab = np.zeros((BATCH, L_MAX), np.int32)
        lab[:, :labels.shape[1]] = labels[:, :L_MAX]
        loss = trainer.train_step(feats, frames_of(ns), lab,
                                  np.minimum(lens, L_MAX))
        if (step + 1) % 50 == 0:
            dt = time.time() - t_report
            t_report = time.time()
            print(f"step {step + 1} loss {loss:.4f} ({dt / 50:.2f}s/step)",
                  flush=True)
        if (step + 1) % args.eval_every == 0:
            lp, out_lens = lp_fn(trainer.params, ev_feats,
                                 jnp.asarray(ev_flens))
            wer = greedy_wer(task, np.asarray(lp), np.asarray(out_lens),
                             ev_orths)
            print(f"step {step + 1} greedy WER {wer:.4f}", flush=True)
            ckpt.save(step + 1, trainer.params)
            if wer <= args.target_wer:
                print(f"target WER reached at step {step + 1}", flush=True)
                break
    # export the bench artifact: params cast to float16 (halves the
    # repository artifact; bench casts back to f32/bf16 at load)
    from rasr_tpu.nn.checkpoint import save_params
    import flax
    raw = jax.tree_util.tree_map(
        lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
        trainer.params,
        is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16)
        if np.asarray(x).dtype in (np.float32, np.dtype("bfloat16"))
        else np.asarray(x), raw)
    save_params(os.path.join(ASSET_DIR, "flagship_f16.msgpack"), f16,
                step=trainer.step)
    with open(os.path.join(ASSET_DIR, "task.json"), "w") as fh:
        json.dump({"model": MODEL_CFG, "feat_dim": FEAT_DIM,
                   "filter_width": 70.0, "sample_rate": SAMPLE_RATE,
                   "task_seed": task.task_seed,
                   "n_units": task.n_units, "n_words": task.n_words},
                  fh, indent=1)
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
