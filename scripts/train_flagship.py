"""Train the flagship LibriSpeech-class ConformerCtc (12 x d512, BPE-1k
unit inventory) on the deterministic synthetic speech task and store the
checkpoint under assets/flagship/ for the WER-anchored bench.

Run:  python scripts/train_flagship.py [--steps N]

Training design (single chip, single host CPU):
  * the task is fixed by its seed (rasr_tpu.data.SynthSpeechTask);
  * a finite utterance pool is rendered once on the host, its features
    are precomputed on device in chunks, and every train step samples a
    batch from the pool — steps are pure TPU compute, so the one host
    core never throttles the chip (the pool plays the role of a finite
    training corpus; eval uses a disjoint unseen seed stream);
  * short-utterance curriculum: CTC escapes blank collapse much faster
    on 2-4-word utterances, so early steps draw from a short-utterance
    sub-pool before switching to the full-length pool.
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
FEAT_DIM = 80
L_MAX = 48              # 14 words x 3 units + margin
POOL_LONG = 4096        # full-length utterances (8-14 words)
POOL_SHORT = 512        # curriculum utterances (2-4 words)
CURRICULUM_STEPS = 600


def feature_pipeline():
    """80-dim log-mel filterbank, fused on device (no DCT — the standard
    conformer front-end; uses the same dsp primitives as mfcc.flow)."""
    import jax
    import jax.numpy as jnp

    from rasr_tpu.signal import dsp
    from rasr_tpu.signal.dsp import MfccPipeline
    pipe = MfccPipeline(sample_rate=SAMPLE_RATE, filter_width=70.0)
    assert pipe.n_filters == FEAT_DIM, pipe.n_filters

    def feats_of(samples: "jnp.ndarray", num_frames: int, lengths=None):
        x = dsp.preemphasis(samples.astype(jnp.float32), 1.0)
        frames = dsp.frame_signal(x, pipe.length, pipe.shift, num_frames)
        frames = dsp.apply_window(frames, "hamming")
        amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
        fb = dsp.apply_matrix(amp, pipe.mel_matrix)
        # floor: zero-padded tail frames have exactly-0 mel energy; keep
        # the log finite so the conv front-end cannot smear inf into the
        # valid region (silence floor = -6)
        logfb = dsp.log10(jnp.maximum(fb, 1e-6))
        # segment-wise CMVN over VALID frames only (signal-normalization
        # node semantics): padding must not skew the statistics of short
        # utterances inside a fixed-length batch
        mask = None
        if lengths is not None:
            mask = (jnp.arange(num_frames)[None, :]
                    < lengths[:, None]).astype(jnp.float32)
        return dsp.normalize_segment(logfb, mask=mask)

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


def build_pool(task, pipe, feats_jit, n_long: int, n_short: int,
               T_feat: int, N: int):
    """Render the training pool and precompute features on device.
    Returns (feats (P, T, D) device array, flens, labels, label_lens,
    n_short_first)."""
    import jax.numpy as jnp
    specs = [(7_000_000 + i, 2, 4) for i in range(n_short)] + \
            [(8_000_000 + i, 8, 14) for i in range(n_long)]
    P = len(specs)
    labels = np.zeros((P, L_MAX), np.int32)
    label_lens = np.zeros((P,), np.int32)
    flens = np.zeros((P,), np.int32)
    feats_chunks = []
    chunk_audio = []
    chunk = 64
    t0 = time.time()
    for idx, (seed, lo, hi) in enumerate(specs):
        rng = np.random.default_rng(seed)
        audio, _orth, lab = task.utterance(rng, lo, hi)
        audio = audio[:N]
        pad = np.zeros((N,), np.float32)
        pad[:len(audio)] = audio
        chunk_audio.append(pad)
        labels[idx, :len(lab)] = lab[:L_MAX]
        label_lens[idx] = min(len(lab), L_MAX)
        flens[idx] = min(pipe.n_frames(len(audio)), T_feat)
        if len(chunk_audio) == chunk or idx == P - 1:
            lo_i = idx + 1 - len(chunk_audio)
            feats_chunks.append(feats_jit(
                jnp.asarray(np.stack(chunk_audio)),
                jnp.asarray(flens[lo_i:idx + 1])))
            chunk_audio = []
    feats = jnp.concatenate(feats_chunks, axis=0)
    print(f"pool built: {P} utterances, feats {feats.shape} "
          f"({time.time() - t0:.0f}s)", flush=True)
    return feats, jnp.asarray(flens), jnp.asarray(labels), \
        jnp.asarray(label_lens), n_short


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--target-wer", type=float, default=0.02)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--curriculum", type=int, default=6000,
                    help="anneal horizon for the short-utterance bias")
    ap.add_argument("--short-floor", type=float, default=0.3,
                    help="minimum share of short utterances per batch "
                         "(guards against forgetting)")
    ap.add_argument("--inter-ctc", type=int, default=6,
                    help="InterCTC auxiliary head after this block "
                         "(0 = off); makes the deep stack trainable")
    ap.add_argument("--warmup", type=int, default=2000,
                    help="deep stacks need long warmup; 500 was enough "
                         "for 4 layers but left 12 layers at chance")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--specaugment-after", type=int, default=2500,
                    help="enable SpecAugment only after this step "
                         "(masking from step 0 keeps deep models in the "
                         "insertion-spam regime)")
    ap.add_argument("--d-model", type=int, default=MODEL_CFG["d_model"])
    ap.add_argument("--layers", type=int, default=MODEL_CFG["n_layers"])
    ap.add_argument("--heads", type=int, default=MODEL_CFG["n_heads"])
    ap.add_argument("--asset-dir", default=ASSET_DIR)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the 12x512 program takes ~10 min to build
    # through the remote-compile tunnel; cached executables load in seconds
    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rasr_tpu.data import SynthSpeechTask
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.nn.checkpoint import CheckpointManager
    from rasr_tpu.nn.training import (CtcTrainer, make_dynamic_optimizer,
                                      spec_augment, warmup_cosine)
    from rasr_tpu.parallel import make_mesh

    cfg = dict(MODEL_CFG, d_model=args.d_model, n_layers=args.layers,
               n_heads=args.heads)
    train_cfg = dict(cfg, intermediate_ctc_layer=args.inter_ctc)
    os.makedirs(args.asset_dir, exist_ok=True)
    task = SynthSpeechTask()
    mesh = make_mesh(n_devices=len(jax.devices()),
                     data_parallel=len(jax.devices()))
    model = ConformerCtc(**train_cfg)
    pipe, feats_of = feature_pipeline()
    N = int(TRAIN_SECONDS * SAMPLE_RATE)
    T_feat = pipe.n_frames(N)
    BATCH = args.batch
    trainer = CtcTrainer(
        model, mesh, optimizer=make_dynamic_optimizer(),
        lr_schedule=warmup_cosine(args.lr, args.warmup,
                                  decay_steps=args.steps),
        example_shape=(BATCH, T_feat, FEAT_DIM))
    ckpt = CheckpointManager(args.asset_dir, max_to_keep=1)
    start = ckpt.latest_step()
    if start is not None:
        trainer.params, _, _ = ckpt.restore(trainer.params)
        trainer.step = start
        print(f"resumed at step {start}", flush=True)

    feats_jit = jax.jit(lambda s, l: feats_of(s, T_feat, l))
    pool_feats, pool_flens, pool_labels, pool_lens, n_short = build_pool(
        task, pipe, feats_jit, POOL_LONG, POOL_SHORT, T_feat, N)
    P = pool_feats.shape[0]

    # held-out eval batch (seed stream disjoint from every pool seed)
    ev_audio, ev_ns, _el, _ell, ev_orths = task.batch(
        seed=10_000_000, batch_size=16, max_seconds=TRAIN_SECONDS,
        min_words=8, max_words=14)
    ev_pad = np.zeros((16, N), np.float32)
    ev_pad[:, :ev_audio.shape[1]] = ev_audio[:, :N]
    ev_flens = np.asarray([min(pipe.n_frames(int(n)), T_feat)
                           for n in ev_ns], np.int32)
    ev_feats = feats_jit(jnp.asarray(ev_pad), jnp.asarray(ev_flens))
    lp_fn = trainer.log_probs_fn()

    # pool arrays are jit ARGUMENTS, not closure constants: a closed-over
    # array would be baked into the XLA program as a 500 MB literal
    take = jax.jit(lambda pf, pfl, plab, plen, idx:
                   (pf[idx], pfl[idx], plab[idx], plen[idx]))

    augment = jax.jit(spec_augment)
    rng = np.random.default_rng(123)
    t_report = time.time()
    best_wer = 1.0
    for step in range(trainer.step, args.steps):
        # soft curriculum: a decaying BIAS toward the short-utterance
        # sub-pool instead of a hard switch — switching distributions
        # abruptly mid-warmup collapsed the long-utterance loss back to
        # chance (catastrophic forgetting at rising lr); mixing keeps
        # long-utterance gradients present from step 0
        if n_short > 0:
            p_short = max(0.8 * (1.0 - step / max(args.curriculum, 1)),
                          args.short_floor)
        else:
            p_short = 0.0
        take_short = rng.random(BATCH) < p_short
        idx = np.where(take_short,
                       rng.integers(0, max(n_short, 1), size=BATCH),
                       rng.integers(0, P, size=BATCH))
        f, fl, lab, ll = take(pool_feats, pool_flens, pool_labels,
                              pool_lens, jnp.asarray(idx, jnp.int32))
        if step >= args.specaugment_after:
            f = augment(jax.random.PRNGKey(step), f, fl)
        loss = trainer.train_step(f, fl, lab, ll)
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
            if wer <= best_wer:
                best_wer = wer
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
    save_params(os.path.join(args.asset_dir, "flagship_f16.msgpack"), f16,
                step=trainer.step)
    with open(os.path.join(args.asset_dir, "task.json"), "w") as fh:
        json.dump({"model": train_cfg, "feat_dim": FEAT_DIM,
                   "filter_width": 70.0, "sample_rate": SAMPLE_RATE,
                   "task_seed": task.task_seed,
                   "n_units": task.n_units, "n_words": task.n_words,
                   "best_greedy_wer": best_wer},
                  fh, indent=1)
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
