"""End-to-end hybrid NN-HMM recognition proof (BASELINE config 3).

The complete loop the reference was built around: a neural acoustic
model scored on the TPU feeding the host word-conditioned tree search
(native kernel + LM lookahead) with a backing-off 4-gram LM over a
production-scale lexicon — src/Speech/Recognizer.cc:170-290 (feed loop),
src/Mm/BatchFeatureScorer.hh:34 (buffered emission batches),
src/Search/AdvancedTreeSearch/AdvancedTreeSearch.cc:242-282.

Stages (everything synthetic-but-honest; no egress):
  1. train a conformer frame classifier on oracle-aligned features of
     the HybridSynthTask (confusable phoneme pairs — acoustics alone
     cannot resolve word identity) ON THE TPU;
  2. estimate log state priors from the alignment counts;
  3. build a 20k-100k-word lexicon tree + multi-million-entry 4-gram
     ARPA with LM lookahead;
  4. decode unseen eval utterances END TO END: raw audio -> fused
     device program (log-mel front-end + conformer + prior-divided
     posteriors) double-buffered against the host search
     (HybridEmissionScorer.pipelined: utterance k+1's forward runs on
     the chip while the host searches utterance k);
  5. write HYBRID_BENCH.json: WER, end-to-end x-real-time, search-space
     stats, device-blocked share, build costs.

Usage: python scripts/hybrid_bench.py [--words 20000] [--steps 2500] ...
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

CACHE = os.environ.get("RASR_HYBRID_CACHE", "/root/.cache/rasr_hybrid")

SAMPLE_RATE = 16000
FEAT_DIM = 80
TRAIN_SECONDS = 8.0


def feature_pipeline():
    """80-dim log-mel + segment CMVN, traceable (same chain as the CTC
    flagship front-end; mfcc.flow primitives)."""
    import jax.numpy as jnp

    from rasr_tpu.signal import dsp
    from rasr_tpu.signal.dsp import MfccPipeline
    pipe = MfccPipeline(sample_rate=SAMPLE_RATE, filter_width=70.0)
    assert pipe.n_filters == FEAT_DIM

    def feats_of(samples, num_frames, lengths=None):
        x = dsp.preemphasis(samples.astype(jnp.float32), 1.0)
        frames = dsp.frame_signal(x, pipe.length, pipe.shift, num_frames)
        frames = dsp.apply_window(frames, "hamming")
        amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
        fb = dsp.apply_matrix(amp, pipe.mel_matrix)
        logfb = dsp.log10(jnp.maximum(fb, 1e-6))
        mask = None
        if lengths is not None:
            mask = (jnp.arange(num_frames)[None, :]
                    < lengths[:, None]).astype(jnp.float32)
        return dsp.normalize_segment(logfb, mask=mask)

    return pipe, feats_of


def build_pool(task, pipe, feats_jit, pool: int, T_feat: int, N: int,
               seed0: int = 5_000_000):
    """Render `pool` training utterances, features on device in chunks.
    Returns (feats device (P,T,D), flens, labels (P,T), label frames)."""
    import jax.numpy as jnp
    P = pool
    labels = np.zeros((P, T_feat), np.int32)
    lfr = np.zeros((P,), np.int32)
    flens = np.zeros((P,), np.int32)
    feats_chunks = []
    chunk_audio = []
    t0 = time.time()
    for idx in range(P):
        rng = np.random.default_rng(seed0 + idx)
        audio, _orth, lab = task.utterance(rng, 6, 10)
        audio = audio[:N]
        pad = np.zeros((N,), np.float32)
        pad[:len(audio)] = audio
        chunk_audio.append(pad)
        t = min(len(lab), T_feat)
        labels[idx, :t] = lab[:t]
        lfr[idx] = t
        flens[idx] = min(pipe.n_frames(len(audio)), T_feat)
        if len(chunk_audio) == 64 or idx == P - 1:
            lo = idx + 1 - len(chunk_audio)
            feats_chunks.append(feats_jit(
                jnp.asarray(np.stack(chunk_audio)),
                jnp.asarray(flens[lo:idx + 1])))
            chunk_audio = []
    feats = jnp.concatenate(feats_chunks, axis=0)
    print(f"pool: {P} utts, feats {feats.shape} ({time.time() - t0:.0f}s)",
          flush=True)
    return feats, flens, labels, lfr


def train_am(task, args, pipe, feats_of):
    """Train (or load cached) hybrid conformer AM; returns (model,
    params, log_priors, train_seconds, frame/phoneme accuracy)."""
    import jax
    import jax.numpy as jnp

    from rasr_tpu.models.hybrid import HybridConformerAm
    from rasr_tpu.nn.checkpoint import load_params, save_params
    from rasr_tpu.nn.hybrid_scorer import estimate_log_priors
    from rasr_tpu.nn.training import (FrameCeTrainer, make_dynamic_optimizer,
                                      warmup_cosine)
    from rasr_tpu.parallel import make_mesh

    cfg = dict(n_classes=task.n_classes, d_model=args.d_model,
               n_layers=args.layers, n_heads=args.heads)
    model = HybridConformerAm(**cfg)
    key = (f"am_p{task.n_phonemes}_d{args.d_model}x{args.layers}"
           f"_s{args.steps}_b{args.batch}_v2")   # v2: 1-state silence labels
    ckpt = os.path.join(CACHE, key + ".msgpack")
    priors_path = os.path.join(CACHE, key + ".priors.npy")
    meta_path = os.path.join(CACHE, key + ".meta.json")
    if os.path.exists(ckpt) and os.path.exists(priors_path):
        template = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, FEAT_DIM)),
            jnp.asarray([8]))["params"]
        params, _ = load_params(ckpt, template)
        meta = json.load(open(meta_path)) if os.path.exists(meta_path) \
            else {}
        print(f"AM loaded from cache: {ckpt}", flush=True)
        return model, params, np.load(priors_path), meta.get("seconds", 0.0), \
            meta.get("acc", {})

    N = int(TRAIN_SECONDS * SAMPLE_RATE)
    T_feat = pipe.n_frames(N)
    feats_jit = jax.jit(lambda s, l: feats_of(s, T_feat, l))
    pool_feats, flens, labels, lfr = build_pool(
        task, pipe, feats_jit, args.pool, T_feat, N)
    mesh = make_mesh(n_devices=1)
    trainer = FrameCeTrainer(
        model, mesh, optimizer=make_dynamic_optimizer(),
        example_shape=(args.batch, T_feat, FEAT_DIM),
        lr_schedule=warmup_cosine(args.lr, 300, decay_steps=args.steps))
    rng = np.random.default_rng(0)
    flens_d = jnp.asarray(flens)
    labels_d = jnp.asarray(labels)
    lfr_d = jnp.asarray(lfr)
    t0 = time.time()
    for step in range(args.steps):
        idx = rng.integers(0, args.pool, size=args.batch)
        loss = trainer.train_step(pool_feats[idx], flens_d[idx],
                                  labels_d[idx], lfr_d[idx])
        if step % 200 == 0 or step == args.steps - 1:
            print(f"step {step}: loss {float(loss):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    train_seconds = time.time() - t0

    # held-out accuracy (disjoint seed stream)
    ev_feats, ev_flens, ev_labels, ev_lfr = build_pool(
        task, pipe, feats_jit, 32, T_feat, N, seed0=6_500_000)
    lp, _ = trainer.log_probs_fn()(trainer.params, ev_feats,
                                   jnp.asarray(ev_flens))
    pred = np.argmax(np.asarray(lp), -1)
    valid = np.arange(T_feat)[None, :] < ev_lfr[:, None]
    acc = {"state": float(((pred == ev_labels) & valid).sum()
                          / valid.sum()),
           "phoneme": float(((pred // 3 == ev_labels // 3) & valid).sum()
                            / valid.sum())}
    print(f"held-out acc: {acc}", flush=True)

    os.makedirs(CACHE, exist_ok=True)
    params = jax.device_get(trainer.params)
    save_params(ckpt, params)
    priors = estimate_log_priors(labels, lfr, task.n_classes)
    np.save(priors_path, priors)
    json.dump({"seconds": train_seconds, "acc": acc}, open(meta_path, "w"))
    return model, params, priors, train_seconds, acc


def make_scorer(task, args, model, params, priors, pipe, feats_of):
    from rasr_tpu.nn.hybrid_scorer import HybridEmissionScorer
    return HybridEmissionScorer(
        model, params, priors, prior_scale=args.prior_scale,
        am_scale=1.0, feat_bucket=args.feat_bucket,
        frontend=feats_of, n_frames_fn=pipe.n_frames,
        frame_samples=task.frame_samples)


def make_search(task, lm, args, lm_scale):
    from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
    return WordConditionedTreeSearch(
        task.am, lm=lm, lm_scale=lm_scale,
        beam_size=args.beam, word_end_beam_size=args.word_end_beam,
        score_threshold=args.threshold,
        lm_lookahead=True, lm_lookahead_slots=args.lookahead_slots,
        lm_lookahead_min_hyps=8, lm_lookahead_max_fills=16,
        acoustic_lookahead=args.acoustic_lookahead,
        acoustic_lookahead_scale=0.5)


def decode_set(task, search, scorer, seeds, min_w, max_w, snr_db=None):
    """End-to-end decode: raw audio -> device emissions (pipelined) ->
    host search.  Returns (wer, audio_seconds, wall_seconds, stats)."""
    from rasr_tpu.bliss.evaluation import Evaluator
    utts = []
    for sd in seeds:
        rng = np.random.default_rng(sd)
        audio, orth, _lab = task.utterance(rng, min_w, max_w,
                                           snr_db=snr_db)
        utts.append((audio, orth))
    audio_seconds = sum(len(a) for a, _o in utts) / SAMPLE_RATE
    ev = Evaluator("hybrid")
    err = ref_len = 0
    stats_sum = {}
    # warm every device program shape OUTSIDE the timed loop: XLA
    # compiles are a one-time cost per shape (cached on disk), not
    # decode work — the reference pays tree/LM image builds the same
    # way (MappedArchive caches, PersistentStateTree).  score_batch
    # buckets by length, so running it once over silent audio of the
    # same lengths compiles exactly the shapes the timed loop uses.
    for _ in scorer.score_batch([np.zeros(len(a), np.float32)
                                 for a, _o in utts]):
        pass
    scorer.blocked_seconds = 0.0
    t0 = time.perf_counter()
    hyps = []
    # bucket-batched forwards, all dispatched up front: one device
    # program per ~32 utterances amortizes the remote-call latency
    # (BatchFeatureScorer semantics) while the host search drains
    for scores in scorer.score_batch([a for a, _o in utts]):
        search.reset()
        search.set_lookahead_scores(scores)
        if search.dynamic_beam is not None:
            search.dynamic_beam.reset()
        for t in range(scores.shape[0]):
            search.feed(scores[t])
        hyps.append(search.best_words())
        for k, v in search.statistics.summary().items():
            s = stats_sum.setdefault(k, [0.0, 0])
            s[0] += v["avg"]
            s[1] += 1
    wall = time.perf_counter() - t0
    for (a, orth), hyp in zip(utts, hyps):
        counts = ev.evaluate(orth, " ".join(hyp))
        err += counts.errors
        ref_len += counts.ref_len
    stats = {k: round(v[0] / max(v[1], 1), 1) for k, v in stats_sum.items()}
    return err / max(ref_len, 1), audio_seconds, wall, stats


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=100_000)
    ap.add_argument("--phonemes", type=int, default=42)
    ap.add_argument("--branching", type=int, default=20)
    ap.add_argument("--tokens", type=int, default=4_000_000)
    ap.add_argument("--utterances", type=int, default=20)
    ap.add_argument("--dev-utterances", type=int, default=4)
    ap.add_argument("--beam", type=int, default=4096)
    ap.add_argument("--word-end-beam", type=int, default=192)
    ap.add_argument("--threshold", type=float, default=32.0)
    ap.add_argument("--lookahead-slots", type=int, default=192)
    ap.add_argument("--acoustic-lookahead", type=int, default=6)
    ap.add_argument("--lm-scales", type=float, nargs="+",
                    default=[2.0, 4.0, 8.0])
    ap.add_argument("--prior-scale", type=float, default=0.5)
    ap.add_argument("--snr-db", type=float, default=None,
                    help="babble SNR for dev/eval utterances (train "
                         "stays clean); de-saturates the WER anchor")
    ap.add_argument("--feat-bucket", type=int, default=256)
    ap.add_argument("--pool", type=int, default=768)
    ap.add_argument("--steps", type=int, default=2500)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--out", default="HYBRID_BENCH.json")
    args = ap.parse_args()

    import jax
    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rasr_tpu.data.synth_hybrid import HybridSynthTask
    from rasr_tpu.lm import ArpaLm

    os.makedirs(CACHE, exist_ok=True)
    t0 = time.perf_counter()
    task = HybridSynthTask(n_words=args.words, n_phonemes=args.phonemes,
                           branching=args.branching)
    t_task = time.perf_counter() - t0
    print(f"task: {args.words} words / {task.n_classes} tied states "
          f"({t_task:.1f}s)", flush=True)

    arpa_path = os.path.join(
        CACHE, f"hyb_{args.words}_{args.tokens}_{args.branching}.arpa")
    if not os.path.exists(arpa_path):
        t0 = time.perf_counter()
        info = task.write_arpa(arpa_path, n_tokens=args.tokens, order=4)
        print(f"ARPA: {info['ngram_counts']} "
              f"({time.perf_counter() - t0:.0f}s)", flush=True)
    t0 = time.perf_counter()
    lm = ArpaLm(arpa_path)
    t_lm = time.perf_counter() - t0
    ngram_counts = [lm.ngram_count(k) for k in range(1, lm.order + 1)]
    print(f"LM: {ngram_counts} ({t_lm:.1f}s)", flush=True)

    pipe, feats_of = feature_pipeline()
    model, params, priors, train_seconds, acc = train_am(
        task, args, pipe, feats_of)
    scorer = make_scorer(task, args, model, params, priors, pipe, feats_of)

    # dev-tune the LM scale on a tiny disjoint dev set
    dev_seeds = [9_100_000 + i for i in range(args.dev_utterances)]
    best = None
    t0 = time.perf_counter()
    search = None
    for s in args.lm_scales:
        search = make_search(task, lm, args, s)
        wer, _a, _w, _st = decode_set(task, search, scorer, dev_seeds,
                                      8, 14, snr_db=args.snr_db)
        print(f"dev lm-scale {s}: WER {wer:.4f}", flush=True)
        if best is None or wer < best[1]:
            best = (s, wer)
    t_tune = time.perf_counter() - t0
    lm_scale = best[0]
    print(f"picked lm-scale {lm_scale} (dev WER {best[1]:.4f}, "
          f"{t_tune:.0f}s)", flush=True)

    t0 = time.perf_counter()
    search = make_search(task, lm, args, lm_scale)
    t_tree = time.perf_counter() - t0

    eval_seeds = [9_500_000 + i for i in range(args.utterances)]
    wer, audio_seconds, wall, stats = decode_set(
        task, search, scorer, eval_seeds, 8, 18, snr_db=args.snr_db)
    la = search._lmla
    result = {
        "task": "hybrid NN-HMM recognition end to end (BASELINE config 3)",
        "am": {"arch": f"conformer d{args.d_model} x{args.layers}",
               "params_m": round(sum(
                   int(np.prod(np.asarray(x).shape))
                   for x in jax.tree_util.tree_leaves(params)) / 1e6, 1),
               "tied_states": task.n_classes,
               "train_seconds": round(train_seconds, 0),
               "heldout_accuracy": acc},
        "vocab_words": args.words,
        "ngram_counts": ngram_counts,
        "lm_order": lm.order,
        "lm_scale": lm_scale,
        "prior_scale": args.prior_scale,
        "tree_nodes": len(search.tree.nodes),
        "hmm_states": int(search.net.n_states),
        "lookahead_nodes": int(la.n_la) if la else 0,
        "beam": args.beam,
        "word_end_beam": args.word_end_beam,
        "score_threshold": args.threshold,
        "eval_utterances": args.utterances,
        "eval_snr_db": args.snr_db,
        "audio_seconds": round(audio_seconds, 2),
        "wall_seconds_end_to_end": round(wall, 2),
        "rtf": round(wall / audio_seconds, 4),
        "x_real_time": round(audio_seconds / wall, 2),
        "wer": round(wer, 4),
        "device_blocked_seconds": round(scorer.blocked_seconds, 3),
        "device_blocked_share": round(scorer.blocked_seconds / wall, 4),
        "search_space": stats,
        "lookahead": {
            "tables_filled": la.n_fills if la else 0,
            "fill_seconds_total": round(la.fill_seconds, 3) if la else 0,
        },
        "build_seconds": {"lexicon": round(t_task, 1),
                          "lm_trie": round(t_lm, 1),
                          "tree": round(t_tree, 1)},
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
