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


def _dct_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Orthonormal DCT-II (n_in -> n_out) for compact CART statistics."""
    n = np.arange(n_in)
    k = np.arange(n_out)[:, None]
    m = np.cos(np.pi / n_in * (n[None, :] + 0.5) * k) \
        * np.sqrt(2.0 / n_in)
    m[0] *= np.sqrt(0.5)
    return m.astype(np.float32)


def build_cart(task, args, pipe, feats_of):
    """Accumulate per-allophone-state Gaussian statistics from oracle-
    aligned synthetic frames and train the phonetic decision tree
    (reference CART state tying, src/Am/ClassicStateTying.hh:223,
    src/Cart/DecisionTreeTrainer.hh:119).  Returns (tying, tree) and
    switches the task's frame labeling to the tied classes."""
    import jax
    import jax.numpy as jnp

    from rasr_tpu.am.acoustic_model import CartStateTying
    from rasr_tpu.cart.decision_tree import (DecisionTree,
                                             DecisionTreeTrainer, Example,
                                             phonetic_questions)

    key = (f"cart_p{task.n_phonemes}_c{task.coarticulation}"
           f"{getattr(task, 'cache_tag', '')}"
           f"_n{args.cart_pool}_l{args.cart_leaves}_o{args.cart_min_obs}"
           f"_v1")
    tree_path = os.path.join(CACHE, key + ".tree.xml.gz")
    inv = task.am.lexicon.phoneme_inventory
    if os.path.exists(tree_path):
        tree = DecisionTree.read_xml(tree_path)
        print(f"CART loaded from cache: {tree_path} "
              f"({tree.n_classes} classes)", flush=True)
    else:
        t0 = time.time()
        # -- accumulate: intern every (c, l, r, state) allophone state
        # seen in an oracle-aligned pool; Gaussian stats over DCT-24 of
        # the log-mel frames
        index: dict = {}
        keys_list: list = []

        def intern(c, l, r, s, _b):
            k = (c, l, r, s)
            i = index.get(k)
            if i is None:
                i = len(keys_list)
                index[k] = i
                keys_list.append(k)
            return i

        task.label_fn = intern
        N = int(TRAIN_SECONDS * SAMPLE_RATE)
        T_feat = pipe.n_frames(N)
        dct = _dct_matrix(FEAT_DIM, 24)
        feats_jit = jax.jit(
            lambda s, l: feats_of(s, T_feat, l) @ dct.T)
        counts = np.zeros(0, np.float64)
        sx = np.zeros((0, 24), np.float64)
        sx2 = np.zeros((0, 24), np.float64)
        chunk_audio, chunk_labs = [], []

        def flush():
            nonlocal counts, sx, sx2
            if not chunk_audio:
                return
            lens = np.asarray([len(l) for l in chunk_labs], np.int32)
            f = np.asarray(feats_jit(
                jnp.asarray(np.stack(chunk_audio)), jnp.asarray(lens)))
            n_ids = len(keys_list)
            if n_ids > len(counts):
                counts = np.concatenate(
                    [counts, np.zeros(n_ids - len(counts))])
                sx = np.concatenate(
                    [sx, np.zeros((n_ids - len(sx), 24))])
                sx2 = np.concatenate(
                    [sx2, np.zeros((n_ids - len(sx2), 24))])
            for i, labs in enumerate(chunk_labs):
                t = min(len(labs), T_feat)
                ids = np.asarray(labs[:t], np.int64)
                x = f[i, :t].astype(np.float64)
                counts += np.bincount(ids, minlength=n_ids)
                for d in range(24):
                    sx[:, d] += np.bincount(ids, weights=x[:, d],
                                            minlength=n_ids)
                    sx2[:, d] += np.bincount(ids, weights=x[:, d] ** 2,
                                             minlength=n_ids)
            chunk_audio.clear()
            chunk_labs.clear()

        for idx in range(args.cart_pool):
            rng = np.random.default_rng(4_200_000 + idx)
            audio, _orth, lab = task.utterance(rng, 6, 10)
            audio = audio[:N]
            pad = np.zeros((N,), np.float32)
            pad[:len(audio)] = audio
            chunk_audio.append(pad)
            chunk_labs.append(lab)
            if len(chunk_audio) == 64 or idx == args.cart_pool - 1:
                flush()
        task.label_fn = None

        def sym(pid):
            return inv.by_id(pid).symbol if pid else "#"

        examples = [Example(
            properties={"central": sym(c), "history[0]": sym(l),
                        "future[0]": sym(r), "state": s},
            count=float(counts[i]), sum_x=sx[i], sum_x2=sx2[i])
            for i, (c, l, r, s) in enumerate(keys_list)]
        # question set: singletons + confusable-pair classes + formant-
        # band classes (quartiles per formant) for generalization to
        # unseen triphones
        symbols = [inv.by_id(i).symbol for i in range(1, len(inv) + 1)]
        classes = {}
        for pair in range(task.n_phonemes // 2):
            classes[f"pair{pair}"] = {f"p{2 * pair}", f"p{2 * pair + 1}"}
        for f_idx in range(3):
            order = np.argsort(task.formants[:, f_idx])
            qn = len(order) // 4
            for q in range(4):
                members = order[q * qn:(q + 1) * qn if q < 3 else None]
                classes[f"f{f_idx}q{q}"] = {f"p{int(p)}" for p in members}
        questions = phonetic_questions(symbols, classes=classes)
        trainer = DecisionTreeTrainer(
            questions, min_examples=args.cart_min_obs,
            max_leaves=args.cart_leaves)
        tree = trainer.train(examples)
        os.makedirs(CACHE, exist_ok=True)
        tree.write_xml(tree_path)
        print(f"CART: {len(examples)} contexts -> {tree.n_classes} tied "
              f"classes ({time.time() - t0:.0f}s)", flush=True)

    tying = CartStateTying(tree, task.am.alphabet)
    table = tying._table
    task.label_fn = lambda c, l, r, s, b: int(table[c, l, r, s, b & 3])
    task.n_classes = tree.n_classes
    # report silence purity: the class of the silence allophone
    sil_cls = task.label_fn(task.sil_lex_id, 0, 0, 0, 3)
    print(f"CART tying: {tree.n_classes} classes, silence class "
          f"{sil_cls}", flush=True)
    return tying, tree


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
           f"_s{args.steps}_b{args.batch}_k{task.n_classes}"
           f"_c{task.coarticulation}{getattr(task, 'cache_tag', '')}"
           f"_v3")   # v3: plan-first rendering
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


def make_search(task, lm, args, lm_scale, am=None):
    from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
    tree_image = None
    if args.across_word:
        tree_image = os.path.join(
            CACHE, f"tree_xw_{args.words}_{task.n_classes}"
                   f"{getattr(task, 'cache_tag', '')}.npz")
    return WordConditionedTreeSearch(
        am or task.am, lm=lm, lm_scale=lm_scale,
        beam_size=args.beam, word_end_beam_size=args.word_end_beam,
        score_threshold=args.threshold,
        across_word=args.across_word, tree_image=tree_image,
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
    return err / max(ref_len, 1), audio_seconds, wall, stats, err, ref_len


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=100_000)
    ap.add_argument("--phonemes", type=int, default=42)
    ap.add_argument("--branching", type=int, default=20)
    ap.add_argument("--tokens", type=int, default=4_000_000)
    ap.add_argument("--utterances", type=int, default=240)
    ap.add_argument("--dev-utterances", type=int, default=6)
    ap.add_argument("--cart-leaves", type=int, default=1500,
                    help="CART-tied triphone inventory size (0 = "
                         "monophone tying, the pre-round-5 behavior)")
    ap.add_argument("--cart-pool", type=int, default=512)
    ap.add_argument("--cart-min-obs", type=float, default=150.0)
    ap.add_argument("--coart", type=float, default=0.35,
                    help="coarticulated rendering strength")
    ap.add_argument("--across-word", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--compare-monophone",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="additionally decode the same eval with a "
                         "monophone-tied AM (same arch/steps) to show "
                         "what the CART inventory buys")
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
                           branching=args.branching,
                           coarticulation=args.coart)
    t_task = time.perf_counter() - t0
    print(f"task: {args.words} words ({t_task:.1f}s)", flush=True)

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
    cart_tree = None
    decode_am = task.am
    t0 = time.perf_counter()
    if args.cart_leaves:
        import dataclasses
        tying, cart_tree = build_cart(task, args, pipe, feats_of)
        decode_am = dataclasses.replace(task.am, state_tying=tying)
    t_cart = time.perf_counter() - t0
    model, params, priors, train_seconds, acc = train_am(
        task, args, pipe, feats_of)
    scorer = make_scorer(task, args, model, params, priors, pipe, feats_of)
    tied_states = task.n_classes   # snapshot: the mono comparison
    #                                retrains with task.n_classes reset

    # dev-tune the LM scale on a tiny disjoint dev set (one search
    # instance; set_lm_scale retunes without rebuilding tree/lookahead)
    dev_seeds = [9_100_000 + i for i in range(args.dev_utterances)]
    t0 = time.perf_counter()
    search = make_search(task, lm, args, args.lm_scales[0], am=decode_am)
    t_tree = time.perf_counter() - t0
    best = None
    t0 = time.perf_counter()
    for s in args.lm_scales:
        search.set_lm_scale(s)
        wer, _a, _w, _st, _e, _r = decode_set(
            task, search, scorer, dev_seeds, 8, 14, snr_db=args.snr_db)
        print(f"dev lm-scale {s}: WER {wer:.4f}", flush=True)
        if best is None or wer < best[1]:
            best = (s, wer)
    t_tune = time.perf_counter() - t0
    lm_scale = best[0]
    print(f"picked lm-scale {lm_scale} (dev WER {best[1]:.4f}, "
          f"{t_tune:.0f}s)", flush=True)
    search.set_lm_scale(lm_scale)

    eval_seeds = [9_500_000 + i for i in range(args.utterances)]
    wer, audio_seconds, wall, stats, err, ref_len = decode_set(
        task, search, scorer, eval_seeds, 8, 18, snr_db=args.snr_db)

    mono = {}
    if args.compare_monophone and cart_tree is not None:
        # same eval with monophone tying: retrain labels + AM, decode
        # with the within-word monophone tree at the same pruning
        task.label_fn = None
        task.n_classes = 3 * (task.n_phonemes + 1)
        m_model, m_params, m_priors, _ts, m_acc = train_am(
            task, args, pipe, feats_of)
        m_scorer = make_scorer(task, args, m_model, m_params, m_priors,
                               pipe, feats_of)
        import argparse as _ap
        m_args = _ap.Namespace(**vars(args))
        m_args.across_word = False
        m_search = make_search(task, lm, m_args, lm_scale)
        m_wer, _a2, m_wall, _st2, m_err, m_ref = decode_set(
            task, m_search, m_scorer, eval_seeds, 8, 18,
            snr_db=args.snr_db)
        mono = {"monophone_wer": round(m_wer, 4),
                "monophone_errors": [int(m_err), int(m_ref)],
                "monophone_heldout_accuracy": m_acc,
                "monophone_x_real_time": round(audio_seconds / m_wall,
                                               2)}
    la = search._lmla
    # binomial 95% CI on the word error rate (Wilson interval over
    # ref_len trials with err successes)
    z = 1.959964
    nn = max(ref_len, 1)
    # WER counts insertions, so err can exceed ref_len; the binomial CI
    # is over the clamped per-word error probability
    ph = min(err / nn, 1.0)
    denom = 1.0 + z * z / nn
    center = (ph + z * z / (2 * nn)) / denom
    half = z * np.sqrt(ph * (1 - ph) / nn + z * z / (4 * nn * nn)) / denom
    result = {
        "task": "hybrid NN-HMM recognition end to end (BASELINE config 3)",
        "am": {"arch": f"conformer d{args.d_model} x{args.layers}",
               "params_m": round(sum(
                   int(np.prod(np.asarray(x).shape))
                   for x in jax.tree_util.tree_leaves(params)) / 1e6, 1),
               "tied_states": tied_states,
               "state_tying": ("cart-triphone" if cart_tree is not None
                               else "monophone"),
               "coarticulation": args.coart,
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
        "across_word": args.across_word,
        "eval_ref_words": int(ref_len),
        "eval_word_errors": int(err),
        "wer_ci95": [round(max(center - half, 0.0), 4),
                     round(center + half, 4)],
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
                          "cart": round(t_cart, 1),
                          "tree": round(t_tree, 1)},
        **mono,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
