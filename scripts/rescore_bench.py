"""Word-level recurrent-LM recognition proof (BASELINE config 4's NN-LM
leg).

The reference treats its RecurrentLanguageModel as a first-class
LanguageModel: trainable word-level recurrent LM used for (a) lattice
rescoring after a first pass with a backing-off n-gram and (b) directly
inside search (src/Lm/RecurrentLanguageModel.hh:89-196,
src/Flf/PushForwardRescoring.hh:24, src/Lm/Module.cc:66-73).  This
script proves both on a task where the neural LM has HONEST headroom:

  * language = TopicMarkovLanguage — a per-sentence hidden topic
    reweights the word chain.  The 4-gram sees only the topic mixture;
    an LSTM infers the topic from the sentence prefix, so its held-out
    NLL is strictly lower;
  * acoustics = the confusable-pair formant task under babble noise, so
    the LM choice decides real word errors;
  * stage 1: first-pass hybrid decode with the 4-gram -> lattices;
  * stage 2: k-best LM replacement over those lattices with the LSTM
    (push-forward semantics; the per-state-beam variant is exercised in
    tests/test_neural_lm_rescore.py) -> nnlm_rescored_wer;
  * stage 3: the LSTM as the FIRST-PASS LM of the same tree search
    (dense rows + LM lookahead, CPU-backend forwards so per-wave device
    latency never blocks the host loop) -> nnlm_first_pass_wer.

Writes RESCORE_BENCH.json.  Run: python scripts/rescore_bench.py
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
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import hybrid_bench as hb

CACHE = hb.CACHE




def masked_nll(model, params, toks, lens, reduce="mean"):
    """Masked next-token NLL over BOS-prefixed, EOS-terminated rows:
    toks (B, L+1) int32, lens (B,) = number of predicted positions.
    reduce="mean" -> scalar mean; "sum" -> (total, count);
    "per-row" -> (B,) row sums."""
    import jax
    import jax.numpy as jnp
    logits = model.apply({"params": params}, toks[:, :-1])
    lp = jax.nn.log_softmax(logits, -1)
    tgt = toks[:, 1:]
    valid = jnp.arange(tgt.shape[1])[None, :] < lens[:, None]
    nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
    if reduce == "per-row":
        return jnp.sum(nll * valid, axis=1)
    total = jnp.sum(nll * valid)
    if reduce == "sum":
        return total, valid.sum()
    return total / jnp.maximum(valid.sum(), 1)


def train_word_lm(task, args, corpus_sents):
    """Word-level LSTM trained on the SAME sampled corpus the 4-gram was
    counted from.  Returns (model, params, vocab)."""
    import jax
    import jax.numpy as jnp
    import optax

    from rasr_tpu.lm.neural import LstmLmModel
    from rasr_tpu.nn.checkpoint import load_params, save_params

    V = task.n_words
    vocab = [f"w{i}" for i in range(V)] + ["<s>", "</s>", "<unk>"]
    model = LstmLmModel(vocab_size=len(vocab), embed_dim=args.lm_embed,
                        hidden_dim=args.lm_hidden,
                        n_layers=args.lm_layers)
    key = (f"wordlm_v{V}_t{args.topics}a{args.topic_alpha}"
           f"f{args.topic_fraction}_k{args.tokens}_e{args.lm_embed}"
           f"_h{args.lm_hidden}x{args.lm_layers}_s{args.lm_steps}_v3")
    ckpt = os.path.join(CACHE, key + ".msgpack")
    if os.path.exists(ckpt):
        template = model.init(jax.random.PRNGKey(0),
                              jnp.zeros((1, 2), jnp.int32))["params"]
        params, _ = load_params(ckpt, template)
        print(f"word LM loaded from cache: {ckpt}", flush=True)
        return model, params, vocab

    BOS, EOS = V, V + 1
    L = args.lm_maxlen
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, L), jnp.int32))["params"]
    opt = optax.adamw(
        optax.warmup_cosine_decay_schedule(0.0, args.lm_lr, 300,
                                           args.lm_steps),
        weight_decay=1e-5)
    opt_state = opt.init(params)

    def make_batch(rng, size):
        toks = np.full((size, L + 1), EOS, np.int32)
        lens = np.zeros((size,), np.int32)
        toks[:, 0] = BOS
        for i in range(size):
            s = corpus_sents[int(rng.integers(0, len(corpus_sents)))]
            s = list(s[:L - 1])
            toks[i, 1:1 + len(s)] = s
            toks[i, 1 + len(s)] = EOS
            lens[i] = len(s) + 1          # predict words + </s>
        return toks, lens

    @jax.jit
    def train_step(p, o, toks, lens):
        loss, g = jax.value_and_grad(
            lambda p: masked_nll(model, p, toks, lens))(p)
        up, o = opt.update(g, o, p)
        return optax.apply_updates(p, up), o, loss

    rng = np.random.default_rng(11)
    t0 = time.time()
    for step in range(args.lm_steps):
        toks, lens = make_batch(rng, args.lm_batch)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(toks), jnp.asarray(lens))
        if step % 200 == 0 or step == args.lm_steps - 1:
            print(f"lm step {step}: nll {float(loss):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)
    os.makedirs(CACHE, exist_ok=True)
    save_params(ckpt, jax.device_get(params))
    return model, params, vocab


def heldout_nll(task, args, model, params, arpa):
    """Per-token held-out NLL (natural log, sentence end included) for
    the LSTM and the 4-gram on fresh topic-language sentences."""
    import jax
    import jax.numpy as jnp

    V = task.n_words
    BOS, EOS = V, V + 1
    L = args.lm_maxlen
    rng = np.random.default_rng(424242)
    sents = [task.language.sample_sentence(rng, 8, min(18, L - 1))
             for _ in range(args.nll_sentences)]

    def loss_sum(p, toks, lens):
        return masked_nll(model, p, toks, lens, reduce="sum")

    toks = np.full((len(sents), L + 1), EOS, np.int32)
    lens = np.zeros((len(sents),), np.int32)
    toks[:, 0] = BOS
    for i, s in enumerate(sents):
        toks[i, 1:1 + len(s)] = s
        toks[i, 1 + len(s)] = EOS
        lens[i] = len(s) + 1
    tot, cnt = jax.jit(loss_sum)(params, jnp.asarray(toks),
                                 jnp.asarray(lens))
    lstm_nll = float(tot) / float(cnt)

    total = n = 0.0
    for s in sents:
        tokens = [f"w{int(w)}" for w in s]
        total += arpa.sequence_score(tokens)   # includes </s>
        n += len(tokens) + 1
    return {"lstm": round(lstm_nll, 4), "ngram": round(total / n, 4),
            "sentences": len(sents)}


def decode_with_lattices(task, search, scorer, seeds, min_w, max_w,
                         snr_db):
    from rasr_tpu.bliss.evaluation import Evaluator
    utts = []
    for sd in seeds:
        rng = np.random.default_rng(sd)
        audio, orth, _lab = task.utterance(rng, min_w, max_w,
                                           snr_db=snr_db)
        utts.append((audio, orth))
    audio_seconds = sum(len(a) for a, _o in utts) / hb.SAMPLE_RATE
    for _ in scorer.score_batch([np.zeros(len(a), np.float32)
                                 for a, _o in utts]):
        pass
    t0 = time.perf_counter()
    hyps, lats = [], []
    for scores in scorer.score_batch([a for a, _o in utts]):
        search.reset()
        search.set_lookahead_scores(scores)
        for t in range(scores.shape[0]):
            search.feed(scores[t])
        hyps.append(search.best_words())
        lats.append(search.create_lattice())
    wall = time.perf_counter() - t0
    ev = Evaluator("rescore")
    err = ref = 0
    for (a, orth), hyp in zip(utts, hyps):
        c = ev.evaluate(orth, " ".join(hyp))
        err += c.errors
        ref += c.ref_len
    return (err / max(ref, 1), err, ref, hyps, lats, utts,
            audio_seconds, wall)


def collect_candidates(task, lats, arpa, lm4_scale, model, params,
                       n_paths=32):
    """Per lattice, the n best paths by FIRST-PASS combined score with a
    decomposed (am, lm4, nn) score triple per path — lm4 exact from the
    ARPA trie, nn = batched LSTM sequence NLL (both include </s>) — so
    interpolation weights grid-search without re-extraction
    (push-forward k-best semantics, src/Flf/RescoreLm.cc)."""
    import jax
    import jax.numpy as jnp

    from rasr_tpu.fsa.automaton import EPS

    V = task.n_words
    BOS, EOS = V, V + 1

    from rasr_tpu.fsa.automaton import (determinize, n_best,
                                        remove_epsilons)

    cand = []        # (utt_idx, token_ids, am, lm4_with_end)
    for i, lat in enumerate(lats):
        words = lat.words or {}
        # n-best over the DETERMINIZED word automaton: boundary-time
        # variants of one word sequence collapse to a single path
        # (min score), so the list holds n genuinely distinct
        # sequences instead of time jitter
        aut = remove_epsilons(lat.automaton(1.0, lm4_scale))
        det = determinize(aut)
        for labels, combined in n_best(det, n_paths):
            toks = [words[l] for l in labels
                    if l != EPS and words.get(l, "").startswith("w")]
            ids = [int(t[1:]) for t in toks]
            lm4_noend = arpa.sequence_score(toks, with_sentence_end=False)
            lm4 = arpa.sequence_score(toks)
            cand.append((i, ids, combined - lm4_scale * lm4_noend, lm4))

    L = max(max((len(ids) for _i, ids, _a, _l in cand), default=1), 1) + 1
    toks = np.full((len(cand), L + 1), EOS, np.int32)
    lens = np.zeros((len(cand),), np.int32)
    toks[:, 0] = BOS
    for j, (_i, ids, _a, _l) in enumerate(cand):
        toks[j, 1:1 + len(ids)] = ids
        toks[j, 1 + len(ids)] = EOS
        lens[j] = len(ids) + 1

    fn = jax.jit(lambda p, toks, lens: masked_nll(
        model, p, toks, lens, reduce="per-row"))
    scores = []
    for lo in range(0, len(cand), 512):
        hi = min(lo + 512, len(cand))
        scores.append(np.asarray(fn(
            params, jnp.asarray(toks[lo:hi]), jnp.asarray(lens[lo:hi]))))
    nn_nll = np.concatenate(scores) if scores else np.zeros(0)
    return [(i, ids, am, lm4, float(nn_nll[j]))
            for j, (i, ids, am, lm4) in enumerate(cand)]


def rescore_wer(cand, utts, lam4, lamnn):
    """WER after re-ranking with total = am + lam4*lm4 + lamnn*nn."""
    from rasr_tpu.bliss.evaluation import Evaluator
    best: dict = {}
    for i, ids, am, lm4, nn in cand:
        total = am + lam4 * lm4 + lamnn * nn
        if i not in best or total < best[i][0]:
            best[i] = (total, ids)
    ev = Evaluator("rescore-nn")
    err = ref = 0
    for i, (_a, orth) in enumerate(utts):
        ids = best.get(i, (0.0, []))[1]
        hyp = " ".join(f"w{w}" for w in ids)
        c = ev.evaluate(orth, hyp)
        err += c.errors
        ref += c.ref_len
    return err / max(ref, 1), err, ref


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=2000)
    ap.add_argument("--phonemes", type=int, default=42)
    ap.add_argument("--branching", type=int, default=30)
    ap.add_argument("--topics", type=int, default=8)
    ap.add_argument("--topic-alpha", type=float, default=0.08)
    ap.add_argument("--topic-fraction", type=float, default=0.35)
    ap.add_argument("--tokens", type=int, default=8_000_000)
    ap.add_argument("--utterances", type=int, default=120)
    ap.add_argument("--dev-utterances", type=int, default=6)
    ap.add_argument("--first-pass-utterances", type=int, default=40,
                    help="eval subset decoded with the LSTM as the "
                         "first-pass LM (host-latency-bound)")
    ap.add_argument("--snr-db", type=float, default=14.0)
    ap.add_argument("--beam", type=int, default=4096)
    ap.add_argument("--word-end-beam", type=int, default=192)
    ap.add_argument("--threshold", type=float, default=40.0)
    ap.add_argument("--lookahead-slots", type=int, default=96)
    ap.add_argument("--acoustic-lookahead", type=int, default=6)
    ap.add_argument("--lm-scales", type=float, nargs="+",
                    default=[2.0, 4.0, 8.0])
    ap.add_argument("--nn-scales", type=float, nargs="+",
                    default=[2.0, 4.0, 8.0])
    ap.add_argument("--prior-scale", type=float, default=0.5)
    ap.add_argument("--feat-bucket", type=int, default=256)
    ap.add_argument("--pool", type=int, default=512)
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=24)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--d-model", type=int, default=256)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--lm-embed", type=int, default=256)
    ap.add_argument("--lm-hidden", type=int, default=512)
    ap.add_argument("--lm-layers", type=int, default=2)
    ap.add_argument("--lm-steps", type=int, default=6000)
    ap.add_argument("--lm-batch", type=int, default=256)
    ap.add_argument("--lm-lr", type=float, default=3e-3)
    ap.add_argument("--lm-maxlen", type=int, default=24)
    ap.add_argument("--nll-sentences", type=int, default=512)
    ap.add_argument("--cart-leaves", type=int, default=0)  # monophone AM
    ap.add_argument("--coart", type=float, default=0.0)
    ap.add_argument("--across-word", action=argparse.BooleanOptionalAction,
                    default=False)
    ap.add_argument("--out", default="RESCORE_BENCH.json")
    args = ap.parse_args()

    import jax
    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_compile")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rasr_tpu.data.synth_hybrid import HybridSynthTask
    from rasr_tpu.data.synth_lm import TopicMarkovLanguage
    from rasr_tpu.lm import ArpaLm
    from rasr_tpu.lm.neural import NeuralLanguageModel

    os.makedirs(CACHE, exist_ok=True)
    task = HybridSynthTask(n_words=args.words, n_phonemes=args.phonemes,
                           branching=args.branching, twin_words=True)
    task.language = TopicMarkovLanguage(
        args.words, branching=args.branching, seed=2,
        n_topics=args.topics, topic_alpha=args.topic_alpha,
        topic_fraction=args.topic_fraction)
    print(f"task: {args.words} words, {args.topics} topics", flush=True)

    arpa_path = os.path.join(
        CACHE, f"topic_{args.words}_{args.tokens}_{args.branching}"
               f"_{args.topics}_{args.topic_alpha}"
               f"_{args.topic_fraction}.arpa")
    corpus_sents = task.language.sample_corpus(args.tokens, seed=3)
    if not os.path.exists(arpa_path):
        from rasr_tpu.data.synth_lm import count_ngrams, write_arpa
        t0 = time.perf_counter()
        nd = count_ngrams(corpus_sents, 4, args.words)
        write_arpa(arpa_path, nd, args.words)
        print(f"ARPA built ({time.perf_counter() - t0:.0f}s)", flush=True)
    arpa = ArpaLm(arpa_path)
    print(f"LM: {[arpa.ngram_count(k) for k in range(1, 5)]}", flush=True)

    model, params, vocab = train_word_lm(task, args, corpus_sents)
    nll = heldout_nll(task, args, model, params, arpa)
    print(f"held-out NLL/token: {nll}", flush=True)

    pipe, feats_of = hb.feature_pipeline()
    am_model, am_params, priors, train_seconds, acc = hb.train_am(
        task, args, pipe, feats_of)
    scorer = hb.make_scorer(task, args, am_model, am_params, priors,
                            pipe, feats_of)

    # ---- first pass: tune the 4-gram scale on dev
    dev_seeds = [12_100_000 + i for i in range(args.dev_utterances)]
    best = None
    for s in args.lm_scales:
        search = hb.make_search(task, arpa, args, s)
        wer, *_rest = decode_with_lattices(
            task, search, scorer, dev_seeds, 8, 14, args.snr_db)
        print(f"dev lm-scale {s}: WER {wer:.4f}", flush=True)
        if best is None or wer < best[1]:
            best = (s, wer)
    lm4_scale = best[0]

    eval_seeds = [12_500_000 + i for i in range(args.utterances)]
    search = hb.make_search(task, arpa, args, lm4_scale)
    (fp_wer, fp_err, fp_ref, _hyps, lats, utts, audio_s,
     fp_wall) = decode_with_lattices(
        task, search, scorer, eval_seeds, 8, 16, args.snr_db)
    print(f"first pass (4-gram @ {lm4_scale}): WER {fp_wer:.4f} "
          f"({audio_s / fp_wall:.1f}x RT)", flush=True)

    # ---- rescoring: grid the interpolation weights on the dev lattices
    # (total = am + lam4 * lm4 + lamnn * lstm; lamnn = 0 recovers the
    # pure 4-gram re-rank baseline)
    dsearch = hb.make_search(task, arpa, args, lm4_scale)
    (_w, _e, _r, _h, dev_lats, dev_utts, _a,
     _wl) = decode_with_lattices(
        task, dsearch, scorer, dev_seeds, 8, 14, args.snr_db)
    dev_cand = collect_candidates(task, dev_lats, arpa, lm4_scale,
                                  model, params)
    best_nn = None
    for lam4 in [0.0, 0.5 * lm4_scale, lm4_scale]:
        for lamnn in [0.0] + list(args.nn_scales):
            w, _e2, _r2 = rescore_wer(dev_cand, dev_utts, lam4, lamnn)
            print(f"dev lam4 {lam4} lamnn {lamnn}: WER {w:.4f}",
                  flush=True)
            if best_nn is None or w < best_nn[2]                     or (w == best_nn[2] and lamnn > 0 and
                        best_nn[1] == 0):
                best_nn = (lam4, lamnn, w)
    lam4, nn_scale = best_nn[0], best_nn[1]

    t0 = time.perf_counter()
    cand = collect_candidates(task, lats, arpa, lm4_scale, model, params)
    rs_wer, rs_err, rs_ref = rescore_wer(cand, utts, lam4, nn_scale)
    # the pure-4-gram re-rank over the same n-best (sanity row: rescoring
    # machinery minus the neural LM)
    rr4_wer, _e4, _r4 = rescore_wer(cand, utts, lm4_scale, 0.0)
    rs_wall = time.perf_counter() - t0
    print(f"rescored (lam4 {lam4}, lstm {nn_scale}): WER {rs_wer:.4f} "
          f"(4-gram re-rank {rr4_wer:.4f}, {rs_wall:.1f}s)", flush=True)

    # ---- LSTM as the first-pass LM (CPU-backend forwards)
    nnlm = NeuralLanguageModel(model, jax.device_get(params), vocab,
                               backend="cpu")
    fp_subset = eval_seeds[:args.first_pass_utterances]
    nn_fp_scale = nn_scale if nn_scale > 0 else lm4_scale
    nn_search = hb.make_search(task, nnlm, args, nn_fp_scale)
    (nn_wer, nn_err, nn_ref, _h2, _l2, _u2, nn_audio,
     nn_wall) = decode_with_lattices(
        task, nn_search, scorer, fp_subset, 8, 16, args.snr_db)
    # the same subset under the 4-gram, for a like-for-like row
    sub_search = hb.make_search(task, arpa, args, lm4_scale)
    (sub_wer, _e3, _r3, _h3, _l3, _u3, _a3,
     _w3) = decode_with_lattices(
        task, sub_search, scorer, fp_subset, 8, 16, args.snr_db)
    print(f"first pass (LSTM @ {nn_fp_scale}): WER {nn_wer:.4f} vs 4-gram "
          f"{sub_wer:.4f} on the same {len(fp_subset)} utts "
          f"({nn_audio / nn_wall:.1f}x RT)", flush=True)

    result = {
        "task": "word-level recurrent LM rescoring + first-pass "
                "(BASELINE config 4 NN-LM leg)",
        "language": {"words": args.words, "topics": args.topics,
                     "corpus_tokens": args.tokens},
        "heldout_nll_per_token": nll,
        "word_lm": {"arch": f"lstm e{args.lm_embed} h{args.lm_hidden}",
                    "steps": args.lm_steps},
        "am_heldout_accuracy": acc,
        "eval_utterances": args.utterances,
        "eval_snr_db": args.snr_db,
        "lm4_scale": lm4_scale,
        "rescore_lam4": lam4,
        "nn_scale": nn_scale,
        "ngram_rerank_wer": round(rr4_wer, 4),
        "first_pass_wer": round(fp_wer, 4),
        "first_pass_errors": [fp_err, fp_ref],
        "nnlm_rescored_wer": round(rs_wer, 4),
        "nnlm_rescored_errors": [rs_err, rs_ref],
        "rescore_wall_seconds": round(rs_wall, 2),
        "first_pass_subset": {
            "utterances": len(fp_subset),
            "ngram_wer": round(sub_wer, 4),
            "nnlm_first_pass_wer": round(nn_wer, 4),
            "nnlm_first_pass_errors": [nn_err, nn_ref],
            "nnlm_x_real_time": round(nn_audio / nn_wall, 2),
        },
        "audio_seconds": round(audio_s, 1),
        "first_pass_x_real_time": round(audio_s / fp_wall, 2),
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
