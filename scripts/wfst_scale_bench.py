"""WFST decoder at production vocabulary (WFST_SCALE_BENCH.json).

The reference's WFST decoder pairs a compressed static network with
on-the-fly LM composition so the G expansion never materializes
(src/Search/Wfst/CompressedNetwork.hh:36, DynamicLmFst.cc,
src/Fsa/tCompose.cc lazy composition).  This artifact proves the same
architecture at scale: C o L built statically (triphone contexts with
word-boundary resets, HMM-expanded), the 4-gram composed on the fly by
the SoA BatchedDynamicLmDecoder, on the SAME 100k-word task as
SCALE_BENCH — with WER parity against the word-conditioned tree search.

Run: python scripts/wfst_scale_bench.py [--words 100000]
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

import jax  # noqa: E402  (CPU workload; pin before backend init)

jax.config.update("jax_platforms", "cpu")

CACHE = os.environ.get("RASR_SCALE_CACHE", "/root/.cache/rasr_scale")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--words", type=int, default=100_000)
    ap.add_argument("--phonemes", type=int, default=42)
    ap.add_argument("--tokens", type=int, default=4_000_000)
    ap.add_argument("--branching", type=int, default=20)
    ap.add_argument("--utterances", type=int, default=10)
    ap.add_argument("--beam", type=int, default=8192)
    ap.add_argument("--threshold", type=float, default=34.0)
    ap.add_argument("--lm-scale", type=float, default=3.0)
    ap.add_argument("--anticipation-cap", type=float, default=20.0)
    ap.add_argument("--tree-beam", type=int, default=6144)
    ap.add_argument("--tree-threshold", type=float, default=33.0)
    ap.add_argument("--out", default="WFST_SCALE_BENCH.json")
    args = ap.parse_args()

    from rasr_tpu.bliss.evaluation import Evaluator
    from rasr_tpu.data.synth_lm import (MarkovLanguage, count_ngrams,
                                        make_lexicon, synth_emissions,
                                        write_arpa)
    from rasr_tpu.lm import ArpaLm
    from rasr_tpu.search.hmm_timesync import WordConditionedTreeSearch
    from rasr_tpu.search.wfst import (BatchedDynamicLmDecoder, build_clg,
                                      expand_hmm)

    os.makedirs(CACHE, exist_ok=True)
    t0 = time.perf_counter()
    lex, am, prons = make_lexicon(args.words, n_phonemes=args.phonemes,
                                  seed=1)
    lang = MarkovLanguage(args.words, branching=args.branching, seed=2)
    t_lex = time.perf_counter() - t0
    arpa_path = os.path.join(
        CACHE, f"scale_{args.words}_{args.tokens}_{args.branching}.arpa")
    if not os.path.exists(arpa_path):
        sents = lang.sample_corpus(args.tokens, seed=3)
        nd = count_ngrams(sents, 4, args.words)
        write_arpa(arpa_path, nd, args.words)
    lm = ArpaLm(arpa_path)

    t0 = time.perf_counter()
    clg = build_clg(am, None)
    t_clg = time.perf_counter() - t0
    print(f"C o L: {clg.n_states} states / {clg.n_arcs} arcs "
          f"({t_clg:.0f}s)", flush=True)
    t0 = time.perf_counter()
    graph = expand_hmm(clg, am)
    t_hmm = time.perf_counter() - t0
    print(f"HMM graph: {graph.n_states} states / {graph.n_arcs} arcs "
          f"({t_hmm:.0f}s)", flush=True)
    t0 = time.perf_counter()
    dec = BatchedDynamicLmDecoder(
        graph, lm, lex, lm_scale=args.lm_scale, beam_size=args.beam,
        score_threshold=args.threshold,
        anticipation_cap=args.anticipation_cap,
        # monophone layout: emission class // states-per-phone
        emission_to_phone=lambda em: em // 3)
    t_flat = time.perf_counter() - t0
    print(f"flattened ({t_flat:.0f}s)", flush=True)

    tree = WordConditionedTreeSearch(
        am, lm=lm, lm_scale=args.lm_scale, beam_size=args.tree_beam,
        score_threshold=args.tree_threshold, lm_lookahead=True,
        lm_lookahead_slots=192, lm_lookahead_min_hyps=8,
        lm_lookahead_max_fills=16, acoustic_lookahead=6,
        acoustic_lookahead_scale=0.5)

    rng = np.random.default_rng(100)
    ev_w = Evaluator("wfst")
    ev_t = Evaluator("tree")
    wall_w = wall_t = 0.0
    frames = 0
    agree = 0
    for i in range(args.utterances):
        ws = lang.sample_sentence(rng, 8, 16)
        scores = synth_emissions(ws, prons, args.phonemes, rng)
        frames += scores.shape[0]
        ref = " ".join(f"w{int(w)}" for w in ws)
        t0 = time.perf_counter()
        hyp_w = dec.recognize(scores.astype(np.float64), lex)
        wall_w += time.perf_counter() - t0
        t0 = time.perf_counter()
        hyp_t = tree.recognize(scores)
        wall_t += time.perf_counter() - t0
        cw = ev_w.evaluate(ref, " ".join(hyp_w))
        ct = ev_t.evaluate(ref, " ".join(hyp_t))
        agree += int(hyp_w == hyp_t)
        print(f"utt {i}: T={scores.shape[0]} wfst {cw.errors}err "
              f"tree {ct.errors}err", flush=True)
    audio_s = frames / 100.0
    result = {
        "task": "WFST decoder at production vocabulary "
                "(static C o L + on-the-fly 4-gram)",
        "vocab_words": args.words,
        "graph": {"clg_states": clg.n_states, "clg_arcs": clg.n_arcs,
                  "hmm_states": graph.n_states, "hmm_arcs": graph.n_arcs,
                  "build_seconds": {"lexicon": round(t_lex, 1),
                                    "clg": round(t_clg, 1),
                                    "hmm": round(t_hmm, 1),
                                    "flatten": round(t_flat, 1)}},
        "beam": args.beam,
        "score_threshold": args.threshold,
        "utterances": args.utterances,
        "audio_seconds": round(audio_s, 2),
        "wfst_wer": round(ev_w.wer, 4),
        "wfst_x_real_time": round(audio_s / wall_w, 2),
        "tree_wer": round(ev_t.wer, 4),
        "tree_x_real_time": round(audio_s / wall_t, 2),
        "identical_hypotheses": agree,
    }
    with open(args.out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
