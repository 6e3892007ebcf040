"""mt-aligner: bilingual word alignment tool
(reference: src/Tools/Aligner/Aligner.cc — zero-order / first-order
alignment models over a sentence-parallel corpus with an EM-trained
translation lexicon).

Models:
  zeroorder   IBM-1: positions align independently; EM over t(f|e)
              (ZeroOrderAlignAutomaton.cc semantics)
  simple      monotone grid Viterbi with (diagonal, horizontal, vertical)
              transition probabilities on top of the EM lexicon
              (SimpleAlignAutomaton.cc; --transitionProbs)

The E-step is batched: each sentence pair's posterior is one (I, J)
matrix normalization; the M-step is two scatter-adds — numpy throughout,
no per-word Python loops in the inner EM.

Outputs: Aachen alignment format ("SENT <n>" + "S <j> <i>" lines),
bilanguage corpus, and the trained lexicon as "src tgt prob" lines.

Usage:
  python -m rasr_tpu.tools.mt_aligner \
      --mt-aligner.source.file=src.txt --mt-aligner.target.file=tgt.txt \
      [--mt-aligner.model=simple] [--mt-aligner.iterations=5] \
      [--mt-aligner.transition-probs=0.6,0.2,0.2] \
      [--mt-aligner.output-aachen=out.A3] \
      [--mt-aligner.output-bilang=out.bi] \
      [--mt-aligner.output-lexicon=lex.txt]
"""

from __future__ import annotations

import sys
from typing import Dict, List, Tuple

import numpy as np

from ..core.application import Application


def build_vocab(sentences: List[List[str]]) -> Dict[str, int]:
    vocab: Dict[str, int] = {}
    for sent in sentences:
        for w in sent:
            if w not in vocab:
                vocab[w] = len(vocab)
    return vocab


class Ibm1Lexicon:
    """EM-trained t(f|e) translation table (IBM model 1), dense numpy."""

    def __init__(self, n_src: int, n_tgt: int, floor: float = 1e-8):
        self.n_src = n_src
        self.n_tgt = n_tgt
        self.floor = floor
        self.t = np.full((n_src, n_tgt), 1.0 / n_tgt, np.float64)

    def em_iteration(self, pairs: List[Tuple[np.ndarray, np.ndarray]]
                     ) -> float:
        counts = np.zeros_like(self.t)
        total_ll = 0.0
        for src, tgt in pairs:
            sub = self.t[np.ix_(src, tgt)]              # (I, J)
            denom = sub.sum(axis=0, keepdims=True)      # (1, J)
            denom = np.maximum(denom, 1e-300)
            post = sub / denom                          # P(i | j)
            np.add.at(counts, np.ix_(src, tgt), post)
            total_ll += np.log(denom).sum() - len(tgt) * np.log(len(src))
        sums = counts.sum(axis=1, keepdims=True)
        nonzero = sums[:, 0] > 0
        self.t[nonzero] = counts[nonzero] / sums[nonzero]
        self.t = np.maximum(self.t, self.floor)
        return total_ll

    def scores(self, src: np.ndarray, tgt: np.ndarray) -> np.ndarray:
        """(I, J) -log t(f_j | e_i)."""
        return -np.log(self.t[np.ix_(src, tgt)])


def viterbi_grid(score: np.ndarray, trans: Tuple[float, float, float]
                 ) -> List[Tuple[int, int]]:
    """Monotone path through the (I, J) lexicon score grid with
    diagonal / horizontal / vertical moves (SimpleAlignAutomaton):
    diagonal consumes (e_i, f_j), horizontal skips a target word against
    the same source word, vertical skips a source word.  Returns the
    aligned (i, j) pairs along the best path."""
    I, J = score.shape
    d, h, v = (-np.log(max(p, 1e-10)) for p in trans)
    INF = np.inf
    D = np.full((I + 1, J + 1), INF)
    back = np.zeros((I + 1, J + 1), np.int8)
    D[0, 0] = 0.0
    for i in range(I + 1):
        for j in range(J + 1):
            if i > 0 and j > 0:
                c = D[i - 1, j - 1] + d + score[i - 1, j - 1]
                if c < D[i, j]:
                    D[i, j], back[i, j] = c, 1
            if j > 0 and i > 0:
                c = D[i, j - 1] + h + score[i - 1, j - 1]
                if c < D[i, j]:
                    D[i, j], back[i, j] = c, 2
            if i > 0:
                c = D[i - 1, j] + v
                if c < D[i, j]:
                    D[i, j], back[i, j] = c, 3
    pairs = []
    i, j = I, J
    while i > 0 or j > 0:
        move = back[i, j]
        if move == 1:
            pairs.append((i - 1, j - 1))
            i, j = i - 1, j - 1
        elif move == 2:
            pairs.append((i - 1, j - 1))
            j -= 1
        elif move == 3:
            i -= 1
        else:
            break
    return pairs[::-1]


class MtAlignerApp(Application):
    def __init__(self, argv=None):
        super().__init__("mt-aligner", argv)

    def run(self) -> int:
        cfg = self.config
        src_path = cfg.sub("source").get("file")
        tgt_path = cfg.sub("target").get("file")
        if not src_path or not tgt_path:
            raise SystemExit("need --mt-aligner.source.file and "
                             "--mt-aligner.target.file")
        with open(src_path) as fh:
            src_sents = [line.split() for line in fh]
        with open(tgt_path) as fh:
            tgt_sents = [line.split() for line in fh]
        if len(src_sents) != len(tgt_sents):
            raise SystemExit("source/target corpora differ in length")
        pairs_txt = [(s, t) for s, t in zip(src_sents, tgt_sents)
                     if s and t]
        src_vocab = build_vocab([s for s, _ in pairs_txt])
        tgt_vocab = build_vocab([t for _, t in pairs_txt])
        pairs = [(np.asarray([src_vocab[w] for w in s], np.int32),
                  np.asarray([tgt_vocab[w] for w in t], np.int32))
                 for s, t in pairs_txt]

        lex = Ibm1Lexicon(len(src_vocab), len(tgt_vocab))
        iters = int(cfg.get("iterations") or 5)
        for it in range(iters):
            ll = lex.em_iteration(pairs)
            self.log("EM iteration %d log-likelihood %.2f", it + 1, ll)

        model = cfg.get("model") or "simple"
        tp = cfg.get("transition-probs") or "0.6,0.2,0.2"
        trans = tuple(float(x) for x in tp.split(","))

        alignments: List[List[Tuple[int, int]]] = []
        for src, tgt in pairs:
            score = lex.scores(src, tgt)
            if model == "zeroorder":
                best_i = score.argmin(axis=0)           # per target word
                alignments.append([(int(best_i[j]), j)
                                   for j in range(len(tgt))])
            elif model == "simple":
                alignments.append(viterbi_grid(score, trans))
            else:
                raise SystemExit(f"unknown model {model!r}")

        out = cfg.get("output-aachen")
        if out:
            with open(out, "w") as fh:
                for n, al in enumerate(alignments):
                    fh.write(f"SENT: {n}\n")
                    for (i, j) in al:
                        fh.write(f"S {j} {i}\n")
                    fh.write("\n")
            self.log("wrote %s", out)
        out = cfg.get("output-bilang")
        if out:
            with open(out, "w") as fh:
                for (s, t), al in zip(pairs_txt, alignments):
                    toks = [f"{s[i]}|{t[j]}" for (i, j) in al]
                    fh.write(" ".join(toks) + "\n")
            self.log("wrote %s", out)
        out = cfg.get("output-lexicon")
        if out:
            inv_s = {i: w for w, i in src_vocab.items()}
            inv_t = {i: w for w, i in tgt_vocab.items()}
            with open(out, "w") as fh:
                for i in range(lex.n_src):
                    top = np.argsort(-lex.t[i])[:8]
                    for j in top:
                        if lex.t[i, j] > 1e-4:
                            fh.write(f"{inv_s[i]} {inv_t[int(j)]} "
                                     f"{lex.t[i, int(j)]:.6f}\n")
            self.log("wrote %s", out)
        return 0


def main(argv=None) -> int:
    return MtAlignerApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
