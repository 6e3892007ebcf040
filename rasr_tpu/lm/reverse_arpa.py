"""Reverse an ARPA language model for right-to-left decoding.

Reference: src/Lm/ReverseArpaLm.hh reverseArpaLm (used for backward
decoding / reversed-lattice rescoring).  Construction: every forward
n-gram (w1..wn) contributes the reversed n-gram (wn..w1) with

    p_rev(w1 | wn..w2) = p_joint(w1..wn) / p_joint(w2..wn)

(joints evaluated with forward back-off), with <s> and </s> swapping
roles.  Back-off weights are recomputed exactly per context from the
explicit successor mass:

    bow(c) = (1 - sum_{w in S(c)} p_rev(w | c))
             / (1 - sum_{w in S(c)} p_rev(w | backoff(c)))

which normalizes every context without enumerating the vocabulary.

The construction works over plain per-order dicts and assembles the
trie-backed ArpaLm at the end (ArpaLm.from_ngram_dicts).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

from .arpa import LN10, SENTENCE_BEGIN, SENTENCE_END, ArpaLm

NgramTable = List[Dict[Tuple[str, ...], Tuple[float, float]]]


def _swap_bos_eos(token: str) -> str:
    if token == SENTENCE_BEGIN:
        return SENTENCE_END
    if token == SENTENCE_END:
        return SENTENCE_BEGIN
    return token


def _joint(lm: ArpaLm, tokens: Tuple[str, ...]) -> float:
    """-ln p(w1..wn) by the forward chain rule with back-off.

    Boundary rules that make the reversed telescope product equal the
    forward sentence probability exactly: a leading <s> is given
    (probability 1), and the bare (</s>,) sequence — which appears only
    as the denominator of the reversed sentence's first factor — has
    joint 1."""
    if tokens == (SENTENCE_END,):
        return 0.0
    total = 0.0
    for i, w in enumerate(tokens):
        if i == 0 and w == SENTENCE_BEGIN:
            continue
        total += lm.score(tokens[:i], w)
    return total


def reverse_arpa(lm: ArpaLm) -> ArpaLm:
    """Build the reversed backing-off model from a loaded forward model."""
    tables: NgramTable = [dict() for _ in range(lm.order)]
    # conditionals from joint ratios
    for order in range(1, lm.order + 1):
        for tokens, _s, _b in lm.iter_ngrams(order):
            r = tuple(_swap_bos_eos(t) for t in reversed(tokens))
            joint = _joint(lm, tokens)
            ctx_joint = _joint(lm, tokens[1:]) if order > 1 else 0.0
            cond = joint - ctx_joint
            # <s> in the reversed model (i.e. forward </s> leading) is a
            # context-only token, probability bookkeeping 0 like forward <s>
            if order == 1 and r[0] == SENTENCE_BEGIN:
                cond = 99 * LN10
            tables[order - 1][r] = (cond, 0.0)

    # exact back-off weights, low orders first (bow(c) uses the
    # already-final lower-order conditionals)
    for order in range(1, lm.order):
        # successors per context of length `order`
        succ: Dict[Tuple[str, ...], List[str]] = {}
        for tokens in tables[order]:
            succ.setdefault(tokens[:-1], []).append(tokens[-1])
        for ctx, words in succ.items():
            explicit = 0.0
            backed = 0.0
            for w in words:
                explicit += math.exp(-tables[order][ctx + (w,)][0])
                backed += math.exp(-_table_score(tables, ctx[1:], w))
            num = max(1.0 - explicit, 1e-12)
            den = max(1.0 - backed, 1e-12)
            bow = -math.log(num / den)
            p, _ = tables[order - 1].get(ctx, (None, 0.0))
            if p is None:
                # context exists only as a context: give it a floor prob
                tables[order - 1][ctx] = (99 * LN10, bow)
            else:
                tables[order - 1][ctx] = (p, bow)
    return ArpaLm.from_ngram_dicts(tables, unknown_token=lm.unknown)


def _table_score(tables: NgramTable, history: Tuple[str, ...],
                 token: str) -> float:
    """Backing-off score within the partially built reversed tables."""
    h = history
    total = 0.0
    while True:
        entry = tables[len(h)].get(h + (token,)) \
            if len(h) < len(tables) else None
        if entry is not None:
            return total + entry[0]
        if not h:
            return 1e30
        ctx = tables[len(h) - 1].get(h)
        if ctx is not None:
            total += ctx[1]
        h = h[1:]


def write_arpa(lm: ArpaLm, path: str) -> None:
    """Serialize a (reversed) model back to ARPA text."""
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\\data\\\n")
        for order in range(1, lm.order + 1):
            fh.write(f"ngram {order}={lm.ngram_count(order)}\n")
        for order in range(1, lm.order + 1):
            fh.write(f"\n\\{order}-grams:\n")
            for tokens, score, bow in sorted(lm.iter_ngrams(order)):
                log10p = -score / LN10
                line = f"{log10p:.7f}\t{' '.join(tokens)}"
                if order < lm.order and bow != 0.0:
                    line += f"\t{-bow / LN10:.7f}"
                fh.write(line + "\n")
        fh.write("\n\\end\\\n")


def reverse_arpa_file(src_path: str, dst_path: str) -> None:
    """File-to-file variant (Lm::reverseArpaLm signature)."""
    lm = ArpaLm(src_path)
    write_arpa(reverse_arpa(lm), dst_path)
