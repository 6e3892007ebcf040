"""lm-util: language model utility (reference src/Tools/Lm/LmUtilityTool.cc).

Actions:
    --action=score-sentences  score a text file (one sentence per line)
                              with perplexity report
    --action=info             print LM statistics

Config: [*.lm] type = ARPA|zerogram, file = lm.arpa, scale = 1.0
"""

from __future__ import annotations

import math
import sys

from ..core.application import Application
from ..lm.arpa import ArpaLm, Zerogram


class LmUtilApp(Application):
    def __init__(self, argv=None):
        super().__init__("lm-util", argv)

    def _load_lm(self):
        lm_cfg = self.config.sub("lm")
        typ = lm_cfg.get("type") or "ARPA"
        if typ in ("ARPA", "arpa"):
            return ArpaLm(lm_cfg.get("file"))
        raise ValueError(f"unsupported lm type {typ!r}")

    def run(self) -> int:
        action = self.config.get("action") or "info"
        lm = self._load_lm()
        if action == "info":
            counts = [lm.ngram_count(k) for k in range(1, lm.order + 1)]
            print(f"order={lm.order} " +
                  " ".join(f"{i + 1}-grams={c}" for i, c in enumerate(counts)))
            return 0
        if action == "score-sentences":
            path = self.config.get("file")
            total_score, total_tokens, n_sent = 0.0, 0, 0
            with open(path, "r", encoding="utf-8") as fh:
                for line in fh:
                    tokens = line.split()
                    if not tokens:
                        continue
                    score = lm.sequence_score(tokens)
                    total_score += score
                    total_tokens += len(tokens) + 1  # + sentence end
                    n_sent += 1
                    self.log("score %.4f : %s", score, " ".join(tokens))
            avg = total_score / max(total_tokens, 1)
            ppl = math.exp(avg) if avg < 700 else math.inf
            print(f"sentences={n_sent} tokens={total_tokens} "
                  f"total-score={total_score:.4f} perplexity={ppl:.4f}")
            return 0
        raise ValueError(f"unknown action {action!r}")


def main(argv=None) -> int:
    return LmUtilApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
