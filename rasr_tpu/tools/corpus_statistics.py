"""corpus-statistics (costa): corpus statistics tool
(reference src/Tools/CorpusStatistics/Costa.cc).

Reports segment/recording counts, audio duration, orthography token
statistics, OOV rate against a lexicon (if configured).
"""

from __future__ import annotations

import json
import sys
from collections import Counter

from ..bliss.corpus import CorpusDescription
from ..bliss.lexicon import Lexicon
from ..core.application import Application


class CostaApp(Application):
    def __init__(self, argv=None):
        super().__init__("corpus-statistics", argv)

    def run(self) -> int:
        corpus = CorpusDescription(self.config.sub("corpus"))
        lex_file = self.config.sub("lexicon").get("file")
        lexicon = None
        if lex_file:
            lexicon = Lexicon()
            lexicon.load(lex_file)
        n_seg, duration, n_tokens = 0, 0.0, 0
        vocab = Counter()
        oov = Counter()
        recordings = set()
        for seg in corpus.segments():
            n_seg += 1
            duration += seg.duration
            recordings.add(seg.recording.full_name)
            for tok in seg.orth.split():
                n_tokens += 1
                vocab[tok] += 1
                if lexicon is not None and lexicon.lemma_by_orth(tok) is None:
                    oov[tok] += 1
        stats = {
            "corpus": corpus.name,
            "recordings": len(recordings),
            "segments": n_seg,
            "total-duration-s": round(duration, 2),
            "orth-tokens": n_tokens,
            "distinct-words": len(vocab),
        }
        if lexicon is not None:
            n_oov = sum(oov.values())
            stats["lexicon-size"] = len(lexicon.lemmas)
            stats["oov-tokens"] = n_oov
            stats["oov-rate"] = round(n_oov / n_tokens, 4) if n_tokens else 0.0
            stats["top-oov"] = [w for w, _ in oov.most_common(10)]
        print(json.dumps(stats, indent=2))
        return 0


def main(argv=None) -> int:
    return CostaApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
