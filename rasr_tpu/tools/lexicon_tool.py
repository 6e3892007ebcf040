"""lexicon-tool: Bliss lexicon manipulation CLI
(reference: src/Tools/Bliss/lextool.py + blissLexiconLib.py).

Actions (chained left to right):
  info                     lemma/pronunciation/phoneme counts (JSON)
  check                    consistency check: unknown phonemes, duplicate
                           orths, lemmata without pronunciation
  merge=<lex2.xml>         merge a second lexicon (new orths only)
  upper / lower            case-fold all orthographies
  dump-variants            print orth -> pronunciation lines
  from-vocab=<words.txt>   add one lemma per word (no pronunciation)
  prons-from=<dict.txt>    add pronunciations "word ph1 ph2 ..." per line
  write=<out.xml[.gz]>     write the lexicon as Bliss XML
  vocab=<out.txt>          write the sorted orth list

Usage:
  python -m rasr_tpu.tools.lexicon_tool \
      --lexicon-tool.lexicon.file=lex.xml check info write=out.xml
"""

from __future__ import annotations

import json
import sys
from collections import Counter

from ..bliss.lexicon import Lexicon, write_lexicon_xml
from ..core.application import Application


class LexiconToolApp(Application):
    def __init__(self, argv=None):
        super().__init__("lexicon-tool", argv)

    def _info(self, lex: Lexicon) -> None:
        print(json.dumps({
            "lemmas": len(lex.lemmas),
            "pronunciations": lex.n_pronunciations(),
            "phonemes": len(lex.phoneme_inventory),
            "special-lemmas": sorted(l.special for l in lex.lemmas
                                     if l.special),
            "orths": sum(len(l.orths) for l in lex.lemmas),
        }, indent=2))

    def _check(self, lex: Lexicon) -> int:
        problems = []
        orth_counts = Counter(o for l in lex.lemmas for o in l.orths)
        for orth, n in orth_counts.items():
            if n > 1:
                problems.append(f"orth {orth!r} appears in {n} lemmata")
        for lemma in lex.lemmas:
            if not lemma.special and not lemma.pronunciations:
                problems.append(
                    f"lemma {lemma.preferred_orth!r} has no pronunciation")
        for p in problems[:50]:
            print("check:", p)
        print(f"check: {len(problems)} problem(s)")
        return len(problems)

    def _merge(self, lex: Lexicon, other_path: str) -> None:
        other = Lexicon()
        other.load(other_path)
        for sym in [p.symbol for p in other.phoneme_inventory]:
            if sym not in lex.phoneme_inventory:
                lex.phoneme_inventory.add(
                    sym, other.phoneme_inventory.phoneme(
                        sym).context_dependent)
        for lemma in other.lemmas:
            if any(lex.lemma_by_orth(o) is not None for o in lemma.orths):
                continue
            new = lex.new_lemma(name=lemma.name, special=lemma.special)
            new.orths = list(lemma.orths)
            new.synt = None if lemma.synt is None else list(lemma.synt)
            new.evals = [list(e) for e in lemma.evals]
            inv_other = other.phoneme_inventory
            for lp in lemma.pronunciations:
                symbols = [inv_other.by_id(pid).symbol
                           for pid in lp.pronunciation.phonemes]
                lex.add_pronunciation(new, symbols, score=lp.score)
            lex._index(new)

    def _case_fold(self, lex: Lexicon, upper: bool) -> None:
        for lemma in lex.lemmas:
            lemma.orths = [(o.upper() if upper else o.lower())
                           for o in lemma.orths]
        lex._by_orth.clear()
        for lemma in lex.lemmas:
            lex._index(lemma)

    def run(self) -> int:
        lex = Lexicon()
        path = self.config.sub("lexicon").get("file")
        if path:
            lex.load(path)
        rc = 0
        for action in (self.arguments or ["info"]):
            op, _, arg = action.partition("=")
            if op == "info":
                self._info(lex)
            elif op == "check":
                rc = 1 if self._check(lex) else rc
            elif op == "merge":
                self._merge(lex, arg)
            elif op in ("upper", "lower"):
                self._case_fold(lex, op == "upper")
            elif op == "dump-variants":
                inv = lex.phoneme_inventory
                for lemma in lex.lemmas:
                    for lp in lemma.pronunciations:
                        phones = " ".join(inv.by_id(p).symbol
                                          for p in lp.pronunciation.phonemes)
                        print(f"{lemma.preferred_orth}\t{phones}")
            elif op == "from-vocab":
                with open(arg) as fh:
                    for line in fh:
                        word = line.strip()
                        if word and lex.lemma_by_orth(word) is None:
                            lemma = lex.new_lemma()
                            lemma.orths = [word]
                            lex._index(lemma)
            elif op == "prons-from":
                with open(arg) as fh:
                    for line in fh:
                        parts = line.split()
                        if len(parts) < 2:
                            continue
                        word, phones = parts[0], parts[1:]
                        lemma = lex.lemma_by_orth(word)
                        if lemma is None:
                            lemma = lex.new_lemma()
                            lemma.orths = [word]
                            lex._index(lemma)
                        for sym in phones:
                            if sym not in lex.phoneme_inventory:
                                lex.phoneme_inventory.add(sym)
                        lex.add_pronunciation(lemma, phones)
            elif op == "write":
                write_lexicon_xml(lex, arg)
                self.log("wrote %s", arg)
            elif op == "vocab":
                orths = sorted({o for l in lex.lemmas for o in l.orths})
                with open(arg, "w") as fh:
                    fh.write("\n".join(orths) + "\n")
            else:
                raise SystemExit(f"unknown action {action!r}")
        return rc


def main(argv=None) -> int:
    return LexiconToolApp(argv).main()


if __name__ == "__main__":
    sys.exit(main())
