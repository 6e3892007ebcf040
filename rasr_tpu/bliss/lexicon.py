"""Bliss pronunciation lexicon.

Data model + parsers for the Bliss lexicon XML format and the plain
`vocab-text:` format (reference: src/Bliss/Lexicon.hh:63,125,280,
src/Bliss/LexiconParser.cc, doc/search_v2.rst:89-166).

A Lemma bundles orthographic forms, pronunciations, syntactic-token and
evaluation-token sequences; special lemmata (silence, blank,
sentence-begin/end, unknown) are marked with a ``special="..."`` attribute.
"""

from __future__ import annotations

import gzip
import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

from ..core.configuration import Configuration
from ..core.formats import split_qualifier
from ..core.parameter import ParameterBool, ParameterString


@dataclass(frozen=True)
class Phoneme:
    symbol: str
    id: int  # 1-based as in the reference (0 is reserved/invalid)
    context_dependent: bool = True  # variation: context|none


class PhonemeInventory:
    def __init__(self):
        self._phonemes: List[Phoneme] = []
        self._by_symbol: Dict[str, Phoneme] = {}

    def add(self, symbol: str, context_dependent: bool = True) -> Phoneme:
        if symbol in self._by_symbol:
            return self._by_symbol[symbol]
        ph = Phoneme(symbol, len(self._phonemes) + 1, context_dependent)
        self._phonemes.append(ph)
        self._by_symbol[symbol] = ph
        return ph

    def phoneme(self, symbol: str) -> Phoneme:
        return self._by_symbol[symbol]

    def __contains__(self, symbol: str) -> bool:
        return symbol in self._by_symbol

    def __len__(self) -> int:
        return len(self._phonemes)

    def __iter__(self):
        return iter(self._phonemes)

    def by_id(self, pid: int) -> Phoneme:
        return self._phonemes[pid - 1]


@dataclass
class Pronunciation:
    phonemes: Tuple[int, ...]  # phoneme ids

    def __len__(self):
        return len(self.phonemes)


@dataclass
class LemmaPronunciation:
    lemma: "Lemma"
    pronunciation: Pronunciation
    score: float = 0.0  # -log(weight)
    id: int = -1


@dataclass
class Lemma:
    id: int
    name: str = ""
    special: str = ""  # silence / blank / sentence-begin / sentence-end / unknown ...
    orths: List[str] = field(default_factory=list)
    pronunciations: List[LemmaPronunciation] = field(default_factory=list)
    synt: Optional[List[str]] = None  # None => same as preferred orth
    evals: List[List[str]] = field(default_factory=list)

    @property
    def preferred_orth(self) -> str:
        return self.orths[0] if self.orths else ""

    @property
    def syntactic_tokens(self) -> List[str]:
        if self.synt is not None:
            return self.synt
        # special lemmata default to the empty syntactic sequence — silence
        # does not consume the LM (reference src/Bliss/Lexicon.cc special
        # lemma defaults); sentence boundaries are handled by the search
        if self.special in ("silence", "blank"):
            return []
        return [self.preferred_orth] if self.orths else []

    @property
    def evaluation_tokens(self) -> List[List[str]]:
        if self.evals:
            return self.evals
        return [[self.preferred_orth]] if self.orths else [[]]


class Lexicon:
    param_file = ParameterString("file", "lexicon file (xml or vocab-text:)")
    param_normalize = ParameterBool(
        "normalize-pronunciation", "normalize pronunciation weights", True)

    def __init__(self, config: Optional[Configuration] = None):
        self.phoneme_inventory = PhonemeInventory()
        self.lemmas: List[Lemma] = []
        self._by_orth: Dict[str, List[Lemma]] = {}
        self._by_name: Dict[str, Lemma] = {}
        self._special: Dict[str, Lemma] = {}
        self._prons: List[LemmaPronunciation] = []
        if config is not None:
            path = self.param_file(config)
            if path:
                self.load(path, normalize=self.param_normalize(config))

    # -- construction -----------------------------------------------------

    @classmethod
    def create(cls, config: Configuration) -> "Lexicon":
        return cls(config)

    def load(self, path: str, normalize: bool = True) -> None:
        fmt, real = split_qualifier(path)
        if fmt in ("vocab-text", "vocab-txt"):
            self._load_vocab_text(real)
        else:
            self._load_xml(real, normalize)

    def _load_vocab_text(self, path: str) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt", encoding="utf-8") as fh:
            for line in fh:
                label = line.rstrip("\n")
                if not label:
                    continue
                ph = self.phoneme_inventory.add(label, context_dependent=False)
                lemma = self.new_lemma()
                lemma.orths.append(label)
                self.add_pronunciation(lemma, [label])
                self._index(lemma)

    def _load_xml(self, path: str, normalize: bool = True) -> None:
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as fh:
            root = ET.parse(fh).getroot()
        if root.tag != "lexicon":
            raise ValueError(f"{path}: root must be <lexicon>")
        for elem in root:
            if elem.tag == "phoneme-inventory":
                for ph in elem:
                    if ph.tag != "phoneme":
                        continue
                    symbol = ""
                    variation = "context"
                    for sub in ph:
                        if sub.tag == "symbol":
                            symbol = (sub.text or "").strip()
                        elif sub.tag == "variation":
                            variation = (sub.text or "context").strip()
                    if symbol:
                        self.phoneme_inventory.add(symbol, variation != "none")
            elif elem.tag == "lemma":
                self._parse_lemma(elem, normalize)

    def _parse_lemma(self, elem: ET.Element, normalize: bool) -> None:
        lemma = self.new_lemma(name=elem.get("name", ""),
                               special=elem.get("special", ""))
        raw_prons: List[Tuple[List[str], float]] = []
        for sub in elem:
            text = (sub.text or "").strip()
            if sub.tag == "orth":
                lemma.orths.append(" ".join(text.split()))
            elif sub.tag == "phon":
                weight = sub.get("weight")
                score = sub.get("score")
                if weight is not None and score is not None:
                    raise ValueError("cannot set both pronunciation weight and score")
                s = float(score) if score is not None else (
                    -math.log(float(weight)) if weight is not None else 0.0)
                raw_prons.append((text.split(), s))
            elif sub.tag == "synt":
                lemma.synt = [(t.text or "").strip() for t in sub if t.tag == "tok"]
            elif sub.tag == "eval":
                toks = [(t.text or "").strip() for t in sub if t.tag == "tok"]
                if toks or len(list(sub)) == 0 and not text:
                    lemma.evals.append(toks)
                elif text:
                    lemma.evals.append(text.split())
        if normalize and raw_prons:
            # normalize pronunciation weights to sum 1 (LexiconParser.cc
            # paramNormalizePronunciation, default true)
            weights = [math.exp(-s) for _, s in raw_prons]
            total = sum(weights)
            raw_prons = [(p, -math.log(w / total)) for (p, _), w in zip(raw_prons, weights)]
        for phon, score in raw_prons:
            self.add_pronunciation(lemma, phon, score)
        self._index(lemma)

    def new_lemma(self, name: str = "", special: str = "") -> Lemma:
        lemma = Lemma(id=len(self.lemmas), name=name, special=special)
        self.lemmas.append(lemma)
        if special:
            self._special[special] = lemma
        return lemma

    def add_pronunciation(self, lemma: Lemma, phoneme_symbols: Sequence[str],
                          score: float = 0.0) -> LemmaPronunciation:
        ids = tuple(self.phoneme_inventory.phoneme(s).id for s in phoneme_symbols)
        lp = LemmaPronunciation(lemma, Pronunciation(ids), score, id=len(self._prons))
        self._prons.append(lp)
        lemma.pronunciations.append(lp)
        return lp

    def _index(self, lemma: Lemma) -> None:
        for orth in lemma.orths:
            self._by_orth.setdefault(orth, []).append(lemma)
        if lemma.name:
            self._by_name[lemma.name] = lemma
        if lemma.special:
            self._special[lemma.special] = lemma
            # aliases as in the reference special-lemma handling
            if lemma.special == "sentence-boundary":
                self._special.setdefault("sentence-begin", lemma)
                self._special.setdefault("sentence-end", lemma)

    # -- lookup -------------------------------------------------------------

    def lemma_by_orth(self, orth: str) -> Optional[Lemma]:
        lemmas = self._by_orth.get(orth)
        return lemmas[0] if lemmas else None

    def lemmas_by_orth(self, orth: str) -> List[Lemma]:
        return self._by_orth.get(orth, [])

    def special_lemma(self, special: str) -> Optional[Lemma]:
        return self._special.get(special)

    def n_lemmas(self) -> int:
        return len(self.lemmas)

    def n_pronunciations(self) -> int:
        return len(self._prons)

    def pronunciations(self) -> List[LemmaPronunciation]:
        return list(self._prons)

    def __len__(self) -> int:
        return len(self.lemmas)


# ---------------------------------------------------------------------------
# lexicon writing (reference: the Bliss lexicon XML format written by
# src/Tools/Bliss/lextool.py / blissLexiconLib.py)
# ---------------------------------------------------------------------------


def write_lexicon_xml(lexicon: "Lexicon", path: str) -> None:
    """Write a Bliss lexicon XML file (gzip when path ends with .gz)."""
    import gzip

    def esc(s: str) -> str:
        return (s.replace("&", "&amp;").replace("<", "&lt;")
                .replace(">", "&gt;"))

    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "wt", encoding="utf-8") as fh:
        fh.write('<?xml version="1.0" encoding="utf-8"?>\n<lexicon>\n')
        fh.write('  <phoneme-inventory>\n')
        for ph in lexicon.phoneme_inventory:
            fh.write('    <phoneme>\n')
            fh.write(f'      <symbol>{esc(ph.symbol)}</symbol>\n')
            if not ph.context_dependent:
                fh.write('      <variation>none</variation>\n')
            fh.write('    </phoneme>\n')
        fh.write('  </phoneme-inventory>\n')
        inv = lexicon.phoneme_inventory
        for lemma in lexicon.lemmas:
            attr = f' special="{esc(lemma.special)}"' if lemma.special else ""
            fh.write(f'  <lemma{attr}>\n')
            for orth in lemma.orths:
                fh.write(f'    <orth>{esc(orth)}</orth>\n')
            for lp in lemma.pronunciations:
                symbols = " ".join(inv.by_id(pid).symbol
                                   for pid in lp.pronunciation.phonemes)
                import math
                if lp.score:
                    weight = math.exp(-lp.score)
                    fh.write(f'    <phon score="{lp.score:.6f}">'
                             f'{esc(symbols)}</phon>\n')
                else:
                    fh.write(f'    <phon>{esc(symbols)}</phon>\n')
            if lemma.synt is not None:
                fh.write('    <synt>')
                for tok in lemma.synt:
                    fh.write(f'<tok>{esc(tok)}</tok>')
                fh.write('</synt>\n')
            for ev in lemma.evals:
                fh.write('    <eval>')
                for tok in ev:
                    fh.write(f'<tok>{esc(tok)}</tok>')
                fh.write('</eval>\n')
            fh.write('  </lemma>\n')
        fh.write('</lexicon>\n')
