"""Acoustic model: HMM topology, state tying, transition model (TDP).

Reference semantics:
  * HMM topology: states-per-phone (default 3), state repetitions, special
    silence topology (src/Am/ClassicHmmTopologySet.hh,
    doc/architecture.rst:455-470);
  * state tying maps allophone states to emission (mixture) indices —
    monophone / lookup / CART (src/Am/ClassicStateTying.hh:68,185,223);
  * TransitionModel: time-distortion penalties (loop/forward/skip/exit) per
    state class *, silence, phone-0, phone-1 (src/Am/TransitionModel.hh:28,
    doc/architecture.rst:470-540).  Scores are -log penalties added on arcs.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..bliss.lexicon import Lexicon
from ..core.configuration import Configuration
from ..core.parameter import ParameterFloat, ParameterInt, ParameterString
from .allophone import Allophone, AllophoneAlphabet

INFINITY = float("inf")


@dataclass
class HmmTopology:
    states_per_phone: int = 3
    state_repetitions: int = 1   # each HMM state duplicated this many times
    silence_states: int = 1

    def n_states(self, is_silence: bool) -> int:
        if is_silence:
            return self.silence_states
        return self.states_per_phone * self.state_repetitions


@dataclass
class Tdp:
    """Time-distortion penalties in -log space (score added per transition)."""
    loop: float = 3.0
    forward: float = 0.0
    skip: float = 30.0   # INFINITY disables
    exit: float = 0.0

    @classmethod
    def from_config(cls, config: Configuration, defaults: "Tdp" = None) -> "Tdp":
        d = defaults or cls()

        def get(name, default):
            raw = config.get(name)
            if raw is None:
                return default
            if raw.strip().lower() in ("infinity", "inf"):
                return INFINITY
            return float(raw)

        return cls(get("loop", d.loop), get("forward", d.forward),
                   get("skip", d.skip), get("exit", d.exit))


@dataclass
class TransitionModel:
    """TDPs per state class (reference classes: *, silence, phone-0/1...)."""
    default: Tdp = field(default_factory=Tdp)
    silence: Tdp = field(default_factory=lambda: Tdp(loop=0.0, forward=3.0,
                                                     skip=INFINITY, exit=6.0))
    scale: float = 1.0

    @classmethod
    def from_config(cls, config: Configuration) -> "TransitionModel":
        tdp = config.sub("tdp")
        scale_raw = tdp.get("scale")
        return cls(
            default=Tdp.from_config(tdp.sub("*")),
            silence=Tdp.from_config(tdp.sub("silence"),
                                    Tdp(0.0, 3.0, INFINITY, 6.0)),
            scale=float(scale_raw) if scale_raw else 1.0)

    def tdp_for(self, is_silence: bool) -> Tdp:
        t = self.silence if is_silence else self.default
        if self.scale == 1.0:
            return t
        return Tdp(*(self.scale * v for v in (t.loop, t.forward, t.skip, t.exit)))


class StateTying:
    """allophone state -> emission index."""

    def emission_index(self, allophone: Allophone, state: int) -> int:
        raise NotImplementedError

    @property
    def n_classes(self) -> int:
        raise NotImplementedError


class MonophoneStateTying(StateTying):
    """emission = phoneme id x state (reference monophone tying)."""

    def __init__(self, n_phonemes: int, states_per_phone: int = 3):
        self.n_phonemes = n_phonemes
        self.states_per_phone = states_per_phone

    def emission_index(self, allophone: Allophone, state: int) -> int:
        return (allophone.central - 1) * self.states_per_phone + state

    @property
    def n_classes(self) -> int:
        return self.n_phonemes * self.states_per_phone


class LutStateTying(StateTying):
    """Explicit lookup table: '<allophone-format>.<state> <class>' lines
    (reference LutStateTying, doc/file_formats/state_tying.rst)."""

    def __init__(self, alphabet: AllophoneAlphabet, table: Dict[str, int]):
        self.alphabet = alphabet
        self.table = dict(table)
        self._n = max(table.values()) + 1 if table else 0

    @classmethod
    def read(cls, path: str, alphabet: AllophoneAlphabet) -> "LutStateTying":
        table: Dict[str, int] = {}
        import gzip
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rt") as fh:
            for line in fh:
                line = line.split("#")[0].strip()
                if not line:
                    continue
                key, cls_idx = line.rsplit(None, 1)
                table[key] = int(cls_idx)
        return cls(alphabet, table)

    def emission_index(self, allophone: Allophone, state: int) -> int:
        key = f"{allophone.format(self.alphabet.inventory)}.{state}"
        return self.table[key]

    @property
    def n_classes(self) -> int:
        return self._n


class CartStateTying(StateTying):
    """Decision-tree state tying; wraps a cart.DecisionTree.

    With `precompute=True` (default) the whole (central, left, right,
    state, boundary) grid is classified once via the tree's vectorized
    classify_batch into a dense lookup table — emission_index becomes one
    array read, which is what lets triphone tree builds and frame
    labeling run at 100k-word scale (the reference caches the same
    mapping inside its state-tying images,
    src/Am/ClassicStateTying.hh:223)."""

    def __init__(self, tree, alphabet: AllophoneAlphabet,
                 precompute: bool = True, max_states: int = 3):
        self.tree = tree
        self.alphabet = alphabet
        self._table: Optional[np.ndarray] = None
        if precompute:
            self._table = self.build_table(max_states)

    def build_table(self, max_states: int = 3) -> np.ndarray:
        """(P+1, P+1, P+1, max_states, 4) int32 table over phoneme ids
        (0 = no context '#') x HMM state x boundary flags."""
        inv = self.alphabet.inventory
        n_p = len(inv)
        syms = np.asarray(["#"] + [inv.by_id(i).symbol
                                   for i in range(1, n_p + 1)])
        c, l, r, s, b = np.meshgrid(
            np.arange(n_p + 1), np.arange(n_p + 1), np.arange(n_p + 1),
            np.arange(max_states), np.arange(4), indexing="ij")
        out = self.tree.classify_batch({
            "central": syms[c.ravel()],
            "history[0]": syms[l.ravel()],
            "future[0]": syms[r.ravel()],
            "state": s.ravel(),
            "boundary": b.ravel(),
        })
        return out.reshape(c.shape).astype(np.int32)

    def emission_index(self, allophone: Allophone, state: int) -> int:
        if self._table is not None:
            return int(self._table[allophone.central, allophone.left,
                                   allophone.right, state,
                                   allophone.boundary & 3])
        inv = self.alphabet.inventory
        def sym(pid):
            return inv.by_id(pid).symbol if pid else "#"
        return self.tree.classify({
            "central": sym(allophone.central),
            "history[0]": sym(allophone.left),
            "future[0]": sym(allophone.right),
            "state": state,
            "boundary": allophone.boundary,
        })

    @property
    def n_classes(self) -> int:
        return self.tree.n_classes


@dataclass
class AcousticModel:
    """Bundle: lexicon-linked allophone alphabet + topology + tying + TDP
    (+ a feature scorer attached by ModelCombination).
    Reference: Am::ClassicAcousticModel (src/Am/ClassicAcousticModel.hh:29).
    """
    lexicon: Lexicon
    alphabet: AllophoneAlphabet
    topology: HmmTopology
    state_tying: StateTying
    transitions: TransitionModel
    scorer: Optional[object] = None  # Mm feature scorer / NN posterior scorer

    @classmethod
    def create(cls, config: Configuration, lexicon: Lexicon) -> "AcousticModel":
        n_ctx = int(config.get("n-contexts") or 1)
        alphabet = AllophoneAlphabet(lexicon.phoneme_inventory, n_contexts=n_ctx)
        topo = HmmTopology(
            states_per_phone=int(config.sub("hmm").get("states-per-phone") or 3),
            state_repetitions=int(config.sub("hmm").get("state-repetitions") or 1))
        tying_type = config.sub("state-tying").get("type") or "monophone"
        if tying_type == "monophone":
            tying: StateTying = MonophoneStateTying(
                len(lexicon.phoneme_inventory), topo.states_per_phone)
        elif tying_type in ("lut", "lookup"):
            tying = LutStateTying.read(config.sub("state-tying").get("file"),
                                       alphabet)
        elif tying_type in ("cart", "decision-tree"):
            from ..cart.decision_tree import DecisionTree
            tree = DecisionTree.read_xml(config.sub("state-tying").get("file"))
            tying = CartStateTying(tree, alphabet)
        else:
            raise ValueError(f"unknown state-tying type {tying_type!r}")
        return cls(lexicon, alphabet, topo, tying,
                   TransitionModel.from_config(config))

    def is_silence_phoneme(self, phoneme_id: int) -> bool:
        sil = self.lexicon.special_lemma("silence")
        if sil is None:
            return False
        for lp in sil.pronunciations:
            if len(lp.pronunciation.phonemes) == 1 and \
                    lp.pronunciation.phonemes[0] == phoneme_id:
                return True
        return False
