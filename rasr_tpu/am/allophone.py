"""Allophones and allophone states.

An allophone is a phoneme in (left, right) phonetic context with word
boundary flags; an allophone state adds the HMM sub-state index.  The
reference packs these into integer ids (src/Am/ClassicStateModel.hh:90,314:
26-bit allophone + 6-bit state) — kept here so alignment labels are
interchangeable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, Iterable, List, Optional, Sequence, Tuple

from ..bliss.lexicon import Lexicon, PhonemeInventory

# boundary flags (word-initial / word-final), as in the reference
IS_INITIAL = 1
IS_FINAL = 2

_STATE_BITS = 6
_STATE_MASK = (1 << _STATE_BITS) - 1


@dataclass(frozen=True)
class Allophone:
    """central phoneme id with context (ids are 1-based; 0 = no context)."""
    central: int
    left: int = 0
    right: int = 0
    boundary: int = 0

    def format(self, inventory: PhonemeInventory) -> str:
        def sym(pid):
            return inventory.by_id(pid).symbol if pid else "#"
        s = f"{sym(self.central)}{{{sym(self.left)}+{sym(self.right)}}}"
        if self.boundary & IS_INITIAL:
            s += "@i"
        if self.boundary & IS_FINAL:
            s += "@f"
        return s


class AllophoneAlphabet:
    """Dense indexing of the allophones in use (monophone or triphone).

    `across_word` controls whether word-boundary phonemes see context from
    neighboring words; `n_contexts=0` yields monophones.
    """

    def __init__(self, inventory: PhonemeInventory, n_contexts: int = 1):
        self.inventory = inventory
        self.n_contexts = n_contexts
        self._ids: Dict[Allophone, int] = {}
        self._list: List[Allophone] = []

    def index(self, allophone: Allophone) -> int:
        if self.n_contexts == 0:
            allophone = Allophone(allophone.central, 0, 0, allophone.boundary)
        idx = self._ids.get(allophone)
        if idx is None:
            idx = len(self._list)
            self._ids[allophone] = idx
            self._list.append(allophone)
        return idx

    def allophone(self, index: int) -> Allophone:
        return self._list[index]

    def __len__(self) -> int:
        return len(self._list)

    # -- packed allophone-state ids (alignment label space) ------------------

    def state_id(self, allophone_index: int, hmm_state: int) -> int:
        """(allophone, state) -> packed id (reference 26+6 bit packing)."""
        return (allophone_index << _STATE_BITS) | (hmm_state & _STATE_MASK)

    @staticmethod
    def split_state_id(state_id: int) -> Tuple[int, int]:
        return state_id >> _STATE_BITS, state_id & _STATE_MASK


def allophones_of_pronunciation(
        phonemes: Sequence[int], alphabet: AllophoneAlphabet,
        left_context: int = 0, right_context: int = 0) -> List[Allophone]:
    """Context-expanded allophone sequence of one pronunciation.

    Context-independent phonemes (variation "none", e.g. silence/noise)
    never take or provide context (reference phonology semantics)."""
    inv = alphabet.inventory
    out: List[Allophone] = []
    n = len(phonemes)

    def ctx(pid: int) -> int:
        # context-independent phonemes don't provide context
        if pid and not inv.by_id(pid).context_dependent:
            return 0
        return pid

    for i, pid in enumerate(phonemes):
        boundary = (IS_INITIAL if i == 0 else 0) | (IS_FINAL if i == n - 1 else 0)
        if not inv.by_id(pid).context_dependent:
            out.append(Allophone(pid, 0, 0, boundary))
            continue
        left = ctx(phonemes[i - 1]) if i > 0 else ctx(left_context)
        right = ctx(phonemes[i + 1]) if i < n - 1 else ctx(right_context)
        out.append(Allophone(pid, left, right, boundary))
    return out
