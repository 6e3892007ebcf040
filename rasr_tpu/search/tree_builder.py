"""Minimized lexical tree builder with across-word coarticulation.

Reference: src/Search/TreeBuilder.hh:64 (MinimizedTreeBuilder — an
HMM-state-level network with subtree sharing), across-word triphone
expansion (src/Am/ClassicTransducerBuilder.hh; doc/architecture.rst:276-300)
and the persistent state-tree image (src/Search/PersistentStateTree.hh:40-56
over MappedArchive).

Design (TPU build):

  * nodes are allophone segments (a run of HMM states of one triphone);
    within-word triphone context is exact;
  * across-word modeling: per previous-word-final-phoneme entry tables
    (word-initial allophones take the real left context) and per
    next-word-initial-phoneme fan-out of every word-final allophone
    (right context across the word boundary).  Each fanned word end
    records which entry group the next word must start in, so the
    decoder only transits into words whose first phoneme matches the
    coarticulated right context;
  * suffix minimization: bottom-up hash-consing over (emissions, word
    ends, children) merges identical subtrees — the deep trie is shared
    across all left contexts (only first-phone nodes differ) and common
    word endings collapse;
  * the built network is a handful of flat numpy arrays; save_image /
    load_image persist them in one .npz keyed by a content hash, so the
    build cost is amortized across runs like the reference MappedArchive
    images.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from ..am.acoustic_model import AcousticModel
from ..am.allophone import IS_FINAL, IS_INITIAL, Allophone
from .hmm_timesync import HmmTreeNode

#: entry-group 0 is always "utterance start" (no left context, any word)
START_GROUP = 0
#: word ends with this group may also terminate the utterance
CI_NEXT = 0


@dataclass
class BuiltTree:
    """Builder output: HmmTreeNode list + entry groups.

    word_ends are (lemma_id, pron_score, entry_group, can_close):
    entry_group indexes entry_groups (which nodes the next word may
    start in), can_close marks word ends valid at segment end (right
    context open / context-independent)."""

    nodes: List[HmmTreeNode] = field(default_factory=list)
    entry_groups: List[List[int]] = field(default_factory=list)

    @property
    def root(self) -> int:
        return 0


class MinimizedTreeBuilder:
    def __init__(self, am: AcousticModel, across_word: bool = True):
        self.am = am
        self.across_word = across_word
        self.inv = am.lexicon.phoneme_inventory

    # -- helpers ---------------------------------------------------------------

    def _ctx(self, pid: int) -> int:
        if pid and not self.inv.by_id(pid).context_dependent:
            return 0
        return pid

    def _emissions(self, allo: Allophone, is_sil: bool) -> Tuple[int, ...]:
        am = self.am
        n_states = am.topology.n_states(is_sil)
        reps = am.topology.state_repetitions
        return tuple(am.state_tying.emission_index(allo, s // reps)
                     for s in range(n_states))

    # -- construction -------------------------------------------------------------

    def build(self) -> BuiltTree:
        am = self.am
        prons: List[Tuple[int, float, List[int]]] = []
        for lemma in am.lexicon.lemmas:
            if lemma.special and lemma.special != "silence":
                continue
            for lp in lemma.pronunciations:
                phones = list(lp.pronunciation.phonemes)
                if phones:
                    prons.append((lemma.id, lp.score, phones))

        # context alphabets for across-word fanning
        initials = sorted({self._ctx(p[2][0]) for p in prons}
                          - {0}) if self.across_word else []
        finals = sorted({self._ctx(p[2][-1]) for p in prons}
                        - {0}) if self.across_word else []
        left_ctxs = [0] + finals
        rights = [0] + initials

        nodes: List[HmmTreeNode] = [HmmTreeNode()]
        # deep trie: path of allophone keys (from the word's 2nd phone
        # on, which is left-context independent) -> node id
        path_index: Dict[Tuple, int] = {}
        # first-phone nodes: (left ctx, allophone key) -> node id
        first_index: Dict[Tuple, int] = {}
        # entry groups: (left ctx, first phoneme) -> group id; group 0 =
        # utterance start; group 1 = context-independent entries
        group_index: Dict[Tuple[int, int], int] = {}
        groups: List[List[int]] = [[], []]

        def akey(a: Allophone) -> Tuple:
            return (a.central, a.left, a.right, a.boundary)

        def new_node(parent: int, key: Tuple, allo: Allophone,
                     is_sil: bool) -> int:
            nid = len(nodes)
            nodes.append(HmmTreeNode(
                phoneme=allo.central,
                emissions=self._emissions(allo, is_sil),
                is_silence=is_sil))
            nodes[parent].children[key] = nid
            return nid

        def group_of(left: int, first_phone: int) -> int:
            gk = (left, first_phone)
            g = group_index.get(gk)
            if g is None:
                g = len(groups)
                group_index[gk] = g
                groups.append([])
            return g

        def register_entry(nid: int, left: int, allo: Allophone,
                           ci: bool) -> None:
            if ci:
                # context-independent entries reachable from everywhere
                for g in range(len(groups)):
                    if nid not in groups[g]:
                        groups[g].append(nid)
                return
            groups[group_of(left, allo.central)].append(nid)
            if left == 0:
                groups[START_GROUP].append(nid)

        def wend_group(final_phone: int, rho: int) -> Tuple[int, bool]:
            """(entry group for re-entry, can_close) of a word end whose
            final phoneme coarticulates right context `rho`."""
            if rho == CI_NEXT:
                # followed by silence/noise, or segment end
                return 1, True
            return group_of(self._ctx(final_phone), rho), False

        # merged entry groups: when the tying maps several right contexts
        # of a word-final allophone onto the SAME emission sequence, the
        # per-rho fan nodes collapse into one node whose single word end
        # re-enters the UNION of the per-rho groups (exactly equivalent
        # to the per-rho word ends, which all carried identical scores).
        # This is what keeps across-word trees buildable at 100k words:
        # fan-out per word drops from |phonemes| to the number of DISTINCT
        # tied variants (the reference's minimized fan-out arcs,
        # src/Search/TreeBuilder.hh:64).
        merged_index: Dict[Tuple[int, frozenset], int] = {}
        merged_members: Dict[int, Tuple[int, ...]] = {}   # gid -> base gids

        def merged_group_of(left: int, rhos: frozenset) -> int:
            mk = (left, rhos)
            g = merged_index.get(mk)
            if g is None:
                base = tuple(sorted(group_of(left, rho) for rho in rhos))
                g = len(groups)
                groups.append([])          # filled after all registrations
                merged_index[mk] = g
                merged_members[g] = base
            return g

        # lasts variants per (penultimate context, final phoneme):
        # [(emissions, entry group, can_close)], deduped by emissions
        lasts_memo: Dict[Tuple[int, int], List[Tuple[Tuple, int, bool]]] = {}

        def lasts_of(penult_ctx: int, p_last: int
                     ) -> List[Tuple[Tuple, int, bool]]:
            key = (penult_ctx, p_last)
            hit = lasts_memo.get(key)
            if hit is not None:
                return hit
            is_sil = am.is_silence_phoneme(p_last)
            variants: Dict[Tuple, List[int]] = {}
            for rho in rights:
                allo = Allophone(p_last, penult_ctx, rho, IS_FINAL)
                variants.setdefault(self._emissions(allo, is_sil),
                                    []).append(rho)
            out: List[Tuple[Tuple, int, bool]] = []
            for emis, rho_list in variants.items():
                close = CI_NEXT in rho_list
                nz = frozenset(r for r in rho_list if r != CI_NEXT)
                if not nz:
                    grp = 1
                elif len(nz) == 1:
                    grp = group_of(self._ctx(p_last), next(iter(nz)))
                else:
                    grp = merged_group_of(self._ctx(p_last), nz)
                out.append((emis, grp, close))
            lasts_memo[key] = out
            return out

        # ci entries (silence/noise) must exist in every group created
        # later too — collect them and patch at the end
        ci_entries: List[int] = []

        for lemma_id, pron_score, phones in prons:
            n = len(phones)
            p0 = phones[0]
            ci0 = not self.inv.by_id(p0).context_dependent
            is_sil0 = am.is_silence_phoneme(p0)
            if n == 1:
                b = IS_INITIAL | IS_FINAL
                if ci0 or not self.across_word:
                    # context-independent (silence/noise) or monophone
                    # mode: one uncoarticulated variant, unconstrained
                    # re-entry, closable at segment end
                    variants = [(Allophone(p0, 0, 0, b), 0,
                                 START_GROUP, True)]
                else:
                    variants = [(Allophone(p0, lam, rho, b), lam)
                                + wend_group(p0, rho)
                                for lam in left_ctxs for rho in rights]
                for allo, lam, grp, close in variants:
                    fk = (lam, akey(allo))
                    nid = first_index.get(fk)
                    if nid is None:
                        nid = new_node(0, ("f",) + fk, allo, is_sil0)
                        first_index[fk] = nid
                        register_entry(nid, lam, allo, ci=ci0)
                        if ci0:
                            ci_entries.append(nid)
                    nodes[nid].word_ends.append(
                        (lemma_id, pron_score, grp, close))
                continue

            # multi-phone word: interior allophones are free of the
            # across-word contexts
            interior: List[Allophone] = []
            for i in range(1, n - 1):
                interior.append(Allophone(
                    phones[i], self._ctx(phones[i - 1]),
                    self._ctx(phones[i + 1]), 0))
            penult_ctx = self._ctx(phones[n - 2])
            p_last = phones[n - 1]
            ci_last = not self.inv.by_id(p_last).context_dependent
            is_sil_last = am.is_silence_phoneme(p_last)
            if ci_last:
                lasts = [(self._emissions(
                    Allophone(p_last, 0, 0, IS_FINAL), is_sil_last),
                    START_GROUP, True)]
            elif not self.across_word:
                lasts = [(self._emissions(
                    Allophone(p_last, penult_ctx, 0, IS_FINAL),
                    is_sil_last), START_GROUP, True)]
            else:
                lasts = lasts_of(penult_ctx, p_last)

            # first nodes per left context; the deep trie below them is
            # shared across lam: the path (a1..ai) fixes every allophone
            # in it (a1's left context is p0), so all left-context
            # variants of a word point into the SAME subtree — this is
            # most of the across-word sharing before minimization runs
            firsts: List[int] = []
            for lam in (left_ctxs if (self.across_word and not ci0)
                        else [0]):
                a0 = Allophone(p0, 0 if ci0 else lam,
                               self._ctx(phones[1]), IS_INITIAL)
                fk = (lam, akey(a0))
                first = first_index.get(fk)
                if first is None:
                    first = new_node(0, ("f",) + fk, a0, is_sil0)
                    first_index[fk] = first
                    register_entry(first, lam, a0, ci=ci0)
                    if ci0:
                        ci_entries.append(first)
                firsts.append(first)
            if interior:
                node = firsts[0]
                path: Tuple = ()
                for depth, a in enumerate(interior):
                    path = path + (akey(a),)
                    child_key = akey(a)
                    nxt = nodes[node].children.get(child_key)
                    if nxt is None:
                        nxt = path_index.get(path)
                        if nxt is None:
                            is_sil = am.is_silence_phoneme(a.central)
                            nxt = new_node(node, child_key, a, is_sil)
                            path_index[path] = nxt
                        else:
                            nodes[node].children[child_key] = nxt
                    if depth == 0:
                        for f in firsts[1:]:
                            nodes[f].children[child_key] = nxt
                    node = nxt
                tails = [node]
            else:
                tails = firsts
            # word-final fan: one node per DISTINCT tied emission variant
            for emis, grp, close in lasts:
                child_key = ("L", p_last, emis)
                went = (lemma_id, pron_score, grp, close)
                for tail in tails:
                    nxt = nodes[tail].children.get(child_key)
                    if nxt is None:
                        nxt = len(nodes)
                        nodes.append(HmmTreeNode(
                            phoneme=p_last, emissions=emis,
                            is_silence=is_sil_last))
                        nodes[tail].children[child_key] = nxt
                    if went not in nodes[nxt].word_ends:
                        nodes[nxt].word_ends.append(went)

        # materialize merged groups now that every base group is complete
        for g, base in merged_members.items():
            union: set = set()
            for b in base:
                union.update(groups[b])
            groups[g] = sorted(union)

        # ci entries belong to every group (silence can follow anything)
        for g in range(len(groups)):
            for nid in ci_entries:
                if nid not in groups[g]:
                    groups[g].append(nid)

        tree = BuiltTree(nodes=nodes,
                         entry_groups=[sorted(g) for g in groups])
        return self._minimize(tree)

    # -- minimization -----------------------------------------------------------

    def _minimize(self, tree: BuiltTree) -> BuiltTree:
        """Bottom-up hash-consing: nodes with identical (emissions,
        silence flag, word ends, child set) merge, turning the trie into
        the minimal DAG (reference MinimizedTreeBuilder subtree
        sharing)."""
        nodes = tree.nodes
        n = len(nodes)
        # postorder over the DAG
        order: List[int] = []
        seen = [False] * n
        stack: List[Tuple[int, bool]] = [(0, False)]
        while stack:
            nid, done = stack.pop()
            if done:
                order.append(nid)
                continue
            if seen[nid]:
                continue
            seen[nid] = True
            stack.append((nid, True))
            for c in nodes[nid].children.values():
                if not seen[c]:
                    stack.append((c, False))
        canon: Dict[Tuple, int] = {}
        remap: Dict[int, int] = {}
        new_nodes: List[HmmTreeNode] = []
        for nid in order:
            node = nodes[nid]
            child_ids = tuple(sorted(remap[c]
                                     for c in node.children.values()))
            sig = (node.phoneme, node.emissions, node.is_silence,
                   tuple(sorted(node.word_ends)), child_ids)
            if nid == 0:
                sig = ("root", id(node))  # never merge the root
            hit = canon.get(sig)
            if hit is not None:
                remap[nid] = hit
                continue
            new_id = len(new_nodes)
            new_nodes.append(HmmTreeNode(
                phoneme=node.phoneme, emissions=node.emissions,
                is_silence=node.is_silence,
                children={},
                word_ends=list(node.word_ends)))
            # children remapped; keys only need uniqueness
            for key, c in node.children.items():
                new_nodes[new_id].children[key] = remap[c]
            canon[sig] = new_id
            remap[nid] = new_id
        # make the root node id 0 again (it is the LAST in postorder)
        root_new = remap[0]
        perm = list(range(len(new_nodes)))
        perm[0], perm[root_new] = root_new, 0
        inv_perm = {old: new for new, old in enumerate(perm)}
        final_nodes = [new_nodes[perm[i]] for i in range(len(new_nodes))]
        for node in final_nodes:
            node.children = {k: inv_perm[v]
                             for k, v in node.children.items()}
        entry_groups = [sorted({inv_perm[remap[g]] for g in grp})
                        for grp in tree.entry_groups]
        return BuiltTree(nodes=final_nodes, entry_groups=entry_groups)


# ---------------------------------------------------------------------------
# persistent tree image (reference PersistentStateTree over MappedArchive)
# ---------------------------------------------------------------------------


def tree_image_key(am: AcousticModel, across_word: bool) -> str:
    """Content hash over everything the tree depends on: pronunciations,
    state tying outputs, topology, across-word flag."""
    h = hashlib.md5()
    h.update(b"tree-image-v2")
    h.update(str(across_word).encode())
    h.update(str(am.topology.__dict__).encode())
    for lemma in am.lexicon.lemmas:
        h.update(f"{lemma.id}:{lemma.special}".encode())
        for lp in lemma.pronunciations:
            h.update(np.asarray(lp.pronunciation.phonemes,
                                np.int64).tobytes())
            h.update(np.float64(lp.score).tobytes())
    h.update(type(am.state_tying).__name__.encode())
    n = am.state_tying.n_classes
    h.update(np.int64(n() if callable(n) else n).tobytes())
    table = getattr(am.state_tying, "_table", None)
    if table is not None:
        h.update(np.ascontiguousarray(table).tobytes())
    return h.hexdigest()[:16]


def save_image(tree: BuiltTree, path: str, key: str) -> None:
    nodes = tree.nodes
    emi_off = np.zeros(len(nodes) + 1, np.int64)
    ch_off = np.zeros(len(nodes) + 1, np.int64)
    we_off = np.zeros(len(nodes) + 1, np.int64)
    for i, nd in enumerate(nodes):
        emi_off[i + 1] = emi_off[i] + len(nd.emissions)
        ch_off[i + 1] = ch_off[i] + len(nd.children)
        we_off[i + 1] = we_off[i] + len(nd.word_ends)
    emi = np.asarray([e for nd in nodes for e in nd.emissions], np.int64)
    ch = np.asarray([c for nd in nodes
                     for c in nd.children.values()], np.int64)
    we = np.asarray([[w[0], w[2], int(w[3])] for nd in nodes
                     for w in nd.word_ends], np.int64).reshape(-1, 3)
    wp = np.asarray([w[1] for nd in nodes for w in nd.word_ends],
                    np.float64)
    phon = np.asarray([nd.phoneme for nd in nodes], np.int64)
    sil = np.asarray([nd.is_silence for nd in nodes], bool)
    g_off = np.zeros(len(tree.entry_groups) + 1, np.int64)
    for i, g in enumerate(tree.entry_groups):
        g_off[i + 1] = g_off[i] + len(g)
    g_flat = np.asarray([x for g in tree.entry_groups for x in g],
                        np.int64)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez_compressed(path, key=np.frombuffer(key.encode(), np.uint8),
                        emi_off=emi_off, emi=emi, ch_off=ch_off, ch=ch,
                        we_off=we_off, we=we, wp=wp, phon=phon, sil=sil,
                        g_off=g_off, g_flat=g_flat)


def load_image(path: str, key: str) -> Optional[BuiltTree]:
    if not os.path.exists(path):
        return None
    try:
        z = np.load(path)
    except Exception:
        return None
    if bytes(z["key"]).decode() != key:
        return None
    # materialize every member ONCE (lazy npz access decompresses the
    # whole array per subscript — per-node access is quadratic) and
    # build from plain python lists
    emi_off = z["emi_off"].tolist()
    ch_off = z["ch_off"].tolist()
    we_off = z["we_off"].tolist()
    emi = z["emi"].tolist()
    ch = z["ch"].tolist()
    we = z["we"].tolist()
    wp = z["wp"].tolist()
    phon = z["phon"].tolist()
    sil = z["sil"].tolist()
    nodes: List[HmmTreeNode] = []
    for i in range(len(emi_off) - 1):
        children = {("c", c): c for c in ch[ch_off[i]:ch_off[i + 1]]}
        wes = [(we[j][0], wp[j], we[j][1], bool(we[j][2]))
               for j in range(we_off[i], we_off[i + 1])]
        nodes.append(HmmTreeNode(
            phoneme=phon[i],
            emissions=tuple(emi[emi_off[i]:emi_off[i + 1]]),
            is_silence=sil[i], children=children,
            word_ends=wes))
    g_off = z["g_off"].tolist()
    g_flat = z["g_flat"].tolist()
    groups = [g_flat[g_off[i]:g_off[i + 1]]
              for i in range(len(g_off) - 1)]
    return BuiltTree(nodes=nodes, entry_groups=groups)


def build_tree(am: AcousticModel, across_word: bool = True,
               image_path: Optional[str] = None) -> BuiltTree:
    """Build (or load from image) the minimized state tree."""
    key = tree_image_key(am, across_word) if image_path else ""
    if image_path:
        cached = load_image(image_path, key)
        if cached is not None:
            return cached
    tree = MinimizedTreeBuilder(am, across_word=across_word).build()
    if image_path:
        save_image(tree, image_path, key)
    return tree
