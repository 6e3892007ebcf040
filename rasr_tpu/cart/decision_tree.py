"""Phonetic decision trees (CART) for state tying.

Re-creates the reference Cart layer (src/Cart/DecisionTree.hh:54,92,118,223
Question/ScalarQuestion/SetQuestion + DecisionTree;
src/Cart/DecisionTreeTrainer.hh:89 gain-based training;
doc/training/cart_estimation.rst): binary trees over property maps
(central phoneme, context phonemes, HMM state index, boundary flags), with
XML IO and likelihood-gain training from labeled Gaussian statistics.
"""

from __future__ import annotations

import gzip
import math
import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Set, Tuple

import numpy as np


@dataclass
class Question:
    """key in set-of-values (SetQuestion) or key == value / key in range
    (ScalarQuestion)."""
    key: str
    values: Optional[Set[str]] = None        # set question
    min_value: Optional[float] = None        # scalar range question
    max_value: Optional[float] = None
    description: str = ""

    def ask(self, properties: Dict) -> bool:
        v = properties.get(self.key)
        if v is None:
            return False
        if self.values is not None:
            return str(v) in self.values
        x = float(v)
        if self.min_value is not None and x < self.min_value:
            return False
        if self.max_value is not None and x > self.max_value:
            return False
        return True


@dataclass
class TreeNode:
    question: Optional[Question] = None
    yes: Optional["TreeNode"] = None
    no: Optional["TreeNode"] = None
    class_index: int = -1

    @property
    def is_leaf(self) -> bool:
        return self.question is None


class DecisionTree:
    def __init__(self, root: Optional[TreeNode] = None):
        self.root = root or TreeNode(class_index=0)

    def classify(self, properties: Dict) -> int:
        node = self.root
        while not node.is_leaf:
            node = node.yes if node.question.ask(properties) else node.no
        return node.class_index

    @property
    def n_classes(self) -> int:
        count = 0

        def walk(n):
            nonlocal count
            if n.is_leaf:
                count = max(count, n.class_index + 1)
            else:
                walk(n.yes)
                walk(n.no)

        walk(self.root)
        return count

    def classify_batch(self, properties: Dict[str, np.ndarray]) -> np.ndarray:
        """Vectorized classify: `properties` maps each key to an (N,)
        column; returns (N,) class indices.  Equivalent to calling
        classify() row-wise (question masks are evaluated once per unique
        value per key), but fast enough to tabulate the full triphone
        state grid for table-backed tying."""
        arrs = {k: np.asarray(v) for k, v in properties.items()}
        n = len(next(iter(arrs.values()))) if arrs else 0
        codes: Dict[str, np.ndarray] = {}
        uniques: Dict[str, np.ndarray] = {}
        for k, a in arrs.items():
            u, inv = np.unique(a, return_inverse=True)
            uniques[k] = u
            codes[k] = inv
        mask_cache: Dict[int, Optional[np.ndarray]] = {}

        def question_mask(q: Question) -> Optional[np.ndarray]:
            m = mask_cache.get(id(q))
            if m is None and id(q) not in mask_cache:
                u = uniques.get(q.key)
                m = None if u is None else np.asarray(
                    [q.ask({q.key: v}) for v in u.tolist()], bool)
                mask_cache[id(q)] = m
            return m

        out = np.empty(n, np.int64)
        stack = [(self.root, np.arange(n))]
        while stack:
            node, idx = stack.pop()
            if len(idx) == 0:
                continue
            if node.is_leaf:
                out[idx] = node.class_index
                continue
            m = question_mask(node.question)
            if m is None:    # key absent everywhere -> ask() is False
                yes = np.zeros(len(idx), bool)
            else:
                yes = m[codes[node.question.key][idx]]
            stack.append((node.yes, idx[yes]))
            stack.append((node.no, idx[~yes]))
        return out

    # -- XML IO ----------------------------------------------------------------

    def write_xml(self, path: str) -> None:
        def element(n: TreeNode) -> ET.Element:
            if n.is_leaf:
                e = ET.Element("leaf", {"class": str(n.class_index)})
                return e
            e = ET.Element("node")
            q = ET.SubElement(e, "question", {"key": n.question.key})
            if n.question.values is not None:
                ET.SubElement(q, "values").text = " ".join(
                    sorted(n.question.values))
            else:
                if n.question.min_value is not None:
                    q.set("min", repr(n.question.min_value))
                if n.question.max_value is not None:
                    q.set("max", repr(n.question.max_value))
            yes = ET.SubElement(e, "yes")
            yes.append(element(n.yes))
            no = ET.SubElement(e, "no")
            no.append(element(n.no))
            return e

        root = ET.Element("decision-tree")
        root.append(element(self.root))
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "wb") as fh:
            fh.write(ET.tostring(root))

    @classmethod
    def read_xml(cls, path: str) -> "DecisionTree":
        opener = gzip.open if path.endswith(".gz") else open
        with opener(path, "rb") as fh:
            root = ET.parse(fh).getroot()

        def parse(e: ET.Element) -> TreeNode:
            if e.tag == "leaf":
                return TreeNode(class_index=int(e.get("class")))
            q_elem = e.find("question")
            values_elem = q_elem.find("values")
            question = Question(
                key=q_elem.get("key"),
                values=set(values_elem.text.split()) if values_elem is not None
                else None,
                min_value=float(q_elem.get("min")) if q_elem.get("min") else None,
                max_value=float(q_elem.get("max")) if q_elem.get("max") else None)
            yes = parse(list(e.find("yes"))[0])
            no = parse(list(e.find("no"))[0])
            return TreeNode(question=question, yes=yes, no=no)

        return cls(parse(list(root)[0]))


@dataclass
class Example:
    """Training example: properties + Gaussian sufficient statistics
    (reference Cart::Example, src/Cart/Example.hh)."""
    properties: Dict
    count: float
    sum_x: np.ndarray
    sum_x2: np.ndarray


def _log_likelihood_gain(examples_yes: Sequence[Example],
                         examples_no: Sequence[Example],
                         variance_floor: float = 1e-6) -> float:
    """Gain = LL(yes) + LL(no) - LL(all) under single-Gaussian models
    (the reference ID3/gain scorer)."""

    def ll(exs: Sequence[Example]) -> float:
        n = sum(e.count for e in exs)
        if n <= 0:
            return 0.0
        sx = sum((e.sum_x for e in exs), start=np.zeros_like(exs[0].sum_x))
        sx2 = sum((e.sum_x2 for e in exs), start=np.zeros_like(exs[0].sum_x2))
        mean = sx / n
        var = np.maximum(sx2 / n - mean ** 2, variance_floor)
        # max-likelihood LL of n points under the fitted diagonal Gaussian
        return -0.5 * n * float(np.sum(np.log(2 * math.pi * var) + 1.0))

    return ll(list(examples_yes)) + ll(list(examples_no)) \
        - ll(list(examples_yes) + list(examples_no))


def phonetic_questions(symbols: Sequence[str],
                       classes: Optional[Dict[str, Sequence[str]]] = None,
                       n_states: int = 3,
                       context_keys: Sequence[str] = (
                           "central", "history[0]", "future[0]"),
                       ) -> List[Question]:
    """Auto question set for phonetic state tying: per context position a
    singleton question for every phoneme plus an optional set question per
    named phoneme class, and one scalar question per HMM state (the
    reference ships hand-written question files, doc/training/
    cart_estimation.rst; singletons make the question set complete)."""
    qs: List[Question] = []
    for key in context_keys:
        for s in symbols:
            qs.append(Question(key, values={s},
                               description=f"{key}={s}"))
        for name, members in (classes or {}).items():
            qs.append(Question(key, values=set(members),
                               description=f"{key} in {name}"))
    for s in range(n_states):
        qs.append(Question("state", min_value=s, max_value=s))
    return qs


class DecisionTreeTrainer:
    """Greedy gain-maximizing tree growth with count/gain constraints
    (reference DecisionTreeTrainer, src/Cart/DecisionTreeTrainer.hh:119)."""

    def __init__(self, questions: Sequence[Question],
                 min_examples: float = 100.0,
                 min_gain: float = 1e-3,
                 max_leaves: int = 1000):
        self.questions = list(questions)
        self.min_examples = min_examples
        self.min_gain = min_gain
        self.max_leaves = max_leaves

    def train(self, examples: Sequence[Example]) -> DecisionTree:
        """Greedy priority growth (always split the leaf with the best
        available gain next, reference DecisionTreeTrainer semantics),
        computed vectorized: each key's values factorize into codes, each
        question becomes a code mask, and a leaf's candidate gains are a
        handful of (questions x codes) matmuls over code-aggregated
        Gaussian statistics instead of per-example Python loops — the
        split chosen at every step is the same as the naive scan's."""
        import heapq

        examples = list(examples)
        root = TreeNode(class_index=0)
        if not examples or not self.questions:
            return DecisionTree(root)
        E = len(examples)
        counts = np.asarray([e.count for e in examples], np.float64)
        sum_x = np.stack([np.asarray(e.sum_x, np.float64).ravel()
                          for e in examples])
        sum_x2 = np.stack([np.asarray(e.sum_x2, np.float64).ravel()
                           for e in examples])
        dim = sum_x.shape[1]
        floor = 1e-6

        # factorize: per key, example -> code; per question, code mask
        key_codes: Dict[str, np.ndarray] = {}
        key_nvals: Dict[str, int] = {}
        key_questions: Dict[str, List[int]] = {}
        key_qmask: Dict[str, np.ndarray] = {}
        for qi, q in enumerate(self.questions):
            key_questions.setdefault(q.key, []).append(qi)
        for k, qis in key_questions.items():
            vals = [e.properties.get(k) for e in examples]
            uniq: Dict = {}
            codes = np.empty(E, np.int64)
            order_vals: List = []
            for i, v in enumerate(vals):
                c = uniq.get(v)
                if c is None:
                    c = len(uniq)
                    uniq[v] = c
                    order_vals.append(v)
                codes[i] = c
            key_codes[k] = codes
            key_nvals[k] = len(order_vals)
            masks = np.zeros((len(qis), len(order_vals)), bool)
            for row, qi in enumerate(qis):
                q = self.questions[qi]
                for ci, v in enumerate(order_vals):
                    masks[row, ci] = (False if v is None
                                      else q.ask({k: v}))
            key_qmask[k] = masks

        def ll_vec(n: np.ndarray, sx: np.ndarray, sx2: np.ndarray
                   ) -> np.ndarray:
            """(Q,) max-likelihood diagonal-Gaussian LL for (Q,) counts and
            (Q, D) sums (same formula as _log_likelihood_gain)."""
            with np.errstate(divide="ignore", invalid="ignore"):
                mean = sx / n[:, None]
                var = np.maximum(sx2 / n[:, None] - mean ** 2, floor)
                out = -0.5 * n * np.sum(np.log(2 * math.pi * var) + 1.0,
                                        axis=-1)
            return np.where(n > 0, out, 0.0)

        def best_split(idx: np.ndarray):
            """(question index | None, gain) for the leaf `idx`."""
            n_tot = float(counts[idx].sum())
            if n_tot < 2 * self.min_examples:
                return None, 0.0
            sx_tot = sum_x[idx].sum(0)
            sx2_tot = sum_x2[idx].sum(0)
            ll_all = float(ll_vec(np.asarray([n_tot]), sx_tot[None],
                                  sx2_tot[None])[0])
            best_qi, best_gain = None, 0.0
            for k, qis in key_questions.items():
                codes = key_codes[k][idx]
                nv = key_nvals[k]
                cn = np.bincount(codes, weights=counts[idx], minlength=nv)
                csx = np.zeros((nv, dim))
                np.add.at(csx, codes, sum_x[idx])
                csx2 = np.zeros((nv, dim))
                np.add.at(csx2, codes, sum_x2[idx])
                qm = key_qmask[k].astype(np.float64)
                n_yes = qm @ cn
                n_no = n_tot - n_yes
                valid = (n_yes >= self.min_examples) \
                    & (n_no >= self.min_examples)
                if not valid.any():
                    continue
                sx_yes = qm @ csx
                sx2_yes = qm @ csx2
                gains = (ll_vec(n_yes, sx_yes, sx2_yes)
                         + ll_vec(n_no, sx_tot[None] - sx_yes,
                                  sx2_tot[None] - sx2_yes) - ll_all)
                gains = np.where(valid, gains, -np.inf)
                j = int(np.argmax(gains))
                if gains[j] > best_gain:
                    best_qi, best_gain = qis[j], float(gains[j])
            return best_qi, best_gain

        # priority growth via heap of cached per-leaf best splits (a
        # leaf's best split never changes once computed)
        seq = 0
        heap: List[Tuple[float, int, TreeNode, np.ndarray, int]] = []
        n_leaves = 1

        def offer(node: TreeNode, idx: np.ndarray) -> None:
            nonlocal seq
            qi, gain = best_split(idx)
            if qi is not None and gain >= self.min_gain:
                heapq.heappush(heap, (-gain, seq, node, idx, qi))
                seq += 1

        offer(root, np.arange(E))
        while heap and n_leaves < self.max_leaves:
            _, _, node, idx, qi = heapq.heappop(heap)
            q = self.questions[qi]
            yes = key_qmask[q.key][key_questions[q.key].index(qi)][
                key_codes[q.key][idx]]
            node.question = q
            node.yes = TreeNode()
            node.no = TreeNode()
            n_leaves += 1
            offer(node.yes, idx[yes])
            offer(node.no, idx[~yes])

        # leaf numbering: deterministic yes-first depth-first walk
        next_class = 0

        def number(n: TreeNode) -> None:
            nonlocal next_class
            if n.is_leaf:
                n.class_index = next_class
                next_class += 1
            else:
                number(n.yes)
                number(n.no)

        number(root)
        return DecisionTree(root)
