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
        leaves: List[Tuple[TreeNode, List[Example]]] = []
        root = TreeNode(class_index=0)
        leaves.append((root, list(examples)))

        def best_split(exs: List[Example]):
            best = (None, 0.0, None, None)
            for q in self.questions:
                yes = [e for e in exs if q.ask(e.properties)]
                no = [e for e in exs if not q.ask(e.properties)]
                if (sum(e.count for e in yes) < self.min_examples
                        or sum(e.count for e in no) < self.min_examples):
                    continue
                gain = _log_likelihood_gain(yes, no)
                if gain > best[1]:
                    best = (q, gain, yes, no)
            return best

        # priority growth: split the leaf with the best available gain
        while len(leaves) < self.max_leaves:
            best_leaf, best_q, best_gain, best_parts = None, None, 0.0, None
            for i, (node, exs) in enumerate(leaves):
                q, gain, yes, no = best_split(exs)
                if q is not None and gain > best_gain:
                    best_leaf, best_q, best_gain = i, q, gain
                    best_parts = (yes, no)
            if best_leaf is None or best_gain < self.min_gain:
                break
            node, _ = leaves.pop(best_leaf)
            node.question = best_q
            node.yes = TreeNode()
            node.no = TreeNode()
            leaves.append((node.yes, best_parts[0]))
            leaves.append((node.no, best_parts[1]))

        for i, (node, _) in enumerate(leaves):
            node.class_index = i
        return DecisionTree(root)
