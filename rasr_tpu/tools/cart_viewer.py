"""cart-viewer: inspect phonetic decision trees
(reference: src/Tools/CartViewer — renders CART XML as text/dot).

Usage:
    python -m rasr_tpu.tools.cart_viewer show <tree.xml>
    python -m rasr_tpu.tools.cart_viewer dot <tree.xml> <out.dot>
    python -m rasr_tpu.tools.cart_viewer classify <tree.xml> k=v [k=v...]
"""

from __future__ import annotations

import sys
from typing import List, Optional

from ..cart.decision_tree import DecisionTree, TreeNode


def _fmt_question(node: TreeNode) -> str:
    q = node.question
    if q is None:
        return f"leaf {node.class_index}"
    if q.values is not None:
        vals = ",".join(sorted(str(v) for v in q.values))
        return f"{q.key} in {{{vals}}}?"
    lo = "-inf" if q.min_value is None else f"{q.min_value:g}"
    hi = "inf" if q.max_value is None else f"{q.max_value:g}"
    return f"{q.key} in [{lo}, {hi}]?"


def render_text(tree: DecisionTree, out=None) -> None:
    out = out or sys.stdout

    def walk(node: TreeNode, indent: int, tag: str) -> None:
        pad = "  " * indent
        out.write(f"{pad}{tag}{_fmt_question(node)}\n")
        if not node.is_leaf:
            walk(node.yes, indent + 1, "+ ")
            walk(node.no, indent + 1, "- ")

    walk(tree.root, 0, "")


def render_dot(tree: DecisionTree, path: str) -> None:
    counter = [0]
    lines = ["digraph cart {", "rankdir=TB;"]

    def walk(node: TreeNode) -> int:
        nid = counter[0]
        counter[0] += 1
        if node.is_leaf:
            lines.append(f"n{nid} [label=\"class {node.class_index}\", "
                         f"shape=box];")
        else:
            lines.append(f"n{nid} [label=\"{_fmt_question(node)}\"];")
            y = walk(node.yes)
            n = walk(node.no)
            lines.append(f"n{nid} -> n{y} [label=\"yes\"];")
            lines.append(f"n{nid} -> n{n} [label=\"no\"];")
        return nid

    walk(tree.root)
    lines.append("}")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")


def main(argv: Optional[List[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print(__doc__)
        return 1
    cmd, args = argv[0], argv[1:]
    tree = DecisionTree.read_xml(args[0])
    if cmd == "show":
        print(f"# classes: {tree.n_classes}")
        render_text(tree)
    elif cmd == "dot":
        render_dot(tree, args[1])
    elif cmd == "classify":
        props = dict(kv.split("=", 1) for kv in args[1:])
        print(tree.classify(props))
    else:
        print(__doc__)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
