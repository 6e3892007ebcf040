"""Cart layer: phonetic decision trees (reference: src/Cart)."""

from .decision_tree import (DecisionTree, DecisionTreeTrainer, Example,
                            Question, TreeNode)

__all__ = ["DecisionTree", "DecisionTreeTrainer", "Example", "Question",
           "TreeNode"]
