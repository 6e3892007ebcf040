"""CART tests: question semantics, XML round trip, gain-based training
recovers a known structure."""

import numpy as np
import pytest

from rasr_tpu.cart import (DecisionTree, DecisionTreeTrainer, Example,
                           Question, TreeNode)


class TestQuestions:
    def test_set_question(self):
        q = Question("central", values={"a", "e", "i"})
        assert q.ask({"central": "a"})
        assert not q.ask({"central": "b"})
        assert not q.ask({})

    def test_scalar_question(self):
        q = Question("state", min_value=1, max_value=2)
        assert q.ask({"state": 1}) and q.ask({"state": 2})
        assert not q.ask({"state": 0})


class TestTreeIO:
    def test_roundtrip(self, tmp_path):
        tree = DecisionTree(TreeNode(
            question=Question("central", values={"a", "b"}),
            yes=TreeNode(question=Question("state", min_value=1),
                         yes=TreeNode(class_index=0),
                         no=TreeNode(class_index=1)),
            no=TreeNode(class_index=2)))
        p = str(tmp_path / "tree.xml")
        tree.write_xml(p)
        back = DecisionTree.read_xml(p)
        for props in [{"central": "a", "state": 2}, {"central": "a", "state": 0},
                      {"central": "z", "state": 1}]:
            assert back.classify(props) == tree.classify(props)
        assert back.n_classes == 3


class TestTraining:
    def test_recovers_separation(self):
        """Vowels and consonants have distinct feature distributions; the
        trainer must split on the vowel question."""
        rng = np.random.default_rng(0)
        dim = 4
        vowels = {"a", "e", "i"}
        questions = [
            Question("central", values=vowels, description="vowel"),
            Question("central", values={"p", "t"}, description="stop"),
            Question("state", min_value=2, max_value=2),
        ]
        examples = []
        for sym in ["a", "e", "i", "p", "t", "k"]:
            is_vowel = sym in vowels
            mean = np.full(dim, 5.0 if is_vowel else -5.0)
            for state in range(3):
                x = mean + 0.5 * rng.standard_normal((200, dim))
                examples.append(Example(
                    properties={"central": sym, "state": state},
                    count=200.0, sum_x=x.sum(0), sum_x2=(x ** 2).sum(0)))
        trainer = DecisionTreeTrainer(questions, min_examples=100,
                                      max_leaves=2)
        tree = trainer.train(examples)
        assert tree.n_classes == 2
        va = tree.classify({"central": "a", "state": 0})
        vb = tree.classify({"central": "e", "state": 1})
        ca = tree.classify({"central": "p", "state": 0})
        assert va == vb and va != ca

    def test_respects_min_examples(self):
        examples = [Example({"central": "a"}, 10.0, np.zeros(2), np.ones(2)),
                    Example({"central": "b"}, 10.0, np.ones(2), np.ones(2))]
        trainer = DecisionTreeTrainer(
            [Question("central", values={"a"})], min_examples=50)
        tree = trainer.train(examples)
        assert tree.n_classes == 1  # no split possible


class TestCartViewer:
    def test_show_dot_classify(self, tmp_path, capsys):
        from rasr_tpu.cart.decision_tree import (DecisionTree, Question,
                                                 TreeNode)
        from rasr_tpu.tools import cart_viewer
        tree = DecisionTree(TreeNode(
            question=Question("phone", values={"a", "b"}),
            yes=TreeNode(class_index=0),
            no=TreeNode(class_index=1)))
        p = tmp_path / "t.xml"
        tree.write_xml(str(p))
        assert cart_viewer.main(["show", str(p)]) == 0
        out = capsys.readouterr().out
        assert "phone in" in out and "leaf 0" in out
        dot = tmp_path / "t.dot"
        assert cart_viewer.main(["dot", str(p), str(dot)]) == 0
        assert "digraph" in dot.read_text()
        assert cart_viewer.main(["classify", str(p), "phone=a"]) == 0
        assert capsys.readouterr().out.strip() == "0"
        assert cart_viewer.main(["classify", str(p), "phone=z"]) == 0
        assert capsys.readouterr().out.strip() == "1"


class TestClassifyBatch:
    def test_matches_rowwise(self):
        rng = np.random.default_rng(3)
        tree = DecisionTree(TreeNode(
            question=Question("central", values={"a", "b"}),
            yes=TreeNode(question=Question("state", min_value=2),
                         yes=TreeNode(class_index=0),
                         no=TreeNode(class_index=1)),
            no=TreeNode(question=Question("history[0]", values={"x"}),
                        yes=TreeNode(class_index=2),
                        no=TreeNode(class_index=3))))
        syms = np.asarray(["a", "b", "c", "x"])
        n = 500
        props = {
            "central": syms[rng.integers(0, 4, n)],
            "history[0]": syms[rng.integers(0, 4, n)],
            "state": rng.integers(0, 3, n),
        }
        got = tree.classify_batch(props)
        want = [tree.classify({k: v[i] for k, v in props.items()})
                for i in range(n)]
        assert got.tolist() == want

    def test_missing_key_goes_no(self):
        tree = DecisionTree(TreeNode(
            question=Question("future[0]", values={"a"}),
            yes=TreeNode(class_index=0), no=TreeNode(class_index=1)))
        got = tree.classify_batch({"central": np.asarray(["a", "b"])})
        assert got.tolist() == [1, 1]


class TestVectorizedTrainer:
    def test_large_grows_to_leaves_and_separates(self):
        """Synthetic triphone-ish stats: classes differ by (central
        group, state); the trainer must reach max_leaves and classify
        consistently with the training signal."""
        rng = np.random.default_rng(0)
        dim = 8
        syms = [f"p{i}" for i in range(12)]
        examples = []
        for ci, c in enumerate(syms):
            for l in syms[:6]:
                for s in range(3):
                    mean = np.zeros(dim)
                    mean[ci % dim] = 4.0
                    mean[(ci + s) % dim] += 2.0
                    x = mean + 0.3 * rng.standard_normal((50, dim))
                    examples.append(Example(
                        properties={"central": c, "history[0]": l,
                                    "future[0]": "#", "state": s},
                        count=50.0, sum_x=x.sum(0), sum_x2=(x ** 2).sum(0)))
        from rasr_tpu.cart.decision_tree import phonetic_questions
        qs = phonetic_questions(syms + ["#"])
        trainer = DecisionTreeTrainer(qs, min_examples=100, max_leaves=30)
        tree = trainer.train(examples)
        assert tree.n_classes == 30
        # same training rows classify to the class their stats built
        a = tree.classify({"central": "p0", "history[0]": "p1",
                           "future[0]": "#", "state": 0})
        b = tree.classify({"central": "p0", "history[0]": "p2",
                           "future[0]": "#", "state": 0})
        c = tree.classify({"central": "p7", "history[0]": "p1",
                           "future[0]": "#", "state": 2})
        assert a == b  # left context carried no signal
        assert a != c  # central+state did


class TestTableTying:
    def test_table_matches_tree_walk(self, tmp_path):
        from rasr_tpu.am.acoustic_model import CartStateTying
        from rasr_tpu.am.allophone import (IS_FINAL, IS_INITIAL, Allophone,
                                           AllophoneAlphabet)
        from rasr_tpu.bliss.lexicon import Lexicon
        lex = Lexicon()
        for s in ["a", "b", "c"]:
            lex.phoneme_inventory.add(s)
        lex.phoneme_inventory.add("si", context_dependent=False)
        alphabet = AllophoneAlphabet(lex.phoneme_inventory, 1)
        tree = DecisionTree(TreeNode(
            question=Question("central", values={"si"}),
            yes=TreeNode(class_index=0),
            no=TreeNode(question=Question("future[0]", values={"a", "b"}),
                        yes=TreeNode(question=Question("state",
                                                       min_value=1),
                                     yes=TreeNode(class_index=1),
                                     no=TreeNode(class_index=2)),
                        no=TreeNode(class_index=3))))
        fast = CartStateTying(tree, alphabet, precompute=True)
        slow = CartStateTying(tree, alphabet, precompute=False)
        rng = np.random.default_rng(0)
        for _ in range(100):
            allo = Allophone(int(rng.integers(1, 5)),
                             int(rng.integers(0, 5)),
                             int(rng.integers(0, 5)),
                             int(rng.integers(0, 4)))
            st = int(rng.integers(0, 3))
            assert fast.emission_index(allo, st) == \
                slow.emission_index(allo, st)
