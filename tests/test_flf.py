"""Flf processor network tests: recognizer-v2 -> rescore-lm ->
prune-posterior -> best -> evaluator pipeline over a corpus."""

import os
import textwrap

import numpy as np
import pytest

from rasr_tpu.bliss.corpus import CorpusDescription
from rasr_tpu.bliss.lexicon import Lexicon
from rasr_tpu.core.configuration import Configuration
from rasr_tpu.flf.processor import FlfNetwork
from rasr_tpu.lattice.word_lattice import lattice_from_nbest
from rasr_tpu.lm import Zerogram
from rasr_tpu.nn.label_scorer import NoOpLabelScorer
from rasr_tpu.search.tree_timesync import TreeTimesyncBeamSearch

LEXICON_XML = textwrap.dedent("""\
    <lexicon>
      <phoneme-inventory>
        <phoneme><symbol>blank</symbol><variation>none</variation></phoneme>
        <phoneme><symbol>a</symbol></phoneme>
        <phoneme><symbol>b</symbol></phoneme>
      </phoneme-inventory>
      <lemma special="blank"><orth>[blank]</orth><phon>blank</phon></lemma>
      <lemma><orth>AB</orth><phon>a b</phon></lemma>
      <lemma><orth>BA</orth><phon>b a</phon></lemma>
    </lexicon>
""")


def posteriors(seq, V=3, frames_per=2, p=0.9):
    rows = []
    for t in seq:
        for _ in range(frames_per):
            r = np.full(V, (1 - p) / (V - 1))
            r[t] = p
            rows.append(r)
    return np.log(np.asarray(rows, dtype=np.float32))


@pytest.fixture
def env(tmp_path):
    lex_file = tmp_path / "lex.xml"
    lex_file.write_text(LEXICON_XML)
    lexicon = Lexicon()
    lexicon.load(str(lex_file))
    (tmp_path / "corpus.xml").write_text(textwrap.dedent("""\
        <corpus name="c">
          <recording name="r" audio="x.wav">
            <segment name="s0" start="0" end="1"><orth>AB</orth></segment>
            <segment name="s1" start="1" end="2"><orth>BA</orth></segment>
          </recording>
        </corpus>
    """))
    feats = {
        "c/r/s0": posteriors([1, 2]),   # a b -> AB
        "c/r/s1": posteriors([2, 1]),   # b a -> BA
    }
    return tmp_path, lexicon, feats


class TestFlfNetwork:
    def test_recognize_evaluate_pipeline(self, env, capsys, tmp_path):
        tmp, lexicon, feats = env
        scorer = NoOpLabelScorer(3)
        search = TreeTimesyncBeamSearch(scorer, lexicon, beam_size=8,
                                        blank_index=0)
        config = Configuration(name="flf-tool")
        config.set("*.corpus.file", str(tmp / "corpus.xml"))
        config.set("*.network.nodes",
                   "segment recognizer rescore prune best eval writer out")
        config.set("*.network.segment.type", "speech-segment")
        config.set("*.network.recognizer.type", "recognizer-v2")
        config.set("*.network.recognizer.links", "segment")
        config.set("*.network.rescore.type", "rescore-lm")
        config.set("*.network.rescore.links", "recognizer")
        config.set("*.network.rescore.scale", "0.1")
        config.set("*.network.prune.type", "prune-posterior")
        config.set("*.network.prune.links", "rescore")
        config.set("*.network.best.type", "best")
        config.set("*.network.best.links", "prune")
        config.set("*.network.eval.type", "evaluator")
        config.set("*.network.eval.links", "best")
        config.set("*.network.writer.type", "archive-writer")
        config.set("*.network.writer.links", "prune")
        config.set(f"*.network.writer.path", str(tmp / "lattices"))
        config.set("*.network.out.type", "sink")
        config.set("*.network.out.links", "eval writer")

        lm = Zerogram([l.preferred_orth for l in lexicon.lemmas
                       if not l.special])

        class FeatureSwitcher:
            """context provider: features per current segment."""

        context = {"search": search, "lm": lm}
        network = FlfNetwork(config, context=context)

        # hook: supply per-segment features through the context
        orig_pull = network.node("recognizer").work

        def work_with_features():
            seg = network.current_segment
            network.context["features"] = feats[seg.full_name]
            return orig_pull()

        network.node("recognizer").work = work_with_features
        corpus = CorpusDescription(config.sub("corpus"))
        n = network.run(corpus)
        assert n == 2
        report = capsys.readouterr().out
        assert "wer=0.00%" in report
        # lattice archive written
        assert os.path.exists(tmp / "lattices" / "c_r_s0.slf")

    def test_unknown_node_type_raises(self):
        config = Configuration(name="flf-tool")
        config.set("*.network.nodes", "x out")
        config.set("*.network.x.type", "nonsense")
        config.set("*.network.out.type", "sink")
        with pytest.raises(ValueError, match="unknown flf node"):
            FlfNetwork(config)


class TestMoreNodes:
    def test_nbest_compose_cn_nodes(self, tmp_path):
        from rasr_tpu.core.configuration import Configuration
        from rasr_tpu.flf.processor import FlfNetwork
        from rasr_tpu.bliss.corpus import CorpusDescription
        from rasr_tpu.lm import Zerogram

        (tmp_path / "corpus.xml").write_text(
            '<corpus name="c"><recording name="r" audio="x.wav">'
            '<segment name="s" start="0" end="1"><orth>A B</orth></segment>'
            "</recording></corpus>")

        # a fake "recognizer": injects a fixed lattice via context
        from rasr_tpu.lattice.word_lattice import lattice_from_nbest
        lat = lattice_from_nbest([((1, 2), 1.0, 0.0), ((1, 3), 2.0, 0.0)],
                                 words={1: "A", 2: "B", 3: "C"})

        from rasr_tpu.flf.processor import FlfNode, register_node

        @register_node("fixed-lattice")
        class FixedLattice(FlfNode):
            def work(self):
                return lat

        config = Configuration(name="flf-tool")
        config.set("*.corpus.file", str(tmp_path / "corpus.xml"))
        config.set("*.network.nodes", "src nb comp cn out")
        config.set("*.network.src.type", "fixed-lattice")
        config.set("*.network.nb.type", "n-best")
        config.set("*.network.nb.links", "src")
        config.set("*.network.nb.n", "2")
        config.set("*.network.comp.type", "compose-with-lm")
        config.set("*.network.comp.links", "nb")
        config.set("*.network.cn.type", "confusion-network")
        config.set("*.network.cn.links", "comp")
        config.set("*.network.out.type", "sink")
        config.set("*.network.out.links", "cn")
        net = FlfNetwork(config, context={"lm": Zerogram(["A", "B", "C"])})
        corpus = CorpusDescription(config.sub("corpus"))
        assert net.run(corpus) == 1
        result = net.node("cn").pull()
        labels, _ = result.best()
        assert [result.words[l] for l in labels] == ["A", "B"]


class TestScorerFactory:
    def test_reference_names(self):
        import numpy as np
        from rasr_tpu.mm.module import create_feature_scorer
        from rasr_tpu.mm import MixtureSet, GmmScorer
        ms = MixtureSet.single_gaussian(np.zeros((3, 4)), np.ones((3, 4)))
        for name in ("diagonal-maximum", "batch-diagonal-maximum-fast",
                     "preselection-batch-float", "SIMD-diagonal-maximum"):
            s = create_feature_scorer(name, ms, use_pallas=False)
            assert isinstance(s, GmmScorer) and s.mode == "max"
        s = create_feature_scorer("diagonal-sum", ms, use_pallas=False)
        assert s.mode == "sum"
        with pytest.raises(ValueError):
            create_feature_scorer("nonsense", ms)
