"""Extended Flf node tier: score arithmetic, structure ops, filters,
oracle alignment, time-frame CNs, config-driven chains."""

import os
import textwrap

import numpy as np
import pytest

from rasr_tpu.bliss.corpus import CorpusDescription
from rasr_tpu.core.configuration import Configuration
from rasr_tpu.flf.lattice import FlfLattice
from rasr_tpu.flf.processor import FlfNetwork, NodeFactory
from rasr_tpu.flf.semiring import FlfSemiring


def make_corpus(tmp_path, orths=("a b c",)):
    segs = "\n".join(
        f'<segment name="s{i}" start="{i}" end="{i + 1}">'
        f"<orth>{o}</orth></segment>" for i, o in enumerate(orths))
    (tmp_path / "corpus.xml").write_text(textwrap.dedent(f"""\
        <corpus name="c">
          <recording name="r" audio="x.wav">
          {segs}
          </recording>
        </corpus>
    """))
    cfg = Configuration()
    cfg.set("corpus.file", str(tmp_path / "corpus.xml"))
    return CorpusDescription(cfg.sub("corpus"))


def two_path_lattice():
    """best path 'a b c' (score 3), alternative 'a x c' (score 4)."""
    sr = FlfSemiring(("am", "lm"))
    words = {1: "a", 2: "b", 3: "c", 4: "x", 9: "[SILENCE]"}
    return FlfLattice.build(
        sr, 5,
        [(0, 1, 1, (1.0, 0.0)),
         (1, 2, 2, (1.0, 0.0)), (1, 2, 4, (2.0, 0.0)),
         (2, 3, 3, (1.0, 0.0)),
         (3, 4, 9, (0.5, 0.0))],
        boundaries=[0, 2, 5, 8, 9], initial=0,
        finals={3: (0.0, 0.0), 4: (0.0, 0.0)}, words=words)


class SourceNodeForTest:
    pass


def run_chain(tmp_path, node_specs, lattice, orths=("a b c",),
              context=None):
    """Build network: injected-lattice source -> chain -> sink; returns
    the output of the last chained node per segment."""
    from rasr_tpu.flf.processor import FlfNode, register_node

    if "test-source" not in NodeFactory:
        @register_node("test-source")
        class TestSource(FlfNode):
            def work(self):
                return self.network.context["input-lattice"]

    cfg = Configuration()
    names = ["src"] + [f"n{i}" for i in range(len(node_specs))] + ["out"]
    cfg.set("network.nodes", " ".join(names))
    cfg.set("network.src.type", "test-source")
    prev = "src"
    for i, spec in enumerate(node_specs):
        name = f"n{i}"
        cfg.set(f"network.{name}.type", spec.pop("type"))
        cfg.set(f"network.{name}.links", spec.pop("links", prev))
        for k, v in spec.items():
            cfg.set(f"network.{name}.{k}", str(v))
        prev = name
    cfg.set("network.out.type", "sink")
    cfg.set("network.out.links", prev)
    ctx = {"input-lattice": lattice}
    ctx.update(context or {})
    net = FlfNetwork(cfg, context=ctx)
    results = []
    corpus = make_corpus(tmp_path, orths)
    for seg in corpus.segments():
        net.current_segment = seg
        net.segment_counter += 1
        results.append(net.node(prev).pull())
    for node in net._nodes.values():
        node.finalize()
    return results


class TestRegistry:
    def test_node_count_at_least_40(self):
        assert len(NodeFactory) >= 40, sorted(NodeFactory)

    def test_reference_core_names_present(self):
        expected = {
            "speech-segment", "reader", "writer", "archive-reader",
            "archive-writer", "recognizer-v2", "best", "n-best",
            "select-n-best", "dump-n-best", "determinize", "minimize",
            "remove-epsilons", "remove-null-arcs", "prune-posterior",
            "compose-with-lm", "decode-rescore-lm",
            "push-forward-rescoring", "unite", "intersection",
            "difference", "concatenate-lattices", "mesh", "fit",
            "redundancy-removal", "non-word-closure-filter",
            "non-word-closure-removal-filter",
            "non-word-closure-normalization-filter",
            "add-word-confidence", "confusion-network",
            "time-frame-confusion-network", "fcn-combination",
            "oracle-alignment", "evaluator", "dump-ctm", "sink", "copy",
            "cache", "info", "add", "multiply", "exp", "log", "rescale",
            "change-semiring", "project", "reduce", "extend-by-penalty",
            "extend-by-pronunciation-score", "extend-by-acoustic-score",
            "map-labels", "ctm-reader", "string-to-lattice",
            "fsa-reader", "dummy", "dump-traceback", "dump-vocab",
            "drawer", "properties", "buffer", "rescore-lm",
        }
        missing = expected - set(NodeFactory)
        assert not missing, f"missing node types: {sorted(missing)}"


class TestScoreNodes:
    def test_add_multiply_rescale(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [
            dict(type="add", key="lm", value=2.0),
            dict(type="multiply", key="am", value=3.0),
            dict(type="rescale", **{"lm-scale": 0.5}),
        ], lat)
        assert isinstance(out, FlfLattice)
        np.testing.assert_allclose(out.scores[:, 1], lat.scores[:, 1] + 2.0)
        np.testing.assert_allclose(out.scores[:, 0], lat.scores[:, 0] * 3.0)
        assert out.semiring.scales == (1.0, 0.5)

    def test_extend_by_penalty_and_reduce(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [
            dict(type="extend-by-penalty", penalty=1.5, scale=2.0),
            dict(type="reduce"),
        ], lat)
        assert out.semiring.keys == ("total",)
        # every non-eps arc got 2.0 * 1.5 added to its projected weight;
        # best path a-b-c ends at the early final state (3 arcs)
        labels, score, _ = out.best()
        assert score == pytest.approx(3.0 + 3.0 * 3)

    def test_change_semiring_from_config(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [
            {"type": "change-semiring", "semiring.keys": "am lm conf",
             "semiring.scales": "1.0 10.0 0.0"},
        ], lat)
        assert out.semiring.keys == ("am", "lm", "conf")
        np.testing.assert_allclose(out.scores[:, 0], lat.scores[:, 0])


class TestStructureNodes:
    def test_unite_intersection_difference(self, tmp_path):
        lat = two_path_lattice()
        u, = run_chain(tmp_path, [dict(type="unite", links="src src")], lat)
        labels, _, _ = u.best()
        assert [u.word_of(l) for l in labels] == ["a", "b", "c"]
        i, = run_chain(tmp_path,
                       [dict(type="intersection", links="src src")], lat)
        labels, score, _ = i.best()
        assert score == pytest.approx(6.0)  # scores added (3.0 + 3.0)

    def test_non_word_filter_drops_silence(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [dict(type="non-word-closure-filter")],
                         lat)
        orths = {out.word_of(int(l)) for l in out.labels}
        assert "[SILENCE]" not in orths

    def test_fit_and_redundancy(self, tmp_path):
        lat = two_path_lattice()
        # duplicate an arc to exercise dedup
        lat.sources = np.concatenate([lat.sources, [0]]).astype(np.int32)
        lat.targets = np.concatenate([lat.targets, [1]]).astype(np.int32)
        lat.labels = np.concatenate([lat.labels, [1]]).astype(np.int32)
        lat.scores = np.concatenate([lat.scores, [[5.0, 0.0]]])
        out, = run_chain(tmp_path, [dict(type="redundancy-removal"),
                                    dict(type="fit")], lat)
        mask = (out.sources == 0) & (out.targets == 1)
        assert mask.sum() == 1
        assert out.scores[mask][0, 0] == pytest.approx(1.0)  # kept best


class TestConfidenceAndCn:
    def test_add_word_confidence(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [dict(type="add-word-confidence")], lat)
        assert "confidence" in out.semiring.keys
        c = out.semiring.id_of("confidence")
        # the unique 'a' arc has posterior 1
        assert out.scores[0, c] == pytest.approx(1.0, abs=1e-6)
        # projected weights unchanged (scale 0)
        np.testing.assert_allclose(
            out.semiring.project(out.scores),
            lat.semiring.project(lat.scores))

    def test_timeframe_cn_decode(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path,
                         [dict(type="time-frame-confusion-network")], lat)
        labels, _, _ = out.best()
        # the silence tail is optional (early final state) so its frame
        # posterior is < 0.5 and min-fWER drops it
        assert [out.word_of(l) for l in labels] == ["a", "b", "c"]

    def test_fcn_combination(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [dict(type="fcn-combination",
                                         links="src src",
                                         weights="0.5 0.5")], lat)
        labels, _, _ = out.best()
        assert [out.word_of(l) for l in labels][:3] == ["a", "b", "c"]


class TestOracle:
    def test_oracle_wer_zero_when_path_exists(self, tmp_path, capsys):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [dict(type="oracle-alignment")], lat,
                         orths=("a b c [SILENCE]",))
        assert "wer=0.00%" in capsys.readouterr().out

    def test_oracle_beats_best_path(self, tmp_path, capsys):
        # reference matches the WORSE path: oracle should find it
        lat = two_path_lattice()
        run_chain(tmp_path, [dict(type="oracle-alignment")], lat,
                  orths=("a x c [SILENCE]",))
        assert "wer=0.00%" in capsys.readouterr().out

    def test_lattice_wer_counts_substitutions(self, tmp_path):
        from rasr_tpu.flf.evaluate import lattice_wer
        lat = two_path_lattice()
        assert lattice_wer(lat, "a b c [SILENCE]") == 0.0
        assert lattice_wer(lat, "a q c [SILENCE]") == pytest.approx(0.25)
        # deletions + insertions
        assert lattice_wer(lat, "a b c q q [SILENCE]") == pytest.approx(
            2.0 / 6.0)

    def test_evaluator_lattice_mode(self, tmp_path, capsys):
        lat = two_path_lattice()
        run_chain(tmp_path, [
            dict(type="evaluator", **{"lattice-evaluation": "true"})],
            lat, orths=("a x c",))
        out = capsys.readouterr().out
        assert "lattice-evaluation" in out
        # single-best is 'a b c' (wer 33%) but the lattice CONTAINS the
        # reference 'a x c' — the oracle finds it: lattice WER 0
        assert "wer=33.33%" in out
        assert "lattice-wer=0.00%" in out


class TestIoNodes:
    def test_writer_reader_roundtrip(self, tmp_path):
        lat = two_path_lattice()
        run_chain(tmp_path, [dict(type="writer",
                                  path=str(tmp_path / "lats"))], lat)
        out, = run_chain(tmp_path, [dict(type="reader", links="src",
                                         path=str(tmp_path / "lats"))],
                         lat)
        # reader ignores its lattice input; keyed by segment name
        np.testing.assert_allclose(out.scores, lat.scores)
        assert out.words == lat.words

    def test_string_to_lattice_and_dump_vocab(self, tmp_path, capsys):
        out, = run_chain(tmp_path, [dict(type="string-to-lattice"),
                                    dict(type="dump-vocab")],
                         None, orths=("hello world hello",))
        vocab = capsys.readouterr().out.split()
        assert sorted(vocab) == ["hello", "world"]

    def test_ctm_reader(self, tmp_path):
        ctm = tmp_path / "in.ctm"
        ctm.write_text("r 1 0.10 0.20 hello 0.9\n"
                       "r 1 0.35 0.15 world 0.8\n")
        out, = run_chain(tmp_path, [dict(type="ctm-reader", links="src",
                                         path=str(ctm))], None)
        labels, _, _ = out.best()
        assert [out.word_of(l) for l in labels] == ["hello", "world"]

    def test_drawer_and_traceback(self, tmp_path):
        lat = two_path_lattice()
        run_chain(tmp_path, [
            dict(type="dump-traceback", path=str(tmp_path / "tb.txt")),
            dict(type="drawer", path=str(tmp_path / "dots")),
        ], lat)
        assert (tmp_path / "tb.txt").read_text().count("\n") >= 3
        assert any(f.endswith(".dot")
                   for f in os.listdir(tmp_path / "dots"))

    def test_flf_archive_nodes(self, tmp_path):
        lat = two_path_lattice()
        arch = str(tmp_path / "lat.cache")
        run_chain(tmp_path, [dict(type="archive-writer", path=arch,
                                  format="flf")], lat)
        out, = run_chain(tmp_path, [dict(type="archive-reader",
                                         links="src", path=arch,
                                         format="flf")], lat)
        np.testing.assert_allclose(out.scores, lat.scores)


class TestThirdTierNodes:
    """append / filter / clean-up / map-alphabet / compose-with-fsa /
    local-cost-decoder / forced-alignment / segment-builder /
    dump-all-pairs-best (reference NodeRegistration.hh third tier)."""

    def _simple_lattice(self, words=("a", "b"), scores=(1.0, 2.0)):
        from rasr_tpu.flf.lattice import FlfLattice
        from rasr_tpu.flf.semiring import FlfSemiring
        sr = FlfSemiring(keys=("am", "lm"))
        lat = FlfLattice(semiring=sr, n_states=len(words) + 1,
                         words={i + 1: w for i, w in enumerate(words)})
        n = len(words)
        lat.sources = np.arange(n, dtype=np.int32)
        lat.targets = np.arange(1, n + 1, dtype=np.int32)
        lat.labels = np.arange(1, n + 1, dtype=np.int32)
        lat.scores = np.stack([np.asarray(scores), np.zeros(n)], axis=1)
        lat.boundaries = np.arange(n + 1, dtype=np.int32) * 10
        lat.final_states = np.asarray([n], np.int32)
        lat.final_scores = np.zeros((1, 2))
        return lat

    def _run_node(self, name, lat, config=None, orth=""):
        from rasr_tpu.flf.processor import NodeFactory as NODE_TYPES
        cls = NODE_TYPES[name]

        class Seg:
            full_name = "c/r/1"

        Seg.orth = orth

        class Net:
            current_segment = Seg()

        class Src:
            def __init__(self, lat):
                self._lat = lat

            def pull(self):
                return self._lat

        from rasr_tpu.core.configuration import Configuration
        cfg = Configuration(name="n")
        for k, v in (config or {}).items():
            cfg.set("*." + k, v)
        node = cls("n", cfg.sub("n"), None)
        node.network = Net()
        node._sources = {0: Src(lat), 1: Src(lat)}
        node.source = lambda i: node._sources[i]
        return node

    def test_append_concatenates(self):
        lat = self._simple_lattice()
        node = self._run_node("append", lat)
        out = node.work()
        labels, _s, _b = out.best()
        words = [out.word_of(int(l)) for l in labels if int(l) != 0]
        assert words == ["a", "b", "a", "b"]

    def test_clean_up_connects(self):
        lat = self._simple_lattice()
        # add a dead-end state + arc
        lat.n_states += 1
        lat.boundaries = np.append(lat.boundaries, 0).astype(np.int32)
        lat.sources = np.append(lat.sources, 0).astype(np.int32)
        lat.targets = np.append(lat.targets, lat.n_states - 1).astype(np.int32)
        lat.labels = np.append(lat.labels, 1).astype(np.int32)
        lat.scores = np.vstack([lat.scores, [[0.5, 0.0]]])
        out = self._run_node("clean-up", lat).work()
        assert out.n_arcs == 2  # dead arc dropped

    def test_map_alphabet(self, tmp_path):
        mapping = tmp_path / "map.txt"
        mapping.write_text("a x\nb <eps>\n")
        lat = self._simple_lattice()
        node = self._run_node("map-alphabet", lat,
                              {"mapping-file": str(mapping)})
        out = node.work()
        names = [out.word_of(int(l)) for l in out.labels if int(l) != 0]
        assert names == ["x"]
        assert (out.labels == 0).sum() == 1  # 'b' erased

    def test_local_cost_decoder_posteriors(self):
        lat = self._simple_lattice()
        out = self._run_node("local-cost-decoder", lat).work()
        # single path: posterior 1 -> weight ~0
        assert np.allclose(out.scores[:, 0], 0.0, atol=1e-6)

    def test_forced_alignment_selects_reference(self):
        from rasr_tpu.flf.lattice import FlfLattice
        from rasr_tpu.flf.semiring import FlfSemiring
        sr = FlfSemiring(keys=("am", "lm"))
        # two parallel paths: a-b and a-c; reference picks a-c
        lat = FlfLattice(semiring=sr, n_states=3,
                         words={1: "a", 2: "b", 3: "c"})
        lat.sources = np.asarray([0, 1, 1], np.int32)
        lat.targets = np.asarray([1, 2, 2], np.int32)
        lat.labels = np.asarray([1, 2, 3], np.int32)
        lat.scores = np.asarray([[1.0, 0], [0.5, 0], [2.0, 0]])
        lat.boundaries = np.asarray([0, 10, 20], np.int32)
        lat.final_states = np.asarray([2], np.int32)
        lat.final_scores = np.zeros((1, 2))
        node = self._run_node("forced-alignment", lat, orth="a c")
        out = node.work()
        labels, _s, _b = out.best()
        words = [out.word_of(int(l)) for l in labels if int(l) != 0]
        assert words == ["a", "c"]

    def test_segment_builder_writes_word_segments(self, tmp_path):
        out_file = tmp_path / "segs.txt"
        lat = self._simple_lattice()
        node = self._run_node("segment-builder", lat,
                              {"path": str(out_file)})
        node.work()
        node.finalize()
        lines = out_file.read_text().splitlines()
        assert len(lines) == 2 and lines[0].endswith(" a")

    def test_dump_all_pairs_best(self, tmp_path):
        out_file = tmp_path / "pairs.txt"
        lat = self._simple_lattice()
        node = self._run_node("dump-all-pairs-best", lat,
                              {"path": str(out_file)})
        node.work()
        text = out_file.read_text()
        assert "0 2 3.000000" in text  # 1.0 + 2.0 along the path

    def test_filter_gates_by_segment_list(self, tmp_path):
        allow = tmp_path / "allow.txt"
        allow.write_text("other/segment\n")
        lat = self._simple_lattice()
        node = self._run_node("filter", lat,
                              {"segment-list": str(allow)})
        out = node.work()
        assert out.n_arcs == 0  # current segment not in the list

    def test_union_decoder_combines_systems(self):
        lat1 = self._simple_lattice(("a", "b"), (1.0, 1.0))
        lat2 = self._simple_lattice(("c", "d"), (0.2, 0.2))
        node = self._run_node("lattice-union-decoder", lat1)
        node._sources = {0: node._sources[0],
                         1: type(node._sources[0])(lat2)}
        out = node.work()
        labels, _s, _b = out.best()
        words = [out.word_of(int(l)) for l in labels if int(l) != 0]
        assert words == ["c", "d"]  # cheaper system wins

    def test_risk_scorer_adds_dimension(self):
        lat = self._simple_lattice()
        out = self._run_node("approximated-risk-scorer", lat).work()
        assert "risk" in out.semiring.keys
        d = out.semiring.id_of("risk")
        # single-path lattice: posterior 1 -> risk 0
        assert np.allclose(out.scores[:, d], 0.0, atol=1e-6)

    def test_dump_conditional_posteriors(self, tmp_path):
        f = tmp_path / "post.txt"
        lat = self._simple_lattice()
        self._run_node("dump-conditional-posteriors", lat,
                       {"path": str(f)}).work()
        text = f.read_text()
        assert "0 1 a 1.000000" in text

    def test_aligner_emits_linear_alignment(self):
        from rasr_tpu.flf.lattice import FlfLattice
        from rasr_tpu.flf.semiring import FlfSemiring
        sr = FlfSemiring(keys=("am", "lm"))
        lat = FlfLattice(semiring=sr, n_states=3,
                         words={1: "a", 2: "b", 3: "c"})
        lat.sources = np.asarray([0, 1, 1], np.int32)
        lat.targets = np.asarray([1, 2, 2], np.int32)
        lat.labels = np.asarray([1, 2, 3], np.int32)
        lat.scores = np.asarray([[1.0, 0], [0.5, 0], [2.0, 0]])
        lat.boundaries = np.asarray([0, 10, 20], np.int32)
        lat.final_states = np.asarray([2], np.int32)
        lat.final_scores = np.zeros((1, 2))
        node = self._run_node("aligner", lat, orth="a c")
        out = node.work()
        assert out.n_arcs == 2
        words = [out.word_of(int(l)) for l in out.labels]
        assert words == ["a", "c"]
        assert out.boundaries[0] == 0 and out.boundaries[1] == 10


class TestFinalThreeNodes:
    """batch / expand-transits / forced-arc-alignment — the last three
    reference registrations (NodeRegistration.hh:98,867,2303)."""

    def test_batch_reads_argument_lists(self, tmp_path):
        f = tmp_path / "batch.txt"
        f.write_text("seg1 model-a\nseg2 model-b\n")
        lat = two_path_lattice()
        cfg = Configuration()
        cfg.set("network.nodes", "b out")
        cfg.set("network.b.type", "batch")
        cfg.set("network.b.file", str(f))
        cfg.set("network.b.port", "1")
        cfg.set("network.out.type", "sink")
        cfg.set("network.out.links", "b")
        net = FlfNetwork(cfg, context={})
        vals = []
        for i in range(2):
            net.segment_counter = i
            vals.append(net.node("b").pull())
        assert vals == ["model-a", "model-b"]
        assert net.node("b").pull_argument(0) == "seg2"

    def test_expand_transits_unique_entering_word(self, tmp_path):
        lat = two_path_lattice()
        out, = run_chain(tmp_path, [dict(type="expand-transits")], lat)
        # state 2 (entered by 'b' and 'x') must split into two copies
        assert out.n_states == lat.n_states + 1
        assert out.n_arcs == lat.n_arcs + 1  # 'c' duplicated per copy
        # every state now has exactly one distinct entering label
        entering = {}
        for k in range(out.n_arcs):
            entering.setdefault(int(out.targets[k]), set()).add(
                int(out.labels[k]))
        assert all(len(v) == 1 for v in entering.values())
        # best path unchanged
        import numpy as np
        labels_before, score_before, _ = lat.best()
        labels_after, score_after, _ = out.best()
        assert score_before == pytest.approx(score_after)

    def test_forced_arc_alignment_splits_pronunciations(self, tmp_path):
        import numpy as np

        class Pron:
            phonemes = ["ah", "b"]
            score = 0.0

        class Lemma:
            pronunciations = [Pron()]

        class Lexicon:
            def lemmas_by_orth(self, orth):
                return [Lemma()] if orth == "b" else []

        lat = two_path_lattice()
        out, = run_chain(tmp_path, [dict(type="forced-arc-alignment")],
                         lat, context={"lexicon": Lexicon()})
        # the 'b' arc (frames 2..5) splits into two phoneme arcs
        assert out.n_arcs == lat.n_arcs + 1
        phon_labels = [out.words[int(l)] for l in out.labels]
        assert "ah" in phon_labels
        # time budget preserved: sub-arc boundaries partition [2, 5]
        ah = list(out.labels).index(
            [k for k, v in out.words.items() if v == "ah"][0])
        s, t = int(out.sources[ah]), int(out.targets[ah])
        assert int(out.boundaries[s]) == 2
        assert 2 < int(out.boundaries[t]) < 5
        # scores split evenly
        np.testing.assert_allclose(out.scores[ah, 0], 0.5)
