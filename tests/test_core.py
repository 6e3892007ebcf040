"""Core foundation tests: configuration matching/resolution semantics
(mirrors the examples in the reference doc/configuration.rst), parameters,
archives, binary streams."""

import os

import numpy as np
import pytest

from rasr_tpu.core import (BinaryReader, BinaryWriter, Choice, Configuration,
                           ConfigurationError, FileArchive, BundleArchive,
                           DirectoryArchive, ParameterBool, ParameterChoice,
                           ParameterFloat, ParameterInt, ParameterString,
                           open_archive, pack_to_bytes)


class TestConfigurationMatching:
    """Examples straight from doc/configuration.rst."""

    def setup_method(self):
        self.c = Configuration()
        self.c.set("*.hmm.number-of-states", "3")
        self.c.set("*.hmm.*.exit", "43.34")
        self.c.set("*.phoneme-look-ahead.*.hmm.number-of-states", "1")

    def q(self, path):
        sel, name = path.rsplit(".", 1)
        view = Configuration()
        view._db = self.c._db
        view._selection = tuple(sel.split("."))
        return view.get(name)

    def test_direct(self):
        assert self.q("speech-recognizer.acoustic-model.hmm.number-of-states") == "3"

    def test_wildcard_tail(self):
        assert self.q("speech-recognizer.acoustic-model.hmm.silence.exit") == "43.34"

    def test_more_specific_wins(self):
        assert self.q(
            "speech-recognizer.phoneme-look-ahead.acoustic-model.hmm.number-of-states") == "1"

    def test_wildcard_in_middle(self):
        assert self.q(
            "speech-recognizer.phoneme-look-ahead.acoustic-model.hmm.silence.exit") == "43.34"

    def test_no_match(self):
        assert self.q("speech-recognizer.acoustic-model.hmm.missing") is None


class TestConfigurationReferences:
    def test_context_dependent_reference(self):
        # $(ref) resolves against successively truncated selection scopes
        # (src/Core/Configuration.cc resolveReferences scope walk)
        c = Configuration()
        c.set("*.abc.foo", "cat")
        c.set("*.xyz.foo", "dog")
        c.set("app.*.bar", "/tmp/$(foo).txt")
        abc = Configuration(); abc._db = c._db; abc._selection = ("app", "abc")
        xyz = Configuration(); xyz._db = c._db; xyz._selection = ("app", "xyz")
        assert abc.get("bar") == "/tmp/cat.txt"
        assert xyz.get("bar") == "/tmp/dog.txt"

    def test_global_reference(self):
        c = Configuration()
        c.set("base-dir", "/data")
        c.set("*.corpus.file", "$(base-dir)/corpus.xml")
        v = Configuration(); v._db = c._db; v._selection = ("app", "corpus")
        assert v.get("file") == "/data/corpus.xml"

    def test_arithmetic(self):
        c = Configuration(name="app")
        c.set("*.lm-scale", "13.34")
        c.set("*.reciprocal", "$[1 / $(lm-scale)]")
        v = float(c.get("reciprocal"))
        assert abs(v - 1 / 13.34) < 1e-12

    def test_arithmetic_int_format(self):
        c = Configuration(name="app")
        c.set("*.val", "3")
        c.set("*.x", "$[ $(val) - 1, int]")
        assert c.get("x") == "2"

    def test_nested_arithmetic_reference(self):
        c = Configuration(name="app")
        c.set("*.cmp-2.value", "45.89")
        c.set("*.val", "3")
        c.set("*.foo", "$[ $(cmp-$[ $(val) - 1, int].value) * 2 ]")
        assert abs(float(c.get("foo")) - 91.78) < 1e-9

    def test_circular_reference_raises(self):
        c = Configuration(name="app")
        c.set("*.a", "$(b)")
        c.set("*.b", "$(a)")
        with pytest.raises(ConfigurationError):
            c.get("a")


class TestConfigFile:
    def test_groups_include_comments(self, tmp_path):
        inc = tmp_path / "inc.config"
        inc.write_text("states-per-phone = 3\n")
        main = tmp_path / "main.config"
        main.write_text(
            "# a comment\n"
            "[*.output-channel]\n"
            "file = logfile.log  # trailing comment\n"
            "append = true\n"
            "[*.acoustic-model.hmm]\n"
            "include inc.config\n"
            "silence.loop = 0.0\n")
        c = Configuration(name="app")
        c.set_from_file(str(main))
        r = c.resources()
        assert r["*.output-channel.file"] == "logfile.log"
        assert r["*.output-channel.append"] == "true"
        assert r["*.acoustic-model.hmm.states-per-phone"] == "3"
        assert r["*.acoustic-model.hmm.silence.loop"] == "0.0"

    def test_command_line(self):
        c = Configuration(name="tool")
        rest = c.set_from_command_line(
            ["--*.channel=stderr", "positional", "--tool.beam=16"])
        assert rest == ["positional"]
        assert c.get("channel") == "stderr"
        assert c.get("beam") == "16"


class TestParameters:
    def test_types(self):
        c = Configuration(name="app")
        c.set("*.flag", "yes")
        c.set("*.n", "42")
        c.set("*.x", "2.5")
        c.set("*.s", "hello")
        c.set("*.mode", "fast")
        assert ParameterBool("flag")(c) is True
        assert ParameterInt("n")(c) == 42
        assert ParameterFloat("x")(c) == 2.5
        assert ParameterString("s")(c) == "hello"
        choice = Choice(("fast", 0), ("slow", 1))
        assert ParameterChoice("mode", choice)(c) == 0

    def test_defaults_and_ranges(self):
        c = Configuration(name="app")
        assert ParameterInt("missing", default=7)(c) == 7
        c.set("*.neg", "-1")
        with pytest.raises(ValueError):
            ParameterInt("neg", minimum=0)(c)


class TestBinaryStream:
    def test_roundtrip(self, tmp_path):
        p = tmp_path / "bin"
        with open(p, "wb") as fh:
            w = BinaryWriter(fh)
            w.u32(0xDEADBEEF); w.f32(1.5); w.f64(-2.25)
            w.string("héllo"); w.bool(True)
            w.f32_array([1, 2, 3])
        with open(p, "rb") as fh:
            r = BinaryReader(fh)
            assert r.u32() == 0xDEADBEEF
            assert r.f32() == 1.5
            assert r.f64() == -2.25
            assert r.string() == "héllo"
            assert r.bool() is True
            np.testing.assert_array_equal(r.f32_array(3), [1, 2, 3])

    def test_little_endian(self):
        data = pack_to_bytes(lambda w: w.u32(1))
        assert data == b"\x01\x00\x00\x00"


class TestArchives:
    def test_file_archive_roundtrip(self, tmp_path):
        p = str(tmp_path / "cache.archive")
        with FileArchive(p, "w") as ar:
            ar.write("corpus/rec1/seg1", b"A" * 1000)  # compressible
            ar.write("corpus/rec1/seg2", os.urandom(64))  # incompressible
        with FileArchive(p, "r") as ar:
            assert set(ar.keys()) == {"corpus/rec1/seg1", "corpus/rec1/seg2"}
            assert ar.read("corpus/rec1/seg1") == b"A" * 1000

    def test_file_archive_magic(self, tmp_path):
        p = str(tmp_path / "cache.archive")
        with FileArchive(p, "w") as ar:
            ar.write("x", b"data")
        with open(p, "rb") as fh:
            assert fh.read(8) == b"SP_ARC1\x00"

    def test_append_mode(self, tmp_path):
        p = str(tmp_path / "cache.archive")
        with FileArchive(p, "w") as ar:
            ar.write("a", b"1")
        with FileArchive(p, "a") as ar:
            ar.write("b", b"2")
        with FileArchive(p, "r") as ar:
            assert ar.read("a") == b"1" and ar.read("b") == b"2"

    def test_recovery_scan_without_table(self, tmp_path):
        """An archive whose info table was never written is recovered by
        scanning recovery tags (as the reference does)."""
        p = str(tmp_path / "crashed.archive")
        ar = FileArchive(p, "w")
        ar.write("item", b"payload")
        ar._fh.flush()
        os.fsync(ar._fh.fileno())
        import shutil
        shutil.copy(p, p + ".crash")
        ar.close()
        with FileArchive(p + ".crash", "r") as rec:
            assert rec.read("item") == b"payload"

    def test_directory_archive(self, tmp_path):
        d = str(tmp_path / "dir")
        ar = DirectoryArchive(d, "w")
        ar.write("sub/item", b"x")
        assert DirectoryArchive(d).read("sub/item") == b"x"

    def test_bundle(self, tmp_path):
        a1 = str(tmp_path / "p1.archive")
        a2 = str(tmp_path / "p2.archive")
        with FileArchive(a1, "w") as ar:
            ar.write("seg1", b"one")
        with FileArchive(a2, "w") as ar:
            ar.write("seg2", b"two")
        bundle = tmp_path / "all.bundle"
        bundle.write_text("p1.archive\np2.archive\n")
        with open_archive(str(bundle)) as ar:
            assert ar.read("seg1") == b"one"
            assert ar.read("seg2") == b"two"


class TestArchiveOverwrite:
    def test_remove_and_reuse_slot(self, tmp_path):
        p = str(tmp_path / "c.archive")
        data_a = os.urandom(500)  # incompressible: stored raw
        data_b = os.urandom(500)
        with FileArchive(p, "w") as ar:
            ar.write("a", data_a, compress=False)
            ar.write("keep", b"other")
        size_after_first = os.path.getsize(p)
        with FileArchive(p, "a") as ar:
            ar.remove("a")
            assert "a" not in ar.keys()
            # same name length + same payload size -> slot reused in place
            ar.write("b", data_b, compress=False)
        assert os.path.getsize(p) <= size_after_first + 64
        with FileArchive(p, "r") as ar:
            assert ar.read("b") == data_b
            assert ar.read("keep") == b"other"
            assert "a" not in ar.keys()

    def test_overwrite_replaces(self, tmp_path):
        p = str(tmp_path / "c.archive")
        with FileArchive(p, "w") as ar:
            ar.write("x", b"one")
            ar.write("x", b"two-longer-payload")
        with FileArchive(p, "r") as ar:
            assert ar.read("x") == b"two-longer-payload"

    def test_overwrite_disabled(self, tmp_path):
        from rasr_tpu.core.archive import ArchiveError
        p = str(tmp_path / "c.archive")
        with FileArchive(p, "w") as ar:
            ar.write("x", b"one")
            with pytest.raises(ArchiveError):
                ar.write("x", b"again", allow_overwrite=False)


class TestMisc:
    def test_progress_indicator(self, capsys):
        import io
        from rasr_tpu.core.misc import ProgressIndicator
        buf = io.StringIO()
        with ProgressIndicator("test", total=10, stream=buf,
                               min_interval=0.0) as p:
            for i in range(10):
                p.notify()
        out = buf.getvalue()
        assert "10/10" in out and "test: 10 items in" in out

    def test_dependency_set(self, tmp_path):
        from rasr_tpu.core.misc import DependencySet
        f = tmp_path / "input.txt"
        f.write_text("content")
        deps = DependencySet()
        deps.add_value("version", 3)
        deps.add_file("corpus", str(f))
        p = str(tmp_path / "artifact.deps")
        deps.write(p)
        current = DependencySet()
        current.add_value("version", 3)
        current.add_file("corpus", str(f))
        assert current.satisfies(DependencySet.read(p))
        f.write_text("changed")
        stale = DependencySet()
        stale.add_value("version", 3)
        stale.add_file("corpus", str(f))
        assert not stale.satisfies(DependencySet.read(p))


class TestResources:
    def test_memory_and_usage(self):
        from rasr_tpu.core.resources import (format_resource_usage,
                                             memory_info, resource_usage)
        m = memory_info()
        assert m.get("vmrss", m.get("vmhwm", 0)) > 0
        u = resource_usage()
        assert u["peak-rss-bytes"] > 0 and u["user-cpu-s"] >= 0
        assert "rss" in format_resource_usage()

    def test_assertions(self):
        from rasr_tpu.core.resources import (AssertionFailure, defect,
                                             require, verify)
        require(True)
        verify(1 == 1)
        with pytest.raises(AssertionFailure, match="require"):
            require(False, "precondition")
        with pytest.raises(AssertionFailure, match="verify"):
            verify(False)
        with pytest.raises(AssertionFailure, match="defect"):
            defect()
