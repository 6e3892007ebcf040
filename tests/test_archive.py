"""Shared multi-writer FileArchive: concurrent appends under flock with
recovery-tag scanning (reference: multi-job cache archive appends with
recovery; core FileArchive tests live in test_core.py)."""

import os

# -- shared multi-writer archives -------------------------------------------


class TestSharedMultiWriterArchive:
    """Concurrent appends from several processes with flock + recovery
    tags (reference: multi-job cache archive appends)."""

    def test_two_handles_interleaved_appends(self, tmp_path):
        from rasr_tpu.core.archive import FileArchive
        p = str(tmp_path / "shared.cache")
        w1 = FileArchive(p, "a", shared=True)
        w2 = FileArchive(p, "a", shared=True)
        w1.write("seg-1", b"one")
        w2.write("seg-2", b"two" * 100)
        w1.write("seg-3", b"three")
        w2.close()
        w1.close()
        r = FileArchive(p, "r")
        assert sorted(r.keys()) == ["seg-1", "seg-2", "seg-3"]
        assert r.read("seg-2") == b"two" * 100
        r.close()

    def test_concurrent_processes(self, tmp_path):
        import subprocess
        import sys
        p = str(tmp_path / "mp.cache")
        script = (
            "import sys; sys.path.insert(0, %r);"
            "from rasr_tpu.core.archive import FileArchive;"
            "a = FileArchive(%r, 'a', shared=True);"
            "[a.write('w%%s-%%d' %% (sys.argv[1], i),"
            "         (sys.argv[1] * 50).encode() * (i + 1))"
            " for i in range(25)];"
            "a.close()" % (os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), p))
        procs = [subprocess.Popen([sys.executable, "-c", script, tag])
                 for tag in ("A", "B", "C")]
        for proc in procs:
            assert proc.wait() == 0
        from rasr_tpu.core.archive import FileArchive
        r = FileArchive(p, "r")
        assert len(r.keys()) == 75
        assert r.read("wB-3") == b"B" * 50 * 4
        r.close()

    def test_crashed_writer_partial_record_recovered(self, tmp_path):
        from rasr_tpu.core.archive import FileArchive
        p = str(tmp_path / "crash.cache")
        w = FileArchive(p, "a", shared=True)
        w.write("good-1", b"data1")
        w.write("good-2", b"data2")
        w.close()
        # simulate a writer dying mid-record: append garbage start tag +
        # truncated payload
        import struct
        with open(p, "ab") as fh:
            fh.write(struct.pack("<I", 0xAA55AA55))
            fh.write(b"partial-garbage")
        r = FileArchive(p, "r")
        assert sorted(r.keys()) == ["good-1", "good-2"]
        assert r.read("good-2") == b"data2"
        r.close()

    def test_finalize_writes_info_table(self, tmp_path):
        from rasr_tpu.core.archive import FileArchive
        p = str(tmp_path / "fin.cache")
        w = FileArchive(p, "a", shared=True)
        for i in range(5):
            w.write(f"item-{i}", bytes([i]) * 64)
        w.finalize()
        w.close()
        r = FileArchive(p, "r")
        # table present: reader did not need a recovery scan
        with open(p, "rb") as fh:
            fh.seek(8)
            assert fh.read(1) == b"\x01"
        assert len(r.keys()) == 5 and r.read("item-3") == b"\x03" * 64
        r.close()

    def test_shared_reopen_after_finalize_unfinalizes(self, tmp_path):
        from rasr_tpu.core.archive import FileArchive
        p = str(tmp_path / "refin.cache")
        w = FileArchive(p, "a", shared=True)
        w.write("x", b"1")
        w.finalize()
        w.close()
        w2 = FileArchive(p, "a", shared=True)
        w2.write("y", b"2")
        w2.close()
        r = FileArchive(p, "r")
        assert sorted(r.keys()) == ["x", "y"]
        r.close()
