"""SparseVector and cache-manager command resolution."""

import io
import os
import stat

import numpy as np
import pytest

from rasr_tpu.core import cache_manager
from rasr_tpu.math.sparse import SparseVector


class TestSparseVector:
    def test_dense_roundtrip(self):
        d = np.asarray([0, 1.5, 0, 0, -2.0, 0], np.float32)
        sv = SparseVector.from_dense(d)
        assert sv.n_active == 2
        np.testing.assert_array_equal(sv.to_dense(), d)

    def test_random_access_and_default(self):
        sv = SparseVector.from_pairs(5, [(3, 2.0), (1, 1.0)], default=0.5)
        assert sv[1] == 1.0 and sv[3] == 2.0
        assert sv[0] == 0.5  # default
        with pytest.raises(IndexError):
            sv[9]

    def test_pairs_sorted(self):
        sv = SparseVector.from_pairs(6, [(4, 1.0), (0, 2.0), (2, 3.0)])
        assert sv.indices.tolist() == [0, 2, 4]
        assert [p for p, _ in sv] == [0, 2, 4]

    def test_dot_dense_and_sparse(self):
        a = SparseVector.from_pairs(4, [(0, 1.0), (2, 3.0)])
        b = np.asarray([2.0, 5.0, 1.0, 7.0], np.float32)
        assert a.dot(b) == pytest.approx(1 * 2 + 3 * 1)
        c = SparseVector.from_pairs(4, [(2, 2.0), (3, 4.0)])
        assert a.dot(c) == pytest.approx(3 * 2)

    def test_dot_with_default(self):
        a = SparseVector.from_pairs(3, [(1, 2.0)], default=1.0)
        b = np.asarray([1.0, 1.0, 1.0], np.float32)
        assert a.dot(b) == pytest.approx(1 + 2 + 1)

    def test_add(self):
        a = SparseVector.from_pairs(4, [(0, 1.0), (2, 3.0)])
        b = SparseVector.from_pairs(4, [(2, 2.0), (3, 4.0)])
        s = a + b
        np.testing.assert_allclose(s.to_dense(), [1, 0, 5, 4])

    def test_binary_io(self):
        sv = SparseVector.from_pairs(7, [(1, 1.5), (5, -2.0)], default=0.25)
        buf = io.BytesIO()
        sv.write(buf)
        buf.seek(0)
        back = SparseVector.read(buf)
        assert back.size == 7 and back.default == 0.25
        np.testing.assert_array_equal(back.to_dense(), sv.to_dense())


class TestCacheManager:
    def make_cf(self, tmp_path, staging_dir):
        """Fake cache-manager: echoes a staged path, copying the file."""
        cf = tmp_path / "cf"
        cf.write_text(f"""#!/bin/sh
for last; do :; done
name=$(basename "$last")
staged="{staging_dir}/$name"
[ -f "$last" ] && cp "$last" "$staged"
echo "$staged"
""")
        cf.chmod(cf.stat().st_mode | stat.S_IEXEC)
        return str(cf)

    def test_resolve_and_copy_back(self, tmp_path, monkeypatch):
        staging = tmp_path / "local"
        staging.mkdir()
        monkeypatch.setenv("CACHE_MANAGER_PATH",
                           self.make_cf(tmp_path, staging))
        src = tmp_path / "data.txt"
        src.write_text("hello")
        resolved = cache_manager.resolve_cache_manager_commands(
            f"`cf {src}`")
        assert resolved == str(staging / "data.txt")
        assert open(resolved).read() == "hello"

        # -d: output file staged locally, copied back on demand
        out_orig = tmp_path / "out" / "result.txt"
        resolved = cache_manager.resolve_cache_manager_commands(
            f"`cf -d {out_orig}`")
        with open(resolved, "w") as fh:
            fh.write("generated")
        n = cache_manager.copy_local_cache_files()
        assert n == 1
        assert out_orig.read_text() == "generated"

    def test_missing_binary_falls_back(self, monkeypatch):
        monkeypatch.setenv("CACHE_MANAGER_PATH", "/nonexistent/cf")
        cache_manager.warnings.clear()
        out = cache_manager.resolve_cache_manager_commands(
            "`cf /some/path.txt`")
        assert out == "/some/path.txt"
        assert cache_manager.warnings

    def test_plain_path_untouched(self):
        assert cache_manager.resolve_cache_manager_commands(
            "/a/b/c.txt") == "/a/b/c.txt"
