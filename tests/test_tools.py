"""Tool-level integration tests: feature-extraction over a real corpus XML
with WAV audio into a RASR-format cache archive; archiver round trip;
feature cache byte format."""

import os
import struct
import textwrap

import numpy as np
import pytest

from rasr_tpu.audio.reader import read_wav, write_wav
from rasr_tpu.speech.feature_cache import (FeatureCacheReader,
                                           FeatureCacheWriter, pack_features,
                                           unpack_features)
from rasr_tpu.tools.archiver import main as archiver_main
from rasr_tpu.tools.feature_extraction import main as fe_main


@pytest.fixture
def setup_corpus(tmp_path):
    rng = np.random.default_rng(0)
    sr = 16000
    wav1 = tmp_path / "rec1.wav"
    write_wav(str(wav1), (rng.standard_normal(sr) * 1000), sr)
    corpus = tmp_path / "corpus.xml"
    corpus.write_text(textwrap.dedent(f"""\
        <corpus name="mini">
          <recording name="rec1" audio="rec1.wav">
            <segment name="s1" start="0.0" end="0.5"><orth>X</orth></segment>
            <segment name="s2" start="0.5" end="1.0"><orth>Y</orth></segment>
          </recording>
        </corpus>
    """))
    flow = tmp_path / "mfcc.flow"
    flow.write_text(textwrap.dedent("""\
        <network name="mfcc">
          <in name="samples"/>
          <out name="features"/>
          <param name="nr-cepstrum-coefficients"/>
          <node name="preemphasis" filter="signal-preemphasis" alpha="1.00"/>
          <link from="mfcc:samples" to="preemphasis"/>
          <node name="window" filter="signal-window" type="hamming"
                shift=".01" length="0.025"/>
          <link from="preemphasis" to="window"/>
          <node name="fft" filter="signal-real-fast-fourier-transform"
                maximum-input-size="0.025"/>
          <link from="window" to="fft"/>
          <node name="amp" filter="signal-vector-alternating-complex-f32-amplitude"/>
          <link from="fft" to="amp"/>
          <node name="filterbank" filter="signal-filterbank"
                warping-function="mel" filter-width="268.258"/>
          <link from="amp" to="filterbank"/>
          <node name="nonlinear" filter="generic-vector-f32-log"/>
          <link from="filterbank" to="nonlinear"/>
          <node name="cepstrum" filter="signal-cosine-transform"
                nr-outputs="$(nr-cepstrum-coefficients)"/>
          <link from="nonlinear" to="cepstrum"/>
          <link from="cepstrum" to="mfcc:features"/>
        </network>
    """))
    config = tmp_path / "fe.config"
    config.write_text(textwrap.dedent(f"""\
        [*.corpus]
        file = {corpus}
        [*.feature-extraction]
        file = {flow}
        nr-cepstrum-coefficients = 16
        cache-path = {tmp_path}/features.cache
    """))
    return tmp_path, config


class TestWav:
    def test_roundtrip(self, tmp_path):
        sr = 16000
        samples = (np.sin(np.arange(sr) * 0.01) * 10000).astype(np.float32)
        p = str(tmp_path / "t.wav")
        write_wav(p, samples, sr)
        back, got_sr = read_wav(p)
        assert got_sr == sr
        np.testing.assert_allclose(back, np.round(samples), atol=1.0)

    def test_segment_extraction(self, tmp_path):
        sr = 16000
        samples = np.arange(sr, dtype=np.float32)
        p = str(tmp_path / "t.wav")
        write_wav(p, samples, sr)
        seg, _ = read_wav(p, start_time=0.25, end_time=0.5)
        assert len(seg) == sr // 4
        assert seg[0] == 4000.0


class TestFeatureCache:
    def test_pack_format(self):
        feats = np.arange(6, dtype=np.float32).reshape(2, 3)
        data = pack_features(feats, [0.0, 0.01], [0.025, 0.035])
        # string header
        (nlen,) = struct.unpack_from("<I", data, 0)
        assert data[4:4 + nlen] == b"vector-f32"
        (n,) = struct.unpack_from("<I", data, 4 + nlen)
        assert n == 2
        back, starts, ends = unpack_features(data)
        np.testing.assert_array_equal(back, feats)
        np.testing.assert_allclose(starts, [0.0, 0.01])
        np.testing.assert_allclose(ends, [0.025, 0.035])

    def test_archive_roundtrip(self, tmp_path):
        p = str(tmp_path / "f.cache")
        feats = np.random.default_rng(0).standard_normal((50, 16)).astype(np.float32)
        with FeatureCacheWriter(p) as w:
            w.write("corpus/rec/seg1", feats)
        with FeatureCacheReader(p) as r:
            assert r.keys() == ["corpus/rec/seg1"]
            back, starts, ends = r.read("corpus/rec/seg1")
            np.testing.assert_array_equal(back, feats)
            assert abs(starts[1] - 0.01) < 1e-9


class TestFeatureExtractionTool:
    def test_end_to_end(self, setup_corpus):
        tmp_path, config = setup_corpus
        status = fe_main([f"--config={config}"])
        assert status == 0
        with FeatureCacheReader(str(tmp_path / "features.cache")) as r:
            keys = sorted(r.keys())
            assert keys == ["mini/rec1/s1", "mini/rec1/s2"]
            feats, starts, ends = r.read("mini/rec1/s1")
            # 0.5s at 16kHz = 8000 samples -> ceil((8000-400)/160)+1 = 49 frames
            assert feats.shape == (49, 16)
            assert np.isfinite(feats).all()
            # timestamps offset by the segment start
            f2, s2, _ = r.read("mini/rec1/s2")
            assert abs(s2[0] - 0.5) < 1e-9

    def test_partitioned_extraction_combines(self, setup_corpus, capsys):
        """Two partition jobs + archiver copy == full run (the reference
        distributed workflow)."""
        tmp_path, config = setup_corpus
        for part in range(2):
            fe_main([f"--config={config}",
                     "--*.corpus.partition=2",
                     f"--*.corpus.select-partition={part}",
                     f"--*.feature-extraction.cache-path={tmp_path}/part{part}.cache"])
        archiver_main(["copy", f"{tmp_path}/part0.cache",
                       f"{tmp_path}/part1.cache", f"{tmp_path}/combined.cache"])
        fe_main([f"--config={config}"])
        with FeatureCacheReader(f"{tmp_path}/combined.cache") as a, \
                FeatureCacheReader(f"{tmp_path}/features.cache") as b:
            assert sorted(a.keys()) == sorted(b.keys())
            for k in a.keys():
                np.testing.assert_array_equal(a.features(k), b.features(k))


class TestLmUtilAndCosta:
    def test_lm_util_score(self, tmp_path, capsys):
        from rasr_tpu.tools.lm_util import main as lm_main
        arpa = tmp_path / "lm.arpa"
        arpa.write_text(
            "\\data\\\nngram 1=4\n\n\\1-grams:\n-0.60206\t</s>\n-99\t<s>\n"
            "-0.30103\tA\n-0.60206\tB\n\n\\end\\\n")
        text = tmp_path / "text.txt"
        text.write_text("A B\n")
        status = lm_main([f"--*.lm.file={arpa}", f"--*.file={text}",
                          "--*.action=score-sentences",
                          "--*.log.channel=nil"])
        assert status == 0
        out = capsys.readouterr().out
        assert "perplexity=" in out and "sentences=1" in out

    def test_costa(self, setup_corpus, capsys, tmp_path):
        from rasr_tpu.tools.corpus_statistics import main as costa_main
        corpus_dir, config = setup_corpus
        vocab = tmp_path / "v.txt"
        vocab.write_text("X\n")
        status = costa_main([f"--config={config}",
                             f"--*.lexicon.file=vocab-text:{vocab}"])
        assert status == 0
        import json
        stats = json.loads(capsys.readouterr().out)
        assert stats["segments"] == 2
        assert stats["oov-tokens"] == 1  # "Y" not in lexicon


class TestNativeIo:
    def test_native_reader_matches_python(self, tmp_path):
        from rasr_tpu.speech.native_io import (NativeFeatureCacheReader,
                                               native_available)
        if not native_available():
            pytest.skip("no native toolchain")
        rng = np.random.default_rng(3)
        p = str(tmp_path / "f.cache")
        feats = {f"c/r/s{i}": rng.standard_normal((30 + i, 12)).astype(np.float32)
                 for i in range(3)}
        with FeatureCacheWriter(p) as w:
            for k, v in feats.items():
                w.write(k, v)
        with NativeFeatureCacheReader(p) as nr, FeatureCacheReader(p) as pr:
            assert sorted(nr.keys()) == sorted(pr.keys())
            for k in feats:
                nf, ns, ne = nr.read(k)
                pf, ps, pe = pr.read(k)
                np.testing.assert_array_equal(nf, pf)
                np.testing.assert_allclose(ns, ps)
                np.testing.assert_allclose(ne, pe)

    def test_open_feature_cache_fallback(self, tmp_path):
        from rasr_tpu.speech.native_io import open_feature_cache
        p = str(tmp_path / "f.cache")
        with FeatureCacheWriter(p) as w:
            w.write("x", np.ones((5, 4), np.float32))
        with open_feature_cache(p) as r:
            assert r.features("x").shape == (5, 4)


class TestArchiverModes:
    """Reference-parity archiver modes + typed show
    (src/Tools/Archiver/Archiver.cc:41-76)."""

    def _make_archive(self, tmp_path, items):
        from rasr_tpu.core.archive import FileArchive
        p = str(tmp_path / "a.cache")
        with FileArchive(p, "w") as ar:
            for k, v in items.items():
                ar.write(k, v)
        return p

    def test_add_extract_remove(self, tmp_path, capsys):
        src = tmp_path / "dir" / "sub"
        src.mkdir(parents=True)
        (src / "x.txt").write_bytes(b"hello")
        (tmp_path / "one.bin").write_bytes(b"\x01\x02")
        p = str(tmp_path / "a.cache")
        assert archiver_main(["--mode=add", "--quiet", p,
                              str(tmp_path / "dir"),
                              str(tmp_path / "one.bin")]) == 0
        capsys.readouterr()
        assert archiver_main(["--mode=list", p]) == 0
        out = capsys.readouterr().out.splitlines()
        assert out == ["one.bin", "sub/x.txt"]
        os.chdir(tmp_path)
        assert archiver_main(["--mode=extract", "--quiet", p,
                              "sub/x.txt"]) == 0
        assert (tmp_path / "sub" / "x.txt").read_bytes() == b"hello"
        assert archiver_main(["--mode=extractAll", "--quiet", p,
                              str(tmp_path / "all")]) == 0
        assert (tmp_path / "all" / "one.bin").read_bytes() == b"\x01\x02"
        assert archiver_main(["--mode=remove", "--quiet", p,
                              "one.bin"]) == 0
        capsys.readouterr()
        archiver_main(["--mode=list", p])
        assert capsys.readouterr().out.splitlines() == ["sub/x.txt"]

    def test_combine_select_and_overwrite(self, tmp_path, capsys):
        a = self._make_archive(tmp_path, {"s1": b"A", "s2": b"B"})
        b = str(tmp_path / "b.cache")
        from rasr_tpu.core.archive import FileArchive
        with FileArchive(b, "w") as ar:
            ar.write("s3", b"C")
        sel = tmp_path / "sel.txt"
        sel.write_text("s1\n# comment\ns3\n")
        dst = str(tmp_path / "dst.cache")
        assert archiver_main(["--mode=combine", "--quiet",
                              f"--select={sel}", dst, a, b]) == 0
        from rasr_tpu.core.archive import open_archive
        with open_archive(dst) as ar:
            assert sorted(ar.keys()) == ["s1", "s3"]
        # keep-first: existing s1 is preserved
        a2 = self._make_archive(tmp_path, {"s1": b"NEW"})
        assert archiver_main(["--mode=combine", "--overwrite=no",
                              "--quiet", dst, a2]) == 0
        with open_archive(dst) as ar:
            assert ar.read("s1") == b"A"
        # replace: overwritten
        assert archiver_main(["--mode=combine", "--overwrite=replace",
                              "--quiet", dst, a2]) == 0
        with open_archive(dst) as ar:
            assert ar.read("s1") == b"NEW"

    def test_show_align_with_allophones(self, tmp_path, capsys):
        from rasr_tpu.speech.alignment import Alignment
        align = Alignment(np.arange(3), np.asarray(
            [(1 << 6) | 0, (1 << 6) | 1, (2 << 6) | 0]),
            np.asarray([1.0, 1.0, 0.5], np.float32))
        p = self._make_archive(tmp_path, {"seg": align.pack()})
        allo = tmp_path / "allophones.txt"
        allo.write_text("# header\nsil{#+#}@i@f\na{#+b}@i\nb{a+#}@f\n")
        lut = tmp_path / "tying.lut"
        lut.write_text("a{#+b}@i.0 7\na{#+b}@i.1 8\nb{a+#}@f.0 9\n")
        assert archiver_main(["--mode=show", "--type=align",
                              f"--allophone-file={allo}",
                              f"--lut={lut}", p, "seg"]) == 0
        lines = capsys.readouterr().out.splitlines()
        assert "allophone=\ta{#+b}@i" in lines[0]
        assert "tied=\t7" in lines[0]
        assert "tied=\t8" in lines[1]
        assert "state=\t1" in lines[1]
        assert "weight\t= 0.5" in lines[2]
        # flow-cache type dispatches on the datatype header
        assert archiver_main(["--mode=show", "--type=flow-cache",
                              p, "seg"]) == 0
        assert "emission=" in capsys.readouterr().out

    def test_show_feat_and_matrix(self, tmp_path, capsys):
        feats = np.asarray([[1.5, -2.0], [0.25, 3.0]], np.float32)
        data = pack_features(feats, np.asarray([0.0, 0.01]),
                             np.asarray([0.01, 0.02]))
        m = struct.pack("<II", 2, 2) + np.asarray(
            [[1, 2], [3, 4]], "<f4").tobytes()
        p = self._make_archive(tmp_path, {"seg": data, "mat": m})
        assert archiver_main(["--mode=show", "--type=feat", p, "seg"]) == 0
        out = capsys.readouterr().out
        assert "2 frames x 2 dims" in out
        assert "0.000 0.010 1.500000 -2.000000" in out
        assert archiver_main(["--mode=show", "--type=bin-matrix",
                              p, "mat"]) == 0
        out = capsys.readouterr().out
        assert '<matrix-f32 nRows="2" nColumns="2">' in out
        assert "3.000000 4.000000" in out

    def test_recover_rebuilds_truncated_table(self, tmp_path, capsys):
        from rasr_tpu.core.archive import open_archive
        p = self._make_archive(tmp_path, {"k1": b"data1", "k2": b"data2"})
        # break the finalized-table flag so readers must tag-scan
        with open(p, "r+b") as fh:
            fh.seek(8)
            fh.write(b"\x00")
            fh.truncate(os.path.getsize(p) - 1)
        assert archiver_main(["--mode=recover", "--quiet", p]) == 0
        with open_archive(p) as ar:
            assert sorted(ar.keys()) == ["k1", "k2"]
            assert ar.read("k1") == b"data1"
