"""FLAC codec: Python encoder round-trips through the native decoder,
plus hand-built frames for decoder-only paths (LPC, RICE2, escape
partitions, wasted bits, partitioned residuals).

Reference gates FLAC behind libflac (src/Audio/Flac.hh); this framework
ships its own codec (rasr_tpu/audio/flac.py + native/rasr_flac.cpp).
"""

import numpy as np
import pytest

from rasr_tpu.audio.flac import (BitWriter, crc8, crc16, read_flac,
                                 write_flac)


def _native_available():
    from rasr_tpu.speech.native_io import _ensure_built
    return _ensure_built() is not None


pytestmark = pytest.mark.skipif(not _native_available(),
                                reason="native toolchain unavailable")


def _signal(n, seed=0, amp=3000):
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    x = (amp * np.sin(2 * np.pi * t / 37.0)
         + rng.normal(0, amp / 8, n))
    return np.round(x).astype(np.int64)


class TestRoundTrip:
    def test_mono_exact(self, tmp_path):
        x = _signal(5000)
        p = str(tmp_path / "m.flac")
        write_flac(p, x, 16000)
        y, sr = read_flac(p)
        assert sr == 16000.0
        np.testing.assert_array_equal(y.astype(np.int64), x)

    def test_multi_frame_and_tail(self, tmp_path):
        # 2.5 blocks: exercises the shorter last frame.
        x = _signal(4096 * 2 + 2048, seed=1)
        p = str(tmp_path / "t.flac")
        write_flac(p, x, 16000, block_size=4096)
        y, _ = read_flac(p)
        np.testing.assert_array_equal(y.astype(np.int64), x)

    @pytest.mark.parametrize("mode", ["independent", "left-side",
                                      "right-side", "mid-side", "auto"])
    def test_stereo_modes(self, tmp_path, mode):
        left = _signal(3000, seed=2)
        right = left + _signal(3000, seed=3, amp=200)  # correlated
        x = np.stack([left, right], axis=1)
        p = str(tmp_path / f"{mode}.flac")
        write_flac(p, x, 16000, stereo_mode=mode)
        l, _ = read_flac(p, track=0)
        r, _ = read_flac(p, track=1)
        np.testing.assert_array_equal(l.astype(np.int64), left)
        np.testing.assert_array_equal(r.astype(np.int64), right)

    def test_mid_side_odd_parity(self, tmp_path):
        # mid = (l+r)>>1 drops a bit recovered from the side channel;
        # force odd sums to hit the parity reconstruction.
        left = np.array([1, 3, 5, -7, 9, 0, 2, -1] * 64, dtype=np.int64)
        right = np.array([0, 2, 4, -8, 8, 1, 1, -2] * 64, dtype=np.int64)
        x = np.stack([left, right], axis=1)
        p = str(tmp_path / "odd.flac")
        write_flac(p, x, 16000, stereo_mode="mid-side")
        l, _ = read_flac(p, track=0)
        r, _ = read_flac(p, track=1)
        np.testing.assert_array_equal(l.astype(np.int64), left)
        np.testing.assert_array_equal(r.astype(np.int64), right)

    def test_constant_blocks(self, tmp_path):
        x = np.full(6000, -123, dtype=np.int64)
        p = str(tmp_path / "c.flac")
        write_flac(p, x, 8000)
        y, sr = read_flac(p)
        assert sr == 8000.0
        np.testing.assert_array_equal(y.astype(np.int64), x)

    def test_nonstandard_rate_code(self, tmp_path):
        # 11025 has no 4-bit code; encoder uses the 16-bit escape (13).
        x = _signal(1000, seed=4)
        p = str(tmp_path / "r.flac")
        write_flac(p, x, 11025)
        y, sr = read_flac(p)
        assert sr == 11025.0
        np.testing.assert_array_equal(y.astype(np.int64), x)

    def test_bps8_scaling(self, tmp_path):
        # Sub-16-bit sources scale into the s16 value convention.
        x = np.clip(_signal(500, seed=5, amp=60), -128, 127)
        p = str(tmp_path / "b8.flac")
        write_flac(p, x, 16000, bps=8)
        y, _ = read_flac(p)
        np.testing.assert_array_equal(y.astype(np.int64), x * 256)

    def test_time_window(self, tmp_path):
        x = _signal(16000, seed=6)
        p = str(tmp_path / "w.flac")
        write_flac(p, x, 16000)
        y, _ = read_flac(p, start_time=0.25, end_time=0.5)
        np.testing.assert_array_equal(y.astype(np.int64), x[4000:8000])

    def test_read_audio_dispatch(self, tmp_path):
        from rasr_tpu.audio import read_audio
        x = _signal(800, seed=7)
        p = str(tmp_path / "d.flac")
        write_flac(p, x, 16000)
        y, sr = read_audio(p)
        assert sr == 16000.0
        np.testing.assert_array_equal(y.astype(np.int64), x)

    def test_corrupt_raises(self, tmp_path):
        p = str(tmp_path / "bad.flac")
        with open(p, "wb") as fh:
            fh.write(b"fLaC" + b"\x00" * 64)
        with pytest.raises(IOError):
            read_flac(p)


# ---------------------------------------------------------------------------
# Hand-built frames: exercise decoder paths the Python encoder never emits.
# ---------------------------------------------------------------------------

def _streaminfo(n, sample_rate=16000, bps=16, channels=1, block_size=4096):
    info = BitWriter()
    info.write(1, 1)
    info.write(0, 7)
    info.write(34, 24)
    info.write(block_size, 16)
    info.write(block_size, 16)
    info.write(0, 24)
    info.write(0, 24)
    info.write(sample_rate, 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n >> 32, 4)
    info.write(n & 0xFFFFFFFF, 32)
    return b"fLaC" + info.bytes() + b"\x00" * 16


def _frame_header(blocksize, sample_rate=16000, channels=1, bps=16):
    hdr = BitWriter()
    hdr.write(0b11111111111110, 14)
    hdr.write(0, 2)
    hdr.write(7, 4)                 # blocksize: 16-bit at end
    hdr.write({8000: 4, 16000: 5}[sample_rate], 4)
    hdr.write(channels - 1, 4)
    hdr.write(4, 3)                 # 16 bps
    hdr.write(0, 1)
    hdr.write(0, 8)                 # frame number 0
    hdr.write(blocksize - 1, 16)
    b = hdr.bytes()
    return b + bytes([crc8(b)])


def _finish_frame(fw):
    fw.align()
    body = fw.bytes()
    return body + crc16(body).to_bytes(2, "big")


def _zigzag(v):
    return (v << 1) if v >= 0 else ((-v) << 1) - 1


def _write_rice(fw, res, param, method=0, porder=0, order=0,
                blocksize=None, escape_raw=None):
    """Partitioned residual; escape_raw switches every partition to the
    5-bit raw escape encoding with that many bits per residual."""
    fw.write(method, 2)
    fw.write(porder, 4)
    plen = 4 if method == 0 else 5
    escape = 0xF if method == 0 else 0x1F
    nparts = 1 << porder
    per = blocksize >> porder
    idx = 0
    for p in range(nparts):
        count = per - order if p == 0 else per
        if escape_raw is not None:
            fw.write(escape, plen)
            fw.write(escape_raw, 5)
            for _ in range(count):
                fw.write_signed(int(res[idx]), escape_raw)
                idx += 1
        else:
            fw.write(param, plen)
            for _ in range(count):
                u = _zigzag(int(res[idx]))
                idx += 1
                fw.write_unary(u >> param)
                if param:
                    fw.write(u & ((1 << param) - 1), param)
    assert idx == len(res)


def _decode_bytes(tmp_path, data):
    p = str(tmp_path / "hand.flac")
    with open(p, "wb") as fh:
        fh.write(data)
    return read_flac(p)


class TestHandBuiltFrames:
    def test_lpc_subframe(self, tmp_path):
        n, order, shift = 256, 2, 1
        coef = [3, -1]
        x = _signal(n, seed=8, amp=400)
        res = [int(x[i]) - ((coef[0] * int(x[i - 1])
                             + coef[1] * int(x[i - 2])) >> shift)
               for i in range(order, n)]
        fw = BitWriter()
        for b in _frame_header(n):
            fw.write(b, 8)
        fw.write(0, 1)
        fw.write(0x20 | (order - 1), 6)   # LPC, order 2
        fw.write(0, 1)
        for v in x[:order]:
            fw.write_signed(int(v), 16)
        prec = 5
        fw.write(prec - 1, 4)
        fw.write_signed(shift, 5)
        for c in coef:
            fw.write_signed(c, prec)
        _write_rice(fw, res, param=6, order=order, blocksize=n)
        data = _streaminfo(n) + _finish_frame(fw)
        y, _ = _decode_bytes(tmp_path, data)
        np.testing.assert_array_equal(y.astype(np.int64), x)

    def test_rice2_partitioned(self, tmp_path):
        n, order, porder = 256, 1, 2
        x = _signal(n, seed=9, amp=800)
        res = np.diff(x)
        fw = BitWriter()
        for b in _frame_header(n):
            fw.write(b, 8)
        fw.write(0, 1)
        fw.write(0b001000 | order, 6)     # fixed, order 1
        fw.write(0, 1)
        fw.write_signed(int(x[0]), 16)
        _write_rice(fw, res, param=7, method=1, porder=porder,
                    order=order, blocksize=n)
        data = _streaminfo(n) + _finish_frame(fw)
        y, _ = _decode_bytes(tmp_path, data)
        np.testing.assert_array_equal(y.astype(np.int64), x)

    def test_escape_partition(self, tmp_path):
        n, order = 128, 0
        x = np.clip(_signal(n, seed=10, amp=100), -250, 250)
        fw = BitWriter()
        for b in _frame_header(n):
            fw.write(b, 8)
        fw.write(0, 1)
        fw.write(0b001000, 6)             # fixed, order 0
        fw.write(0, 1)
        _write_rice(fw, x, param=0, order=order, blocksize=n,
                    escape_raw=10)
        data = _streaminfo(n) + _finish_frame(fw)
        y, _ = _decode_bytes(tmp_path, data)
        np.testing.assert_array_equal(y.astype(np.int64), x)

    def test_wasted_bits(self, tmp_path):
        n, wasted = 192, 2
        x = (_signal(n, seed=11, amp=500) << wasted)
        fw = BitWriter()
        for b in _frame_header(n):
            fw.write(b, 8)
        fw.write(0, 1)
        fw.write(1, 6)                    # verbatim
        fw.write(1, 1)                    # wasted-bits flag
        fw.write_unary(wasted - 1)
        for v in x:
            fw.write_signed(int(v) >> wasted, 16 - wasted)
        data = _streaminfo(n) + _finish_frame(fw)
        y, _ = _decode_bytes(tmp_path, data)
        np.testing.assert_array_equal(y.astype(np.int64), x)
