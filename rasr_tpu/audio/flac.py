"""FLAC encoder (pure Python) + reader dispatch for the native decoder.

The reference gates FLAC audio input behind libflac (src/Audio/Flac.hh,
registered by src/Audio/Module.cc); this framework carries its own
dependency-free implementation: `write_flac` produces spec-compliant
streams (STREAMINFO + fixed-predictor/constant/verbatim subframes, RICE
residual coding, optional stereo decorrelation, correct CRC-8/CRC-16 and
MD5), and reading is served by the native C++ decoder
(native/rasr_flac.cpp) which additionally covers LPC subframes, RICE2,
escape partitions and wasted bits for externally produced files.

Sample convention matches audio.reader: 16-bit samples keep their
integer value range as float32.
"""

from __future__ import annotations

import hashlib
from typing import Optional, Tuple

import numpy as np

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc_table(poly: int, width: int):
    table = []
    top = 1 << (width - 1)
    mask = (1 << width) - 1
    for b in range(256):
        r = b << (width - 8)
        for _ in range(8):
            r = ((r << 1) ^ poly) & mask if r & top else (r << 1) & mask
        table.append(r)
    return table


_CRC8 = _crc_table(_CRC8_POLY, 8)
_CRC16 = _crc_table(_CRC16_POLY, 16)


def crc8(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC8[r ^ b]
    return r


def crc16(data: bytes) -> int:
    r = 0
    for b in data:
        r = _CRC16[((r >> 8) ^ b) & 0xFF] ^ ((r << 8) & 0xFFFF)
    return r


class BitWriter:
    """MSB-first bit accumulator."""

    def __init__(self):
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        if nbits == 0:
            return
        value &= (1 << nbits) - 1
        self._acc = (self._acc << nbits) | value
        self._nbits += nbits
        while self._nbits >= 8:
            self._nbits -= 8
            self._out.append((self._acc >> self._nbits) & 0xFF)
        self._acc &= (1 << self._nbits) - 1

    def write_signed(self, value: int, nbits: int) -> None:
        self.write(value & ((1 << nbits) - 1), nbits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)  # q zero bits then the terminating 1

    def align(self) -> None:
        if self._nbits:
            self.write(0, 8 - self._nbits)

    def bytes(self) -> bytes:
        assert self._nbits == 0
        return bytes(self._out)


def _zigzag(res: np.ndarray) -> np.ndarray:
    r = res.astype(np.int64)
    return np.where(r >= 0, r << 1, ((-r) << 1) - 1)


def _rice_cost(u: np.ndarray, param: int) -> int:
    return int(np.sum(u >> param)) + len(u) * (param + 1)


def _best_rice_param(u: np.ndarray) -> int:
    if len(u) == 0:
        return 0
    mean = float(np.mean(u))
    guess = max(0, int(np.log2(mean + 1)))
    best, best_cost = 0, None
    for p in range(max(0, guess - 2), min(14, guess + 3) + 1):
        c = _rice_cost(u, p)
        if best_cost is None or c < best_cost:
            best, best_cost = p, c
    return best


def _write_residual(bw: BitWriter, res: np.ndarray) -> None:
    """Single-partition RICE (method 0, partition order 0)."""
    bw.write(0, 2)   # coding method: RICE
    bw.write(0, 4)   # partition order 0
    u = _zigzag(res)
    param = _best_rice_param(u)
    bw.write(param, 4)
    for v in u:
        v = int(v)
        bw.write_unary(v >> param)
        if param:
            bw.write(v & ((1 << param) - 1), param)


_FIXED_COEF = {
    0: np.array([], dtype=np.int64),
    1: np.array([1], dtype=np.int64),
    2: np.array([2, -1], dtype=np.int64),
    3: np.array([3, -3, 1], dtype=np.int64),
    4: np.array([4, -6, 4, -1], dtype=np.int64),
}


def _fixed_residual(x: np.ndarray, order: int) -> np.ndarray:
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r)
    return r


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int) -> None:
    x = x.astype(np.int64)
    if len(x) and np.all(x == x[0]):
        bw.write(0, 1)       # pad
        bw.write(0, 6)       # constant
        bw.write(0, 1)       # no wasted bits
        bw.write_signed(int(x[0]), bps)
        return
    # Pick the cheapest fixed order by residual cost (orders > len skip).
    best_order, best_cost = None, None
    for order in range(0, 5):
        if order >= len(x):
            break
        res = _fixed_residual(x, order)
        u = _zigzag(res)
        cost = _rice_cost(u, _best_rice_param(u)) + order * bps
        if best_cost is None or cost < best_cost:
            best_order, best_cost = order, cost
    verbatim_cost = len(x) * bps
    if best_order is None or best_cost >= verbatim_cost:
        bw.write(0, 1)
        bw.write(1, 6)       # verbatim
        bw.write(0, 1)
        for v in x:
            bw.write_signed(int(v), bps)
        return
    bw.write(0, 1)
    bw.write(0b001000 | best_order, 6)  # fixed, order
    bw.write(0, 1)
    for v in x[:best_order]:
        bw.write_signed(int(v), bps)
    _write_residual(bw, _fixed_residual(x, best_order))


_RATE_CODES = {88200: 1, 176400: 2, 192000: 3, 8000: 4, 16000: 5,
               22050: 6, 24000: 7, 32000: 8, 44100: 9, 48000: 10,
               96000: 11}


def write_flac(path: str, samples: np.ndarray, sample_rate: int = 16000,
               bps: int = 16, block_size: int = 4096,
               stereo_mode: str = "auto") -> None:
    """Writes `samples` (shape (n,) mono or (n, channels)) as FLAC.

    stereo_mode: 'auto' (cheapest of independent/mid-side per frame),
    'independent', 'left-side', 'right-side', 'mid-side' — the forced
    modes exist so tests can exercise every decoder decorrelation path.
    """
    x = np.asarray(samples)
    if x.ndim == 1:
        x = x[:, None]
    x = np.round(x).astype(np.int64)
    lo, hi = -(1 << (bps - 1)), (1 << (bps - 1)) - 1
    x = np.clip(x, lo, hi)
    n, channels = x.shape
    if channels > 8:
        raise ValueError("FLAC supports at most 8 channels")
    if channels != 2 and stereo_mode not in ("auto", "independent"):
        raise ValueError("stereo modes need 2 channels")

    md5 = hashlib.md5()
    width = (bps + 7) // 8
    inter = x.astype("<i8").reshape(-1)
    raw = np.zeros((inter.size, width), dtype=np.uint8)
    for b in range(width):
        raw[:, b] = (inter >> (8 * b)) & 0xFF
    md5.update(raw.tobytes())

    frames = bytearray()
    frame_index = 0
    for start in range(0, max(n, 1), block_size):
        block = x[start:start + block_size]
        bs = len(block)
        if bs == 0:
            break
        hdr = BitWriter()
        hdr.write(0b11111111111110, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocking strategy
        hdr.write(7, 4)  # blocksize: 16-bit at end of header
        rate_code = _RATE_CODES.get(int(sample_rate))
        if rate_code is None:
            rate_code = 13 if sample_rate < 65536 else 0
        hdr.write(rate_code, 4)

        assignment = channels - 1
        ch0, ch1 = None, None
        if channels == 2:
            left = block[:, 0]
            right = block[:, 1]
            side = left - right
            mid = (left + right) >> 1
            mode = stereo_mode
            if mode == "auto":
                # side-channel energy below either input => decorrelate
                if np.abs(side).sum() < min(np.abs(left).sum(),
                                            np.abs(right).sum()):
                    mode = "mid-side"
                else:
                    mode = "independent"
            if mode == "left-side":
                assignment, ch0, ch1 = 8, (left, bps), (side, bps + 1)
            elif mode == "right-side":
                assignment, ch0, ch1 = 9, (side, bps + 1), (right, bps)
            elif mode == "mid-side":
                assignment, ch0, ch1 = 10, (mid, bps), (side, bps + 1)
        hdr.write(assignment, 4)
        hdr.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps], 3)
        hdr.write(0, 1)  # reserved
        # UTF-8 coded frame number
        fi = frame_index
        if fi < 0x80:
            hdr.write(fi, 8)
        elif fi < 0x800:
            hdr.write(0xC0 | (fi >> 6), 8)
            hdr.write(0x80 | (fi & 0x3F), 8)
        elif fi < 0x10000:
            hdr.write(0xE0 | (fi >> 12), 8)
            hdr.write(0x80 | ((fi >> 6) & 0x3F), 8)
            hdr.write(0x80 | (fi & 0x3F), 8)
        else:
            hdr.write(0xF0 | (fi >> 18), 8)
            hdr.write(0x80 | ((fi >> 12) & 0x3F), 8)
            hdr.write(0x80 | ((fi >> 6) & 0x3F), 8)
            hdr.write(0x80 | (fi & 0x3F), 8)
        hdr.write(bs - 1, 16)
        if rate_code == 13:
            hdr.write(int(sample_rate), 16)
        header_bytes = hdr.bytes()
        frame = BitWriter()
        for b in header_bytes:
            frame.write(b, 8)
        frame.write(crc8(header_bytes), 8)

        if channels == 2 and assignment >= 8:
            _write_subframe(frame, ch0[0], ch0[1])
            _write_subframe(frame, ch1[0], ch1[1])
        else:
            for c in range(channels):
                _write_subframe(frame, block[:, c], bps)
        frame.align()
        body = frame.bytes()
        frames += body
        frames += crc16(body).to_bytes(2, "big")
        frame_index += 1

    out = bytearray(b"fLaC")
    info = BitWriter()
    info.write(1, 1)    # last metadata block
    info.write(0, 7)    # STREAMINFO
    info.write(34, 24)
    info.write(block_size, 16)  # min blocksize (fixed-blocksize stream;
    info.write(block_size, 16)  # the last frame may legally be shorter)
    info.write(0, 24)   # min framesize unknown
    info.write(0, 24)   # max framesize unknown
    info.write(int(sample_rate), 20)
    info.write(channels - 1, 3)
    info.write(bps - 1, 5)
    info.write(n >> 32, 4)
    info.write(n & 0xFFFFFFFF, 32)
    out += info.bytes()
    out += md5.digest()
    out += frames
    with open(path, "wb") as fh:
        fh.write(out)


def read_flac(path: str, start_time: float = 0.0,
              end_time: Optional[float] = None, track: int = 0,
              ) -> Tuple[np.ndarray, float]:
    """Decodes via the native library (two-phase ctypes API); returns
    (samples float32 in the s16 value convention, sample_rate)."""
    from rasr_tpu.speech.native_io import native_read_flac
    decoded = native_read_flac(path, track=track)
    if decoded is None:
        raise IOError(f"FLAC decode failed for {path} "
                      "(native toolchain unavailable or corrupt stream)")
    samples, sr = decoded
    first = int(round(start_time * sr))
    last = len(samples) if end_time is None or end_time <= 0 else \
        min(int(round(end_time * sr)), len(samples))
    return samples[first:last], float(sr)
