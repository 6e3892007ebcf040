"""ctypes bindings for the native IO runtime (native/rasr_io.cpp).

The reference's archive/cache runtime is C++ (src/Core/FileArchive.cc,
src/Flow/Cache.cc); this module loads the equivalent native library (built
on demand with g++) for the data-loader hot path and transparently falls
back to the pure-Python implementation when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librasr_io.so")

_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    try:
        # every .cpp the Makefile compiles into the .so participates in the
        # staleness check (an edited rasr_beam.cpp must trigger a rebuild,
        # or NativeBeam would run stale kernel code)
        import glob as _glob
        srcs = [os.path.join(_NATIVE_DIR, f) for f in ("Makefile",)] + \
            _glob.glob(os.path.join(_NATIVE_DIR, "*.cpp"))
        if (not os.path.exists(_LIB_PATH)
                or any(os.path.getmtime(_LIB_PATH) < os.path.getmtime(s)
                       for s in srcs if os.path.exists(s))):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rasr_archive_open.restype = ctypes.c_void_p
        lib.rasr_archive_open.argtypes = [ctypes.c_char_p]
        lib.rasr_archive_close.argtypes = [ctypes.c_void_p]
        lib.rasr_archive_n_items.restype = ctypes.c_int64
        lib.rasr_archive_n_items.argtypes = [ctypes.c_void_p]
        lib.rasr_archive_key.restype = ctypes.c_int64
        lib.rasr_archive_key.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                         ctypes.c_char_p, ctypes.c_int64]
        lib.rasr_archive_read.restype = ctypes.c_int64
        lib.rasr_archive_read.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                          ctypes.c_void_p, ctypes.c_int64]
        lib.rasr_cache_unpack.restype = ctypes.c_int64
        lib.rasr_cache_unpack.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64)]
        _lib = lib
    except Exception:
        _build_failed = True
        _lib = None
    return _lib


def native_available() -> bool:
    return _ensure_built() is not None


class NativeFeatureCacheReader:
    """Native-backed feature cache reader (finished SP_ARC1 archives);
    raises on open failure so callers can fall back."""

    def __init__(self, path: str):
        lib = _ensure_built()
        if lib is None:
            raise RuntimeError("native IO library unavailable")
        self._lib = lib
        self._handle = lib.rasr_archive_open(path.encode())
        if not self._handle:
            raise RuntimeError(f"native open failed for {path}")

    def keys(self) -> List[str]:
        n = self._lib.rasr_archive_n_items(self._handle)
        out = []
        buf = ctypes.create_string_buffer(4096)
        for i in range(n):
            ln = self._lib.rasr_archive_key(self._handle, i, buf, 4096)
            if 0 <= ln < 4096:
                out.append(buf.value.decode())
        return out

    def read(self, name: str) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        size = self._lib.rasr_archive_read(self._handle, name.encode(),
                                           None, 0)
        if size < 0:
            raise KeyError(name)
        raw = np.empty(size, dtype=np.uint8)
        got = self._lib.rasr_archive_read(
            self._handle, name.encode(),
            raw.ctypes.data_as(ctypes.c_void_p), size)
        if got != size:
            raise IOError(f"short read for {name}")
        dim = ctypes.c_int64(0)
        n_frames = self._lib.rasr_cache_unpack(
            raw.ctypes.data_as(ctypes.c_void_p), size, None, None, None,
            ctypes.byref(dim))
        if n_frames < 0:
            raise ValueError(f"malformed cache item {name}")
        feats = np.empty((n_frames, max(dim.value, 0)), dtype=np.float32)
        starts = np.empty(n_frames, dtype=np.float64)
        ends = np.empty(n_frames, dtype=np.float64)
        got = self._lib.rasr_cache_unpack(
            raw.ctypes.data_as(ctypes.c_void_p), size,
            feats.ctypes.data_as(ctypes.c_void_p),
            starts.ctypes.data_as(ctypes.c_void_p),
            ends.ctypes.data_as(ctypes.c_void_p), ctypes.byref(dim))
        if got != n_frames:
            raise ValueError(f"unpack failed for {name}")
        return feats, starts, ends

    def features(self, name: str) -> np.ndarray:
        return self.read(name)[0]

    def close(self):
        if self._handle:
            self._lib.rasr_archive_close(self._handle)
            self._handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def open_feature_cache(path: str):
    """Native reader when possible, Python fallback otherwise."""
    try:
        return NativeFeatureCacheReader(path)
    except Exception:
        from .feature_cache import FeatureCacheReader
        return FeatureCacheReader(path)


def _bind_wav(lib: ctypes.CDLL) -> None:
    if getattr(lib, "_wav_bound", False):
        return
    lib.rasr_wav_read.restype = ctypes.c_int64
    lib.rasr_wav_read.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32)]
    lib.rasr_wav_read_batch.restype = ctypes.c_int
    lib.rasr_wav_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int]
    lib._wav_bound = True


def native_read_wav(path: str, track: int = 0
                    ) -> Optional[Tuple[np.ndarray, float]]:
    """Native single-file WAV read; None when the library is unavailable
    or the file can't be parsed (callers fall back to audio.reader)."""
    lib = _ensure_built()
    if lib is None:
        return None
    _bind_wav(lib)
    rate = ctypes.c_uint32(0)
    n = lib.rasr_wav_read(path.encode(), track, None, 0,
                          ctypes.byref(rate))
    if n < 0:
        return None
    buf = np.zeros(int(n), dtype=np.float32)
    lib.rasr_wav_read(path.encode(), track,
                      buf.ctypes.data_as(ctypes.c_void_p), n,
                      ctypes.byref(rate))
    return buf, float(rate.value)


def native_read_flac(path: str, track: int = 0
                     ) -> Optional[Tuple[np.ndarray, float]]:
    """Native FLAC decode (native/rasr_flac.cpp); None when the library
    is unavailable or the stream can't be parsed."""
    lib = _ensure_built()
    if lib is None:
        return None
    if not getattr(lib, "_flac_bound", False):
        lib.rasr_flac_read.restype = ctypes.c_int64
        lib.rasr_flac_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_void_p, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32)]
        lib._flac_bound = True
    rate = ctypes.c_uint32(0)
    n = lib.rasr_flac_read(path.encode(), track, None, 0, ctypes.byref(rate))
    if n < 0:
        return None
    buf = np.zeros(int(n), dtype=np.float32)
    lib.rasr_flac_read(path.encode(), track,
                       buf.ctypes.data_as(ctypes.c_void_p), n,
                       ctypes.byref(rate))
    return buf, float(rate.value)


def native_read_wav_batch(paths: List[str], max_len: int, track: int = 0,
                          n_threads: int = 4
                          ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                              np.ndarray]]:
    """Multi-threaded batched WAV decode into one padded (N, max_len)
    float32 array: (samples, lengths, sample_rates); failed rows get
    length -1.  The native front of the training data loader
    (reference: C++ audio input nodes, src/Audio/Wav*)."""
    lib = _ensure_built()
    if lib is None:
        return None
    _bind_wav(lib)
    n = len(paths)
    buf = np.zeros((n, max_len), dtype=np.float32)
    lengths = np.zeros(n, dtype=np.int64)
    rates = np.zeros(n, dtype=np.uint32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    lib.rasr_wav_read_batch(
        arr, n, track, buf.ctypes.data_as(ctypes.c_void_p), max_len,
        lengths.ctypes.data_as(ctypes.c_void_p),
        rates.ctypes.data_as(ctypes.c_void_p), n_threads)
    return buf, lengths, rates
