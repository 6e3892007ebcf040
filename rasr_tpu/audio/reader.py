"""Audio file readers.

WAV (PCM 8/16/32-bit + IEEE float via the stdlib wave/struct machinery),
raw PCM, and segment extraction by start/end time and track — the
capabilities of the reference Audio source nodes (src/Audio/Wav.hh,
Raw.hh, Node.hh:26,88) without the libsndfile dependency.

Samples return as float32 in [-32768, 32767] range convention for 16-bit
sources (matching the reference, which feeds s16 sample values into
preemphasis — generic-convert-vector-s16-to-vector-f32 keeps raw values).
"""

from __future__ import annotations

import os
import struct
import wave
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def read_wav(path: str, start_time: float = 0.0,
             end_time: Optional[float] = None, track: int = 0,
             ) -> Tuple[np.ndarray, float]:
    """Returns (samples float32, sample_rate).  16-bit samples keep their
    integer value range (reference convention)."""
    with wave.open(path, "rb") as w:
        sr = w.getframerate()
        n_channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        n_frames = w.getnframes()
        first = int(round(start_time * sr))
        last = n_frames if end_time is None or end_time <= 0 else \
            min(int(round(end_time * sr)), n_frames)
        w.setpos(min(first, n_frames))
        raw = w.readframes(max(last - first, 0))
    if sampwidth == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif sampwidth == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) * 256.0
    elif sampwidth == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    else:
        raise ValueError(f"{path}: unsupported sample width {sampwidth}")
    if n_channels > 1:
        data = data.reshape(-1, n_channels)[:, track].copy()
    return data, float(sr)


def read_raw(path: str, sample_rate: float = 16000.0, dtype: str = "<i2",
             start_time: float = 0.0, end_time: Optional[float] = None,
             track: int = 0) -> Tuple[np.ndarray, float]:
    itemsize = np.dtype(dtype).itemsize
    first = int(round(start_time * sample_rate))
    with open(path, "rb") as fh:
        fh.seek(first * itemsize)
        if end_time is None or end_time <= 0:
            raw = fh.read()
        else:
            count = int(round(end_time * sample_rate)) - first
            raw = fh.read(count * itemsize)
    return np.frombuffer(raw, dtype=dtype).astype(np.float32), sample_rate


def write_wav(path: str, samples: np.ndarray, sample_rate: int = 16000) -> None:
    data = np.clip(np.asarray(samples), -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(data.tobytes())


def read_audio(path: str, **kw) -> Tuple[np.ndarray, float]:
    ext = os.path.splitext(path)[1].lower()
    if ext == ".wav":
        return read_wav(path, **kw)
    if ext in (".raw", ".pcm"):
        return read_raw(path, **kw)
    if ext == ".flac":
        from rasr_tpu.audio.flac import read_flac
        return read_flac(path, **kw)
    raise ValueError(f"unsupported audio format: {path}")


class AudioReader:
    """Segment-aware reader for corpus recognition
    (recording audio + segment start/end/track -> samples)."""

    def __init__(self, sample_rate_hint: float = 16000.0):
        self.sample_rate_hint = sample_rate_hint

    def __call__(self, segment) -> Tuple[np.ndarray, float]:
        return read_audio(segment.recording.audio,
                          start_time=segment.start,
                          end_time=segment.end if segment.end else None,
                          track=segment.track)
