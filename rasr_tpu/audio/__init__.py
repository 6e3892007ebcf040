"""Audio layer: file readers feeding the feature front-end
(reference: src/Audio — WAV/FLAC/ffmpeg/raw source nodes)."""

from .flac import read_flac, write_flac
from .reader import AudioReader, read_audio, read_raw, read_wav, write_wav

__all__ = ["AudioReader", "read_audio", "read_flac", "read_raw",
           "read_wav", "write_flac", "write_wav"]
