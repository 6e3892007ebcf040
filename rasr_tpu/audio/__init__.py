"""Audio layer: file readers feeding the feature front-end
(reference: src/Audio — WAV/FLAC/ffmpeg/raw source nodes)."""

from .reader import AudioReader, read_audio, read_raw, read_wav

__all__ = ["AudioReader", "read_audio", "read_raw", "read_wav"]
