"""Native C++ IO: batched WAV decoding vs the Python reader."""

import numpy as np
import pytest


class TestNativeWav:
    def make_wavs(self, tmp_path, n=3):
        from rasr_tpu.audio.reader import write_wav
        rng = np.random.default_rng(0)
        paths, refs = [], []
        for i in range(n):
            samples = (rng.uniform(-0.4, 0.4, 1000 + 100 * i)
                       .astype(np.float32) * 32767).astype(np.int16)
            p = tmp_path / f"u{i}.wav"
            write_wav(str(p), samples.astype(np.float32), 16000)
            paths.append(str(p))
            refs.append(samples.astype(np.float32))
        return paths, refs

    def test_single_matches_python_reader(self, tmp_path):
        from rasr_tpu.audio.reader import read_wav
        from rasr_tpu.speech.native_io import native_read_wav
        paths, refs = self.make_wavs(tmp_path, 1)
        out = native_read_wav(paths[0])
        if out is None:
            pytest.skip("native toolchain unavailable")
        samples, rate = out
        py_samples, py_rate = read_wav(paths[0])
        assert rate == py_rate
        np.testing.assert_allclose(samples, py_samples, atol=1.01)

    def test_batch_padded(self, tmp_path):
        from rasr_tpu.speech.native_io import native_read_wav_batch
        paths, refs = self.make_wavs(tmp_path, 3)
        out = native_read_wav_batch(paths + ["/nonexistent.wav"],
                                    max_len=1500)
        if out is None:
            pytest.skip("native toolchain unavailable")
        buf, lengths, rates = out
        assert buf.shape == (4, 1500)
        for i, ref in enumerate(refs):
            assert lengths[i] == len(ref)
            assert rates[i] == 16000
            np.testing.assert_allclose(buf[i, :len(ref)], ref, atol=1.01)
            assert (buf[i, len(ref):] == 0).all()
        assert lengths[3] == -1  # missing file flagged
