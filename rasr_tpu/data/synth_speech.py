"""Deterministic synthetic speech task for WER-anchored benchmarking.

The environment has no egress, so LibriSpeech itself cannot be fetched;
this module defines a *fixed, reproducible* speech-like task of matched
shape (16 kHz audio, BPE-1k-style unit inventory, multi-second
utterances) on which the flagship LibriSpeech-class ConformerCtc is
trained and evaluated:

  * acoustic units (the "BPE vocabulary", ids 1..n_units; 0 = CTC blank):
    each unit has a fixed randomly-drawn spectral identity — 2-3 formant
    frequencies with bandwidths — rendered as damped-sinusoid-excited
    noise in the time domain, with per-utterance speaker variation
    (formant warping, gain, additive noise) and per-token duration jitter;
  * words: unique unit triples ("w0001".."wNNNN"); utterances are random
    word sequences, so WER against the reference orthography measures
    real decoding quality (insertions/deletions shift the unit stream and
    corrupt following words, exactly like real ASR);
  * train/eval splits differ only by the utterance seed stream, never by
    task identity — eval utterances are unseen.

Everything derives from `task_seed`, so the bench reproduces the exact
eval set without shipping audio.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import numpy as np


@dataclass
class SynthSpeechTask:
    n_units: int = 1023          # unit ids 1..n_units (0 = blank)
    n_words: int = 2000
    units_per_word: int = 3
    sample_rate: int = 16000
    frame_samples: int = 160     # 10 ms
    # per-unit duration: must stay comfortably above the acoustic model's
    # 4x time reduction so CTC alignments keep slack (a unit of d input
    # frames spans d/4 output frames; d >= 8 gives >= 2 frames per label,
    # matching BPE-unit durations on real speech)
    min_frames: int = 8          # per unit
    max_frames: int = 16
    task_seed: int = 2024

    def __post_init__(self):
        rng = np.random.default_rng(self.task_seed)
        # per-unit spectral identity: 3 formants + bandwidths + mix
        self.formants = rng.uniform(150.0, 7200.0, size=(self.n_units + 1, 3))
        self.bandwidths = rng.uniform(40.0, 250.0, size=(self.n_units + 1, 3))
        self.mix = rng.dirichlet(np.ones(3), size=self.n_units + 1)
        self.base_frames = rng.integers(self.min_frames, self.max_frames,
                                        size=self.n_units + 1)
        # words = unique unit triples
        triples = set()
        while len(triples) < self.n_words:
            t = tuple(int(u) for u in
                      rng.integers(1, self.n_units + 1,
                                   size=self.units_per_word))
            triples.add(t)
        self.words: List[Tuple[int, ...]] = sorted(triples)
        self.word_of_units = {w: i for i, w in enumerate(self.words)}

    # -- rendering ------------------------------------------------------------

    def render_unit(self, unit: int, rng: np.random.Generator,
                    warp: float, n_frames: int) -> np.ndarray:
        """Damped-sinusoid-excited noise with the unit's formant structure."""
        n = n_frames * self.frame_samples
        t = np.arange(n, dtype=np.float32) / self.sample_rate
        x = np.zeros(n, np.float32)
        for f, bw, a in zip(self.formants[unit], self.bandwidths[unit],
                            self.mix[unit]):
            f = min(f * warp, 0.49 * self.sample_rate)
            phase = rng.uniform(0, 2 * np.pi)
            am = 1.0 + 0.25 * np.sin(
                2 * np.pi * rng.uniform(2.0, 8.0) * t
                + rng.uniform(0, 2 * np.pi))
            x += (a * np.sin(2 * np.pi * f * t + phase)).astype(np.float32) \
                * am.astype(np.float32)
        # attack/decay envelope avoids frame-boundary clicks
        env = np.minimum(np.arange(n), np.arange(n)[::-1]).astype(np.float32)
        env = np.minimum(env / (0.25 * self.frame_samples), 1.0)
        return x * env

    def _babble(self, rng: np.random.Generator, n: int) -> np.ndarray:
        """Speech-shaped interference: overlapping renderings of random
        *other* units (3 simultaneous talkers), so the noise occupies the
        same formant space as the signal and actually confuses unit
        identities (white noise only raises the floor)."""
        out = np.zeros(n, np.float32)
        for _ in range(3):
            pos = 0
            warp = float(rng.uniform(0.9, 1.1))
            while pos < n:
                u = int(rng.integers(1, self.n_units + 1))
                piece = self.render_unit(u, rng, warp,
                                         int(rng.integers(6, 14)))
                m = min(len(piece), n - pos)
                out[pos:pos + m] += piece[:m]
                pos += m
        return out

    def utterance(self, rng: np.random.Generator,
                  min_words: int = 4, max_words: int = 14,
                  snr_db: float | None = None,
                  noise: str = "babble",
                  warp_range: Tuple[float, float] = (0.96, 1.04),
                  ) -> Tuple[np.ndarray, str, List[int]]:
        """(audio float32, orthography, unit label sequence).

        snr_db/noise/warp_range define the *evaluation condition*: the
        clean task (defaults) is what the flagship trains on; the bench
        anchors WER on a hard condition (additive noise at a fixed SNR +
        wider speaker warp) so the quality gate sits at a nonzero,
        test-other-like operating point (reference anchors throughput to
        in-run WER: /root/reference/src/Bliss/Evaluation.hh:31)."""
        n_w = int(rng.integers(min_words, max_words + 1))
        word_ids = rng.integers(0, self.n_words, size=n_w)
        labels: List[int] = []
        pieces: List[np.ndarray] = []
        warp = float(rng.uniform(*warp_range))
        gain = float(rng.uniform(0.5, 1.5))
        for w in word_ids:
            for u in self.words[int(w)]:
                labels.append(u)
                dur = int(self.base_frames[u] + rng.integers(-1, 2))
                dur = max(self.min_frames - 1, dur)
                pieces.append(self.render_unit(u, rng, warp, dur))
            # short inter-word gap (1-2 frames of near-silence)
            pieces.append(np.zeros(int(rng.integers(1, 3))
                                   * self.frame_samples, np.float32))
        audio = np.concatenate(pieces) * gain
        audio += rng.normal(0.0, 0.01, size=audio.shape).astype(np.float32)
        if snr_db is not None:
            p_sig = float(np.mean(np.square(audio)))
            p_noise = p_sig / (10.0 ** (snr_db / 10.0))
            if noise == "babble":
                nz = self._babble(rng, len(audio))
            else:
                nz = rng.normal(0.0, 1.0, size=len(audio)).astype(np.float32)
            nz *= np.sqrt(p_noise / max(float(np.mean(np.square(nz))), 1e-12))
            audio = audio + nz
        orth = " ".join(f"w{int(w):04d}" for w in word_ids)
        return audio.astype(np.float32), orth, labels

    def batch(self, seed: int, batch_size: int, max_seconds: float = 12.0,
              min_words: int = 4, max_words: int = 14,
              snr_db: float | None = None, noise: str = "babble",
              warp_range: Tuple[float, float] = (0.96, 1.04)):
        """Padded batch: (audio (B, N), n_samples (B,), labels (B, L),
        label_lens (B,), orths)."""
        rng = np.random.default_rng(seed)
        utts = [self.utterance(rng, min_words, max_words, snr_db=snr_db,
                               noise=noise, warp_range=warp_range)
                for _ in range(batch_size)]
        n_max = int(max_seconds * self.sample_rate)
        # truncating audio while keeping the full label sequence would make
        # CTC infeasible; the caller must budget max_seconds for max_words
        longest = max(len(a) for a, _o, _l in utts)
        if longest > n_max:
            raise ValueError(
                f"utterance ({longest / self.sample_rate:.2f}s) exceeds "
                f"max_seconds={max_seconds}; lower max_words "
                f"(worst case ~{max_words * self.units_per_word * (self.max_frames + 1) + 2 * max_words} frames)")
        N = min(longest, n_max)
        L = max(len(l) for _a, _o, l in utts)
        audio = np.zeros((batch_size, N), np.float32)
        n_samples = np.zeros(batch_size, np.int64)
        labels = np.zeros((batch_size, L), np.int32)
        label_lens = np.zeros(batch_size, np.int32)
        orths = []
        for i, (a, o, l) in enumerate(utts):
            a = a[:N]
            audio[i, :len(a)] = a
            n_samples[i] = len(a)
            labels[i, :len(l)] = l
            label_lens[i] = len(l)
            orths.append(o)
        return audio, n_samples, labels, label_lens, orths

    # -- unit stream -> words ---------------------------------------------------

    def units_to_orth(self, units: List[int]) -> str:
        """Greedy segmentation of a decoded unit stream into words: known
        triples map to their word; anything else becomes an <unk> word
        (counted as an error by the evaluator)."""
        out = []
        i = 0
        k = self.units_per_word
        while i < len(units):
            w = self.word_of_units.get(tuple(units[i:i + k]))
            if w is not None:
                out.append(f"w{w:04d}")
                i += k
            else:
                out.append("<unk>")
                i += 1
        return " ".join(out)
