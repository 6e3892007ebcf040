"""Synthetic hybrid NN-HMM task: lexical audio with frame-state labels.

BASELINE config 3 (hybrid NN-HMM recognition) needs a *complete* loop:
a neural acoustic model scored on the TPU feeding the host
word-conditioned tree search with a backing-off n-gram LM
(/root/reference/src/Speech/Recognizer.cc:170-290,
src/Mm/BatchFeatureScorer.hh:34).  The environment has no egress, so
this module marries the two existing synthetic worlds into one task of
the right shape:

  * lexicon + 4-gram LM come from `synth_lm` (`make_lexicon` /
    `MarkovLanguage` / `write_arpa`) — n_words phoneme-string words over
    a plausible phoneme inventory with a sparse Markov word chain whose
    counts estimate into a genuine backing-off ARPA file;
  * audio comes from formant rendering as in `synth_speech`, but keyed
    by PHONEME: each phoneme has a fixed spectral identity (3 formants
    with bandwidths) rendered as amplitude-modulated sinusoids with
    per-utterance speaker warp and gain.  Phonemes are drawn as
    CONFUSABLE PAIRS — members 2i and 2i+1 share base formants separated
    only by a small ratio — so the acoustics alone leave word identity
    genuinely ambiguous and the LM must resolve it (the reference's
    raison d'être: LM-integrated search beating raw AM output);
  * frame labels come FREE from the generator: each phoneme's frame
    span is split across its 3 HMM states (with a slight per-state
    formant shift as the acoustic cue for state position), giving exact
    per-frame tied-state targets in `MonophoneStateTying` order
    (emission = 3 * phoneme + state; silence = classes 3n..3n+2).
    These are the oracle equivalent of the forced alignments the
    reference's hybrid recipe produces with its GMM pass
    (src/Speech/AlignedFeatureProcessor, src/Speech/Alignment.hh:63).

Everything derives from seeds; nothing is shipped.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from .synth_lm import MarkovLanguage, make_lexicon


class HybridSynthTask:
    """Deterministic hybrid NN-HMM task (lexicon, LM language, audio)."""

    def __init__(self, n_words: int = 20_000, n_phonemes: int = 42,
                 branching: int = 20, task_seed: int = 3000,
                 sample_rate: int = 16_000, frame_samples: int = 160,
                 frames_per_state: Tuple[int, int] = (2, 5),
                 pair_ratio: float = 1.035,
                 min_pron: int = 4, max_pron: int = 10,
                 coarticulation: float = 0.0,
                 twin_words: bool = False):
        self.n_words = n_words
        self.n_phonemes = n_phonemes
        self.sample_rate = sample_rate
        self.frame_samples = frame_samples
        self.frames_per_state = frames_per_state
        #: formant interpolation toward the neighboring phoneme in the
        #: onset/offset HMM states (0 = context-free rendering).  With
        #: coarticulation on, triphone states become acoustically
        #: distinct, which is what gives a CART on accumulated stats
        #: real likelihood gain (the reason the reference ties triphone
        #: inventories at all, src/Am/ClassicStateTying.hh:223).
        self.coarticulation = coarticulation
        #: optional frame-label override: callable
        #: (central, left, right, state, boundary) -> class over LEXICON
        #: phoneme ids (0 = no context); None = monophone-state labels
        self.label_fn = None
        self.lexicon, self.am, self.prons = make_lexicon(
            n_words, n_phonemes=n_phonemes, seed=1,
            min_len=min_pron, max_len=max_pron, twin_words=twin_words)
        self.language = MarkovLanguage(n_words, branching=branching, seed=2)
        #: cache-key suffix distinguishing lexicon/audio flavors
        self.cache_tag = "_tw" if twin_words else ""
        self.n_classes = 3 * (n_phonemes + 1)
        self.sil_base = 3 * n_phonemes          # the single silence class
        self.sil_lex_id = n_phonemes + 1        # 'si' lexicon phoneme id

        rng = np.random.default_rng(task_seed)
        n_pairs = (n_phonemes + 1) // 2
        pair_formants = rng.uniform(200.0, 6800.0, size=(n_pairs, 3))
        pair_bandwidths = rng.uniform(40.0, 220.0, size=(n_pairs, 3))
        pair_mix = rng.dirichlet(np.ones(3), size=n_pairs)
        self.formants = np.empty((n_phonemes, 3))
        self.bandwidths = np.empty((n_phonemes, 3))
        self.mix = np.empty((n_phonemes, 3))
        for p in range(n_phonemes):
            pair = p // 2
            ratio = 1.0 if p % 2 == 0 else pair_ratio
            self.formants[p] = np.minimum(pair_formants[pair] * ratio,
                                          0.49 * sample_rate)
            self.bandwidths[p] = pair_bandwidths[pair]
            self.mix[p] = pair_mix[pair]

    # -- rendering ------------------------------------------------------------

    # per-state formant scaling: onset / steady / offset give the net an
    # acoustic cue for HMM-state position inside the phoneme
    _STATE_SCALE = (0.95, 1.0, 1.05)

    def render_phoneme(self, ph: int, rng: np.random.Generator,
                       warp: float, durs: np.ndarray,
                       left_ph: Optional[int] = None,
                       right_ph: Optional[int] = None) -> np.ndarray:
        """Audio for one phoneme: durs (3,) frames per HMM state.

        With `coarticulation` > 0, the onset state's formants shift
        toward the left neighbor's and the offset state's toward the
        right neighbor's (None = silence/utterance boundary: no shift)."""
        n_total = int(durs.sum()) * self.frame_samples
        x = np.zeros(n_total, np.float32)
        offs = 0
        c = self.coarticulation
        for st in range(3):
            n = int(durs[st]) * self.frame_samples
            if n == 0:
                continue
            t = np.arange(n, dtype=np.float32) / self.sample_rate
            seg = np.zeros(n, np.float32)
            s_scale = self._STATE_SCALE[st]
            neighbor = None
            if c > 0.0:
                if st == 0 and left_ph is not None:
                    neighbor = self.formants[left_ph]
                elif st == 2 and right_ph is not None:
                    neighbor = self.formants[right_ph]
            for k, (f, bw, a) in enumerate(zip(
                    self.formants[ph], self.bandwidths[ph], self.mix[ph])):
                if neighbor is not None:
                    f = f + c * (neighbor[k] - f)
                f = min(f * warp * s_scale, 0.49 * self.sample_rate)
                phase = rng.uniform(0, 2 * np.pi)
                am = 1.0 + 0.25 * np.sin(
                    2 * np.pi * rng.uniform(2.0, 8.0) * t
                    + rng.uniform(0, 2 * np.pi))
                seg += (a * np.sin(2 * np.pi * f * t + phase)
                        ).astype(np.float32) * am.astype(np.float32)
            x[offs:offs + n] = seg
            offs += n
        # attack/decay envelope avoids boundary clicks
        env = np.minimum(np.arange(n_total), np.arange(n_total)[::-1]
                         ).astype(np.float32)
        env = np.minimum(env / (0.25 * self.frame_samples), 1.0)
        return x * env

    def _sil_labels(self, n_frames: int) -> List[int]:
        """Silence frame labels.  The acoustic models decode silence
        with a SINGLE HMM state (HmmTopology.silence_states = 1), so
        every silence frame gets the one class the search actually
        scores — spreading labels over 3 pseudo-states would train 2/3
        of the silence mass onto classes no hypothesis reads, making
        silence systematically expensive at decode time."""
        return [self.sil_base] * n_frames

    def _babble(self, rng: np.random.Generator, n: int) -> np.ndarray:
        """Speech-shaped interference: 3 overlapping talkers rendering
        random phonemes, occupying the same formant space as the signal."""
        out = np.zeros(n, np.float32)
        for _ in range(3):
            pos = 0
            warp = float(rng.uniform(0.9, 1.1))
            while pos < n:
                ph = int(rng.integers(0, self.n_phonemes))
                durs = rng.integers(2, 5, size=3)
                piece = self.render_phoneme(ph, rng, warp, durs)
                m = min(len(piece), n - pos)
                out[pos:pos + m] += piece[:m]
                pos += m
        return out

    def utterance(self, rng: np.random.Generator,
                  min_words: int = 6, max_words: int = 10,
                  snr_db: Optional[float] = None,
                  warp_range: Tuple[float, float] = (0.96, 1.04),
                  word_ids: Optional[List[int]] = None,
                  ) -> Tuple[np.ndarray, str, np.ndarray]:
        """(audio float32, orthography, frame labels int32 @ 100 fps).

        Word sequence is sampled from the Markov chain (the SAME chain
        whose counts built the ARPA LM) unless `word_ids` is given."""
        from ..am.allophone import IS_FINAL, IS_INITIAL
        if word_ids is None:
            word_ids = self.language.sample_sentence(rng, min_words,
                                                     max_words)
        warp = float(rng.uniform(*warp_range))
        gain = float(rng.uniform(0.5, 1.5))

        # -- plan first (all duration/gap draws), so each phoneme's
        # neighbors — needed for coarticulated rendering and for
        # allophone-state labels — are known before rendering.
        # plan items: (ph or None=silence, durs (3,)|n_frames, boundary)
        plan: List[Tuple[Optional[int], object, int]] = []
        plan.append((None, int(rng.integers(3, 8)), 0))
        for i, w in enumerate(word_ids):
            pron = [int(ph) for ph in self.prons[int(w)] if ph >= 0]
            for j, ph in enumerate(pron):
                durs = rng.integers(*self.frames_per_state, size=3)
                b = (IS_INITIAL if j == 0 else 0) \
                    | (IS_FINAL if j == len(pron) - 1 else 0)
                plan.append((ph, durs, b))
            # inter-word gap: none (fluent) or a silence the search can
            # hypothesize via the silence lemma (>= its 3-state minimum)
            if i + 1 < len(word_ids) and rng.random() < 0.6:
                plan.append((None, int(rng.integers(3, 7)), 0))
        plan.append((None, int(rng.integers(3, 8)), 0))

        labels: List[int] = []
        pieces: List[np.ndarray] = []
        lab = self.label_fn
        for k, (ph, durs, b) in enumerate(plan):
            if ph is None:
                n_frames = int(durs)
                if lab is None:
                    labels.extend(self._sil_labels(n_frames))
                else:
                    labels.extend([int(lab(self.sil_lex_id, 0, 0, 0,
                                           IS_INITIAL | IS_FINAL))]
                                  * n_frames)
                pieces.append(np.zeros(n_frames * self.frame_samples,
                                       np.float32))
                continue
            left = plan[k - 1][0] if k > 0 else None
            right = plan[k + 1][0] if k + 1 < len(plan) else None
            pieces.append(self.render_phoneme(ph, rng, warp, durs,
                                              left_ph=left,
                                              right_ph=right))
            for st in range(3):
                if lab is None:
                    cls = 3 * ph + st
                else:
                    cls = int(lab(ph + 1,
                                  0 if left is None else left + 1,
                                  0 if right is None else right + 1,
                                  st, b))
                labels.extend([cls] * int(durs[st]))

        audio = np.concatenate(pieces) * gain
        audio += rng.normal(0.0, 0.01, size=audio.shape).astype(np.float32)
        if snr_db is not None:
            p_sig = float(np.mean(np.square(audio)))
            p_noise = p_sig / (10.0 ** (snr_db / 10.0))
            nz = self._babble(rng, len(audio))
            nz *= np.sqrt(p_noise / max(float(np.mean(np.square(nz))),
                                        1e-12))
            audio = audio + nz
        orth = " ".join(f"w{int(w)}" for w in word_ids)
        return (audio.astype(np.float32), orth,
                np.asarray(labels, np.int32))

    def batch(self, seed: int, batch_size: int, max_seconds: float,
              min_words: int = 6, max_words: int = 10,
              snr_db: Optional[float] = None):
        """Padded batch: (audio (B, N), n_samples (B,), labels (B, T),
        label frame counts (B,), orths).  Labels are per-FRAME state ids
        (0-padded past the valid frame count)."""
        rng = np.random.default_rng(seed)
        utts = [self.utterance(rng, min_words, max_words, snr_db=snr_db)
                for _ in range(batch_size)]
        n_max = int(max_seconds * self.sample_rate)
        longest = max(len(a) for a, _o, _l in utts)
        if longest > n_max:
            raise ValueError(
                f"utterance ({longest / self.sample_rate:.2f}s) exceeds "
                f"max_seconds={max_seconds}; lower max_words")
        N = min(longest, n_max)
        T = N // self.frame_samples
        audio = np.zeros((batch_size, N), np.float32)
        n_samples = np.zeros(batch_size, np.int64)
        labels = np.zeros((batch_size, T), np.int32)
        frames = np.zeros(batch_size, np.int32)
        orths = []
        for i, (a, o, l) in enumerate(utts):
            a = a[:N]
            audio[i, :len(a)] = a
            n_samples[i] = len(a)
            t = min(len(l), T)
            labels[i, :t] = l[:t]
            frames[i] = t
            orths.append(o)
        return audio, n_samples, labels, frames, orths

    def write_arpa(self, path: str, n_tokens: int = 2_000_000,
                   order: int = 4, seed: int = 3) -> dict:
        """Sample a corpus from the word chain and estimate its ARPA LM
        (same machinery as the classic-decoder scale proof)."""
        from .synth_lm import count_ngrams, write_arpa
        sents = self.language.sample_corpus(n_tokens, seed=seed)
        nd = count_ngrams(sents, order, self.n_words)
        return write_arpa(path, nd, self.n_words)
