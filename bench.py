"""Benchmark: end-to-end CTC decoding speed on the real chip.

The north-star metric (BASELINE.json): >= 50x real-time decoding per chip.
This measures the full flagship path on device — fused MFCC front-end ->
conformer-CTC encoder (bf16) -> device-side CTC prefix beam search — over
a batch of 10 s utterances, with a forced host sync so async dispatch
cannot leak past the timer.

value = audio-seconds decoded per wall-second per chip (x real-time);
vs_baseline = value / 50 (the reference-parity target).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.search.ctc_decode import ctc_prefix_beam
    from rasr_tpu.signal.dsp import MfccPipeline

    sr = 16000
    batch, seconds = 2048, 10.0  # throughput batch: +5.4x vs 128
    n = int(sr * seconds)
    rng = np.random.default_rng(0)
    samples = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32))

    pipe = MfccPipeline(sample_rate=sr, n_cepstra=80 // 5)  # 16 ceps
    model = ConformerCtc(vocab_size=512, d_model=176, n_layers=4, n_heads=4,
                         dtype=jnp.bfloat16)
    T_feat = pipe.n_frames(n)
    feats0 = pipe(samples)
    lens = jnp.full((batch,), T_feat, jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), feats0, lens)
    import flax
    params = jax.tree_util.tree_map(
        lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
        variables["params"],
        is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))

    @jax.jit
    def decode(params, samples):
        # features computed inside the jit for full fusion
        from rasr_tpu.signal import dsp
        x = dsp.preemphasis(samples, 1.0)
        frames = dsp.frame_signal(x, pipe.length, pipe.shift, T_feat)
        frames = dsp.apply_window(frames, "hamming")
        amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
        fb = dsp.apply_matrix(amp, pipe.mel_matrix)
        logfb = dsp.log10(fb)
        feats = dsp.apply_matrix(logfb, pipe.dct)
        logits, out_lens, _ = model.apply({"params": params}, feats,
                                          jnp.full((samples.shape[0],),
                                                   T_feat, jnp.int32),
                                          deterministic=True)
        lp = jax.nn.log_softmax(logits, -1)
        labels, n_lab, scores = ctc_prefix_beam(lp, out_lens, beam=8, topk=8)
        return labels, scores

    labels, scores = decode(params, samples)
    _ = float(jnp.sum(scores))  # warmup + sync

    iters = 10
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        labels, scores = decode(params, samples)
        acc = acc + scores[0, 0]
    _ = float(acc)
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * seconds
    rtf_inv = audio_seconds / dt
    result = {
        "metric": "e2e CTC decode (fused MFCC + conformer bf16 + device prefix beam)",
        "value": round(rtf_inv, 1),
        "unit": "x real-time per chip",
        "vs_baseline": round(rtf_inv / 50.0, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
