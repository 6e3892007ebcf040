"""Calibrate static int8 activation scales for the flagship.

Runs one eager quantized forward over hard-condition eval audio,
records per-site max |x| at every int8 projection input, and writes
assets/flagship/int8_scales.json — bench.py (RASR_BENCH_QUANT=int8)
then quantizes with static scales (no per-token abs-max reduction).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    import jax.numpy as jnp
    from rasr_tpu.models.quantized import (calibrate_activation_scales,
                                           quantize_params)
    (task, model, params, trained, pipe, decode, T_feat, N,
     _df, _lp, _lmm, _stages) = bench.setup()
    assert trained, "flagship checkpoint required"
    qparams = quantize_params(params, model.n_layers, keep_names=True)

    # features for a small hard-condition batch (the bench's condition)
    _, _, pad, flens, _o = bench.eval_wer(task, pipe, decode, params, T_feat,
                                      N, ev_batch=32)
    import jax
    from rasr_tpu.signal import dsp
    samples = jnp.asarray(pad[:4])

    @jax.jit
    def features(samples, n_frames):
        x = dsp.preemphasis(samples.astype(jnp.float32), 1.0)
        frames = dsp.frame_signal(x, pipe.length, pipe.shift, T_feat)
        frames = dsp.apply_window(frames, "hamming")
        amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
        fb = dsp.apply_matrix(amp, pipe.mel_matrix)
        logfb = dsp.log10(jnp.maximum(fb, 1e-6))
        mask = (jnp.arange(T_feat)[None, :]
                < n_frames[:, None]).astype(jnp.float32)
        return dsp.normalize_segment(logfb, mask=mask)

    feats = features(samples, flens[:4])
    print("calibrating (eager forward)...", flush=True)
    scales = calibrate_activation_scales(model, qparams, feats, flens[:4])
    out = os.path.join(bench.ASSET_DIR, "int8_scales.json")
    with open(out, "w") as fh:
        json.dump(scales, fh, indent=0)
    vals = np.asarray(list(scales.values()))
    print(f"{len(scales)} sites -> {out}; max|x| range "
          f"[{vals.min():.2f}, {vals.max():.2f}]")


if __name__ == "__main__":
    main()
