"""Benchmark: feature-extraction throughput on the real chip.

Headline metric (BASELINE.json): feature frames/sec/chip for the fused
mfcc.flow pipeline.  `vs_baseline` is measured against the 1x-real-time
rate a frame-synchronous CPU front-end must sustain (100 frames/s of audio
per stream): value/100 = how many real-time audio streams one chip can
front-end simultaneously.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from rasr_tpu.signal.dsp import MfccPipeline

    sr = 16000
    batch, seconds = 64, 10.0          # 64 ten-second utterances per step
    n = int(sr * seconds)
    rng = np.random.default_rng(0)
    samples = rng.standard_normal((batch, n)).astype(np.float32) * 0.1

    pipe = MfccPipeline(sample_rate=sr, n_cepstra=16)
    frames_per_seg = pipe.n_frames(n)

    x = jnp.asarray(samples)
    feats = pipe(x)                    # compile + warmup
    _ = float(jnp.sum(feats))          # full host sync

    # chain a data dependency through every iteration and fetch the final
    # scalar to host so async dispatch (incl. tunnel backends) can't
    # overlap past the timer
    iters = 20
    t0 = time.perf_counter()
    acc = jnp.float32(0.0)
    for _ in range(iters):
        feats = pipe(x)
        acc = acc + feats[0, 0, 0]
    _ = float(acc)
    dt = time.perf_counter() - t0

    total_frames = iters * batch * frames_per_seg
    fps = total_frames / dt
    # baseline: real-time feature rate = 100 frames/s per audio stream
    result = {
        "metric": "mfcc feature frames/sec/chip (fused flow pipeline)",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 100.0, 1),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
