"""Streaming latency on the real chip (VERDICT r2 item 7).

Drives the OnlineRecognizer (incremental features -> async chunked
encoder -> time-sync beam + stable common prefix) with flagship-sized
causal-conformer compute and measures, per audio chunk size:

  * per-chunk processing latency (feed_samples + partial), p50/p95/max;
  * first-partial latency: wall time from session start until the
    first nonempty stable prefix (compute only; audio arrival time is
    reported separately as `first_partial_audio_ms`);
  * finalization latency (finish() after the last chunk).

The reference's streaming contract is bounded-latency stable-prefix
decoding (maximum-stable-delay pruning, doc/search_v2.rst:303-307);
these numbers are the measured latency side of that contract.

Writes STREAMING_BENCH.json.  Uses the trained flagship weights in
causal mode — the parameter layout is identical; quality is anchored by
bench.py, this artifact measures TIME.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

SR = 16000
SECONDS = 8.0


def main():
    import jax
    import jax.numpy as jnp

    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rasr_tpu.data import SynthSpeechTask
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.nn.async_scorer import AsyncChunkedEncoderScorer
    from rasr_tpu.search.lexiconfree_timesync import \
        LexiconfreeTimesyncBeamSearch
    from rasr_tpu.signal.dsp import MfccPipeline
    from rasr_tpu.speech.online_recognizer import OnlineRecognizer

    cfg = dict(bench.MODEL_CFG)
    model = ConformerCtc(dtype=jnp.bfloat16, causal=True, **cfg)
    params, trained = bench.load_flagship_params(model, jnp.bfloat16)
    pipe = MfccPipeline(sample_rate=SR, filter_width=70.0)

    # fixed-shape jitted encode per (history+chunk) length; upsample 4x
    # so the chunked scorer's input-frame bookkeeping holds.  params is
    # a jit ARGUMENT (a closure constant would be embedded in the
    # program and rejected by the remote-compile tunnel).
    encode_cache = {}
    device_params = jax.device_put(params)

    def encode(feats):
        n = feats.shape[0]
        fn = encode_cache.get(n)
        if fn is None:
            @jax.jit
            def fn(p, f):
                logits, out_lens, _ = model.apply(
                    {"params": p}, f[None],
                    jnp.asarray([f.shape[0]], jnp.int32),
                    deterministic=True)
                return jax.nn.log_softmax(
                    logits[0].astype(jnp.float32), -1)
            encode_cache[n] = fn
        out = np.asarray(fn(device_params, jnp.asarray(feats)))
        return np.repeat(out, 4, axis=0)[:n]

    task = SynthSpeechTask()
    rng = np.random.default_rng(123)
    audio, _, _ = task.utterance(rng, 8, 12, **bench.EVAL_CONDITION)
    audio = audio[:int(SECONDS * SR)]

    results = {}
    for chunk_ms in (160, 320, 640):
        chunk_samples = int(SR * chunk_ms / 1000)
        chunk_frames = chunk_ms // 10
        scorer = AsyncChunkedEncoderScorer(
            encode, n_labels=cfg["vocab_size"],
            chunk_frames=chunk_frames, chunk_history=chunk_frames)
        search = LexiconfreeTimesyncBeamSearch(scorer, beam_size=8,
                                               blank_index=0)
        online = OnlineRecognizer(pipe, search,
                                  feature_kind="logmel-cmvn")

        # warmup pass compiles every chunk shape
        for pos in range(0, len(audio), chunk_samples):
            online.feed_samples(audio[pos:pos + chunk_samples])
            online.partial()
        online.finish()

        scorer.reset()
        online.start()
        per_chunk = []
        first_partial_ms = None
        first_partial_audio_ms = None
        t_start = time.perf_counter()
        for pos in range(0, len(audio), chunk_samples):
            t0 = time.perf_counter()
            online.feed_samples(audio[pos:pos + chunk_samples])
            p = online.partial()
            dt = time.perf_counter() - t0
            per_chunk.append(dt * 1e3)
            if p and first_partial_ms is None:
                first_partial_ms = (time.perf_counter() - t_start) * 1e3
                first_partial_audio_ms = pos / SR * 1e3 + chunk_ms
        t0 = time.perf_counter()
        final = online.finish()
        finalize_ms = (time.perf_counter() - t0) * 1e3
        pc = np.asarray(per_chunk)
        results[f"{chunk_ms}ms"] = {
            "chunk_ms": chunk_ms,
            "per_chunk_ms": {"p50": round(float(np.percentile(pc, 50)), 2),
                             "p95": round(float(np.percentile(pc, 95)), 2),
                             "max": round(float(pc.max()), 2)},
            "real_time_ok": bool(np.percentile(pc, 95) < chunk_ms),
            "first_partial_compute_ms": round(first_partial_ms or -1, 2),
            "first_partial_audio_ms": round(first_partial_audio_ms or -1,
                                            2),
            "finalize_ms": round(finalize_ms, 2),
            "n_final_labels": len(final),
        }
        print(f"{chunk_ms}ms: {results[f'{chunk_ms}ms']}", flush=True)

    out = {"task": "streaming latency, flagship-size causal conformer",
           "model": cfg, "trained_weights": trained,
           "audio_seconds": SECONDS, "beam": 8,
           "chunks": results}
    with open("STREAMING_BENCH.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
