"""Benchmark: WER-anchored end-to-end CTC decoding speed on the real chip.

The north-star metric (BASELINE.json / BASELINE.md): >= 50x real-time
decoding per chip *at reference WER* (the reference's LibriSpeech
test-other operating point).  The environment has no egress, so the
anchor task is the deterministic synthetic speech task of LibriSpeech
shape (rasr_tpu/data/synth_speech.py: 16 kHz audio, BPE-1k-style unit
inventory, multi-second word sequences), decoded by the trained
flagship ConformerCtc (12 layers x d_model 512, assets/flagship/).

The eval condition is deliberately HARD (babble noise at EVAL_SNR_DB +
speaker warp outside the training range) so the flagship operates at a
nonzero, test-other-like WER — a saturated 0% anchor cannot detect
quality regressions.  `vs_baseline` is only credited when the quality
gate holds:

  * 0 < WER (the anchor is not saturated),
  * WER <= 15% absolute (the model actually recognizes the task),
  * beam WER <= greedy WER + 0.5% absolute (throughput must not come
    from sacrificed accuracy — the direct translation of "at reference
    WER"; at a nonzero operating point the prefix beam should in fact
    *beat* greedy).

Pipeline measured end-to-end on device: fused log-mel front-end ->
conformer encoder (bf16) -> device-side CTC prefix beam search, with a
forced host sync so async dispatch cannot leak past the timer.

value = audio-seconds decoded per wall-second per chip (x real-time);
vs_baseline = value / 50 when the WER gate holds, else 0.
The JSON also reports achieved model TFLOP/s and MFU (encoder FLOPs /
TPU v5e bf16 peak) so the throughput claim is chip-normalized.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline",
"wer", "greedy_wer", "tflops", "mfu"}.
"""

import json
import os
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
ASSET_DIR = os.path.join(REPO, "assets", "flagship")

MODEL_CFG = dict(vocab_size=1024, d_model=512, n_layers=12, n_heads=8)
SAMPLE_RATE = 16000
SECONDS = 8.0
WER_DEGRADATION_GATE = 0.005   # beam may lose <= 0.5% absolute vs greedy
WER_ABS_GATE = 0.15            # and must actually recognize the task

# hard eval condition: 3-talker babble interference at 30 dB SNR,
# calibrated (scripts/calibrate_wer.py on the real chip: 25 dB -> 20.5%,
# 30 dB -> 4.4%, clean -> 0%) so the flagship lands in the 2-10% WER band
# ("test-other-like" operating point)
# main anchored condition: babble 28 dB — hard enough that the
# LM-fused operating point also sits at NONZERO WER (30 dB saturated
# the fused anchor; see hard2 below for the 25 dB condition)
EVAL_CONDITION = dict(
    snr_db=float(os.environ.get("RASR_BENCH_SNR", "28")),
    noise="babble", warp_range=(0.96, 1.04))
EVAL_SEED = 10_000_000

# TPU v5e (v5 lite) peak: 197 bf16 TFLOP/s, 394 int8 TOP/s per chip
PEAK_TFLOPS = {"bf16": 197.0, "int8": 394.0}


def load_flagship_params(model, dtype):
    """Trained flagship params (f16 export, else latest checkpoint);
    returns (params, trained: bool)."""
    import jax
    import jax.numpy as jnp
    import flax

    def unbox(tree):
        return jax.tree_util.tree_map(
            lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
            tree, is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))

    feats0 = jnp.zeros((1, 16, 80), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0,
                           jnp.full((1,), 16, jnp.int32),
                           mutable=["params", "intermediates"])
    template = unbox(variables["params"])

    f16_path = os.path.join(ASSET_DIR, "flagship_f16.msgpack")
    if os.path.exists(f16_path):
        from rasr_tpu.nn.checkpoint import load_params
        loaded, _step = load_params(f16_path, template)
        cast = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32)
            if np.asarray(x).dtype == np.float16 else jnp.asarray(x), loaded)
        return cast, True
    try:
        from rasr_tpu.nn.checkpoint import CheckpointManager
        ckpt = CheckpointManager(ASSET_DIR, max_to_keep=1)
        if ckpt.latest_step() is not None:
            params, _, _ = ckpt.restore(variables["params"])
            return unbox(params), True
    except Exception:
        pass
    return template, False


def setup(quant: str = ""):
    """(task, model, params, trained, pipe, decode_fn, T_feat, N)."""
    import jax
    import jax.numpy as jnp

    # persistent compile cache: the 12x512 program takes ~10 min to build
    # through the remote-compile tunnel; cached executables load in seconds
    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rasr_tpu.data import SynthSpeechTask
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.search.ctc_decode import ctc_prefix_beam
    from rasr_tpu.signal import dsp
    from rasr_tpu.signal.dsp import MfccPipeline

    task = SynthSpeechTask()
    cfg = dict(MODEL_CFG)
    task_json = os.path.join(ASSET_DIR, "task.json")
    if os.path.exists(task_json):
        with open(task_json) as fh:
            cfg.update(json.load(fh).get("model", {}))
    # fused whole-sequence-in-VMEM attention (ops/attention_kernel.py):
    # 2.1x end-to-end over the XLA attention path at this batch/length
    model = ConformerCtc(dtype=jnp.bfloat16, attention_impl="pallas",
                         **cfg)
    params, trained = load_flagship_params(model, jnp.bfloat16)

    # RASR_BENCH_QUANT=int8: w8a8 projections on the MXU
    # (models/quantized.py) — same WER gate applies, so the speedup only
    # counts if quantization costs no accuracy
    if quant == "int8":
        from rasr_tpu.models.quantized import (quantize_params,
                                               quantized_ctc_forward)
        # static activation scales (scripts/calibrate_int8.py): removes
        # the per-token abs-max reduction from every int8 projection
        act = None
        scales_path = os.path.join(ASSET_DIR, "int8_scales.json")
        if os.path.exists(scales_path):
            with open(scales_path) as fh:
                act = json.load(fh)
        params = quantize_params(params, model.n_layers, act_scales=act)

    pipe = MfccPipeline(sample_rate=SAMPLE_RATE, filter_width=70.0)
    N = int(SECONDS * SAMPLE_RATE)
    T_feat = pipe.n_frames(N)

    @jax.jit
    def decode(params, samples, n_frames):
        # features fused into the same XLA program as encoder + search
        x = dsp.preemphasis(samples.astype(jnp.float32), 1.0)
        frames = dsp.frame_signal(x, pipe.length, pipe.shift, T_feat)
        frames = dsp.apply_window(frames, "hamming")
        amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
        fb = dsp.apply_matrix(amp, pipe.mel_matrix)
        logfb = dsp.log10(jnp.maximum(fb, 1e-6))
        mask = (jnp.arange(T_feat)[None, :]
                < n_frames[:, None]).astype(jnp.float32)
        feats = dsp.normalize_segment(logfb, mask=mask)
        if quant == "int8":
            from rasr_tpu.models.quantized import quantized_ctc_forward
            logits, out_lens = quantized_ctc_forward(model, params, feats,
                                                     n_frames)
        else:
            logits, out_lens, _ = model.apply({"params": params}, feats,
                                              n_frames, deterministic=True)
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
        labels, n_lab, scores = ctc_prefix_beam(lp, out_lens, beam=8, topk=1)
        greedy = jnp.argmax(lp, axis=-1)
        return labels, n_lab, scores, greedy, out_lens

    # optional LM-fused decode path (scripts/train_unit_lm.py artifact):
    # the whole shallow-fusion prefix beam + LSTM recurrence in one scan
    decode_fused = None
    lm_meta = None
    lm_params = None
    lm_path = os.path.join(ASSET_DIR, "unit_lm.msgpack")
    lm_json = os.path.join(ASSET_DIR, "unit_lm.json")
    if os.path.exists(lm_path) and os.path.exists(lm_json):
        from rasr_tpu.lm.neural import LstmLmModel
        from rasr_tpu.nn.checkpoint import load_params
        from rasr_tpu.search.ctc_decode_lm import ctc_prefix_beam_lm
        with open(lm_json) as fh:
            lm_meta = json.load(fh)
        lm_model = LstmLmModel(**lm_meta["model"])
        lm_template = lm_model.init(jax.random.PRNGKey(0),
                                    jnp.zeros((1, 4), jnp.int32))["params"]
        lm_params, _ = load_params(lm_path, lm_template)
        lm_params = jax.device_put(lm_params)
        n_lm_layers = lm_meta["model"]["n_layers"]
        bos_id = lm_meta["bos_id"]

        @jax.jit
        def decode_fused(params, lmp, samples, n_frames, lm_scale):
            x = dsp.preemphasis(samples.astype(jnp.float32), 1.0)
            frames = dsp.frame_signal(x, pipe.length, pipe.shift, T_feat)
            frames = dsp.apply_window(frames, "hamming")
            amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
            fb = dsp.apply_matrix(amp, pipe.mel_matrix)
            logfb = dsp.log10(jnp.maximum(fb, 1e-6))
            mask = (jnp.arange(T_feat)[None, :]
                    < n_frames[:, None]).astype(jnp.float32)
            feats = dsp.normalize_segment(logfb, mask=mask)
            logits, out_lens, _ = model.apply(
                {"params": params}, feats, n_frames, deterministic=True)
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            labels, n_lab, scores = ctc_prefix_beam_lm(
                lp, out_lens, lmp, bos_id=bos_id, n_layers=n_lm_layers,
                lm_scale=lm_scale, beam=8, topk=16)
            return labels, n_lab, scores

    # -- per-stage programs for the MFU/time breakout (same math as the
    # fused program, split at the natural boundaries) ------------------------
    @jax.jit
    def stage_frontend(samples, n_frames):
        x = dsp.preemphasis(samples.astype(jnp.float32), 1.0)
        frames = dsp.frame_signal(x, pipe.length, pipe.shift, T_feat)
        frames = dsp.apply_window(frames, "hamming")
        amp = dsp.rfft_amplitude(frames, pipe.fft_len, pipe.fft_scale)
        fb = dsp.apply_matrix(amp, pipe.mel_matrix)
        logfb = dsp.log10(jnp.maximum(fb, 1e-6))
        mask = (jnp.arange(T_feat)[None, :]
                < n_frames[:, None]).astype(jnp.float32)
        return dsp.normalize_segment(logfb, mask=mask)

    @jax.jit
    def stage_encoder(params, feats, n_frames):
        if quant == "int8":
            from rasr_tpu.models.quantized import quantized_ctc_forward
            logits, out_lens = quantized_ctc_forward(model, params, feats,
                                                     n_frames)
        else:
            logits, out_lens, _ = model.apply({"params": params}, feats,
                                              n_frames, deterministic=True)
        return jax.nn.log_softmax(logits.astype(jnp.float32), -1), out_lens

    @jax.jit
    def stage_beam(lp, out_lens):
        return ctc_prefix_beam(lp, out_lens, beam=8, topk=1)

    stages = {"frontend": stage_frontend, "encoder": stage_encoder,
              "beam": stage_beam}
    return (task, model, params, trained, pipe, decode, T_feat, N,
            decode_fused, lm_params, lm_meta, stages)


def eval_wer(task, pipe, decode, params, T_feat, N, ev_batch=32,
             condition=None, seed=EVAL_SEED):
    """(wer, greedy_wer, audio_pad, flens) on the held-out eval stream."""
    import jax.numpy as jnp
    from rasr_tpu.bliss.evaluation import Evaluator

    cond = dict(EVAL_CONDITION if condition is None else condition)
    audio, ns, _lab, _ll, orths = task.batch(
        seed=seed, batch_size=ev_batch, max_seconds=SECONDS,
        min_words=8, max_words=14, **cond)
    pad = np.zeros((ev_batch, N), np.float32)
    pad[:, :audio.shape[1]] = audio[:, :N]
    flens = jnp.asarray([min(pipe.n_frames(int(n)), T_feat) for n in ns],
                        jnp.int32)
    labels, n_lab, _, greedy, out_lens = decode(params, jnp.asarray(pad),
                                                flens)
    labels, n_lab = np.asarray(labels), np.asarray(n_lab)
    greedy, out_lens = np.asarray(greedy), np.asarray(out_lens)

    def score_wer(hyps):
        ev = Evaluator("bench")
        err = ref = 0
        for orth, hyp in zip(orths, hyps):
            counts = ev.evaluate(orth, hyp)
            err += counts.errors
            ref += counts.ref_len
        return err / max(ref, 1)

    def collapse(seq):
        out, prev = [], 0
        for u in seq:
            if u != 0 and u != prev:
                out.append(int(u))
            prev = u
        return out

    wer = score_wer(
        task.units_to_orth([int(u) for u in labels[i, 0, :n_lab[i, 0]]])
        for i in range(ev_batch))
    greedy_wer = score_wer(
        task.units_to_orth(collapse(greedy[i, :out_lens[i]]))
        for i in range(ev_batch))
    return wer, greedy_wer, pad, flens, orths


def encoder_gflops(model, T_feat: int) -> float:
    """Analytic forward FLOPs (multiply-add = 2 FLOPs) per utterance for
    the conformer encoder + CTC head at T_feat input frames."""
    d = model.d_model
    v = model.vocab_size
    T4 = -(-T_feat // 4)      # two stride-2 subsampling stages (ceil)
    ff = 4 * d                # FFN expansion (models/conformer.py:97)
    per_layer = (
        2 * T4 * d * ff * 2 * 2        # two macaron FFNs (wi + wo)
        + 2 * T4 * d * d * 4           # attention q/k/v/out projections
        + 2 * T4 * T4 * d * 2          # attention scores + context
        + 2 * T4 * d * 2 * d           # conv pointwise1 (GLU, 2d out)
        + 2 * T4 * d * d               # conv pointwise2
        + 2 * T4 * d * model.conv_kernel  # depthwise conv
    )
    head = 2 * T4 * d * v
    # subsampling: 3x3 conv2d 1->d/4 then d/4->d/4 + Dense(d*20 -> d)
    c = d // 4
    sub = (2 * (T_feat // 2) * 40 * 9 * c
           + 2 * T4 * 20 * 9 * c * c
           + 2 * T4 * (20 * c) * d)
    return (model.n_layers * per_layer + head + sub) / 1e9


def main():
    import jax
    import jax.numpy as jnp

    quant = os.environ.get("RASR_BENCH_QUANT", "")
    (task, model, params, trained, pipe, decode, T_feat, N,
     decode_fused, lm_params, lm_meta, stages) = setup(quant)

    # -- quality gate: WER on the held-out eval stream at the hard
    # condition (nonzero operating point) -----------------------------------
    ev_batch = 32
    wer, greedy_wer, pad, flens, orths = eval_wer(
        task, pipe, decode, params, T_feat, N, ev_batch)

    # -- LM-fused operating point: dev-calibrated shallow fusion must
    # STRICTLY beat the greedy decode on the eval stream ---------------------
    fused = {}
    if decode_fused is not None:
        import jax.numpy as _jnp
        from rasr_tpu.bliss.evaluation import Evaluator

        def fused_wer_of(pad_a, flens_a, orths_a, scale):
            labels, n_lab, _ = decode_fused(
                params, lm_params, _jnp.asarray(pad_a), flens_a,
                _jnp.asarray(scale, _jnp.float32))
            labels, n_lab = np.asarray(labels), np.asarray(n_lab)
            ev = Evaluator("bench-fused")
            err = ref = 0
            for i, orth in enumerate(orths_a):
                hyp = task.units_to_orth(
                    [int(u) for u in labels[i, 0, :n_lab[i, 0]]])
                counts = ev.evaluate(orth, hyp)
                err += counts.errors
                ref += counts.ref_len
            return err / max(ref, 1)

        # dev stream (disjoint seed) picks the fusion weight
        _dw, _dg, dev_pad, dev_flens, dev_orths = eval_wer(
            task, pipe, decode, params, T_feat, N, ev_batch,
            seed=EVAL_SEED + 77)
        best = None
        for s in (0.2, 0.35, 0.5, 0.7):
            dwer = fused_wer_of(dev_pad, dev_flens, dev_orths, s)
            if best is None or dwer < best[1]:
                best = (s, dwer)
        lm_scale = best[0]
        fused_wer = fused_wer_of(pad, flens, orths, lm_scale)
        fused = {"fused_wer": round(fused_wer, 4),
                 "fused_lm_scale": lm_scale,
                 "lm_heldout_nll": lm_meta.get("heldout_nll")}
        # second, harder condition (babble 25 dB): fused stays nonzero
        # here, so the LM-in-search win is visible away from saturation
        h_wer, h_greedy, h_pad, h_flens, h_orths = eval_wer(
            task, pipe, decode, params, T_feat, N, ev_batch,
            condition=dict(EVAL_CONDITION, snr_db=25.0))
        h_fused = fused_wer_of(h_pad, h_flens, h_orths, lm_scale)
        fused["hard2_snr_db"] = 25.0
        fused["hard2_wer"] = round(h_wer, 4)
        fused["hard2_greedy_wer"] = round(h_greedy, 4)
        fused["hard2_fused_wer"] = round(h_fused, 4)

    # -- throughput (measured on the same hard-condition audio) -------------
    batch = 256
    rng = np.random.default_rng(0)
    reps = rng.integers(0, ev_batch, size=batch)
    big = jnp.asarray(pad[reps])
    big_lens = flens[jnp.asarray(reps)]
    out = decode(params, big, big_lens)
    _ = float(jnp.sum(out[2]))  # warmup + sync

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = decode(params, big, big_lens)
    # ONE final sync: per-iteration scalar pulls would add a host->device
    # round trip over the remote tunnel to every step (2x wall inflation);
    # successive decode dispatches serialize on-device regardless
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    audio_seconds = iters * batch * SECONDS
    rtf_inv = audio_seconds / dt
    gate_ok = (trained and 0.0 < wer <= WER_ABS_GATE
               and wer <= greedy_wer + WER_DEGRADATION_GATE)

    # chip-normalized throughput: analytic encoder FLOPs / wall time
    gflops_per_utt = encoder_gflops(model, T_feat)
    tflops = gflops_per_utt * iters * batch / dt / 1e3
    peak = PEAK_TFLOPS["int8" if quant == "int8" else "bf16"]

    # -- per-stage breakout on the same big batch: where the non-MXU
    # time goes (front-end/beam/host) vs the encoder itself ------------------
    stage_s = {}
    mfu_encoder_only = None
    try:
        feats_big = stages["frontend"](big, big_lens)
        lp_big, ol_big = stages["encoder"](params, feats_big, big_lens)
        _ = jax.block_until_ready(stages["beam"](lp_big, ol_big))
        for name, call in (
                ("frontend", lambda: stages["frontend"](big, big_lens)),
                ("encoder", lambda: stages["encoder"](params, feats_big,
                                                      big_lens)),
                ("beam", lambda: stages["beam"](lp_big, ol_big))):
            t0 = time.perf_counter()
            for _ in range(iters):
                out_s = call()
            jax.block_until_ready(out_s)
            stage_s[name] = time.perf_counter() - t0
        enc_tflops = (gflops_per_utt * iters * batch
                      / stage_s["encoder"] / 1e3)
        mfu_encoder_only = enc_tflops / peak
    except Exception as e:                    # breakout must never kill
        stage_s = {"error": str(e)[:120]}     # the headline metric
    
    result = {
        "metric": ("e2e CTC decode, flagship 12x512 conformer "
                   + ("int8" if quant == "int8" else "bf16")
                   + " (fused log-mel + device prefix beam), WER-anchored"
                   + f" @ babble SNR {EVAL_CONDITION['snr_db']:g} dB"),
        "value": round(rtf_inv, 1),
        "unit": "x real-time per chip",
        "vs_baseline": round(rtf_inv / 50.0, 2) if gate_ok else 0.0,
        "wer": round(wer, 4),
        "greedy_wer": round(greedy_wer, 4),
        "tflops": round(tflops, 1),
        "mfu": round(tflops / peak, 4),
        "mfu_encoder_only": (round(mfu_encoder_only, 4)
                             if mfu_encoder_only is not None else None),
        "stage_seconds": {k: (round(v, 2) if isinstance(v, float) else v)
                          for k, v in stage_s.items()},
        "e2e_seconds": round(dt, 2),
        **fused,
    }
    if fused and decode_fused is not None:
        # fused-path throughput on the same big batch
        fout = decode_fused(params, lm_params, big, big_lens,
                            jnp.asarray(fused["fused_lm_scale"],
                                        jnp.float32))
        jax.block_until_ready(fout)
        t0 = time.perf_counter()
        for _ in range(iters):
            fout = decode_fused(params, lm_params, big, big_lens,
                                jnp.asarray(fused["fused_lm_scale"],
                                            jnp.float32))
        jax.block_until_ready(fout)
        fdt = time.perf_counter() - t0
        result["fused_x_realtime"] = round(audio_seconds / fdt, 1)
        result["fused_beats_greedy"] = bool(
            result["fused_wer"] < result["greedy_wer"])
    print(json.dumps(result))


if __name__ == "__main__":
    main()
