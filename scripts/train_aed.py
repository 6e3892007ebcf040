"""Train the flagship AED (attention encoder-decoder) on the synthetic
speech task and store the checkpoint under assets/aed/.

The CTC flagship (scripts/train_flagship.py) anchors the time-sync
searches; this model anchors the LABEL-sync searches — the
config-constructible tree-/lexiconfree-labelsync path (nn/scorer_factory)
and the cached AED beam decoder (search/aed_cached.py) get a trained,
WER-measurable model instead of toy fixtures.  Mirrors the reference's
AED operating mode (ONNX encoder-decoder scorers,
/root/reference/src/Nn/LabelScorer/StatefulOnnxLabelScorer.hh:92,
AedTreeBuilder /root/reference/src/Search/TreeBuilder.hh:304).

Run:  python scripts/train_aed.py [--steps N]

Reuses the pooled pure-TPU recipe of train_flagship.py (finite utterance
pool rendered once, features precomputed on device, every step pure TPU
compute); the loss is label-smoothed teacher-forced cross entropy and
eval is a batched jitted greedy decode (full-prefix rescoring per step —
O(L^2) but L<=48, negligible at this size).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# smoke-test escape hatch: sitecustomize pre-imports jax (axon tunnel),
# so JAX_PLATFORMS=cpu in the env is ignored — the config API must run
# before backend init (same trick as tests/conftest.py)
if os.environ.get("RASR_TRAIN_PLATFORM") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

from train_flagship import (FEAT_DIM, L_MAX, SAMPLE_RATE,  # noqa: E402
                            TRAIN_SECONDS, build_pool, feature_pipeline)

ASSET_DIR = os.path.join(REPO, "assets", "aed")

# encoder dims MATCH the CTC flagship so its trained encoder can seed
# this model (--init-encoder): without it the decoder converges to a
# pure label LM (within-word units right, word-initial units at chance
# = cross-attention never aligns); with it + the auxiliary CTC loss the
# alignment snaps in the first few hundred steps — the standard hybrid
# CTC/attention recipe (Watanabe et al. 2017).
MODEL_CFG = dict(vocab_size=1024, d_model=512, encoder_layers=12,
                 decoder_layers=4, n_heads=8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--target-wer", type=float, default=0.02)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--label-smoothing", type=float, default=0.1)
    ap.add_argument("--ctc-weight", type=float, default=0.3,
                    help="auxiliary CTC loss on the encoder output "
                         "(keeps cross-attention anchored to audio)")
    ap.add_argument("--init-encoder", default="flagship",
                    help="'flagship' = seed the encoder from "
                         "assets/flagship (dims must match); 'none' = "
                         "random init")
    ap.add_argument("--curriculum", type=int, default=2000)
    ap.add_argument("--short-floor", type=float, default=0.2)
    ap.add_argument("--specaugment-after", type=int, default=2000)
    ap.add_argument("--pool-long", type=int, default=4096)
    ap.add_argument("--pool-short", type=int, default=512)
    ap.add_argument("--d-model", type=int, default=MODEL_CFG["d_model"])
    ap.add_argument("--enc-layers", type=int,
                    default=MODEL_CFG["encoder_layers"])
    ap.add_argument("--dec-layers", type=int,
                    default=MODEL_CFG["decoder_layers"])
    ap.add_argument("--asset-dir", default=ASSET_DIR)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rasr_tpu.bliss.evaluation import Evaluator
    from rasr_tpu.data import SynthSpeechTask
    from rasr_tpu.models.aed import AedModel
    from rasr_tpu.nn.checkpoint import CheckpointManager, save_params
    from rasr_tpu.nn.training import spec_augment

    os.makedirs(args.asset_dir, exist_ok=True)
    task = SynthSpeechTask()
    cfg = dict(MODEL_CFG, d_model=args.d_model,
               encoder_layers=args.enc_layers,
               decoder_layers=args.dec_layers)
    model = AedModel(**cfg)
    pipe, feats_of = feature_pipeline()
    N = int(TRAIN_SECONDS * SAMPLE_RATE)
    T_feat = pipe.n_frames(N)
    BATCH = args.batch
    LP = L_MAX + 1            # BOS + L_MAX (also labels + EOS)

    feats_jit = jax.jit(lambda s, l: feats_of(s, T_feat, l))
    pool_feats, pool_flens, pool_labels, pool_lens, n_short = build_pool(
        task, pipe, feats_jit, args.pool_long, args.pool_short, T_feat, N)
    P = pool_feats.shape[0]

    # init + optimizer
    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1),
        end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-6))
    aed_params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, T_feat, FEAT_DIM), jnp.float32),
        jnp.asarray([T_feat, T_feat], jnp.int32),
        jnp.zeros((2, LP), jnp.int32))["params"]
    if args.init_encoder == "flagship":
        import flax
        from rasr_tpu.models import ConformerCtc
        fl_json = os.path.join(REPO, "assets", "flagship", "task.json")
        with open(fl_json) as fh:
            fl_cfg = json.load(fh)["model"]
        assert fl_cfg["d_model"] == cfg["d_model"] \
            and fl_cfg["n_layers"] == cfg["encoder_layers"] \
            and fl_cfg["n_heads"] == cfg["n_heads"], \
            f"encoder dims must match the flagship to seed: {fl_cfg}"
        os.chdir(REPO)           # bench resolves assets relative paths
        import bench
        fl_params, fl_trained = bench.load_flagship_params(
            ConformerCtc(**fl_cfg), jnp.float32)
        assert fl_trained, "flagship checkpoint missing"
        aed_params = dict(aed_params)
        aed_params["encoder"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32),
            fl_params["encoder"])
        print("encoder seeded from the CTC flagship", flush=True)
    # trainer-owned auxiliary CTC head (not part of the exported model)
    k = jax.random.PRNGKey(1)
    ctc_head = {
        "kernel": (jax.random.normal(k, (cfg["d_model"],
                                         cfg["vocab_size"]), jnp.float32)
                   * (1.0 / np.sqrt(cfg["d_model"]))),
        "bias": jnp.zeros((cfg["vocab_size"],), jnp.float32)}
    params = {"aed": aed_params, "ctc": ctc_head}
    n_params = sum(int(np.prod(np.asarray(x).shape))
                   for x in jax.tree_util.tree_leaves(aed_params))
    print(f"AED params: {n_params/1e6:.1f} M", flush=True)
    opt_state = opt.init(params)

    smooth = args.label_smoothing
    ctc_w = args.ctc_weight

    @jax.jit
    def train_step(params, opt_state, feats, flens, labels, label_lens,
                   key):
        # teacher forcing: input = BOS + labels[:L_MAX], target =
        # labels + EOS; positions 0..label_len are valid (incl. EOS)
        dec_in = jnp.concatenate(
            [jnp.zeros((labels.shape[0], 1), jnp.int32), labels], axis=1)
        target = jnp.concatenate(
            [labels, jnp.zeros((labels.shape[0], 1), jnp.int32)], axis=1)
        valid = (jnp.arange(LP)[None, :] <= label_lens[:, None])
        lab_pad = (jnp.arange(L_MAX)[None, :]
                   >= label_lens[:, None]).astype(jnp.float32)

        def loss_fn(p):
            enc, enc_mask = model.apply(
                {"params": p["aed"]}, feats, flens, False,
                method=AedModel.encode, rngs={"dropout": key})
            logits = model.apply(
                {"params": p["aed"]}, enc, enc_mask, dec_in, False,
                method=AedModel.decode, rngs={"dropout": key})
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), -1)
            nll = -jnp.take_along_axis(lp, target[..., None],
                                       axis=-1)[..., 0]
            uni = -jnp.mean(lp, axis=-1)
            per_tok = (1.0 - smooth) * nll + smooth * uni
            ce = jnp.sum(per_tok * valid) / jnp.maximum(jnp.sum(valid),
                                                        1.0)
            ctc_logits = (enc.astype(jnp.float32) @ p["ctc"]["kernel"]
                          + p["ctc"]["bias"])
            ctc = optax.ctc_loss(
                ctc_logits,
                1.0 - enc_mask.astype(jnp.float32),
                labels, lab_pad, blank_id=0)
            ctc = jnp.mean(ctc / jnp.maximum(label_lens, 1))
            return (1.0 - ctc_w) * ce + ctc_w * ctc, (ce, ctc)

        (loss, (ce, ctc)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss, ce, \
            ctc

    @jax.jit
    def greedy_decode(params, feats, flens):
        enc, enc_mask = model.apply({"params": params}, feats, flens,
                                    method=AedModel.encode)

        def body(tokens, t):
            logits = model.apply({"params": params}, enc, enc_mask,
                                 tokens, method=AedModel.decode)
            nxt = jnp.argmax(logits[:, t], -1).astype(jnp.int32)
            tokens = tokens.at[:, t + 1].set(nxt)
            return tokens, nxt

        tokens0 = jnp.zeros((feats.shape[0], LP), jnp.int32)
        _, outs = jax.lax.scan(body, tokens0, jnp.arange(LP - 1))
        return outs.T                       # (B, L_MAX) incl. EOS tail

    def eval_wer(aed_params, ev_feats, ev_flens, ev_orths) -> float:
        hyp = np.asarray(greedy_decode(aed_params, ev_feats, ev_flens))
        ev = Evaluator("aed-eval")
        err = ref = 0
        for i, orth in enumerate(ev_orths):
            seq = []
            for u in hyp[i]:
                if u == 0:
                    break
                seq.append(int(u))
            counts = ev.evaluate(orth, task.units_to_orth(seq))
            err += counts.errors
            ref += counts.ref_len
        return err / max(ref, 1)

    # held-out eval batch (disjoint seed stream; clean condition — the
    # bench artifact evaluates the hard condition separately)
    ev_audio, ev_ns, _el, _ell, ev_orths = task.batch(
        seed=10_000_000, batch_size=16, max_seconds=TRAIN_SECONDS,
        min_words=8, max_words=14)
    ev_pad = np.zeros((16, N), np.float32)
    ev_pad[:, :ev_audio.shape[1]] = ev_audio[:, :N]
    ev_flens = jnp.asarray([min(pipe.n_frames(int(n)), T_feat)
                            for n in ev_ns], jnp.int32)
    ev_feats = feats_jit(jnp.asarray(ev_pad), ev_flens)

    take = jax.jit(lambda pf, pfl, plab, plen, idx:
                   (pf[idx], pfl[idx], plab[idx], plen[idx]))
    augment = jax.jit(spec_augment)
    ckpt = CheckpointManager(args.asset_dir, max_to_keep=1)

    rng = np.random.default_rng(1234)
    best_wer = 1.0
    t_report = time.time()
    start = ckpt.latest_step() or 0
    if start:
        restored, _, _ = ckpt.restore(params["aed"])
        params = {"aed": restored, "ctc": params["ctc"]}
        opt_state = opt.init(params)      # optimizer restarts fresh
        print(f"resumed at step {start}", flush=True)
    for step in range(start, args.steps):
        p_short = max(0.6 * (1.0 - step / max(args.curriculum, 1)),
                      args.short_floor) if n_short else 0.0
        take_short = rng.random(BATCH) < p_short
        idx = np.where(take_short,
                       rng.integers(0, max(n_short, 1), size=BATCH),
                       rng.integers(0, P, size=BATCH))
        f, fl, lab, ll = take(pool_feats, pool_flens, pool_labels,
                              pool_lens, jnp.asarray(idx, jnp.int32))
        if step >= args.specaugment_after:
            f = augment(jax.random.PRNGKey(step), f, fl)
        params, opt_state, loss, ce, ctc = train_step(
            params, opt_state, f, fl, lab, ll, jax.random.PRNGKey(step))
        if (step + 1) % 50 == 0:
            dt = time.time() - t_report
            t_report = time.time()
            print(f"step {step + 1} loss {float(loss):.4f} "
                  f"(ce {float(ce):.3f} ctc {float(ctc):.3f}, "
                  f"{dt / 50:.2f}s/step)", flush=True)
        if (step + 1) % args.eval_every == 0:
            wer = eval_wer(params["aed"], ev_feats, ev_flens, ev_orths)
            print(f"step {step + 1} greedy WER {wer:.4f}", flush=True)
            if wer <= best_wer:
                best_wer = wer
                ckpt.save(step + 1, params["aed"])
            if wer <= args.target_wer:
                print(f"target WER reached at step {step + 1}",
                      flush=True)
                break

    # export f16 bench artifact (AED params only — the aux CTC head is
    # a training device, not part of the model)
    export = params["aed"]
    if ckpt.latest_step():
        export, _, _ = ckpt.restore(params["aed"])
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16)
        if np.asarray(x).dtype in (np.float32, np.dtype("bfloat16"))
        else np.asarray(x), export)
    save_params(os.path.join(args.asset_dir, "aed_f16.msgpack"), f16,
                step=args.steps)
    with open(os.path.join(args.asset_dir, "aed.json"), "w") as fh:
        json.dump({"model": cfg, "feat_dim": FEAT_DIM,
                   "sample_rate": SAMPLE_RATE,
                   "best_greedy_wer": best_wer}, fh, indent=1)
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
