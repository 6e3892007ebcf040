"""Train the flagship transducer (RNN-T) on the synthetic speech task
and store the checkpoint under assets/transducer/.

Third flagship family: CTC (train_flagship.py, time-sync searches), AED
(train_aed.py, label-sync searches), and this RNN-T (frame-sync
transducer beam + the RNA/transducer tree builders the reference drives
through stateful ONNX scorers, /root/reference/src/Nn/LabelScorer/
StatefulOnnxLabelScorer.hh, src/Search/TreeBuilder.hh:293).

Same pooled pure-TPU recipe; loss is the batched RNN-T lattice DP
(models/transducer.py rnnt_loss); the encoder is seeded from the CTC
flagship (dims match) so the joint/prediction networks train against
already-discriminative audio representations.  Eval is a batched jitted
greedy decode (bounded emissions per frame).
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

if os.environ.get("RASR_TRAIN_PLATFORM") == "cpu":
    import jax
    jax.config.update("jax_platforms", "cpu")

from train_flagship import (FEAT_DIM, L_MAX, SAMPLE_RATE,  # noqa: E402
                            TRAIN_SECONDS, build_pool, feature_pipeline)

ASSET_DIR = os.path.join(REPO, "assets", "transducer")

MODEL_CFG = dict(vocab_size=1024, d_model=512, encoder_layers=12,
                 pred_hidden=320, joint_dim=320, n_heads=8)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--target-wer", type=float, default=0.02)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--warmup", type=int, default=800)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--curriculum", type=int, default=2000)
    ap.add_argument("--short-floor", type=float, default=0.2)
    ap.add_argument("--specaugment-after", type=int, default=2000)
    ap.add_argument("--pool-long", type=int, default=4096)
    ap.add_argument("--pool-short", type=int, default=512)
    ap.add_argument("--d-model", type=int, default=MODEL_CFG["d_model"])
    ap.add_argument("--enc-layers", type=int,
                    default=MODEL_CFG["encoder_layers"])
    ap.add_argument("--init-encoder", default="flagship")
    ap.add_argument("--max-symbols-per-frame", type=int, default=3)
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
    from rasr_tpu.models.transducer import TransducerModel, rnnt_loss
    from rasr_tpu.nn.checkpoint import CheckpointManager, save_params
    from rasr_tpu.nn.training import spec_augment

    os.makedirs(args.asset_dir, exist_ok=True)
    task = SynthSpeechTask()
    cfg = dict(MODEL_CFG, d_model=args.d_model,
               encoder_layers=args.enc_layers)
    model = TransducerModel(**cfg)
    pipe, feats_of = feature_pipeline()
    N = int(TRAIN_SECONDS * SAMPLE_RATE)
    T_feat = pipe.n_frames(N)
    BATCH = args.batch
    K = args.max_symbols_per_frame

    feats_jit = jax.jit(lambda s, l: feats_of(s, T_feat, l))
    pool_feats, pool_flens, pool_labels, pool_lens, n_short = build_pool(
        task, pipe, feats_jit, args.pool_long, args.pool_short, T_feat, N)
    P = pool_feats.shape[0]

    sched = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, max(args.steps, args.warmup + 1),
        end_value=args.lr * 0.05)
    opt = optax.chain(optax.clip_by_global_norm(1.0),
                      optax.adamw(sched, weight_decay=1e-6))
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, T_feat, FEAT_DIM), jnp.float32),
        jnp.asarray([T_feat, T_feat], jnp.int32),
        jnp.zeros((2, L_MAX), jnp.int32))["params"]
    if args.init_encoder == "flagship":
        from rasr_tpu.models import ConformerCtc
        with open(os.path.join(REPO, "assets", "flagship",
                               "task.json")) as fh:
            fl_cfg = json.load(fh)["model"]
        assert fl_cfg["d_model"] == cfg["d_model"] \
            and fl_cfg["n_layers"] == cfg["encoder_layers"], fl_cfg
        os.chdir(REPO)
        import bench
        fl_params, fl_trained = bench.load_flagship_params(
            ConformerCtc(**fl_cfg), jnp.float32)
        assert fl_trained, "flagship checkpoint missing"
        params = dict(params)
        params["encoder"] = jax.tree_util.tree_map(
            lambda x: jnp.asarray(x, jnp.float32), fl_params["encoder"])
        print("encoder seeded from the CTC flagship", flush=True)
    n_params = sum(int(np.prod(np.asarray(x).shape))
                   for x in jax.tree_util.tree_leaves(params))
    print(f"transducer params: {n_params/1e6:.1f} M", flush=True)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, feats, flens, labels, label_lens,
                   key):
        def loss_fn(p):
            logits, out_lens = model.apply(
                {"params": p}, feats, flens, labels,
                deterministic=False, rngs={"dropout": key})
            nll = rnnt_loss(logits, out_lens, labels, label_lens)
            return jnp.mean(nll / jnp.maximum(label_lens, 1))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, new_opt = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt, loss

    @jax.jit
    def greedy_decode(params, feats, flens):
        """Batched frame-sync greedy: at each encoder frame emit up to K
        non-blank symbols (standard RNN-T greedy, batched)."""
        enc, out_lens = model.apply({"params": params}, feats, flens,
                                    method=TransducerModel.encode)
        B = feats.shape[0]
        carry0 = model.apply({"params": params}, B,
                             method=TransducerModel.predict_init)
        # consume the leading blank/BOS INTO the state: training
        # conditions the prediction net on [BOS]+labels, so the decode
        # state chain must include BOS too (without it every label is
        # re-emitted 2-4x -> ~60% WER on an otherwise-converged model)
        carry0, p0 = model.apply({"params": params}, carry0,
                                 jnp.zeros((B,), jnp.int32),
                                 method=TransducerModel.predict_step)

        def frame(carrys, t):
            carry, p = carrys

            def sub(carrys, _):
                carry, p, emitted = carrys
                logits = model.apply(
                    {"params": params}, enc[:, t][:, None], p[:, None],
                    method=TransducerModel.joint_logits)[:, 0, 0]
                tok = jnp.argmax(logits, -1).astype(jnp.int32)
                live = (tok != 0) & (emitted < K) \
                    & (t < out_lens)
                new_carry, new_p = model.apply(
                    {"params": params}, carry, tok,
                    method=TransducerModel.predict_step)
                carry = jax.tree_util.tree_map(
                    lambda n, o: jnp.where(
                        live.reshape((-1,) + (1,) * (n.ndim - 1)), n, o),
                    new_carry, carry)
                p = jnp.where(live[:, None], new_p, p)
                emitted = emitted + live.astype(jnp.int32)
                return (carry, p, emitted), jnp.where(live, tok, 0)

            (carry, p, _), toks = jax.lax.scan(
                sub, (carry, p, jnp.zeros(B, jnp.int32)), None, length=K)
            return (carry, p), toks.T           # (B, K)

        (_, _), all_toks = jax.lax.scan(
            frame, (carry0, p0), jnp.arange(enc.shape[1]))
        return all_toks.transpose(1, 0, 2).reshape(B, -1)   # (B, T*K)

    def eval_wer(params, ev_feats, ev_flens, ev_orths) -> float:
        hyp = np.asarray(greedy_decode(params, ev_feats, ev_flens))
        ev = Evaluator("rnnt-eval")
        err = ref = 0
        for i, orth in enumerate(ev_orths):
            seq = [int(u) for u in hyp[i] if u != 0]
            counts = ev.evaluate(orth, task.units_to_orth(seq))
            err += counts.errors
            ref += counts.ref_len
        return err / max(ref, 1)

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

    rng = np.random.default_rng(4321)
    best_wer = 1.0
    t_report = time.time()
    start = ckpt.latest_step() or 0
    if start:
        params, _, _ = ckpt.restore(params)
        opt_state = opt.init(params)
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
        params, opt_state, loss = train_step(
            params, opt_state, f, fl, lab, ll, jax.random.PRNGKey(step))
        if (step + 1) % 50 == 0:
            dt = time.time() - t_report
            t_report = time.time()
            print(f"step {step + 1} loss {float(loss):.4f} "
                  f"({dt / 50:.2f}s/step)", flush=True)
        if (step + 1) % args.eval_every == 0:
            wer = eval_wer(params, ev_feats, ev_flens, ev_orths)
            print(f"step {step + 1} greedy WER {wer:.4f}", flush=True)
            if wer <= best_wer:
                best_wer = wer
                ckpt.save(step + 1, params)
            if wer <= args.target_wer:
                print(f"target WER reached at step {step + 1}",
                      flush=True)
                break

    export = params
    if ckpt.latest_step():
        export, _, _ = ckpt.restore(params)
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16)
        if np.asarray(x).dtype in (np.float32, np.dtype("bfloat16"))
        else np.asarray(x), export)
    save_params(os.path.join(args.asset_dir, "transducer_f16.msgpack"),
                f16, step=args.steps)
    with open(os.path.join(args.asset_dir, "transducer.json"), "w") as fh:
        json.dump({"model": cfg, "feat_dim": FEAT_DIM,
                   "sample_rate": SAMPLE_RATE,
                   "best_greedy_wer": best_wer}, fh, indent=1)
    print("done", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
