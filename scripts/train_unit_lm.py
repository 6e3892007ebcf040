"""Train the unit-level LSTM LM for LM-fused device decoding.

The bench task's label stream has strong LM structure (words are fixed
unit triples: after two units of a word the third is near-
deterministic), so shallow fusion should beat the raw acoustic beam on
the hard (babble) condition — the reference's raison d'etre of
LM-integrated search (src/Lm/RecurrentLanguageModel.hh:89 is the
async LM-in-search blueprint; here the whole fused beam runs inside
one lax.scan, search/ctc_decode_lm.py).

Trains on label sequences only (no audio rendering), saves
assets/flagship/unit_lm.msgpack + unit_lm.json; bench.py picks the
checkpoint up automatically for the fused operating point.

Run: python scripts/train_unit_lm.py [--steps 3000]
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

ASSET_DIR = os.path.join(REPO, "assets", "flagship")

LM_CFG = dict(vocab_size=1024, embed_dim=256, hidden_dim=512, n_layers=1)
BOS = 0                       # blank primes the LM (never predicted)
L_MAX = 48                    # 14 words x 3 units + margin


def sample_batch(task, rng, batch: int):
    """(tokens (B, L_MAX+1) with BOS prefix, lengths) — pure label
    streams, same distribution the decoder sees."""
    toks = np.zeros((batch, L_MAX + 1), np.int32)
    lens = np.zeros((batch,), np.int32)
    toks[:, 0] = BOS
    for i in range(batch):
        n_w = int(rng.integers(4, 15))
        units = []
        for w in rng.integers(0, task.n_words, size=n_w):
            units.extend(task.words[int(w)])
        units = units[:L_MAX]
        toks[i, 1:1 + len(units)] = units
        lens[i] = len(units)
    return toks, lens


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    os.makedirs("/root/.cache/jax_compile", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_compile")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from rasr_tpu.data import SynthSpeechTask
    from rasr_tpu.lm.neural import LstmLmModel
    from rasr_tpu.nn.checkpoint import save_params

    task = SynthSpeechTask()
    model = LstmLmModel(**LM_CFG)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 4), jnp.int32))["params"]
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    def loss_fn(p, toks, lens):
        logits = model.apply({"params": p}, toks[:, :-1])
        lp = jax.nn.log_softmax(logits, -1)
        tgt = toks[:, 1:]
        L = tgt.shape[1]
        valid = jnp.arange(L)[None, :] < lens[:, None]
        nll = -jnp.take_along_axis(lp, tgt[..., None], -1)[..., 0]
        return jnp.sum(nll * valid) / jnp.maximum(jnp.sum(valid), 1)

    @jax.jit
    def train_step(p, o, toks, lens):
        loss, g = jax.value_and_grad(loss_fn)(p, toks, lens)
        updates, o = opt.update(g, o)
        return optax.apply_updates(p, updates), o, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(args.steps):
        toks, lens = sample_batch(task, rng, args.batch)
        params, opt_state, loss = train_step(
            params, opt_state, jnp.asarray(toks), jnp.asarray(lens))
        if step % 200 == 0 or step == args.steps - 1:
            print(f"step {step}: nll {float(loss):.3f} "
                  f"({time.time() - t0:.0f}s)", flush=True)

    # held-out perplexity (fresh seed stream)
    ev_rng = np.random.default_rng(999)
    toks, lens = sample_batch(task, ev_rng, 256)
    nll = float(jax.jit(loss_fn)(params, jnp.asarray(toks),
                                 jnp.asarray(lens)))
    print(f"held-out nll {nll:.3f} (uniform would be "
          f"{np.log(LM_CFG['vocab_size'] - 1):.3f})", flush=True)

    os.makedirs(ASSET_DIR, exist_ok=True)
    out = os.path.join(ASSET_DIR, "unit_lm.msgpack")
    save_params(out, jax.device_get(params))
    with open(os.path.join(ASSET_DIR, "unit_lm.json"), "w") as fh:
        json.dump({"model": LM_CFG, "bos_id": BOS,
                   "heldout_nll": round(nll, 4)}, fh, indent=1)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
