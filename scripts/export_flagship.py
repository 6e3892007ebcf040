"""Export the latest flagship checkpoint as the bench artifact
(assets/flagship/flagship_f16.msgpack + task.json) without finishing a
training run — usable any time a checkpoint exists.

Run:  python scripts/export_flagship.py [--asset-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--asset-dir",
                    default=os.path.join(REPO, "assets", "flagship"))
    ap.add_argument("--inter-ctc", type=int, default=6,
                    help="must match the trained checkpoint's setting")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import flax

    from scripts.train_flagship import MODEL_CFG, FEAT_DIM, SAMPLE_RATE
    from rasr_tpu.data import SynthSpeechTask
    from rasr_tpu.models import ConformerCtc
    from rasr_tpu.nn.checkpoint import CheckpointManager, save_params

    ckpt = CheckpointManager(args.asset_dir, max_to_keep=1)
    step = ckpt.latest_step()
    if step is None:
        print("no checkpoint found", file=sys.stderr)
        return 1
    cfg = dict(MODEL_CFG, intermediate_ctc_layer=args.inter_ctc)
    model = ConformerCtc(**cfg)
    feats0 = jnp.zeros((1, 16, FEAT_DIM), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), feats0,
                           jnp.full((1,), 16, jnp.int32),
                           mutable=["params", "intermediates"])
    params, _, _ = ckpt.restore(variables["params"])
    raw = jax.tree_util.tree_map(
        lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
        params, is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))
    f16 = jax.tree_util.tree_map(
        lambda x: np.asarray(x, np.float16)
        if np.asarray(x).dtype in (np.float32, np.dtype("bfloat16"))
        else np.asarray(x), raw)
    out = os.path.join(args.asset_dir, "flagship_f16.msgpack")
    save_params(out, f16, step=step)
    task = SynthSpeechTask()
    with open(os.path.join(args.asset_dir, "task.json"), "w") as fh:
        json.dump({"model": cfg, "feat_dim": FEAT_DIM,
                   "sample_rate": SAMPLE_RATE, "step": step,
                   "task_seed": task.task_seed,
                   "n_units": task.n_units, "n_words": task.n_words},
                  fh, indent=1)
    print(f"exported step {step} -> {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
