"""Pipeline-staged conformer forward: the flagship encoder's block stack
sharded over a 'stage' mesh axis (optionally composed with a 'data'
axis), executed through parallel.pipeline.pipeline_apply.

The flax ConformerCtc applies its blocks in a python loop; this module
re-expresses the same math functionally — subsampling + positions run
replicated (cheap), the N identical ConformerBlocks run as a GPipe
pipeline with their parameters stacked (layers-per-stage, then stages),
and the CTC head runs on the pipeline output.  Deterministic mode only
(training-time dropout would need per-stage rng plumbing); outputs are
bit-identical to `model.apply` because every stage applies the exact
ConformerBlock module.

Reference contrast: RASR has no model parallelism at all (SURVEY §2.20)
— its deep models live behind TF/ONNX sessions.  This is the TPU-native
capability extension: ppermute over ICI instead of NCCL/MPI.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import flax
from jax.sharding import Mesh

from ..parallel.pipeline import pipeline_apply, stack_stage_params
from .conformer import (ConformerBlock, ConformerCtc, ConvSubsampling,
                        _pos_mask, _sinusoidal, plain_params)


def unbox(tree: Any) -> Any:
    """Strip flax Partitioned metadata (plain arrays for functional use)."""
    return jax.tree_util.tree_map(
        lambda x: x.value if isinstance(x, flax.linen.Partitioned) else x,
        tree, is_leaf=lambda x: isinstance(x, flax.linen.Partitioned))


def stack_conformer_blocks(params: Any, n_layers: int, n_stages: int) -> Any:
    """encoder/block{i} param subtrees -> stage-stacked pytree with
    leading (S, layers_per_stage, ...) axes."""
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} blocks not divisible into "
                         f"{n_stages} stages")
    enc = unbox(params["encoder"])
    blocks = [enc[f"block{i}"] for i in range(n_layers)]
    per = n_layers // n_stages
    stages = []
    for s in range(n_stages):
        group = blocks[s * per:(s + 1) * per]
        stages.append(jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves, axis=0), *group))
    return stack_stage_params(stages)


def pipelined_ctc_forward(model: ConformerCtc, params: Any,
                          features: jnp.ndarray, lengths: jnp.ndarray,
                          mesh: Mesh, n_microbatches: int,
                          stacked_blocks: Any = None,
                          data_axis: str = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(log-softmax-ready) logits + output lengths, block stack pipelined
    over `mesh`'s 'stage' axis.  Pass `stacked_blocks` (from
    stack_conformer_blocks) to avoid re-stacking per call."""
    params = unbox(params)
    S = mesh.shape["stage"]
    if stacked_blocks is None:
        stacked_blocks = stack_conformer_blocks(params, model.n_layers, S)

    sub = ConvSubsampling(model.d_model, model.dtype, model.causal)
    h, out_lengths = sub.apply(
        {"params": params["encoder"]["subsample"]}, features, lengths)
    T2 = h.shape[1]
    mask = _pos_mask(out_lengths, T2)
    pos = _sinusoidal(T2, model.d_model)
    h = h + jnp.asarray(pos, dtype=h.dtype)[None]

    block = ConformerBlock(model.d_model, model.n_heads, model.conv_kernel,
                           model.dropout, model.dtype, model.causal,
                           attention_impl=model.attention_impl)

    def stage_fn(stacked_layers, carry):
        hid, msk = carry

        def body(c, layer_params):
            # plain_params: inside the shard_map stage the mesh axes are
            # (stage, data) — flax must not re-apply 'embed'/'heads'
            # sharding constraints during its shape-validation trace
            with plain_params():
                out = block.apply({"params": layer_params}, c, msk, True)
            return out.astype(model.dtype), None

        hid, _ = jax.lax.scan(body, hid, stacked_layers)
        return (hid, msk)

    h, mask = pipeline_apply(mesh, stage_fn, stacked_blocks,
                             (h, mask), n_microbatches,
                             data_axis=data_axis)

    import flax.linen as nn
    dense = nn.Dense(model.vocab_size, dtype=jnp.float32)
    logits = dense.apply({"params": unbox(params["ctc_head"])},
                         h.astype(jnp.float32))
    return logits, out_lengths
