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
                          data_axis: str = None,
                          dropout_rng: Any = None
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
    """(logits, output lengths, inter_logits-or-None), block stack
    pipelined over `mesh`'s 'stage' axis.  Pass `stacked_blocks` (from
    stack_conformer_blocks) to avoid re-stacking per call.  With
    `dropout_rng` the blocks run non-deterministic: keys fold in (stage,
    layer, microbatch) so masks differ across depth and microbatches.
    inter_logits are produced when model.intermediate_ctc_layer > 0
    (InterCTC): the hidden states after that block ride the carry out of
    the pipeline."""
    params = unbox(params)
    S = mesh.shape["stage"]
    per = model.n_layers // S
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
    inter_layer = int(getattr(model, "intermediate_ctc_layer", 0) or 0)
    B = h.shape[0]
    # carry leaves are built only when needed: the inter hidden tensor
    # doubles inter-stage ppermute traffic, and the microbatch-id seeds
    # only matter under dropout
    carry = {"h": h, "mask": mask}
    if dropout_rng is not None:
        carry["ids"] = jnp.arange(B, dtype=jnp.int32)
    if inter_layer:
        carry["inter"] = jnp.zeros_like(h)

    def stage_fn(stacked_layers, carry):
        stage = jax.lax.axis_index("stage")
        msk = carry["mask"]

        def body(c, xs):
            layer_params, local_i = xs
            global_i = stage * per + local_i
            with plain_params():
                if dropout_rng is None:
                    out = block.apply({"params": layer_params}, c["h"],
                                      msk, True)
                else:
                    key = jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(dropout_rng, global_i),
                            stage), c["ids"][0])
                    out = block.apply({"params": layer_params}, c["h"],
                                      msk, False, rngs={"dropout": key})
            nxt = dict(c)
            nxt["h"] = out.astype(model.dtype)
            if inter_layer:
                nxt["inter"] = jnp.where(global_i + 1 == inter_layer,
                                         out.astype(c["inter"].dtype),
                                         c["inter"])
            return nxt, None

        inner = {k: v for k, v in carry.items() if k != "mask"}
        inner, _ = jax.lax.scan(
            body, inner,
            (stacked_layers, jnp.arange(per, dtype=jnp.int32)))
        return {**inner, "mask": msk}

    out_carry = pipeline_apply(mesh, stage_fn, stacked_blocks, carry,
                               n_microbatches, data_axis=data_axis)
    h, mask = out_carry["h"], out_carry["mask"]
    inter_h = out_carry.get("inter")

    import flax.linen as nn
    dense = nn.Dense(model.vocab_size, dtype=jnp.float32)
    logits = dense.apply({"params": params["ctc_head"]},
                         h.astype(jnp.float32))
    inter_logits = None
    if inter_layer and "inter_ctc_head" in params:
        inter_logits = dense.apply({"params": params["inter_ctc_head"]},
                                   inter_h.astype(jnp.float32))
    return logits, out_lengths, inter_logits
