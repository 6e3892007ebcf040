"""Tensor-parallel conformer block for 3-D (stage x data x model) SPMD.

`models.pipelined` runs the flagship's block stack as a GPipe pipeline
over a 'stage' mesh axis, with data parallelism over 'data'.  This
module adds the third axis: each ConformerBlock's wide contractions are
sharded over a 'model' axis *inside* the shard_map stage body, with
explicit `lax.psum` closing the row-parallel matmuls — the classic
Megatron column->row split expressed with XLA collectives over ICI.

Sharding layout per block (model-parallel degree mp):

  ff1 / ff2      wi kernel (D, 4D/mp) column   wo kernel (4D/mp, D) row+psum
  mhsa           q/k/v kernels (D, H/mp, Dh)   out kernel (H/mp, Dh, D) row+psum
                 (every device attends over its own heads only)
  conv           pointwise1 split into GLU halves a/b, each (D, D/mp);
                 depthwise + channel LayerNorm on local channels with
                 psum'd global statistics; pointwise2 (D/mp, D) row+psum
  layer norms    replicated (activations are replicated between psums)

The math matches `ConformerBlock.apply` (same float32 layer norms, same
bf16/f32 contraction dtypes); biases of row-parallel projections are
added on model-rank 0 only so the closing psum restores them exactly
once.

Reference contrast: RASR has no tensor parallelism anywhere — deep
models live behind single-process TF/ONNX sessions
(/root/reference/src/Tensorflow/Session.hh:30; SURVEY §2.20).  This is
the TPU-native capability extension on top of the reference's corpus
partitioning.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..parallel.pipeline import pipeline_apply, stack_stage_params
from .conformer import ConformerCtc, ConvSubsampling, _pos_mask, _sinusoidal
from .pipelined import unbox

_EPS = 1e-6  # flax nn.LayerNorm default epsilon


# ---------------------------------------------------------------------------
# functional block math (local shards + explicit collectives)
# ---------------------------------------------------------------------------

def _layer_norm(x, scale, bias):
    """flax nn.LayerNorm(dtype=float32) over the last axis (replicated)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mean)
    y = (x - mean) * jax.lax.rsqrt(var + _EPS)
    return y * scale + bias


def _sharded_layer_norm(x_local, scale_local, bias_local, d_full: int,
                        model_axis: str):
    """LayerNorm over a channel axis that is sharded over `model_axis`:
    the moments are closed with psum so every shard normalizes with the
    global statistics."""
    x = x_local.astype(jnp.float32)
    s1 = jax.lax.psum(jnp.sum(x, axis=-1, keepdims=True), model_axis)
    s2 = jax.lax.psum(jnp.sum(jnp.square(x), axis=-1, keepdims=True),
                      model_axis)
    mean = s1 / d_full
    var = s2 / d_full - jnp.square(mean)
    y = (x - mean) * jax.lax.rsqrt(var + _EPS)
    return y * scale_local + bias_local


def _dense(x, kernel, bias, dtype):
    """flax nn.Dense numerics: promote x/kernel/bias to `dtype`."""
    y = x.astype(dtype) @ kernel.astype(dtype)
    if bias is not None:
        y = y + bias.astype(dtype)
    return y


def _bias_once(bias, model_axis: str):
    """Return `bias` on model-rank 0 and zeros elsewhere, so a closing
    psum over `model_axis` adds it exactly once."""
    idx = jax.lax.axis_index(model_axis)
    return jnp.where(idx == 0, bias, jnp.zeros_like(bias))


def _maybe_dropout(x, rate, rng, salt: int):
    if rng is None or rate <= 0.0:
        return x
    key = jax.random.fold_in(rng, salt)
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def tp_feed_forward(p, x, *, dtype, model_axis: str, dropout=0.0, rng=None):
    """FeedForward with wi column-sharded / wo row-sharded (+psum)."""
    h = _layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]).astype(dtype)
    h = _dense(h, p["wi"]["kernel"], p["wi"]["bias"], dtype)
    h = jax.nn.swish(h)
    h = _maybe_dropout(h, dropout, rng, 1)
    partial = _dense(h, p["wo"]["kernel"],
                     _bias_once(p["wo"]["bias"], model_axis), dtype)
    y = jax.lax.psum(partial.astype(jnp.float32), model_axis).astype(dtype)
    return _maybe_dropout(y, dropout, rng, 2)


def tp_mhsa(p, x, mask, *, dtype, model_axis: str, causal: bool = False,
            dropout=0.0, rng=None):
    """Multi-head attention over the LOCAL head shard; the output
    projection is row-parallel over heads and closed with one psum."""
    a = p["attn"]
    h = _layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]).astype(dtype)
    # kernels (D, H_local, Dh); biases (H_local, Dh)
    q = jnp.einsum("btd,dhk->bthk", h, a["query"]["kernel"].astype(dtype))
    q = q + a["query"]["bias"].astype(dtype)
    k = jnp.einsum("btd,dhk->bthk", h, a["key"]["kernel"].astype(dtype))
    k = k + a["key"]["bias"].astype(dtype)
    v = jnp.einsum("btd,dhk->bthk", h, a["value"]["kernel"].astype(dtype))
    v = v + a["value"]["bias"].astype(dtype)
    dh = q.shape[-1]
    q = q / jnp.sqrt(jnp.asarray(dh, dtype))
    logits = jnp.einsum("bqhk,bthk->bhqt", q, k).astype(jnp.float32)
    attn_mask = mask[:, None, None, :]
    if causal:
        T = x.shape[1]
        attn_mask = attn_mask & jnp.tril(jnp.ones((T, T), bool))[None, None]
    logits = jnp.where(attn_mask, logits, jnp.finfo(jnp.float32).min)
    w = jax.nn.softmax(logits, axis=-1).astype(dtype)
    w = _maybe_dropout(w, dropout, rng, 3)
    ctx = jnp.einsum("bhqt,bthk->bqhk", w, v)
    partial = jnp.einsum("bqhk,hkd->bqd", ctx,
                         a["out"]["kernel"].astype(dtype))
    partial = partial + _bias_once(a["out"]["bias"].astype(dtype), model_axis)
    y = jax.lax.psum(partial.astype(jnp.float32), model_axis).astype(dtype)
    return _maybe_dropout(y, dropout, rng, 4)


def tp_conv_module(p, x, mask, *, dtype, d_model: int, model_axis: str,
                   causal: bool = False, dropout=0.0, rng=None):
    """Convolution module with the channel axis sharded over the model
    axis from the GLU through the depthwise conv and channel norm, then
    closed by the row-parallel pointwise2 psum."""
    h = _layer_norm(x, p["ln"]["scale"], p["ln"]["bias"]).astype(dtype)
    h = h * mask[..., None].astype(dtype)
    # GLU halves as separate column-sharded projections (prepared by
    # split_pointwise1): a, b each (D, D/mp)
    ha = _dense(h, p["pw1a"]["kernel"], p["pw1a"]["bias"], dtype)
    hb = _dense(h, p["pw1b"]["kernel"], p["pw1b"]["bias"], dtype)
    h = ha * jax.nn.sigmoid(hb)
    # depthwise conv on local channels: kernel (K, 1, D/mp)
    kern = p["depthwise"]["kernel"].astype(dtype)
    K = kern.shape[0]
    pad = ((K - 1, 0),) if causal else ((K // 2, (K - 1) // 2),)
    h = jax.lax.conv_general_dilated(
        h, kern, window_strides=(1,), padding=pad,
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=h.shape[-1])
    h = h + p["depthwise"]["bias"].astype(dtype)
    h = _sharded_layer_norm(h, p["norm"]["scale"], p["norm"]["bias"],
                            d_model, model_axis).astype(dtype)
    h = jax.nn.swish(h)
    partial = _dense(h, p["pointwise2"]["kernel"],
                     _bias_once(p["pointwise2"]["bias"], model_axis), dtype)
    y = jax.lax.psum(partial.astype(jnp.float32), model_axis).astype(dtype)
    return _maybe_dropout(y, dropout, rng, 5)


def tp_block_apply(p, x, mask, *, dtype, d_model: int, n_heads: int,
                   model_axis: str = "model", causal: bool = False,
                   dropout=0.0, rng=None):
    """One ConformerBlock, tensor-parallel over `model_axis`.  Matches
    ConformerBlock.apply (conformer.py:172) on replicated inputs."""
    del n_heads  # head count is implied by the local kernel shapes
    r = jax.random.fold_in(rng, 11) if rng is not None else None
    x = x + 0.5 * tp_feed_forward(p["ff1"], x, dtype=dtype,
                                  model_axis=model_axis,
                                  dropout=dropout, rng=r)
    r = jax.random.fold_in(rng, 12) if rng is not None else None
    x = x + tp_mhsa(p["mhsa"], x, mask, dtype=dtype, model_axis=model_axis,
                    causal=causal, dropout=dropout, rng=r)
    r = jax.random.fold_in(rng, 13) if rng is not None else None
    x = x + tp_conv_module(p["conv"], x, mask, dtype=dtype, d_model=d_model,
                           model_axis=model_axis, causal=causal,
                           dropout=dropout, rng=r)
    r = jax.random.fold_in(rng, 14) if rng is not None else None
    x = x + 0.5 * tp_feed_forward(p["ff2"], x, dtype=dtype,
                                  model_axis=model_axis,
                                  dropout=dropout, rng=r)
    return _layer_norm(x, p["final_ln"]["scale"], p["final_ln"]["bias"])


# ---------------------------------------------------------------------------
# parameter preparation + partition specs
# ---------------------------------------------------------------------------

def split_pointwise1(block: Any) -> Any:
    """Rewrite conv/pointwise1 (D, 2D) into explicit GLU halves pw1a/pw1b
    (each (D, D)) so each half can be column-sharded independently —
    a raw split of the 2D axis would scatter the halves across shards."""
    blk = dict(block)
    conv = dict(blk["conv"])
    pw1 = conv.pop("pointwise1")
    D = pw1["kernel"].shape[0]
    conv["pw1a"] = {"kernel": pw1["kernel"][:, :D], "bias": pw1["bias"][:D]}
    conv["pw1b"] = {"kernel": pw1["kernel"][:, D:], "bias": pw1["bias"][D:]}
    blk["conv"] = conv
    return blk


def stack_tp_blocks(params: Any, n_layers: int, n_stages: int) -> Any:
    """encoder/block{i} subtrees -> TP-ready stage-stacked pytree with
    leading (S, layers_per_stage, ...) axes and pointwise1 pre-split."""
    if n_layers % n_stages != 0:
        raise ValueError(f"{n_layers} blocks not divisible into "
                         f"{n_stages} stages")
    enc = unbox(params["encoder"])
    blocks = [split_pointwise1(enc[f"block{i}"]) for i in range(n_layers)]
    per = n_layers // n_stages
    stages = []
    for s in range(n_stages):
        group = blocks[s * per:(s + 1) * per]
        stages.append(jax.tree_util.tree_map(
            lambda *leaves: jnp.stack(leaves, axis=0), *group))
    return stack_stage_params(stages)


def tp_block_specs(model_axis: str = "model") -> Any:
    """PartitionSpecs for one TP block BELOW the (stage,) axis: each leaf
    covers (L, param_dims...).  Passed to pipeline_apply as param_specs."""
    m = model_axis
    ln = {"scale": P(None, None), "bias": P(None, None)}

    def ff():
        return {"ln": ln,
                "wi": {"kernel": P(None, None, m), "bias": P(None, m)},
                "wo": {"kernel": P(None, m, None), "bias": P(None, None)}}

    qkv = {"kernel": P(None, None, m, None), "bias": P(None, m, None)}
    return {
        "ff1": ff(), "ff2": ff(),
        "mhsa": {"ln": ln,
                 "attn": {"query": qkv, "key": qkv, "value": qkv,
                          "out": {"kernel": P(None, m, None, None),
                                  "bias": P(None, None)}}},
        "conv": {"ln": ln,
                 "pw1a": {"kernel": P(None, None, m), "bias": P(None, m)},
                 "pw1b": {"kernel": P(None, None, m), "bias": P(None, m)},
                 "depthwise": {"kernel": P(None, None, None, m),
                               "bias": P(None, m)},
                 "norm": {"scale": P(None, m), "bias": P(None, m)},
                 "pointwise2": {"kernel": P(None, m, None),
                                "bias": P(None, None)}},
        "final_ln": ln,
    }


# ---------------------------------------------------------------------------
# full 3-D pipelined forward
# ---------------------------------------------------------------------------

def tp_pipelined_ctc_forward(model: ConformerCtc, params: Any,
                             features: jnp.ndarray, lengths: jnp.ndarray,
                             mesh: Mesh, n_microbatches: int,
                             stacked_blocks: Any = None,
                             data_axis: Optional[str] = "data",
                             model_axis: str = "model",
                             dropout_rng: Any = None
                             ) -> Tuple[jnp.ndarray, jnp.ndarray, Any]:
    """ConformerCtc forward with the block stack pipelined over 'stage',
    microbatches sharded over `data_axis`, and every block's wide
    contractions sharded over `model_axis` — 3-D parallelism in one SPMD
    program.  Returns (logits, output lengths, inter_logits-or-None).

    With `dropout_rng` the blocks run stochastic: keys fold in (stage,
    layer, model-rank) so hidden-dropout masks are valid on sharded
    activations (masks differ from the unsharded reference — same
    distribution, different draws)."""
    params = unbox(params)
    S = mesh.shape["stage"]
    per = model.n_layers // S
    if stacked_blocks is None:
        stacked_blocks = stack_tp_blocks(params, model.n_layers, S)

    sub = ConvSubsampling(model.d_model, model.dtype, model.causal)
    h, out_lengths = sub.apply(
        {"params": params["encoder"]["subsample"]}, features, lengths)
    T2 = h.shape[1]
    mask = _pos_mask(out_lengths, T2)
    pos = _sinusoidal(T2, model.d_model)
    h = h + jnp.asarray(pos, dtype=h.dtype)[None]

    inter_layer = int(getattr(model, "intermediate_ctc_layer", 0) or 0)
    B = h.shape[0]
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
            rng = None
            if dropout_rng is not None:
                rng = jax.random.fold_in(
                    jax.random.fold_in(
                        jax.random.fold_in(
                            jax.random.fold_in(dropout_rng, global_i),
                            jax.lax.axis_index(model_axis)),
                        stage), c["ids"][0])
            out = tp_block_apply(
                layer_params, c["h"], msk, dtype=model.dtype,
                d_model=model.d_model, n_heads=model.n_heads,
                model_axis=model_axis, causal=model.causal,
                dropout=model.dropout if rng is not None else 0.0, rng=rng)
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

    per_block_specs = tp_block_specs(model_axis)
    out_carry = pipeline_apply(mesh, stage_fn, stacked_blocks, carry,
                               n_microbatches, data_axis=data_axis,
                               param_specs=per_block_specs)
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
