"""Pallas TPU kernel: fused self-attention for the conformer encoder.

XLA's attention materializes the (B, H, T, T) score/probability tensors
in HBM; at the bench's throughput batch (256 x 8 heads x 200 frames)
that is ~650 MB of traffic per encoder layer.  Speech-encoder sequences
after 4x subsampling are SHORT (T <= a few hundred), so one (batch,
head)'s entire Q/K/V block fits comfortably in VMEM: this kernel runs
QK^T -> masked softmax -> @V entirely on-chip, writing only the
(T, Dh) output per grid step.

Not a tiled "flash" decomposition — with whole-sequence VMEM residency
the online-softmax machinery is unnecessary; this is the degenerate
(and faster) single-tile case.  For very long sequences the ring
attention in ops/ring_attention.py covers the other end of the
spectrum.

Usable as a drop-in flax `attention_fn` (ConformerCtc
attention_impl="pallas").
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -0.7 * float(np.finfo(np.float32).max)


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref, *, scale):
    """One (batch, head): q/k/v (T, Dh) in VMEM, mask (1, T) valid keys."""
    hp = jax.lax.Precision.HIGHEST
    q = q_ref[0, 0].astype(jnp.float32)          # (Tp, Dp)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    scores = jnp.dot(q, k.T, precision=hp,
                     preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0] > 0                   # (1, Tp): broadcasts rows
    scores = jnp.where(valid, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(valid, e, 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    out_ref[0, 0] = (jnp.dot(e / denom, v, precision=hp,
                             preferred_element_type=jnp.float32)
                     ).astype(out_ref.dtype)


def fused_attention(query: jnp.ndarray, key: jnp.ndarray,
                    value: jnp.ndarray, key_mask: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """query/key/value (B, T, H, Dh); key_mask (B, T) bool/0-1 valid keys.
    Returns (B, T, H, Dh) attention outputs (softmax in f32 on-chip)."""
    B, T, H, Dh = query.shape
    scale = 1.0 / math.sqrt(Dh)
    # pad T to the f32 sublane multiple and Dh to the lane multiple
    Tp = -(-T // 8) * 8
    Dp = -(-Dh // 128) * 128

    def prep(x):
        x = jnp.moveaxis(x, 2, 1)                # (B, H, T, Dh)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - Dh)))

    q, k, v = prep(query), prep(key), prep(value)
    mask = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, Tp - T)))
    mask = mask[:, None, None, :]                # (B, 1, 1, Tp)

    kernel = functools.partial(_attn_kernel, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(B, H),
        in_specs=[
            pl.BlockSpec((1, 1, Tp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Tp, Dp), lambda b, h: (b, h, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, Tp), lambda b, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, Tp, Dp), lambda b, h: (b, h, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), query.dtype),
        interpret=interpret,
    )(q, k, v, mask)
    out = jnp.moveaxis(out[:, :, :T, :Dh], 1, 2)  # (B, T, H, Dh)
    return out


def make_flax_attention_fn(key_mask_of=None, interpret: bool = False):
    """Adapter matching flax's MultiHeadDotProductAttention attention_fn
    signature.  The (B, 1, 1, T) boolean mask flax passes is reduced to
    the (B, T) key-validity mask the kernel consumes."""

    def attention_fn(query, key, value, bias=None, mask=None,
                     broadcast_dropout=True, dropout_rng=None,
                     dropout_rate=0.0, deterministic=False,
                     dtype=None, precision=None, module=None):
        del bias, broadcast_dropout, dropout_rng, dropout_rate
        del deterministic, precision, module
        if mask is not None:
            key_mask = jnp.any(mask, axis=(1, 2))   # (B, T_k)
        else:
            key_mask = jnp.ones(key.shape[:2], bool)
        out = fused_attention_vjp(query, key, value, key_mask, interpret)
        return out.astype(dtype or query.dtype)

    return attention_fn


# ---------------------------------------------------------------------------
# custom VJP: makes the fused kernel trainable (the backward recomputes
# the probabilities on-chip — nothing is saved from the forward except
# the inputs, the flash-attention memory recipe)
# ---------------------------------------------------------------------------


def _attn_bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                     dq_ref, dk_ref, dv_ref, *, scale):
    hp = jax.lax.Precision.HIGHEST
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    do = do_ref[0, 0].astype(jnp.float32)
    scores = jnp.dot(q, k.T, precision=hp,
                     preferred_element_type=jnp.float32) * scale
    valid = mask_ref[0, 0] > 0
    scores = jnp.where(valid, scores, NEG)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    e = jnp.where(valid, e, 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-30)
    p = e / denom                                       # (T, T)
    dv = jnp.dot(p.T, do, precision=hp,
                 preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, precision=hp,
                 preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.dot(ds, k, precision=hp,
                 preferred_element_type=jnp.float32) * scale
    dk = jnp.dot(ds.T, q, precision=hp,
                 preferred_element_type=jnp.float32) * scale
    dq_ref[0, 0] = dq.astype(dq_ref.dtype)
    dk_ref[0, 0] = dk.astype(dk_ref.dtype)
    dv_ref[0, 0] = dv.astype(dv_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_attention_vjp(query, key, value, key_mask,
                        interpret: bool = False):
    """fused_attention with a Pallas backward pass — usable in training
    (the plain fused_attention is forward-only)."""
    return fused_attention(query, key, value, key_mask,
                           interpret=interpret)


def _vjp_fwd(query, key, value, key_mask, interpret):
    out = fused_attention(query, key, value, key_mask, interpret=interpret)
    return out, (query, key, value, key_mask)


def _vjp_bwd(interpret, residuals, d_out):
    query, key, value, key_mask = residuals
    B, T, H, Dh = query.shape
    scale = 1.0 / math.sqrt(Dh)
    Tp = -(-T // 8) * 8
    Dp = -(-Dh // 128) * 128

    def prep(x):
        x = jnp.moveaxis(x, 2, 1)
        return jnp.pad(x, ((0, 0), (0, 0), (0, Tp - T), (0, Dp - Dh)))

    q, k, v, do = prep(query), prep(key), prep(value), prep(d_out)
    mask = jnp.pad(key_mask.astype(jnp.float32), ((0, 0), (0, Tp - T)))
    mask = mask[:, None, None, :]
    kernel = functools.partial(_attn_bwd_kernel, scale=scale)
    spec = pl.BlockSpec((1, 1, Tp, Dp), lambda b, h: (b, h, 0, 0),
                        memory_space=pltpu.VMEM)
    mspec = pl.BlockSpec((1, 1, 1, Tp), lambda b, h: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM)
    shp = jax.ShapeDtypeStruct((B, H, Tp, Dp), query.dtype)
    dq, dk, dv = pl.pallas_call(
        kernel, grid=(B, H),
        in_specs=[spec, spec, spec, mspec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(shp, shp, shp),
        interpret=interpret,
    )(q, k, v, mask, do)

    def unprep(x):
        return jnp.moveaxis(x[:, :, :T, :Dh], 1, 2)

    return unprep(dq), unprep(dk), unprep(dv), None


fused_attention_vjp.defvjp(_vjp_fwd, _vjp_bwd)
