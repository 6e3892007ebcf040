"""Ring attention: exact attention over a sequence-sharded axis.

For very long audio (hours-long recordings, meeting streams) a single
chip cannot hold the (T, T) attention problem or even the (T, D)
activations; the TPU-native answer is to shard the TIME axis over the
mesh and rotate key/value blocks around the ICI ring while accumulating
an online softmax — exact attention, O(T/n) memory per chip, and the
block matmuls overlap with the ppermute transfers (Liu et al., Ring
Attention; jax-ml scaling-book collective patterns).

The reference has no equivalent (its attention is single-GPU ONNX
inference); this extends the encoder family beyond the reference's
capability envelope.

Use inside shard_map with the sequence axis sharded:

    attn = shard_map(partial(ring_attention, axis_name="seq"),
                     mesh, in_specs=(P(None, "seq", None, None),) * 3 + ...,
                     out_specs=P(None, "seq", None, None))
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   kv_valid: Optional[jnp.ndarray] = None,
                   axis_name: str = "seq") -> jnp.ndarray:
    """Exact softmax attention with q/k/v sharded along time.

    Per-device blocks: q (B, Lq, H, D), k/v (B, Lk, H, D), kv_valid
    (B, Lk) bool mask for padded frames (rotated with its block).
    Returns the local output block (B, Lq, H, D).
    """
    n = jax.lax.psum(1, axis_name)
    scale = 1.0 / jnp.sqrt(q.shape[-1]).astype(q.dtype)
    B, Lq, H, D = q.shape

    m = jnp.full((B, H, Lq), NEG_INF, jnp.float32)       # running max
    den = jnp.zeros((B, H, Lq), jnp.float32)             # running denom
    num = jnp.zeros((B, H, Lq, D), jnp.float32)          # running numer

    k_cur, v_cur = k, v
    valid_cur = kv_valid
    perm = [(j, (j + 1) % n) for j in range(n)]

    for _ in range(n):
        # scores against the block currently resident on this device
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k_cur,
                       preferred_element_type=jnp.float32) * scale
        if valid_cur is not None:
            s = jnp.where(valid_cur[:, None, None, :], s, NEG_INF)
        blk_max = jnp.max(s, axis=-1)                     # (B, H, Lq)
        m_new = jnp.maximum(m, blk_max)
        correction = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[..., None])                 # (B, H, Lq, Lk)
        num = num * correction[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, v_cur.astype(jnp.float32))
        den = den * correction + jnp.sum(p, axis=-1)
        m = m_new
        # rotate the k/v block one hop around the ring (ICI neighbor)
        k_cur = jax.lax.ppermute(k_cur, axis_name, perm)
        v_cur = jax.lax.ppermute(v_cur, axis_name, perm)
        if valid_cur is not None:
            valid_cur = jax.lax.ppermute(valid_cur, axis_name, perm)

    out = num / jnp.maximum(den[..., None], 1e-30)
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)  # (B,Lq,H,D)


def sequence_sharded_attention(mesh, q, k, v, lengths=None,
                               seq_axis: str = "seq"):
    """Convenience wrapper: full arrays in, shard_map over the time axis,
    full (but sequence-sharded) attention out.

    q/k/v: (B, T, H, D) with T divisible by the mesh's seq axis size;
    lengths: (B,) valid frame counts (padding masked inside).
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    T = q.shape[1]
    valid = None
    if lengths is not None:
        valid = jnp.arange(T)[None, :] < lengths[:, None]   # (B, T)

    specs_in = (P(None, seq_axis, None, None),) * 3
    if valid is not None:
        fn = shard_map(
            partial(ring_attention, axis_name=seq_axis),
            mesh=mesh,
            in_specs=specs_in + (P(None, seq_axis),),
            out_specs=P(None, seq_axis, None, None))
        return fn(q, k, v, valid)
    fn = shard_map(
        lambda a, b, c: ring_attention(a, b, c, None, axis_name=seq_axis),
        mesh=mesh, in_specs=specs_in,
        out_specs=P(None, seq_axis, None, None))
    return fn(q, k, v)
