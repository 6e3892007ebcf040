"""Conformer CTC acoustic encoder — the flagship neural model.

The reference delegates neural acoustic models to TF/ONNX sessions
(src/Tensorflow/Session.hh:30, src/Onnx/OnnxEncoder.hh:30); this framework
owns the model natively in flax so encoder forward, chunked/streaming
execution and training all run as XLA programs on TPU.

Architecture: conv subsampling (x4) -> N conformer blocks
(feed-forward macaron / MHSA with relative-position-agnostic bias /
depthwise conv / feed-forward) -> CTC projection.  bfloat16 compute with
float32 params; shapes static, masks carry segment lengths.

Sharding: parameters carry logical axis names via flax `nn.with_partitioning`
— 'embed'/'mlp'/'heads' map onto the mesh 'model' axis, batch maps onto
'data' (see rasr_tpu.parallel.sharding).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any

# Trace-time toggle for parameter partitioning metadata.  Inside
# shard_map bodies (parallel.pipeline stages) flax's Partitioned boxes
# would re-apply their logical-axis sharding constraints against the
# shard_map mesh, whose axes ('stage', 'data') don't carry the logical
# names — so pipelined execution traces the same modules with plain
# initializers (models.pipelined.plain_params).
import contextlib as _contextlib
import contextvars as _contextvars

_PARTITION_PARAMS = _contextvars.ContextVar("conformer_partition_params",
                                            default=True)


def partitioned_init(init: Callable, axes: Tuple[Optional[str], ...]
                     ) -> Callable:
    if _PARTITION_PARAMS.get():
        return nn.with_partitioning(init, axes)
    return init


@_contextlib.contextmanager
def plain_params():
    """Trace module applications without Partitioned metadata."""
    token = _PARTITION_PARAMS.set(False)
    try:
        yield
    finally:
        _PARTITION_PARAMS.reset(token)


def _pos_mask(lengths: jnp.ndarray, T: int) -> jnp.ndarray:
    """(B, T) validity mask from lengths."""
    return (jnp.arange(T)[None, :] < lengths[:, None])


class ConvSubsampling(nn.Module):
    """Two stride-2 convs: (B, T, D) -> (B, ceil(T/4), d_model).
    causal=True pads only the past (streaming mode)."""
    d_model: int = 256
    dtype: Dtype = jnp.bfloat16
    causal: bool = False

    @nn.compact
    def __call__(self, x, lengths):
        B, T, D = x.shape
        h = x[..., None].astype(self.dtype)  # (B, T, D, 1)
        h = nn.Conv(self.d_model // 4, (3, 3), strides=(2, 2), dtype=self.dtype,
                    padding=(((2, 0), (1, 1)) if self.causal else "SAME"),
                    name="conv1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.d_model // 4, (3, 3), strides=(2, 2), dtype=self.dtype,
                    padding=(((2, 0), (1, 1)) if self.causal else "SAME"),
                    name="conv2")(h)
        h = nn.relu(h)
        B2, T2, D2, C = h.shape
        h = h.reshape(B2, T2, D2 * C)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=partitioned_init(
                         nn.initializers.lecun_normal(), (None, "embed")),
                     name="proj")(h)
        out_lengths = (lengths + 1) // 2
        out_lengths = (out_lengths + 1) // 2
        return h, out_lengths


class FeedForward(nn.Module):
    d_model: int
    expansion: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, deterministic: bool):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln")(x).astype(self.dtype)
        h = nn.Dense(self.d_model * self.expansion, dtype=self.dtype,
                     kernel_init=partitioned_init(
                         nn.initializers.lecun_normal(), ("embed", "mlp")),
                     name="wi")(h)
        h = nn.swish(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype,
                     kernel_init=partitioned_init(
                         nn.initializers.lecun_normal(), ("mlp", "embed")),
                     name="wo")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class MHSA(nn.Module):
    d_model: int
    n_heads: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    causal: bool = False
    #: "xla" (default) or "pallas" — the fused whole-sequence-in-VMEM
    #: kernel (ops/attention_kernel.py); pallas requires non-causal
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln")(x).astype(self.dtype)
        attn_mask = mask[:, None, None, :]  # (B, 1, 1, T)
        if self.causal:
            T = x.shape[1]
            attn_mask = attn_mask & jnp.tril(jnp.ones((T, T), bool))[None, None]
        attention_fn = nn.dot_product_attention
        if self.attention_impl == "pallas" and not self.causal:
            from ..ops.attention_kernel import make_flax_attention_fn
            attention_fn = make_flax_attention_fn()
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype,
            attention_fn=attention_fn,
            kernel_init=partitioned_init(
                nn.initializers.lecun_normal(), ("embed", "heads")),
            name="attn")(h, h, mask=attn_mask,
                         deterministic=deterministic)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConvModule(nn.Module):
    d_model: int
    kernel_size: int = 15
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    causal: bool = False

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln")(x).astype(self.dtype)
        h = h * mask[..., None].astype(self.dtype)
        h = nn.Dense(2 * self.d_model, dtype=self.dtype, name="pointwise1")(h)
        h = nn.glu(h, axis=-1)
        h = nn.Conv(self.d_model, (self.kernel_size,),
                    feature_group_count=self.d_model, dtype=self.dtype,
                    padding="CAUSAL" if self.causal else "SAME",
                    name="depthwise")(h)
        # batch norm replaced by layer norm for pjit-friendliness
        h = nn.LayerNorm(dtype=jnp.float32, name="norm")(h).astype(self.dtype)
        h = nn.swish(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="pointwise2")(h)
        return nn.Dropout(self.dropout)(h, deterministic=deterministic)


class ConformerBlock(nn.Module):
    d_model: int
    n_heads: int = 4
    conv_kernel: int = 15
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    causal: bool = False
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, x, mask, deterministic: bool):
        x = x + 0.5 * FeedForward(self.d_model, dropout=self.dropout,
                                  dtype=self.dtype, name="ff1")(x, deterministic)
        x = x + MHSA(self.d_model, self.n_heads, self.dropout,
                     self.dtype, self.causal,
                     attention_impl=self.attention_impl,
                     name="mhsa")(x, mask,
                                  deterministic)
        x = x + ConvModule(self.d_model, self.conv_kernel, self.dropout,
                           self.dtype, self.causal, name="conv")(
                               x, mask, deterministic)
        x = x + 0.5 * FeedForward(self.d_model, dropout=self.dropout,
                                  dtype=self.dtype, name="ff2")(x, deterministic)
        return nn.LayerNorm(dtype=jnp.float32, name="final_ln")(x)


class ConformerEncoder(nn.Module):
    """(B, T, D) features + lengths -> (B, T', d_model) encoder states.

    causal=True builds a streaming encoder: causal attention masks and
    left-padded convolutions, so prefix outputs equal full-utterance
    outputs exactly (chunked scoring is lossless)."""
    d_model: int = 256
    n_layers: int = 12
    n_heads: int = 4
    conv_kernel: int = 15
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    causal: bool = False
    attention_impl: str = "xla"
    #: when > 0, the hidden states after this block are sown into the
    #: "intermediates" collection as "inter_h" (InterCTC support)
    intermediate_layer: int = 0

    @nn.compact
    def __call__(self, features, lengths, deterministic: bool = True):
        h, out_lengths = ConvSubsampling(self.d_model, self.dtype,
                                         self.causal,
                                         name="subsample")(features, lengths)
        T2 = h.shape[1]
        mask = _pos_mask(out_lengths, T2)
        # sinusoidal positions (host-computed constants fold into the graph)
        pos = _sinusoidal(T2, self.d_model)
        h = h + jnp.asarray(pos, dtype=h.dtype)[None]
        for i in range(self.n_layers):
            h = ConformerBlock(self.d_model, self.n_heads, self.conv_kernel,
                               self.dropout, self.dtype, self.causal,
                               attention_impl=self.attention_impl,
                               name=f"block{i}")(h, mask, deterministic)
            h = h.astype(self.dtype)
            if self.intermediate_layer and i + 1 == self.intermediate_layer:
                self.sow("intermediates", "inter_h",
                         h.astype(jnp.float32))
        return h.astype(jnp.float32), out_lengths, mask


class ConformerCtc(nn.Module):
    """Conformer encoder + CTC output head; vocab index 0 = blank.

    intermediate_ctc_layer > 0 enables InterCTC (Lee & Watanabe 2021):
    a second CTC head reads the hidden states after that block and its
    logits are sown into the "intermediates" collection — the standard
    regularizer that makes deep CTC stacks trainable (gradients reach
    lower layers directly instead of through 12 blocks)."""
    vocab_size: int = 1024
    d_model: int = 256
    n_layers: int = 12
    n_heads: int = 4
    conv_kernel: int = 15
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    causal: bool = False
    intermediate_ctc_layer: int = 0
    attention_impl: str = "xla"

    @nn.compact
    def __call__(self, features, lengths, deterministic: bool = True):
        encoder = ConformerEncoder(
            self.d_model, self.n_layers, self.n_heads, self.conv_kernel,
            self.dropout, self.dtype, self.causal,
            attention_impl=self.attention_impl,
            intermediate_layer=self.intermediate_ctc_layer, name="encoder")
        h, out_lengths, mask = encoder(features, lengths, deterministic)
        logits = nn.Dense(self.vocab_size, dtype=jnp.float32,
                          kernel_init=partitioned_init(
                              nn.initializers.lecun_normal(),
                              ("embed", "vocab")),
                          name="ctc_head")(h)
        if self.intermediate_ctc_layer:
            inter_h = encoder.get_variable("intermediates", "inter_h")
            if inter_h is not None:
                inter = inter_h[0] if isinstance(inter_h, (tuple, list)) \
                    else inter_h
                inter_logits = nn.Dense(
                    self.vocab_size, dtype=jnp.float32,
                    kernel_init=partitioned_init(
                        nn.initializers.lecun_normal(),
                        ("embed", "vocab")),
                    name="inter_ctc_head")(inter)
                self.sow("intermediates", "inter_ctc_logits", inter_logits)
        return logits, out_lengths, mask

    def log_probs(self, features, lengths):
        logits, out_lengths, mask = self(features, lengths, deterministic=True)
        return jax.nn.log_softmax(logits, axis=-1), out_lengths, mask


def _sinusoidal(T: int, d: int) -> np.ndarray:
    pos = np.arange(T)[:, None]
    i = np.arange(d // 2)[None, :]
    angle = pos / np.power(10000.0, 2 * i / d)
    out = np.zeros((T, d), dtype=np.float32)
    out[:, 0::2] = np.sin(angle)
    out[:, 1::2] = np.cos(angle)
    return out
