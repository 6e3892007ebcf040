"""Attention encoder-decoder (AED / LAS-style) model.

The reference runs AED models through ONNX sessions with per-hypothesis
hidden-state management (src/Nn/LabelScorer/StatefulOnnxLabelScorer.hh:92,
src/Search/TreeBuilder.hh AedTreeBuilder); here the model is native flax:
conformer encoder + transformer decoder with cross-attention.  Decoding
re-scores the full label prefix per step (prefix lengths are short; a KV
cache is a later optimization), which keeps the scorer purely functional.

Vocabulary convention: 0 = BOS/EOS (sentence boundary), labels 1..V-1.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .conformer import ConformerEncoder, _sinusoidal

Dtype = Any


class DecoderBlock(nn.Module):
    d_model: int
    n_heads: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, y, enc, enc_mask, self_mask, deterministic=True,
                 decode=False):
        h = nn.LayerNorm(dtype=jnp.float32, name="ln1")(y).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, decode=decode,
            name="self_attn")(
                h, h, mask=self_mask, deterministic=deterministic)
        y = y + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln2")(y).astype(self.dtype)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, dtype=self.dtype, name="cross_attn")(
                h, enc.astype(self.dtype), mask=enc_mask,
                deterministic=deterministic)
        y = y + nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.LayerNorm(dtype=jnp.float32, name="ln3")(y).astype(self.dtype)
        h = nn.Dense(4 * self.d_model, dtype=self.dtype, name="ff1")(h)
        h = nn.gelu(h)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="ff2")(h)
        return y + nn.Dropout(self.dropout)(h, deterministic=deterministic)


class AedModel(nn.Module):
    vocab_size: int = 1024
    d_model: int = 256
    encoder_layers: int = 12
    decoder_layers: int = 4
    n_heads: int = 4
    dropout: float = 0.1
    dtype: Dtype = jnp.bfloat16
    # positional-table length for step-wise decoding; positions at or
    # beyond this would silently clamp the sinusoidal gather, so
    # decode_step asserts against it and config plumbing validates
    # max-labels < max_positions (ADVICE r3)
    max_positions: int = 512

    def setup(self):
        self.encoder = ConformerEncoder(
            self.d_model, self.encoder_layers, self.n_heads,
            dropout=self.dropout, dtype=self.dtype, name="encoder")
        self.embed = nn.Embed(self.vocab_size, self.d_model, name="embed")
        self.blocks = [DecoderBlock(self.d_model, self.n_heads, self.dropout,
                                    self.dtype, name=f"dec{i}")
                       for i in range(self.decoder_layers)]
        self.out_ln = nn.LayerNorm(dtype=jnp.float32, name="out_ln")
        self.out = nn.Dense(self.vocab_size, dtype=jnp.float32, name="out")

    def encode(self, features, lengths, deterministic=True):
        enc, out_lens, mask = self.encoder(features, lengths, deterministic)
        return enc, mask

    def decode(self, enc, enc_mask, labels, deterministic=True):
        """labels (B, L) with BOS prefix -> logits (B, L, V)."""
        B, L = labels.shape
        y = self.embed(labels).astype(self.dtype)
        y = y + jnp.asarray(_sinusoidal(L, self.d_model),
                            dtype=y.dtype)[None]
        causal = jnp.tril(jnp.ones((L, L), bool))[None, None]
        cross = enc_mask[:, None, None, :]
        for block in self.blocks:
            y = block(y, enc, cross, causal, deterministic)
        return self.out(self.out_ln(y))

    def decode_step(self, enc, enc_mask, y_t, position):
        """One autoregressive step with KV caching (flax decode mode):
        y_t (B, 1) int32 token, position (B,) current index; requires
        apply(..., mutable=['cache']).  Returns logits (B, V)."""
        y = self.embed(y_t).astype(self.dtype)
        pos_table = jnp.asarray(_sinusoidal(self.max_positions, self.d_model),
                                dtype=y.dtype)
        y = y + pos_table[position][:, None, :]
        cross = enc_mask[:, None, None, :]
        for block in self.blocks:
            y = block(y, enc, cross, None, deterministic=True, decode=True)
        return self.out(self.out_ln(y))[:, 0]

    def __call__(self, features, feat_lengths, labels, deterministic=True):
        enc, enc_mask = self.encode(features, feat_lengths, deterministic)
        return self.decode(enc, enc_mask, labels, deterministic)
